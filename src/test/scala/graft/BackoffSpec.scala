package graft

/** q124 Stupid Backoff: bit-exact agreement with an independent JVM
  * replica of the trigram→bigram→unigram→OOV ladder over the real
  * corpus, plus the structural invariants (levels partition the
  * scored positions, scores bounded by the ladder's construction).
  */
class BackoffSpec extends SparkSuite {

  private def toks(text: String): Array[String] =
    text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)

  test("engine ≡ independent replica on the real corpus (every double ==)") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> toks(r.getString(1))).toMap

    val corpus = docs.filter(_._1 % 10 != 3).values.toSeq
    val c1 = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val c2 = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    val c3 = scala.collection.mutable.Map.empty[(String, String, String), Long].withDefaultValue(0L)
    var n = 0L
    corpus.foreach { ws =>
      ws.foreach { w => c1(w) += 1; n += 1 }
      ws.sliding(2).filter(_.length == 2).foreach(p => c2((p(0), p(1))) += 1)
      ws.sliding(3).filter(_.length == 3).foreach(t => c3((t(0), t(1), t(2))) += 1)
    }

    val want = docs.filter { case (id, ws) => id % 10 == 3 && ws.length >= 3 }
      .map { case (id, ws) =>
        var (sum, nt, nb, nu, no) = (0.0, 0L, 0L, 0L, 0L)
        (0 until ws.length - 2).foreach { i =>
          val (w1, w2, w) = (ws(i), ws(i + 1), ws(i + 2))
          // the engine's exact IEEE sequence: one division, then the
          // literal penalty multiply
          if (c3.contains((w1, w2, w))) {
            sum += c3((w1, w2, w)).toDouble / c2((w1, w2)).toDouble; nt += 1
          } else if (c2.contains((w2, w))) {
            sum += 0.4 * (c2((w2, w)).toDouble / c1(w2).toDouble); nb += 1
          } else if (c1.contains(w)) {
            sum += 0.16 * (c1(w).toDouble / n.toDouble); nu += 1
          } else { sum += 0.16 * (1.0 / n.toDouble); no += 1 }
        }
        val ns = (ws.length - 2).toLong
        id -> ((ns, nt, nb, nu, no, sum / ns.toDouble))
      }

    val got = SparkEntry.queries("q124_stupid_backoff")(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, w) =>
      assert(got(id) == w, s"doc $id: got ${got(id)}, want $w")
    }
    // backoff genuinely fires on the held-out slice, and the ladder
    // levels partition every scored position
    val totals = got.values.toSeq
    assert(totals.map(_._3).sum > 0, "no bigram backoff fired")
    totals.foreach { case (ns, nt, nb, nu, no, score) =>
      assert(nt + nb + nu + no == ns)
      assert(score > 0.0 && score <= 1.0)
    }
  }
}
