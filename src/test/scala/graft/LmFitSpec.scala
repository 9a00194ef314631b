package graft

/** q138_lm_fit (held-out bigram-LM mean-transition fit): bit-exact
  * agreement with a JVM replica that mirrors the engine's ordered
  * fold, plus the metric's anchors — held-out text drawn from the
  * training distribution outscores out-of-vocabulary text, and a
  * fully-OOV document scores exactly n·(1/V)/n = 1/V.
  */
class LmFitSpec extends SparkSuite {

  private def toks(t: String): Seq[String] =
    t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq

  private def replica(docs: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    val train = docs.filter(_._1 % 10 < 8)
    val held = docs.filter(_._1 % 10 >= 8)
    def bigrams(t: String): Seq[((String, String), Long)] = {
      val ts = toks(t)
      ts.zip(ts.drop(1)).zipWithIndex.map { case (b, i) => (b, (i + 1).toLong) }
    }
    val c2 = train.flatMap(d => bigrams(d._2).map(_._1))
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val v = train.flatMap(d => toks(d._2)).distinct.size.toLong
    held.filter(d => toks(d._2).size >= 2).map { case (id, t) =>
      val bs = bigrams(t)
      // ascending position fold — the engine's sort_array + aggregate
      var acc = 0.0
      bs.sortBy(_._2).foreach { case ((w1, w2), _) =>
        acc += (c2.getOrElse((w1, w2), 0L) + 1L).toDouble /
          (c1.getOrElse(w1, 0L) + v).toDouble
      }
      id -> (bs.size.toLong, acc / bs.size.toDouble)
    }.toMap
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lmfit").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    SparkEntry.queries("q138_lm_fit")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
  }

  test("engine ≡ replica bit-for-bit; in-distribution outscores OOV; full-OOV = 1/V") {
    val r = new scala.util.Random(29)
    val pool = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    def inDist = (0 until 15).map(_ => pool(r.nextInt(pool.length))).mkString(" ")
    val docs = (0L until 40L).map { id =>
      if (id == 8L) (id, inDist)                         // held-out, in-distribution
      else if (id == 18L) (id, "zq wx kv zq wx kv zq")   // held-out, fully OOV
      else if (id % 10 >= 8) (id, inDist)
      else (id, inDist)                                  // training side
    }
    val got = run(docs)
    val want = replica(docs)
    assert(got == want, s"got $got\nwant $want")
    // V = 6 training unigrams; every OOV transition is (0+1)/(0+6),
    // so the mean is 1/V up to fold rounding (n·x folded then /n)
    assert(math.abs(got(18L)._2 - 1.0 / 6.0) < 1e-15, s"full-OOV fit ${got(18L)._2}")
    assert(got(8L)._2 > got(18L)._2,
      "in-distribution held-out text must outscore OOV text")
  }
}
