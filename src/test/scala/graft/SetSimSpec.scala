package graft

/** q161_setsim_join (prefix + positional filtered EXACT set-similarity
  * self-join): the contract is exactness — the output must equal a
  * brute-force O(n²) word-trigram Jaccard replica EXACTLY, pair for
  * pair, count for count, double for double. No false negatives (the
  * prefix/positional/size filters are provably complete for t = 1/2)
  * and no false positives (candidates are verified on full sets).
  * Planted shapes: an exact clone (jac = 1), a one-word-edit near-dup
  * (kills ≤3 trigrams, jac ≈ 0.8), and a half-overlap pair (jac ≈ 0.3,
  * must NOT surface).
  */
class SetSimSpec extends SparkSuite {

  private val vocab: Vector[String] = {
    val r = new scala.util.Random(7)
    Vector.fill(40)((0 until 6).map(_ => ('a' + r.nextInt(26)).toChar).mkString)
  }

  private def fixture: Seq[(Long, String)] = {
    val r = new scala.util.Random(11)
    def words(n: Int): Vector[String] = Vector.fill(n)(vocab(r.nextInt(vocab.size)))
    val base = (0 until 60).map(i => (100L + i, words(30).mkString(" ")))
    val cloneW = words(30)
    val editW = words(30)
    val edited = editW.updated(15, vocab((vocab.indexOf(editW(15)) + 1) % vocab.size))
    val halfW = words(30)
    val half2 = halfW.take(15) ++ words(15)
    base ++ Seq(
      (0L, cloneW.mkString(" ")), (1L, cloneW.mkString(" ")),
      (2L, editW.mkString(" ")), (3L, edited.mkString(" ")),
      (4L, halfW.mkString(" ")), (5L, half2.mkString(" ")))
  }

  private def trigrams(t: String): Set[String] = {
    val ws = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
    ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
  }

  test("output ≡ brute-force trigram-Jaccard replica, exactly") {
    import spark.implicits._
    val docs = fixture
    val dir = java.nio.file.Files.createTempDirectory("setsim").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val sets = docs.map { case (id, t) => (id, trigrams(t)) }
    val replica = (for {
      (d1, s1) <- sets; (d2, s2) <- sets if d1 < d2
      i = (s1 & s2).size.toLong
      if i * 3 >= s1.size + s2.size
    } yield (d1, d2, i, s1.size.toLong, s2.size.toLong,
      i.toDouble / (s1.size + s2.size - i))).toSet
    val rows = SparkEntry.queries("q161_setsim_join")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .toSet
    assert(rows == replica, s"engine=${rows.size} replica=${replica.size}")
    // planted shapes behaved
    assert(rows.exists(r => r._1 == 0L && r._2 == 1L && r._6 == 1.0),
      "exact clone missing or jac != 1")
    assert(rows.exists(r => r._1 == 2L && r._2 == 3L && r._6 >= 0.5),
      "one-word-edit near-dup missed (false negative)")
    assert(!rows.exists(r => r._1 == 4L && r._2 == 5L),
      "half-overlap pair above threshold — fixture broken")
    assert(replica.exists(r => r._1 == 2L && r._2 == 3L),
      "replica itself lost the edit pair — fixture broken")
  }

  test("t = 7/10: output ≡ brute-force replica; the 0.5-band pair drops") {
    import spark.implicits._
    val docs = fixture
    val dir = java.nio.file.Files.createTempDirectory("setsim07").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val sets = docs.map { case (id, t) => (id, trigrams(t)) }
    // jac ≥ 7/10 ⟺ 17·inter ≥ 7·(n1+n2) — the same integer gate the
    // engine and oracle run
    val replica = (for {
      (d1, s1) <- sets; (d2, s2) <- sets if d1 < d2
      i = (s1 & s2).size.toLong
      if i * 17 >= (s1.size + s2.size) * 7
    } yield (d1, d2, i, s1.size.toLong, s2.size.toLong,
      i.toDouble / (s1.size + s2.size - i))).toSet
    val rows = SparkEntry.queries("q187_setsim_t07")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .toSet
    assert(rows == replica, s"engine=${rows.size} replica=${replica.size}")
    // the exact clone survives the higher bar; the one-word edit
    // (jac ≈ 0.8) survives 0.7 — and the replica must agree
    assert(rows.exists(r => r._1 == 0L && r._2 == 1L && r._6 == 1.0))
    assert(rows.exists(r => r._1 == 2L && r._2 == 3L && r._6 >= 0.7),
      "one-word-edit pair (jac ≈ 0.8) missed at t = 0.7 (false negative)")
    // discrimination vs q161: pairs in [0.5, 0.7) pass t = 1/2 but
    // must NOT pass t = 7/10 — build one explicitly and check both
    // engines' gates disagree on it the same way
    val lo = SparkEntry.queries("q161_setsim_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    lo.filter(_._3 < 0.7).foreach { case (d1, d2, _) =>
      assert(!rows.exists(r => r._1 == d1 && r._2 == d2),
        s"pair ($d1,$d2) below 0.7 leaked through the t=7/10 gates")
    }
  }
}
