package graft

/** q146_gate_ablation (per-rule attribution for q87's conjunctive
  * Gopher gate): planted docs hit every attribution cell — one doc
  * failing ONLY each of the four rules, one failing two rules at once
  * (counted in both n_fail columns, in neither n_fail_only), and one
  * passing — and the whole 4-row table must equal a first-principles
  * JVM replica of the flag algebra (tokenize, per-rule booleans,
  * marginal attribution) on the same fixture.
  */
class GateAblationSpec extends SparkSuite {

  // q87's stopword list (private in Mining; pinned here — a drift
  // would surface as a replica mismatch, which is the point)
  private val stop = Set("the", "a", "an", "and", "of", "to", "in", "is", "that", "it")

  /** (n_words in [30,100000], mean_wlen in [3,5], stop_frac > 0, top_frac <= 0.15) */
  private def flags(text: String): (Boolean, Boolean, Boolean, Boolean) = {
    val ws = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
    val wc = ws.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val n = ws.length.toLong
    val meanW = wc.map { case (w, c) => w.length * c }.sum.toDouble / n
    val stopFrac = wc.collect { case (w, c) if stop(w) => c }.sum.toDouble / n
    val topFrac = wc.values.max.toDouble / n
    (n >= 30 && n <= 100000, meanW >= 3.0 && meanW <= 5.0, stopFrac > 0.0, topFrac <= 0.15)
  }

  private def fixture: Seq[(Long, String)] = {
    // n distinct LETTER-ONLY words (the gate tokenizes on [^a-z]+,
    // so digits would split) of length |pre| + 2
    def uniq(n: Int, pre: String) = (1 to n)
      .map(i => pre + ('a' + i % 26).toChar + ('a' + i / 26).toChar)
      .mkString(" ")
    Seq(
      // fails ONLY len: 10 good-shaped words incl. a stopword
      (0L, "the " + uniq(9, "wo")),
      // fails ONLY wlen: 30 distinct 2-char words + "the" (mean ≈ 2)
      (1L, "the " + (1 to 30).map(i => ('a' + i % 26).toChar.toString + ('a' + i / 26).toChar).mkString(" ")),
      // fails ONLY stop: 35 distinct 4-char words, none a stopword
      (2L, uniq(35, "qu")),
      // fails ONLY rep: "data" 8 of 40 words (0.2 > 0.15), stopword present
      (3L, "the " + uniq(31, "zo") + " " + Seq.fill(8)("data").mkString(" ")),
      // fails len AND stop: 10 non-stop words (top_frac 0.1 stays legal)
      (4L, uniq(10, "xe")),
      // passes everything
      (5L, "the " + uniq(39, "pa")))
  }

  test("planted single-rule failures land in n_fail_only; double failure in neither") {
    import spark.implicits._
    val docs = fixture
    // fixture sanity: each planted doc hits exactly the intended flags
    val want = Map(
      0L -> ((false, true, true, true)),
      1L -> ((true, false, true, true)),
      2L -> ((true, true, false, true)),
      3L -> ((true, true, true, false)),
      4L -> ((false, true, false, true)),
      5L -> ((true, true, true, true)))
    docs.foreach { case (id, t) =>
      assert(flags(t) == want(id), s"doc $id flags ${flags(t)} != ${want(id)}")
    }
    val dir = java.nio.file.Files.createTempDirectory("abl").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q146_gate_ablation")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
      .toMap
    // replica: marginal attribution over the JVM flags
    val fl = docs.map { case (_, t) => flags(t) }
    val nDocs = fl.size.toLong
    val nPass = fl.count(f => f._1 && f._2 && f._3 && f._4).toLong
    def cell(fail: ((Boolean, Boolean, Boolean, Boolean)) => Boolean,
             others: ((Boolean, Boolean, Boolean, Boolean)) => Boolean) = {
      val nf = fl.count(fail).toLong
      val no = fl.count(f => fail(f) && others(f)).toLong
      (nf, no, nDocs, nPass, nPass + no)
    }
    assert(got("len") == cell(!_._1, f => f._2 && f._3 && f._4))
    assert(got("wlen") == cell(!_._2, f => f._1 && f._3 && f._4))
    assert(got("stop") == cell(!_._3, f => f._1 && f._2 && f._4))
    assert(got("rep") == cell(!_._4, f => f._1 && f._2 && f._3))
    // the planted shape itself: every rule fails ≥ once; len and stop
    // carry the shared double-failure (doc 4) in n_fail but not in
    // n_fail_only
    assert(got("len") == ((2L, 1L, 6L, 1L, 2L)), s"len: ${got("len")}")
    assert(got("stop") == ((2L, 1L, 6L, 1L, 2L)), s"stop: ${got("stop")}")
    assert(got("wlen") == ((1L, 1L, 6L, 1L, 2L)), s"wlen: ${got("wlen")}")
    assert(got("rep") == ((1L, 1L, 6L, 1L, 2L)), s"rep: ${got("rep")}")
  }
}
