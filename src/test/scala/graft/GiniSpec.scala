package graft

/** q172_token_gini: hand-checkable extremes — a perfectly uniform
  * source scores 0, a winner-take-all source scores (n−1)/n — plus
  * exact replica equality on a mixed source.
  */
class GiniSpec extends SparkSuite {

  // uniform: 4 docs × 5 tokens; extreme: 4 docs, one holds all 40
  // tokens (empty text = 0 tokens); mixed: counts 1..5
  private def text(words: Int): String = Seq.fill(words)("w").mkString(" ")
  private val docs: Seq[(Long, String, String)] =
    (1 to 4).map(i => (i.toLong, "uni", text(5))) ++
      Seq((11L, "ext", text(40)), (12L, "ext", ""), (13L, "ext", ""),
        (14L, "ext", "")) ++
      (1 to 5).map(i => (20L + i, "mix", text(i)))

  test("gini extremes and replica") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gini").toString
    docs.toDF("doc_id", "source", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    def gini(xs: Seq[Long]): (Long, Long, Double) = {
      val s = xs.sorted
      val n = s.size.toLong
      val sx = s.sum
      val six = s.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      (n, sx, (2.0 * six - (n + 1) * sx) / (n.toDouble * sx))
    }
    val want = docs.groupBy(_._2).map { case (src, ds) =>
      val (n, sx, g) = gini(ds.map(d =>
        d._3.split(" ").count(_.nonEmpty).toLong))
      (src, n, sx, g)
    }.toSet

    val got = SparkEntry.queries("q172_token_gini")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == want, s"got $got\nwant $want")
    val byS = got.map(t => t._1 -> t._4).toMap
    assert(byS("uni") == 0.0)
    assert(byS("ext") == 3.0 / 4)        // (n-1)/n with n = 4
    assert(byS("mix") > 0.0 && byS("mix") < byS("ext"))
  }

  test("plan: per-source ranks come from GlobalRank, not a window stripe") {
    val df = SparkEntry.queries("q172_token_gini")(spark, "/root/testdata/sf0.01")
    assert(df.count() > 0) // action first: assert the EXECUTED plan
    assertNoWindowExec(df)
  }
}
