package graft

/** q54_sequence_packing: exact replica of the greedy per-language
  * token-budget packing (running sum in doc_id order, pack_id =
  * tokens-before div 8192), bin-boundary arithmetic on a hand fixture
  * that crosses the budget, and the migration contract — the executed
  * plan carries NO WindowExec (the running sum is
  * ops.GlobalRank.withGroupPrefixSum, never a per-language window
  * stripe).
  */
class PackingSpec extends SparkSuite {

  private def text(words: Int): String = Seq.fill(words)("tok").mkString(" ")

  test("packing replica: per-language running sums and bin boundaries") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("packing").toString
    // en: token counts that cross the 8192 budget mid-stream (doc 3
    // straddles: starts at 8000, so pack_id 0 with offset 8000);
    // fr: a single giant doc spanning multiple bins on its own
    val docs = Seq(
      (1L, "en", 5000), (2L, "en", 3000), (3L, "en", 4000), (4L, "en", 500),
      (10L, "fr", 20000), (11L, "fr", 10),
      (20L, "de", 0), (21L, "de", 7))
    docs.map { case (id, lang, w) => (id, lang, text(w)) }
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q54_sequence_packing")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens"),
          r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset")))
      .toMap
    val want = docs.groupBy(_._2).flatMap { case (_, ds) =>
      var cum = 0L
      ds.sortBy(_._1).map { case (id, _, w) =>
        val before = cum
        cum += w
        id -> (w.toLong, cum, before / 8192, before % 8192)
      }
    }
    assert(got === want)
    // the straddle doc lands where the greedy stream put it
    assert(got(3L) === (4000L, 12000L, 0L, 8000L))
    assert(got(10L) === (20000L, 20000L, 0L, 0L))
    assert(got(11L) === (10L, 20010L, 2L, 3616L))
  }

  test("plan: the running sum is grouped-prefix-sum, not a window stripe") {
    val df = SparkEntry.queries("q54_sequence_packing")(spark, "/root/testdata/sf0.01")
    assert(df.count() == 500L) // action first: assert the EXECUTED plan
    assertNoWindowExec(df)
  }
}
