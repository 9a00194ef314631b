package graft

import org.apache.spark.sql.functions._

/** The two ExactSubstr forms must agree: q86 (hashed 20-grams) and q91
  * (suffix-array adjacent-LCP) compute the same duplicated-position
  * signal — a 20-gram at position p occurs in another document iff the
  * suffix at p shares a >= 20-char prefix with another document's
  * suffix. q91 additionally reports max_dup (the longest duplicated
  * substring), which must be consistent with that signal: >= 20
  * exactly when any position is duplicated.
  */
class MiningAgreementSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.01"

  test("q91 per-doc duplicated-gram counts equal q86's exactly") {
    val q86 = SparkEntry.queries("q86_substring_dup_coverage")(spark, dir)
      .select(col("doc_id"), col("n_grams"), col("n_dup"))
    val q91 = SparkEntry.queries("q91_suffix_dup_stats")(spark, dir)
      .select(col("doc_id"), col("n_grams").as("n_grams_sa"),
        col("n_dup").as("n_dup_sa"), col("max_dup"))
    val j = q86.join(q91, "doc_id").collect()
    assert(j.length === q86.count(), "row sets differ")
    j.foreach { r =>
      withClue(s"doc ${r.getLong(0)}: ") {
        assert(r.getAs[Long]("n_grams") === r.getAs[Long]("n_grams_sa"))
        assert(r.getAs[Long]("n_dup") === r.getAs[Long]("n_dup_sa"))
        // the longest-dup statistic is consistent with the signal
        val dup = r.getAs[Long]("n_dup") > 0
        val mx = r.getAs[Long]("max_dup")
        assert(if (dup) mx >= 20L else mx < 20L,
          s"max_dup=$mx inconsistent with n_dup=${r.getAs[Long]("n_dup")}")
      }
    }
    // the signal is non-trivial on this corpus (some docs duplicated)
    assert(j.exists(_.getAs[Long]("n_dup") > 0))
    assert(j.exists(_.getAs[Long]("n_dup") === 0L))
  }

  test("q91 finds the planted longest duplicated substring exactly") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog!!"  // 46 chars
    val docs = Seq(
      (1L, s"AAAA${shared}BBBBBBBBBBBBBBBBBBBBBBBB"),
      (2L, s"CCCCCCCC${shared}DDDDDDDDDDDDDDDD"),
      (3L, "totally unrelated text with no repeats at all, long enough to clear the minimum"))
      .toDF("doc_id", "text")
    // run the registered query itself over the planted corpus
    val tmp = java.nio.file.Files.createTempDirectory("q91fix").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q91_suffix_dup_stats")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("max_dup") === shared.length.toLong)
    assert(out(2L).getAs[Long]("max_dup") === shared.length.toLong)
    assert(out(3L).getAs[Long]("max_dup") === 0L)
    // duplicated positions: every start of a 20-gram inside `shared`
    assert(out(1L).getAs[Long]("n_dup") === (shared.length - 19).toLong)
  }
}
