package graft

import graft.ops.WinnowState
import graft.queries.Mining
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ops.WinnowState — incremental batch-vs-corpus ExactSubstr: probes
  * must equal the full q102 recompute restricted to the batch, drops
  * must accumulate (a later batch sees earlier batches' fingerprints),
  * the frozen pos-ladder rung must be enforced loudly, and the
  * corpus-sized state must never shuffle on the probe path.
  */
class WinnowStateSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Map[Long, (Long, Long)] =
    df.select(col("doc_id"), col("n_fp"), col("n_dup"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def docsAll = Sql.table(spark, sf, "documents")
    .select(col("doc_id"), col("text").as("t"))

  test("probe ≡ full recompute restricted to the batch, across two committed drops") {
    val corpus = docsAll.filter(col("doc_id") % 4 =!= 0)
    val drop1 = docsAll.filter(col("doc_id") % 8 === 0)
    val drop2 = docsAll.filter(col("doc_id") % 8 === 4)
    val dir = java.nio.file.Files.createTempDirectory("winnow-inc").toString

    WinnowState.save(corpus, dir, w = 8)
    val got1 = rows(WinnowState.probe(drop1, dir, w = 8))
    val full1 = rows(Mining.winnowDupCoverage(corpus.union(drop1), w = 8)
      .filter(col("doc_id") % 8 === 0))
    assert(got1 == full1, s"drop1 diverged: ${got1.toSet -- full1.toSet}")

    // drop2 scores against corpus ∪ drop1 ∪ drop2: the committed first
    // drop must count (cross-batch duplicates detected, no corpus
    // text ever re-read)
    val got2 = rows(WinnowState.probe(drop2, dir, w = 8))
    val full2 = rows(
      Mining.winnowDupCoverage(corpus.union(drop1).union(drop2), w = 8)
        .filter(col("doc_id") % 8 === 4))
    assert(got2 == full2, s"drop2 diverged: ${got2.toSet -- full2.toSet}")
  }

  test("a planted cross-batch duplicate is caught by the state probe") {
    import spark.implicits._
    val base = "x" * 25 + docsAll.limit(1).select("t").as[String].head()
    val corpus = Seq((1L, base + " corpus tail marker")).toDF("doc_id", "t")
    // batch doc shares base's long prefix (≥ 20+w-1 chars) but has no
    // in-batch duplicate: every dup fingerprint comes from the STATE
    val batch = Seq(
      (100L, base + " completely different ending here"),
      (101L, "no overlap with anything else at all " + "z" * 40))
      .toDF("doc_id", "t")
    val dir = java.nio.file.Files.createTempDirectory("winnow-planted").toString
    WinnowState.save(corpus, dir, w = 8)
    val got = rows(WinnowState.probe(batch, dir, w = 8))
    assert(got(100L)._2 > 0, s"shared prefix not detected: $got")
    assert(got(101L)._2 == 0, s"phantom duplicate: $got")
  }

  test("a batch that widens the frozen rung fails loudly") {
    import spark.implicits._
    val corpus = docsAll.filter(col("doc_id") % 4 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("winnow-rung").toString
    WinnowState.save(corpus, dir, w = 8)
    // 70k grams of deterministic non-repeating-ish text > the 16-bit rung
    val big = Seq((999L, Seq.tabulate(70020)(i =>
      ('a' + (i * 2654435761L % 26).toInt).toChar).mkString))
      .toDF("doc_id", "t")
    val e = intercept[IllegalArgumentException] {
      WinnowState.probe(big, dir, w = 8)
    }
    assert(e.getMessage.contains("rebuild the state"), e.getMessage)
  }

  test("the corpus state never shuffles on the probe path (plan assertion)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    val corpus = docsAll.filter(col("doc_id") % 4 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("winnow-plan").toString
    WinnowState.save(corpus, dir, w = 8)
    val probeFps = Seq(1L, 2L, 3L).toDF("fp").localCheckpoint()
    val plan = WinnowState.relevantState(spark, dir, probeFps)
      .queryExecution.sparkPlan
    def shufflesOutsideBroadcast(p: SparkPlan): Seq[SparkPlan] = p match {
      case _: BroadcastExchangeLike => Nil
      case s: ShuffleExchangeLike => s +: s.children.flatMap(shufflesOutsideBroadcast)
      case other => other.children.flatMap(shufflesOutsideBroadcast)
    }
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty, plan.toString)
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty, plan.toString)
    assert(shufflesOutsideBroadcast(plan).isEmpty, plan.toString)
  }
}
