package graft

import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** ops.Smb: a join + key-grouped agg over two bucketBy(8, key)
  * .sortBy(key) tables must execute with ZERO Exchange and ZERO Sort
  * (non-vacuously: the SortMergeJoin node must be present — the plan
  * really is a merge join fed by bucketed scans, not a broadcast that
  * would dodge the assertion), and the result must equal the plain
  * shuffled join. Executed AQE plan, post-action — sparkPlan would
  * pass vacuously (EnsureRequirements adds exchanges later).
  */
class SmbSpec extends SparkSuite {

  private def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      Seq(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      Seq(r.child)
    case other => other.children
  }
  private def all(p: SparkPlan): Seq[SparkPlan] = p +: kids(p).flatMap(all)

  test("bucketed join+agg: no exchange, no sort, result exact") {
    import spark.implicits._
    val loc = java.nio.file.Files.createTempDirectory("smb-spec").toString
    val left = (1L to 400L).map(k => (k, k * 10L)).toDF("k", "a")
    val right = (1L to 400L).flatMap(k =>
      Seq((k, k + 1000L), (k, k + 2000L))).toDF("k", "b")
    graft.ops.Smb.saveBucketed(left, "graft_smb_spec", loc, "l", "k", 8)
    graft.ops.Smb.saveBucketed(right, "graft_smb_spec", loc, "r", "k", 8)

    // broadcast joins would dodge the exchange assertion — force the
    // merge path the way a fact-fact join at scale takes it
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = graft.ops.Smb.read(spark, "graft_smb_spec", "l")
        .join(graft.ops.Smb.read(spark, "graft_smb_spec", "r"), "k")
        .groupBy($"k")
        .agg(max($"a").as("a"), sum($"b").cast("long").as("sb"))
      val got = joined.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (1L to 400L)
        .map(k => (k, k * 10L, (k + 1000L) + (k + 2000L))).toSet
      assert(got == want)

      val nodes = all(joined.queryExecution.executedPlan)
      assert(nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
        "no merge join — the assertion would be vacuous:\n" +
          joined.queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeLike]),
        "bucketed join/agg shuffled:\n" + joined.queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[SortExec]),
        "bucketed sortBy layout re-sorted:\n" +
          joined.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }
}
