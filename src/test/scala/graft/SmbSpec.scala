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

  test("q186 consumer: the full-outer reconcile runs exchange- and sort-free") {
    import spark.implicits._
    // broadcast would dodge the assertion AND full-outer can't
    // broadcast anyway — but force the merge path explicitly so the
    // check stays non-vacuous if the query ever changes join type
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q186_smb_column_diff")(
        spark, "/root/testdata/sf0.001")
      // identical answer to the live-frame q178
      val want = SparkEntry.queries("q178_column_diff")(
        spark, "/root/testdata/sf0.001").collect().map(_.toSeq).toSet
      val got = df.collect().map(_.toSeq).toSet
      assert(got == want && got.nonEmpty)
      val nodes = all(df.queryExecution.executedPlan)
      assert(nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
        "no merge join — vacuous:\n" + df.queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeLike]),
        "bucketed column-diff reconcile shuffled:\n" +
          df.queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[SortExec]),
        "bucketed sortBy layout re-sorted:\n" + df.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("sortedScans: scoped conf elides the Sorts and restores after") {
    import spark.implicits._
    val loc = java.nio.file.Files.createTempDirectory("smb-scoped").toString
    val df = (1L to 200L).map(k => (k, k)).toDF("k", "a")
    graft.ops.Smb.saveBucketed(df, "graft_smb_scoped", loc, "l", "k", 4)
    graft.ops.Smb.saveBucketed(df, "graft_smb_scoped", loc, "r", "k", 4)
    val key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(key, "false")
    try {
      val plan = graft.ops.Smb.sortedScans(spark) {
        // build AND act inside the scope — the contract
        val j = spark.table("graft_smb_scoped.l")
          .join(spark.table("graft_smb_scoped.r"), "k")
        assert(j.count() == 200L)
        j.queryExecution.executedPlan
      }
      val nodes = all(plan)
      assert(nodes.exists(_.isInstanceOf[SortMergeJoinExec]))
      assert(!nodes.exists(_.isInstanceOf[SortExec]),
        "sortedScans scope did not elide the bucketed Sorts:\n" + plan)
      assert(spark.conf.get(key) == "false", "conf not restored")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
      spark.conf.unset(key)
    }
  }

  test("ensureBucketed rebuilds when the source data changes in place") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("smb-fp").toString
    def write(v: Long) = (1L to 10L).map(k => (k, v)).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    def fp() = graft.ops.Smb.sourceFingerprint(spark, s"$dir/t.parquet")
    write(1L)
    var builds = 0
    def ensure() = graft.ops.Smb.ensureBucketed(
      spark, "graft_smb_fp", "t_b", "k", 2, fp()) {
      builds += 1
      spark.read.parquet(s"$dir/t.parquet")
    }
    ensure(); ensure()
    assert(builds == 1, "same data must hit the cache")
    assert(graft.ops.Smb.read(spark, "graft_smb_fp", "t_b")
      .agg(sum($"v")).head().getLong(0) == 10L)
    Thread.sleep(1100) // mtime granularity
    write(2L) // overwrite in place — the stale-layout scenario
    ensure()
    assert(builds == 2, "changed data served a stale layout")
    assert(graft.ops.Smb.read(spark, "graft_smb_fp", "t_b")
      .agg(sum($"v")).head().getLong(0) == 20L)
  }

  test("saveBucketed rejects a db relocation and bad identifiers") {
    import spark.implicits._
    val df = (1L to 4L).toDF("k")
    val loc = java.nio.file.Files.createTempDirectory("smb-guard").toString
    graft.ops.Smb.saveBucketed(df, "graft_smb_guard", loc, "t1", "k", 2)
    // same db, same location: fine
    graft.ops.Smb.saveBucketed(df, "graft_smb_guard", loc, "t2", "k", 2)
    // same db, DIFFERENT location: CREATE DATABASE IF NOT EXISTS would
    // silently keep the old one — must fail loudly instead
    val other = java.nio.file.Files.createTempDirectory("smb-guard2").toString
    val e = intercept[IllegalArgumentException] {
      graft.ops.Smb.saveBucketed(df, "graft_smb_guard", other, "t3", "k", 2)
    }
    assert(e.getMessage.contains("already exists"))
    intercept[IllegalArgumentException] {
      graft.ops.Smb.saveBucketed(df, "bad-db;drop", loc, "t", "k", 2)
    }
    intercept[IllegalArgumentException] {
      graft.ops.Smb.saveBucketed(df, "graft_smb_guard", loc, "t'x", "k", 2)
    }
  }
}
