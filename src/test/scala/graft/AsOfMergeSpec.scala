package graft

import graft.plans.AsOfMerge
import org.apache.spark.sql.functions._

/** The custom sort-merge as-of operator (logical node + strategy +
  * SparkPlan) must agree with both composed strategies on the tricky
  * cases (empty history, time ties, unmatched keys), produce the exact
  * q39 result on real data, and plan as a co-partitioned merge — no
  * broadcast, no cartesian, the custom exec visible in the plan.
  */
class AsOfMergeSpec extends SparkSuite {

  test("custom merge operator handles empty history, ties, and unmatched keys") {
    import spark.implicits._
    val left = Seq(
      (10L, 1L, 5L), (11L, 1L, 25L), (12L, 1L, 99L), (13L, 2L, 50L)
    ).toDF("id", "k", "t")
    val right = Seq(
      (1L, 20L, 100L), (1L, 20L, 101L), (1L, 30L, 102L)
    ).toDF("rk", "rt", "seq")

    val out = AsOfMerge.join(left, $"k", $"t", right, $"rk", $"rt", Seq($"seq"))
      .select($"id", $"seq")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out === Map(
      10L -> None, // before the key's first right row
      11L -> Some(101L), // t=20 tie -> larger seq wins
      12L -> Some(102L),
      13L -> None)) // key with no right rows
  }

  test("string keys: a key with no matches does not inherit the previous key's buffered row") {
    import spark.implicits._
    // equal-length string keys back-to-back in sort order — the exact
    // shape where a buffer-aliased curKey made the key-change check
    // compare a stale view and leak "aa"'s match into "bb"
    val left = Seq((1L, "aa", 10L), (2L, "bb", 10L), (3L, "cc", 10L)).toDF("id", "k", "t")
    val right = Seq(("aa", 5L, 7L), ("cc", 6L, 9L)).toDF("rk", "rt", "seq")
    val out = AsOfMerge.join(left, $"k", $"t", right, $"rk", $"rt", Seq($"seq"))
      .select($"id", $"seq")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out === Map(1L -> Some(7L), 2L -> None, 3L -> Some(9L)))
  }

  test("q69 (custom operator) returns exactly q39's rows and plans as a merge") {
    val sf = "/root/testdata/sf0.001"
    val custom = SparkEntry.queries("q69_asof_merge")(spark, sf)
    val rows = custom.collect().map(_.toSeq).toSet
    val packed = SparkEntry.queries("q39_asof_join")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(rows.nonEmpty)
    assert(rows === packed)

    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), plan) // SparkPlan trims the Exec suffix
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"), plan)
    // both children arrive hash-partitioned and sorted (Catalyst
    // inserted them from the declared requirements; under AQE the
    // exchanges surface as shuffle query stages)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size +
      "ShuffleQueryStage".r.findAllIn(plan).size
    assert(shuffles >= 2, plan)
    assert("Sort \\[".r.findAllIn(plan).size >= 2, plan)
  }

  test("all three strategies agree on a generated many-key corpus with ties and matchless keys") {
    import spark.implicits._
    // deterministic arithmetic corpus: 37 left keys, right rows only
    // for keys 0..29 (keys 30..36 matchless), repeated (k, rt) pairs
    // exercising the seq tiebreak, times interleaved across keys
    val left = (0 until 2000).map(i => (i.toLong, (i % 37).toLong, ((i * 31) % 200).toLong))
      .toDF("id", "k", "t")
    // rt = (j*20) % 200 collides for j ≡ j' (mod lcm(41,10)=410), so
    // real (rk, rt) tie groups with distinct seq exist below 1500
    val rightRows = (0 until 1500).filter(j => j % 41 < 30)
      .map(j => ((j % 41).toLong, ((j * 20) % 200).toLong, j.toLong))
    val right = rightRows.toDF("rk", "rt", "seq")
    assert(rightRows.map(r => (r._1, r._2)).distinct.size < rightRows.size,
      "fixture must contain (key, time) ties for the seq tiebreak")

    def toMapOf(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
      df.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    val packed = toMapOf(graft.ops.AsOfJoin.packedHistory(
        left, $"k", $"t", right, $"rk", struct($"rt", $"seq"), "rt", broadcastHist = false)
      .select($"id", $"asof.seq"))
    val ranged = toMapOf(graft.ops.AsOfJoin.rangeWindow(
        left, $"k", $"t", $"id", right, $"rk", struct($"rt", $"seq"), "rt")
      .select($"id", $"asof.seq"))
    val merged = toMapOf(AsOfMerge.join(
        left, $"k", $"t", right, $"rk", $"rt", Seq($"seq"))
      .select($"id", $"seq"))

    assert(packed.size === 2000)
    assert(packed.exists(_._2.isEmpty), "fixture must contain matchless keys")
    assert(packed.exists(_._2.nonEmpty), "fixture must contain matches")
    assert(ranged === packed)
    assert(merged === packed)
  }

  test("left-only filters push through the opaque custom node to the scan") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val e = graft.Sql.table(spark, sf, "events")
    val o = graft.Sql.table(spark, sf, "orders").select($"o_orderkey", $"o_custkey",
      $"o_orderdate".cast("timestamp").as("o_orderdate"))
    val joined = AsOfMerge.join(
        e, $"user_id" % 1500, $"ts",
        o, $"o_custkey", $"o_orderdate", Seq($"o_orderkey"))
      .filter($"user_id" < 50 && $"o_orderkey".isNotNull)

    val optimized = joined.queryExecution.optimizedPlan.toString
    // the user_id predicate must sit BELOW the custom node...
    val nodeIdx = optimized.indexOf("AsOfMergeJoin")
    val predIdx = optimized.indexOf("user_id#", optimized.indexOf("Filter", nodeIdx))
    assert(nodeIdx >= 0 && predIdx > nodeIdx,
      s"left filter did not push below the custom node:\n$optimized")
    // ...and reach the parquet scan as a pushed filter, while the
    // right-side (match) predicate stays above the join
    val physical = joined.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*LessThan\\(user_id,50\\)".r.findFirstIn(physical).isDefined,
      s"predicate did not reach the scan:\n$physical")
    assert(joined.count() ===
      SparkEntry.queries("q69_asof_merge")(spark, sf)
        .filter($"user_id" < 50).count())
  }

  test("the extensions injection path plans the custom node without runtime registration") {
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    val prevDefault = org.apache.spark.sql.SparkSession.getDefaultSession
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-asof-ext")
      .withExtensions(new graft.functions.GraftExtensions())
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import s2.implicits._
      val left = Seq((1L, 1L, 10L)).toDF("id", "k", "t")
      val right = Seq((1L, 5L, 7L)).toDF("rk", "rt", "seq")
      // build the node through the bridge WITHOUT AsOfMerge.join's
      // addStrategy call: only the injected strategy can plan it
      val node = graft.plans.AsOfMergeJoin(
        left.queryExecution.analyzed, right.queryExecution.analyzed,
        AsOfMerge.resolve(left, $"k"), AsOfMerge.resolve(left, $"t"),
        AsOfMerge.resolve(right, $"rk"), AsOfMerge.resolve(right, $"rt"),
        Seq(AsOfMerge.resolve(right, $"seq")))
      val res = org.apache.spark.sql.GraftSqlBridge.ofRows(s2, node).collect()
      assert(res.length === 1 && res(0).getLong(5) === 7L)
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      prevDefault.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
      prevActive.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
    }
  }
}
