package graft

import org.apache.spark.sql.functions._

/** AQE skew-join splitting — the other runtime lever SCALING.md leans
  * on for hot keys (salting handles aggregations; AQE handles joins).
  * A 90%-one-key join with thresholds scaled to local data must show
  * the sort-merge join consuming skew-split partitions, with results
  * identical to the unsplit run — evidence the engine's join shapes
  * are eligible where the at-scale defaults (256 MB) engage on their
  * own.
  */
class SkewJoinSpec extends SparkSuite {

  test("AQE splits the skewed partition of a hot-key join and preserves results") {
    import spark.implicits._
    // ~200k rows, 90% on key 0; right side small but non-broadcastable
    val left = spark.range(0, 200000)
      .select(when($"id" % 10 < 9, lit(0L)).otherwise($"id" % 1000).as("k"),
        ($"id" * 7 % 1000).as("v"))
    val right = spark.range(0, 1000).select($"id".as("k"), ($"id" % 7).as("w"))

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"w").agg(count(lit(1)).as("n"), sum($"v").as("sv"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val baseline = agg(left.join(right, "k"))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // inspect the executed df itself: AQE's final plan (with skew
      // splits) only exists after the action runs on that plan
      val df = left.join(right, "k").groupBy($"w")
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      val result = df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in plan:\n$plan")
      assert(result === baseline, "skew split changed results")
    } finally {
      Seq("spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "spark.sql.autoBroadcastJoinThreshold").foreach(spark.conf.unset)
    }
  }
}
