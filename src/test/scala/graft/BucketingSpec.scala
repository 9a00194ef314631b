package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Shuffle-elimination evidence for SCALING.md's bucketing claim: a
  * fact-fact join on tables bucketed by the join key plans without an
  * Exchange on either side.
  */
class BucketingSpec extends SparkSuite {

  test("bucketed fact-fact join plans with no shuffle exchange") {
    import spark.implicits._
    // warehouse dir is a static conf, set in SparkSuite's builder
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")

    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_b")

    // at this tiny sf AQE would broadcast; disable it so the plan shows
    // the bucketed co-located sort-merge path a fact-fact join takes
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan = try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"))
      joined.collect()
      joined.queryExecution.executedPlan.toString
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    // the join itself must consume bucketed scans directly — the only
    // allowed exchange is the one feeding the final aggregation
    val joinPart = plan.split("HashAggregate").last
    assert(joinPart.contains("SortMergeJoin") || joinPart.contains("ShuffledHashJoin"),
      s"unexpected join strategy:\n$plan")
    assert(!joinPart.contains("Exchange"),
      s"bucketed join still shuffles:\n$plan")

    // and it must agree with the unbucketed join
    val direct = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .join(spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bucketed = spark.table("li_b")
      .join(spark.table("ord_b"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bucketed === direct)
  }
}
