package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — a first-class 100 TB lever:
  * when one join side is selectively filtered, Spark can build a bloom
  * filter from it at runtime and apply it to the other side's SCAN,
  * discarding non-joining rows before the shuffle. Off by default; the
  * spec turns it on with thresholds scaled to the local testdata and
  * proves (a) the filter is injected into the plan and (b) results are
  * identical with and without it — evidence that the engine's join
  * shapes are eligible for the optimization at scale, where the
  * default thresholds (10 MB creation side) engage on their own.
  */
class RuntimeFilterSpec extends SparkSuite {

  test("runtime bloom filter injects on a selective fact-fact join and preserves results") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    def query() = {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val ord = spark.read.parquet(s"$sf/orders.parquet")
        .filter($"o_totalprice" > 250000) // selective build side
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
    }

    val baseline = query().collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    // broadcast joins bypass the bloom path at this tiny scale — force
    // the shuffle-join shape the filter exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = query()
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
        s"runtime bloom filter not injected:\n$optimized")
      val filtered = df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(filtered === baseline, "bloom filter changed results")
    } finally {
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
