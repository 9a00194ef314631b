package graft

import org.apache.spark.sql.functions._

class StatsSpec extends SparkSuite {

  test("approx_count_distinct is within 5% of exact per group") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q37_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"group $k: approx=$a exact=$e")
    }
  }
}
