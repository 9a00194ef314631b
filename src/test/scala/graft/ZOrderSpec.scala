package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q103 (Z-order layout): the multi-dimensional pruning property the
  * Morton interleave exists for — every z-range bucket bounds BOTH
  * clustering keys, where a single-column sort bounds only its own.
  */
class ZOrderSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("every z-bucket bounds the partkey range by construction") {
    val rows = SparkEntry.queries("q103_zorder_layout")(spark, sf).collect()
    assert(rows.length >= 4, s"degenerate bucketing: ${rows.length} buckets")
    rows.foreach { r =>
      val (minX, maxX) = (r.getLong(2), r.getLong(3))
      // bucket = z div 2^18 fixes x bits >= 9 -> range < 512, data-
      // independently (the per-file min/max tightness a scan prunes on)
      assert(maxX - minX < 512L, s"bucket ${r.getLong(0)}: x range ${maxX - minX}")
    }
    val total = rows.map(_.getLong(1)).sum
    val expected = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(total == expected, s"buckets must partition the table: $total != $expected")
  }

  test("z-order beats a single-column sort on the other dimension") {
    import spark.implicits._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_partkey".as("x"), $"l_suppkey".as("y"))
    val nBuckets = SparkEntry.queries("q103_zorder_layout")(spark, sf).count().toInt
    // equal-count buckets of a suppkey-SORTED layout: each file bounds
    // y but sees ~the whole partkey range
    val n = li.count()
    val sorted = li
      .withColumn("rk", row_number().over(Window.orderBy($"y", $"x")))
      .withColumn("bucket", (($"rk" - 1) * nBuckets / n).cast("long"))
      .groupBy($"bucket")
      .agg((max($"x") - min($"x")).cast("double").as("xr")).collect()
      .map(_.getDouble(1))
    val zRanges = SparkEntry.queries("q103_zorder_layout")(spark, sf).collect()
      .map(r => (r.getLong(3) - r.getLong(2)).toDouble)
    val (zAvg, sAvg) = (zRanges.sum / zRanges.length, sorted.sum / sorted.length)
    info(f"avg partkey range per bucket: z-order $zAvg%.0f vs suppkey-sorted $sAvg%.0f")
    assert(zAvg * 2 < sAvg,
      s"z-order should bound the non-sorted dimension: z=$zAvg sorted=$sAvg")
  }
}
