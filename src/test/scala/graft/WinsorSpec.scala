package graft

import org.apache.spark.sql.functions._

/** q181_winsorized_stats: 100 arithmetic prices 1..99 plus one 10⁶
  * outlier — p01/p99 are the exact nearest-rank order statistics
  * (ceil(p·n)), the outlier clamps to p99, and the winsorized mean is
  * computable by hand in exact decimals.
  */
class WinsorSpec extends SparkSuite {

  test("nearest-rank cuts, clamp counts and winsorized mean are exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winsor").toString
    // prices 1..99 and 1,000,000 → n = 100; p01 rank = ceil(1) = 1
    // → lo = 1; p99 rank = ceil(99) = 99 → hi = 99 (the outlier at
    // rank 100 is the only clamp; nothing is below lo)
    val rows = ((1 to 99).map(_.toDouble) :+ 1000000.0).zipWithIndex
      .map { case (p, i) => (i.toLong + 1, 1L, p) }
    rows.toDF("l_orderkey", "l_linenumber", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val r = SparkEntry.queries("q181_winsorized_stats")(spark, dir)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getDouble(0) == 1.0, "p01")
    assert(row.getDouble(1) == 99.0, "p99")
    assert(row.getLong(2) == 100L, "n")
    assert(row.getLong(3) == 0L, "n_clamped_lo")
    assert(row.getLong(4) == 1L, "n_clamped_hi")
    // Σ 1..99 = 4950, outlier clamps to 99 → 5049
    assert(row.getDouble(5) == 5049.0, "winsorized_sum")
    assert(row.getDouble(6) == 50.49, "winsorized_mean")
  }
}
