package graft

import org.apache.spark.sql.functions._

/** q167_revenue_pareto: 20 customers with arithmetic revenues — the
  * decile table is computable by hand (2 customers per decile, exact
  * decimal sums, shares as single divisions).
  */
class ParetoSpec extends SparkSuite {

  test("deciles, revenue mass and shares ≡ hand computation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pareto").toString
    // customer k has one order of 100·k and one of 10 — revenue
    // strictly increasing in k, so deciles are {20,19},{18,17},…
    val orders = (1 to 20).flatMap(k =>
      Seq((100L * k + 1, k.toLong, 100.0 * k), (100L * k + 2, k.toLong, 10.0)))
    orders.toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val rev = (1 to 20).map(k => k.toLong -> (100.0 * k + 10.0)).toMap
    val total = rev.values.sum
    val want = (1 to 10).map { d =>
      val members = Seq(21L - (2 * d - 1), 21L - 2 * d) // revenue desc
      val drev = members.map(rev).sum
      (d.toLong, 2L, drev, drev / total)
    }

    val rows = SparkEntry.queries("q167_revenue_pareto")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq.sortBy(_._1)
    assert(rows == want, s"got $rows\nwant $want")
    // the concentration read: top decile's share is the largest
    assert(rows.head._4 == rows.map(_._4).max)
  }
}
