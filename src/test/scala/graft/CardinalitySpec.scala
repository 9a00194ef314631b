package graft

import org.apache.spark.sql.functions._

/** q185_join_cardinality: hand-built key histograms — the predicted
  * cardinality must equal Σ cA·cB exactly (verified against the REAL
  * join's count), matching keys counted, the hottest key and its
  * share identified, and keys missing from either side contribute
  * nothing.
  */
class CardinalitySpec extends SparkSuite {

  test("predicted rows ≡ Σ ca·cb ≡ the actual join; skew read exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("card").toString
    // orders keys: 1×3, 2×1, 9×1 (9 unmatched);
    // lineitem l_orderkey: 1×2, 2×4, 7×1 (7 unmatched)
    // → matches {1: 3·2=6, 2: 1·4=4} → predicted 10, top key 1 (6, .6)
    val orders = Seq((1L, 1L, 10.0), (1L, 2L, 10.0), (1L, 3L, 10.0),
      (2L, 4L, 10.0), (9L, 5L, 10.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val li = Seq((1L, 100L), (1L, 101L), (2L, 102L), (2L, 103L),
      (2L, 104L), (2L, 105L), (7L, 106L))
      .toDF("l_orderkey", "l_partkey")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((100L, "p")).toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((1L, "c"), (4L, "c")).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val got = SparkEntry.queries("q185_join_cardinality")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got(("orders_lineitem")) == ((2L, 10L, 1L, 6L, 0.6)),
      s"ol: ${got.get("orders_lineitem")}")
    // the profile must equal the join it never ran
    val actual = orders.join(li, $"o_orderkey" === $"l_orderkey").count()
    assert(actual == 10L)
    // part_lineitem: part key 100 appears once, lineitem has one
    // l_partkey=100 row → 1 key, 1 row, share 1.0
    assert(got(("part_lineitem")) == ((1L, 1L, 100L, 1L, 1.0)),
      s"pl: ${got.get("part_lineitem")}")
    // customer_orders: custkey 1 → 1·1, custkey 4 → 1·1 (orders
    // custkeys are 1..5, customers 1 and 4) → 2 keys, 2 rows, top
    // key 4 (max struct tie on contrib breaks to the larger key)
    assert(got(("customer_orders")) == ((2L, 2L, 4L, 1L, 0.5)),
      s"co: ${got.get("customer_orders")}")
  }
}
