package graft

import org.apache.spark.sql.functions._

/** q191_join_order_advisor: the predictions are EXACT, so the spec
  * runs the joins it priced and demands equality — predicted
  * intermediates equal the real intermediate counts, the predicted
  * final equals the real 3-way join count, and the advised order is
  * the argmin intermediate.
  */
class JoinOrderSpec extends SparkSuite {

  test("predictions ≡ executed join cardinalities; advice = argmin") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q191_join_order_advisor")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 3)
    val m = rows.map(r => r._1 -> r._2).toMap
    val advised = rows.head._3
    assert(rows.forall(_._3 == advised))

    val c = spark.read.parquet(s"$dir/customer.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val coReal = o.join(c, o("o_custkey") === c("c_custkey")).count()
    val olReal = o.join(l, o("o_orderkey") === l("l_orderkey")).count()
    val finReal = c.join(o, o("o_custkey") === c("c_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey")).count()
    assert(m("customer_orders_first") == coReal)
    assert(m("orders_lineitem_first") == olReal)
    assert(m("final") == finReal)
    val want =
      if (coReal < olReal || (coReal == olReal)) "customer_orders_first"
      else "orders_lineitem_first"
    assert(advised == want, s"advised $advised, want $want")
  }

  test("orphan orders (no matching customer) still price into |o⋈l|") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("joinorder").toString
    // order 30 references customer 99 — absent (the q177 fk-violation
    // shape); its 4 lineitems must still count in the o⋈l intermediate
    Seq(1L, 2L).map(Tuple1(_)).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 1L), (20L, 2L), (30L, 99L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    (Seq.fill(2)(10L) ++ Seq(20L) ++ Seq.fill(4)(30L)).map(Tuple1(_)).toDF("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val m = SparkEntry.queries("q191_join_order_advisor")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("customer_orders_first") == 2L) // orders with a customer
    assert(m("orders_lineitem_first") == 7L,
      "orphan order's lineitems dropped from the o⋈l prediction")
    assert(m("final") == 3L) // only customer-matched orders' lineitems
  }
}
