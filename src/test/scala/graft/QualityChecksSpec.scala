package graft

import org.apache.spark.sql.functions._

/** q177_quality_checks: an engineered fixture with KNOWN violations —
  * a duplicated PK, an out-of-range quantity, a negative price, an
  * orphaned FK row — must be counted exactly, and the clean checks
  * must pass. The real-corpus run (all-green on TPC-H-shaped data) is
  * pinned by the oracle; this spec pins the VIOLATION arithmetic.
  */
class QualityChecksSpec extends SparkSuite {

  test("violations are counted exactly and gate pass bits") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qc").toString
    // lineitem: 5 rows — rows 1/2 duplicate the PK (1,1); row 3 has
    // quantity 99 (out of [1,50]); row 4 has price -5; row 5 clean.
    // Row 4 also references an order that doesn't exist (orphan FK).
    Seq(
      (1L, 1L, 10.0, 100.0, 0.05, "A", "1995-01-01"),
      (1L, 1L, 20.0, 200.0, 0.05, "N", "1995-01-02"),
      (2L, 1L, 99.0, 300.0, 0.05, "R", "1995-01-03"),
      (9L, 1L, 30.0, -5.0, 0.05, "A", "1995-01-04"),
      (2L, 2L, 40.0, 400.0, 0.05, "N", "1995-01-05"))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_returnflag", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // orders: keys 1 and 2 exist (9 is the orphan); one bad status;
    // custkey 7 has no customer row (orphan the other way).
    Seq(
      (1L, 7L, "O", 100.0),
      (2L, 8L, "X", 200.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((8L, "c8")).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val got = SparkEntry.queries("q177_quality_checks")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.size == 11)
    assert(got(("lineitem", "quantity_in_1_50")) == ((5L, 1L, 0L)))
    assert(got(("lineitem", "price_positive")) == ((5L, 1L, 0L)))
    assert(got(("lineitem", "discount_in_0_0.1")) == ((5L, 0L, 1L)))
    assert(got(("lineitem", "returnflag_domain")) == ((5L, 0L, 1L)))
    assert(got(("lineitem", "shipdate_complete")) == ((5L, 0L, 1L)))
    assert(got(("lineitem", "pk_unique")) == ((5L, 1L, 0L)))
    assert(got(("lineitem", "fk_l_orderkey")) == ((5L, 1L, 0L)))
    assert(got(("orders", "pk_unique")) == ((2L, 0L, 1L)))
    assert(got(("orders", "orderstatus_domain")) == ((2L, 1L, 0L)))
    assert(got(("orders", "totalprice_positive")) == ((2L, 0L, 1L)))
    assert(got(("orders", "fk_o_custkey")) == ((2L, 1L, 0L)))
  }
}
