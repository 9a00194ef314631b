package graft.queries

import graft.Q
import graft.Sql._
import org.apache.spark.sql.functions._

/** Classic TPC-H-shaped analytics (Q3/Q5/Q10 analogs) over the testdata
  * star schema — deeper join trees than the operator-focused queries:
  * selective dimension filters pushed to scans, multi-way joins with
  * broadcast dims, decimal-exact revenue aggregation, top-k output.
  */
object Tpch {

  private val revSql =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) AS DECIMAL(22,4))"

  val all: Seq[Q] = Seq(
    // Q3 analog: shipping-priority — revenue of unshipped orders for a
    // market segment, top 10.
    Q(
      "q40_shipping_priority",
      (s, dir) => {
        import s.implicits._
        val cust = table(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
        val ord = table(s, dir, "orders")
          .filter($"o_orderdate" < lit("1998-01-01 00:00:00").cast("timestamp"))
        val li = table(s, dir, "lineitem")
          .filter($"l_shipdate" > lit("1997-01-01 00:00:00").cast("timestamp"))
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(cust), $"o_custkey" === $"c_custkey")
          .groupBy($"l_orderkey", tsStr($"o_orderdate").as("orderdate"))
          .agg(out(sum(discPrice($"l_extendedprice", $"l_discount"))).as("revenue"))
          .orderBy($"revenue".desc, $"l_orderkey".asc)
          .limit(10)
      },
      Some(s"""
        SELECT l_orderkey,
          strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate,
          CAST(sum($revSql) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // Q5 analog: local-supplier volume — 6-way join (region → nation →
    // customer/supplier colocation → orders → lineitem), revenue per
    // nation in a date window.
    Q(
      "q41_local_supplier_volume",
      (s, dir) => {
        import s.implicits._
        val reg = table(s, dir, "region")
        val nat = table(s, dir, "nation")
        val cust = table(s, dir, "customer")
        val sup = table(s, dir, "supplier")
        val ord = table(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1996-01-01 00:00:00").cast("timestamp") &&
            $"o_orderdate" < lit("1998-01-01 00:00:00").cast("timestamp"))
        val li = table(s, dir, "lineitem")
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(cust), $"o_custkey" === $"c_custkey")
          .join(broadcast(sup),
            $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
          .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(out(sum(discPrice($"l_extendedprice", $"l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some(s"""
        SELECT r_name, n_name,
          CAST(sum($revSql) AS DOUBLE) AS revenue,
          count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY r_name, n_name""")),

    // Q10 analog: returned-item reporting — top 20 customers by revenue
    // lost to returns in a quarter.
    Q(
      "q42_returned_items",
      (s, dir) => {
        import s.implicits._
        val li = table(s, dir, "lineitem").filter($"l_returnflag" === "R")
        val ord = table(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1997-01-01 00:00:00").cast("timestamp") &&
            $"o_orderdate" < lit("1997-04-01 00:00:00").cast("timestamp"))
        val cust = table(s, dir, "customer")
        val nat = table(s, dir, "nation")
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(cust), $"o_custkey" === $"c_custkey")
          .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
          .groupBy($"c_custkey", $"c_name", $"n_name")
          .agg(out(sum(discPrice($"l_extendedprice", $"l_discount"))).as("revenue"))
          .orderBy($"revenue".desc, $"c_custkey".asc)
          .limit(20)
      },
      Some(s"""
        SELECT c_custkey, c_name, n_name,
          CAST(sum($revSql) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // ---------------------------------------------------------------- q182
    // SORT-MERGE-BUCKET JOIN AT REST (ops.Smb) — the co-located-join
    // lever itself: orders and lineitem are first WRITTEN
    // bucketBy(8, orderkey).sortBy(orderkey) as managed tables, then
    // the per-order revenue join+agg runs against the bucketed
    // layouts with ZERO exchange and ZERO sort in the executed plan
    // (SmbSpec asserts both, non-vacuously) — the shuffle is paid
    // once at layout-build time and amortized over every later join
    // keyed on orderkey. This is the at-rest answer to the q03-style
    // fact-fact join that otherwise shuffles both sides every run.
    //
    // Scale shape: at 100 TB the bucketed write is the one-time
    // backfill; every downstream join/groupBy on the bucket key is
    // scan-local per bucket pair. Bucket counts must match across
    // the subject area (Spark only aligns equal counts shuffle-free).
    // Output kept delta-sized by the %50 key filter, which prunes in
    // BOTH bucketed scans before the merge. The layout builds ONCE
    // per JVM+source (Smb.ensureBucketed) — reruns hit the catalog
    // and pay only the scan-local join, which is the whole point of
    // paying the shuffle at write time.
    Q(
      "q182_smb_join",
      (s, dir) => {
        import s.implicits._
        val h = (dir.hashCode & 0x7fffffff).toString
        // data fingerprint, not just the path hash: an overwritten
        // source (or a hash-aliased path) must rebuild, never serve
        // the stale layout
        val fpO = graft.ops.Smb.sourceFingerprint(s, s"$dir/orders.parquet")
        val fpL = graft.ops.Smb.sourceFingerprint(s, s"$dir/lineitem.parquet")
        graft.ops.Smb.ensureBucketed(s, "graft_smb", s"orders_b_$h",
          "o_orderkey", 8, fpO)(
          table(s, dir, "orders")
            .select($"o_orderkey", $"o_custkey", dec($"o_totalprice").as("o_total")))
        graft.ops.Smb.ensureBucketed(s, "graft_smb", s"lineitem_b_$h",
          "o_orderkey", 8, fpL)(
          table(s, dir, "lineitem")
            .select($"l_orderkey".as("o_orderkey"),
              discPrice($"l_extendedprice", $"l_discount").as("rev")))
        graft.ops.Smb.read(s, "graft_smb", s"lineitem_b_$h")
          .join(graft.ops.Smb.read(s, "graft_smb", s"orders_b_$h"), "o_orderkey")
          .filter($"o_orderkey" % 50 === 0)
          .groupBy($"o_orderkey")
          .agg(count(lit(1)).cast("long").as("n_items"),
            max($"o_custkey").as("o_custkey"),
            out(max($"o_total")).as("o_total"),
            out(sum($"rev")).as("revenue"))
      },
      Some(s"""
        SELECT l_orderkey AS o_orderkey,
          CAST(count(*) AS BIGINT) AS n_items,
          max(o_custkey) AS o_custkey,
          CAST(max(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS o_total,
          CAST(sum($revSql) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_orderkey % 50 = 0
        GROUP BY l_orderkey"""))
  )
}
