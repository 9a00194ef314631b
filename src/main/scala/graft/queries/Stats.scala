package graft.queries

import graft.Q
import graft.Sql._
import org.apache.spark.sql.functions._

/** Order statistics and ordered string aggregation — the remaining
  * aggregate families: exact interpolated percentiles (both engines use
  * the percentile_cont formula on identical doubles → identical
  * results) and deterministic ordered list aggregation.
  */
object Stats {

  val all: Seq[Q] = Seq(
    // Exact percentiles per group. At scale exact percentiles sort
    // within groups (or use approx_percentile for sketch-based bounds);
    // group count is tiny here so the sort is per-group local.
    Q(
      "q35_percentiles",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            expr("percentile(l_quantity, 0.5)").as("median_qty"),
            expr("percentile(l_quantity, 0.9)").as("p90_qty"),
            expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
            count(lit(1)).as("n"))
      },
      Some("""
        SELECT l_returnflag,
          percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS median_qty,
          percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_qty,
          percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25_price,
          count(*) AS n
        FROM lineitem GROUP BY l_returnflag""")),

    // Ordered group-concat: top-5 customer names per segment by name
    // order — deterministic ordered list agg on both engines.
    Q(
      "q36_group_concat",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "customer")
          .groupBy($"c_mktsegment")
          .agg(
            array_join(slice(sort_array(collect_list($"c_name")), 1, 5), ",")
              .as("first5"),
            count(lit(1)).as("n"))
      },
      Some("""
        SELECT c_mktsegment,
          array_to_string((array_agg(c_name ORDER BY c_name))[1:5], ',') AS first5,
          count(*) AS n
        FROM customer GROUP BY c_mktsegment""")),

    // HLL sketch aggregation (rows-only: HLL implementations differ
    // across engines by design; StatsSpec bounds the error vs the exact
    // count instead). The sketch is the 100 TB answer to COUNT(DISTINCT)
    // — fixed-size state, partial-aggregable, no giant shuffle.
    Q(
      "q37_approx_distinct",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            approx_count_distinct($"l_partkey").as("approx_parts"),
            approx_count_distinct($"l_orderkey").as("approx_orders"),
            count(lit(1)).as("n"))
      },
      None)
  )
}
