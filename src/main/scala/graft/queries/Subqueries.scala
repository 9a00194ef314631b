package graft.queries

import graft.Q
import graft.Sql._
import org.apache.spark.sql.functions._

/** Subquery shapes and null semantics — the reference has neither
  * (SURVEY.md §2.3: no IS NULL, no subqueries); Spark's surface covers
  * them and the oracle checks them.
  */
object Subqueries {

  val all: Seq[Q] = Seq(
    // Correlated-subquery shape: orders above their customer's average
    // order value. Decorrelated as aggregate + self-join — exactly what
    // Catalyst rewrites a correlated scalar subquery into; the explicit
    // form keeps the decimal-exact average reproducible cross-engine.
    Q(
      "q43_above_customer_avg",
      (s, dir) => {
        import s.implicits._
        val ord = table(s, dir, "orders")
        val avg = ord.groupBy($"o_custkey".as("ck"))
          .agg((out(sum(dec($"o_totalprice"))) / count(lit(1))).as("cust_avg"))
        ord.join(avg, $"o_custkey" === $"ck")
          .filter($"o_totalprice" > $"cust_avg")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"cust_avg")
      },
      Some("""
        WITH ca AS (
          SELECT o_custkey AS ck,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS cust_avg
          FROM orders GROUP BY o_custkey)
        SELECT o_orderkey, o_custkey, o_totalprice, cust_avg
        FROM orders JOIN ca ON o_custkey = ck
        WHERE o_totalprice > cust_avg""")),

    // Null semantics: nullif / coalesce / IS NULL counting / null-safe
    // grouping. The testdata has no natural nulls, so nullif produces
    // them; both engines agree on three-valued logic.
    Q(
      "q44_null_semantics",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .select(
            nullif($"l_discount", lit(0.0)).as("disc_or_null"),
            $"l_returnflag")
          .groupBy($"l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            count($"disc_or_null").as("n_nonnull"),
            count(when($"disc_or_null".isNull, 1)).as("n_null"),
            out(sum(dec(coalesce($"disc_or_null", lit(0.0))))).as("disc_sum"))
      },
      Some("""
        SELECT l_returnflag,
          count(*) AS n,
          count(nullif(l_discount, 0.0)) AS n_nonnull,
          count(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 END) AS n_null,
          CAST(sum(CAST(coalesce(nullif(l_discount, 0.0), 0.0) AS DECIMAL(18,4))) AS DOUBLE) AS disc_sum
        FROM lineitem GROUP BY l_returnflag"""))
  )
}
