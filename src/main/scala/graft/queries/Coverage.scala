package graft.queries

import graft.Q
import graft.Sql._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-wave relational coverage, rounding out operator families the
  * round-1 set did not exercise: PIVOT, CUBE grouping sets, non-equi
  * (range/band) joins, window navigation functions, and FULL OUTER
  * join with null-side accounting.
  *
  * Scale stance per query is inline; all are declarative so Catalyst
  * keeps pushdown/pruning, and the only non-equi join broadcasts its
  * 5-row band dimension (a nested-loop join against a broadcast tiny
  * side — the right physical shape at any corpus size).
  */
object Coverage {

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------- q46
    // PIVOT: daily event counts spread across the five event types.
    // Explicit pivot values keep the plan static (no extra distinct job
    // to discover them — required for a deterministic plan at scale).
    // Spark's pivot yields NULL for absent (day, type) cells while the
    // oracle's conditional counts yield 0 — coalesce makes both 0.
    Q(
      "q46_pivot",
      (s, dir) => {
        import s.implicits._
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = table(s, dir, "events")
          .groupBy(date_format($"ts", "yyyy-MM-dd").as("d"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
        p.select(
          $"d" +: types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      },
      Some("""
        SELECT strftime(ts, '%Y-%m-%d') AS d,
          count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
          count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
          count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
          count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
          count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
        FROM events GROUP BY 1""")),

    // ---------------------------------------------------------------- q47
    // CUBE: all four grouping sets over (returnflag, linestatus) in one
    // pass — Spark expands to a single Expand + hash agg (rows ×4 only
    // at the partial-agg input, shuffle stays |groups|-sized).
    Q(
      "q47_cube",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .cube($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"), out(sum(dec($"l_quantity"))).as("qty"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""")),

    // ---------------------------------------------------------------- q48
    // Non-equi range (band) join: lineitem rows bucketed into quantity
    // bands derived from the region dim. Physical plan:
    // BroadcastNestedLoopJoin with the 5-row band table broadcast —
    // theta joins against a tiny dim never shuffle the fact side.
    Q(
      "q48_range_band_join",
      (s, dir) => {
        import s.implicits._
        val bands = table(s, dir, "region").select(
          $"r_regionkey".as("band_id"),
          ($"r_regionkey" * 10 + 1).as("lo"),
          (($"r_regionkey" + 1) * 10).as("hi"),
          $"r_name")
        table(s, dir, "lineitem")
          .join(broadcast(bands), $"l_quantity" >= $"lo" && $"l_quantity" <= $"hi")
          .groupBy($"band_id", $"r_name")
          .agg(count(lit(1)).as("n"),
            out(sum(dec($"l_extendedprice"))).as("sum_price"))
      },
      Some("""
        WITH bands AS (
          SELECT r_regionkey AS band_id, r_regionkey*10+1 AS lo,
                 (r_regionkey+1)*10 AS hi, r_name
          FROM region)
        SELECT band_id, r_name, count(*) AS n,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity <= hi
        GROUP BY band_id, r_name""")),

    // ---------------------------------------------------------------- q49
    // Window navigation: lag/lead, ntile, percent_rank, first_value per
    // customer order history. Deterministic order (orderdate, orderkey
    // unique); untouched doubles pass through bit-identical and
    // percent_rank is the same (rank-1)/(n-1) division in both engines.
    Q(
      "q49_window_nav",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
        table(s, dir, "orders").select(
          $"o_custkey", $"o_orderkey", tsStr($"o_orderdate").as("od"),
          lag($"o_totalprice", 1).over(w).as("prev_price"),
          lead($"o_totalprice", 1).over(w).as("next_price"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pr"),
          first_value($"o_orderkey").over(w).as("first_key"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
          strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od,
          lag(o_totalprice, 1) OVER w AS prev_price,
          lead(o_totalprice, 1) OVER w AS next_price,
          ntile(4) OVER w AS quartile,
          percent_rank() OVER w AS pr,
          first_value(o_orderkey) OVER w AS first_key
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")),

    // ---------------------------------------------------------------- q50
    // FULL OUTER join with side accounting: positive-balance customers
    // vs per-customer order aggregates — both sides have exclusive
    // keys, so every null-extension path is exercised. At scale a full
    // outer on a key shuffles both sides (no broadcast variant exists);
    // partial agg first keeps the right side |custkey|-sized.
    Q(
      "q50_full_outer",
      (s, dir) => {
        import s.implicits._
        val c = table(s, dir, "customer")
          .filter($"c_acctbal" > 0)
          .select($"c_custkey", $"c_mktsegment")
        val o = table(s, dir, "orders")
          .groupBy($"o_custkey")
          .agg(count(lit(1)).as("n_ord"),
            out(sum(dec($"o_totalprice"))).as("spend"))
        c.join(o, $"c_custkey" === $"o_custkey", "full_outer")
          .select(
            coalesce($"c_custkey", $"o_custkey").as("k"),
            coalesce($"c_mktsegment", lit("none")).as("segment"),
            coalesce($"n_ord", lit(0L)).as("n_ord"),
            coalesce($"spend", lit(0.0)).as("spend"),
            when($"c_custkey".isNull, "order_only")
              .when($"o_custkey".isNull, "cust_only")
              .otherwise("both").as("side"))
      },
      Some("""
        WITH c AS (
          SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 0),
        o AS (
          SELECT o_custkey, count(*) AS n_ord,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
          FROM orders GROUP BY o_custkey)
        SELECT coalesce(c_custkey, o_custkey) AS k,
          coalesce(c_mktsegment, 'none') AS segment,
          coalesce(n_ord, 0) AS n_ord,
          coalesce(spend, 0.0) AS spend,
          CASE WHEN c_custkey IS NULL THEN 'order_only'
               WHEN o_custkey IS NULL THEN 'cust_only'
               ELSE 'both' END AS side
        FROM c FULL OUTER JOIN o ON c_custkey = o_custkey""")),

    // ---------------------------------------------------------------- q51
    // Grep with unit enumeration — the DataFrame analog of the
    // reference's per-file line numbering before the substring filter
    // (workload/src/grep.rs:25-28, SURVEY.md §2.3 P2): posexplode
    // attaches the 1-based position, then the predicate filters.
    // Documents are single-line, so the enumerated unit is the
    // sentence; the shape (enumerate → filter → emit source:pos:text)
    // is the P2 contract. Scan-only, no shuffle.
    Q(
      "q51_grep_enumerated",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .select($"doc_id", posexplode(split($"text", "\\. ")))
          .filter($"col".contains("data"))
          .select($"doc_id", ($"pos" + 1).cast("long").as("sent_no"),
            $"col".as("sentence"))
      },
      Some("""
        WITH el AS (
          SELECT doc_id,
            unnest(regexp_split_to_array(text, '\. ')) AS sentence,
            generate_subscripts(regexp_split_to_array(text, '\. '), 1) AS sent_no
          FROM documents)
        SELECT doc_id, CAST(sent_no AS BIGINT) AS sent_no, sentence
        FROM el WHERE contains(sentence, 'data')""")),

    // ---------------------------------------------------------------- q55
    // NOT IN three-valued logic, via the spark.sql entry path: Spark
    // plans a null-aware anti join for NOT IN subqueries. The
    // 'null_free' variant behaves like a plain anti join; the
    // 'with_null' variant's list contains a NULL, so x NOT IN (...)
    // is never TRUE and the count is provably 0 — the classic SQL
    // footgun, pinned cross-engine.
    Q(
      "q55_not_in_nulls",
      (s, dir) => {
        table(s, dir, "customer").createOrReplaceTempView("customer_v")
        table(s, dir, "region").createOrReplaceTempView("region_v")
        s.sql("""
          SELECT 'null_free' AS variant, count(*) AS n FROM customer_v
          WHERE c_nationkey NOT IN (SELECT r_regionkey FROM region_v WHERE r_regionkey < 3)
          UNION ALL
          SELECT 'with_null' AS variant, count(*) AS n FROM customer_v
          WHERE c_nationkey NOT IN (SELECT nullif(r_regionkey, 4) FROM region_v)""")
      },
      Some("""
        SELECT 'null_free' AS variant, count(*) AS n FROM customer
        WHERE c_nationkey NOT IN (SELECT r_regionkey FROM region WHERE r_regionkey < 3)
        UNION ALL
        SELECT 'with_null' AS variant, count(*) AS n FROM customer
        WHERE c_nationkey NOT IN (SELECT nullif(r_regionkey, 4) FROM region)""")),

    // ---------------------------------------------------------------- q57
    // Skew-safe salted aggregation, oracle-proven equivalent to the
    // plain GROUP BY: two-stage (key, salt)-partial → key-final
    // aggregation through ops.Salted. Decimal partials make the
    // regrouped sum exactly order/shape-independent, so salting is
    // semantically invisible — which is the entire point (the oracle
    // runs the unsalted query).
    Q(
      "q57_salted_agg",
      (s, dir) => {
        import s.implicits._
        val li = table(s, dir, "lineitem")
        val cnt = graft.ops.Salted.saltedCount(li, $"l_returnflag")
        val qty = graft.ops.Salted.saltedSum(li, $"l_returnflag", dec($"l_quantity"))
        cnt.join(qty, "__key")
          .select($"__key".as("l_returnflag"),
            $"cnt".cast("long").as("n"), out($"total").as("qty"))
      },
      Some("""
        SELECT l_returnflag, count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
        FROM lineitem GROUP BY l_returnflag""")),

    // ---------------------------------------------------------------- q58
    // RANGE window frame with a value offset (the frame type q06/q49's
    // ROWS frames don't cover): per-customer 30-day rolling spend.
    // RANGE frames include all peers of the boundary values, so tie
    // order is irrelevant and both engines agree exactly (epoch-second
    // arithmetic, decimal sums). One shuffle on the partition key; the
    // frame is a sliding range over the sorted partition.
    Q(
      "q58_range_frame_window",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"sec".asc)
          .rangeBetween(-30L * 86400, 0)
        table(s, dir, "orders")
          .select($"o_custkey", $"o_orderkey",
            // ANSI mode rejects a direct TIMESTAMP_NTZ→BIGINT cast;
            // NTZ→TIMESTAMP is exact under the UTC session timezone
            expr("unix_seconds(CAST(o_orderdate AS TIMESTAMP))").as("sec"),
            $"o_totalprice")
          .withColumn("spend_30d", out(sum(dec($"o_totalprice")).over(w)))
          .withColumn("n_30d", count(lit(1)).over(w))
          .select($"o_custkey", $"o_orderkey", $"sec", $"spend_30d", $"n_30d")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
          CAST(epoch(o_orderdate) AS BIGINT) AS sec,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS spend_30d,
          count(*) OVER w AS n_30d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                     RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)""")),

    // ---------------------------------------------------------------- q60
    // UNPIVOT / melt — wide→long reshaping (inverse of q46's pivot and
    // the standard step before per-metric aggregation at scale: one
    // narrow (id, metric, value) stream instead of N wide columns).
    // Spark's native unpivot(Expand, no shuffle); oracle as the
    // portable UNION ALL form.
    Q(
      "q60_unpivot",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "part")
          .select($"p_partkey",
            $"p_size".cast("double").as("size"),
            $"p_retailprice".as("retailprice"))
          .unpivot(
            ids = Array($"p_partkey"),
            values = Array($"size", $"retailprice"),
            variableColumnName = "metric",
            valueColumnName = "value")
      },
      Some("""
        SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        UNION ALL
        SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part""")),

    // ---------------------------------------------------------------- q61
    // Fuzzy string matching: Levenshtein distance between part names
    // within a (brand, size) block — the edit-distance flavor of
    // entity resolution, blocked exactly like q22 so the pair space is
    // Σ|block|², never n². Both engines implement the same unit-cost
    // DP, so distances are identical integers.
    Q(
      "q61_fuzzy_name_match",
      (s, dir) => {
        import s.implicits._
        val p = table(s, dir, "part")
          .select($"p_partkey", $"p_brand", $"p_size", $"p_name")
        p.as("a").join(p.as("b"),
            col("a.p_brand") === col("b.p_brand") &&
              col("a.p_size") === col("b.p_size") &&
              col("a.p_partkey") < col("b.p_partkey"))
          .select(col("a.p_partkey").as("k1"), col("b.p_partkey").as("k2"),
            levenshtein(col("a.p_name"), col("b.p_name")).cast("long").as("dist"))
          .filter($"dist" <= 12)
      },
      Some("""
        SELECT a.p_partkey AS k1, b.p_partkey AS k2,
          CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_size = b.p_size
         AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 12""")),

    // ---------------------------------------------------------------- q63
    // Date arithmetic across a join: ship delay in days (date-boundary
    // count — identical in both engines regardless of time-of-day),
    // calendar month delta, and a late flag derived from the SAME day
    // count (deriving it from timestamp+interval instead would diverge:
    // Spark's date_add truncates to DATE, DuckDB's + INTERVAL keeps
    // time-of-day).
    Q(
      "q63_date_arithmetic",
      (s, dir) => {
        import s.implicits._
        val li = table(s, dir, "lineitem")
        val ord = table(s, dir, "orders")
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .select($"l_orderkey", $"l_linenumber",
            datediff($"l_shipdate", $"o_orderdate").cast("long").as("ship_delay_days"),
            ((year($"l_shipdate") * 12 + month($"l_shipdate")) -
              (year($"o_orderdate") * 12 + month($"o_orderdate")))
              .cast("long").as("month_delta"))
          .withColumn("late_30d", ($"ship_delay_days" > 30).cast("boolean"))
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
          CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_delay_days,
          CAST((year(l_shipdate)*12 + month(l_shipdate)) -
               (year(o_orderdate)*12 + month(o_orderdate)) AS BIGINT) AS month_delta,
          date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 30 AS late_30d
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey""")),

    // ---------------------------------------------------------------- q70
    // Explicit GROUPING SETS (the general form behind q13's ROLLUP and
    // q47's CUBE): three disjoint grouping shapes in ONE Expand+agg
    // pass — the engine reads the fact once, not three times. Group
    // identity is encoded via coalesce('ALL') rather than
    // grouping_id() (bit order is engine-specific; the data columns
    // are null-free so the markers are unambiguous).
    Q(
      "q70_grouping_sets",
      (s, dir) => {
        table(s, dir, "orders").createOrReplaceTempView("orders_v")
        s.sql("""
          SELECT coalesce(o_orderstatus, 'ALL') AS status,
                 coalesce(o_orderpriority, 'ALL') AS priority,
                 count(*) AS n,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
          FROM orders_v
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
      },
      Some("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")),

    // ---------------------------------------------------------------- q71
    // Correlated EXISTS / NOT EXISTS via the spark.sql path: Catalyst
    // decorrelates both into left-semi and left-anti joins (no
    // per-row subquery execution — the classic optimizer test). High
    // spenders who never filed a low-priority order.
    Q(
      "q71_exists_correlated",
      (s, dir) => {
        table(s, dir, "customer").createOrReplaceTempView("customer_v")
        table(s, dir, "orders").createOrReplaceTempView("orders_v")
        s.sql("""
          SELECT c_custkey, c_mktsegment FROM customer_v c
          WHERE EXISTS (
              SELECT 1 FROM orders_v o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
            AND NOT EXISTS (
              SELECT 1 FROM orders_v o2
              WHERE o2.o_custkey = c.c_custkey AND o2.o_orderpriority = '5-LOW')""")
      },
      Some("""
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
          AND NOT EXISTS (
            SELECT 1 FROM orders o2
            WHERE o2.o_custkey = c.c_custkey AND o2.o_orderpriority = '5-LOW')""")),

    // --------------------------------------------------------------- q127
    // Corpus datasheet — the "data card" rollup every released
    // training set ships (Datasheets for Datasets, Gebru et al.):
    // doc/char/token totals and mean length by language, by source,
    // by (language, source), and overall, in ONE Expand pass (explicit
    // GROUPING SETS — q70's machinery pointed at the corpus). Token
    // counts are computed once in the scan projection; the four
    // groupings then share a single map-side-combined aggregate. At
    // 100 TB this is the whole-corpus reporting query: one scan, one
    // |langs × sources|-bounded shuffle. Two determinism details:
    // the whitespace class is written out explicitly ([ \t\r\n]+ —
    // Java's \s includes \x0B, RE2's does not, so a bare \s+ can
    // hash-diverge on a vertical tab), and GROUPING() markers
    // disambiguate rollup rows from genuine NULL or literal-'ALL'
    // group values (coalesce alone would conflate the grains).
    Q(
      "q127_corpus_datasheet",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .select($"lang", $"source", $"n_chars",
            size(filter(split($"text", "[ \\t\\r\\n]+"), x => x =!= "")).cast("long").as("n_toks"))
          .createOrReplaceTempView("docs_ds_v")
        s.sql("""
          SELECT coalesce(lang, 'ALL') AS lang,
                 coalesce(source, 'ALL') AS source,
                 CAST(grouping(lang) AS BIGINT) AS g_lang,
                 CAST(grouping(source) AS BIGINT) AS g_source,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                 CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
                 CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
          FROM docs_ds_v
          GROUP BY GROUPING SETS ((lang), (source), (lang, source), ())""")
      },
      Some("""
        WITH d AS (
          SELECT lang, source, n_chars,
            CAST(len(list_filter(regexp_split_to_array(text, '[ \t\r\n]+'), x -> x <> '')) AS BIGINT) AS n_toks
          FROM documents)
        SELECT coalesce(lang, 'ALL') AS lang,
               coalesce(source, 'ALL') AS source,
               CAST(grouping(lang) AS BIGINT) AS g_lang,
               CAST(grouping(source) AS BIGINT) AS g_source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
               CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
        FROM d
        GROUP BY GROUPING SETS ((lang), (source), (lang, source), ())""")),

    // ---------------------------------------------------------------- q159
    // Analytic RANK-function suite — the §2.9 window rows not yet
    // exercised on one oracle: dense_rank, percent_rank, cume_dist,
    // ntile(5), and lag/lead WITH explicit defaults, all over one
    // deterministic total order (price desc, orderkey asc — the
    // unique tie-break that makes every rank reproducible).
    // percent_rank = (rank−1)/(N−1) and cume_dist = rows≤/N are
    // single divisions of exact integers — identical doubles both
    // engines; the lag/lead defaults prove the boundary semantics
    // (first row's lag and last row's lead take the sentinel, not
    // NULL). o_totalprice passes through untouched (Sql rule 6).
    //
    // Scale shape: one shuffle on the partition key (order
    // priority); every function shares the single sort — Spark plans
    // ONE Window node for the five same-spec functions, and the
    // lag/lead pair adds its own frame on the same exchange.
    Q(
      "q159_rank_suite",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_orderpriority")
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        table(s, dir, "orders")
          .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
          .withColumn("drk", dense_rank().over(w).cast("long"))
          .withColumn("prk", percent_rank().over(w))
          .withColumn("cd", cume_dist().over(w))
          .withColumn("nt5", ntile(5).over(w).cast("long"))
          .withColumn("prev_price", lag($"o_totalprice", 1, -1.0).over(w))
          .withColumn("next_price", lead($"o_totalprice", 1, -1.0).over(w))
      },
      Some("""
        SELECT o_orderkey, o_orderpriority, o_totalprice,
          CAST(dense_rank() OVER w AS BIGINT) AS drk,
          percent_rank() OVER w AS prk,
          cume_dist() OVER w AS cd,
          CAST(ntile(5) OVER w AS BIGINT) AS nt5,
          lag(o_totalprice, 1, -1.0) OVER w AS prev_price,
          lead(o_totalprice, 1, -1.0) OVER w AS next_price
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey ASC)"""))
  )
}
