package graft.queries

import graft.Q
import graft.Sql._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order statistics and ordered string aggregation — the remaining
  * aggregate families: exact interpolated percentiles (both engines use
  * the percentile_cont formula on identical doubles → identical
  * results) and deterministic ordered list aggregation.
  */
object Stats {

  /** Shared by q39 (packed-history) and q65 (range-join fallback): one
    * oracle, two physical strategies.
    */
  private val asofOracle = """
        WITH j AS (
          SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
            row_number() OVER (PARTITION BY e.event_id
                               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
          FROM events e JOIN orders o
            ON e.user_id % 1500 = o.o_custkey AND o.o_orderdate <= e.ts)
        SELECT event_id, user_id, o_orderkey,
          strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS asof_orderdate
        FROM j WHERE rn = 1"""

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

    // As-of join: each event picks the latest order at-or-before its
    // timestamp for its customer (deterministic orderkey tiebreak, so
    // both engines agree; DuckDB's ASOF JOIN keyword leaves ties
    // unspecified). Physical shape (ops.AsOfJoin.packedHistory): pack
    // each customer's order history into ONE sorted array (|custkey|
    // rows), broadcast it, and take the last qualifying element per
    // event — the event stream never shuffles and nothing materializes
    // the |events|×|orders-per-key| range-join intermediate that the
    // naive join+window form sorts (that form measured ~2× slower at
    // sf0.1). try_element_at(..., -1) of the ascending
    // (date, orderkey) sort IS the rn=1 of the descending window —
    // same tiebreak — and yields NULL (not an ANSI error) for an event
    // before its customer's first order. At 100 TB this holds while
    // per-key history fits a row (orders per customer: hundreds);
    // unbounded keys fall back to ops.AsOfJoin.rangeWindow — q65 runs
    // that path against the SAME oracle, proving the two strategies
    // interchangeable — and a custom sort-merge-asof SparkPlan is the
    // upgrade past that (SURVEY.md §7.4 preference order).
    Q(
      "q39_asof_join",
      (s, dir) => {
        import s.implicits._
        val e = table(s, dir, "events")
        graft.ops.AsOfJoin.packedHistory(
            e, $"user_id" % 1500, $"ts",
            table(s, dir, "orders"), $"o_custkey",
            struct($"o_orderdate", $"o_orderkey"), "o_orderdate")
          .filter($"asof".isNotNull)
          .select($"event_id", $"user_id", $"asof.o_orderkey".as("o_orderkey"),
            tsStr($"asof.o_orderdate").as("asof_orderdate"))
      },
      Some(asofOracle)),

    // The unbounded-key fallback strategy on the same data and the same
    // oracle SQL as q39: equi-join on custkey with the range predicate,
    // window keeps the latest match. Both strategies hash-matching the
    // one oracle is the interchangeability proof for AsOfJoin.auto's
    // threshold switch.
    Q(
      "q65_asof_fallback",
      (s, dir) => {
        import s.implicits._
        val e = table(s, dir, "events")
        graft.ops.AsOfJoin.rangeWindow(
            e, $"user_id" % 1500, $"ts", $"event_id",
            table(s, dir, "orders"), $"o_custkey",
            struct($"o_orderdate", $"o_orderkey"), "o_orderdate")
          .filter($"asof".isNotNull)
          .select($"event_id", $"user_id", $"asof.o_orderkey".as("o_orderkey"),
            tsStr($"asof.o_orderdate").as("asof_orderdate"))
      },
      Some(asofOracle)),

    // The custom-SparkPlan strategy on the same data and oracle as
    // q39/q65 (SURVEY.md §7.4 preference (c)): plans.AsOfMerge is a
    // real sort-merge as-of operator — co-partitioned (key,time)-sorted
    // children, one streaming merge pass, one buffered right row of
    // state — no packed-history row-size cap, no range-join
    // intermediate. Three physical strategies, one oracle.
    Q(
      "q69_asof_merge",
      (s, dir) => {
        import s.implicits._
        val e = table(s, dir, "events")
        // project the right side manually: a custom logical node is
        // opaque to column pruning, so narrow it before the join
        // o_orderdate is TIMESTAMP_NTZ in the parquet; the custom node
        // requires identical time types, so align it to events.ts's
        // TIMESTAMP (identity under the UTC session)
        val o = table(s, dir, "orders").select($"o_orderkey", $"o_custkey",
          $"o_orderdate".cast("timestamp").as("o_orderdate"))
        graft.plans.AsOfMerge.join(
            e, $"user_id" % 1500, $"ts",
            o, $"o_custkey", $"o_orderdate", Seq($"o_orderkey"))
          .filter($"o_orderkey".isNotNull)
          .select($"event_id", $"user_id", $"o_orderkey",
            tsStr($"o_orderdate").as("asof_orderdate"))
      },
      Some(asofOracle)),

    // Statistical moments — sample variance/stddev of quantity and the
    // quantity↔discount correlation per returnflag. NOT the builtin
    // stddev/corr (those accumulate doubles in partition order — not
    // reproducible across engines); instead exact decimal power sums
    // (each cast to double once, scaled magnitudes < 2^53 so the casts
    // are exact) feed the closed-form moment formulas, which are then
    // identical IEEE double expressions on identical inputs in both
    // engines. Quantity is integer-valued and discount has ≤4 dp, so
    // every downscale drops provably-zero digits. Single partial+final
    // hash agg — the moment sums ARE the partial-aggregable form.
    Q(
      "q64_stats_moments",
      (s, dir) => {
        import s.implicits._
        val sums = table(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            out(sum(dec($"l_quantity"))).as("sx"),
            out(sum((dec($"l_quantity") * dec($"l_quantity")).cast(D18_2))).as("sxx"),
            out(sum(rate($"l_discount").cast(D18_4))).as("sd"),
            out(sum((rate($"l_discount") * rate($"l_discount")))).as("sdd"),
            out(sum((dec($"l_quantity") * rate($"l_discount")).cast(D18_4))).as("sxy"))
        sums.select($"l_returnflag", $"n", $"sx",
          ($"sx" / $"n").as("mean_qty"),
          (($"n" * $"sxx" - $"sx" * $"sx") / ($"n" * ($"n" - 1))).as("var_qty"),
          sqrt(($"n" * $"sxx" - $"sx" * $"sx") / ($"n" * ($"n" - 1))).as("stddev_qty"),
          (($"n" * $"sxy" - $"sx" * $"sd") /
            sqrt(($"n" * $"sxx" - $"sx" * $"sx") * ($"n" * $"sdd" - $"sd" * $"sd")))
            .as("corr_qty_disc"))
      },
      Some("""
        WITH sums AS (
          SELECT l_returnflag,
            count(*) AS n,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
            CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
            CAST(sum(CAST(CAST(l_discount AS DECIMAL(5,4)) AS DECIMAL(18,4))) AS DOUBLE) AS sd,
            CAST(sum(CAST(l_discount AS DECIMAL(5,4)) * CAST(l_discount AS DECIMAL(5,4))) AS DOUBLE) AS sdd,
            CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(5,4)) AS DECIMAL(18,4))) AS DOUBLE) AS sxy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n, sx,
          sx / n AS mean_qty,
          (n*sxx - sx*sx) / (n*(n-1)) AS var_qty,
          sqrt((n*sxx - sx*sx) / (n*(n-1))) AS stddev_qty,
          (n*sxy - sx*sd) / sqrt((n*sxx - sx*sx) * (n*sdd - sd*sd)) AS corr_qty_disc
        FROM sums""")),

    // Approximate percentiles via the KLL/GK-style sketch
    // (approx_percentile): the 100 TB form of q35 — fixed-size
    // mergeable state per group instead of a per-group sort. Rows-only
    // like q37: sketch internals differ across engines by design;
    // StatsSpec bounds the rank error against the exact q35 values.
    Q(
      "q72_approx_percentiles",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            expr("approx_percentile(l_quantity, 0.5, 10000)").as("median_qty"),
            expr("approx_percentile(l_quantity, 0.9, 10000)").as("p90_qty"),
            expr("approx_percentile(l_extendedprice, 0.25, 10000)").as("p25_price"),
            count(lit(1)).as("n"))
      },
      None),

    // --------------------------------------------------------------- q72b
    // Percentile SKETCH STATE AS DATA — q72's quantile family with
    // the sketch internals replaced by ENGINE-NEUTRAL state (the
    // q116-HLL/q123-CMS pattern: where exactness is representable,
    // oracle-check it): fixed bucket boundaries (width 5 on
    // l_quantity, width 5000 on l_extendedprice) make the "sketch" an
    // exact BIGINT histogram both engines compute identically; a
    // percentile estimate is then pure integer arithmetic on the
    // cumulative counts — the smallest bucket whose cumulative count
    // reaches ceil(p·n), reported as the bucket's lower bound (error
    // bound = one bucket width by construction; q72's
    // approx_percentile stays as the adaptive-sketch variant). The
    // rank conditions are integer cross-multiplications (2·cum ≥ n
    // etc.) — no doubles anywhere, so the hash match is exact.
    //
    // Scale shape: two map-side-combinable histogram aggregations
    // (≤ flags × buckets partial rows — fixed-size mergeable state,
    // exactly what makes histogram sketches 100 TB-viable), windows
    // and the final join run on the tiny histogram frame.
    Q(
      "q72b_percentile_histogram",
      (s, dir) => {
        import s.implicits._
        val li = table(s, dir, "lineitem")
        def hist(col: String, width: Long) =
          li.select($"l_returnflag",
            expr(s"CAST(floor(CAST($col AS DOUBLE) / $width) AS BIGINT)").as("b"))
            .groupBy($"l_returnflag", $"b")
            .agg(count(lit(1)).cast("long").as("c"))
        val wCum = Window.partitionBy($"l_returnflag").orderBy($"b")
        val wAll = Window.partitionBy($"l_returnflag")
        def cum(h: org.apache.spark.sql.DataFrame) = h
          .withColumn("cum", sum($"c").over(wCum).cast("long"))
          .withColumn("n", sum($"c").over(wAll).cast("long"))
        val qty = cum(hist("l_quantity", 5))
          .groupBy($"l_returnflag").agg(
            max($"n").cast("long").as("n"),
            (min(when($"cum" * 2 >= $"n", $"b")) * 5).cast("long").as("p50_qty_lo"),
            (min(when($"cum" * 10 >= $"n" * 9, $"b")) * 5).cast("long").as("p90_qty_lo"))
        val price = cum(hist("l_extendedprice", 5000))
          .groupBy($"l_returnflag").agg(
            (min(when($"cum" * 4 >= $"n", $"b")) * 5000).cast("long").as("p25_price_lo"))
        qty.join(price, Seq("l_returnflag"))
      },
      Some("""
        WITH hq AS (
          SELECT l_returnflag,
            CAST(floor(CAST(l_quantity AS DOUBLE) / 5) AS BIGINT) AS b,
            CAST(count(*) AS BIGINT) AS c
          FROM lineitem GROUP BY 1, 2),
        cq AS (
          SELECT l_returnflag, b, c,
            CAST(sum(c) OVER (PARTITION BY l_returnflag ORDER BY b) AS BIGINT) AS cum,
            CAST(sum(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
          FROM hq),
        aq AS (
          SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
            CAST(min(CASE WHEN cum * 2 >= n THEN b END) * 5 AS BIGINT) AS p50_qty_lo,
            CAST(min(CASE WHEN cum * 10 >= n * 9 THEN b END) * 5 AS BIGINT) AS p90_qty_lo
          FROM cq GROUP BY 1),
        hp AS (
          SELECT l_returnflag,
            CAST(floor(CAST(l_extendedprice AS DOUBLE) / 5000) AS BIGINT) AS b,
            CAST(count(*) AS BIGINT) AS c
          FROM lineitem GROUP BY 1, 2),
        cp AS (
          SELECT l_returnflag, b, c,
            CAST(sum(c) OVER (PARTITION BY l_returnflag ORDER BY b) AS BIGINT) AS cum,
            CAST(sum(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
          FROM hp),
        ap AS (
          SELECT l_returnflag,
            CAST(min(CASE WHEN cum * 4 >= n THEN b END) * 5000 AS BIGINT) AS p25_price_lo
          FROM cp GROUP BY 1)
        SELECT aq.l_returnflag, aq.n, aq.p50_qty_lo, aq.p90_qty_lo, ap.p25_price_lo
        FROM aq JOIN ap USING (l_returnflag)""")),

    // --------------------------------------------------------------- q111
    // Heavy hitters via a distributed Misra–Gries sketch — the third
    // member of the approximate family (q37 HLL = distincts, q72
    // KLL/GK = quantiles, this = frequent items): the 100 TB form of
    // q75's exact vocabulary top-k. Each input partition keeps at most
    // k = 512 counters in one pass (classic decrement-on-overflow,
    // amortized O(1) per token); only the P·k surviving (token, count)
    // partials shuffle — vs q75's |vocab|-sized exchange — and merged
    // MG summaries are again an MG summary, so the final agg is a
    // plain SUM. Deterministic guarantee (HeavyHitterSpec pins it
    // against exact counts): estimates never overcount, undercount by
    // at most n/(k+1), and every token with true frequency above
    // n/(k+1) is present before the top-20 cut. Rows-only like
    // q37/q72: which LIGHT tokens survive a summary depends on
    // arrival order by design.
    Q(
      "q111_heavy_hitters",
      (s, dir) => {
        import s.implicits._
        val toks = graft.queries.Llm.docsSpread(s, dir)
          .select(explode(split(lower($"text"), "[^a-z]+")).as("tok"))
          .filter($"tok" =!= "").as[String]
        heavyHitters(toks, 512)
          .orderBy($"est".desc, $"tok".asc)
          .limit(20)
      },
      None),

    // --------------------------------------------------------------- q123
    // Count-Min point-frequency estimates (ops.CmsState, Cormode &
    // Muthukrishnan 2005) — the fourth approximate-family member
    // (q37 distincts, q72 quantiles, q111 frequent items; this =
    // "how often did THIS token occur" when the vocabulary is too
    // large for an exact table). Per language: 4 md5-salted hash rows
    // × 1024 buckets of exact BIGINT counts; a probe's estimate is
    // the MIN of its 4 counters. Unlike every other sketch here, the
    // WHOLE pipeline — counters, probes, estimates — is exact integer
    // arithmetic on md5 buckets both engines compute identically, so
    // this one is fully hash-ORACLE-CHECKED (not rows-only): the
    // oracle replays the sketch and the exact counts, pinning the
    // never-undercount bound est ≥ exact on real data end to end.
    // Scale shape: one map-side-combinable (key, j, c) count (≤ 4096
    // partial rows per lang per partition); probes join the
    // broadcast counter frame scan-locally.
    Q(
      "q123_cms_counts",
      (s, dir) => {
        import s.implicits._
        val toks = graft.queries.Llm.docsSpread(s, dir)
          .select($"lang".as("key"),
            explode(split(lower($"text"), "[^a-z]+")).as("v"))
          .filter($"v" =!= "")
          .localCheckpoint() // feeds counters, probe grid AND exact counts
        val cnts = graft.ops.CmsState.counters(toks, "key", "v", 4, 1024)
        val items = toks.select($"key").distinct()
          .crossJoin(broadcast(
            Seq("the", "and", "data", "spark", "window", "zyzzyva").toDF("v")))
        val exact = toks.groupBy($"key", $"v")
          .agg(count(lit(1)).cast("long").as("exact"))
        graft.ops.CmsState.probe(items, cnts, 4, 1024)
          .join(exact, Seq("key", "v"), "left")
          .select($"key".as("lang"), $"v".as("tok"), $"est",
            coalesce($"exact", lit(0L)).as("exact"))
      },
      Some("""
        WITH toks AS (
          SELECT lang AS key,
            unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')) AS v
          FROM documents),
        js AS (SELECT unnest(range(0, 4)) AS j),
        cnts AS (
          SELECT key, j,
            CAST(CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), '|', v)), 1, 15)) AS UBIGINT) AS BIGINT) % 1024 AS c,
            CAST(count(*) AS BIGINT) AS cnt
          FROM toks CROSS JOIN js GROUP BY key, j, c),
        probes AS (SELECT unnest(['the', 'and', 'data', 'spark', 'window', 'zyzzyva']) AS v),
        items AS (SELECT DISTINCT toks.key, probes.v FROM toks CROSS JOIN probes),
        pj AS (
          SELECT key, v, j,
            CAST(CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), '|', v)), 1, 15)) AS UBIGINT) AS BIGINT) % 1024 AS c
          FROM items CROSS JOIN js),
        est AS (
          SELECT pj.key, pj.v, min(coalesce(cnts.cnt, 0)) AS est
          FROM pj LEFT JOIN cnts ON pj.key = cnts.key AND pj.j = cnts.j AND pj.c = cnts.c
          GROUP BY pj.key, pj.v),
        ex AS (SELECT key, v, CAST(count(*) AS BIGINT) AS exact FROM toks GROUP BY key, v)
        SELECT est.key AS lang, est.v AS tok, est.est,
          coalesce(ex.exact, 0) AS exact
        FROM est LEFT JOIN ex ON est.key = ex.key AND est.v = ex.v""")),

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
      None),

    // --------------------------------------------------------------- q116
    // INCREMENTAL distinct counting via HLL register state AT REST
    // (ops.HllState): per-lang distinct-text registers built over ⅔ of
    // the corpus, a drop of the remaining ⅓ max-merged in, and the
    // EXACT-INTEGER register summary (live registers, zero registers,
    // the 2^(W+1)-scaled harmonic sum) reported. Register tables are
    // deterministic functions of the value SET — so the oracle
    // recomputes them over the FULL corpus in DuckDB (same md5 hash,
    // same bin()-length rho, same integer sum) and a hash-match
    // proves increment ≡ rebuild END TO END through the oracle, the
    // claim opaque sketch bytes (q37's builtin) can't make. Only the
    // final cardinality estimate (HllState.estimate, error-pinned in
    // HllStateSpec) leaves integer land.
    //
    // Scale shape: one map-side-combinable aggregate per drop (≤ m
    // rows per key per partition partial), ≤ m-row-per-key state
    // scans, no corpus re-read on increment.
    Q(
      "q116_hll_state",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents").select($"doc_id", $"lang", $"text")
        // base save + incremental add built once per corpus content
        // (StateCache); the timed path is the state SUMMARY read —
        // what a monitoring query actually costs against the at-rest
        // register state
        val srcFp = graft.ops.Smb.sourceFingerprint(s, s"$dir/documents.parquet")
        val state = graft.ops.StateCache.ensure(s"q116_hll_$srcFp") { st =>
          graft.ops.HllState.save(
            docs.filter($"doc_id" % 3 =!= 0), st, "lang", "text")
          graft.ops.HllState.add(
            docs.filter($"doc_id" % 3 === 0), st, "lang", "text",
            batchId = Some(0L))
        }
        graft.ops.HllState.summary(s, state)
          .select($"key".as("lang"), $"n_regs", $"v", $"sumint")
      },
      Some("""
        WITH h AS (
          SELECT lang,
            CAST(CAST(concat('0x', substr(md5(text), 1, 15)) AS UBIGINT) AS BIGINT) AS h
          FROM documents),
        rr AS (
          SELECT lang, h // 281474976710656 AS reg, h % 281474976710656 AS rest
          FROM h),
        regs AS (
          SELECT lang, reg,
            max(CASE WHEN rest = 0 THEN 49 ELSE 48 - length(bin(rest)) + 1 END) AS rho
          FROM rr GROUP BY lang, reg)
        SELECT lang,
          CAST(count(*) AS BIGINT) AS n_regs,
          CAST(4096 - count(*) AS BIGINT) AS v,
          CAST(sum(CAST(1 AS BIGINT) << (49 - rho)) AS BIGINT) AS sumint
        FROM regs GROUP BY lang""")),

    // ---------------------------------------------------------------- q156
    // BENFORD first-digit audit over event values — the classic
    // data-forensics screen (fabricated or unit-mixed numeric columns
    // betray themselves in the leading-digit distribution): observed
    // count per first significant digit vs Benford's log10(1+1/d)
    // expectation, with the per-digit χ² term. No transcendentals at
    // runtime: the nine Benford probabilities are LITERALS (they are
    // constants of mathematics, not of the data), and the first
    // digit is extracted EXACTLY — value → DECIMAL(18,4) → ×10⁴ →
    // BIGINT (exact, scaling never changes the leading digit) →
    // first character of the INTEGER's string form (integer-to-string
    // is locale-free and identical cross-engine, unlike double
    // formatting). χ² terms are single IEEE ops on (BIGINT, literal)
    // pairs in a fixed chain, so the audit hash-matches.
    //
    // Scale shape: one scan map-side-combined to ≤9 rows; the
    // expected side is a 9-row literal table broadcast by
    // construction. Zero/negative values are excluded by contract
    // (they have no Benford digit) and reported via n_total vs Σobs.
    Q(
      "q156_benford",
      (s, dir) => {
        import s.implicits._
        val bp = Seq(
          (1L, 0.3010299957), (2L, 0.1760912591), (3L, 0.1249387366),
          (4L, 0.0969100130), (5L, 0.0791812460), (6L, 0.0669467896),
          (7L, 0.0579919470), (8L, 0.0511525224), (9L, 0.0457574906))
          .toDF("digit", "p")
        // Domain contract: the audit runs on the DECIMAL(18,4)-
        // QUANTIZED value (the table's stated money/qty precision,
        // Sql rule 1) — the gate is scaled >= 1, so a value that
        // quantizes to 0.0000 is OUT (it has no digit; gating on the
        // raw double would count it in n yet land it on a hidden
        // digit '0' row, distorting every expected count), and a
        // value within half an ulp of a decade boundary takes the
        // digit of its QUANTIZED form (9.99999 → 10.0000 → digit 1)
        // — consistently on both engines.
        val u = table(s, dir, "events")
          .select(dec($"value").*(lit(10000)).cast("long").as("scaled"))
          .filter($"scaled" >= 1L)
          .select(substring($"scaled".cast("string"), 1, 1)
            .cast("long").as("digit"))
        val obs = u.groupBy($"digit")
          .agg(count(lit(1)).cast("long").as("observed"))
        val tot = obs.agg(sum($"observed").cast("long").as("n"))
        broadcast(bp).join(obs, Seq("digit"), "left")
          .crossJoin(broadcast(tot))
          .select($"digit", coalesce($"observed", lit(0L)).as("observed"),
            $"n", $"p".as("benford_p"))
          .withColumn("chisq_term",
            (($"observed".cast("double") - $"n".cast("double") * $"benford_p") *
              ($"observed".cast("double") - $"n".cast("double") * $"benford_p")) /
              ($"n".cast("double") * $"benford_p"))
      },
      Some("""
        WITH bp(digit, p) AS (VALUES
          (CAST(1 AS BIGINT), 0.3010299957), (CAST(2 AS BIGINT), 0.1760912591),
          (CAST(3 AS BIGINT), 0.1249387366), (CAST(4 AS BIGINT), 0.0969100130),
          (CAST(5 AS BIGINT), 0.0791812460), (CAST(6 AS BIGINT), 0.0669467896),
          (CAST(7 AS BIGINT), 0.0579919470), (CAST(8 AS BIGINT), 0.0511525224),
          (CAST(9 AS BIGINT), 0.0457574906)),
        sc AS (
          SELECT CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS scaled
          FROM events),
        u AS (
          SELECT CAST(substr(CAST(scaled AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM sc WHERE scaled >= 1),
        obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS observed FROM u GROUP BY digit),
        tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM obs)
        SELECT bp.digit, CAST(coalesce(obs.observed, 0) AS BIGINT) AS observed,
          tot.n, CAST(bp.p AS DOUBLE) AS benford_p,
          ((CAST(coalesce(obs.observed, 0) AS DOUBLE) - CAST(tot.n AS DOUBLE) * CAST(bp.p AS DOUBLE)) *
           (CAST(coalesce(obs.observed, 0) AS DOUBLE) - CAST(tot.n AS DOUBLE) * CAST(bp.p AS DOUBLE))) /
          (CAST(tot.n AS DOUBLE) * CAST(bp.p AS DOUBLE)) AS chisq_term
        FROM bp LEFT JOIN obs USING (digit) CROSS JOIN tot""")),

    // ---------------------------------------------------------------- q170
    // SHUFFLE-SKEW AUDIT — the number that decides when q57's salting
    // (or AQE skew-join splitting) is worth it: for each candidate
    // partition count P ∈ {16, 64, 256}, hash lineitem's supplier key
    // into P buckets (engine-neutral md5 hash — Spark's internal
    // Murmur3 would not replay in the oracle) and report the exact
    // max-bucket/mean-bucket imbalance plus the heaviest single key's
    // row share. skew ≈ 1 ⇒ hash partitioning balances; skew ≫ 1 at
    // every P ⇒ the key histogram itself is the problem and salting
    // is the fix. All counts exact BIGINTs; two divisions per row.
    //
    // Scale shape: ONE key-count aggregation (map-side combined —
    // |keys| partials, the corpus never shuffles for the audit),
    // exploded ×3 over the P ladder to |keys|×3 bucket rows, then a
    // ≤ P·3-row bucket agg and a 3-row report. The heaviest key is a
    // max over the same key-count frame.
    Q(
      "q170_shuffle_skew",
      (s, dir) => {
        import s.implicits._
        val keys = table(s, dir, "lineitem")
          .groupBy($"l_suppkey").agg(count(lit(1)).cast("long").as("kn"))
          .localCheckpoint()
        val hashed = keys.withColumn("h", expr(
          "CAST(conv(substr(md5(CAST(l_suppkey AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
          .select($"kn", $"h",
            explode(expr("array(CAST(16 AS BIGINT), CAST(64 AS BIGINT), " +
              "CAST(256 AS BIGINT))")).as("p"))
          .withColumn("bucket", $"h" % $"p")
        val buckets = hashed.groupBy($"p", $"bucket")
          .agg(sum($"kn").cast("long").as("bn"))
        val tot = keys.agg(sum($"kn").cast("long").as("n"),
          count(lit(1)).cast("long").as("n_keys"),
          max($"kn").cast("long").as("top_key_rows"))
        buckets.groupBy($"p")
          .agg(count(lit(1)).cast("long").as("n_used_buckets"),
            max($"bn").cast("long").as("max_bucket_rows"))
          .crossJoin(broadcast(tot))
          .select($"p", $"n_keys", $"n_used_buckets", $"max_bucket_rows",
            $"n", $"top_key_rows",
            (($"max_bucket_rows" * $"p").cast("double") / $"n").as("skew"),
            ($"top_key_rows".cast("double") / $"n").as("top_key_share"))
      },
      Some("""
        WITH keys AS (
          SELECT l_suppkey, CAST(count(*) AS BIGINT) AS kn
          FROM lineitem GROUP BY l_suppkey),
        hashed AS (
          SELECT kn,
            CAST(CAST(concat('0x', substr(md5(CAST(l_suppkey AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) AS h,
            CAST(pp.p AS BIGINT) AS p
          FROM keys CROSS JOIN (SELECT unnest([16, 64, 256]) AS p) pp),
        buckets AS (
          SELECT p, h % p AS bucket, CAST(sum(kn) AS BIGINT) AS bn
          FROM hashed GROUP BY p, h % p),
        tot AS (
          SELECT CAST(sum(kn) AS BIGINT) AS n,
            CAST(count(*) AS BIGINT) AS n_keys,
            CAST(max(kn) AS BIGINT) AS top_key_rows
          FROM keys)
        SELECT b.p, t.n_keys,
          CAST(count(*) AS BIGINT) AS n_used_buckets,
          CAST(max(b.bn) AS BIGINT) AS max_bucket_rows,
          t.n, t.top_key_rows,
          CAST(max(b.bn) * b.p AS DOUBLE) / t.n AS skew,
          CAST(t.top_key_rows AS DOUBLE) / t.n AS top_key_share
        FROM buckets b CROSS JOIN tot t
        GROUP BY b.p, t.n_keys, t.n, t.top_key_rows""")),

    // ---------------------------------------------------------------- q172
    // GINI CONCENTRATION of token mass per source — the inequality
    // number beside q167's decile table (a Pareto table shows WHERE
    // mass concentrates; Gini is the single scalar dashboards trend).
    // Computed exactly from the rank form G = (2·Σi·xᵢ − (n+1)·Σx) /
    // (n·Σx) over ascending token counts: ranks are per-source
    // windows under a (tokens, doc_id) total order, both sides of
    // the division exact BIGINTs, one IEEE division per source. Ties
    // are harmless here beyond determinism: equal x under any
    // permutation of consecutive ranks leaves Σi·xᵢ unchanged.
    //
    // Scale shape: one scan collapses docs to (source, doc, tokens);
    // the per-source rank is ops.GlobalRank.withGroupRank — global
    // rank in (source, x, doc_id) order minus a broadcast per-source
    // min rank (q179's pattern), NOT a `partition by source` window:
    // a dominant source would sort its whole stripe in ONE task at
    // 100 TB, while the grouped rank's range partitions stay
    // corpus/numPartitions-sized under any source skew. The fold to
    // numerators is map-side-combined to |sources| rows.
    Q(
      "q172_token_gini",
      (s, dir) => {
        import s.implicits._
        val nt = table(s, dir, "documents")
          .select($"source", $"doc_id",
            size(expr("filter(split(text, ' '), x -> x <> '')"))
              .cast("long").as("x"))
        graft.ops.GlobalRank.withGroupRank(
            nt, Seq("source"), Seq($"x".asc, $"doc_id".asc), "i",
            s.sparkContext.defaultParallelism)
          .groupBy($"source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum($"x").cast("long").as("sum_tokens"),
            sum($"i" * $"x").cast("long").as("six"))
          .select($"source", $"n_docs", $"sum_tokens",
            ((lit(2L) * $"six" - ($"n_docs" + 1L) * $"sum_tokens")
              .cast("double")
              / ($"n_docs" * $"sum_tokens").cast("double")).as("gini"))
      },
      Some("""
        WITH nt AS (
          SELECT source, doc_id,
            CAST(len(list_filter(str_split(text, ' '), x -> x <> '')) AS BIGINT) AS x
          FROM documents),
        r AS (
          SELECT source, x,
            CAST(row_number() OVER (PARTITION BY source
                                    ORDER BY x ASC, doc_id ASC) AS BIGINT) AS i
          FROM nt),
        a AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(x) AS BIGINT) AS sum_tokens,
            CAST(sum(i * x) AS BIGINT) AS six
          FROM r GROUP BY source)
        SELECT source, n_docs, sum_tokens,
          CAST(2 * six - (n_docs + 1) * sum_tokens AS DOUBLE)
            / CAST(n_docs * sum_tokens AS DOUBLE) AS gini
        FROM a""")),

    // ---------------------------------------------------------------- q181
    // WINSORIZED ROBUST MOMENTS — outlier-clamped statistics (the
    // robust-preprocessing staple: cap each value at the exact p01 /
    // p99 order statistics before aggregating, so a fat tail cannot
    // drag the mean). The cut points are TRUE order statistics from
    // the global rank — ops.GlobalRank + ceil-rank integer algebra,
    // never a single-task sort and never a sketch (q72 is the sketch
    // form) — broadcast back as 2 scalars; the winsorized sum is
    // exact DECIMAL.
    //
    // Scale shape: one range exchange for the rank (which an exact
    // order statistic needs), the 2-row bound frame broadcasts, and
    // the clamp+agg pass is map-side-combined scan work. Output: one
    // row of exact-integer-derived doubles plus the clamp counts.
    Q(
      "q181_winsorized_stats",
      (s, dir) => {
        import s.implicits._
        val v = table(s, dir, "lineitem")
          .select(dec($"l_extendedprice").as("v"),
            $"l_orderkey", $"l_linenumber")
          .localCheckpoint()
        val ranked = graft.ops.GlobalRank.withRank(
          v, Seq($"v".asc, $"l_orderkey".asc, $"l_linenumber".asc),
          "rk", s.sparkContext.defaultParallelism)
        val nT = v.agg(count(lit(1)).cast("long").as("n"))
        // p-th percentile as the ceil(p·n) order statistic (the
        // classic nearest-rank definition — pure integer arithmetic)
        val bounds = ranked.crossJoin(broadcast(nT))
          .filter($"rk" === expr("CAST(ceil(n * 0.01) AS BIGINT)") ||
            $"rk" === expr("CAST(ceil(n * 0.99) AS BIGINT)"))
          .agg(min($"v").as("lo"), max($"v").as("hi"))
        v.crossJoin(broadcast(bounds))
          .select(
            when($"v" < $"lo", $"lo").when($"v" > $"hi", $"hi")
              .otherwise($"v").as("w"),
            ($"v" < $"lo").cast("long").as("c_lo"),
            ($"v" > $"hi").cast("long").as("c_hi"),
            $"lo", $"hi")
          .groupBy($"lo", $"hi")
          .agg(count(lit(1)).cast("long").as("n"),
            sum($"c_lo").cast("long").as("n_clamped_lo"),
            sum($"c_hi").cast("long").as("n_clamped_hi"),
            sum($"w").as("wsum"))
          .select(out($"lo").as("p01"), out($"hi").as("p99"),
            $"n", $"n_clamped_lo", $"n_clamped_hi",
            out($"wsum").as("winsorized_sum"),
            ($"wsum".cast("double") / $"n".cast("double"))
              .as("winsorized_mean"))
      },
      Some("""
        WITH v AS (
          SELECT CAST(l_extendedprice AS DECIMAL(18,4)) AS v,
            CAST(row_number() OVER (ORDER BY CAST(l_extendedprice AS DECIMAL(18,4)),
                 l_orderkey, l_linenumber) AS BIGINT) AS rk,
            CAST(count(*) OVER () AS BIGINT) AS n
          FROM lineitem),
        b AS (
          SELECT min(v) AS lo, max(v) AS hi
          FROM v WHERE rk = CAST(ceil(n * 0.01) AS BIGINT)
             OR rk = CAST(ceil(n * 0.99) AS BIGINT)),
        w AS (
          SELECT CASE WHEN v.v < b.lo THEN b.lo
                      WHEN v.v > b.hi THEN b.hi ELSE v.v END AS w,
            CAST(v.v < b.lo AS BIGINT) AS c_lo,
            CAST(v.v > b.hi AS BIGINT) AS c_hi,
            b.lo, b.hi
          FROM v CROSS JOIN b)
        SELECT CAST(lo AS DOUBLE) AS p01, CAST(hi AS DOUBLE) AS p99,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(c_lo) AS BIGINT) AS n_clamped_lo,
          CAST(sum(c_hi) AS BIGINT) AS n_clamped_hi,
          CAST(sum(w) AS DOUBLE) AS winsorized_sum,
          CAST(sum(w) AS DOUBLE) / count(*) AS winsorized_mean
        FROM w GROUP BY lo, hi""")),

    // ---------------------------------------------------------------- q185
    // JOIN CARDINALITY PROFILER — the optimizer-statistics pass that
    // prices a join WITHOUT running it: for an inner equi-join,
    // |A ⋈ B| = Σ_k cA(k)·cB(k) exactly, so the per-key histograms
    // (which cost two map-side-combined aggs over the KEY COLUMNS
    // only) yield the exact output cardinality, the matching-key
    // count, and the skew read (the hottest key's share of the
    // output — the salting decision input, q170's shuffle-skew audit
    // at the planning stage instead of post-mortem). Profiled for
    // the three fact joins of this schema. All counts exact BIGINTs;
    // both the per-key product and the sum carry LOUD overflow guards
    // (raise_error) because a sufficiently skewed key CAN push
    // Σ cA·cB past 2⁶³, where Spark would wrap silently while DuckDB
    // errors — the guard makes both engines fail identically instead
    // of silently diverging. The share is one division.
    //
    // Scale shape: nothing here touches a payload column or runs the
    // join — two key-histogram aggs per pair and a |matching keys|-
    // sized histogram join (AQE broadcasts the smaller histogram);
    // the top-key argmax is one max(struct) partial agg, never a
    // window.
    Q(
      "q185_join_cardinality",
      (s, dir) => {
        import s.implicits._
        def profile(name: String, left: org.apache.spark.sql.DataFrame,
            lk: String, right: org.apache.spark.sql.DataFrame, rk: String) = {
          val ca = left.select(col(lk).as("k"))
            .groupBy($"k").agg(count(lit(1)).cast("long").as("ca"))
          val cb = right.select(col(rk).as("k"))
            .groupBy($"k").agg(count(lit(1)).cast("long").as("cb"))
          ca.join(cb, "k")
            // loud overflow guards, both stages: Spark's non-ANSI Long
            // arithmetic WRAPS silently on heavily skewed keys while
            // DuckDB's BIGINT multiply (and HUGEINT-sum → BIGINT cast)
            // error natively — without the guard the engines would
            // silently diverge AND predicted_rows would be silently
            // wrong. ca, cb ≥ 1 by construction (groupBy counts), so
            // the division gate is total.
            .select($"k", expr(
              "CASE WHEN ca > CAST(9223372036854775807 AS BIGINT) div cb " +
                "THEN CAST(raise_error('q185: ca*cb overflows BIGINT') AS BIGINT) " +
                "ELSE ca * cb END").as("contrib"))
            // groupBy on the literal name (not a global agg): a pair
            // with ZERO matching keys must emit ZERO rows, exactly as
            // the oracle's GROUP BY over the empty join does — a
            // bare .agg() would emit one null-filled row and diverge
            .groupBy(lit(name).as("join_name"))
            .agg(
              count(lit(1)).cast("long").as("n_match_keys"),
              sum($"contrib").cast("long").as("sum_l"),
              // exact shadow sum: DECIMAL(38,0) cannot wrap where a
              // Long sum can — inequality below IS the overflow signal
              sum($"contrib".cast("decimal(38,0)")).as("sum_d"),
              max(struct($"contrib", $"k")).as("top"))
            .select($"join_name", $"n_match_keys",
              expr(
                "CASE WHEN CAST(sum_l AS DECIMAL(38,0)) <> sum_d " +
                  "THEN CAST(raise_error('q185: predicted_rows overflows BIGINT') AS BIGINT) " +
                  "ELSE sum_l END").as("predicted_rows"),
              $"top.k".as("top_key"),
              $"top.contrib".cast("long").as("top_rows"),
              ($"top.contrib".cast("double") /
                $"sum_l".cast("double")).as("top_share"))
        }
        val li = table(s, dir, "lineitem")
        profile("orders_lineitem", table(s, dir, "orders"), "o_orderkey",
            li, "l_orderkey")
          .unionAll(profile("part_lineitem", table(s, dir, "part"),
            "p_partkey", li, "l_partkey"))
          .unionAll(profile("customer_orders", table(s, dir, "customer"),
            "c_custkey", table(s, dir, "orders"), "o_custkey"))
      },
      Some("""
        WITH pr AS (
          SELECT 'orders_lineitem' AS join_name, o_orderkey AS k,
            CAST(count(*) AS BIGINT) AS ca FROM orders GROUP BY 1, 2
          UNION ALL
          SELECT 'part_lineitem', p_partkey, CAST(count(*) AS BIGINT)
          FROM part GROUP BY 1, 2
          UNION ALL
          SELECT 'customer_orders', c_custkey, CAST(count(*) AS BIGINT)
          FROM customer GROUP BY 1, 2),
        pb AS (
          SELECT 'orders_lineitem' AS join_name, l_orderkey AS k,
            CAST(count(*) AS BIGINT) AS cb FROM lineitem GROUP BY 1, 2
          UNION ALL
          SELECT 'part_lineitem', l_partkey, CAST(count(*) AS BIGINT)
          FROM lineitem GROUP BY 1, 2
          UNION ALL
          SELECT 'customer_orders', o_custkey, CAST(count(*) AS BIGINT)
          FROM orders GROUP BY 1, 2),
        j AS (
          SELECT pr.join_name, pr.k, pr.ca * pb.cb AS contrib
          FROM pr JOIN pb ON pr.join_name = pb.join_name AND pr.k = pb.k),
        a AS (
          SELECT join_name,
            CAST(count(*) AS BIGINT) AS n_match_keys,
            CAST(sum(contrib) AS BIGINT) AS predicted_rows,
            max(struct_pack(contrib := contrib, k := k)) AS top
          FROM j GROUP BY join_name)
        SELECT join_name, n_match_keys, predicted_rows,
          top.k AS top_key, CAST(top.contrib AS BIGINT) AS top_rows,
          CAST(top.contrib AS DOUBLE) / CAST(predicted_rows AS DOUBLE)
            AS top_share
        FROM a""")),

    // ---------------------------------------------------------------- q188
    // K-ANONYMITY / L-DIVERSITY AUDIT — the privacy read a training
    // corpus owes its governance review before release: documents
    // grouped by their quasi-identifier tuple (lang, 100-char length
    // band — the attributes a linkage attacker observes), each
    // equivalence class reporting its size k (a class of size 1 is a
    // re-identifiable document) and its l-diversity (distinct values
    // of the sensitive attribute, here provenance `source`: a class
    // whose members all share one source leaks provenance even when
    // k is large). Corpus-level k/l are the min over rows; the
    // singleton and mono-source classes are the remediation list.
    //
    // Scale shape: ONE map-side-combined aggregate over (lang, band)
    // — the class keys are low-cardinality by construction (that is
    // what makes them quasi-identifiers), so the output is
    // |langs|×|bands|-bounded; count + count-distinct per class, all
    // BIGINTs, one share division.
    Q(
      "q188_k_anonymity",
      (s, dir) => {
        import s.implicits._
        val n = table(s, dir, "documents")
          .agg(count(lit(1)).cast("long").as("n_total"))
        table(s, dir, "documents")
          .select($"lang", expr("n_chars div 100").cast("long").as("len_band"),
            $"source")
          .groupBy($"lang", $"len_band")
          .agg(count(lit(1)).cast("long").as("k_size"),
            countDistinct($"source").cast("long").as("l_div"))
          .crossJoin(broadcast(n))
          .select($"lang", $"len_band", $"k_size", $"l_div",
            ($"k_size".cast("double") / $"n_total".cast("double"))
              .as("class_share"),
            when($"k_size" === 1L, 1L).otherwise(0L).as("reidentifiable"),
            when($"l_div" === 1L, 1L).otherwise(0L).as("mono_source"))
      },
      Some("""
        WITH c AS (
          SELECT lang, CAST(n_chars // 100 AS BIGINT) AS len_band,
            CAST(count(*) AS BIGINT) AS k_size,
            CAST(count(DISTINCT source) AS BIGINT) AS l_div
          FROM documents GROUP BY lang, n_chars // 100),
        t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents)
        SELECT lang, len_band, k_size, l_div,
          CAST(k_size AS DOUBLE) / CAST(n_total AS DOUBLE) AS class_share,
          CAST(CASE WHEN k_size = 1 THEN 1 ELSE 0 END AS BIGINT) AS reidentifiable,
          CAST(CASE WHEN l_div = 1 THEN 1 ELSE 0 END AS BIGINT) AS mono_source
        FROM c CROSS JOIN t""")),

    // ---------------------------------------------------------------- q191
    // JOIN-ORDER ADVISOR — q185's histograms COMPOSED into the
    // decision they exist for: for the 3-table chain
    // customer ⋈ orders ⋈ lineitem, the two bushy-free orders differ
    // only in their INTERMEDIATE — (customer⋈orders) carries
    // |c⋈o| = |orders| rows into the second join, (orders⋈lineitem)
    // carries |o⋈l| — and the histogram algebra prices both exactly:
    // |A⋈B| = Σ_k cA(k)·cB(k) from two key-column aggs per pair, no
    // join executed. Output: one row per order with its predicted
    // intermediate and final cardinality, and the advisor's pick
    // (min intermediate — the heuristic every cost-based optimizer
    // starts from). The FINAL cardinality must agree across orders
    // (same join result) — a built-in cross-check the oracle also
    // enforces by construction.
    //
    // q185 profiles single joins post-hoc; this prices a PLAN CHOICE.
    // The same loud overflow discipline: products guarded by the
    // divide gate, sums shadowed in DECIMAL(38,0).
    //
    // Scale shape: four key-histogram aggs (narrow key columns only)
    // + histogram-sized joins; the intermediate-size estimate for the
    // second join needs per-key counts OF THE INTERMEDIATE, which for
    // a chain join on DIFFERENT keys is Σ over the bridge: per-order
    // lineitem counts weighted by the customer match — exactly one
    // more histogram join, still key-sized. Nothing touches payloads.
    Q(
      "q191_join_order_advisor",
      (s, dir) => {
        import s.implicits._
        // cl can be 0 (left-join coalesce): gate the division guard
        // on a positive multiplier or the guard itself divides by zero
        def guardedMul(a: String, b: String) = expr(
          s"CASE WHEN $b > 0 AND $a > CAST(9223372036854775807 AS BIGINT) div $b " +
            s"THEN CAST(raise_error('q191: $a*$b overflows BIGINT') AS BIGINT) " +
            s"ELSE $a * $b END")
        def summed(df: org.apache.spark.sql.DataFrame, name: String) = df
          .agg(sum($"contrib").cast("long").as("sum_l"),
            sum($"contrib".cast("decimal(38,0)")).as("sum_d"))
          .select(lit(name).as("order_name"),
            expr("CASE WHEN CAST(sum_l AS DECIMAL(38,0)) <> sum_d " +
              "THEN CAST(raise_error('q191: cardinality overflows BIGINT') AS BIGINT) " +
              "ELSE sum_l END").as("rows"))
        val co = table(s, dir, "customer").select($"c_custkey".as("k"))
          .groupBy($"k").agg(count(lit(1)).cast("long").as("cc"))
        val oc = table(s, dir, "orders")
          .select($"o_custkey".as("k"), $"o_orderkey")
        val lo = table(s, dir, "lineitem").select($"l_orderkey".as("ok"))
          .groupBy($"ok").agg(count(lit(1)).cast("long").as("cl"))
        // per-order row weight through BOTH joins: customer matches
        // (co) × lineitem matches (lo); intermediates are partial
        // products over the bridge table's keys. BOTH joins are LEFT:
        // an orphan order (no matching customer — a shape the fk
        // audit q177 explicitly counts) still carries its lineitem
        // rows into |o⋈l|, so cc coalesces to 0 rather than the
        // inner join silently dropping the order and under-predicting
        // the orders-first intermediate
        val bridge = oc
          .join(co, Seq("k"), "left")
          .join(lo, oc("o_orderkey") === lo("ok"), "left")
          .select($"k", $"o_orderkey",
            coalesce($"cc", lit(0L)).as("cc"),
            coalesce($"cl", lit(0L)).as("cl"))
          .localCheckpoint()
        val coFirst = summed(
          bridge.select($"cc".as("contrib")), "customer_orders_first")
        val olFirst = summed(
          bridge.select($"cl".as("contrib")), "orders_lineitem_first")
        val fin = summed(
          bridge.select(guardedMul("cc", "cl").as("contrib")), "final")
        val inter = coFirst.unionAll(olFirst).localCheckpoint()
        val best = inter.orderBy($"rows".asc, $"order_name".asc).limit(1)
          .select($"order_name".as("advised"), lit(1L).as("one"))
        inter.unionAll(fin.select($"order_name", $"rows"))
          .crossJoin(broadcast(best.select($"advised")))
      },
      Some("""
        WITH co AS (
          SELECT c_custkey AS k, CAST(count(*) AS BIGINT) AS cc
          FROM customer GROUP BY 1),
        lo AS (
          SELECT l_orderkey AS ok, CAST(count(*) AS BIGINT) AS cl
          FROM lineitem GROUP BY 1),
        bridge AS (
          SELECT o.o_custkey AS k, o.o_orderkey,
            CAST(coalesce(co.cc, 0) AS BIGINT) AS cc,
            CAST(coalesce(lo.cl, 0) AS BIGINT) AS cl
          FROM orders o
          LEFT JOIN co ON co.k = o.o_custkey
          LEFT JOIN lo ON lo.ok = o.o_orderkey),
        inter AS (
          SELECT 'customer_orders_first' AS order_name,
            CAST(sum(cc) AS BIGINT) AS rows FROM bridge
          UNION ALL
          SELECT 'orders_lineitem_first', CAST(sum(cl) AS BIGINT) FROM bridge),
        fin AS (
          SELECT 'final' AS order_name, CAST(sum(cc * cl) AS BIGINT) AS rows
          FROM bridge),
        best AS (
          SELECT order_name AS advised FROM inter
          ORDER BY rows ASC, order_name ASC LIMIT 1)
        SELECT u.order_name, u.rows, best.advised
        FROM (SELECT * FROM inter UNION ALL SELECT * FROM fin) u
        CROSS JOIN best""")),

    // ---------------------------------------------------------------- q193
    // SOURCE CONCENTRATION (Herfindahl index) per language — the
    // mixture-health read beside q133's divergence matrix: HHI =
    // Σ share² of the source distribution within each language, and
    // its reciprocal the EFFECTIVE source count (1/HHI = how many
    // equal-sized sources the mix behaves like). A language whose
    // effective sources ≪ its nominal sources is dominated by a few
    // feeds — the over-weighting a mixture plan (q90) must correct
    // before training. No entropy DELIBERATELY: ln is transcendental
    // and cross-engine ulp-unsafe, while HHI's Σc²/N² is a ratio of
    // exact integers — one double division per output (the Simpson-
    // index family carries the same ordering information). The
    // squares and their sum run in DECIMAL(38,0)/HUGEINT, not Long:
    // c² wraps a BIGINT once a source passes ~3×10⁹ docs — REAL at
    // the 100 TB scale this audit targets — and Spark would wrap
    // silently where DuckDB errors (the q185 divergence class).
    //
    // Scale shape: one map-side-combined (lang, source) count agg —
    // the only corpus-sized pass — then Σc² per language over the
    // |langs|×|sources|-bounded frame; all integer until the final
    // divisions.
    Q(
      "q193_source_concentration",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .groupBy($"lang", $"source")
          .agg(count(lit(1)).cast("long").as("c"))
          .groupBy($"lang")
          .agg(
            count(lit(1)).cast("long").as("n_sources"),
            sum($"c").cast("long").as("n_docs"),
            sum($"c".cast("decimal(38,0)") * $"c").as("sum_sq"))
          .select($"lang", $"n_sources", $"n_docs",
            ($"sum_sq".cast("double") /
              ($"n_docs".cast("decimal(38,0)") * $"n_docs").cast("double"))
              .as("hhi"),
            (($"n_docs".cast("decimal(38,0)") * $"n_docs").cast("double") /
              $"sum_sq".cast("double")).as("effective_sources"))
      },
      Some("""
        WITH c AS (
          SELECT lang, source, CAST(count(*) AS BIGINT) AS c
          FROM documents GROUP BY lang, source),
        a AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n_sources,
            CAST(sum(c) AS BIGINT) AS n_docs,
            sum(CAST(c AS HUGEINT) * c) AS sum_sq
          FROM c GROUP BY lang)
        SELECT lang, n_sources, n_docs,
          CAST(sum_sq AS DOUBLE) / CAST(CAST(n_docs AS HUGEINT) * n_docs AS DOUBLE) AS hhi,
          CAST(CAST(n_docs AS HUGEINT) * n_docs AS DOUBLE) / CAST(sum_sq AS DOUBLE)
            AS effective_sources
        FROM a""")),

    // --------------------------------------------------------------- q206
    // POISSON BOOTSTRAP error bars (Chamandy et al. 2012, "Estimating
    // uncertainty for massive data streams" — the resampling form
    // that works in ONE distributed pass): classical bootstrap draws
    // n-with-replacement per replica (impossible without n sequential
    // passes); the Poisson approximation gives every row an
    // independent Poisson(1) replication weight per replica, so all
    // B = 32 replicas compute in one scan. Weights are DERIVED, not
    // drawn: u = md5-hash60(doc_id|b)/2⁶⁰ (an exact power-of-two
    // scaling of a correctly-rounded BIGINT→DOUBLE — bit-identical on
    // both engines) inverted through the Poisson(1) CDF with the
    // seven FIXED double literals below (shared verbatim with the
    // oracle; tail capped at 7, mass 1.04e-5 — the cap is part of the
    // operator's definition, making it deterministic AND exact to
    // replay). Per replica: n_eff = Σw and the weighted mean of
    // n_chars — exact BIGINT sums, ONE division. The spread of the 32
    // replica means IS the standard error of the corpus mean; a
    // consumer takes quantiles of this 32-row frame.
    //
    // Scale shape: one scan, explode ×32 (the weight math is in-row),
    // ONE map-side-combined 32-group agg — partials are 32 rows per
    // task regardless of corpus size. No second pass, no state.
    Q(
      "q206_poisson_bootstrap",
      (s, dir) => {
        import s.implicits._
        val ts = Seq("0.36787944117144233", "0.7357588823428847",
          "0.9196986029286058", "0.9810118431238463", "0.9963401531726563",
          "0.9994058151824183", "0.999916758850712")
        val wExpr = ts.map(t =>
          s"(CASE WHEN u >= CAST($t AS DOUBLE) THEN 1 ELSE 0 END)")
          .mkString(" + ")
        table(s, dir, "documents")
          .select($"doc_id", $"n_chars",
            explode(expr("sequence(0, 31)")).as("b"))
          .withColumn("u", expr(
            """CAST(CAST(conv(substr(md5(concat(doc_id, '|', b)), 1, 15), 16, 10) AS BIGINT) AS DOUBLE)
               / CAST(1152921504606846976 AS DOUBLE)"""))
          .withColumn("w", expr(s"CAST($wExpr AS BIGINT)"))
          .groupBy($"b".cast("long").as("b"))
          .agg(sum($"w").cast("long").as("n_eff"),
            sum($"w" * $"n_chars").cast("long").as("sum_chars"))
          .select($"b", $"n_eff",
            when($"n_eff" === 0L, 0.0)
              .otherwise($"sum_chars".cast("double") / $"n_eff".cast("double"))
              .as("mean_chars"))
      },
      Some {
        val ts = Seq("0.36787944117144233", "0.7357588823428847",
          "0.9196986029286058", "0.9810118431238463", "0.9963401531726563",
          "0.9994058151824183", "0.999916758850712")
        val wSql = ts.map(t =>
          s"(CASE WHEN u >= CAST($t AS DOUBLE) THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""
        WITH e AS (
          SELECT doc_id, n_chars, b.b,
            CAST(CAST(CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '|', CAST(b.b AS VARCHAR))), 1, 15)) AS UBIGINT) AS BIGINT) AS DOUBLE)
              / CAST(1152921504606846976 AS DOUBLE) AS u
          FROM documents CROSS JOIN generate_series(0, 31) b(b)),
        w AS (
          SELECT b, n_chars, CAST($wSql AS BIGINT) AS w FROM e)
        SELECT CAST(b AS BIGINT) AS b,
          CAST(sum(w) AS BIGINT) AS n_eff,
          CASE WHEN sum(w) = 0 THEN CAST(0.0 AS DOUBLE)
               ELSE CAST(sum(w * n_chars) AS DOUBLE) / sum(w) END AS mean_chars
        FROM w GROUP BY b"""
      })
  )

  /** Distributed Misra–Gries engine behind q111: per-partition MG
    * summaries of ≤ k counters, merged by token-keyed SUM. Returns the
    * FULL merged summary (tok, est) — q111 applies the top-20 cut;
    * HeavyHitterSpec asserts the bounds on the uncut frame. The
    * decrement step batches by the minimum surviving count (one pass
    * over the k counters removes min·k mass), keeping the amortized
    * cost O(1) per token. Per-partition error ≤ nₚ/(k+1); summed,
    * global undercount ≤ n/(k+1) and overcount is impossible —
    * mergeability is what lets the corpus-sized stream reduce to P·k
    * shuffled rows.
    */
  private[graft] def heavyHitters(
      toks: org.apache.spark.sql.Dataset[String],
      k: Int): org.apache.spark.sql.DataFrame = {
    val s = toks.sparkSession
    import s.implicits._
    toks.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        counters.get(t) match {
          case Some(c) => counters.update(t, c + 1)
          case None if counters.size < k => counters.update(t, 1L)
          case None =>
            // Misra–Gries overflow: decrement every counter by the
            // current minimum + 1 conceptually covers this arrival and
            // min·k prior mass; practically decrement by 1 each and
            // drop zeros (the arriving token is NOT inserted — its one
            // unit is the decrement's own)
            val dead = List.newBuilder[String]
            counters.foreach { case (key, c) =>
              if (c == 1L) dead += key else counters.update(key, c - 1)
            }
            dead.result().foreach(counters.remove)
        }
      }
      counters.iterator.map { case (t, c) => (t, c) }
    }.toDF("tok", "c")
      .groupBy($"tok")
      .agg(sum($"c").cast("long").as("est"))
  }
}
