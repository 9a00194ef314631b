package graft.queries

import graft.Q
import graft.Sql._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set preparation operators — the last mile of a data
  * pipeline before an LLM training run: reproducible dataset splits
  * and token-budget sequence packing.
  */
object TrainPrep {

  /** q53's content-addressed split bucket (first 32 bits of
    * md5(doc_id || salt) mod 100) and its 80/10/10 verdict — ONE
    * definition shared by q53 and every audit that reasons ABOUT the
    * split (q192): a consumer re-inlining the expression would
    * silently audit a different split if the salt or boundaries ever
    * moved. [[splitBucketSql]]/[[splitSql]] are the DuckDB twins,
    * generated from the same literals.
    */
  // built from Column operations, NOT Column.toString interpolation
  // into expr(): the string form is only valid for bare attribute
  // names — a qualified (a.doc_id) or derived column would produce
  // broken or silently mis-bound SQL for any future caller
  private[graft] def splitBucket(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(concat(c.cast("string"), lit("|split"))), 1, 8), 16, 10)
      .cast("long") % 100
  private[graft] def splitOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(splitBucket(c) < 80, "train")
      .when(splitBucket(c) < 90, "val")
      .otherwise("test")
  private[graft] def splitBucketSql(x: String): String =
    s"CAST(CAST(concat('0x', substr(md5(concat(CAST($x AS VARCHAR), '|split')), 1, 8)) AS UBIGINT) AS BIGINT) % 100"
  private[graft] def splitSql(x: String): String =
    s"CASE WHEN ${splitBucketSql(x)} < 80 THEN 'train' WHEN ${splitBucketSql(x)} < 90 THEN 'val' ELSE 'test' END"

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------- q53
    // Deterministic train/val/test split: bucket = first 32 bits of
    // md5(doc_id || salt) mod 100 → 80/10/10. Content-addressed splits
    // are the scale-correct form: stable under corpus growth and
    // re-partitioning (a random() split reshuffles membership every
    // run and leaks val into train on incremental rebuilds), pure scan
    // projection, no shuffle, no state. The expression lives in
    // [[splitBucket]]/[[splitOf]] — shared with the q192 leakage
    // audit, which must reason about THIS split, not a copy.
    Q(
      "q53_dataset_split",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .select($"doc_id", splitBucket($"doc_id").as("bucket"))
          .withColumn("split",
            when($"bucket" < 80, "train")
              .when($"bucket" < 90, "val")
              .otherwise("test"))
      },
      Some(s"""
        SELECT doc_id, bucket,
          CASE WHEN bucket < 80 THEN 'train'
               WHEN bucket < 90 THEN 'val'
               ELSE 'test' END AS split
        FROM (
          SELECT doc_id, ${splitBucketSql("doc_id")} AS bucket
          FROM documents) b""")),

    // ---------------------------------------------------------------- q54
    // Sequence packing: documents greedily packed into fixed
    // token-budget bins (8192 whitespace tokens) in deterministic
    // doc_id order WITHIN each language — pack_id = floor(tokens
    // before this doc / budget). The running sum is
    // ops.GlobalRank.withGroupPrefixSum, NOT a `partition by lang`
    // running-sum window: a dominant language (en ≈ half of any web
    // corpus) would make that window partition a single-task
    // sort+stream of half the corpus at 100 TB. The grouped prefix
    // sum range-partitions on (lang, doc_id) — the same exchange the
    // window needs — then per-(partition, lang) token subtotals
    // prefix-sum on the driver (a ≤ partitions+|langs| row action)
    // and broadcast back into ONE narrow streaming pass; no partition
    // ever holds more than corpus/numPartitions rows regardless of
    // language skew. Packing arithmetic is exact BIGINT.
    Q(
      "q54_sequence_packing",
      (s, dir) => {
        import s.implicits._
        val nt = table(s, dir, "documents")
          .select($"doc_id", $"lang",
            size(filter(split($"text", "[ \\t\\n\\x0B\\f\\r]+"), x => x =!= "")).cast("long").as("n_tokens"))
        graft.ops.GlobalRank.withGroupPrefixSum(
            nt, Seq("lang"), Seq($"doc_id".asc), "n_tokens", "cum_tokens",
            s.sparkContext.defaultParallelism)
          // `div`, not `/`: Column./ on longs is DOUBLE division
          .withColumn("pack_id", expr("(cum_tokens - n_tokens) div 8192"))
          .withColumn("pack_offset", ($"cum_tokens" - $"n_tokens") % 8192)
      },
      Some("""
        WITH t AS (
          SELECT doc_id, lang,
            CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), x -> x <> '')) AS BIGINT) AS n_tokens
          FROM documents),
        c AS (
          SELECT doc_id, lang, n_tokens,
            CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
          FROM t)
        SELECT doc_id, lang, n_tokens, cum_tokens,
          (cum_tokens - n_tokens) // 8192 AS pack_id,
          (cum_tokens - n_tokens) % 8192 AS pack_offset
        FROM c""")),

    // ---------------------------------------------------------------- q73
    // Data mixing: per-source sampling weights (the training-mixture
    // op — upsample curated sources, downsample bulk ones) via
    // content-addressed hash buckets, NOT rand(): membership is a pure
    // function of (doc_id, salt), so the mixture is reproducible
    // across runs, partitionings, and engines — and is therefore fully
    // oracle-checkable, unlike sampleBy. Scan projection + broadcast
    // weight map; no shuffle.
    Q(
      "q73_data_mixture",
      (s, dir) => {
        import s.implicits._
        // explicit weights for curated/bulk sources; everything else
        // keeps the 50% default (left join + coalesce)
        val weights = Seq(("src0", 100L), ("src1", 100L), ("src2", 10L), ("src3", 25L), ("src4", 75L))
          .toDF("source", "w")
        table(s, dir, "documents")
          .withColumn("bucket",
            expr("CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), '|mix')), 1, 8), 16, 10) AS BIGINT) % 100"))
          .join(broadcast(weights), Seq("source"), "left")
          .withColumn("keep_pct", coalesce($"w", lit(50L)))
          .filter($"bucket" < $"keep_pct")
          .select($"doc_id", $"source", $"bucket", $"keep_pct")
      },
      Some("""
        WITH w(source, wt) AS (
          VALUES ('src0', 100), ('src1', 100), ('src2', 10), ('src3', 25), ('src4', 75)),
        b AS (
          SELECT doc_id, source,
            CAST(CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '|mix')), 1, 8)) AS UBIGINT) AS BIGINT) % 100 AS bucket
          FROM documents)
        SELECT b.doc_id, b.source, b.bucket, CAST(coalesce(w.wt, 50) AS BIGINT) AS keep_pct
        FROM b LEFT JOIN w ON b.source = w.source
        WHERE b.bucket < coalesce(w.wt, 50)""")),

    // ---------------------------------------------------------------- q77
    // Overlapping chunking for embedding: 200-char windows at stride
    // 150 (50-char overlap so no boundary context is lost) — the
    // standard retrieval/embedding prep step between curation (q20-q45)
    // and the ANN indexes (q25/q33/q52). Pure scan flatMap: chunk
    // geometry is arithmetic on the text length, chunks carry an md5
    // identity for downstream exact dedup, and nothing shuffles.
    Q(
      "q77_chunking",
      (s, dir) => {
        import s.implicits._
        // length >= 1 on BOTH engines: for an empty text Spark's
        // sequence(0, (-1) div 150) = sequence(0, 0) would emit one
        // chunk while the oracle's generate_series(0, -1) emits none —
        // an empty document has no chunks by contract.
        table(s, dir, "documents")
          .filter(length($"text") >= 1)
          .select($"doc_id", explode(expr(
            """transform(sequence(0, CAST((length(text)-1) div 150 AS INT)),
                 c -> struct(CAST(c AS BIGINT) AS chunk_no, substring(text, c*150+1, 200) AS chunk))""")).as("ch"))
          .select($"doc_id", $"ch.chunk_no".as("chunk_no"),
            length($"ch.chunk").cast("long").as("n_chunk_chars"),
            md5($"ch.chunk").as("chunk_md5"))
      },
      // per-doc exact series bound (no silent cap for long docs):
      // DuckDB's table-function generate_series can't correlate on
      // text, but the scalar list form + unnest can
      Some("""
        WITH e AS (
          SELECT doc_id, text,
            unnest(generate_series(0, CAST((length(text)-1) // 150 AS BIGINT))) AS c
          FROM documents WHERE length(text) >= 1)
        SELECT doc_id, CAST(c AS BIGINT) AS chunk_no,
          CAST(length(substr(text, c*150+1, 200)) AS BIGINT) AS n_chunk_chars,
          md5(substr(text, c*150+1, 200)) AS chunk_md5
        FROM e""")),

    // ---------------------------------------------------------------- q103
    // Z-ORDER layout (Morton curve — the OPTIMIZE ZORDER primitive of
    // Delta/Iceberg table maintenance): interleave the bits of two
    // clustering keys so that RANGE-partitioning the z-value and
    // writing one file per range makes every file's min/max statistics
    // tight on BOTH columns at once — a predicate on either key then
    // prunes files, where a single-column sort prunes only its own
    // column. The z-value is pure integer arithmetic (bit i of each
    // key extracted by (k div 2^i) % 2 — portable verbatim to DuckDB's
    // `//`), so the whole layout decision is oracle-checked.
    //
    // The query materializes the pruning EVIDENCE at bucket = z div
    // 2^18 granularity (a bucket stands for one file): per bucket, the
    // row count and both keys' min/max. Fixing z's bits ≥ 18 fixes
    // each key's bits ≥ 9, so max_x − min_x < 512 in EVERY bucket by
    // construction regardless of data (ZOrderSpec pins it, and pins
    // that a suppkey-sorted layout of equal bucket sizes leaves
    // partkey ranges ~global — the cross-dimension win). At 100 TB:
    // ONE repartitionByRange($"z") + sortWithinPartitions at write
    // time, no extra pass — the same exchange a plain sort needs.
    // ops.ZOrder.write is the operator that PRODUCES this layout on
    // disk (with min–max key scaling so unequal-width keys share the
    // z bits); ZOrderSpec measures actual per-file footer pruning on
    // both keys against a single-column-sorted control.
    Q(
      "q103_zorder_layout",
      (s, dir) => {
        import s.implicits._
        // explicit % 2^16 enforces zInterleave's input contract (the
        // interleave reads bits 0..15 ONLY — an unwrapped wider key
        // would silently alias distant values into one bucket and
        // void the min/max bound); at the test SFs both keys already
        // fit 16 bits, so the wrap is an identity there, and a wider
        // key domain sizes `bits` up instead (≤31)
        table(s, dir, "lineitem")
          .select(($"l_partkey" % 65536).as("x"), ($"l_suppkey" % 65536).as("y"))
          .withColumn("z", expr(zInterleave("x", "y", "div")))
          .withColumn("bucket", expr(s"z div ${1L << 18}"))
          .groupBy($"bucket")
          .agg(
            count(lit(1)).cast("long").as("n"),
            min($"x").as("min_x"), max($"x").as("max_x"),
            min($"y").as("min_y"), max($"y").as("max_y"))
      },
      Some(s"""
        WITH k AS (
          SELECT l_partkey % 65536 AS x, l_suppkey % 65536 AS y
          FROM lineitem),
        z AS (
          SELECT x, y, ${zInterleave("x", "y", "//")} AS z
          FROM k)
        SELECT z // ${1L << 18} AS bucket,
          CAST(count(*) AS BIGINT) AS n,
          min(x) AS min_x, max(x) AS max_x,
          min(y) AS min_y, max(y) AS max_y
        FROM z GROUP BY 1""")),

    // --------------------------------------------------------------- q112
    // Corpus snapshot diff — the drop manifest every incremental
    // operator in this engine consumes (q74/q105/q107, appendSaved,
    // StreamIndex all take "the batch" as given; this query PRODUCES
    // it by reconciling two corpus snapshots): full-outer join on
    // doc_id comparing content fingerprints, emitting added / removed
    // / changed rows (unchanged docs are suppressed — the manifest is
    // sized by the CHANGE, not the corpus). The two snapshots are
    // deterministic views of the documents table (old: %10==7 docs
    // absent and %10==3 docs carry pre-edit text; new: %10==5 docs
    // retired), so the oracle reproduces them exactly.
    //
    // Scale shape: fingerprints are computed scan-side (md5 of the
    // text — 16 bytes), so the join shuffles (doc_id, fp) pairs only;
    // text never moves. At 100 TB both sides hash-partition on doc_id
    // (or co-bucket at rest, making the reconcile exchange-free —
    // BucketingSpec's posture); the suppressed-equal filter keeps the
    // output O(|diff|).
    Q(
      "q112_snapshot_diff",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val old = docs.filter($"doc_id" % 10 =!= 7)
          .select($"doc_id", md5(when($"doc_id" % 10 === 3,
            regexp_replace($"text", "spark", "spork")).otherwise($"text")).as("old_fp"))
        val cur = docs.filter($"doc_id" % 10 =!= 5)
          .select($"doc_id", md5($"text").as("new_fp"))
        old.join(cur, Seq("doc_id"), "full_outer")
          .withColumn("status",
            when($"old_fp".isNull, "added")
              .when($"new_fp".isNull, "removed")
              .when($"old_fp" =!= $"new_fp", "changed"))
          .filter($"status".isNotNull)
          .select($"doc_id", $"status",
            coalesce($"old_fp", lit("")).as("old_fp"),
            coalesce($"new_fp", lit("")).as("new_fp"))
      },
      Some("""
        WITH old AS (
          SELECT doc_id,
            md5(CASE WHEN doc_id % 10 = 3 THEN replace(text, 'spark', 'spork')
                     ELSE text END) AS old_fp
          FROM documents WHERE doc_id % 10 <> 7),
        cur AS (
          SELECT doc_id, md5(text) AS new_fp
          FROM documents WHERE doc_id % 10 <> 5),
        d AS (
          SELECT coalesce(old.doc_id, cur.doc_id) AS doc_id, old_fp, new_fp,
            CASE WHEN old_fp IS NULL THEN 'added'
                 WHEN new_fp IS NULL THEN 'removed'
                 WHEN old_fp <> new_fp THEN 'changed' END AS status
          FROM old FULL OUTER JOIN cur ON old.doc_id = cur.doc_id)
        SELECT doc_id, status,
          coalesce(old_fp, '') AS old_fp,
          coalesce(new_fp, '') AS new_fp
        FROM d WHERE status IS NOT NULL""")),

    // --------------------------------------------------------------- q119
    // CCNet-style head/middle/tail bucketing (Wenzek et al. 2020): a
    // per-language score distribution is cut into terciles and every
    // document is tagged head (best third), middle, or tail — the
    // lever CCNet/LLaMA pipelines use to weight or drop whole quality
    // strata. The scale-defining choice: cutoffs are score VALUES
    // computed from a content-addressed 20% sample (md5 bucket, the
    // q53 discipline — deterministic, partitioning-independent) via a
    // per-language bounded order-statistic agg, then BROADCAST into a
    // scan-side CASE — NOT a row_number window over the corpus (a
    // per-language rank would funnel each language through one
    // partition; cutoff values assign buckets at read throughput, and
    // ties land deterministically by value on both engines, exactly
    // CCNet's semantics). The stand-in score is mean token length in
    // exact ppm BIGINTs (one in-row fold, no ln(), the q88/q109
    // rules); production swaps in a KenLM perplexity column — the
    // bucketing machinery is score-agnostic. Languages absent from
    // the sample get 'middle' (explicit, not an error: a new language
    // appearing mid-corpus should not crash the tagger).
    //
    // Scale shape: score is a pure scan projection; the sample agg
    // holds one sorted LONG list per language (cap the sample fraction
    // so a language's list stays ~1e5 entries ≈ 800 KB — CCNet itself
    // computes cutoffs on a fixed sample); assignment is scan +
    // broadcast join. Nothing corpus-sized ever shuffles.
    Q(
      "q119_ppl_buckets",
      (s, dir) => {
        import s.implicits._
        pplBuckets(table(s, dir, "documents").select($"doc_id", $"lang", $"text"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id, lang,
            list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS toks
          FROM documents),
        sc AS (
          SELECT doc_id, lang,
            (CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) * 1000000)
              // CAST(len(toks) AS BIGINT) AS score_ppm
          FROM t WHERE len(toks) >= 1),
        samp AS (
          SELECT lang, score_ppm FROM sc
          WHERE CAST(CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '|pplcut')), 1, 8)) AS UBIGINT) AS BIGINT) % 100 < 20),
        cut AS (
          SELECT lang,
            l[CAST((m + 2) // 3 AS INT)] AS cut1,
            l[CAST((2 * m + 2) // 3 AS INT)] AS cut2
          FROM (
            SELECT lang, list(score_ppm ORDER BY score_ppm) AS l,
              CAST(count(*) AS BIGINT) AS m
            FROM samp GROUP BY lang))
        SELECT sc.doc_id, sc.lang, sc.score_ppm,
          CASE WHEN cut.cut1 IS NULL THEN 'middle'
               WHEN sc.score_ppm <= cut.cut1 THEN 'head'
               WHEN sc.score_ppm <= cut.cut2 THEN 'middle'
               ELSE 'tail' END AS bucket
        FROM sc LEFT JOIN cut ON sc.lang = cut.lang""")),

    // --------------------------------------------------------------- q121
    // Deterministic global shuffle + exactly-balanced shard assignment
    // — the step that WRITES a training set: order the corpus by a
    // content-addressed hash (a reproducible "random" permutation —
    // same order on any engine, any partitioning, any run, unlike
    // rand()), take the global rank, and deal documents round-robin
    // into 16 shards, so shard sizes are equal ±1 BY CONSTRUCTION
    // (q53's hash-bucket split is reproducible but only
    // statistically balanced; a shard writer needs exact balance).
    // The writer tail is `partitionBy(shard)` over this frame.
    //
    // Scale shape: the global rank is ops.GlobalRank (range-partition
    // on h + per-partition offset prefix-sum + narrow local
    // numbering — q83's machinery), NOT a row_number window that
    // funnels 100 TB through one partition; the hash is a scan
    // projection and the modulo is free. Eager (the offset prefix-sum
    // is a numPartitions-row action), same caveat as q83.
    Q(
      "q121_shard_assign",
      (s, dir) => {
        import s.implicits._
        shardAssign(table(s, dir, "documents").select($"doc_id"), 16,
          s.sparkContext.defaultParallelism)
      },
      Some("""
        WITH h AS (
          SELECT doc_id,
            CAST(CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '|shard')), 1, 15)) AS UBIGINT) AS BIGINT) AS h
          FROM documents),
        r AS (
          SELECT doc_id, h,
            CAST(row_number() OVER (ORDER BY h ASC, doc_id ASC) AS BIGINT) AS rk
          FROM h)
        SELECT doc_id, h, rk, (rk - 1) % 16 AS shard FROM r""")),

    // --------------------------------------------------------------- q134
    // FEATURE-HASHED document embeddings (Weinberger et al. 2009's
    // hashing trick, the fastText/Vowpal-Wabbit featurizer): each
    // token lands in bucket h mod 16 with sign from an independent
    // hash bit, per-doc signed counts accumulate in EXACT BIGINTs,
    // and the l2 normalization is the only float step — x_i =
    // c_i / sqrt(Σc²), two IEEE ops per component over an exact
    // integer norm, so the vectors hash-match bit-for-bit (no model,
    // no training, deterministic across engines and partitionings).
    // This closes the text → vector loop: the output is the sparse
    // long form (doc_id, i, c, x) the ANN family (q130's kNN graph,
    // the IVF/PQ indexes) ingests after a pivot-to-array.
    //
    // Scale shape: tokenize + hash + signed count is ONE map-side-
    // combinable aggregation (≤16 partials per doc leave each map
    // task); the norm is a second |docs|×16-sized agg joined back on
    // doc_id — the partitioning from the first shuffle is reused, no
    // extra exchange. Nothing corpus-quadratic, no windows, text
    // never shuffles (only (doc_id, bucket, count) triples).
    Q(
      "q134_feature_hash",
      (s, dir) => {
        import s.implicits._
        val sel = graft.queries.Selection
        val toks = Llm.docsSpread(s, dir)
          .select($"doc_id", explode(expr(
            "filter(split(lower(text), '[^a-z]+'), x -> x <> '')")).as("tok"))
          .withColumn("h", expr(sel.h60("tok")))
        val comps = toks
          .groupBy($"doc_id", ($"h" % 16).as("i"))
          .agg(sum(expr("IF((shiftright(h, 4) & 1) = 1, 1, -1)")).cast("long").as("c"))
          .filter($"c" =!= 0L)
        val norms = comps.groupBy($"doc_id")
          .agg(sum($"c" * $"c").cast("long").as("n2"))
        comps.join(norms, "doc_id")
          .select($"doc_id", $"i", $"c",
            ($"c".cast("double") / sqrt($"n2".cast("double"))).as("x"))
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id,
            unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')) AS tok
          FROM documents),
        h AS (
          SELECT doc_id, ${graft.queries.Selection.h60Sql("tok")} AS h
          FROM toks),
        comps AS (
          SELECT doc_id, h % 16 AS i,
            CAST(sum(CASE WHEN ((h >> 4) & 1) = 1 THEN 1 ELSE -1 END) AS BIGINT) AS c
          FROM h GROUP BY doc_id, h % 16
          HAVING sum(CASE WHEN ((h >> 4) & 1) = 1 THEN 1 ELSE -1 END) <> 0),
        norms AS (
          SELECT doc_id, CAST(sum(c * c) AS BIGINT) AS n2 FROM comps GROUP BY doc_id)
        SELECT comps.doc_id, comps.i, comps.c,
          CAST(comps.c AS DOUBLE) / sqrt(CAST(norms.n2 AS DOUBLE)) AS x
        FROM comps JOIN norms ON comps.doc_id = norms.doc_id"""))
  ,
    // --------------------------------------------------------------- q139
    // UniMax MIXTURE PLAN — the language-sampling allocation the
    // multilingual-pretraining papers converged on (UniMax, Chung et
    // al. 2023): split a token budget as EVENLY across languages as
    // each language's supply allows. Waterfill: with per-language
    // token counts sorted ascending, find the first rank k* where
    // prefix(k*−1) + (n−k*+1)·c_k* ≥ B; languages below k* are
    // supply-CAPPED (alloc = their full count), the rest share the
    // water level t = (B − prefix(k*−1))/(n−k*+1) equally. B = ⌊total/5⌋
    // here (a 1-epoch-over-20% budget). Everything is BIGINT window
    // algebra — prefix sums, ranks, the feasibility flag — until the
    // single division that produces t, so the plan hash-matches
    // bit-for-bit (the q133 discipline).
    //
    // Scale shape: ONE corpus scan map-side-combines to |langs| rows;
    // every window below runs on that |langs|-sized frame (global
    // windows over a frame this small are driver-trivial — the
    // opposite of a corpus rank window, q81's GlobalRank note).
    Q(
      "q139_unimax_plan",
      (s, dir) => unimaxPlan(Llm.docsSpread(s, dir)),
      Some(s"""
        WITH $unimaxSqlCtes
        SELECT lang, tokens, capped, alloc FROM plan"""))
  ,
    // --------------------------------------------------------------- q142
    // Mixture plan APPLY — q139's allocation executed as a
    // deterministic per-document draw (the q53/q80 content-addressed
    // discipline: no random(), so the sample is reproducible and
    // stable under re-runs): each doc keeps with probability
    // alloc/tokens of its language, decided by comparing its 60-bit
    // md5 draw against floor(f·2⁶⁰) — the threshold is ONE double
    // multiply + floor on both engines, the comparison pure BIGINT.
    // Output is the per-language audit: supply, allocation, and the
    // REALIZED doc/token draw (the number a mixing run reports
    // beside the plan — sampling docs against a token budget
    // realizes the budget in expectation; the audit row is exactly
    // the evidence that it did).
    //
    // Scale shape: the |langs|-sized plan broadcasts into a
    // scan-side join; the draw is a per-doc hash compare at scan
    // throughput; ONE lang-keyed rollup shuffles |langs|-sized
    // partials. Languages whose every document is empty carry no
    // plan row and drop out (inner join) — their supply is zero.
    Q(
      "q142_mixture_apply",
      (s, dir) => {
        import s.implicits._
        val docs = Llm.docsSpread(s, dir)
        val dtok = docs.select($"doc_id", $"lang",
          expr("CAST(size(filter(split(lower(text), '[^a-z]+'), x -> x <> '')) AS BIGINT)").as("tl"))
        val sel = dtok.join(broadcast(unimaxPlan(docs)), "lang")
          .withColumn("thresh", expr(
            "CAST(floor(alloc / CAST(tokens AS DOUBLE) * 1152921504606846976.0) AS BIGINT)"))
          .withColumn("s",
            (expr(Selection.h60("concat(CAST(doc_id AS STRING), '|mix')")) < $"thresh")
              .cast("long"))
        sel.groupBy($"lang", $"tokens", $"alloc")
          .agg(
            count(lit(1)).cast("long").as("n_docs"),
            sum($"s").cast("long").as("n_sel"),
            sum($"s" * $"tl").cast("long").as("sel_tokens"))
      },
      Some(s"""
        WITH $unimaxSqlCtes,
        dtok AS (
          SELECT doc_id, lang,
            CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')) AS BIGINT) AS tl
          FROM documents),
        sel AS (
          SELECT d.lang, p.tokens, p.alloc, d.tl,
            CASE WHEN ${Selection.h60Sql("CAST(d.doc_id AS VARCHAR) || '|mix'")} <
              CAST(floor(p.alloc / CAST(p.tokens AS DOUBLE) * 1152921504606846976.0) AS BIGINT)
            THEN 1 ELSE 0 END AS s
          FROM dtok d JOIN plan p ON p.lang = d.lang)
        SELECT lang, tokens, alloc,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(s) AS BIGINT) AS n_sel,
          CAST(sum(s * tl) AS BIGINT) AS sel_tokens
        FROM sel GROUP BY lang, tokens, alloc""")),

    // ---------------------------------------------------------------- q150
    // Context-length AUDIT — the table read before choosing a training
    // sequence length: for each candidate context L (512/1k/2k/8k),
    // what the two standard document policies cost on THIS corpus.
    // Truncate-to-L loses the tail of every over-length doc
    // (trunc_lost_tokens, with n_over docs affected); split-into-
    // chunks keeps everything but pads the last chunk of every doc
    // (split_seqs sequences, split_pad_tokens of padding — utilization
    // = tokens/(split_seqs·L)); concat-packing (q54's policy) wastes
    // nothing but crosses document boundaries — its sequence count
    // ⌈Σtokens/L⌉ is the floor the other policies chase. Short-doc
    // corpora bleed utilization at large L under split (a 60-token
    // doc pads 8132 of 8192); long-doc corpora bleed truncation at
    // small L. All integer arithmetic — ⌈n/L⌉ = (n + L − 1) div L.
    //
    // Scale shape: ONE metadata-light scan (token count only, text
    // never shuffles) exploded ×|L| candidates (4 rows per doc, two
    // longs each), map-side-combined to |L| rows.
    Q(
      "q150_context_audit",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .select(size(expr("filter(split(text, ' '), x -> x <> '')"))
            .cast("long").as("n"))
          .select($"n", explode(expr(
            "array(CAST(512 AS BIGINT), CAST(1024 AS BIGINT), " +
              "CAST(2048 AS BIGINT), CAST(8192 AS BIGINT))")).as("l"))
          .groupBy($"l")
          .agg(
            count(lit(1)).cast("long").as("n_docs"),
            sum($"n").cast("long").as("n_tokens"),
            sum(($"n" > $"l").cast("long")).cast("long").as("n_over"),
            sum(greatest($"n" - $"l", lit(0L))).cast("long").as("trunc_lost_tokens"),
            sum(expr("(n + l - 1) div l")).cast("long").as("split_seqs"))
          .select($"l", $"n_docs", $"n_tokens", $"n_over",
            $"trunc_lost_tokens", $"split_seqs",
            ($"split_seqs" * $"l" - $"n_tokens").as("split_pad_tokens"),
            expr("(n_tokens + l - 1) div l").as("concat_seqs"))
      },
      Some("""
        WITH nt AS (
          SELECT CAST(len(list_filter(str_split(text, ' '), x -> x <> '')) AS BIGINT) AS n
          FROM documents),
        x AS (
          SELECT n, l
          FROM nt CROSS JOIN (
            SELECT CAST(unnest([512, 1024, 2048, 8192]) AS BIGINT) AS l)),
        ag AS (
          SELECT l,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(n) AS BIGINT) AS n_tokens,
            CAST(sum(CASE WHEN n > l THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
            CAST(sum(greatest(n - l, 0)) AS BIGINT) AS trunc_lost_tokens,
            CAST(sum((n + l - 1) // l) AS BIGINT) AS split_seqs
          FROM x GROUP BY l)
        SELECT l, n_docs, n_tokens, n_over, trunc_lost_tokens, split_seqs,
          split_seqs * l - n_tokens AS split_pad_tokens,
          (n_tokens + l - 1) // l AS concat_seqs
        FROM ag""")),

    // ---------------------------------------------------------------- q164
    // WEIGHTED sample without replacement, deterministic and
    // integer-exact: each doc holds w integer tickets (w = 1 +
    // min(n_chars/100, 7) — the upsample-long-docs policy), ticket i
    // hashes to the seeded-md5 60-bit key the whole repo samples
    // with, the doc's key is its MIN ticket, and the sample is the
    // global bottom-100 keys. Ticket replication is the
    // integer-arithmetic form of weighted sampling: the globally
    // smallest ticket is a uniform pick over Σw atomic tickets, so
    // the first selection lands on a doc with probability exactly
    // w/Σw (Efraimidis–Spirtes keys U^(1/w) would need pow/ln —
    // transcendentals whose last-ulp behavior differs across
    // engines; graft.Sql's determinism rules ban them, and integer
    // tickets make the whole pipeline hash-matchable).
    //
    // Scale shape: the w ≤ 8 ticket hashes fold MAP-SIDE inside one
    // projection (array_min over a transform — no explode, no
    // ticket-level shuffle), so the corpus pass emits |docs| (id, w,
    // key) rows into a TakeOrderedAndProject top-k: per-partition
    // heaps, k rows to the driver. The rank window runs over the 100
    // selected rows, never the corpus.
    Q(
      "q164_weighted_sample",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val keyed = table(s, dir, "documents")
          .select($"doc_id",
            expr("CAST(1 + least(n_chars div 100, 7) AS BIGINT)").as("w"))
          .withColumn("min_key", expr(
            """array_min(transform(sequence(1, CAST(w AS INT)),
               i -> CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), '#',
                 CAST(i AS STRING))), 1, 15), 16, 10) AS BIGINT)))"""))
          .orderBy($"min_key").limit(100)
        keyed.withColumn("rank",
          row_number().over(Window.orderBy($"min_key")).cast("long"))
      },
      Some("""
        WITH w AS (
          SELECT doc_id,
            CAST(1 + least(n_chars // 100, 7) AS BIGINT) AS w
          FROM documents),
        k AS (
          SELECT doc_id, w,
            list_min(list_transform(generate_series(1, CAST(w AS INT)),
              i -> CAST(CAST(concat('0x', substr(md5(concat(
                CAST(doc_id AS VARCHAR), '#', CAST(i AS VARCHAR))),
                1, 15)) AS UBIGINT) AS BIGINT))) AS min_key
          FROM w),
        s AS (SELECT doc_id, w, min_key FROM k ORDER BY min_key LIMIT 100)
        SELECT doc_id, w, min_key,
          CAST(row_number() OVER (ORDER BY min_key) AS BIGINT) AS rank
        FROM s""")),

    // ---------------------------------------------------------------- q179
    // EPOCH MANIFEST — q90's temperature plan MATERIALIZED as exact
    // per-doc integer copy counts realizing each source's quota
    // (w_s ∝ √n_s, quota = floor(w/z·N + 0.5) — q90's formula
    // verbatim, so plan and apply cannot disagree). Distinct from
    // q142's draw-based apply BY CONTRACT: q142 THINS (a Bernoulli
    // content-addressed keep/drop — copy count ≤ 1, realized mass
    // approximates the allocation), while an epoch manifest must hit
    // the quota EXACTLY and UPSAMPLE tails (n_copies ≥ 2) — the
    // repetition-factor table a trainer's data loader consumes.
    // Allocation within a source is deterministic hash order (the
    // content-addressed discipline every TrainPrep op uses): doc at
    // hash-rank r gets ⌊quota/n⌋ copies plus one extra iff
    // r ≤ quota mod n — Σ copies ≡ quota EXACTLY per source, no
    // sampling noise, replayable bit-for-bit. This is the epoch
    // manifest a trainer consumes: tails upsample (n_copies ≥ 2),
    // heads downsample (n_copies = 0 rows are real and kept — the
    // doc is OUT this epoch).
    //
    // Scale shape: quotas are a |sources|-row broadcast; the
    // per-source rank is ops.GlobalRank over (source, h, doc_id) —
    // NOT a `partition by source` window, whose partitions are
    // O(corpus/|sources|) rows each sorted in ONE task when |sources|
    // is a bounded handful (the q154/q167/q171 single-task-sort class).
    // Ranks within a source are contiguous in the global (source, h,
    // doc_id) order, so rk_in_source = grk − min_grk(source) + 1 —
    // a broadcast |sources|-row min-rank join plus pure integer
    // algebra; copy counts are integer arithmetic in the scan. Output
    // is manifest-sized by design — it IS the epoch's dataset.
    Q(
      "q179_epoch_manifest",
      (s, dir) => {
        import s.implicits._
        val counts = table(s, dir, "documents")
          .groupBy($"source").agg(count(lit(1)).cast("long").as("n_docs"))
        val raw = counts.withColumn("w_raw", sqrt($"n_docs".cast("double")))
        val tot = raw.agg(
          sort_array(collect_list(struct($"source", $"w_raw"))).as("xs"),
          sum($"n_docs").cast("long").as("total_docs"))
          .select(
            expr("aggregate(xs, CAST(0.0 AS DOUBLE), (a, e) -> a + e.w_raw)").as("z"),
            $"total_docs")
        val quota = raw.crossJoin(broadcast(tot))
          .select($"source", $"n_docs",
            floor(($"w_raw" / $"z") * $"total_docs".cast("double") + lit(0.5))
              .cast("long").as("quota"))
        // global rank in (source, h, doc_id) order: every range
        // partition ranks independently (GlobalRank localCheckpoints,
        // so the min-rank agg and the final pass read the same blocks)
        val ranked = graft.ops.GlobalRank.withRank(
          table(s, dir, "documents")
            .select($"doc_id", $"source",
              expr("CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), '|mix')), 1, 15), 16, 10) AS BIGINT)")
                .as("h")),
          Seq($"source".asc, $"h".asc, $"doc_id".asc), "grk",
          s.sparkContext.defaultParallelism)
        val minRk = ranked.groupBy($"source").agg(min($"grk").as("min_grk"))
        ranked
          .join(broadcast(minRk), "source")
          .withColumn("rk", ($"grk" - $"min_grk" + lit(1L)).cast("long"))
          .join(broadcast(quota), "source")
          .select($"doc_id", $"source", $"rk",
            (expr("quota div n_docs") +
              when($"rk" <= $"quota" % $"n_docs", 1L).otherwise(0L))
              .cast("long").as("n_copies"))
      },
      Some("""
        WITH c AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source),
        r AS (SELECT source, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS w_raw FROM c),
        t AS (
          SELECT sum(w_raw ORDER BY source) AS z,
            CAST(sum(n_docs) AS BIGINT) AS total_docs
          FROM r),
        q AS (
          SELECT source, n_docs,
            CAST(floor(w_raw / z * CAST(total_docs AS DOUBLE) + 0.5) AS BIGINT) AS quota
          FROM r CROSS JOIN t),
        d AS (
          SELECT doc_id, source,
            CAST(CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '|mix')), 1, 15)) AS UBIGINT) AS BIGINT) AS h
          FROM documents),
        rk AS (
          SELECT doc_id, source, h,
            CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS rk
          FROM d)
        SELECT rk.doc_id, rk.source, rk.rk,
          CAST(q.quota // q.n_docs +
            CASE WHEN rk.rk <= q.quota % q.n_docs THEN 1 ELSE 0 END AS BIGINT) AS n_copies
        FROM rk JOIN q USING (source)""")),

    // --------------------------------------------------------------- q237
    // CURRICULUM ORDERING (Bengio et al. 2009, applied to pretraining
    // data schedules) — order the corpus easy→hard and cut it into
    // token-budgeted phases: difficulty is an exact integer proxy
    // (average word length in permille — n_chars·1000 // tokens, the
    // classic readability core, monotone with lexical complexity), the
    // global easy→hard running token sum comes from
    // ops.GlobalRank.withGroupPrefixSum under a constant group key
    // (the q54 machinery — a global ORDER BY window would sort the
    // whole corpus in ONE task at 100 TB; the grouped prefix sum
    // range-partitions on (g, difficulty, doc_id), prefix-sums
    // per-partition subtotals on the driver, and streams one narrow
    // pass), and phases cut at exact integer fractions of the total
    // token mass: first 20% warmup, next 60% main, last 20% final —
    // `cum·5 ≤ total` and `cum·5 ≤ total·4`, no floating point
    // anywhere.
    //
    // Scale shape: one scan projection (token count + difficulty are
    // in-row), one range-partitioned prefix-sum pass, one broadcast
    // total. The manifest a training loader consumes directly.
    Q(
      "q237_curriculum_order",
      (s, dir) => {
        import s.implicits._
        val scored = table(s, dir, "documents")
          .select($"doc_id", $"n_chars".cast("long").as("n_chars"),
            size(filter(split($"text", "[ \\t\\n\\x0B\\f\\r]+"), x => x =!= ""))
              .cast("long").as("n_tokens"))
          .withColumn("difficulty_q",
            expr("CAST(n_chars * 1000 div greatest(n_tokens, 1) AS BIGINT)"))
          .withColumn("g", lit(0))
        val cum = graft.ops.GlobalRank.withGroupPrefixSum(
          scored, Seq("g"), Seq($"difficulty_q".asc, $"doc_id".asc),
          "n_tokens", "cum_tokens", s.sparkContext.defaultParallelism)
        // total from the prefix-sum frame (checkpointed inside
        // GlobalRank) — summing from `scored` would re-run the whole
        // tokenization scan just to produce one number
        val tot = cum.agg(sum($"n_tokens").cast("long").as("total"))
        cum.crossJoin(broadcast(tot))
          .select($"doc_id", $"n_tokens", $"difficulty_q",
            $"cum_tokens".cast("long").as("cum_tokens"),
            expr("CASE WHEN cum_tokens * 5 <= total THEN 'warmup'" +
              " WHEN cum_tokens * 5 <= total * 4 THEN 'main'" +
              " ELSE 'final' END").as("phase"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
            CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), x -> x <> '')) AS BIGINT) AS n_tokens
          FROM documents),
        d AS (
          SELECT doc_id, n_tokens,
            CAST(n_chars * 1000 // greatest(n_tokens, 1) AS BIGINT) AS difficulty_q
          FROM t),
        c AS (
          SELECT *,
            CAST(sum(n_tokens) OVER (ORDER BY difficulty_q, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
          FROM d),
        tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM d)
        SELECT doc_id, n_tokens, difficulty_q, cum_tokens,
          CASE WHEN cum_tokens * 5 <= total THEN 'warmup'
               WHEN cum_tokens * 5 <= total * 4 THEN 'main'
               ELSE 'final' END AS phase
        FROM c CROSS JOIN tot"""))
  )

  /** Bucketing engine behind q119. Input: (doc_id, lang, text); output
    * (doc_id, lang, score_ppm, bucket) for every document with ≥ 1
    * [a-z]+ token. Sampled per-language tercile cutoff VALUES
    * broadcast into a scan-side CASE; ties land by value (CCNet
    * semantics), unsampled languages get 'middle'.
    */
  private[graft] def pplBuckets(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val sc = docs
      .select($"doc_id", $"lang",
        expr("filter(split(lower(text), '[^a-z]+'), x -> x <> '')").as("toks"))
      .filter(size($"toks") >= 1)
      .select($"doc_id", $"lang",
        expr("(aggregate(toks, 0L, (a, x) -> a + length(x)) * 1000000L) div size(toks)")
          .as("score_ppm"))
    val cut = sc
      .filter(expr(
        "CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), '|pplcut')), 1, 8), 16, 10) AS BIGINT) % 100 < 20"))
      .groupBy($"lang")
      .agg(
        sort_array(collect_list($"score_ppm")).as("l"),
        count(lit(1)).cast("long").as("m"))
      .select($"lang",
        expr("element_at(l, CAST((m + 2) div 3 AS INT))").as("cut1"),
        expr("element_at(l, CAST((2 * m + 2) div 3 AS INT))").as("cut2"))
    sc.join(broadcast(cut), Seq("lang"), "left")
      .select($"doc_id", $"lang", $"score_ppm",
        when($"cut1".isNull, "middle")
          .when($"score_ppm" <= $"cut1", "head")
          .when($"score_ppm" <= $"cut2", "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Shard-assignment engine behind q121. Input: a frame with a
    * `doc_id` column; output (doc_id, h, rk, shard) where rk is the
    * 1-based global rank in (h, doc_id) order and shard = (rk−1) mod
    * nShards — sizes equal ±1 by construction, order reproducible
    * anywhere md5 is.
    */
  private[graft] def shardAssign(
      docs: org.apache.spark.sql.DataFrame,
      nShards: Int,
      numPartitions: Int): org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val h = docs.select($"doc_id",
      expr("CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), '|shard')), 1, 15), 16, 10) AS BIGINT)")
        .as("h"))
    graft.ops.GlobalRank
      .withRank(h, Seq($"h".asc, $"doc_id".asc), "rk", numPartitions)
      .withColumn("shard", expr(s"(rk - 1) % $nShards"))
  }

  /** q139's waterfill engine, shared with the q142 apply step: per
    * language (lang, tokens, capped, alloc) under budget B = ⌊total/5⌋
    * — pure BIGINT window algebra (ranks, prefix sums, feasibility)
    * until the single division that produces the water level. See the
    * q139 comment for the allocation semantics.
    */
  private[graft] def unimaxPlan(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val counts = docs
      .select($"lang", explode(expr(
        "filter(split(lower(text), '[^a-z]+'), x -> x <> '')")).as("tok"))
      .groupBy($"lang").agg(count(lit(1)).cast("long").as("c"))
    val w = Window.orderBy($"c".asc, $"lang".asc)
    val ranked = counts
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("pre", sum($"c").over(w))
      .crossJoin(broadcast(counts.agg(
        count(lit(1)).cast("long").as("n"),
        expr("sum(c) div 5").cast("long").as("b"))))
    val kstar = ranked
      .withColumn("feas",
        when($"pre" - $"c" + ($"n" - $"k" + 1L) * $"c" >= $"b", $"k"))
      .withColumn("kstar", min($"feas").over(Window.partitionBy(lit(1))))
      .withColumn("pre_kstar",
        max(when($"k" === $"kstar", $"pre" - $"c")).over(Window.partitionBy(lit(1))))
    kstar.select($"lang", $"c".as("tokens"),
      when($"kstar".isNull || $"k" < $"kstar", lit(1L)).otherwise(lit(0L)).as("capped"),
      when($"kstar".isNull || $"k" < $"kstar", $"c".cast("double"))
        .otherwise(($"b" - $"pre_kstar").cast("double") /
          ($"n" - $"kstar" + 1L).cast("double")).as("alloc"))
  }

  /** [[unimaxPlan]]'s DuckDB twin, ending in a `plan` CTE with
    * (lang, tokens, capped, alloc) — shared by the q139 and q142
    * oracles. `lazy` deliberately: referenced from `all`'s
    * construction, and a plain val would still be null there (object
    * body init order — the q133 lesson).
    */
  private[queries] lazy val unimaxSqlCtes: String = """toks AS (
          SELECT lang,
            unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')) AS tok
          FROM documents),
        counts AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY lang),
        tot AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(c) // 5 AS BIGINT) AS b
          FROM counts),
        ranked AS (
          SELECT lang, c,
            CAST(row_number() OVER (ORDER BY c, lang) AS BIGINT) AS k,
            CAST(sum(c) OVER (ORDER BY c, lang) AS BIGINT) AS pre,
            tot.n, tot.b
          FROM counts CROSS JOIN tot),
        feas AS (
          SELECT *, CASE WHEN pre - c + (n - k + 1) * c >= b THEN k END AS f
          FROM ranked),
        kk1 AS (SELECT *, min(f) OVER () AS kstar FROM feas),
        kk AS (
          SELECT *, max(CASE WHEN k = kstar THEN pre - c END) OVER () AS pre_kstar
          FROM kk1),
        plan AS (
          SELECT lang, c AS tokens,
            CAST(CASE WHEN kstar IS NULL OR k < kstar THEN 1 ELSE 0 END AS BIGINT) AS capped,
            CASE WHEN kstar IS NULL OR k < kstar THEN CAST(c AS DOUBLE)
              ELSE CAST(b - pre_kstar AS DOUBLE) / CAST(n - kstar + 1 AS DOUBLE)
            END AS alloc
          FROM kk)"""

  /** Morton interleave of two `bits`-bit keys as portable integer
    * arithmetic: x's bit i lands at position 2i, y's at 2i+1. `div` is
    * the engine's integer-division operator (`div` Spark, `//`
    * DuckDB); everything else is shared text. INPUT CONTRACT: both
    * keys must already lie in [0, 2^bits) — the bit extraction reads
    * only bits 0..bits−1, so a wider key would silently alias distant
    * values into one bucket and void the per-bucket min/max bound
    * (q103 enforces the contract with an explicit `% 2^bits`; size
    * `bits` to the key domain — ≤31 fits the BIGINT z-value).
    */
  private[graft] def zInterleave(
      xCol: String, yCol: String, div: String, bits: Int = 16): String =
    zInterleaveN(Seq(xCol, yCol), div, bits)

  /** N-column Morton interleave: column j's bit i lands at z position
    * n·i + j (n = column count) — the 2-column form above is the n = 2
    * instance, emitted as IDENTICAL expression text (q103's oracle SQL
    * depends on that). Same input contract per column: values in
    * [0, 2^bits); n·bits must fit the 63 positive BIGINT bits.
    */
  private[graft] def zInterleaveN(
      cols: Seq[String], div: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    require(cols.size >= 2, s"z-order needs >= 2 columns, got ${cols.size}")
    require(cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits overflow the BIGINT z-value")
    val n = cols.size
    cols.zipWithIndex.flatMap { case (c, j) =>
      (0 until bits).map(i => s"((($c) $div ${1L << i}) % 2) * ${1L << (n * i + j)}")
    }.mkString(" + ")
  }
}
