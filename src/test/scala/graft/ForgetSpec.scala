package graft

import graft.ops.{Forget, Layouts, Lsh}
import graft.queries.Llm
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ops.Forget (right-to-be-forgotten propagation): probe-time
  * exclusion must equal a state rebuilt without the forgotten docs;
  * compaction must PHYSICALLY remove their rows (raw reads, not
  * excluded ones), clear exactly the applied tombstones, and leave
  * probes unchanged; and the streaming curation path must stop
  * dropping near-dups of a forgotten document immediately.
  */
class ForgetSpec extends SparkSuite {

  /** Corpus with two planted cross-set near-dup anchors (c1, c2) and
    * batch twins (b1, b2) sharing their 200-char prefixes; filler
    * docs are random (no accidental pairs at jac ≥ 0.35).
    */
  private def fixture: (Seq[(Long, String)], Seq[(Long, String)]) = {
    val r = new scala.util.Random(5)
    def seg(n: Int): String =
      (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    val a1 = seg(220); val a2 = seg(220)
    val corpus = Seq((10L, a1), (20L, a2)) ++
      (0 until 40).map(i => (100L + i, seg(220)))
    val batch = Seq((1010L, a1 + seg(30)), (1020L, a2 + seg(30))) ++
      (0 until 10).map(i => (2000L + i, seg(220)))
    (corpus, batch)
  }

  private def buildState(spark: org.apache.spark.sql.SparkSession,
      corpus: DataFrame, state: String): Unit = {
    val csets = Llm.shingleSets(corpus)
    Llm.bandsOf(csets)
      .withColumn("bkey", concat_ws("|", col("band"), col("bsig")))
      .select(col("bkey"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$state/bands/base")
    csets.write.mode("overwrite").parquet(s"$state/sets/base")
  }

  private def probe(spark: org.apache.spark.sql.SparkSession,
      state: String, batch: DataFrame,
      excluded: Boolean): Set[(Long, Long)] = {
    import spark.implicits._
    def maybeEx(df: DataFrame) =
      if (excluded) Forget.exclude(df, spark, state) else df
    val bsets = Llm.shingleSets(batch).localCheckpoint()
    val seenBands = maybeEx(Layouts.readChildren(spark, s"$state/bands",
      "bkey STRING, doc_id BIGINT"))
    val cand = Lsh.incrementalCandidatesFrom(
      spark, seenBands, Llm.bandsOf(bsets), Llm.lshMaxBucket)
    val seenSets = maybeEx(Layouts.readChildren(spark, s"$state/sets",
      "doc_id BIGINT, gs ARRAY<STRING>"))
    cand
      .join(seenSets.select($"doc_id".as("corpus_doc"), $"gs".as("gs1")),
        "corpus_doc")
      .join(bsets.select($"doc_id".as("batch_doc"), $"gs".as("gs2")),
        "batch_doc")
      .withColumn("inter", size(array_intersect($"gs1", $"gs2")))
      .withColumn("jac", $"inter".cast("double")
        / (size($"gs1") + size($"gs2") - $"inter"))
      .filter($"jac" >= 0.35)
      .select($"batch_doc", $"corpus_doc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("exclude ≡ rebuild-without; compact removes physically and idempotently") {
    import spark.implicits._
    val (c, b) = fixture
    val corpus = c.toDF("doc_id", "text")
    val batch = b.toDF("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("forget1").toString

    buildState(spark, corpus, state)
    // before any tombstone: both planted pairs candidate and verify
    assert(probe(spark, state, batch, excluded = true) ==
      Set((1010L, 10L), (1020L, 20L)))
    // compact with no tombstones is a no-op
    assert(Forget.compact(spark, state, Seq("bands", "sets")) == 0L)

    // forget anchor 10 (twice — replayed request converges)
    Forget.tombstone(spark, state, Seq(10L).toDF("doc_id"), 0L)
    Forget.tombstone(spark, state, Seq(10L).toDF("doc_id"), 0L)
    val afterForget = probe(spark, state, batch, excluded = true)
    assert(afterForget == Set((1020L, 20L)),
      s"excluded probe still matches the forgotten doc: $afterForget")

    // rebuild-without equality
    val rebuilt = java.nio.file.Files.createTempDirectory("forget2").toString
    buildState(spark, corpus.filter($"doc_id" =!= 10L), rebuilt)
    assert(probe(spark, rebuilt, batch, excluded = true) == afterForget)

    // physical removal: raw (UNexcluded) reads must lose doc 10,
    // tombstone children must clear, probes must not change
    assert(Forget.compact(spark, state, Seq("bands", "sets")) == 1L)
    val rawBands = Layouts.readChildren(spark, s"$state/bands",
      "bkey STRING, doc_id BIGINT")
    val rawSets = Layouts.readChildren(spark, s"$state/sets",
      "doc_id BIGINT, gs ARRAY<STRING>")
    assert(rawBands.filter($"doc_id" === 10L).count() == 0)
    assert(rawSets.filter($"doc_id" === 10L).count() == 0)
    assert(rawBands.count() > 0 && rawSets.count() > 0)
    assert(Layouts.liveChildren(spark, s"$state/forget").isEmpty,
      "applied tombstone children were not cleared")
    assert(probe(spark, state, batch, excluded = false) == afterForget)
    // second compact: nothing left to apply
    assert(Forget.compact(spark, state, Seq("bands", "sets")) == 0L)
  }

  test("bounded compact keeps tombstones alive for skipped children") {
    import spark.implicits._
    val (c, b) = fixture
    val corpus = c.toDF("doc_id", "text")
    val batch = b.toDF("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("forget3").toString
    // anchor 10's rows land in an UNCOMMITTED trigger child b5, the
    // rest in base — the review scenario: a bounded compact must not
    // clear tombstones whose rows it could not touch
    buildState(spark, corpus.filter($"doc_id" =!= 10L), state)
    val a10 = corpus.filter($"doc_id" === 10L)
    val s10 = graft.queries.Llm.shingleSets(a10)
    graft.queries.Llm.bandsOf(s10)
      .withColumn("bkey", concat_ws("|", col("band"), col("bsig")))
      .select(col("bkey"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$state/bands/b5")
    s10.write.mode("overwrite").parquet(s"$state/sets/b5")
    Forget.tombstone(spark, state, Seq(10L).toDF("doc_id"), 0L)

    assert(Forget.compact(spark, state, Seq("bands", "sets"),
      beforeBatch = Some(5L)) == 1L)
    // tombstones survived (b5 was skipped) and still hide doc 10
    assert(Layouts.liveChildren(spark, s"$state/forget").nonEmpty,
      "tombstones cleared despite a skipped child — forgotten doc would resurface")
    assert(probe(spark, state, batch, excluded = true) == Set((1020L, 20L)))
    // the quiescent cadence (no bound) finishes the job
    assert(Forget.compact(spark, state, Seq("bands", "sets")) == 1L)
    assert(Layouts.liveChildren(spark, s"$state/forget").isEmpty)
    assert(Layouts.readChildren(spark, s"$state/bands",
      "bkey STRING, doc_id BIGINT").filter($"doc_id" === 10L).count() == 0)
    assert(probe(spark, state, batch, excluded = false) == Set((1020L, 20L)))
  }

  test("empty deletion requests are reaped, not leaked") {
    import spark.implicits._
    val (c, _) = fixture
    val state = java.nio.file.Files.createTempDirectory("forget4").toString
    buildState(spark, c.toDF("doc_id", "text"), state)
    Forget.tombstone(spark, state,
      spark.emptyDataFrame.select(lit(0L).as("doc_id")).filter(lit(false)), 0L)
    assert(Layouts.liveChildren(spark, s"$state/forget").nonEmpty)
    assert(Forget.compact(spark, state, Seq("bands", "sets")) == 0L)
    assert(Layouts.liveChildren(spark, s"$state/forget").isEmpty,
      "empty tombstone children leaked")
  }

  test("exact-dup fps state: forget ≡ rebuild-without, shared fp stays live") {
    import spark.implicits._
    // two living docs A(10) and B(20) share one normalized text (the
    // shared-fp case); C(30) is unique. All pass the quality gate
    // (≥ 30 chars, ≥ 1 stopword).
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val unique = "a completely different document about the price of tea in china"
    def docsOf(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, "en", "s", t) }
        .toDF("doc_id", "lang", "source", "text")
    val corpus = docsOf(Seq((10L, shared), (20L, shared + " "), (30L, unique)))

    // probe: does a batch doc with `text` survive the exact-dup pass?
    def survives(stateDir: String, outDir: String, id: Long, text: String,
        batchId: Long): Boolean = {
      assert(graft.streaming.StreamCuration.processBatch(
        spark, docsOf(Seq((id, text))), stateDir, outDir, batchId))
      spark.read.parquet(s"$outDir/b$batchId")
        .filter($"doc_id" === id).count() == 1
    }

    // --- leg 1 (shared fp + duplicated request): forgetting A — via
    // TWO distinct request ids, the replay/duplicate case that
    // double-decrements a refcount — must leave B's provenance row
    // suppressing identical text, exactly like a rebuild without A
    val stateA = java.nio.file.Files.createTempDirectory("fpforgetA").toString
    val outA = java.nio.file.Files.createTempDirectory("fpoutA").toString + "/d"
    assert(graft.streaming.StreamCuration.processBatch(
      spark, corpus, stateA, outA, batchId = 0L))
    Forget.tombstone(spark, stateA, Seq(10L).toDF("doc_id"), 0L)
    Forget.tombstone(spark, stateA, Seq(10L).toDF("doc_id"), 1L)
    assert(!survives(stateA, outA, 1000L, shared, batchId = 1L),
      "shared fp: living doc 20's duplicate was re-admitted after forgetting 10")

    // --- leg 2 (no living contributor): on a fresh state, forgetting
    // BOTH holders makes identical text fresh again — and once a new
    // holder survives, it suppresses the next one (≡ rebuild-without)
    val stateB = java.nio.file.Files.createTempDirectory("fpforgetB").toString
    val outB = java.nio.file.Files.createTempDirectory("fpoutB").toString + "/d"
    assert(graft.streaming.StreamCuration.processBatch(
      spark, corpus, stateB, outB, batchId = 0L))
    Forget.tombstone(spark, stateB, Seq(10L, 20L).toDF("doc_id"), 0L)
    assert(survives(stateB, outB, 1001L, shared, batchId = 1L),
      "forgotten fp still suppressing with no living contributor")
    assert(!survives(stateB, outB, 2000L, shared, batchId = 2L),
      "batch-1 survivor 1001 must suppress the next identical doc (rebuild parity)")
    assert(!survives(stateB, outB, 1002L, unique, batchId = 3L),
      "unique living doc 30's duplicate must stay suppressed throughout")

    // rebuild-without equality: a state built over corpus − {10, 20}
    // makes the identical calls
    val rState = java.nio.file.Files.createTempDirectory("fpr").toString
    val rOut = java.nio.file.Files.createTempDirectory("fpro").toString + "/d"
    assert(graft.streaming.StreamCuration.processBatch(
      spark, docsOf(Seq((30L, unique))), rState, rOut, 0L))
    assert(survives(rState, rOut, 1001L, shared, batchId = 1L))
    assert(!survives(rState, rOut, 2000L, shared, batchId = 2L))
    assert(!survives(rState, rOut, 1002L, unique, batchId = 3L))

    // physical removal: compact over all three roots drops the
    // forgotten rows from the raw fps layout; decisions unchanged
    assert(Forget.compact(spark, stateB, Seq("bands", "sets", "fps")) == 2L)
    val rawFps = Layouts.readChildren(spark, s"$stateB/fps",
      "fp STRING, doc_id BIGINT")
    assert(rawFps.filter($"doc_id".isin(10L, 20L)).count() == 0,
      "compact left forgotten fps rows at rest")
    assert(rawFps.filter($"doc_id" === 1001L).count() == 1)
    assert(!survives(stateB, outB, 3000L, shared, batchId = 5L))
  }

  test("streaming curation stops dropping near-dups of a forgotten doc") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"lang", $"source", $"text")
    // a long survivor of batch 0 — its near-dup (same 200-char
    // prefix, new tail, so a DIFFERENT exact fp) must drop in the
    // control run and survive once the anchor is forgotten
    val anchor = docs.filter(length($"text") >= 200)
      .orderBy($"doc_id").limit(1).collect()(0)
    val dupRow = Seq((999999L, anchor.getString(1), anchor.getString(2),
      anchor.getString(3) + " graft forget spec suffix"))
      .toDF("doc_id", "lang", "source", "text")

    def run(forget: Boolean): Boolean = {
      val stateDir = java.nio.file.Files.createTempDirectory("fstate").toString
      val outDir = java.nio.file.Files.createTempDirectory("fout").toString + "/d"
      assert(graft.streaming.StreamCuration.processBatch(
        spark, docs, stateDir, outDir, batchId = 0L))
      if (forget)
        Forget.tombstone(spark, stateDir,
          Seq(anchor.getLong(0)).toDF("doc_id"), 0L)
      graft.streaming.StreamCuration.processBatch(
        spark, dupRow, stateDir, outDir, batchId = 1L)
      spark.read.parquet(s"$outDir/b1")
        .filter($"doc_id" === 999999L).count() == 1
    }
    assert(!run(forget = false),
      "control: the near-dup was NOT dropped — anchor choice broken")
    assert(run(forget = true),
      "near-dup of a forgotten doc was still dropped at probe time")
  }
}
