package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._

/** Batch-vs-corpus exact-membership gate behind a bloom prefilter —
  * the constant-state form of "which of these incoming documents
  * already exist in the corpus" (exact-dup decontamination at drop
  * time, q67/q20's cross-set question at 100 TB).
  *
  * Why a sketch: with corpus fingerprints in the billions, the exact
  * fp set is too big to broadcast (~16 GB at 10⁹ md5s) and a plain
  * membership join shuffles the WHOLE batch against it. A bloom
  * filter of the same fps is fixed-size (~1.2 GB at 10⁹ keys / 1%
  * fpp), builds in one corpus scan with a tree-reduced fixed-size
  * buffer (`stat.bloomFilter`), ships to every executor once, and
  * discards non-members AT THE BATCH SCAN — so the exact-verify join
  * that follows shuffles only true hits plus the fpp tail. The sketch
  * is bytes at rest: build once, reuse across every subsequent drop
  * (the q74/q107 incremental posture, with O(1) state instead of a
  * fingerprint table — the trade: it can only answer "probably seen",
  * hence the verify join).
  *
  * Correctness is UNCHANGED by the prefilter: blooms have no false
  * negatives (every true member passes), and the exact join on the
  * full fp removes the false positives — so the output equals the
  * plain exact-membership join bit for bit at ANY fpp
  * (BloomGateSpec proves it at fpp = 0.5).
  *
  * The membership probe reuses Spark's OWN codegen'd
  * [[BloomFilterMightContain]] (the expression AQE's runtime filter
  * injects — RuntimeFilterSpec's machinery, here driven explicitly)
  * over a LITERAL serialized sketch, registered as
  * `might_contain_lit(sketchBytes, hash)`.
  */
object BloomGate {

  /** Register `might_contain_lit(sketch, hash)` for this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "might_contain_lit",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")

  /** One corpus scan → serialized bloom sketch over `fp` (any type;
    * hashed to the sketch's long domain via xxhash64). Fixed-size
    * executor state, tree-reduced; the bytes are persistable and
    * reusable across drops under a frozen fp definition.
    */
  def sketch(fps: DataFrame, expectedItems: Long, fpp: Double): Array[Byte] = {
    val hashed = fps.select(xxhash64(col("fp")).as("h"))
    val bloom = hashed.stat.bloomFilter("h", math.max(expectedItems, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** Scan-side prefilter: keep rows whose `fp` is PROBABLY in the
    * sketch (no false negatives; false positives at the sketch's fpp).
    */
  def prefilter(batch: DataFrame, sketchBytes: Array[Byte]): DataFrame = {
    val s = batch.sparkSession
    register(s)
    batch.filter(
      call_function("might_contain_lit", lit(sketchBytes), xxhash64(col("fp"))))
  }

  /** The full gate: batch (doc_id, fp) vs corpus (fp) → (doc_id, hit).
    * Builds the sketch, prefilters the batch at the scan, exact-verifies
    * the survivors with a semi join on the full fp (removing bloom
    * false positives), and left-joins the verdict back so every batch
    * row carries a 0/1 hit. Eager: the sketch build is an action
    * (q45/q83 precedent).
    *
    * `expectedItems` sizes the sketch; when absent it is counted from
    * the corpus — a SECOND corpus scan. At 100 TB pass the catalog/
    * metastore row estimate (any overestimate only widens the sketch;
    * an underestimate raises the realized fpp, never correctness —
    * the verify join owns correctness either way), keeping the build
    * at one scan.
    */
  def membership(corpus: DataFrame, batch: DataFrame, fpp: Double = 0.01,
      expectedItems: Option[Long] = None): DataFrame = {
    val bytes = sketch(corpus,
      math.max(expectedItems.getOrElse(corpus.count()), 1L), fpp)
    // verdicts key on (doc_id, fp), not doc_id alone: a batch carrying
    // two fps under one doc_id must get per-ROW verdicts (a doc_id-only
    // key would smear one row's hit onto the other and cross-multiply);
    // the post-join distinct() keeps the final left join 1:1 even for
    // exact-duplicate batch rows. No distinct() on the corpus build
    // side though — left_semi already ignores duplicates, and it was
    // a whole extra corpus-wide aggregation per drop (round-9 review)
    val hits = prefilter(batch, bytes)
      .join(corpus.select(col("fp")), Seq("fp"), "left_semi")
      .select(col("doc_id"), col("fp")).distinct()
      .withColumn("hit", lit(1L))
    batch.join(hits, Seq("doc_id", "fp"), "left")
      .select(col("doc_id"), coalesce(col("hit"), lit(0L)).as("hit"))
  }
}
