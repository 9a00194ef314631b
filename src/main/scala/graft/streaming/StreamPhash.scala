package graft.streaming

import graft.ops.{Lsh, Multimodal}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING image near-dup dedup — the FOURTEENTH exactly-once
  * maintainer, completing the image family's batch (q195) /
  * incremental (q196) / streaming symmetry exactly as
  * [[StreamCuration]] does for text: media micro-batches are
  * perceptually hashed ([[Multimodal.imagePhash]] — real 60-bit dHash
  * for decodable rasters, md5 stub otherwise), first-wins deduped
  * against in-batch AND accumulated-corpus candidates, and the
  * survivors land in per-batch output children while the batch's
  * signatures join the state.
  *
  * Per batch:
  *
  *  1. phash every blob ONCE (the localCheckpoint'ed frame feeds
  *     banding, both verify joins, and the state commit);
  *  2. candidates = in-batch capped band pairs
  *     ([[Lsh.expandPairsCapped]] on the 6 × 10-bit hamming bands —
  *     q195's geometry, so the pigeonhole covers every bit) ∪
  *     batch-vs-state probes ([[Lsh.incrementalCandidatesFrom]] over
  *     the persisted band state — combined-population cap, two-tier
  *     batch handling); every candidate verifies by EXACT popcount
  *     (hamming ≤ 5) against the phash store before any drop;
  *  3. in-batch pairs drop the higher doc_id, cross pairs drop the
  *     batch side — first-wins, the [[StreamCuration]] operating
  *     point (streams cannot retract; the q195 batch run is the
  *     replayable backfill that restores min-id canonically).
  *
  * State: `bands/` (bkey, doc_id) and `ph/` (doc_id, phash, decoded)
  * child-dir roots — signatures only, 9 rows/blob, media bytes never
  * enter the state. Both roots are doc_id-keyed, so
  * [[graft.ops.Forget]] applies verbatim: tombstoned docs stop
  * matching at the next trigger ([[graft.ops.Forget.exclude]] on both
  * state reads) and compact removes them physically.
  *
  * Exactly-once: the [[StreamIndex]] protocol verbatim — per-batch
  * idempotent child overwrites, reads exclude children at/above the
  * current id, marker advances last, replays at/below the marker
  * skip. [[compactState]] folds bounded by the marker.
  */
object StreamPhash {

  private val outDdl = "doc_id BIGINT, phash BIGINT, decoded BOOLEAN"

  /** Start the stream: micro-batches of `source` (doc_id, media,
    * mime_hint) flow through [[processBatch]].
    */
  def start(
      source: DataFrame,
      stateDir: String,
      outDir: String,
      maxBucket: Int = 256): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", s"$stateDir/ckpt")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        processBatch(batch.sparkSession, batch, stateDir, outDir, id, maxBucket): Unit
      }
      .start()

  /** The kept (first-wins) blobs across all committed batches. */
  def kept(spark: SparkSession, outDir: String): DataFrame =
    graft.ops.Layouts.readChildren(spark, outDir, outDdl)

  /** One micro-batch through the dedup — directly drivable (the
    * spec's ordered-drop harness). Returns false on replay skip or
    * empty batch.
    */
  private[graft] def processBatch(
      spark: SparkSession,
      batchMedia: DataFrame,
      stateDir: String,
      outDir: String,
      batchId: Long,
      maxBucket: Int = 256): Boolean = {
    import spark.implicits._
    val guard = s"$stateDir/state"
    if (batchId <= StreamIndex.committedBatch(spark, guard)) return false
    if (batchMedia.isEmpty) {
      StreamIndex.writeCommitted(spark, guard, batchId)
      return false
    }
    val ph = Multimodal.imagePhash(batchMedia).localCheckpoint()
    val bands = ph
      .select($"doc_id", $"phash", explode(expr("sequence(0, 5)")).as("band"))
      .withColumn("bsig", expr("shiftright(phash, band * 10) & 1023"))
      .withColumn("bkey", concat_ws("|", $"band", $"bsig"))
      .localCheckpoint()

    // forget tombstones honored at probe time on BOTH state roots
    val seenBands = graft.ops.Forget.exclude(
      readState(spark, s"$stateDir/bands", "bkey STRING, doc_id BIGINT", batchId),
      spark, stateDir)
    val seenPh = graft.ops.Forget.exclude(
      readState(spark, s"$stateDir/ph", outDdl, batchId), spark, stateDir)

    val inBatch = Lsh.expandPairsCapped(bands, Seq("band", "bsig"), "doc_id", maxBucket)
      .select($"d1", $"d2")
    val cross = Lsh.incrementalCandidatesFrom(spark, seenBands, bands, maxBucket)
      .select($"corpus_doc".as("d1"), $"batch_doc".as("d2"))
    // exact verify: popcount against corpus ∪ batch phashes; in-batch
    // pairs drop d2 (higher id), cross pairs drop the batch side —
    // both are the pair's d2, so one drop rule covers both streams
    val phAll = seenPh.select($"doc_id", $"phash").unionByName(
      ph.select($"doc_id", $"phash"))
    val dropSet = inBatch.union(cross).distinct()
      .join(phAll.select($"doc_id".as("d1"), $"phash".as("p1")), "d1")
      .join(ph.select($"doc_id".as("d2"), $"phash".as("p2")), "d2")
      .filter(expr("bit_count(p1 ^ p2) <= 5"))
      .select($"d2".as("doc_id")).distinct()

    ph.join(dropSet, Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$outDir/b$batchId")

    // state commits AFTER the decisions — EVERY batch blob ingests
    // (a later dup of a dropped dup must still match through it)
    bands.select($"bkey", $"doc_id")
      .write.mode("overwrite").parquet(s"$stateDir/bands/b$batchId")
    ph.write.mode("overwrite").parquet(s"$stateDir/ph/b$batchId")
    StreamIndex.writeCommitted(spark, guard, batchId)
    Seq(ph, bands).foreach(graft.ops.Checkpoints.release)
    true
  }

  /** Fold the per-batch state children, bounded by the commit marker
    * (a crashed attempt's own child must stay unfolded — the
    * [[StreamCuration.compactState]] rule).
    */
  def compactState(spark: SparkSession, stateDir: String): Unit = {
    val bound = StreamIndex.committedBatch(spark, s"$stateDir/state") + 1
    Seq("bands", "ph").foreach { d =>
      graft.ops.Layouts.foldChildren(spark, s"$stateDir/$d",
        beforeBatch = Some(bound))
    }
  }

  private def readState(
      spark: SparkSession, path: String, ddl: String, batchId: Long): DataFrame =
    graft.ops.Layouts.readChildren(spark, path, ddl, beforeBatch = Some(batchId))
}
