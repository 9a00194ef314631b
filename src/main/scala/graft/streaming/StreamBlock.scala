package graft.streaming

import graft.ops.{BlockState, Checkpoints}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING boilerplate removal — [[BlockState.probe]] driven by a
  * stream of document micro-batches: the passage-index family's
  * streaming twin, completing the symmetry that every
  * batch-incremental operator in the repo has a stream form
  * ([[StreamCuration]] near-dups, [[StreamWinnow]] substrings,
  * [[StreamIndex]] ANN layouts, [[StreamLexIndex]] postings,
  * [[StreamSemDedup]] cells, the sketch maintainers). Each trigger
  * cleans its documents against corpus ∪ batch under the state's
  * frozen block geometry and folds the batch's block counts in, so a
  * passage that becomes boilerplate ACROSS drops starts being removed
  * the moment its count crosses the threshold — ordered drops ≡ the
  * same sequence of batch-mode `probe(commit = true)` calls row for
  * row (StreamBlockSpec), which BlockStateSpec in turn proves ≡ the
  * full q110 recompute restricted to each batch.
  *
  * Exactly-once, the [[StreamWinnow]] protocol verbatim: cleaned
  * output overwrites `outDir/batch_<id>`, the state commit overwrites
  * the per-batch child `blocks/b<id>` ([[BlockState.probe]]'s batchId
  * mode — which also excludes children at/above the id from the
  * probed state, so a crashed attempt's own commit never counts the
  * batch against itself), and a batch id at or below the commit
  * marker (the [[StreamIndex]] sidecar, beside the blocks dir) skips
  * entirely.
  *
  * Maintenance: [[compactStream]] folds the per-batch children,
  * bounded by the commit marker (`Some(committed + 1)`
  * unconditionally — the [[graft.ops.WinnowState.compactStream]]
  * first-trigger-crash rule).
  */
object StreamBlock {

  /** Start cleaning a streaming (doc_id, text) document frame against
    * the [[BlockState.save]]d state at `stateDir`; per-batch cleaned
    * docs land under `outDir/batch_<id>` with a `batch_id` column.
    */
  def start(
      source: DataFrame,
      stateDir: String,
      outDir: String,
      checkpoint: String,
      minDocs: Int = 3,
      blockTokens: Int = 10): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        cleanBatch(batch.toDF(), stateDir, outDir, id, minDocs, blockTokens): Unit
      }
      .start()

  /** One micro-batch: clean + commit unless `batchId` is already
    * committed. Returns whether the batch was processed (false =
    * replay skipped or empty batch).
    */
  private[graft] def cleanBatch(
      batch: DataFrame,
      stateDir: String,
      outDir: String,
      batchId: Long,
      minDocs: Int = 3,
      blockTokens: Int = 10): Boolean = {
    val spark = batch.sparkSession
    val guard = s"$stateDir/blocks"
    if (batchId <= StreamIndex.committedBatch(spark, guard)) return false
    val wrote =
      if (batch.isEmpty) false
      else {
        val cleaned = BlockState.probe(batch, stateDir,
          minDocs = minDocs, blockTokens = blockTokens,
          commit = true, batchId = Some(batchId))
        cleaned.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
        // probe localCheckpoints its output; the sink materialized it —
        // release the blocks or a long stream leaks one batch per
        // trigger (the StreamWinnow/StreamSemDedup discipline)
        Checkpoints.release(cleaned)
        true
      }
    // the marker advances even for empty batches (StreamIndex rule)
    StreamIndex.writeCommitted(spark, guard, batchId)
    wrote
  }

  /** Fold the accumulated per-batch state children, bounded by the
    * commit marker so a crashed trigger's uncommitted child never
    * folds (see [[graft.ops.WinnowState.compactStream]]).
    */
  def compactStream(spark: SparkSession, stateDir: String): Unit = {
    val committed = StreamIndex.committedBatch(spark, s"$stateDir/blocks")
    BlockState.compact(spark, stateDir, beforeBatch = Some(committed + 1))
  }

  /** All cleaned batches as one frame (the read side of `outDir`). */
  def cleaned(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/batch_*")
}
