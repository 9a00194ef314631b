package graft.streaming

import graft.ops.IvfIndex
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING index maintenance — [[IvfIndex.appendSaved]] driven by a
  * stream of embedding micro-batches: the ingest half of a production
  * vector index (new documents are embedded upstream and must become
  * searchable within a trigger, not at the next nightly rebuild).
  *
  * Shape: `readStream → foreachBatch(appendBatch)`. Each micro-batch
  * assigns + appends under the FROZEN centroids (cost O(|batch|), the
  * q74/appendSaved posture); probes of the live layout see every
  * committed batch with partition pruning intact (IndexAppendSpec's
  * contract — append ≡ rebuild under the same model).
  *
  * Exactly-once: foreachBatch is AT-LEAST-once on restart (the sink
  * checkpoint replays the last uncommitted trigger), and a blind
  * append would duplicate the replayed batch's vectors in the layout.
  * A batch-id commit marker beside the layout
  * (`path + "__commits"`, the [[graft.ops.IndexDrift.statsPath]]
  * sidecar convention — NOT inside the directory, so a
  * [[IvfIndex.compactSaved]] republish cannot drop it) makes replays
  * no-ops: a batch id at or below the marker returns without writing.
  * Remaining window: a crash BETWEEN the data append and the marker
  * write replays one batch's files — run
  * [[graft.ops.Layouts.dedupPartitioned]] to reconcile (one row per
  * vec_id survives; duplicates are bit-identical under the frozen
  * model), or use a transactional table format in production (the
  * same honest caveat as [[StreamCuration.start]]).
  *
  * Maintenance cadence composes with the batch operators unchanged:
  * [[IvfIndex.compactSaved]] for the small-file tax,
  * [[graft.ops.IndexDrift.probeIvf]] on a schedule for the frozen
  * model's drift verdict (StreamIndexSpec runs the full loop).
  */
object StreamIndex {

  /** Start maintaining a [[IvfIndex.save]]d float layout from a
    * streaming (vec_id, embedding) frame.
    */
  def start(
      source: DataFrame,
      centroids: Array[Array[Float]],
      path: String,
      checkpoint: String): StreamingQuery =
    startWith(source, path, checkpoint,
      b => IvfIndex.appendSaved(b, centroids, path))

  /** Same maintenance loop over the compressed [[graft.ops.IvfPq]]
    * layout — the frozen model is the IVF-PQ pair, the appends are
    * residual-encoded codes; marker semantics identical.
    */
  def startPq(
      source: DataFrame,
      model: graft.ops.IvfPq.IvfPqModel,
      codesPath: String,
      checkpoint: String): StreamingQuery =
    startWith(source, codesPath, checkpoint,
      b => graft.ops.IvfPq.appendSaved(b, model, codesPath))

  private def startWith(
      source: DataFrame,
      path: String,
      checkpoint: String,
      append: DataFrame => Unit): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        appendBatch(batch.toDF(), path, id, append): Unit
      }
      .start()

  /** One micro-batch: run `append` unless `batchId` is already
    * committed. Returns whether data was written (false = replayed
    * batch skipped, or empty batch).
    */
  private[graft] def appendBatch(
      batch: DataFrame,
      path: String,
      batchId: Long,
      append: DataFrame => Unit): Boolean = {
    val spark = batch.sparkSession
    if (batchId <= committedBatch(spark, path)) return false
    val wrote =
      if (batch.isEmpty) false
      else { append(batch); true }
    // the marker advances even for empty batches: a replayed empty
    // trigger must not block later ids behind a stale marker
    writeCommitted(spark, path, batchId)
    wrote
  }

  private def markerPath(path: String) = new Path(path + "__commits")

  private[graft] def committedBatch(spark: SparkSession, path: String): Long = {
    val p = markerPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.ops.Layouts.readSidecar(fs, p).map(_.trim.toLong).getOrElse(-1L)
  }

  // atomic temp+rename (Layouts.writeSidecar): the marker is the
  // replay guard, so a torn in-place overwrite would wedge every
  // subsequent trigger behind a NumberFormatException — or worse,
  // invite a manual delete that resets committed to -1 and lets the
  // replayed batch double-append
  private[graft] def writeCommitted(spark: SparkSession, path: String, id: Long): Unit = {
    val p = markerPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.ops.Layouts.writeSidecar(fs, p, s"$id\n")
  }
}
