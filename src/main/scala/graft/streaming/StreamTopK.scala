package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming heavy hitters — q111's Misra–Gries sketch in the
  * micro-batch posture (trending tokens over a document stream, the
  * operational companion to the batch sketch): each batch summarizes
  * its own token stream distributedly (`Stats.heavyHitters`, ≤ P·k
  * partials, merge-by-SUM), the batch summary merges into the
  * persisted ≤ k-row state, and the merged summary MG-COMPRESSES back
  * to ≤ k rows by subtracting the (k+1)-th largest count from every
  * counter and dropping the non-positive ones — the Mergeable
  * Summaries construction (Agarwal et al., PODS 2012): the compress
  * step removes ≤ (k+1)·t ≤ (mass so far)/(k+1) of TRUE mass in
  * total, so after ANY number of batches the state never overcounts
  * and undercounts by at most n/(k+1) — the batch sketch's exact
  * guarantee, preserved under streaming (StreamTopKSpec pins it
  * against exact counts of the whole stream).
  *
  * Scale shape: state is ≤ k rows of (tok, est) — it broadcasts into
  * nothing, shuffles nothing, and the only driver materialization is
  * the k+1-row threshold probe (k-bounded by contract). Per batch the
  * corpus-sized work is the batch's own token pass.
  */
object StreamTopK {

  /** Start the stream over a streaming documents frame (needs `text`). */
  def start(
      source: DataFrame,
      stateDir: String,
      k: Int = 512): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", s"$stateDir/ckpt")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        processBatch(batch.sparkSession, batch, stateDir, k)
      }
      .start()

  /** One micro-batch: summarize → merge → MG-compress → publish.
    * Directly drivable (the spec's ordered-drop harness).
    */
  private[graft] def processBatch(
      spark: SparkSession,
      batchDocs: DataFrame,
      stateDir: String,
      k: Int): Unit = {
    import spark.implicits._
    if (batchDocs.isEmpty) return
    val toks = batchDocs
      .select(explode(split(lower($"text"), "[^a-z]+")).as("tok"))
      .filter($"tok" =!= "").as[String]
    val summary = graft.queries.Stats.heavyHitters(toks, k)
    val state = readState(spark, s"$stateDir/topk")
    val merged = state.union(summary)
      .groupBy($"tok").agg(sum($"est").cast("long").as("est"))
      .localCheckpoint() // two consumers (threshold probe, compress filter)
    // (k+1)-th largest count = the MG decrement; 0 when ≤ k survivors.
    // k+1 rows to the driver — k-bounded by contract, like probe cell
    // lists.
    val top = merged.orderBy($"est".desc, $"tok".asc).limit(k + 1)
      .select($"est").as[Long].collect()
    val t = if (top.length <= k) 0L else top.last
    val next = merged.filter($"est" > t)
      .select($"tok", ($"est" - t).as("est"))
    // publish the ≤ k-row state by staged rename (atomic swap; the
    // in-place overwrite window would lose state on a crash mid-write)
    val tmp = s"$stateDir/topk.tmp"
    next.coalesce(1).write.mode("overwrite").parquet(tmp)
    graft.ops.Checkpoints.release(merged)
    val dst = new org.apache.hadoop.fs.Path(s"$stateDir/topk")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dst))
      require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst),
        s"cannot publish first state generation to $dst")
    else graft.ops.Layouts.publish(spark, s"$stateDir/topk", tmp)
  }

  /** Current top-n estimate (deterministic order: est desc, tok asc). */
  def topN(spark: SparkSession, stateDir: String, n: Int): DataFrame = {
    import spark.implicits._
    readState(spark, s"$stateDir/topk").orderBy($"est".desc, $"tok".asc).limit(n)
  }

  private def readState(spark: SparkSession, path: String): DataFrame =
    if (new java.io.File(path).exists()) spark.read.parquet(path)
    else spark.createDataFrame(
      new java.util.ArrayList[Row](), StructType.fromDDL("tok STRING, est BIGINT"))
}
