package graft.ops


import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Distributed total-order rank — `row_number() OVER (ORDER BY ...)`
  * without the single-partition window that makes the naive form a
  * one-task bottleneck (Spark plans an empty-partition-spec window as
  * an Exchange to ONE partition: the whole dataset sorts on one core).
  *
  * Classic two-phase form (the same shape as `zipWithIndex`):
  *
  *  1. range-repartition + sort within partitions on the rank key —
  *     partition i holds keys strictly before partition i+1's, so a
  *     global order exists across partition boundaries;
  *  2. count rows per partition (a tiny `numPartitions`-row action),
  *     prefix-sum the counts into per-partition rank offsets, broadcast
  *     the offset map;
  *  3. one narrow `mapPartitions` pass assigns `offset + local index`.
  *
  * Every partition ranks independently; nothing ever concentrates on
  * one task. Cost at 100 TB: the range exchange (which a global sort
  * needs anyway), one scan for the counts, one scan for the ranks —
  * the counts scan reads the localCheckpoint'ed shuffle output, not
  * the upstream pipeline. Ties are the caller's responsibility: pass
  * a total key (suffix a unique id) or accept partition-boundary
  * nondeterminism, same as any distributed sort.
  */
object GlobalRank {

  /** `df` plus a `rankCol` column holding the 1-based global rank in
    * `sortCols` order. Eager: phase 2's sizing action runs here.
    *
    * Resource retention: the localCheckpoint'ed partition blocks and
    * the offset broadcast live until Spark's ContextCleaner garbage-
    * collects the returned frame's plan. That is fine for one-shot
    * query execution (the engine's own use), but a long-lived session
    * calling this repeatedly should use [[withRankManaged]] and invoke
    * the cleanup hook once the result has been fully materialized.
    */
  def withRank(
      df: DataFrame,
      sortCols: Seq[Column],
      rankCol: String,
      numPartitions: Int): DataFrame =
    withRankManaged(df, sortCols, rankCol, numPartitions)._1

  /** [[withRank]] plus an explicit cleanup hook that unpersists the
    * internal localCheckpoint blocks and destroys the offset broadcast.
    * Call the hook only AFTER the returned frame has been fully
    * materialized (collected / written); the frame is not re-runnable
    * afterwards.
    *
    * The range-partition id is BAKED INTO the checkpointed rows as a
    * column, not read from `TaskContext` in the rank pass: a downstream
    * `coalesce(n)` (e.g. a single-file write) fuses many range
    * partitions into one task, where the task's partition id no longer
    * identifies the range partition — but each fused parent iterator
    * still runs this op's `mapPartitions` function separately, so the
    * per-iterator local index plus the per-ROW pid lookup stays correct
    * under any downstream coalescing.
    */
  def withRankManaged(
      df: DataFrame,
      sortCols: Seq[Column],
      rankCol: String,
      numPartitions: Int): (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    val pidCol = "__graft_rank_pid"
    val ranged = df
      .repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      // pid evaluated here, inside the checkpointed plan, while one
      // task still == one range partition
      .withColumn(pidCol, spark_partition_id())
      // materialize ONCE: the counts action and the rank pass must see
      // identical partitions, and neither should re-run the upstream
      // pipeline
      .localCheckpoint()
    val counts = ranged
      .groupBy(col(pidCol)).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) =>
      val entry = (pid, acc); acc += n; entry
    }.toMap
    val bc = spark.sparkContext.broadcast(offsets)
    val pidIdx = ranged.schema.fieldIndex(pidCol)
    val outSchema = StructType(
      ranged.schema.fields.patch(pidIdx, Nil, 1)).add(rankCol, LongType, nullable = false)
    val out = ranged.mapPartitions { it =>
      // one invocation per range partition (coalesce concatenates
      // parent iterators, it does not merge them), so the local index
      // restarts exactly at each range-partition boundary
      var i = 0L
      it.map { r =>
        i += 1
        val off = bc.value(r.getInt(pidIdx))
        Row.fromSeq(r.toSeq.patch(pidIdx, Nil, 1) :+ (off + i))
      }
    }(Encoders.row(outSchema))
    val checkpointed = ranged.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    val cleanup: () => Unit = () => {
      // raw RDDs (not checkpointed Datasets): RDD.unpersist IS the
      // real release here — no Checkpoints.release indirection needed
      checkpointed.foreach(_.unpersist(blocking = false))
      bc.destroy()
    }
    (out, cleanup)
  }
}
