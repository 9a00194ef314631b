package graft.ops

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of `localCheckpoint()` storage.
  *
  * `Dataset.unpersist()` is a NO-OP for checkpointed frames: it only
  * uncaches CacheManager entries (`df.cache()`), while localCheckpoint
  * persists the materialized RDD directly — verified on this Spark:
  * after `df.localCheckpoint(); df.unpersist(true)` the RDD still sits
  * in `sc.getPersistentRDDs`, and without this helper every "released"
  * intermediate in the iterative operators actually lingered until a
  * driver GC let ContextCleaner reap it nondeterministically. The
  * checkpointed Dataset's plan is a [[LogicalRDD]] over exactly the
  * persisted RDD, so unpersisting THAT RDD is the real release
  * (CheckpointsSpec pins it against `getPersistentRDDs`).
  */
object Checkpoints {

  /** Free the storage behind a `localCheckpoint()`ed Dataset. Safe on
    * any Dataset — frames with no checkpoint in their plan are left
    * untouched. Walks the WHOLE plan and unpersists every
    * [[LogicalRDD]] leaf, so it also releases frames DERIVED from a
    * checkpoint (`checkpointed.select(...)`), not just the Dataset
    * `localCheckpoint()` returned — a root-only match would silently
    * no-op on those, reverting to the GC-dependent leak this helper
    * exists to fix. Corollary: a frame reading MULTIPLE checkpoints
    * releases all of them; don't pass a join of checkpoints you only
    * half-own.
    */
  def release(ds: Dataset[_]): Unit =
    ds.queryExecution.logical.collectLeaves().foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
