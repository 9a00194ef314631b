package graft

import graft.ops.{Checkpoints, PageRank}
import org.apache.spark.sql.functions._

/** ops.Checkpoints: `Dataset.unpersist()` after `localCheckpoint()` is
  * a no-op (it only uncaches CacheManager entries), so every iterative
  * operator's block release goes through [[Checkpoints.release]] —
  * which must actually remove the checkpointed RDD from executor
  * storage, deterministically, not whenever a driver GC lets
  * ContextCleaner get to it.
  */
class CheckpointsSpec extends SparkSuite {

  // Count only ids created AFTER the baseline: ContextCleaner reaps
  // earlier suites' garbage asynchronously, so absolute sizes race.
  private def ids: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("Dataset.unpersist after localCheckpoint is a no-op; release is not") {
    import spark.implicits._
    val before = ids
    val df = spark.range(1000).toDF("x").localCheckpoint()
    assert((ids -- before).size == 1)
    df.unpersist(blocking = true)
    assert((ids -- before).size == 1,
      "Dataset.unpersist released checkpoint blocks — helper is obsolete, simplify callers")
    Checkpoints.release(df)
    assert((ids -- before).isEmpty, "release did not free the checkpointed RDD")
  }

  test("release works on typed Datasets and is a no-op on plain frames") {
    import spark.implicits._
    val before = ids
    val ds = spark.range(100).map(i => (Array(i.toString), i)).localCheckpoint()
    assert((ids -- before).size == 1)
    Checkpoints.release(ds)
    assert((ids -- before).isEmpty)
    // not checkpoint-backed: nothing to release, nothing breaks
    Checkpoints.release(spark.range(10).toDF("x"))
    assert((ids -- before).isEmpty)
  }

  test("release frees checkpoints under DERIVED frames, not just roots") {
    import spark.implicits._
    val before = ids
    val root = spark.range(500).toDF("x").localCheckpoint()
    val derived = root.select(($"x" * 2).as("y")).filter($"y" > 10)
    assert((ids -- before).size == 1)
    // a root-only match would silently no-op here — the ADVICE trap:
    // callers handing release a select() over the checkpoint got the
    // nondeterministic GC-dependent leak back
    Checkpoints.release(derived)
    assert((ids -- before).isEmpty,
      "release did not walk the plan to the LogicalRDD leaf")
  }

  test("the distributed PageRank loop leaves only its result frame cached") {
    import spark.implicits._
    val before = ids
    val edges = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("w1", "w2", "c")
    val pr = PageRank.run(edges, rounds = 4, strategy = "distributed")
    // e0/trans/nodes/outW and the 4 superseded rank frames are all
    // released — exactly one checkpoint (the returned ranks) remains
    val mine = ids -- before
    assert(mine.size == 1, s"expected 1 surviving checkpoint, found ${mine.size}")
    Checkpoints.release(pr)
    assert((ids -- before).isEmpty)
  }
}
