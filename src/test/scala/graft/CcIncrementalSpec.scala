package graft

import graft.ops.ConnectedComponents
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.min

/** ConnectedComponents.updateLabels — incremental cluster maintenance:
  * folding a batch of new pair edges into persisted labels must be
  * row-identical to a from-scratch rebuild over the merged edge set,
  * through both CC tiers.
  */
class CcIncrementalSpec extends SparkSuite {

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("update = rebuild on a fixture exercising every merge shape") {
    import spark.implicits._
    // old graph: components {1,2,3}, {10,11}, {20,21,22}, isolated pair {30,31}
    val oldE = Seq(
      (1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (30L, 31L))
      .toDF("a", "b")
    val labels = ConnectedComponents.auto(oldE)
    // batch: cluster-merge (3-10 joins {1,2,3}+{10,11}), new→old (40-20),
    // new→new (50-51), intra-cluster no-op (30-31 again via 31-30),
    // and a new vertex SMALLER than its cluster's old root (0-22:
    // the merged component must re-root to 0)
    val batch = Seq(
      (3L, 10L), (40L, 20L), (50L, 51L), (31L, 30L), (0L, 22L))
      .toDF("a", "b")

    val updated = labelSet(ConnectedComponents.updateLabels(labels, batch))
    val rebuilt = labelSet(ConnectedComponents.auto(oldE.union(batch)))
    assert(updated == rebuilt,
      s"update diverged from rebuild:\n  only-update: ${updated -- rebuilt}\n  only-rebuild: ${rebuilt -- updated}")
    // spot-check the re-rooting: everything in {0,20,21,22,40} labels 0
    assert(Seq(20L, 21L, 22L, 40L, 0L).forall(v => updated.contains((v, 0L))))
  }

  test("update = rebuild on a pseudo-random graph, both CC tiers") {
    import spark.implicits._
    // deterministic pseudo-random edges: 400 old + 150 batch over ~300
    // vertices — dense enough for multi-way merges across the split
    def edges(n: Int, seed: Int): Seq[(Long, Long)] =
      (0 until n).map { i =>
        val h = (i * 2654435761L + seed * 40503L) & 0x7fffffffL
        ((h % 300), ((h / 300) % 300))
      }.filter { case (a, b) => a != b }
    val oldE = edges(400, 1).toDF("a", "b")
    val batch = edges(150, 2).toDF("a", "b")
    val rebuilt = labelSet(ConnectedComponents.auto(oldE.union(batch)))
    // driver union-find tier
    val labelsLocal = ConnectedComponents.auto(oldE)
    assert(labelSet(ConnectedComponents.updateLabels(labelsLocal, batch)) == rebuilt)
    // distributed large-star/small-star tier (threshold 0 forces it for
    // both the base run and the incremental CC over the batch graph)
    val labelsDist = ConnectedComponents.auto(oldE, localThreshold = 0L)
    assert(labelSet(ConnectedComponents.updateLabels(labelsDist, batch, localThreshold = 0L)) == rebuilt)
  }

  test("labels frame is never shuffled on the translate path (plan assertion)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    import org.apache.spark.sql.execution.SparkPlan

    // shuffles are only legitimate BELOW a broadcast exchange (the
    // batch-sized endpoint distinct); anywhere else they would be
    // shuffling the corpus-sized labels frame
    def shufflesOutsideBroadcast(p: SparkPlan): Seq[SparkPlan] = p match {
      case _: BroadcastExchangeLike => Nil
      case s: ShuffleExchangeLike => s +: s.children.flatMap(shufflesOutsideBroadcast)
      case other => other.children.flatMap(shufflesOutsideBroadcast)
    }
    def assertBroadcastOnly(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val plan = df.queryExecution.sparkPlan
      assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
        s"$what: SortMergeJoin would shuffle the labels frame:\n$plan")
      assert(plan.collect { case j: ShuffledHashJoinExec => j }.isEmpty,
        s"$what: ShuffledHashJoin would shuffle the labels frame:\n$plan")
      assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"$what: expected a broadcast join:\n$plan")
      assert(shufflesOutsideBroadcast(plan).isEmpty,
        s"$what: shuffle outside a broadcast subtree:\n$plan")
    }

    // mirror updateLabels' physical inputs: checkpointed labels + edges
    val l = (0L until 2000L).map(v => (v, v % 97)).toDF("v", "cluster_id")
      .localCheckpoint()
    val e = Seq((1L, 5000L), (97L, 5001L), (5000L, 5002L)).toDF("a", "b")
      .localCheckpoint()
    assertBroadcastOnly(ConnectedComponents.batchRepMap(l, e), "batchRepMap")
    val repMap = ConnectedComponents.batchRepMap(l, e).localCheckpoint()
    val translated = ConnectedComponents.translateWith(repMap, e)
    assertBroadcastOnly(translated, "translateWith")
    assert(translated.queryExecution.sparkPlan
      .collect { case s: ShuffleExchangeLike => s }.isEmpty,
      "translate of materialized inputs must be entirely shuffle-free")
    // and the values still translate correctly through the asserted plan
    val t = translated.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(t == Set((1L, 5000L), (0L, 5001L), (5000L, 5002L)))
  }

  test("labels materialization is plan-aware (scan-cheap frames are not cached)") {
    import spark.implicits._
    // leaf / projection chains re-scan for free → no corpus-sized cache
    val local = Seq((1L, 1L)).toDF("v", "cluster_id")
    assert(ConnectedComponents.isRescanCheap(local))
    assert(ConnectedComponents.isRescanCheap(
      local.filter($"v" > 0).select($"v", $"cluster_id")))
    val parquetDir = java.nio.file.Files.createTempDirectory("cc-labels").toString
    local.write.parquet(s"$parquetDir/t")
    assert(ConnectedComponents.isRescanCheap(spark.read.parquet(s"$parquetDir/t")))
    // real compute in the lineage re-executes per consumer → cache it
    assert(!ConnectedComponents.isRescanCheap(
      local.groupBy($"v").agg(min($"cluster_id").as("cluster_id"))))
    assert(!ConnectedComponents.isRescanCheap(
      local.join(local.select($"v"), Seq("v"))))

    // and the checkpoint branch still produces rebuild-identical labels
    // when the labels frame arrives with compute in its lineage
    val oldE = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val batch = Seq((3L, 10L), (20L, 21L)).toDF("a", "b")
    val computedLabels = ConnectedComponents.auto(oldE)
      .union(Seq.empty[(Long, Long)].toDF("v", "cluster_id"))
      .groupBy($"v").agg(min($"cluster_id").as("cluster_id"))
    assert(!ConnectedComponents.isRescanCheap(computedLabels))
    assert(labelSet(ConnectedComponents.updateLabels(computedLabels, batch)) ==
      labelSet(ConnectedComponents.auto(oldE.union(batch))))
  }

  test("empty batch is the identity; batch onto empty labels is plain CC") {
    import spark.implicits._
    val oldE = Seq((1L, 2L), (5L, 6L)).toDF("a", "b")
    val labels = ConnectedComponents.auto(oldE)
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(labelSet(ConnectedComponents.updateLabels(labels, empty)) == labelSet(labels))
    val noLabels = Seq.empty[(Long, Long)].toDF("v", "cluster_id")
    assert(labelSet(ConnectedComponents.updateLabels(noLabels, oldE)) == labelSet(labels))
  }
}
