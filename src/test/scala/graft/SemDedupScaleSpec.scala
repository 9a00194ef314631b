package graft

import graft.ops.{IvfIndex, SemDedup}
import org.apache.spark.sql.functions._

/** q92's production tail at BENCH scale (sf0.1, 2000×64f): the
  * persisted `partitionBy(cell)` index-at-rest layout feeding the
  * SemDeDup prune — maxCell bound enforced on a skewed assignment,
  * per-cell reads partition-pruned, and the saved-layout prune
  * verdict-identical to the in-memory one (round-6 verdict item #4).
  */
class SemDedupScaleSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.1"

  test("persisted cell layout: maxCell bound, partition pruning, prune agreement") {
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val maxCell = 300L
    // k=4 over 2000 vectors: mean cell 500 > maxCell — the hot-cell
    // split must fire (the skewed-corpus posture IvfRefineSpec pins on
    // a synthetic fixture, here on the real bench-scale table)
    val cents = IvfIndex.train(corpus, k = 4, iters = 3, dim = 64)
    val model = IvfIndex.refine(corpus, cents, maxCell, subK = 8, iters = 3, dim = 64)
    assert(model.sub.nonEmpty, "fixture must exercise the hot-cell split")

    val dir = java.nio.file.Files.createTempDirectory("semdedup-cells").toString
    SemDedup.saveAssigned(corpus, model, dir)

    // the at-rest contract: every inverted list (= partition directory)
    // within the refine bound
    val persisted = spark.read.parquet(dir)
    val sizes = persisted.groupBy($"cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.values.sum == 2000L)
    assert(sizes.values.max <= maxCell,
      s"inverted list above maxCell=$maxCell: $sizes")

    // a one-cell read prunes to that cell's directory — the incremental
    // re-prune path must not scan the corpus (the PersistedIndexSpec
    // assertion: the cell filter reaches the scan as a PartitionFilter)
    val oneCell = sizes.keys.min
    val plan = persisted.filter($"cell" === oneCell)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"no partition pruning in plan:\n$plan")

    // saved-layout prune ≡ in-memory prune, verdict for verdict
    val viaSaved = SemDedup.pruneSaved(spark, dir, tau = 0.3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    val viaMemory = SemDedup.prune(IvfIndex.indexRefined(corpus, model), tau = 0.3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    assert(viaSaved == viaMemory)
    // the prune acts but cannot wipe the corpus: each cell's lowest id
    // survives by construction (k-means cells are far more cohesive
    // than q92's sign-buckets, so τ=0.3 bites hard here — >50% drop is
    // expected, 100% is impossible)
    val dropped = viaSaved.count(_._4 == 0L)
    assert(dropped > 0 && dropped <= 2000 - sizes.size, s"dropped=$dropped of 2000")
  }
}
