package graft

import graft.ops.{IndexDrift, IvfPq}
import org.apache.spark.sql.functions._

/** IndexDrift: the append-maintained IVF-PQ layout's drift verdict.
  * Full cycle: save → healthy; append a synthetically drifted drop
  * (the whole distribution shifted along a constant direction) under
  * the frozen model → the
  * probe flags retrain on population drift; retrainAndSwap publishes a
  * re-encoded layout via the staged rename → the probe is healthy
  * again and sampled recall is back at threshold.
  */
class DriftSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("drift in → flag up → retrain-and-swap → healthy, recall restored") {
    import spark.implicits._
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val model = IvfPq.train(base, kCells = 8, m = 8, kSub = 16, dim = 64, iters = 3)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-drift").toString + "/codes"
    IvfPq.save(base, model, dir, "drift_cells", "drift_codebook")

    val healthy = IndexDrift.probe(spark, dir, "drift_cells", "drift_codebook",
      base, k = 10, sampleQueries = 8, nprobe = 8, shortlist = 200)
    assert(!healthy.retrain, s"fresh layout flagged: $healthy")
    assert(healthy.totalVariation < 0.05, s"fresh layout drifted: $healthy")
    assert(healthy.sampledRecall >= 0.7, s"fresh layout recall: $healthy")

    // synthetic drift: shift the whole distribution along a constant
    // direction while KEEPING the full original variation (a cluster
    // denser than the data itself would be unresolvable by ANY PQ
    // model — the point here is drift, not near-duplication). Same row
    // count as the base corpus, so cell shares must move by
    // construction: the frozen centroids see the constant term
    // dominate every assignment.
    val drifted = base.as[(Long, Array[Float])].map { case (id, e) =>
      (id + 1000000L, Array.tabulate(64) { i =>
        (if (i < 8) 2.0f else 0.0f) + (if (i < e.length) e(i) else 0f)
      })
    }.toDF("vec_id", "embedding").localCheckpoint()
    IvfPq.appendSaved(drifted, model, dir)
    val merged = base.union(drifted).localCheckpoint()

    val flagged = IndexDrift.probe(spark, dir, "drift_cells", "drift_codebook",
      merged, k = 10, sampleQueries = 8, nprobe = 8, shortlist = 200)
    assert(flagged.retrain, s"drifted layout not flagged: $flagged")
    assert(flagged.totalVariation > 0.25,
      s"population drift not measured: $flagged")
    assert(flagged.reason.contains("population"), s"reason: ${flagged.reason}")

    // retrain on the current corpus and swap the layout in
    IndexDrift.retrainAndSwap(merged, dir, "drift_cells", "drift_codebook",
      kCells = 8, m = 8, kSub = 16, dim = 64, iters = 3)
    // staged-rename leaves no staging/backup residue
    assert(!new java.io.File(dir + "__retrain_tmp").exists())
    assert(!new java.io.File(dir + "__compact_bak").exists())

    val after = IndexDrift.probe(spark, dir, "drift_cells", "drift_codebook",
      merged, k = 10, sampleQueries = 8, nprobe = 8, shortlist = 200)
    assert(!after.retrain, s"retrained layout still flagged: $after")
    assert(after.totalVariation < 0.05, s"snapshot not refreshed: $after")
    assert(after.sampledRecall >= 0.7,
      s"recall not restored by retrain: before=${flagged.sampledRecall} after=$after")
    assert(after.sampledRecall >= flagged.sampledRecall - 1e-9,
      s"retrain worsened recall: ${flagged.sampledRecall} -> ${after.sampledRecall}")
  }

  test("same cycle on the float IVF layout (probeIvf / retrainAndSwapIvf)") {
    import spark.implicits._
    import graft.ops.IvfIndex
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val cents = IvfIndex.train(base, k = 8, iters = 3, dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("ivf-drift").toString + "/cells"
    IvfIndex.save(base, cents, dir)

    val healthy = IndexDrift.probeIvf(spark, dir, cents, base,
      k = 10, sampleQueries = 8, nprobe = 8)
    assert(!healthy.retrain && healthy.totalVariation < 0.05, s"$healthy")
    assert(healthy.sampledRecall >= 0.9, s"float probe is exact in-cell: $healthy")

    val drifted = base.as[(Long, Array[Float])].map { case (id, e) =>
      (id + 1000000L, Array.tabulate(64) { i =>
        (if (i < 8) 2.0f else 0.0f) + (if (i < e.length) e(i) else 0f)
      })
    }.toDF("vec_id", "embedding").localCheckpoint()
    IvfIndex.appendSaved(drifted, cents, dir)
    val merged = base.union(drifted).localCheckpoint()

    val flagged = IndexDrift.probeIvf(spark, dir, cents, merged,
      k = 10, sampleQueries = 8, nprobe = 8)
    assert(flagged.retrain && flagged.totalVariation > 0.25, s"$flagged")

    val cents2 = IndexDrift.retrainAndSwapIvf(merged, dir, kCells = 8, dim = 64, iters = 3)
    val after = IndexDrift.probeIvf(spark, dir, cents2, merged,
      k = 10, sampleQueries = 8, nprobe = 8)
    assert(!after.retrain && after.totalVariation < 0.05, s"$after")
    assert(after.sampledRecall >= 0.9, s"recall not restored: $after")
  }

  test("recall decay alone flags retrain even with balanced cells") {
    import spark.implicits._
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val model = IvfPq.train(base, kCells = 4, m = 8, kSub = 8, dim = 64, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-decay").toString + "/codes"
    IvfPq.save(base, model, dir, "decay_cells", "decay_codebook")
    // a probe against a corpus the layout does NOT index (disjoint
    // vec_ids) guarantees recall 0 while the layout's own cell stats
    // are untouched: the recall signal must flag on its own
    val foreign = base.as[(Long, Array[Float])]
      .map { case (id, e) => (id + 5000000L, e.map(x => -x)) }
      .toDF("vec_id", "embedding")
    val r = IndexDrift.probe(spark, dir, "decay_cells", "decay_codebook",
      foreign, k = 10, sampleQueries = 4)
    assert(r.totalVariation < 0.05, s"cells should not have moved: $r")
    assert(r.sampledRecall < 0.7 && r.retrain, s"recall decay not flagged: $r")
    assert(r.reason.contains("recall"), s"reason: ${r.reason}")
  }
}
