package graft

import graft.ops.{IvfIndex, SemDedup}

/** The production SemDeDup path: the same prune tail q92 oracle-checks
  * under sign-bucket cells, here under real k-means cells with the
  * hot-cell sub-quantizer split — pinned against a local greedy
  * replica of the published algorithm.
  */
class SemDedupSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("pruneIvf matches the greedy scan under the refined k-means cells") {
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    // k=4 over 500 vectors: mean cell population 125, so at least one
    // cell exceeds maxCell=100 by pigeonhole — the split ALWAYS fires
    val cents = IvfIndex.train(corpus, k = 4, iters = 3, dim = 64)
    val model = IvfIndex.refine(corpus, cents, maxCell = 100L, subK = 4, iters = 3, dim = 64)
    assert(model.sub.nonEmpty, "fixture must exercise the hot-cell split")

    val assigned = IvfIndex.indexRefined(corpus, model)
      .as[(Int, Long, Array[Float])].collect()
    val byCell = assigned.groupBy(_._1)
    val expected = assigned.map { case (cell, vid, emb) =>
      val lower = byCell(cell).filter(_._2 < vid)
      val msim = if (lower.isEmpty) -1.0 else lower.map(m => cos(m._3, emb)).max
      vid -> (msim < 0.3)
    }.toMap

    val got = SemDedup.pruneIvf(corpus, k = 4, iters = 3, dim = 64,
      tau = 0.3, maxCell = 100L, subK = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(3) == 1L)).toMap
    assert(got == expected)
    // τ sits in the tail of the cell-mate sim distribution: the prune
    // must act but never wipe a cell out
    val dropped = got.count(!_._2)
    assert(dropped > 0 && dropped < got.size / 2, s"dropped=$dropped of ${got.size}")
  }

  test("prune keeps the lowest id of an exact-duplicate group, drops the rest") {
    import spark.implicits._
    val v1 = Array(1.0f, 0.0f, 0.0f)
    val v2 = Array(0.0f, 1.0f, 0.0f)
    val assigned = Seq(
      (0L, 10L, v1), (0L, 11L, v1), (0L, 12L, v1), // dup group, keep 10
      (0L, 13L, v2),                               // orthogonal survivor
      (1L, 14L, v1)                                // same vector, other cell: kept
    ).toDF("cell", "vec_id", "embedding")
    val got = SemDedup.prune(assigned, tau = 0.99)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(2))).toMap
    assert(got(10L)._1 == 1L && got(10L)._2 == -1.0)
    assert(got(11L)._1 == 0L && got(11L)._2 == 1.0)
    assert(got(12L)._1 == 0L && got(12L)._2 == 1.0)
    assert(got(13L)._1 == 1L)
    assert(got(14L)._1 == 1L && got(14L)._2 == -1.0, "cells must isolate comparisons")
  }

  test("pruneIncremental ≡ full re-prune restricted to the batch; corpus scan prunes to touched cells") {
    import spark.implicits._
    import java.nio.file.Files
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    // corpus = lower ids, batch = upper ids (the drop convention the
    // equivalence claim requires)
    val corpus = all.filter($"vec_id" < 350)
    val batch = all.filter($"vec_id" >= 350)
    val cents = IvfIndex.train(corpus, k = 4, iters = 3, dim = 64)
    val model = IvfIndex.refine(corpus, cents, maxCell = 100L, subK = 4, iters = 3, dim = 64)
    val path = Files.createTempDirectory("semdedup-inc").toString
    SemDedup.saveAssigned(corpus, model, path)

    val inc = SemDedup.pruneIncremental(spark, path, model, batch, tau = 0.3)
    // the corpus side of the plan must carry cell partition filters
    // (touched cells only — never a full-layout scan)
    val p = inc.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [cell"), s"corpus scan not cell-pruned:\n$p")
    val got = inc.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getLong(3)))).toMap

    // ground truth: one prune over corpus ∪ batch under the SAME
    // frozen assignment, restricted to batch ids
    val want = SemDedup.prune(IvfIndex.indexRefined(all, model), tau = 0.3)
      .filter($"vec_id" >= 350)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getLong(3)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, w) =>
      assert(got(id) == w, s"vec $id: got ${got(id)}, want $w")
    }
    // the batch genuinely collides with the corpus at this tau
    assert(got.values.exists(_._2 == 0L), "fixture exercised no drops")
  }
}
