package graft

import graft.ops.IvfIndex
import org.apache.spark.sql.functions._

/** Hot-cell refinement of the IVF quantizer (the scaladoc's "skewed
  * cells get sub-quantized" claim, exercised): on a corpus where most
  * vectors pile into one coarse cell, refine() must split that cell,
  * bound the largest inverted list, and keep probe recall against
  * exact brute-force — deterministically.
  */
class IvfRefineSpec extends SparkSuite {

  private val dim = 8

  /** Deterministic skewed corpus: ids 0..199 spread over sign patterns
    * (the k lowest ids seed the quantizer, so seeds are diverse), ids
    * 200..599 one tight cluster (dominant first coordinate + small
    * structured jitter) that must pile into a single coarse cell — no
    * RNG anywhere.
    */
  private def corpus = {
    import spark.implicits._
    (0 until 600).map { i =>
      val emb = Array.tabulate(dim) { d =>
        if (i >= 200) (if (d == 0) 10f else 0f) + ((i * 31 + d * 17) % 97) / 97.0f - 0.5f
        else ((if (((i >> (d % 3)) + d) % 2 == 0) 1f else -1f) * (1f + ((i * 13 + d * 7) % 23) / 23.0f))
      }
      (i.toLong, emb)
    }.toDF("vec_id", "embedding")
  }

  test("refine splits the hot cell, bounds inverted lists, and keeps recall") {
    val c = corpus
    val centroids = IvfIndex.train(c, k = 8, iters = 3, dim = dim)
    val baseSizes = IvfIndex.index(c, centroids)
      .groupBy(col("cell")).count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val hotSize = baseSizes.values.max
    assert(hotSize > 150, s"fixture must have a hot cell, got $baseSizes")

    val model = IvfIndex.refine(c, centroids, maxCell = 150, subK = 8, iters = 2, dim = dim)
    assert(model.sub.nonEmpty, "no cell was refined")

    val refinedSizes = IvfIndex.indexRefined(c, model)
      .groupBy(col("cell")).count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(refinedSizes.values.max < hotSize,
      s"refinement did not shrink the largest inverted list: $refinedSizes")
    // split-cell members all moved into the disjoint sub-id range
    for (c0 <- model.sub.keys) assert(!refinedSizes.contains(c0),
      s"split cell $c0 still holds members directly")

    // recall@10 of the refined probe vs exact brute force, 5 queries
    val queries = c.filter(col("vec_id") < 5)
    val approx = IvfIndex.topKRefined(spark, c, queries, model, k = 10, nprobe = 3, subProbe = 4)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.functions.CosineSim.register(spark)
    val brute = {
      val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id").asc)
      c.crossJoin(q).filter(col("vec_id") =!= col("qid"))
        .withColumn("sim", expr("cosine_sim(embedding, qe)"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val recall = approx.intersect(brute).size.toDouble / brute.size
    info(f"refined IVF recall@10 = $recall%.2f (${approx.intersect(brute).size}/${brute.size})")
    assert(recall >= 0.7, s"recall collapsed after refinement: $recall")

    // determinism: a second refine+probe run is identical
    val model2 = IvfIndex.refine(c, centroids, maxCell = 150, subK = 8, iters = 2, dim = dim)
    val approx2 = IvfIndex.topKRefined(spark, c, queries, model2, k = 10, nprobe = 3, subProbe = 4)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx === approx2)
  }
}
