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
  *    seeded splitmix64 hash, no RNG state; the ±1 matrix is a few KB
  *    and any executor can recompute it from the seed;
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

  /** All NumTables bucket ids of one vector in a single pass: a tight
    * loop over a closure-captured ±1 plane matrix (L·B·dim ≈ 4k fused
    * multiply-adds per vector — generating this as a SQL expression
    * tree instead produced a 13 MiB task binary and 30× slower plans).
    */
  def buckets(emb: Array[Float], planes: Array[Array[Double]]): Array[Long] =
    Array.tabulate(NumTables) { t =>
      var bucket = 0L
      var b = 0
      while (b < NumBits) {
        val p = planes(t * NumBits + b)
        var dot = 0.0
        var d = 0
        val n = math.min(emb.length, p.length)
        while (d < n) { dot += p(d) * emb(d); d += 1 }
        if (dot > 0) bucket |= (1L << b)
        b += 1
      }
      bucket
    }

  private def planeMatrix(dim: Int): Array[Array[Double]] =
    Array.tabulate(NumTables * NumBits, dim)((p, d) => planeSign(p, d))

  /** One (tbl, bucket) row per table per vector — the index relation.
    * Input frame: (id, embedding[, …]); output adds (tbl, bucket).
    * `metaCols` names input columns to carry into the index rows —
    * filtered ANN needs the metadata IN the at-rest layout so a
    * predicate can prune candidates in the probe's own scan (the same
    * contract as [[IvfPq.index]]).
    */
  def index(vectors: DataFrame, dim: Int, metaCols: Seq[String] = Nil): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val idCol = vectors.columns(0)
    val embCol = vectors.columns(1)
    val planes = planeMatrix(dim)
    if (metaCols.isEmpty) {
      // L·B·dim multiply-adds per vector: spread a single-row-group local
      // scan across cores before the flatMap (explicit count so AQE can't
      // coalesce the tiny shuffle back to one partition)
      vectors.repartition(spark.sparkContext.defaultParallelism, col(idCol))
        .select(col(idCol), col(embCol)).as[(Long, Array[Float])]
        .flatMap { case (id, emb) =>
          buckets(emb, planes).zipWithIndex.map { case (bk, t) => (id, emb, t.toLong, bk) }
        }
        .toDF(idCol, embCol, "tbl", "bucket")
    } else {
      // metadata rides along untyped, so the bucket array comes from a
      // closure-capturing udf + posexplode instead of the typed flatMap
      // (same plane math, same output values)
      val bks = udf((emb: Array[Float]) => buckets(emb, planes))
      vectors.repartition(spark.sparkContext.defaultParallelism, col(idCol))
        .select(col(idCol) +: col(embCol) +: metaCols.map(col): _*)
        .select(col("*"), posexplode(bks(col(embCol))).as(Seq("tbl", "bucket")))
        .withColumn("tbl", col("tbl").cast("long"))
    }
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
    val idx = index(corpus.select(col("vec_id"), col("embedding")), dim)
    rerank(spark, idx, probeFrame(queries, dim), k)
  }

  /** Combined single-column bucket key (tbl·2^B + bucket): Spark's
    * bucket pruning only engages for a single-column bucket spec, so
    * the at-rest layout buckets AND prunes on this one key.
    */
  def withBucketKey(idx: DataFrame): DataFrame =
    idx.withColumn("bkey", col("tbl") * (1L << NumBits) + col("bucket"))

  /** Persist the index as a bucketed+sorted table — the at-rest form
    * the scaladoc above promises: probes prune to their buckets instead
    * of scanning the corpus, and the probe join needs no shuffle on the
    * index side.
    */
  def save(
      corpus: DataFrame,
      dim: Int,
      tableName: String,
      numBuckets: Int = 64,
      metaCols: Seq[String] = Nil): Unit =
    withBucketKey(index(
        corpus.select(col("vec_id") +: col("embedding") +: metaCols.map(col): _*),
        dim, metaCols))
      .write.mode("overwrite")
      .bucketBy(numBuckets, "bkey").sortBy("bkey")
      .saveAsTable(tableName)

  /** Probe a [[save]]d index table. The probe batch is dimension-sized
    * (interactive or mini-batch ANN), so its bucket keys are collected
    * into an IN-filter — that is what turns the bucketed layout into
    * `SelectedBucketsCount: n/numBuckets` file pruning at the scan. A
    * corpus-sized probe batch would instead co-bucket both sides and
    * skip the filter.
    *
    * `predicate` (over the layout's metaCols) implements FILTERED ANN
    * on this layout: it lands in the SAME bucket-pruned scan as
    * PushedFilters (FilteredAnnSpec), so candidates are pruned before
    * the cosine re-rank and k fills with MATCHING vectors instead of
    * post-filtering a generic top-k into under-filled results.
    */
  def topKFromTable(
      spark: SparkSession,
      tableName: String,
      queries: DataFrame,  // (vec_id, embedding)
      k: Int = 10,
      dim: Int = 64,
      predicate: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val probes = withBucketKey(probeFrame(queries, dim))
    val keys = probes.select("bkey").distinct().collect().map(_.getLong(0))
    rerank(spark, savedScan(spark, tableName, keys, predicate), probes, k)
  }

  /** The index-side scan [[topKFromTable]] feeds to [[rerank]] —
    * factored out so FilteredAnnSpec can assert the exact plan the
    * probe executes (metadata predicate in PushedFilters beside the
    * bucket pruning of one scan).
    */
  private[graft] def savedScan(
      spark: SparkSession,
      tableName: String,
      keys: Array[Long],
      predicate: Option[org.apache.spark.sql.Column]): DataFrame = {
    val pruned = spark.table(tableName).filter(col("bkey").isin(keys: _*))
    predicate.fold(pruned)(pruned.filter)
  }

  /** (qid, qe, tbl, bucket) — the query batch hashed by the same plane
    * matrix as the corpus.
    */
  private def probeFrame(queries: DataFrame, dim: Int): DataFrame =
    index(queries.select(col("vec_id").as("qid"), col("embedding").as("qe")), dim)

  /** Candidate join + exact-cosine re-rank, shared by the in-memory and
    * persisted paths. The probe side is broadcast (dimension-sized by
    * contract), so the index side streams its (possibly bucketed) scan
    * with no shuffle.
    */
  private def rerank(spark: SparkSession, idx: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    CosineSim.register(spark)
    val cand = idx.join(broadcast(probes.select(col("qid"), col("qe"), col("tbl"), col("bucket"))),
        Seq("tbl", "bucket"))
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
