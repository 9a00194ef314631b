package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization (PQ) approximate nearest-neighbour search — the
  * memory-bound scale path that complements the sign-LSH ([[AnnIndex]])
  * and IVF-Flat ([[IvfIndex]]) indexes: vectors are L2-normalized,
  * split into `m` subspaces, and each subvector is replaced by the id
  * of its nearest sub-centroid — `m` small integers (here 8×4 bits)
  * instead of `dim` floats, a 64× compression that keeps a billion-
  * vector index in executor memory. Queries rank by ADC (asymmetric
  * distance computation): one `m × k` table of exact query-to-centroid
  * squared distances per query, then every corpus code scores with `m`
  * table lookups — no float vector is ever touched at scan time.
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011 — public algorithm, reimplemented DataFrame-
  * native.)
  *
  * On unit vectors, squared L2 = 2 − 2·cosine, so ascending ADC
  * distance ranks exactly like descending cosine — the contract the
  * recall spec checks against the exact q25 baseline.
  *
  * Determinism: same seeding/iteration discipline as [[IvfIndex]] — the
  * k lowest-vec_id vectors seed every subspace, Lloyd rounds are
  * fixed-count, empty cells keep their previous centroid, ties break
  * toward the lowest cell id. Same inputs → same codebook, every run.
  *
  * Scale design (100 TB of vectors):
  *  - training reads a sample (locally: the whole corpus; at scale
  *    ~256·k vectors suffice) and ALL `m` subspaces train in the same
  *    pass — one aggregateByKey keyed by (subspace, cell) per Lloyd
  *    round, not m separate jobs;
  *  - the codebook is m·k·subDim floats (kilobytes) and each query's
  *    ADC table is m·k doubles — both broadcast, never shuffled;
  *  - encoding is a scan-parallel map; the code frame is `m` ints per
  *    vector and would be written bucketBy(vec_id) at rest;
  *  - scoring streams the code frame once per query batch and reduces
  *    to top-k per query (partial TakeOrdered per partition under the
  *    rank filter), so the full distance stream never materializes.
  */
object PqIndex {

  /** Trained codebook: `centroids(mi)(cell)` is the sub-centroid of
    * subspace `mi`. */
  final case class PqModel(centroids: Array[Array[Array[Float]]], subDim: Int)
      extends Serializable {

    def m: Int = centroids.length

    /** PQ code of a NORMALIZED vector: nearest sub-centroid per
      * subspace (ties → lowest cell id). */
    def encode(emb: Array[Float]): Array[Int] =
      Array.tabulate(m) { mi =>
        nearestSub(emb, mi * subDim, centroids(mi))
      }

    /** ADC table of a NORMALIZED query: exact squared L2 from the
      * query's subvector to every sub-centroid. */
    def distTable(q: Array[Float]): Array[Array[Double]] =
      Array.tabulate(m) { mi =>
        centroids(mi).map(c => sqL2(q, mi * subDim, c))
      }

    private def nearestSub(emb: Array[Float], off: Int, cells: Array[Array[Float]]): Int = {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cells.length) {
        val d = sqL2(emb, off, cells(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    private def sqL2(emb: Array[Float], off: Int, cell: Array[Float]): Double = {
      var d = 0.0
      var i = 0
      while (i < cell.length) {
        val x = (if (off + i < emb.length) emb(off + i) else 0f).toDouble - cell(i)
        d += x * x
        i += 1
      }
      d
    }
  }

  /** L2-normalize (zero vectors pass through unscaled). */
  def normalize(v: Array[Float]): Array[Float] = {
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
    val norm = math.sqrt(n)
    if (norm == 0.0) v
    else {
      val out = new Array[Float](v.length)
      i = 0
      while (i < v.length) { out(i) = (v(i) / norm).toFloat; i += 1 }
      out
    }
  }

  private def slice(v: Array[Float], off: Int, len: Int): Array[Float] =
    Array.tabulate(len)(i => if (off + i < v.length) v(off + i) else 0f)

  /** Train the m×k codebook with `iters` Lloyd rounds — all subspaces
    * in one distributed pass per round. */
  def train(corpus: DataFrame, m: Int, k: Int, dim: Int, iters: Int): PqModel = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val vecs = corpus.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    // deterministic seeds: the k lowest-id vectors, sliced per subspace
    val seeds = vecs.orderBy(col("vec_id")).limit(k).collect()
      .sortBy(_._1).map(v => normalize(v._2))
    var cents: Array[Array[Array[Float]]] =
      Array.tabulate(m)(mi => seeds.map(v => slice(v, mi * subDim, subDim)))
    var it = 0
    while (it < iters) {
      val cs = cents
      val model = PqModel(cs, subDim)
      val sums = vecs.rdd.flatMap { case (_, emb0) =>
        val emb = normalize(emb0)
        val code = model.encode(emb)
        (0 until cs.length).iterator.map { mi =>
          ((mi, code(mi)), slice(emb, mi * subDim, subDim))
        }
      }.aggregateByKey((new Array[Double](subDim), 0L))(
        seqOp = { case ((acc, n), sv) =>
          var i = 0
          while (i < subDim) { acc(i) += sv(i); i += 1 }
          (acc, n + 1)
        },
        combOp = { case ((a, na), (b, nb)) =>
          var i = 0
          while (i < subDim) { a(i) += b(i); i += 1 }
          (a, na + nb)
        })
        .collect()
      // empty cells keep their previous centroid (deterministic, and
      // the cell stays probeable instead of collapsing the codebook)
      val next = cents.map(_.map(_.clone()))
      sums.foreach { case ((mi, c), (sum, n)) =>
        next(mi)(c) = sum.map(v => (v / n).toFloat)
      }
      cents = next
      it += 1
    }
    PqModel(cents, subDim)
  }

  /** Top-k per query: ADC shortlist over the PQ codes, then EXACT
    * cosine re-rank of the shortlist — the standard ADC-with-
    * refinement layout (a 32-bit code alone cannot resolve the final
    * ordering; it only has to keep the true neighbours inside the
    * `shortlist`-sized candidate set, which the exact pass then
    * re-ranks from the full vectors). At scale the shortlist join
    * reads `shortlist` vectors per query from the (bucketed) corpus —
    * the float vectors stay out of the scan entirely.
    *
    * Output: (qid, vec_id, sim, rk) — exact cosine, rk 1-based
    * descending sim (vec_id tiebreak), self-matches excluded.
    */
  def topK(
      spark: SparkSession,
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      m: Int = 8,
      kSub: Int = 16,
      dim: Int = 64,
      iters: Int = 4,
      shortlist: Int = 100): DataFrame = {
    import spark.implicits._
    val model = train(corpus, m, kSub, dim, iters)
    val codes = corpus.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, emb) => (id, model.encode(normalize(emb))) }
    // query side is batch-small (the q25 contract): ADC tables are
    // m·k doubles per query, broadcast to the code scan
    val qvecs = queries.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val tables = qvecs.map { case (qid, q) => (qid, model.distTable(normalize(q))) }
    val bc = spark.sparkContext.broadcast(tables)
    val scored = codes.flatMap { case (vid, code) =>
      bc.value.iterator.filter(_._1 != vid).map { case (qid, tab) =>
        var d = 0.0
        var mi = 0
        while (mi < code.length) { d += tab(mi)(code(mi)); mi += 1 }
        (qid, vid, d)
      }
    }.toDF("qid", "vec_id", "adist")
    val wa = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("vec_id").asc)
    val cand = scored
      .withColumn("ark", row_number().over(wa))
      .filter(col("ark") <= shortlist)
      .select(col("qid"), col("vec_id"))
    // exact re-rank: shortlist·|queries| rows join back their float
    // vectors (hash-equi on vec_id; bucket-pruned when the corpus is
    // written bucketBy(vec_id)), queries broadcast
    val bq = spark.sparkContext.broadcast(qvecs.toMap)
    val exact = cand
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .as[(Long, Long, Array[Float])]
      .map { case (vid, qid, emb) =>
        val q = bq.value(qid)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        val n = math.min(q.length, emb.length)
        while (i < n) {
          dot += q(i).toDouble * emb(i); na += q(i).toDouble * q(i); nb += emb(i).toDouble * emb(i)
          i += 1
        }
        (qid, vid, dot / (math.sqrt(na) * math.sqrt(nb)))
      }.toDF("qid", "vec_id", "sim")
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id").asc)
    exact
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }
}
