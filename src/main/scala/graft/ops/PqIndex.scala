package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
  * toward the lowest cell id. Per-partition partial sums accumulate in
  * row order and are folded on the driver in sorted (subspace, cell,
  * partition) order, so no double addition ever depends on shuffle-
  * fetch order — same inputs → bit-identical codebook, every run
  * (PqSpec pins run-over-run equality).
  *
  * Scale design (100 TB of vectors):
  *  - training reads a sample (`train(trainSample = …)` — the
  *    deterministic content-addressed [[TrainSample]]; ~256·k vectors
  *    suffice for k-means quality) and ALL `m` subspaces train in the
  *    same pass — one partial-sum scan keyed by (subspace, cell) per
  *    Lloyd round, not m separate jobs; the collected partials are
  *    numPartitions × m × k rows of subDim doubles — kilobytes;
  *  - the codebook is m·k·subDim floats (kilobytes) and each query's
  *    ADC table is m·k doubles — both broadcast, never shuffled;
  *  - encoding is a scan-parallel map; [[save]] writes the code frame
  *    bucketBy(vec_id) at rest (the layout [[topKFromSaved]] probes)
  *    with the codebook alongside as a plain kilobyte-sized table;
  *  - scoring streams the code frame once per query batch and keeps a
  *    bounded per-query heap per partition, so only
  *    numPartitions × |queries| × shortlist candidate rows ever reach
  *    a shuffle — the full |corpus|×|queries| distance stream never
  *    materializes.
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
    * in one distributed pass per round. Partial (sum, count) pairs are
    * produced per partition in vec_id order (buffered — arrival order
    * is shuffle-fetch order and must not matter) and combined on the
    * driver in sorted (subspace, cell, partition) order: a fixed-shape
    * reduction, never the shuffle-fetch-ordered double sum that made
    * the old aggregateByKey form a latent determinism flake.
    *
    * `trainSample > 0` trains on that many [[TrainSample]]-selected
    * vectors instead of the whole corpus — the 100 TB path (k-means
    * quality needs ~256·k vectors; the Lloyd scans then touch a
    * dimension-sized frame, not the corpus).
    *
    * `normalizeInput = false` trains on the vectors AS GIVEN — the
    * residual-PQ path ([[IvfPq]]), where inputs are already residuals
    * of unit vectors and re-normalizing would distort the geometry.
    */
  def train(
      corpus: DataFrame,
      m: Int,
      k: Int,
      dim: Int,
      iters: Int,
      trainSample: Int = 0,
      normalizeInput: Boolean = true): PqModel = {
    // a remainder would silently fall outside every subspace: codes
    // and ADC tables would ignore the tail components and recall
    // would erode with no error (round-9 review) — fail loudly
    require(dim % m == 0,
      s"dim=$dim not divisible by m=$m subspaces — the trailing " +
        s"${dim % m} components would be silently ignored")
    val spark = corpus.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val prep: Array[Float] => Array[Float] =
      if (normalizeInput) normalize else identity
    val vecs = TrainSample.sample(
      corpus.select(col("vec_id"), col("embedding")), trainSample)
      .as[(Long, Array[Float])]
    // deterministic seeds: the k lowest-id vectors, sliced per subspace
    val seeds = vecs.orderBy(col("vec_id")).limit(k).collect()
      .sortBy(_._1).map(v => prep(v._2))
    var cents: Array[Array[Array[Float]]] =
      Array.tabulate(m)(mi => seeds.map(v => slice(v, mi * subDim, subDim)))
    var it = 0
    while (it < iters) {
      val cs = cents
      val model = PqModel(cs, subDim)
      val mLocal = cs.length
      // fold each partition in vec_id order, not arrival order:
      // shuffle-fed inputs (IvfPq residuals pass through a repartition)
      // arrive in fetch order, which varies run-over-run even when
      // partition membership is fixed — an unbuffered fold would drift
      // centroids by an ULP and flip encode() assignments. Buffering is
      // bounded: partitions are dimension-sized under trainSample.
      val partials = vecs.rdd.mapPartitionsWithIndex { (pid, rows) =>
        val acc = scala.collection.mutable.HashMap
          .empty[(Int, Int), (Array[Double], Array[Long])]
        rows.toArray.sortBy(_._1).foreach { case (_, emb0) =>
          val emb = prep(emb0)
          val code = model.encode(emb)
          var mi = 0
          while (mi < mLocal) {
            val slot = acc.getOrElseUpdate(
              (mi, code(mi)), (new Array[Double](subDim), new Array[Long](1)))
            val off = mi * subDim
            var i = 0
            while (i < subDim) {
              slot._1(i) += (if (off + i < emb.length) emb(off + i) else 0f).toDouble
              i += 1
            }
            slot._2(0) += 1L
            mi += 1
          }
        }
        acc.iterator.map { case ((mi, c), (sum, n)) => (mi, c, pid, sum, n(0)) }
      }.collect()
      // empty cells keep their previous centroid (deterministic, and
      // the cell stays probeable instead of collapsing the codebook)
      val next = cents.map(_.map(_.clone()))
      val sorted = partials.sortBy { case (mi, c, pid, _, _) => (mi, c, pid) }
      var idx = 0
      while (idx < sorted.length) {
        val mi = sorted(idx)._1
        val c = sorted(idx)._2
        val sum = new Array[Double](subDim)
        var n = 0L
        while (idx < sorted.length && sorted(idx)._1 == mi && sorted(idx)._2 == c) {
          val p = sorted(idx)
          var i = 0
          while (i < subDim) { sum(i) += p._4(i); i += 1 }
          n += p._5
          idx += 1
        }
        if (n > 0L) next(mi)(c) = sum.map(v => (v / n).toFloat)
      }
      cents = next
      it += 1
    }
    PqModel(cents, subDim)
  }

  /** ADC shortlist with a bounded per-query heap per partition: each
    * input partition keeps only its `shortlist` best (adist, vec_id)
    * per query, so the shuffle that feeds the global rank carries
    * numPartitions × |queries| × shortlist rows instead of the full
    * |corpus| × |queries| distance stream. Selection by the total
    * order (adist asc, vec_id asc) commutes across partitions, so the
    * surviving global top-`shortlist` is bit-identical to ranking the
    * unreduced stream.
    */
  private def adcShortlist(
      codes: Dataset[(Long, Array[Int])],
      bc: Broadcast[Array[(Long, Array[Array[Double]])]],
      shortlist: Int): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val scored = codes.mapPartitions { it =>
      val tabs = bc.value
      val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
      // max-heaps: head = current worst kept candidate per query
      val heaps = Array.fill(tabs.length)(
        new scala.collection.mutable.PriorityQueue[(Double, Long)]()(ord))
      it.foreach { case (vid, code) =>
        var qi = 0
        while (qi < tabs.length) {
          val qid = tabs(qi)._1
          if (qid != vid) {
            val tab = tabs(qi)._2
            var d = 0.0
            var mi = 0
            while (mi < code.length) { d += tab(mi)(code(mi)); mi += 1 }
            val h = heaps(qi)
            if (h.size < shortlist) h.enqueue((d, vid))
            else if (ord.lt((d, vid), h.head)) { h.dequeue(); h.enqueue((d, vid)) }
          }
          qi += 1
        }
      }
      tabs.iterator.zipWithIndex.flatMap { case ((qid, _), qi) =>
        heaps(qi).iterator.map { case (d, vid) => (qid, vid, d) }
      }
    }.toDF("qid", "vec_id", "adist")
    val wa = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("vec_id").asc)
    scored
      .withColumn("ark", row_number().over(wa))
      .filter(col("ark") <= shortlist)
      .select(col("qid"), col("vec_id"))
  }

  /** Exact cosine re-rank of a (qid, vec_id) shortlist: the shortlist
    * is dimension-sized (|queries| × shortlist rows) and broadcast, so
    * the corpus side streams its scan — bucket-prunable when the
    * vectors are at rest — with no exchange.
    */
  private[ops] def rerankExact(
      spark: SparkSession,
      corpus: DataFrame,
      cand: DataFrame,
      qvecs: Array[(Long, Array[Float])],
      k: Int): DataFrame = {
    import spark.implicits._
    val bq = spark.sparkContext.broadcast(qvecs.toMap)
    val exact = corpus.select(col("vec_id"), col("embedding"))
      .join(broadcast(cand), "vec_id")
      .select(col("qid"), col("vec_id"), col("embedding"))
      .as[(Long, Long, Array[Float])]
      .map { case (qid, vid, emb) =>
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
    rerankExact(spark, corpus, adcShortlist(codes, bc, shortlist), qvecs, k)
  }

  /** Persist the trained index at rest: the code frame — `m` ints per
    * vector, the 64×-compressed scan side — written
    * `bucketBy(vec_id)`, and the codebook as a plain (mi, cell, vals)
    * table (m·k rows, kilobytes). This is the layout the scaladoc
    * header promises and [[topKFromSaved]] probes: ADC scoring scans
    * the saved codes directly (no re-encode, no exchange below the
    * per-partition reduction), and the bucketing keeps any id-equi
    * join against the codes bucket-local.
    */
  def save(
      corpus: DataFrame,
      model: PqModel,
      codesTable: String,
      codebookTable: String,
      numBuckets: Int = 16): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, emb) => (id, model.encode(normalize(emb))) }
      .toDF("vec_id", "code")
      .write.mode("overwrite")
      .bucketBy(numBuckets, "vec_id").sortBy("vec_id")
      .saveAsTable(codesTable)
    model.centroids.indices.flatMap { mi =>
      model.centroids(mi).indices.map(c => (mi, c, model.centroids(mi)(c).toSeq))
    }.toDF("mi", "cell", "vals")
      .write.mode("overwrite").saveAsTable(codebookTable)
  }

  /** Rebuild the [[PqModel]] from a [[save]]d codebook table. */
  def loadModel(spark: SparkSession, codebookTable: String): PqModel = {
    import spark.implicits._
    val rows = spark.table(codebookTable)
      .select(col("mi"), col("cell"), col("vals"))
      .as[(Int, Int, Array[Float])].collect()
    val cents = Array.tabulate(rows.map(_._1).max + 1) { mi =>
      rows.filter(_._1 == mi).sortBy(_._2).map(_._3)
    }
    PqModel(cents, cents(0)(0).length)
  }

  /** Probe a [[save]]d index: ADC-score the persisted code frame
    * (scanned as-is — encoding never re-runs), per-partition bounded
    * top-`shortlist`, then exact re-rank against the float corpus with
    * the shortlist broadcast. Same output contract as [[topK]], and
    * bit-identical to it when the saved model came from the same
    * corpus/params (training is deterministic).
    */
  def topKFromSaved(
      spark: SparkSession,
      codesTable: String,
      codebookTable: String,
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      shortlist: Int = 100): DataFrame = {
    import spark.implicits._
    val model = loadModel(spark, codebookTable)
    val codes = spark.table(codesTable)
      .select(col("vec_id"), col("code")).as[(Long, Array[Int])]
    val qvecs = queries.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val tables = qvecs.map { case (qid, q) => (qid, model.distTable(normalize(q))) }
    val bc = spark.sparkContext.broadcast(tables)
    rerankExact(spark, corpus, adcShortlist(codes, bc, shortlist), qvecs, k)
  }
}
