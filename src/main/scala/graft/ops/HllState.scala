package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distinct-count sketch state AT REST — HyperLogLog register tables
  * (Flajolet et al. 2007) persisted as data, not opaque bytes: the
  * incremental distinct-counting layer beside [[Lsh.saveBands]] (set
  * membership), [[WinnowState]] (substring mass) and
  * [[ConnectedComponents.updateLabels]] (cluster labels). A daily
  * drop's registers max-merge into the corpus state in O(|batch| +
  * m) and the merged table is EXACTLY the table a full rebuild
  * produces — register tables are deterministic functions of the
  * value SET, so increment ≡ rebuild is a bit-equality claim here
  * (HllStateSpec), not an approximation statement; only the final
  * cardinality estimate is approximate (σ ≈ 1.04/√m).
  *
  * Register discipline (engine-neutral, DuckDB-replayable): h = first
  * 60 bits of md5(value) (the [[graft.functions.MinHashLongs]]/
  * Md5Hash60 convention); register index = top p bits; rho = position
  * of the first 1-bit in the remaining W = 60−p bits (W+1 when they
  * are all zero), computed EXACTLY as `W − length(bin(rest)) + 1` —
  * a string-length bit-length, no floating log. The per-key summary
  * ([[summary]]) stays in exact integers: V = zero registers, sumint
  * = Σ 2^(W+1−rho) (the harmonic sum scaled by 2^(W+1); < 2^61 for
  * p ≥ 8, always inside a signed BIGINT) — so q116 hash-matches the
  * oracle, and only [[estimate]] leaves integer land with one
  * division and the standard small-range correction.
  *
  * State shape: a [[Layouts.liveChildren]] child-dir layout of (key,
  * reg, rho) rows — `base` from [[save]], `b<id>` per drop, folded by
  * [[compact]] (which max-merges, not just concatenates). Max-merge
  * is IDEMPOTENT (max(x, x) = x), so unlike the curation/winnow
  * states a replayed drop needs no own-child exclusion: re-adding a
  * batch — even reading a crashed attempt's own commit — cannot
  * change the merged registers.
  *
  * 100 TB shape: the corpus-sized work is one map-side-combinable
  * aggregate over the batch (partials are ≤ m rows per key per
  * partition); state scans are ≤ m rows per key per child. Nothing
  * corpus-sized ever re-reads.
  */
object HllState {

  /** (key, reg, rho) register frame of `df`'s string `valCol`, keyed
    * by `keyCol` — max-aggregated, so ≤ 2^p rows per key.
    */
  def registers(df: DataFrame, keyCol: String, valCol: String, p: Int = 12): DataFrame = {
    require(p >= 8 && p <= 16, s"precision p=$p outside [8, 16]")
    val w = 60 - p
    // NULL values contribute nothing to a distinct count — and
    // md5(NULL) is NULL, which would otherwise mint a phantom
    // (key, null, null) register row that inflates n_regs and
    // shrinks V, skewing summary AND estimate (round-9 review)
    df.filter(col(valCol).isNotNull)
      .select(col(keyCol).as("key"),
      expr(s"CAST(conv(substr(md5($valCol), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .select(col("key"),
        expr(s"h div ${1L << w}L").as("reg"),
        expr(s"h % ${1L << w}L").as("rest"))
      .select(col("key"), col("reg"),
        expr(s"CASE WHEN rest = 0 THEN ${w + 1} " +
          s"ELSE $w - length(bin(rest)) + 1 END").cast("int").as("rho"))
      .groupBy(col("key"), col("reg"))
      .agg(max(col("rho")).as("rho"))
  }

  /** Build the state from the current corpus; `p` freezes with it. */
  def save(df: DataFrame, dir: String, keyCol: String, valCol: String, p: Int = 12): Unit = {
    val spark = df.sparkSession
    registers(df, keyCol, valCol, p)
      .write.mode("overwrite").parquet(s"$dir/regs/base")
    val pp = new Path(s"$dir/_p")
    Layouts.writeSidecar(
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration), pp, s"$p\n")
  }

  /** Fold a drop's registers in under the frozen precision — one
    * idempotent child overwrite per `batchId` (or a flat append into
    * `base` for batch-mode use).
    */
  def add(batch: DataFrame, dir: String, keyCol: String, valCol: String,
      batchId: Option[Long] = None): Unit = {
    val spark = batch.sparkSession
    val regs = registers(batch, keyCol, valCol, precision(spark, dir))
    batchId match {
      case Some(id) => regs.write.mode("overwrite").parquet(s"$dir/regs/b$id")
      case None => regs.write.mode("append").parquet(s"$dir/regs/base")
    }
  }

  /** The merged register table — max per (key, reg) across children. */
  def merged(spark: SparkSession, dir: String): DataFrame =
    Layouts.readChildren(spark, s"$dir/regs", "key STRING, reg BIGINT, rho INT")
      .groupBy(col("key"), col("reg"))
      .agg(max(col("rho")).as("rho"))

  /** Exact-integer per-key summary: live register count, zero-register
    * count V, and sumint = Σ 2^(W+1−rho) — the harmonic denominator
    * scaled to an exact BIGINT. This is q116's oracle-checked output.
    */
  def summary(spark: SparkSession, dir: String): DataFrame = {
    val p = precision(spark, dir)
    val w = 60 - p
    val m = 1L << p
    merged(spark, dir)
      .groupBy(col("key"))
      .agg(
        count(lit(1)).cast("long").as("n_regs"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${w + 1} - rho)")).as("sumint"))
      .select(col("key"), col("n_regs"), (lit(m) - col("n_regs")).as("v"), col("sumint"))
  }

  /** Per-key cardinality estimate: raw = α_m·m²/Z with Z from the
    * exact integer sum (zero registers contribute 2^0 = 1 each), and
    * linear counting below 2.5·m — the standard small-range
    * correction. The 60-bit hash space needs no large-range one.
    */
  def estimate(spark: SparkSession, dir: String): DataFrame = {
    val p = precision(spark, dir)
    val w = 60 - p
    val m = 1L << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    summary(spark, dir)
      .select(col("key"), col("v"),
        expr(s"CAST(sumint + v * shiftleft(CAST(1 AS BIGINT), ${w + 1}) AS DOUBLE) " +
          s"/ CAST(shiftleft(CAST(1 AS BIGINT), ${w + 1}) AS DOUBLE)").as("z"))
      .select(col("key"), col("v"), (lit(alpha * m.toDouble * m.toDouble) / col("z")).as("raw"))
      .select(col("key"),
        when(col("raw") <= 2.5 * m && col("v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
          .otherwise(col("raw")).as("n_est"))
  }

  /** Fold the children and MAX-MERGE while folding, so the state
    * returns to ≤ m rows per key — [[Layouts.foldChildren]]'s
    * crash-safe protocol with the merge as the fold transform.
    */
  def compact(spark: SparkSession, dir: String): Unit =
    Layouts.foldChildren(spark, s"$dir/regs",
      _.groupBy(col("key"), col("reg")).agg(max(col("rho")).as("rho")))

  private[graft] def precision(spark: SparkSession, dir: String): Int = {
    val pp = new Path(s"$dir/_p")
    Layouts.readSidecar(
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration), pp)
      .map(_.trim.toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"no HLL state at $dir — run HllState.save first"))
  }
}
