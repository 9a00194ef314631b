package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Point-frequency sketch state AT REST — Count-Min counter tables
  * (Cormode & Muthukrishnan 2005) persisted as data, completing the
  * approximate-aggregate family (q37 HLL distincts, q72 quantile
  * sketch, q111 Misra–Gries heavy hitters; this = "how often did THIS
  * item occur" over a stream too large for an exact vocabulary
  * table). d hash rows × w buckets of exact BIGINT counts; a point
  * estimate is min over the d counters an item maps to —
  * never an undercount, overcount ≤ εn with ε = e/w at confidence
  * 1 − e^−d.
  *
  * Everything is exact integers: bucket = first-60-bits-of-md5(row
  * salt ‖ value) mod w (the engine's h60 convention, DuckDB-
  * replayable), counters are SUMs, estimates are MINs of BIGINTs — so
  * unlike the HLL estimate, even the ESTIMATE hash-matches the oracle
  * (q123 checks estimates against DuckDB end to end, alongside the
  * exact counts that pin the overcount bound).
  *
  * State shape mirrors [[HllState]]: a [[Layouts.liveChildren]]
  * child-dir layout of (key, j, c, cnt) rows — `base` from [[save]],
  * `b<id>` per drop, merged by SUM. Sum-merge is NOT idempotent
  * (unlike HLL's max), but the per-batch idempotent child overwrite
  * makes replays safe anyway: a replayed drop rewrites ITS OWN child
  * with identical rows, and the sum over children is unchanged —
  * the StreamTopK lesson, solved by layout instead of generations.
  * Increment ≡ rebuild is again BIT equality: counter tables are
  * deterministic functions of the value MULTISET.
  *
  * 100 TB shape: the corpus-sized work is one map-side-combinable
  * count per (key, j, c) — partials ≤ d·w rows per key per
  * partition; probes join a ≤ d·w-per-key frame that broadcasts.
  */
object CmsState {

  /** (key, j, c, cnt) counter frame of `df`'s string `valCol`, keyed
    * by `keyCol`: d independent md5 rows (salted by j), w buckets,
    * exact BIGINT counts — ≤ d·w rows per key.
    */
  def counters(df: DataFrame, keyCol: String, valCol: String,
      d: Int = 4, w: Int = 1024): DataFrame = {
    require(d >= 1 && d <= 8, s"depth d=$d outside [1, 8]")
    require(w >= 16 && (w & (w - 1)) == 0, s"width w=$w not a power of two >= 16")
    // NULLs hash to a NULL bucket (phantom counter row; probes never
    // match it) — a NULL value is no occurrence of anything, drop it
    df.filter(col(valCol).isNotNull)
      .select(col(keyCol).as("key"), col(valCol).as("v"))
      .select(col("key"), explode(expr(s"sequence(0, ${d - 1})")).as("j"), col("v"))
      .select(col("key"), col("j"), bucketCol(w).as("c"))
      .groupBy(col("key"), col("j"), col("c"))
      .agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** Build the state from the current corpus; (d, w) freeze with it. */
  def save(df: DataFrame, dir: String, keyCol: String, valCol: String,
      d: Int = 4, w: Int = 1024): Unit = {
    val spark = df.sparkSession
    counters(df, keyCol, valCol, d, w)
      .write.mode("overwrite").parquet(s"$dir/cnts/base")
    val pp = new Path(s"$dir/_dw")
    Layouts.writeSidecar(
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration), pp, s"$d $w\n")
  }

  /** Fold a drop in under the frozen geometry — one idempotent child
    * overwrite per `batchId` (replay-safe), or a flat append.
    */
  def add(batch: DataFrame, dir: String, keyCol: String, valCol: String,
      batchId: Option[Long] = None): Unit = {
    val (d, w) = geometry(batch.sparkSession, dir)
    val cs = counters(batch, keyCol, valCol, d, w)
    batchId match {
      case Some(id) => cs.write.mode("overwrite").parquet(s"$dir/cnts/b$id")
      case None => cs.write.mode("append").parquet(s"$dir/cnts/base")
    }
  }

  /** The merged counter table — SUM per (key, j, c) across children. */
  def merged(spark: SparkSession, dir: String): DataFrame =
    Layouts.readChildren(spark, s"$dir/cnts", "key STRING, j INT, c BIGINT, cnt BIGINT")
      .groupBy(col("key"), col("j"), col("c"))
      .agg(sum(col("cnt")).as("cnt"))

  /** The (row-salt, value) → bucket hash — ONE definition shared by
    * [[counters]] and [[probe]]: the sketch's never-undercount
    * invariant holds only while both sides hash identically, so the
    * expression must not exist twice (the h60/h60Sql factoring rule).
    * Expects `j` and `v` columns in scope.
    */
  private def bucketCol(w: Int) =
    expr(s"CAST(conv(substr(md5(concat(CAST(j AS STRING), '|', v)), 1, 15), 16, 10) AS BIGINT) % $w")

  /** Point estimates for `items` (key, v) against a counter frame:
    * min over the d counters — 0 for never-seen buckets. With
    * `broadcastCnts` (the default) the counter frame broadcasts
    * (≤ d·w rows per key) and probing is scan-local — the BOUNDED
    * key-domain contract (languages, sources, dates); pass false for
    * an unbounded key domain and the (key, j, c) hash-equi join
    * shuffles the d probe rows per item instead.
    */
  def probe(items: DataFrame, cnts: DataFrame, d: Int, w: Int,
      broadcastCnts: Boolean = true): DataFrame =
    items
      .select(col("key"), col("v"), explode(expr(s"sequence(0, ${d - 1})")).as("j"))
      .select(col("key"), col("v"), col("j"), bucketCol(w).as("c"))
      .join(if (broadcastCnts) broadcast(cnts) else cnts, Seq("key", "j", "c"), "left")
      .groupBy(col("key"), col("v"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** [[probe]] against the persisted merged state. */
  def pointEstimate(spark: SparkSession, dir: String, items: DataFrame): DataFrame = {
    val (d, w) = geometry(spark, dir)
    probe(items, merged(spark, dir), d, w)
  }

  /** Fold the children and SUM while folding, back to ≤ d·w rows per
    * key — [[Layouts.foldChildren]]'s crash-safe protocol. SUM-merge
    * is not idempotent, so when a stream maintains this root pass the
    * checkpoint-committed bound (or compact only after a clean stop):
    * folding a crashed attempt's own child and then replaying it
    * would double-count (foldChildren's contract).
    */
  def compact(spark: SparkSession, dir: String,
      beforeBatch: Option[Long] = None): Unit =
    Layouts.foldChildren(spark, s"$dir/cnts",
      _.groupBy(col("key"), col("j"), col("c")).agg(sum(col("cnt")).as("cnt")),
      beforeBatch = beforeBatch)

  private[graft] def geometry(spark: SparkSession, dir: String): (Int, Int) = {
    val pp = new Path(s"$dir/_dw")
    Layouts.readSidecar(
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration), pp)
      .map { s => val a = s.trim.split(" "); (a(0).toInt, a(1).toInt) }
      .getOrElse(throw new IllegalArgumentException(
        s"no CMS state at $dir — run CmsState.save first"))
  }
}
