package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order write path — the operator that PRODUCES the layout q103
  * proves the bound for (Delta/Iceberg's OPTIMIZE ZORDER primitive,
  * re-expressed as a plain Spark write). Interleave the bits of two
  * clustering keys into a Morton z-value, range-partition on z (one
  * task → one file per z-range), and sort within each partition so
  * row-group statistics inside every file are tight too. Each written
  * file then carries tight min/max footer statistics on BOTH keys at
  * once, so a single-column predicate on EITHER key prunes files at
  * scan time — a single-column sort gives that for one key only
  * (ZOrderSpec measures both layouts' footer stats on disk).
  *
  * Cost shape at 100 TB: ONE repartitionByRange exchange + an
  * in-partition sort — exactly the exchange any sorted write pays; the
  * z computation is pure integer arithmetic in the scan. `numFiles`
  * sizes the range partitioning: target ~file-system-block-sized files
  * (128–1024 MB) — at the test SFs a small count keeps per-file stats
  * meaningful.
  */
object ZOrder {

  /** Write `df` z-ordered on integer key columns (`xCol`, `yCol`).
    *
    * Each key is min–max scaled to the full [0, 2^bits) domain before
    * interleaving (one cheap stats agg). This is NOT cosmetic: with
    * raw keys of unequal width — lineitem's ~11-bit partkey vs ~7-bit
    * suppkey — the z-value's high bits all come from the wider key, a
    * range partition on z degenerates to a single-column sort, and the
    * narrow key's per-file bounds go global (the first cut of
    * ZOrderSpec measured exactly that: 16/16 files hit on y). Scaling
    * gives both keys equal say in every bit position — the same reason
    * Delta's OPTIMIZE ZORDER interleaves per-column range-partition
    * ids, not raw values.
    */
  def write(
      df: DataFrame,
      xCol: String,
      yCol: String,
      path: String,
      numFiles: Int,
      bits: Int = 16): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val r = df.agg(
      min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
    val (xLo, xHi, yLo, yHi) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val top = (1L << bits) - 1
    def scaled(c: String, lo: Long, hi: Long): String =
      if (hi == lo) "0" else s"(($c - ${lo}L) * ${top}L) div ${hi - lo}L"
    df.withColumn("__xs", expr(scaled(xCol, xLo, xHi)))
      .withColumn("__ys", expr(scaled(yCol, yLo, yHi)))
      .withColumn("__z",
        expr(graft.queries.TrainPrep.zInterleave("__xs", "__ys", "div", bits)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__xs", "__ys", "__z")
      .write.mode("overwrite").parquet(path)
  }
}
