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
      bits: Int = 16): Unit =
    write(df, Seq(xCol, yCol), path, numFiles, bits)

  /** N-column form (Delta's OPTIMIZE ZORDER takes any column list):
    * each key min–max scales to [0, 2^bits) and interleaves via
    * [[graft.queries.TrainPrep.zInterleaveN]] — column j's bit i at z
    * position n·i + j, so every key gets equal say in every file
    * boundary. `bits = 0` auto-sizes to min(16, 63/n). More columns
    * dilute per-key pruning (each file bounds each key to ~2^(bits −
    * log₂(files)/n) of its domain) — the standard 2-to-4-column
    * guidance applies.
    */
  def write(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      numFiles: Int,
      bits: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val b = if (bits > 0) bits else math.min(16, 63 / cols.size)
    val aggCols = cols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val stats = df.agg(aggCols.head, aggCols.tail: _*).head()
    val top = (1L << b) - 1
    def scaled(c: String, lo: Long, hi: Long): String =
      if (hi == lo) "0" else s"(($c - ${lo}L) * ${top}L) div ${hi - lo}L"
    val withScaled = cols.zipWithIndex.foldLeft(df) { case (d, (c, j)) =>
      d.withColumn(s"__zs$j",
        expr(scaled(c, stats.getLong(2 * j), stats.getLong(2 * j + 1))))
    }
    val scaledNames = cols.indices.map(j => s"__zs$j")
    withScaled
      .withColumn("__z",
        expr(graft.queries.TrainPrep.zInterleaveN(scaledNames, "div", b)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop(scaledNames :+ "__z": _*)
      .write.mode("overwrite").parquet(path)
  }
}
