package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    if (stats.isNullAt(0)) {
      // zero input rows (an empty drop re-clustered, say): there is
      // nothing to scale or sort — write the empty frame + manifest
      // instead of NPE-ing on the null min/max stats
      df.write.mode("overwrite").parquet(path)
      val spark0 = df.sparkSession
      val fs0 = new Path(path).getFileSystem(spark0.sparkContext.hadoopConfiguration)
      writeManifest(fs0, new Path(path), dataFiles(fs0, new Path(path)))
      return
    }
    val top = (1L << b) - 1
    // two overflow-safe forms (round-9 review: the plain
    // (c−lo)·top÷width wraps negative once width·top exceeds 2⁶³ —
    // e.g. 60-bit md5-derived keys — and the z-values become
    // non-monotonic noise with every file spanning the full domain):
    // narrow domains keep the full-resolution multiply; wide domains
    // step-divide ((c−lo) div (width div (top+1) + 1) ∈ [0, top] with
    // no multiplication at all)
    def scaled(c: String, lo: Long, hi: Long): String = {
      require(hi - lo >= 0,
        s"z-order key domain [$lo, $hi] wider than 2^63 — split the key first")
      val width = hi - lo
      if (width == 0L) "0"
      else if (width <= Long.MaxValue / top)
        s"(($c - ${lo}L) * ${top}L) div ${width}L"
      else s"($c - ${lo}L) div ${width / (top + 1) + 1}L"
    }
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
    val spark = df.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    writeManifest(fs, new Path(path), dataFiles(fs, new Path(path)))
  }

  /** Fast-ingest append: new rows land as plain unsorted part files in
    * the layout directory (no exchange, no sort — the write a streaming
    * or daily drop actually pays). The appended files' footer stats are
    * ~global, so they hit every pruning window until [[recluster]]
    * folds them into a z-ordered generation — the Delta `OPTIMIZE
    * ZORDER` cadence: ingest cheap, re-cluster on a schedule.
    */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Re-cluster ONLY the files appended since the last [[write]] /
    * [[recluster]] (tracked in an underscore-prefixed manifest the
    * parquet reader ignores): z-order the appended subset into its own
    * file generation and publish via [[Layouts.publish]]'s staged
    * rename. Cost is O(appended bytes) + rename-moves of the already-
    * clustered files — the clustered generations are never re-read or
    * re-sorted. Each generation's files carry tight per-file min/max
    * on every clustering key, so scans prune all generations.
    *
    * Returns the number of raw files folded in (0 = no-op, nothing
    * appended). Crash-safe: the staging dir's own manifest is the
    * commit point of the new generation's write, so a re-run after a
    * crash RESUMES instead of destroying staged state — a staging dir
    * WITHOUT a manifest means the z-write itself died (no clustered
    * file has moved yet; discard and redo), one WITH a manifest means
    * the write completed (finish moving the clustered generations in
    * and publish; the rewrite of appended data is skipped). An
    * object-store deployment publishes under a NEW path and flips a
    * pointer instead, exactly as documented on
    * [[Layouts.compactPartitioned]].
    */
  def recluster(
      spark: SparkSession,
      path: String,
      cols: Seq[String],
      numFiles: Int,
      bits: Int = 16): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a previous run may have died INSIDE Layouts.publish (original
    // staged aside, replacement never renamed in) — restore before
    // listing, or everything below throws path-not-found
    Layouts.recoverPublished(spark, path)
    val tmp = new Path(path + "__recluster_tmp")
    val srcSidecar = new Path(tmp, SourcesName)
    val clustered = readManifest(fs, p)
    val appended = dataFiles(fs, p).filterNot(clustered.contains)
    // the sources sidecar is the resume point: it is written only after
    // the staged z-write (data + manifest) fully completed, and the
    // clustered-generation moves only start after it exists — so its
    // absence proves nothing has left the live layout yet
    val staged = Layouts.readSidecar(fs, srcSidecar)
      .map(_.linesIterator.filter(_.nonEmpty).toSeq)
    val sources: Seq[String] = staged.getOrElse {
      if (appended.isEmpty) return 0
      fs.delete(tmp, true) // at most a crashed, never-referenced z-write
      // z-order the appended subset into the staging dir (scaling
      // stats come from the subset itself: footer pruning is on raw
      // values, so generations need not share a z domain)
      write(spark.read.parquet(appended.map(n => s"$path/$n"): _*),
        cols, tmp.toString, numFiles, bits)
      Layouts.writeSidecar(fs, srcSidecar, appended.mkString("\n") + "\n")
      appended
    }
    // move EVERYTHING currently live except the source files the new
    // generation replaces — re-listing here (not reusing the entry
    // listing) catches raw files appended while the staged z-write
    // ran, which the publish would otherwise silently delete
    // (round-9 review); anything moved that is not in the clustered
    // manifest is carried un-clustered, stays out of the new
    // manifest, and re-clusters next time. The residual window is the
    // instant between this listing and the publish rename — the same
    // single-maintainer-at-a-time contract as every non-transactional
    // layout here.
    val moveSet = dataFiles(fs, p).filterNot(sources.toSet)
    val carried = moveSet.filterNot(clustered.contains)
    moveSet.foreach { n =>
      require(fs.rename(new Path(p, n), new Path(tmp, n)),
        s"recluster: cannot stage $n")
    }
    writeManifest(fs, tmp, dataFiles(fs, tmp).filterNot(carried.toSet))
    Layouts.publish(spark, path, tmp.toString)
    sources.size
  }

  private val SourcesName = "_zorder_sources"

  private val ManifestName = "_zorder_manifest"

  private def dataFiles(fs: FileSystem, dir: Path): Seq[String] =
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).sorted

  private def writeManifest(fs: FileSystem, dir: Path, names: Seq[String]): Unit = {
    val out = fs.create(new Path(dir, ManifestName), true)
    try out.write((names.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readManifest(fs: FileSystem, dir: Path): Set[String] = {
    val f = new Path(dir, ManifestName)
    if (!fs.exists(f)) Set.empty
    else {
      val in = fs.open(f)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toSet
      finally in.close()
    }
  }
}
