package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance for partitionBy-at-rest parquet layouts (the
  * [[IvfIndex.save]] / [[IvfPq.save]] form). `appendSaved` writes one
  * parquet file set per append into each partition directory — a daily
  * drop × 365 leaves hundreds of small files per cell, and the
  * listing/open tax lands exactly on the pruned-read path the layout
  * exists for. [[compactPartitioned]] rewrites the layout so each
  * partition directory holds ONE data file again, leaving probe
  * results row-identical (probes are order-insensitive rank queries;
  * only the file count changes).
  */
object Layouts {

  /** Rewrite a partitionBy(`partCol`) parquet layout in place, one
    * data file per partition directory (rows hash-route by `partCol`,
    * so each partition's rows land in exactly one write task). The
    * rewrite stages into a sibling `…__compact_tmp` directory and
    * publishes by directory rename — atomic on HDFS/local filesystems.
    * On an object store (S3A) rename is copy+delete, NOT atomic: a
    * production deployment publishes the compacted layout under a NEW
    * path and flips a manifest/metastore pointer instead; the staging
    * discipline here is the same, only the pointer flip differs.
    * Readers opened mid-compact on a non-atomic store should retry —
    * same caveat as any non-transactional parquet layout.
    */
  def compactPartitioned(spark: SparkSession, path: String, partCol: String): Unit = {
    val tmp = path + "__compact_tmp"
    spark.read.parquet(path)
      .repartition(spark.sparkContext.defaultParallelism, col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp)
    publish(spark, path, tmp)
  }

  /** Staged-rename publish shared by the compactors and
    * [[IndexDrift.retrainAndSwap]]: replace `path` with the staged
    * directory `tmp` by two renames (stage the original aside, rename
    * the staging dir in, delete the original). Atomic per rename on
    * HDFS/local; same object-store caveat as documented on
    * [[compactPartitioned]].
    */
  def publish(spark: SparkSession, path: String, tmp: String): Unit = {
    val bak = path + "__compact_bak"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (p, t, b) = (new Path(path), new Path(tmp), new Path(bak))
    if (fs.exists(b)) fs.delete(b, true)
    require(fs.rename(p, b), s"publish: cannot stage $path aside")
    require(fs.rename(t, p),
      s"publish: cannot publish $tmp over $path (original preserved at $bak)")
    fs.delete(b, true)
  }

  /** Repair a partitionBy layout that holds replayed duplicates — the
    * reconcile path for [[graft.streaming.StreamIndex]]'s documented
    * crash window (a failure between a batch's data append and its
    * commit-marker write leaves that batch's rows twice). One row per
    * `idCol` survives (duplicates are bit-identical by construction:
    * same frozen model → same cell/code), rewritten one file per
    * partition directory and published by the same staged rename as
    * [[compactPartitioned]] — a reconcile is also a compact. Returns
    * the number of duplicate rows dropped.
    */
  def dedupPartitioned(
      spark: SparkSession, path: String, partCol: String, idCol: String): Long = {
    val before = spark.read.parquet(path).count()
    val tmp = path + "__compact_tmp"
    spark.read.parquet(path)
      .dropDuplicates(idCol)
      .repartition(spark.sparkContext.defaultParallelism, col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp)
    publish(spark, path, tmp)
    before - spark.read.parquet(path).count()
  }

  /** Data-file count per partition directory — the bound
    * IndexAppendSpec asserts after a compact.
    */
  def dataFilesPerPartition(spark: SparkSession, path: String, partCol: String): Map[String, Int] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(path)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      .map { d =>
        d.getPath.getName ->
          fs.listStatus(d.getPath).count(_.getPath.getName.endsWith(".parquet"))
      }.toMap
  }

  /** Compact a FLAT (unpartitioned) parquet directory that accumulates
    * one file set per append — the streaming-curation state dirs'
    * shape — down to `numFiles` files, same staged-rename publish (and
    * the same object-store caveat) as [[compactPartitioned]].
    */
  def compactFlat(spark: SparkSession, path: String, numFiles: Int = 0): Unit = {
    val n = if (numFiles > 0) numFiles else spark.sparkContext.defaultParallelism
    val tmp = path + "__compact_tmp"
    spark.read.parquet(path).repartition(n)
      .write.mode("overwrite").parquet(tmp)
    publish(spark, path, tmp)
  }

  /** Data-file count of a flat parquet directory. */
  def dataFiles(spark: SparkSession, path: String): Int = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(path)).count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Atomically (re)write a tiny text sidecar (commit markers, ladder
    * rungs, file manifests): write to a sibling temp file, then rename
    * over the target. A plain `fs.create(p, overwrite = true)`
    * truncates BEFORE writing, so a crash mid-write would leave an
    * empty/torn sidecar that wedges the next reader — rename makes the
    * swap all-or-nothing on HDFS/local (usual object-store caveat).
    */
  def writeSidecar(fs: org.apache.hadoop.fs.FileSystem, p: Path, content: String): Unit = {
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    require(fs.rename(tmp, p), s"sidecar publish failed: $tmp -> $p")
  }

  /** Read a [[writeSidecar]]-maintained text sidecar; None if absent. */
  def readSidecar(fs: org.apache.hadoop.fs.FileSystem, p: Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
}
