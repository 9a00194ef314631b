package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sort-merge-bucket (SMB) co-located join machinery — the bucketing
  * lever the 100 TB posture keeps citing, made concrete: two frames
  * written `bucketBy(n, key).sortBy(key)` are hash-co-partitioned AND
  * pre-sorted at rest, so an equi-join on the bucket key (and any
  * aggregation keyed on it) plans with ZERO Exchange and ZERO Sort —
  * the shuffle is paid once at write time and amortized over every
  * subsequent join against the layout. SmbSpec asserts the
  * exchange-free, sort-free executed plan (non-vacuously: the
  * sort-merge join node must be present).
  *
  * Bucket counts must MATCH across the layouts being joined (Spark
  * only aligns equal bucket counts without a shuffle on either side;
  * a multiple-of relationship shuffles the smaller). Pick the count
  * once per subject area — the convention every warehouse bucketing
  * guide prescribes.
  */
object Smb {

  private def validIdent(s: String, what: String): Unit =
    require(s.nonEmpty && s.forall(c => c.isLetterOrDigit || c == '_'),
      s"$what '$s' is interpolated into SQL/catalog calls — " +
        "letters, digits and underscore only")

  /** Write `df` as a managed bucketed+sorted parquet table inside
    * database `db` (created at `location` on first use — keeps table
    * data out of the default warehouse under the repo cwd). If the
    * database already exists at a DIFFERENT location this fails
    * loudly: `CREATE DATABASE IF NOT EXISTS` silently ignores a new
    * location, so repeated saves would keep landing under the first
    * call's (possibly long-deleted temp) directory.
    */
  def saveBucketed(
      df: DataFrame,
      db: String,
      location: String,
      name: String,
      key: String,
      buckets: Int): Unit = {
    val s = df.sparkSession
    validIdent(db, "database name")
    validIdent(name, "table name")
    if (s.catalog.databaseExists(db)) {
      // compare FULLY-QUALIFIED URIs (scheme + authority + path): a
      // bare-path compare would let hdfs://nn/x pass for file:///x and
      // the table would silently land under the old location — the
      // exact failure this guard exists to catch
      val conf = s.sparkContext.hadoopConfiguration
      def qualified(p: org.apache.hadoop.fs.Path): java.net.URI =
        p.getFileSystem(conf).makeQualified(p).toUri
      val existing = qualified(new org.apache.hadoop.fs.Path(
        s.sessionState.catalog.getDatabaseMetadata(db).locationUri))
      val wanted = qualified(new org.apache.hadoop.fs.Path(location))
      require(existing == wanted,
        s"database $db already exists at $existing; CREATE DATABASE IF NOT " +
          s"EXISTS would silently ignore the new location $wanted and this " +
          "table would land under the old one — use a different db name or " +
          "the existing location")
    } else {
      // the path is interpolated into SQL too — escape the one
      // character that can break out of the string literal
      s.sql(s"CREATE DATABASE $db LOCATION '${location.replace("'", "''")}'")
    }
    // ONE file per bucket is load-bearing: the scan only reports
    // sorted output (letting the merge join elide its Sort) when a
    // bucket is a single file, and each write task emits one file per
    // bucket it holds — so pre-partition on the bucket hash into
    // exactly `buckets` tasks (Spark's bucket hash IS HashPartitioning
    // over the key, so task i holds precisely bucket i's rows)
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(s"$db.$name")
  }

  private val ensureLock = new Object
  private lazy val warehouse: String =
    java.nio.file.Files.createTempDirectory("graft-smb-wh").toString

  /** Cheap source-data fingerprint for [[ensureBucketed]]: the md5 of
    * every input file's (path, length, mtime) under the given paths —
    * an overwrite-in-place of the source data changes it, so a cached
    * layout built from the OLD data cannot be silently served.
    */
  def sourceFingerprint(s: SparkSession, paths: String*): String = {
    val conf = s.sparkContext.hadoopConfiguration
    val parts = paths.sorted.flatMap { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      if (!fs.exists(hp)) Seq(s"$p:absent")
      else {
        val it = fs.listFiles(hp, true)
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val st = it.next()
          b += s"${st.getPath}:${st.getLen}:${st.getModificationTime}"
        }
        b.sorted
      }
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Build-once-per-JVM bucketed layout under the one shared graft
    * SMB warehouse directory: the (expensive, amortizable) bucketed
    * write runs only on a cache MISS, so bench reruns and repeated
    * pipeline invocations pay the layout's shuffle ONCE —
    * `SMB_BENCH.json` prices the break-even at ~3 joins, and
    * rebuilding per run would throw that away (and leak a temp
    * warehouse per invocation). A hit requires BOTH the catalog table
    * and a matching layout fingerprint sidecar (key + bucket count +
    * the caller's `fingerprint`, e.g. [[sourceFingerprint]] of the
    * input files) — catalog existence alone would silently serve a
    * layout built from since-overwritten data, from a hash-aliased
    * source path, or at a different bucket geometry. Any mismatch
    * rebuilds (mode overwrite). `build` is by-name and never
    * evaluated on a hit.
    */
  def ensureBucketed(
      s: SparkSession,
      db: String,
      name: String,
      key: String,
      buckets: Int,
      fingerprint: String)(build: => DataFrame): Unit = ensureLock.synchronized {
    val want = s"$key|$buckets|$fingerprint"
    val fpPath = new org.apache.hadoop.fs.Path(s"$warehouse/_fp_${db}_$name")
    val fs = fpPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val hit = s.catalog.databaseExists(db) &&
      s.catalog.tableExists(s"$db.$name") &&
      Layouts.readSidecar(fs, fpPath).map(_.trim).contains(want)
    if (!hit) {
      saveBucketed(build, db, warehouse, name, key, buckets)
      // sidecar LAST: a crash between table write and sidecar leaves
      // a mismatch, which re-runs the (idempotent overwrite) build
      Layouts.writeSidecar(fs, fpPath, want + "\n")
    }
  }

  def read(s: SparkSession, db: String, name: String): DataFrame = {
    // Spark ≥3.0 stopped reporting the sortBy order from bucketed
    // scans by default (SPARK-28595: ordering inspection lists files
    // at planning time, expensive on many-files-per-bucket tables);
    // [[saveBucketed]] guarantees one file per bucket, where the
    // report is free and the merge join's per-bucket Sort elides.
    // Session-sticky OF NECESSITY, not convenience: the conf is
    // consulted when the physical scan node is built — at ACTION
    // time, not here (measured: scoping a save/restore around this
    // method reintroduced both Sorts in the executed plan), and this
    // method's contract is a lazy frame whose action belongs to the
    // caller. The cost lands only on OTHER bucketed-table scans in
    // the same session, which pay a file listing during planning;
    // callers that own their actions and want strict scoping should
    // use [[sortedScans]] instead.
    s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    s.table(s"$db.$name")
  }

  /** Scoped alternative to [[read]]'s sticky conf for callers that
    * own BOTH plan construction and the action: the ordering report
    * is enabled only while `body` runs, and `body` must materialize
    * its frames before returning (the conf is read at action time —
    * a frame returned lazily out of the scope re-plans with the
    * restored value and silently regains its Sorts).
    */
  def sortedScans[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prior = s.conf.getOption(key)
    s.conf.set(key, "true")
    try body
    finally prior match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
}
