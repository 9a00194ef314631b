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

  /** Write `df` as a managed bucketed+sorted parquet table inside
    * database `db` (created at `location` on first use — keeps table
    * data out of the default warehouse under the repo cwd).
    */
  def saveBucketed(
      df: DataFrame,
      db: String,
      location: String,
      name: String,
      key: String,
      buckets: Int): Unit = {
    val s = df.sparkSession
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$location'")
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

  def read(s: SparkSession, db: String, name: String): DataFrame = {
    // Spark ≥3.0 stopped reporting the sortBy order from bucketed
    // scans by default (SPARK-28595: ordering inspection can be
    // costly on many-files-per-bucket tables); [[saveBucketed]]
    // guarantees one file per bucket, where the report is free and
    // the merge join's per-bucket Sort elides. Session-sticky on
    // purpose — the conf is consulted at plan time (the Sql.table
    // nanosAsLong precedent).
    s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    s.table(s"$db.$name")
  }
}
