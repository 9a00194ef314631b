package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities: two-stage salted aggregation.
  *
  * A hot grouping key at 100 TB puts one reducer on the critical path
  * (the reference's hash-partitioning has exactly this failure mode,
  * `hash(key) % R`). Salting splits each key across `salt` partial
  * groups (stage 1), then combines the partials (stage 2) — both stages
  * are partial+final hash aggregations, so the shuffle for stage 2
  * carries at most `salt × |keys|` rows regardless of skew.
  *
  * AQE's skew-join handling covers join skew automatically; this is the
  * aggregation-side counterpart for algebraic aggregates.
  */
object Salted {

  /** Deterministic per-row salt: content hash of every column. A salt
    * derived from partition id / row position would change on task
    * retry and corrupt results after a shuffle-fetch failure (the
    * SPARK-23207 class of bug); a content hash is retry-stable.
    * Degenerate case: a hot key whose rows are bit-identical all land
    * in one salt bucket — add a distinguishing column upstream if so.
    */
  private def contentSalt(df: DataFrame, salt: Int): Column =
    pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salt))

  /** count(*) per key, skew-safe. Equivalent to
    * `df.groupBy(key).count()` (property-tested).
    */
  def saltedCount(df: DataFrame, key: Column, salt: Int = 16): DataFrame =
    df.withColumn("__salt", contentSalt(df, salt))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("__key"))
      .agg(sum(col("__partial")).as("cnt"))

  /** Algebraic sum per key, skew-safe. */
  def saltedSum(df: DataFrame, key: Column, value: Column, salt: Int = 16): DataFrame =
    df.withColumn("__salt", contentSalt(df, salt))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy(col("__key"))
      .agg(sum(col("__partial")).as("total"))
}
