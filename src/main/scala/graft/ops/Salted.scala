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

  /** count(*) per key, skew-safe. Equivalent to
    * `df.groupBy(key).count()` (property-tested).
    */
  def saltedCount(df: DataFrame, key: Column, salt: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("__key"))
      .agg(sum(col("__partial")).as("cnt"))

  /** Algebraic sum per key, skew-safe. */
  def saltedSum(df: DataFrame, key: Column, value: Column, salt: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy(col("__key"))
      .agg(sum(col("__partial")).as("total"))
}
