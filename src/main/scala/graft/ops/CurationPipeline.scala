package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline composing the engine's
  * operators into one declarative plan — the shape a 100 TB corpus run
  * takes:
  *
  *   scan → quality gate → exact dedup (fingerprint, keep first) →
  *   near-dup removal (MinHash-LSH pairs → drop the higher doc_id of
  *   each pair) → per-doc stats projection → curated frame
  *
  * Everything stays lazy in a single DAG: Catalyst pushes the quality
  * predicates into the scan, the dedup joins shuffle on fingerprints /
  * band signatures only (never payloads — payloads are re-attached by a
  * final semi-join), and the whole pipeline writes partitioned parquet.
  */
object CurationPipeline {

  /** Quality gate: length + stopword evidence (cf. q27). Thresholds
    * are parameters so config-comparison audits (q183) can run two
    * gates through the ONE implementation — defaults are the q100
    * production config.
    */
  def qualityGate(docs: DataFrame, minChars: Int = 30, minStops: Int = 1): DataFrame =
    docs.filter(length(col("text")) >= minChars &&
      size(expr("regexp_extract_all(lower(text), '\\\\b(the|a|and|of|to|in)\\\\b', 0)")) >= minStops)

  /** Exact dedup: keep the lowest doc_id per normalized fingerprint. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val fp = docs.withColumn("fp",
      md5(trim(regexp_replace(lower(col("text")), "[ \\t\\n\\x0B\\f\\r]+", " "))))
    val keep = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    fp.join(keep, Seq("fp", "doc_id"), "left_semi").drop("fp")
  }

  /** Near-dup removal: drop the higher doc_id of every MinHash-LSH pair
    * (pairs from the same machinery as q21).
    */
  def nearDedup(spark: SparkSession, docs: DataFrame, pairs: DataFrame): DataFrame =
    docs.join(pairs.select(col("d2").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")

  /** Full pipeline over a documents frame; `lshPairs` supplies the
    * near-dup pairs (q21's result at the same sf).
    */
  def curate(spark: SparkSession, docs: DataFrame, lshPairs: DataFrame): DataFrame = {
    val gated = qualityGate(docs)
    val exact = exactDedup(gated)
    val near = nearDedup(spark, exact, lshPairs)
    near.select(
      col("doc_id"), col("lang"), col("source"),
      length(col("text")).cast("long").as("n_chars"),
      size(filter(split(col("text"), "[ \\t\\n\\x0B\\f\\r]+"), x => x =!= "")).cast("long").as("n_tokens"),
      col("text"))
  }
}
