package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

/** One engine query: a Spark DataFrame program plus (when SQL-expressible)
  * an equivalent ANSI SQL string the driver runs in DuckDB over the same
  * parquet tables. `oracle == None` → driver records a rows-only check.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Cross-engine (Spark vs DuckDB) bit-reproducibility helpers.
  *
  * The oracle hash-compares values, so aggregate outputs must be
  * bit-identical across engines. Double sums are order-dependent, and
  * engines disagree on decimal *downscale* rounding (Spark HALF_UP,
  * DuckDB half-even/truncating), so the rules are:
  *
  *  1. quantize each input double at a scale that covers its true decimal
  *     precision (money/qty → DECIMAL(18,4); rates in [0,10) → (5,4)):
  *     both engines round the same binary double to the same decimal;
  *  2. keep all arithmetic in exact decimal; only ever downscale when the
  *     dropped digits are provably zero (e.g. a 2dp×2dp product has ≤4
  *     decimals, so (30,12)→(24,6) is exact) — never a lossy downscale;
  *  3. sum in decimal (exact, order-independent), keeping the scaled
  *     magnitude under 2^53 so the final CAST(... AS DOUBLE) is a single
  *     correctly-rounded conversion in both engines (verified identical);
  *  4. counts → BIGINT on both sides (DuckDB sum(int) would give HUGEINT
  *     → pandas float);
  *  5. timestamps in output → ISO strings (pandas datetime64[us] vs [ns]
  *     dtype skew between the two load paths);
  *  6. untouched double columns pass through bit-identical — safe;
  *  7. NEVER `\s` in an oracle-paired regex: Java's \s includes \x0B
  *     (vertical tab), RE2's (DuckDB) does not — a doc containing \x0B
  *     would fingerprint/tokenize differently per engine. Write the
  *     class explicitly as `[ \t\n\x0B\f\r]` on BOTH sides (every
  *     normalization/tokenization site does; reference-parity byte
  *     workloads that never face DuckDB are exempt).
  */
object Sql {
  val D18_4 = DataTypes.createDecimalType(18, 4)
  val D5_4 = DataTypes.createDecimalType(5, 4)
  val D22_4 = DataTypes.createDecimalType(22, 4)
  val D24_6 = DataTypes.createDecimalType(24, 6)
  val D18_2 = DataTypes.createDecimalType(18, 2)

  /** money/qty double (≤4 dp) as exact decimal */
  def dec(c: Column): Column = c.cast(D18_4)
  /** small rate double in [0,10), ≤4 dp (discount/tax) as exact decimal */
  def rate(c: Column): Column = c.cast(D5_4)
  /** final aggregate → double (single correctly-rounded conversion) */
  def out(c: Column): Column = c.cast("double")
  val oneRate: Column = lit(1).cast(D5_4)

  /** price*(1-disc): (18,4)*(5,4)=(24,8), ≤4 true decimals → exact (22,4) */
  def discPrice(price: Column, disc: Column): Column =
    (dec(price) * (oneRate - rate(disc))).cast(D22_4)

  /** price*(1-disc)*(1+tax): ≤6 true decimals → exact (24,6) */
  def charge(price: Column, disc: Column, tax: Column): Column =
    (dec(price) * (oneRate - rate(disc)) * (oneRate + rate(tax))).cast(D24_6)

  /** timestamp → ISO string, matching DuckDB strftime '%Y-%m-%d %H:%M:%S' */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Normalize an events frame's `ts` to session TimestampType, whatever
    * physical encoding the parquet file carried. Real corpora arrive in
    * several layouts, so dispatch on the LOADED schema instead of
    * hardcoding one:
    *  - TIMESTAMP(NANOS) read as raw LONG nanos (under the session's
    *    `nanosAsLong` conf, set in [[table]]) → rebuild via
    *    `timestamp_micros(ts div 1000)`;
    *  - TIMESTAMP(MICROS) with isAdjustedToUTC=false read natively as
    *    TIMESTAMP_NTZ → cast (exact under the UTC session timezone);
    *  - already TIMESTAMP → pass through.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(_: org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Measured-rowcount broadcast gate — ONE implementation of the
    * pattern three call sites grew independently (q131's two per-run
    * counts, Decontam's sidecar-frozen count, ad-hoc AQE reliance):
    * hint `broadcast` only when the frame is PROVABLY executor-safe.
    *
    * Why not always hint: an unconditional hint on a frame that
    * scales with the corpus overrides AQE and OOMs at 100× (round-9
    * finding). Why not never hint: leaving it to AQE costs a measured
    * 1.9× at bench scale — the initial SMJ plan shuffle-writes the
    * big side and adds stage barriers before runtime stats arrive
    * (round-10 finding). So: decide on a REAL row count.
    *
    *  - `knownCount` supplied (a frozen-layout sidecar count, the
    *    Decontam form — zero jobs): gate on it directly; the frame is
    *    returned as-is (re-scannable at-rest data needs no pinning).
    *  - no count: localCheckpoint + count — the count reads the
    *    materialized blocks, the downstream join reuses them, nothing
    *    recomputes. One-shot queries let the ContextCleaner reap the
    *    blocks; PER-TRIGGER callers must use [[broadcastIfSmallManaged]]
    *    and release after materializing (the ofManaged convention).
    */
  def broadcastIfSmall(
      df: DataFrame, budgetRows: Long, knownCount: Option[Long] = None): DataFrame =
    broadcastIfSmallManaged(df, budgetRows, knownCount)._1

  /** [[broadcastIfSmall]] plus the cleanup hook for per-trigger
    * callers; a no-op hook when `knownCount` skipped the checkpoint.
    */
  def broadcastIfSmallManaged(
      df: DataFrame, budgetRows: Long, knownCount: Option[Long] = None)
      : (DataFrame, () => Unit) =
    knownCount match {
      case Some(n) =>
        (if (n <= budgetRows) broadcast(df) else df, () => ())
      case None =>
        val m = df.localCheckpoint()
        (if (m.count() <= budgetRows) broadcast(m) else m,
          () => graft.ops.Checkpoints.release(m))
    }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // A TIMESTAMP(NANOS) column would make Spark's parquet schema
      // converter throw before we can even look at the schema, so the
      // conf must be set BEFORE the read; it is a no-op for the other
      // encodings. It DELIBERATELY stays set for the whole session: it
      // is consulted at plan-execution time (not here), so a
      // save/restore would break this very scan when it finally runs.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
