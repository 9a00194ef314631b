package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-evolution-robust ingestion of a sequence of parquet drops —
  * the multi-drop generalization of `graft.Sql.normalizeTs`'s
  * single-column lesson (round-8: a reader that hardcodes ONE physical
  * layout analysis-breaks the day the producer changes): real corpora
  * arrive as daily drops whose schemas drift — columns appear,
  * columns are retired, integer widths grow. `readDrops` reconciles
  * them under explicit, auditable rules instead of
  * `spark.read.parquet(dirs: _*)`'s merge-or-throw behavior:
  *
  *  - the target schema is the field-by-field union of the drops'
  *    schemas, in first-seen order;
  *  - same-name fields with different types resolve by a NUMERIC
  *    WIDENING ladder (byte→short→int→long; float→double;
  *    integral+fractional→double; decimal by max precision/scale,
  *    never lossy) — anything else (e.g. INT vs STRING) fails LOUDLY
  *    with both types and the offending drop path in the message, at
  *    ANALYSIS time, not as NULLs at 3 a.m.;
  *  - a column absent from a drop reads as NULL for that drop's rows
  *    (the standard add-a-column contract).
  *
  * Scale shape: schema discovery reads parquet FOOTERS only (one
  * round-trip per drop); each drop then scans under its OWN physical
  * schema with a scan-local cast projection to the target — no
  * shuffle, no driver data, pushdown/pruning intact per drop (the
  * casts sit above the scan, and predicates on untouched columns
  * still reach PushedFilters). unionByName keeps partitioning lazy —
  * the union is plan-level, not a materialization.
  */
object Ingest {

  private val integrals: Seq[DataType] = Seq(ByteType, ShortType, IntegerType, LongType)
  private val floats: Set[DataType] = Set(FloatType, DoubleType)

  /** Widen two parquet-visible types, or None if irreconcilable. */
  private[graft] def widen(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case (x, y) if x == y => Some(x)
    case (x, y) if integrals.contains(x) && integrals.contains(y) =>
      Some(integrals(math.max(integrals.indexOf(x), integrals.indexOf(y))))
    case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
    case (x, y) if integrals.contains(x) && floats.contains(y) => Some(DoubleType)
    case (x, y) if floats.contains(x) && integrals.contains(y) => Some(DoubleType)
    case (x: DecimalType, y: DecimalType) =>
      // cover both integer and fractional ranges of the inputs exactly
      val scale = math.max(x.scale, y.scale)
      val intDigits = math.max(x.precision - x.scale, y.precision - y.scale)
      val p = math.min(DecimalType.MAX_PRECISION, intDigits + scale)
      Some(DecimalType(p, scale))
    case _ => None
  }

  /** Field-by-field union of drop schemas (first-seen column order);
    * fails loudly on an irreconcilable same-name type conflict.
    */
  private[graft] def unionSchema(schemas: Seq[(String, StructType)]): StructType = {
    val order = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    val firstSeen = scala.collection.mutable.HashMap.empty[String, String]
    schemas.foreach { case (path, st) =>
      st.fields.foreach { f =>
        order.get(f.name) match {
          case None =>
            order.update(f.name, f.copy(nullable = true))
            firstSeen.update(f.name, path)
          case Some(prev) =>
            val t = widen(prev.dataType, f.dataType).getOrElse(throw new IllegalArgumentException(
              s"column '${f.name}' is ${prev.dataType.simpleString} (first seen in ${firstSeen(f.name)}) " +
                s"but ${f.dataType.simpleString} in $path — not reconcilable by widening; " +
                "fix the producer or read the drops separately"))
            order.update(f.name, prev.copy(dataType = t))
        }
      }
    }
    StructType(order.values.toArray)
  }

  /** Read parquet drops whose schemas may have drifted (columns
    * added/removed, numeric widths grown) as ONE frame under the
    * widened union schema. Missing columns are NULL for the drops
    * that lack them.
    */
  def readDrops(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "readDrops: no drop paths given")
    val schemas = paths.map(p => p -> spark.read.parquet(p).schema)
    val target = unionSchema(schemas)
    schemas.map { case (p, st) =>
      val have = st.fieldNames.toSet
      val cols = target.fields.map { f =>
        if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }
      spark.read.parquet(p).select(cols.toIndexedSeq: _*)
    }.reduce(_.unionByName(_))
  }
}
