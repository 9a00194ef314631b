package graft

import graft.ops.Ingest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ops.Ingest (schema-evolution-robust drop ingestion): three drops
  * with drifted schemas — column added, column retired, integer
  * widened — read as one frame under the widened union schema with
  * NULLs exactly where a drop lacked the column; irreconcilable
  * type conflicts fail loudly at analysis time naming both types and
  * the offending drop; predicates on surviving columns still reach
  * the per-drop parquet scans.
  */
class IngestSpec extends SparkSuite {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("ingest-spec").toString

  test("drifted drops union under the widened schema with NULL backfill") {
    import spark.implicits._
    val root = tmp()
    // drop1: the original layout (id INT, text STRING)
    Seq((1, "alpha"), (2, "beta")).toDF("id", "text")
      .write.parquet(s"$root/d1")
    // drop2: id widened to LONG, lang column added
    Seq((3L, "gamma", "en"), (4L, "delta", "de")).toDF("id", "text", "lang")
      .write.parquet(s"$root/d2")
    // drop3: text retired, lang kept
    Seq((5L, "fr")).toDF("id", "lang")
      .write.parquet(s"$root/d3")

    val got = Ingest.readDrops(spark, Seq(s"$root/d1", s"$root/d2", s"$root/d3"))
    assert(got.schema("id").dataType == LongType, s"got ${got.schema}")
    assert(got.schema.fieldNames.toSeq == Seq("id", "text", "lang"))
    val rows = got.collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2)))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, "alpha", null), (2L, "beta", null),
      (3L, "gamma", "en"), (4L, "delta", "de"),
      (5L, null, "fr")), rows.mkString(", "))
  }

  test("irreconcilable type conflict fails loudly, naming the drop") {
    import spark.implicits._
    val root = tmp()
    Seq((1, "x")).toDF("id", "text").write.parquet(s"$root/d1")
    Seq(("oops", "y")).toDF("id", "text").write.parquet(s"$root/d2")
    val e = intercept[IllegalArgumentException] {
      Ingest.readDrops(spark, Seq(s"$root/d1", s"$root/d2"))
    }
    assert(e.getMessage.contains("'id'") && e.getMessage.contains("d2")
      && e.getMessage.contains("int") && e.getMessage.contains("string"),
      e.getMessage)
  }

  test("widening ladder: exact rules, decimals never lossy") {
    assert(Ingest.widen(IntegerType, LongType).contains(LongType))
    assert(Ingest.widen(ByteType, ShortType).contains(ShortType))
    assert(Ingest.widen(FloatType, DoubleType).contains(DoubleType))
    assert(Ingest.widen(LongType, DoubleType).contains(DoubleType))
    assert(Ingest.widen(DecimalType(10, 2), DecimalType(12, 4)).contains(DecimalType(12, 4)))
    assert(Ingest.widen(DecimalType(18, 0), DecimalType(10, 4)).contains(DecimalType(22, 4)))
    assert(Ingest.widen(StringType, LongType).isEmpty)
    assert(Ingest.widen(BooleanType, IntegerType).isEmpty)
  }

  test("predicates on surviving columns still push to the per-drop scans") {
    import spark.implicits._
    val root = tmp()
    Seq((1, "alpha")).toDF("id", "text").write.parquet(s"$root/d1")
    Seq((2L, "beta", "en")).toDF("id", "text", "lang").write.parquet(s"$root/d2")
    val q = Ingest.readDrops(spark, Seq(s"$root/d1", s"$root/d2"))
      .filter($"text" === "beta")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(text), EqualTo(text,beta)]"),
      s"text predicate not pushed:\n$plan")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
