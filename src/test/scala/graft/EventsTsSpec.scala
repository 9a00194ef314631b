package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression: the events `ts` read path must work against EVERY physical
  * encoding a corpus can arrive in, dispatching on the loaded schema
  * instead of hardcoding one layout (round-8 regression: the testdata
  * moved from TIMESTAMP(NANOS) to timestamp[us] and the hardcoded
  * nanos-rebuild analysis-broke 7 queries).
  */
class EventsTsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("Sql.table reads the current testdata encoding as TimestampType") {
    val df = Sql.table(spark, sf, "events")
    assert(df.schema("ts").dataType === TimestampType)
    val n = df.filter(col("ts").isNotNull).count()
    assert(n > 0 && n === df.count())
  }

  test("normalizeTs rebuilds identical instants from all three encodings") {
    import spark.implicits._
    // one fixture, three physical layouts of the same instants
    val microsUtc = Seq(0L, 1700000000000000L, 1700000000123456L)

    val fromLong = Sql.normalizeTs(
      microsUtc.map(_ * 1000L).toDF("ts")) // raw nanos LONG layout
    assert(fromLong.schema("ts").dataType === TimestampType)

    val fromNtz = Sql.normalizeTs(
      microsUtc.toDF("us").select(
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
    assert(fromNtz.schema("ts").dataType === TimestampType)

    val fromTs = Sql.normalizeTs(
      microsUtc.toDF("us").select(timestamp_micros(col("us")).as("ts")))
    assert(fromTs.schema("ts").dataType === TimestampType)

    def render(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s"))
        .as[String].collect().toSeq.sorted
    val expect = render(fromTs)
    assert(render(fromLong) === expect)
    assert(render(fromNtz) === expect)
  }

  test("Sql.table round-trips a written fixture in both on-disk encodings") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("events-enc").toString
    val micros = Seq(1700000000000000L, 1700003600000000L, 1700007200999999L)

    // fixtures mirror the testdata's shape: events.parquet is a single
    // FILE (the streaming source's pathGlobFilter matches leaf file
    // names, so a directory named events.parquet would stream empty)
    def writeSingleFile(df: org.apache.spark.sql.DataFrame, dir: String): Unit = {
      val staging = s"$dir/__staging"
      df.coalesce(1).write.parquet(staging)
      val part = new java.io.File(staging).listFiles
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/events.parquet"))
    }
    // legacy layout: ts physically INT64 nanos (what nanosAsLong yields)
    val nanosDir = s"$base/nanos"
    writeSingleFile(
      micros.map(us => (us * 1000L, 1L)).toDF("ts", "event_id"), nanosDir)
    // current layout: ts physically timestamp (micros)
    val tsDir = s"$base/micros"
    writeSingleFile(
      micros.map(us => (us, 2L)).toDF("us", "event_id")
        .select(timestamp_micros(col("us")).as("ts"), col("event_id")), tsDir)

    def instants(dir: String): Seq[Long] =
      Sql.table(spark, dir, "events")
        .select(unix_micros(col("ts")).as("us")).as[Long].collect().toSeq.sorted
    assert(instants(nanosDir) === micros)
    assert(instants(tsDir) === micros)

    // the STREAMING source normalizes identically on both layouts
    def streamed(dir: String): Seq[Long] = {
      val q = graft.streaming.EventStream.eventsSource(spark, dir)
        .select(unix_micros(col("ts")).as("us"))
        .writeStream.outputMode("append").format("memory")
        .queryName("ts_enc").start()
      q.processAllAvailable(); q.stop()
      val out = spark.sql("SELECT us FROM ts_enc").as[Long].collect().toSeq.sorted
      spark.catalog.dropTempView("ts_enc")
      out
    }
    assert(streamed(nanosDir) === micros)
    assert(streamed(tsDir) === micros)
  }
}
