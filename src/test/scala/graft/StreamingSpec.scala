package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** Streaming results must agree with their batch counterparts: the
  * hourly windowed agg with q14_events_hourly and stateful
  * sessionization with q32_sessionize.
  */
class StreamingSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("streaming hourly counts and sessionization match batch queries") {
    val (hourlyRows, sessionRows) = EventStream.runOnce(spark, sf)

    val batchHourly = SparkEntry.queries("q14_events_hourly")(spark, sf).count()
    // watermark append-mode emits only windows older than the watermark;
    // with a bounded historical file all windows close → equal counts
    assert(hourlyRows === batchHourly)

    val batchSessions = SparkEntry.queries("q32_sessionize")(spark, sf).count()
    // streaming emits closed sessions: gap-closed by a successor event
    // AND — since the EventTimeTimeout fix — finals whose 30-min gap
    // passed the watermark (final watermark = max ts − 30-min delay,
    // so a final times out iff its last event sits ≥ 60 min before
    // the stream frontier). Only users still inside that horizon keep
    // an open session in state: batch total = closed + still-open.
    import spark.implicits._
    val ev = graft.Sql.table(spark, sf, "events")
    val maxTs = ev.agg(max($"ts")).head().getTimestamp(0).getTime
    val stillOpen = ev.groupBy($"user_id").agg(max($"ts").as("mx"))
      .collect().count(_.getTimestamp(1).getTime + 3600000L > maxTs)
    assert(sessionRows + stillOpen === batchSessions,
      s"closed=$sessionRows stillOpen=$stillOpen batch=$batchSessions")
  }

  test("streaming dedup and stream-static join match batch equivalents") {
    import spark.implicits._
    val src = EventStream.eventsSource(spark, sf)

    val qd = EventStream.dedupEvents(src)
      .writeStream.outputMode("append").format("memory").queryName("deduped").start()
    val cust = graft.Sql.table(spark, sf, "customer")
    val qe = EventStream.enrich(src, cust)
      .writeStream.outputMode("complete").format("memory").queryName("enriched").start()
    qd.processAllAvailable(); qe.processAllAvailable()
    qd.stop(); qe.stop()

    val batchEvents = graft.Sql.table(spark, sf, "events")
    val batchDistinct = batchEvents
      .select(md5(concat_ws("|", $"user_id", $"event_type", $"props")).as("fp"))
      .distinct().count()
    assert(spark.sql("SELECT count(*) FROM deduped").collect()(0).getLong(0) === batchDistinct)

    val batchEnriched = batchEvents.join(cust, $"user_id" % 1500 === $"c_custkey")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val streamEnriched = spark.sql("SELECT * FROM enriched")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamEnriched === batchEnriched)
  }

  test("streaming near-dup suppression keeps one doc per band signature") {
    import spark.implicits._
    // events props stand in for document text (near-identical payloads
    // share JSON boilerplate → identical 200-char-prefix band sigs)
    val src = EventStream.eventsSource(spark, sf)
      .withColumn("text", col("props"))

    val q = EventStream.dedupNearDup(src)
      .writeStream.outputMode("append").format("memory").queryName("neardup").start()
    q.processAllAvailable()
    q.stop()

    graft.functions.MinHashLongs.register(spark)
    val batch = graft.Sql.table(spark, sf, "events")
      .withColumn("text", col("props"))
      .select(expr(
        "concat_ws(',', transform(minhash_longs(substring(text, 1, 200), 4), h -> CAST(h AS STRING)))").as("bsig"))
    val distinctSigs = batch.distinct().count()
    val total = batch.count()
    val kept = spark.sql("SELECT count(*) FROM neardup").collect()(0).getLong(0)
    val keptSigs = spark.sql("SELECT count(DISTINCT bsig) FROM neardup").collect()(0).getLong(0)
    // exactly one survivor per distinct band signature, regardless of
    // which representative won the processing-order race
    assert(kept === distinctSigs, s"kept=$kept distinct=$distinctSigs")
    assert(keptSigs === kept)
    assert(kept < total, "fixture must actually contain near-dups")
  }

  test("file-sink stream resumes from its checkpoint exactly-once across a restart") {
    import java.nio.file.Files
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ts stays in its physical encoding (raw LONG nanos or TIMESTAMP_NTZ)
    // end-to-end: this test checks the sink commit log, not timestamps
    val all = spark.read.parquet(s"$sf/events.parquet")
    val total = all.count()
    val srcDir = Files.createTempDirectory("stream-src").toString
    val outDir = Files.createTempDirectory("stream-out").toString + "/data"
    val ckpt = Files.createTempDirectory("stream-ckpt").toString

    def runOnce(): Unit = {
      val q = spark.readStream.schema(all.schema).parquet(srcDir)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }

    // first half, run, stop — then append the second half and RESTART
    // from the same checkpoint: the sink's commit log must replay
    // nothing and miss nothing
    all.filter(org.apache.spark.sql.functions.col("event_id") % 2 === 0)
      .write.mode("append").parquet(srcDir)
    runOnce()
    val afterFirst = spark.read.parquet(outDir).count()
    assert(afterFirst > 0 && afterFirst < total)

    all.filter(org.apache.spark.sql.functions.col("event_id") % 2 === 1)
      .write.mode("append").parquet(srcDir)
    runOnce()

    val out = spark.read.parquet(outDir)
    assert(out.count() === total, "rows lost or duplicated across the restart")
    assert(out.select("event_id").distinct().count() === total)
  }

  test("stream-stream interval join (purchase attribution) matches the batch join") {
    import spark.implicits._
    val src = EventStream.eventsSource(spark, sf)

    val q = EventStream.purchaseAttribution(src)
      .writeStream.outputMode("append").format("memory").queryName("attrib").start()
    q.processAllAvailable()
    q.stop()

    val e = graft.Sql.table(spark, sf, "events")
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("click_ts"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("purchase_ts"))
    val batchJoin = purchases.join(clicks, expr(
      "c_user = p_user AND click_ts BETWEEN purchase_ts - INTERVAL 1 HOUR AND purchase_ts"))
      .count()
    val streamed = spark.sql("SELECT count(*) FROM attrib").collect()(0).getLong(0)
    assert(streamed === batchJoin, s"streamed=$streamed batch=$batchJoin")
    assert(streamed > 0, "expected at least one attributed purchase in testdata")
  }
}
