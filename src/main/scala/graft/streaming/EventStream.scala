package graft.streaming

import graft.Sql._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the events table — pure extension beyond
  * the reference (which is strictly batch, SURVEY.md §2.10), showing the
  * engine's streaming surface: watermarked tumbling-window aggregation
  * and custom sessionization state via flatMapGroupsWithState.
  *
  * At scale this is the same code against Kafka/kinesis sources: state
  * lives in the state store keyed by (window, event_type) / user_id,
  * watermarks bound state size, and the batch queries (q14, q32) are
  * the replayable backfill versions of these exact aggregations.
  */
object EventStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class SessionUpdate(user_id: Long, session_start_ms: Long,
      n_events: Long, closed: Boolean)

  /** Watermarked 1-hour tumbling counts per event type (streaming form
    * of batch q14_events_hourly).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("h"), col("event_type"), col("n"), col("total"))

  /** Custom stateful sessionization: 30-minute inactivity gap closes a
    * session (streaming form of batch q32_sessionize).
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      // the watermark makes EventTimeTimeout legal AND bounds state:
      // without a timeout, one (start, last, n) entry per distinct
      // user lived FOREVER and an idle user's final session was never
      // emitted (it only closed when a LATER event arrived — the
      // round-9 review finding); now a session whose gap has passed
      // the watermark times out, emits closed, and frees its state
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), SessionUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        // state: (session_start_ms, last_ms, n_events)
        (userId: Long, batch: Iterator[Event], state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (start, _, n) = state.get
            state.remove()
            Iterator.single(SessionUpdate(userId, start, n, closed = true))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var (start, last, n) =
              state.getOption.getOrElse((-1L, -1L, 0L))
            val out = scala.collection.mutable.ArrayBuffer[SessionUpdate]()
            sorted.foreach { e =>
              val ms = e.ts.getTime
              if (start < 0) { start = ms; last = ms; n = 1 }
              else if (ms - last > 1800000L) {
                out += SessionUpdate(userId, start, n, closed = true)
                start = ms; last = ms; n = 1
              } else { last = ms; n += 1 }
            }
            if (start >= 0) {
              state.update((start, last, n))
              // the gap boundary, clamped above the current watermark
              // (a timeout timestamp at or below it is rejected)
              state.setTimeoutTimestamp(
                math.max(last + 1800000L, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** Streaming dedup: watermarked dropDuplicatesWithinWatermark on a
    * content fingerprint — the streaming form of the q20/q29 dedup
    * pattern. The WithinWatermark variant is what actually bounds the
    * state store (plain dropDuplicates("fp") would keep one entry per
    * distinct fingerprint forever — the watermark only evicts dedup
    * state when event time is part of the key set).
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withColumn("fp", md5(concat_ws("|", col("user_id"), col("event_type"), col("props"))))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming NEAR-dup suppression: the minhash band signature of the
    * text prefix is the dedup key, so near-identical documents (not
    * just byte-identical ones) collapse as they arrive — the streaming
    * operating point of the q21 family. ONE band of four minhashes:
    * P(suppress | jaccard j) = j^4, the precision-leaning choice —
    * multi-band OR semantics don't fit a per-key streaming dedup state,
    * and the batch q21/q45 pipeline is the replayable backfill that
    * catches the recall remainder. State is one row per surviving
    * signature, evicted by the watermark.
    */
  def dedupNearDup(docs: DataFrame): DataFrame = {
    graft.functions.MinHashLongs.register(docs.sparkSession)
    docs
      .withColumn("bsig", expr(
        "concat_ws(',', transform(minhash_longs(substring(text, 1, 200), 4), h -> CAST(h AS STRING)))"))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("bsig")
  }

  /** Stream-static enrichment join: the streaming fact joins a static
    * dimension (broadcast per micro-batch) — the streaming counterpart
    * of q03's star join.
    */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), events("user_id") % 1500 === dim("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))

  /** Watermarked stream-stream interval join: each purchase joins the
    * same user's clicks from the preceding hour (classic attribution).
    * Both sides carry event-time watermarks and the join condition
    * bounds the time range, so the state store evicts rows once they
    * can no longer match — the requirements for an append-mode
    * stream-stream inner join. At scale state is keyed by user_id and
    * bounded by (watermark + interval) per side.
    */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks, expr(
      """c_user = p_user AND
         click_ts BETWEEN purchase_ts - INTERVAL 1 HOUR AND purchase_ts"""))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_ts"))
  }

  /** File-stream source over the events parquet with `ts` normalized to
    * TimestampType — the streaming twin of `graft.Sql.table`. The source
    * schema is whatever the file physically carries (raw LONG nanos under
    * the legacy layout, TIMESTAMP_NTZ under the current micros layout);
    * [[graft.Sql.normalizeTs]] dispatches on it identically to batch.
    */
  def eventsSource(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // file-stream source needs a directory: stream the sf dir with a
    // glob filter selecting just the events table file
    graft.Sql.normalizeTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir))
  }

  /** Drive both streaming queries from the parquet events table through
    * a file-stream source into memory sinks; returns (hourly rows,
    * closed-session rows). Used by StreamingSpec and runnable standalone.
    */
  def runOnce(spark: SparkSession, sfDir: String): (Long, Long) = {
    import spark.implicits._
    val src = eventsSource(spark, sfDir)

    // complete mode: the memory sink holds the full current aggregate,
    // directly comparable to the batch q14 result (append mode would
    // withhold windows still inside the watermark)
    val q1 = hourlyCounts(src)
      .writeStream.outputMode("complete").format("memory").queryName("hourly").start()
    val q2 = sessionize(src.select($"event_id", $"ts", $"user_id", $"event_type", $"value").as[Event])
      .writeStream.outputMode("append").format("memory").queryName("sessions").start()
    q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()
    (spark.sql("SELECT * FROM hourly").count(),
      spark.sql("SELECT * FROM sessions").count())
  }
}
