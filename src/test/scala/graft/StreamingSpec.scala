package graft

import graft.streaming.EventStream

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
    // streaming emits only *closed* sessions (append mode); each user
    // with events keeps exactly one open session in state, so
    // batch count = closed + #users
    val users = graft.Sql.table(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(sessionRows + users === batchSessions,
      s"closed=$sessionRows users=$users batch=$batchSessions")
  }
}
