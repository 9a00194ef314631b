package graft

import org.apache.spark.sql.functions._

/** q174_seasonality: the integer weekday algebra is the point —
  * 1970-01-01 (epoch day 0) must read dow = 4 (Thursday), epoch day
  * 3 must read 0 (Sunday) — plus cell counts and the uniform lift.
  */
class SeasonalitySpec extends SparkSuite {

  private val HOUR = 3600000000L

  test("weekday algebra anchored to the epoch; lift exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("seas").toString
    // three events on epoch day 0 at 05:00 (Thursday), one on epoch
    // day 3 at 23:00 (Sunday)
    val ev = Seq(0L * 24 + 5, 0L * 24 + 5, 0L * 24 + 5, 3L * 24 + 23)
    ev.zipWithIndex.map { case (h, i) => (i.toLong, h * HOUR) }
      .toDF("event_id", "us")
      .select($"event_id", expr("timestamp_micros(us)").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q174_seasonality")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = Set(
      (4L, 5L, 3L, 3.0 * 168 / 4),
      (0L, 23L, 1L, 1.0 * 168 / 4))
    assert(got == want, s"got $got\nwant $want")
  }
}
