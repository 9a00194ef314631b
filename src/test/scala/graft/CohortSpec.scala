package graft

import org.apache.spark.sql.functions._

/** q152_retention_cohorts (first-day cohort × day-offset matrix):
  * planted activity days — multi-day user, one-day user, a long-gap
  * return, and two events on the SAME day (must count once) — checked
  * cell by cell against the integer day algebra.
  */
class CohortSpec extends SparkSuite {

  private val DayUs = 86400000000L

  /** (user_id, μs): uA active days 10,11,15 (two events on day 10);
    * uB day 11 only; uC days 10 and 45 (a day-35 return).
    */
  private def fixture: Seq[(Long, Long)] = Seq(
    (1L, 10 * DayUs + 1000L), (1L, 10 * DayUs + 2000L),
    (1L, 11 * DayUs + 5L), (1L, 15 * DayUs + 5L),
    (2L, 11 * DayUs + 7L),
    (3L, 10 * DayUs + 9L), (3L, 45 * DayUs + 9L))

  test("matrix cells exact; same-day double event counts once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cohort").toString
    fixture.toDF("user_id", "us")
      .select($"user_id", lit("view").as("event_type"),
        expr("timestamp_micros(us)").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q152_retention_cohorts")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // cohort day 10: uA and uC at offset 0; uA at offsets 1 and 5;
    // uC returns at offset 35. cohort day 11: uB at offset 0.
    val want = Map(
      (10L, 0L) -> 2L, (10L, 1L) -> 1L, (10L, 5L) -> 1L,
      (10L, 35L) -> 1L, (11L, 0L) -> 1L)
    assert(got == want, s"got $got\nwant $want")
  }
}
