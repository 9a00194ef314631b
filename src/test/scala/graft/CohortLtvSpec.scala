package graft

import org.apache.spark.sql.functions._

/** q173_cohort_ltv: planted journeys with exact decimal revenues —
  * first-activity cohorting (a non-purchase view sets the cohort
  * day), per-offset cells, and the cumulative curve, cell-exact.
  */
class CohortLtvSpec extends SparkSuite {

  private val DAY = 86400000000L
  /** (user, type, day, value): u1 cohorts on day 10 via a VIEW, buys
    * on days 11 and 13; u2 cohorts day 10, buys day 11 twice; u3
    * cohorts day 12, buys day 12; u4 never buys.
    */
  private val fixture: Seq[(Long, String, Long, Double)] = Seq(
    (1L, "view", 10L, 0.0), (1L, "purchase", 11L, 5.25), (1L, "purchase", 13L, 1.75),
    (2L, "purchase", 10L, 2.50), (2L, "purchase", 11L, 2.50), (2L, "purchase", 11L, 1.00),
    (3L, "view", 12L, 0.0), (3L, "purchase", 12L, 9.00),
    (4L, "view", 10L, 0.0))

  test("cells and cumulative curve ≡ hand computation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ltv").toString
    fixture.zipWithIndex.map { case ((u, t, d, v), i) =>
      (i.toLong, u, t, d * DAY, v) }
      .toDF("event_id", "user_id", "event_type", "us", "value")
      .select($"event_id", $"user_id", $"event_type",
        expr("timestamp_micros(us)").as("ts"), $"value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q173_cohort_ltv")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
      .toSet
    // cohort 10: offset 0 — u2's day-10 purchase (2.50); offset 1 —
    // u1's 5.25 + u2's 2.50 + 1.00 (3 purchases, 2 buyers, cum 11.25);
    // offset 3 — u1's 1.75 (cum 13.00). cohort 12: offset 0 — 9.00.
    val want = Set(
      (10L, 0L, 1L, 1L, 2.50, 2.50),
      (10L, 1L, 3L, 2L, 8.75, 11.25),
      (10L, 3L, 1L, 1L, 1.75, 13.00),
      (12L, 0L, 1L, 1L, 9.00, 9.00))
    assert(got == want, s"got $got\nwant $want")
  }
}
