package graft

import org.apache.spark.sql.functions._

/** q151_event_funnel (ordered view→click→purchase): planted user
  * journeys exercise the ordering constraint that separates a funnel
  * from three count-distincts — a click BEFORE the first view is not
  * progress, a purchase before the qualifying click is not a
  * conversion — with exact microsecond lag sums.
  */
class FunnelSpec extends SparkSuite {

  /** (user_id, event_type, μs): u1 completes; u2's only click
    * precedes its view (stops at view); u3 never clicks (its
    * purchase can't count); u4 purchases BEFORE its click (stops at
    * click); u5 never views (enters no step).
    */
  private def fixture: Seq[(Long, String, Long)] = Seq(
    (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
    (2L, "click", 5L), (2L, "view", 10L),
    (3L, "view", 10L), (3L, "purchase", 15L),
    (4L, "view", 10L), (4L, "click", 12L), (4L, "purchase", 11L),
    (5L, "click", 5L), (5L, "purchase", 6L)
  ).map { case (u, t, sec) => (u, t, sec * 1000000L) }

  test("ordering constraint and exact lag sums") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    fixture.toDF("user_id", "event_type", "us")
      .select($"user_id", $"event_type",
        expr("timestamp_micros(us)").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q151_event_funnel")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    // step 1: u1..u4 viewed; step 2: u1 (click@20 > view@10) and u4
    // (click@12 > view@10); step 3: u1 only (u4's purchase@11 < its
    // qualifying click@12). Lags: l2 = (20-10)+(12-10) s, l3 = 30-20 s.
    val want = Seq(
      (1L, "view", 4L, 0L),
      (2L, "click", 2L, 12L * 1000000L),
      (3L, "purchase", 1L, 10L * 1000000L))
    assert(got == want, s"got $got\nwant $want")
  }
}
