package graft

import org.apache.spark.sql.functions._

/** q180_attribution: one hand-built user journey per attribution
  * shape — touchless purchase ('none'), single-touch (first = last),
  * multi-touch (first ≠ last, exact μs lag), and a purchase whose
  * only preceding events are non-touches (errors count as nothing).
  */
class AttributionSpec extends SparkSuite {

  test("first/last touch, prior counts and lags ≡ hand computation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("attr").toString
    // (event_id, us, user_id, type). user 1: view @1s, click @3s,
    // purchase @10s → first=view last=click lag=7s, n_prior=2.
    // user 2: purchase @5s with no prior events → none/none.
    // user 3: signup @1s, purchase @2s → signup/signup lag=1s.
    // user 4: error @1s, purchase @4s → none/none (error not a touch).
    // user 1 second purchase @20s → still view/click, lag=17s, n=2.
    val evs = Seq(
      (101L, 1000000L, 1L, "view"),
      (102L, 3000000L, 1L, "click"),
      (103L, 10000000L, 1L, "purchase"),
      (104L, 20000000L, 1L, "purchase"),
      (201L, 5000000L, 2L, "purchase"),
      (301L, 1000000L, 3L, "signup"),
      (302L, 2000000L, 3L, "purchase"),
      (401L, 1000000L, 4L, "error"),
      (402L, 4000000L, 4L, "purchase"))
    evs.toDF("event_id", "us", "user_id", "event_type")
      .select($"event_id", expr("timestamp_micros(us)").as("ts"),
        $"user_id", $"event_type", lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q180_attribution")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got.size == 3, s"cells: ${got.keySet}")
    // user 1's two purchases share the view→click prefix
    assert(got(("view", "click")) ==
      ((2L, 4L, 7000000L + 17000000L, 12000000.0)))
    assert(got(("signup", "signup")) == ((1L, 1L, 1000000L, 1000000.0)))
    // users 2 and 4 both convert untouched
    assert(got(("none", "none")) == ((2L, 0L, 0L, 0.0)))
  }
}
