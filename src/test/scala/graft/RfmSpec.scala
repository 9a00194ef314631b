package graft

import org.apache.spark.sql.functions._

/** q154_rfm_segments (deterministic quartile segmentation): 8 users
  * engineered so recency, frequency and monetary all rank them
  * identically — the (rk−1)·4 div n cut must bucket them 2-per-
  * quartile into matching digit triples, with exact day recency and
  * exactly-representable decimal sums.
  */
class RfmSpec extends SparkSuite {

  private val DayUs = 86400000000L

  /** User u (1..8) fires u events on day u, each worth u.0 —
    * frequency u, monetary u², last day u (max day 8 → recency
    * 8 − u). All three metrics order users identically (8 best).
    */
  private def fixture: Seq[(Long, Long, Double)] =
    (1 to 8).flatMap { u =>
      (0 until u).map(i => (u.toLong, u * DayUs + i * 1000L, u.toDouble))
    }

  test("aligned metrics produce matching quartile digits, 2 users per bucket") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rfm").toString
    fixture.toDF("user_id", "us", "value")
      .select($"user_id", lit("purchase").as("event_type"),
        expr("timestamp_micros(us)").as("ts"), $"value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q154_rfm_segments")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7))))
      .toMap
    assert(got.size == 8)
    (1 to 8).foreach { u =>
      val bucket = (8 - u) / 2 + 1  // u=8,7 → 1; 6,5 → 2; 4,3 → 3; 2,1 → 4
      val want = ((8L - u, u.toLong, (u * u).toDouble,
        bucket.toLong, bucket.toLong, bucket.toLong, s"$bucket$bucket$bucket"))
      assert(got(u.toLong) == want, s"user $u: ${got(u.toLong)} != $want")
    }
  }
}
