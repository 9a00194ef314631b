package graft

import org.apache.spark.sql.functions._

/** q166_event_paths (top event-type trigrams): replica over planted
  * sequences — including the order-sensitivity the first-order matrix
  * cannot express (a→b→c vs c→b→a planted at different counts) and
  * the (ts, event_id) tie inherited from q163.
  */
class EventPathsSpec extends SparkSuite {

  /** u1..u3 walk a→b→c; u4 walks c→b→a; u5 has a tie at μs 20
    * (ids 52 before 53 ⇒ a→b→c, not a→c→b).
    */
  private val fixture: Seq[(Long, Long, String, Long)] = Seq(
    (1L, 1L, "a", 10L), (2L, 1L, "b", 20L), (3L, 1L, "c", 30L),
    (4L, 2L, "a", 10L), (5L, 2L, "b", 20L), (6L, 2L, "c", 30L),
    (7L, 3L, "a", 10L), (8L, 3L, "b", 20L), (9L, 3L, "c", 30L),
    (10L, 4L, "c", 10L), (11L, 4L, "b", 20L), (12L, 4L, "a", 30L),
    (51L, 5L, "a", 10L), (52L, 5L, "b", 20L), (53L, 5L, "c", 20L))

  test("trigram counts, ranks and shares ≡ replica") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("paths").toString
    fixture.toDF("event_id", "user_id", "event_type", "us")
      .select($"event_id", $"user_id", $"event_type",
        expr("timestamp_micros(us)").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = SparkEntry.queries("q166_event_paths")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getDouble(5)))
      .toSeq.sortBy(_._1)
    // a→b→c: u1,u2,u3 and u5 (tie resolves id 52 before 53) = 4;
    // c→b→a: u4 = 1; total trigrams = 5
    val want = Seq(
      (1L, "a", "b", "c", 4L, 4.0 / 5),
      (2L, "c", "b", "a", 1L, 1.0 / 5))
    assert(rows == want, s"got $rows")
  }
}
