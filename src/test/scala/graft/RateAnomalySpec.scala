package graft

import org.apache.spark.sql.functions._

/** q153_rate_anomaly (exact-integer 3σ hourly spike alarm): a planted
  * 25× spike over 20 flat baseline hours must be the ONLY flagged
  * cell of its type, a perfectly flat type must flag nothing (zero
  * variance means lhs = rhs = 0, and the test is strict), and every
  * cell's cross-multiplied lhs/rhs must equal the integer algebra
  * recomputed in the JVM.
  */
class RateAnomalySpec extends SparkSuite {

  private val HourUs = 3600000000L

  /** "error": 2 events/hour for 20 hours, then one 50-event hour.
    * "click": 3 events/hour for 10 hours (flat — no alarm possible).
    */
  private def fixture: Seq[(Long, String, Long)] = {
    val err = (0 until 20).flatMap(h =>
      (0 until 2).map(i => (100L + h, "error", h * HourUs + i * 1000L))) ++
      (0 until 50).map(i => (300L, "error", 20 * HourUs + i * 1000L))
    val clk = (0 until 10).flatMap(h =>
      (0 until 3).map(i => (400L + h, "click", h * HourUs + i * 1000L)))
    err ++ clk
  }

  test("planted spike is the only flag; flat type silent; algebra exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("anom").toString
    fixture.toDF("user_id", "event_type", "us")
      .select($"user_id", $"event_type", expr("timestamp_micros(us)").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("q153_rate_anomaly")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    // moments per type, replica-side
    val byType = rows.groupBy(_._1)
    assert(byType.keySet == Set("error", "click"))
    byType.foreach { case (t, cells) =>
      val h = cells.size.toLong
      val s = cells.map(_._2).sum
      val q = cells.map(c => c._2 * c._2).sum
      cells.foreach { case (_, n, lhs, rhs, flag) =>
        assert(lhs == (h * n - s) * (h * n - s), s"$t lhs at n=$n")
        assert(rhs == 9L * (h * q - s * s), s"$t rhs at n=$n")
        assert(flag == (if (lhs > rhs) 1L else 0L))
      }
    }
    val errFlags = byType("error").filter(_._5 == 1L)
    assert(errFlags.map(_._2).toSeq == Seq(50L),
      s"only the 50-event hour may flag: $errFlags")
    assert(byType("click").forall(_._5 == 0L), "flat type must not flag")
    // flat type really is degenerate: lhs = rhs = 0 everywhere
    assert(byType("click").forall(c => c._3 == 0L && c._4 == 0L))
  }
}
