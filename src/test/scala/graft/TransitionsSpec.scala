package graft

import org.apache.spark.sql.functions._

/** q163_event_transitions (first-order Markov matrix): planted
  * per-user sequences with a TS TIE broken by event_id — the
  * determinism contract — checked against a JVM replica (counts,
  * marginals, and each probability's single division).
  */
class TransitionsSpec extends SparkSuite {

  /** (event_id, user_id, event_type, μs). u1: a→b→c. u2: a→b twice
    * (a,b,a,b). u3 carries the tie: two events at μs=50 — event_id
    * order (7 then 8) decides b→a, then →c at 60. u4: singleton
    * (no transition).
    */
  private val fixture: Seq[(Long, Long, String, Long)] = Seq(
    (1L, 1L, "a", 10L), (2L, 1L, "b", 20L), (3L, 1L, "c", 30L),
    (4L, 2L, "a", 10L), (5L, 2L, "b", 20L),
    (6L, 2L, "a", 30L), (9L, 2L, "b", 40L),
    (7L, 3L, "b", 50L), (8L, 3L, "a", 50L), (10L, 3L, "c", 60L),
    (11L, 4L, "a", 99L))

  test("transition matrix ≡ replica; ties break on event_id") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("trans").toString
    fixture.toDF("event_id", "user_id", "event_type", "us")
      .select($"event_id", $"user_id", $"event_type",
        expr("timestamp_micros(us)").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val replica = fixture.groupBy(_._2).values.flatMap { evs =>
      val ordered = evs.sortBy(e => (e._4, e._1)).map(_._3)
      ordered.zip(ordered.drop(1))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromTotals = replica.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val want = replica.map { case ((f, t), n) =>
      (f, t, n, fromTotals(f), n.toDouble / fromTotals(f))
    }.toSet

    val rows = SparkEntry.queries("q163_event_transitions")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
      .toSet
    assert(rows == want, s"got $rows\nwant $want")
    // the tie pins the order: id 7 before 8 makes u3 contribute
    // b→a then a→c, so a→b = 3 (u1 + u2×2) and b→a = 2 (u2 + u3);
    // the wrong tie order would read a→b = 4, b→a = 1 instead
    assert(rows.exists(r => r._1 == "a" && r._2 == "b" && r._3 == 3L))
    assert(rows.exists(r => r._1 == "b" && r._2 == "a" && r._3 == 2L))
    assert(rows.exists(r => r._1 == "a" && r._2 == "c" && r._3 == 1L))
    // u4's singleton contributes nothing
    assert(rows.toSeq.map(_._3).sum == fixture.size - 4)
  }
}
