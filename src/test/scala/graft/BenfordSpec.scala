package graft

/** q156_benford (first-digit forensics): planted values pin the exact
  * digit extraction — sub-1 values keep their leading significant
  * digit through the decimal scaling, zeros and negatives are
  * excluded, absent digits report zero observed — and every χ² term
  * must equal the JVM chain on the same Benford literals.
  */
class BenfordSpec extends SparkSuite {
  import org.apache.spark.sql.functions.{expr, lit}

  private val P = Map(
    1L -> 0.3010299957, 2L -> 0.1760912591, 3L -> 0.1249387366,
    4L -> 0.0969100130, 5L -> 0.0791812460, 6L -> 0.0669467896,
    7L -> 0.0579919470, 8L -> 0.0511525224, 9L -> 0.0457574906)

  /** digits: 1×5 (incl. sub-1 0.19, 1000.0, and 9.99999 — which
    * quantizes to 10.0000 and takes digit 1 by the DECIMAL(18,4)
    * contract), 9×2 (incl. 0.9), 5×1; a zero, a negative, AND a
    * sub-quantization value (0.00004 → 0.0000: no digit, excluded
    * from n — the hidden-digit-0 distortion the round-10 review
    * caught) all excluded. */
  private def fixture: Seq[(Long, Double)] = Seq(
    (0L, 1.0), (1L, 10.5), (2L, 0.19), (3L, 1000.0), (9L, 9.99999),
    (4L, 0.9), (5L, 95.5),
    (6L, 5.25),
    (7L, 0.0), (8L, -3.2), (10L, 0.00004))

  test("digit extraction exact, exclusions honored, χ² ≡ replica") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("benford").toString
    fixture.toDF("event_id", "value")
      .select($"event_id", lit(1L).as("user_id"), lit("view").as("event_type"),
        expr("timestamp_micros(event_id * 1000000)").as("ts"),
        $"value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q156_benford")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))))
      .toMap
    assert(got.keySet == (1L to 9L).toSet, "all nine digits must report")
    val wantObs = Map(1L -> 5L, 9L -> 2L, 5L -> 1L).withDefaultValue(0L)
    val n = 8L
    (1L to 9L).foreach { d =>
      val (obs, tot, p, chi) = got(d)
      assert(obs == wantObs(d), s"digit $d observed $obs != ${wantObs(d)}")
      assert(tot == n)
      assert(p == P(d))
      val want = ((obs.toDouble - n.toDouble * P(d)) * (obs.toDouble - n.toDouble * P(d))) /
        (n.toDouble * P(d))
      assert(chi == want, s"digit $d chi $chi != $want")
    }
  }
}
