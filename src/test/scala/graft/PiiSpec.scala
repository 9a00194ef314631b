package graft

import org.apache.spark.sql.functions._

/** q79's redaction patterns against a fixture that actually CONTAINS
  * PII — the synthetic corpus oracle-checks the email/IP/phone counts
  * at zero, so this spec is where the rewrite itself is proven: each
  * pattern fires, the replacement token lands, and clean text passes
  * through byte-identical.
  */
class PiiSpec extends SparkSuite {

  private def redact(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("piifix").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    SparkEntry.queries("q79_pii_redact")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("each PII pattern fires and is counted on a real-PII fixture") {
    import spark.implicits._
    val out = redact(Seq(
      1L -> "contact bob.smith+spam@example.co.uk or jane@test.org today",
      2L -> "server at 10.0.255.3 answered, fallback 192.168.1.1 did not",
      3L -> "call 555-867-5309 or 555 123 4567 about the customer account",
      4L -> "perfectly clean text with no sensitive content at all"))
    assert(out(1L).getAs[Long]("n_email") === 2L)
    assert(out(2L).getAs[Long]("n_ip") === 2L)
    assert(out(3L).getAs[Long]("n_phone") === 2L)
    assert(out(3L).getAs[Long]("n_term") === 1L)
    assert(out(4L).getAs[Long]("n_email") + out(4L).getAs[Long]("n_ip") +
      out(4L).getAs[Long]("n_phone") + out(4L).getAs[Long]("n_term") === 0L)

    // the rewrite actually happened: the redacted text of doc 1 is the
    // original with both addresses replaced — pin via the exposed md5
    val expected1 = "contact <EMAIL> or <EMAIL> today"
    val expected3 = "call <PHONE> or <PHONE> about the <TERM> account"
    val md5Of = Seq(expected1, expected3).toDF("t")
      .select(md5($"t")).collect().map(_.getString(0))
    assert(out(1L).getAs[String]("red_md5") === md5Of(0))
    assert(out(1L).getAs[Long]("red_len") === expected1.length.toLong)
    assert(out(3L).getAs[String]("red_md5") === md5Of(1))

    // clean text passes through byte-identical
    val clean = "perfectly clean text with no sensitive content at all"
    val cleanMd5 = Seq(clean).toDF("t").select(md5($"t")).collect()(0).getString(0)
    assert(out(4L).getAs[String]("red_md5") === cleanMd5)
    assert(out(4L).getAs[Long]("red_len") === clean.length.toLong)
  }
}
