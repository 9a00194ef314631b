package graft

import graft.functions.PctDecodeUnreserved
import org.apache.spark.unsafe.types.UTF8String

/** functions.PctDecodeUnreserved: single-pass unreserved percent-decode
  * ≡ the 84-step replace chain (the DuckDB oracle mirror) on valid
  * inputs; reserved octets stay encoded; malformed inputs decode
  * single-pass (each source octet at most once) where the chain would
  * cascade; codegen and interpreted paths agree.
  */
class PctDecodeSpec extends SparkSuite {

  private def d(s: String): String =
    PctDecodeUnreserved.decode(UTF8String.fromString(s)).toString

  test("unreserved octets decode in both hex cases; reserved stay encoded") {
    assert(d("%61rticles") === "articles")
    assert(d("%41%5A%61%7A%30%39") === "AZaz09")
    assert(d("%2D%2E%5F%7E") === "-._~")
    assert(d("%2d%2e%5f%7e") === "-._~") // lower hex
    assert(d("%4a%4A") === "JJ")
    // reserved/semantic octets must NOT decode
    assert(d("%2F%3F%25%23%26%3D") === "%2F%3F%25%23%26%3D")
    // no '%' at all: fast path returns the input
    assert(d("https://a.example.org/en/articles/1") ===
      "https://a.example.org/en/articles/1")
  }

  test("malformed inputs: single-pass, verbatim copy-through") {
    assert(d("%") === "%")
    assert(d("%4") === "%4")
    assert(d("%G1x") === "%G1x")
    assert(d("100%") === "100%")
    assert(d("%%41") === "%A")
    // THE divergence class the chain gets wrong: a decode must never
    // create a new decodable triplet ('%4' + decoded 'A' → '%4A' must
    // stay, not cascade to 'J')
    assert(d("%4%41") === "%4A")
  }

  test("≡ the replace-chain oracle mirror on valid inputs (all 84 codes)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    PctDecodeUnreserved.register(spark)
    // every unreserved code (both hex cases) + reserved codes +
    // literal runs, interleaved
    val codes = graft.queries.Mining.PctCodes.map(_._1) ++
      Seq("%2F", "%3F", "%25", "%2f")
    val rows = codes.zipWithIndex.map { case (c, i) =>
      s"/p$i/$c/x${c}y$c"
    } :+ "/plain/path/no/codes" :+ "/"
    val got = rows.toDF("s")
      .selectExpr("s", "pct_decode_unreserved(s) AS native",
        graft.queries.Mining.pctDecodeSql("s") + " AS chain")
      .collect()
    got.foreach { r =>
      assert(r.getString(1) === r.getString(2),
        s"native vs chain diverged on ${r.getString(0)}")
    }
  }

  test("whole-stage codegen covers the expression") {
    PctDecodeUnreserved.register(spark)
    // non-foldable input (range-derived) so the expression actually
    // runs inside generated code, not constant folding
    val q = spark.range(2)
      .selectExpr("pct_decode_unreserved(concat('%6', CAST(id + 1 AS STRING))) AS v")
    // '*(n)' is executedPlan.toString's WholeStageCodegen marker
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project"),
      q.queryExecution.executedPlan.toString)
    assert(q.collect().map(_.getString(0)).sorted.toSeq === Seq("a", "b"))
  }
}
