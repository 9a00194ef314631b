package graft

import graft.ops.Warc

/** ops.Warc: Content-Length framing (a payload that CONTAINS
  * "WARC/1.0" and blank lines must not split a record), multi-record
  * files, header case-insensitivity, HTTP envelope stripping, and the
  * stop-at-last-whole-record contract on truncated tails.
  */
class WarcSpec extends SparkSuite {

  private def rec(wtype: String, uri: String, payload: String,
      extra: String = ""): String = {
    val n = payload.getBytes("UTF-8").length
    s"WARC/1.0\r\nWARC-Type: $wtype\r\nWARC-Target-URI: $uri\r\n" +
      extra + s"Content-Length: $n\r\n\r\n" + payload + "\r\n\r\n"
  }

  test("Content-Length framing survives adversarial payloads") {
    // payload 1 embeds a fake record head AND a blank line — any
    // delimiter-split parser shreds this
    val evil = "before\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nafter"
    val blob = (rec("response", "https://a/1", evil) +
      rec("metadata", "https://a/1", "len: 7\r\n") +
      rec("response", "https://a/2", "plain body")).getBytes("UTF-8")
    val got = Warc.parseFile("f", blob).toSeq
    assert(got.map(_.rec_no) === Seq(0L, 1L, 2L))
    assert(got.map(_.wtype) === Seq("response", "metadata", "response"))
    assert(got.head.body === evil, "payload must come back byte-exact")
    assert(got(2).uri === "https://a/2")
  }

  test("truncated tail stops at the last whole record") {
    val whole = rec("response", "https://a/1", "good")
    val cut = rec("response", "https://a/2", "this body is long").take(40)
    val got = Warc.parseFile("f", (whole + cut).getBytes("UTF-8")).toSeq
    assert(got.length === 1 && got.head.body === "good")
    // missing Content-Length also stops the parse, loudly empty-handed
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
    assert(Warc.parseFile("g", noLen.getBytes("UTF-8")).isEmpty)
  }

  test("headers are case-insensitive; HTTP envelope strips exactly once") {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>hi</p>\r\n\r\nrest"
    val blob = ("WARC/1.0\r\nwarc-type: response\r\nwArC-tArGeT-uRi: u\r\n" +
      s"content-length: ${http.getBytes("UTF-8").length}\r\n\r\n" + http + "\r\n\r\n")
      .getBytes("UTF-8")
    val got = Warc.parseFile("f", blob).toSeq
    assert(got.head.wtype === "response" && got.head.uri === "u")
    val (status, body) = Warc.httpBody(got.head.body)
    assert(status === "HTTP/1.1 200 OK")
    assert(body === "<p>hi</p>\r\n\r\nrest", "only the FIRST blank line separates envelope")
    // non-HTTP body passes through untouched
    assert(Warc.httpBody("no envelope") === (("", "no envelope")))
  }

  test("httpStatusCol/httpBodyCol ≡ httpBody on every envelope shape") {
    import spark.implicits._
    val bodies = Seq(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>enveloped</p>",
      "<html>no envelope at all</html>",
      "bare body with a\r\n\r\nblank line but no HTTP prefix", // must pass WHOLE
      "HTTP/1.1 200 OK no blank line anywhere",              // malformed: pass whole
      "")
    val got = bodies.toDF("body")
      .select(Warc.httpStatusCol(org.apache.spark.sql.functions.col("body")).as("s"),
        Warc.httpBodyCol(org.apache.spark.sql.functions.col("body")).as("b"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === bodies.map(Warc.httpBody),
      "the Column form must match the byte-tier helper exactly")
  }

  test("records() runs the parser through the Spark batch contract") {
    import spark.implicits._
    val blobs = Seq(
      ("f1", (rec("response", "https://a/1", "b1") +
        rec("response", "https://a/2", "b2")).getBytes("UTF-8")),
      ("f2", rec("warcinfo", "", "software: graft\r\n").getBytes("UTF-8")))
    val got = Warc.records(blobs.toDF("file", "bytes"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got === Set(("f1", 0L, "response"), ("f1", 1L, "response"),
      ("f2", 0L, "warcinfo")))
  }
}
