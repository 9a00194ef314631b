package graft

import graft.ops.Warc

/** ops.Warc: Content-Length framing (a payload that CONTAINS
  * "WARC/1.0" and blank lines must not split a record), multi-record
  * files, header case-insensitivity, HTTP envelope stripping, the
  * stop-at-last-whole-record contract on truncated tails, gzip
  * member-per-record inflation, charset-aware body decoding, and the
  * per-file parse audit (fileAudit) that quarantine feeds on.
  */
class WarcSpec extends SparkSuite {

  private def rec(wtype: String, uri: String, payload: String,
      extra: String = ""): String = {
    val n = payload.getBytes("UTF-8").length
    s"WARC/1.0\r\nWARC-Type: $wtype\r\nWARC-Target-URI: $uri\r\n" +
      extra + s"Content-Length: $n\r\n\r\n" + payload + "\r\n\r\n"
  }

  private def recBytes(wtype: String, uri: String, payload: Array[Byte]): Array[Byte] = {
    (s"WARC/1.0\r\nWARC-Type: $wtype\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("US-ASCII") ++
      payload ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
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

  test("gzip: member-per-record .warc.gz inflates to the plain parse") {
    // the Common Crawl layout — one gzip MEMBER per record, members
    // concatenated; the adversarial payload rides inside a member
    val evil = "inner\r\n\r\nWARC/1.0\r\nfake\r\n\r\ntail"
    val plain = rec("response", "https://g/1", evil) +
      rec("metadata", "https://g/1", "fetch-ms: 3\r\n") +
      rec("response", "https://g/2", "second page")
    val gzBytes = gz(rec("response", "https://g/1", evil).getBytes("UTF-8")) ++
      gz(rec("metadata", "https://g/1", "fetch-ms: 3\r\n").getBytes("UTF-8")) ++
      gz(rec("response", "https://g/2", "second page").getBytes("UTF-8"))
    val want = Warc.parseFile("f", plain.getBytes("UTF-8")).toSeq
    val got = Warc.parseFile("f", gzBytes).toSeq
    assert(got === want, "gzip members must inflate to the identical record stream")
    assert(got.map(_.body) === Seq(evil, "fetch-ms: 3\r\n", "second page"))
    // whole-file single-member gzip (also legal) parses identically
    val got1 = Warc.parseFile("f", gz(plain.getBytes("UTF-8"))).toSeq
    assert(got1 === want)
  }

  test("corrupt gzip member stops at the last whole record, flagged") {
    val good = gz(rec("response", "https://g/1", "ok body").getBytes("UTF-8"))
    // second member: gzip magic + garbage — an IOException mid-inflate
    val corrupt = Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0,
      42, 42, 42, 42, 42, 42)
    val c = new Warc.Cursor("f", good ++ corrupt, decodeBodies = true)
    val got = c.toSeq
    assert(got.map(_.body) === Seq("ok body"))
    assert(c.truncated, "dropped member must flag the file")
  }

  test("corrupt FIRST gzip member flags without throwing (constructor hazard)") {
    // GZIPInputStream reads the first member's header in its
    // constructor — bare magic bytes or a bad compression method must
    // stop-and-flag, not crash the task (r15 self-review catch)
    val bareMagic = Array[Byte](0x1f, 0x8b.toByte)
    val badMethod = Array[Byte](0x1f, 0x8b.toByte, 0x07, 0, 0, 0, 0, 0, 0, 0)
    Seq(bareMagic, badMethod).foreach { bytes =>
      val c = new Warc.Cursor("f", bytes, decodeBodies = true)
      assert(c.toSeq.isEmpty && c.truncated)
    }
    import spark.implicits._
    val got = Warc.fileAudit(Seq(("bad.warc.gz", badMethod)).toDF("file", "bytes"))
      .collect().map(r => (r.getLong(2), r.getLong(3))).head
    assert(got === ((0L, 1L)), "audit must flag, not die")
  }

  test("recordsAudited ≡ records + fileAudit in one pass") {
    import spark.implicits._
    val clean = (rec("response", "https://a/1", "good") +
      rec("metadata", "https://a/1", "m\r\n")).getBytes("UTF-8")
    val partial = (rec("response", "https://a/2", "ok") +
      rec("response", "https://a/3", "this is cut").take(35)).getBytes("UTF-8")
    val df = Seq(("clean", clean), ("partial", partial), ("gz", gz(clean)))
      .toDF("file", "bytes")
    val combined = Warc.recordsAudited(df)
    val recRows = combined.filter("is_audit = 0")
      .selectExpr("file", "rec_no", "wtype", "uri", "body")
    val wantRecs = Warc.records(df)
    assert(recRows.collect().map(_.toSeq).toSet === wantRecs.collect().map(_.toSeq).toSet)
    val auditRows = combined.filter("is_audit = 1")
      .selectExpr("file", "n_bytes", "n_records", "truncated")
    val wantAudit = Warc.fileAudit(df)
    assert(auditRows.collect().map(_.toSeq).toSet === wantAudit.collect().map(_.toSeq).toSet)
    // exactly one trailer per file
    assert(combined.filter("is_audit = 1").count() === 3L)
  }

  test("charset: declared latin-1 round-trips; windows-1252 fallback; utf-8 fast path") {
    val latin1Text = "café au lait, señor"
    val latin1 = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n\r\n")
      .getBytes("US-ASCII") ++ latin1Text.getBytes("ISO-8859-1")
    // undeclared charset + bytes that are invalid UTF-8 → cp1252
    val cp1252Text = "90° — “smart”"
    val undeclared = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
      .getBytes("US-ASCII") ++ cp1252Text.getBytes("windows-1252")
    // proper UTF-8 without declaration stays UTF-8 (the fast path)
    val utf8Text = "naïve 日本語"
    val utf8 = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
      .getBytes("US-ASCII") ++ utf8Text.getBytes("UTF-8")
    // a bogus declared charset falls back to cp1252, not an exception
    val bogus = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=no-such-cs\r\n\r\n"
      .getBytes("US-ASCII") ++ "plain ascii".getBytes("US-ASCII")
    val blob = recBytes("response", "u1", latin1) ++
      recBytes("response", "u2", undeclared) ++
      recBytes("response", "u3", utf8) ++
      recBytes("response", "u4", bogus)
    val got = Warc.parseFile("f", blob).toSeq
    assert(got.map(r => Warc.httpBody(r.body)._2) ===
      Seq(latin1Text, cp1252Text, utf8Text, "plain ascii"))
    // non-HTTP record bodies: strict utf-8, cp1252 on failure
    val nonHttp = recBytes("metadata", "m1", utf8Text.getBytes("UTF-8")) ++
      recBytes("metadata", "m2", latin1Text.getBytes("ISO-8859-1"))
    val got2 = Warc.parseFile("g", nonHttp).toSeq
    assert(got2.head.body === utf8Text)
    assert(got2(1).body === new String(latin1Text.getBytes("ISO-8859-1"), "windows-1252"))
  }

  test("fileAudit: clean, zero-record, and partial-parse files") {
    import spark.implicits._
    val clean = rec("response", "https://a/1", "good").getBytes("UTF-8")
    val zero = "WARC/1.0\r\nWARC-Type: response\r\n\r\nno length\r\n\r\n".getBytes("UTF-8")
    val partial = (rec("response", "https://a/1", "good") +
      rec("response", "https://a/2", "this body is long").take(40)).getBytes("UTF-8")
    val gzClean = gz(clean)
    val df = Seq(("clean", clean), ("zero", zero), ("partial", partial),
      ("gzclean", gzClean)).toDF("file", "bytes")
    val got = Warc.fileAudit(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got("clean") === ((1L, 0L)))
    assert(got("zero") === ((0L, 1L)), "unframeable file: 0 records, truncated")
    assert(got("partial") === ((1L, 1L)),
      "partial parse must be flagged — silence here under-ingests (r14 advice)")
    assert(got("gzclean") === ((1L, 0L)))
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
