package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}

/** WARC (ISO 28500) record framing — the container format real web
  * corpora actually arrive in (Common Crawl; C4/RefinedWeb's §2 input
  * is WARC → HTTP payload → HTML → text): a WARC file is a
  * concatenation of records, each
  *
  * {{{
  * WARC/1.0\r\n
  * <header-name>: <value>\r\n ...
  * \r\n
  * <content block of exactly Content-Length BYTES>
  * \r\n\r\n
  * }}}
  *
  * Framing MUST honor `Content-Length` — a payload is arbitrary bytes
  * and can legally contain `WARC/1.0` or blank lines, so any
  * split-on-delimiter approach silently corrupts records (WarcSpec
  * plants exactly that payload). That rules out an in-row SQL parse;
  * this is a byte-level `mapPartitions` parser instead — per-file,
  * iterator-to-iterator, LAZY: records stream out of a cursor one at
  * a time (one record in flight beyond the source blob — the
  * [[Multimodal]] batch contract), which at 100 TB is the
  * `binaryFile`-source scan shape: files parallelize across tasks,
  * records stream out of each file, and nothing shuffles until the
  * caller says so. Oracle discipline (q211): the parse itself is not
  * SQL-replayable, but its EXPECTED OUTPUT on a synthesized corpus is
  * — DuckDB computes what the parse must yield from the source
  * documents, so a hash match proves the parser exactly inverts the
  * synthesis.
  *
  * '''Gzip''': Common Crawl ships `.warc.gz` — each record its own
  * gzip MEMBER, members concatenated (that per-record member layout is
  * what makes the format splittable). A file starting with the gzip
  * magic (1F 8B) is inflated member-by-member as the cursor advances
  * (`GZIPInputStream` chains concatenated members); record framing on
  * the inflated stream is byte-identical to the plain path. A corrupt
  * member stops the file's parse at the last whole record, flagged.
  *
  * '''Charset''' (HTTP payloads are NOT all UTF-8 — real crawls are
  * full of latin-1/windows-1252/gbk): a content block carrying an
  * HTTP envelope splits at the first blank line; the envelope decodes
  * as ISO-8859-1 (the HTTP header charset), the payload decodes with
  * the `charset=` parameter sniffed from the envelope's Content-Type,
  * strict UTF-8 when absent, and windows-1252 as the universal
  * fallback when the declared/attempted decode fails (the de-facto
  * web rule: windows-1252 decodes every byte, so nothing is dropped).
  * Blocks without an envelope take the strict-UTF-8 → windows-1252
  * path. Pure-ASCII corpora (q211's synthesis) decode identically
  * under every branch.
  *
  * Malformed tails (truncated record, bad/missing Content-Length,
  * missing line terminator, corrupt gzip member) stop the file's
  * parse at the last whole record rather than guessing — and
  * [[fileAudit]] reports per-file (n_bytes, n_records, truncated) so
  * a caller can quarantine BOTH zero-record files and partially
  * parsed ones (a truncated tail silently dropping records would
  * under-ingest without a trace — the round-14 advice).
  */
object Warc {

  /** One parsed record: file id, 0-based index in the file, WARC-Type,
    * WARC-Target-URI ('' when absent), and the content block decoded
    * per the charset rules above. */
  final case class Rec(
      file: String, rec_no: Long, wtype: String, uri: String, body: String)

  /** Per-file parse audit: total (compressed) bytes, whole records
    * parsed, and whether unparseable trailing data was dropped. */
  final case class Audit(
      file: String, n_bytes: Long, n_records: Long, truncated: Long)

  /** [[records]] and [[fileAudit]] fused into ONE row stream: record
    * rows (is_audit = 0, audit columns zeroed) followed by exactly one
    * per-file audit trailer (is_audit = 1, record columns blank). */
  final case class RecA(
      file: String, rec_no: Long, wtype: String, uri: String, body: String,
      n_bytes: Long, n_records: Long, truncated: Long, is_audit: Int)

  /** Parse every record of every (file, bytes) row. Output
    * (file, rec_no, wtype, uri, body). */
  def records(df: DataFrame, fileCol: String = "file",
      bytesCol: String = "bytes"): DataFrame = {
    val s = df.sparkSession
    val in = df.selectExpr(s"$fileCol AS file", s"$bytesCol AS bytes")
      .as(Encoders.tuple(Encoders.STRING, Encoders.BINARY))
    val out = in.mapPartitions { it =>
      it.flatMap { case (file, bytes) => parseFile(file, bytes) }
    }(Encoders.product[Rec])
    out.toDF()
  }

  /** Records AND the per-file audit in ONE decompress+frame pass —
    * the hot-ingest shape ([[graft.streaming.StreamIngest]]): on
    * gzipped crawls inflation dominates per-byte cost, so running
    * [[records]] then [[fileAudit]] would decompress every file
    * twice. Each file's record rows stream out first; its audit
    * trailer (is_audit = 1, carrying n_bytes / n_records / truncated)
    * is emitted lazily AFTER the cursor exhausts, so the pass stays
    * one-record-in-flight. */
  def recordsAudited(df: DataFrame, fileCol: String = "file",
      bytesCol: String = "bytes"): DataFrame = {
    val s = df.sparkSession
    val in = df.selectExpr(s"$fileCol AS file", s"$bytesCol AS bytes")
      .as(Encoders.tuple(Encoders.STRING, Encoders.BINARY))
    val out = in.mapPartitions { it =>
      it.flatMap { case (file, bytes) =>
        val c = new Cursor(file, bytes, decodeBodies = true)
        c.map(r => RecA(file, r.rec_no, r.wtype, r.uri, r.body, 0L, 0L, 0L, 0)) ++ {
          // by-name ++ operand: evaluated only after c exhausts, so
          // recCount/truncated are final
          Iterator.single(RecA(file, -1L, "", "", "", bytes.length.toLong,
            c.recCount, if (c.truncated) 1L else 0L, 1))
        }
      }
    }(Encoders.product[RecA])
    out.toDF()
  }

  /** Per-file parse AUDIT — (file, n_bytes, n_records, truncated):
    * the quarantine feed. Re-runs the frame cursor with body decoding
    * skipped (framing only — the cheap half), so the caller never has
    * to materialize record rows just to learn which files were
    * short-changed. truncated = 1 when the file carried bytes the
    * parser had to drop (mid-record EOF, bad Content-Length, corrupt
    * gzip member, missing terminator). */
  def fileAudit(df: DataFrame, fileCol: String = "file",
      bytesCol: String = "bytes"): DataFrame = {
    val s = df.sparkSession
    val in = df.selectExpr(s"$fileCol AS file", s"$bytesCol AS bytes")
      .as(Encoders.tuple(Encoders.STRING, Encoders.BINARY))
    val out = in.mapPartitions { it =>
      it.map { case (file, bytes) =>
        val c = new Cursor(file, bytes, decodeBodies = false)
        var n = 0L
        while (c.hasNext) { c.next(); n += 1 }
        Audit(file, bytes.length.toLong, n, if (c.truncated) 1L else 0L)
      }
    }(Encoders.product[Audit])
    out.toDF()
  }

  /** Strip an HTTP response envelope from a record body: everything
    * after the first blank line. Returns the body unchanged when no
    * envelope is present ('' status). */
  def httpBody(body: String): (String, String) = {
    val sep = body.indexOf("\r\n\r\n")
    if (sep < 0 || !body.startsWith("HTTP/")) ("", body)
    else {
      val eol = body.indexOf("\r\n")
      (body.substring(0, eol), body.substring(sep + 4))
    }
  }

  /** [[httpBody]]'s semantics as Columns — THE envelope strip every
    * frame-side consumer (q211, [[graft.streaming.StreamIngest]])
    * must use. Both guards matter: without the `HTTP/` prefix check a
    * bare-HTML body containing any blank line is truncated at it, and
    * without the locate > 0 check a no-envelope body loses its first
    * 3 characters (locate returns 0 on no match; substring(0+4)).
    */
  def httpStatusCol(body: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(isHttp(body), regexp_extract(body, "^(HTTP/[^\\r\\n]*)", 1)).otherwise(lit(""))
  }

  def httpBodyCol(body: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(isHttp(body),
      body.substr(locate("\r\n\r\n", body) + lit(4), length(body)))
      .otherwise(body)
  }

  private def isHttp(body: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    body.startsWith("HTTP/") && locate("\r\n\r\n", body) > 0
  }

  /** Lazy record iterator over one file's bytes (plain or gzipped). */
  private[graft] def parseFile(file: String, bytes: Array[Byte]): Iterator[Rec] =
    new Cursor(file, bytes, decodeBodies = true)

  /** The streaming frame cursor: inflates (when gzipped) and frames
    * records one at a time — nothing is buffered beyond the record in
    * flight. `truncated` is valid once the cursor is exhausted.
    */
  private[graft] final class Cursor(
      file: String, bytes: Array[Byte], decodeBodies: Boolean)
      extends Iterator[Rec] {

    // LAZY: GZIPInputStream reads the first member's header in its
    // constructor, so a file whose FIRST member is corrupt/truncated
    // (bare magic bytes, bad compression method) would otherwise throw
    // OUTSIDE advance()'s catch and crash the task — including the
    // audit pass whose whole job is flagging such files. A failed lazy
    // init rethrows on access, which advance() catches once → done +
    // flagged, 0 records (WarcSpec pins it).
    private lazy val in: java.io.PushbackInputStream = {
      val raw = new java.io.ByteArrayInputStream(bytes)
      val src: java.io.InputStream =
        if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
          new java.util.zip.GZIPInputStream(raw, 1 << 16)
        else raw
      new java.io.PushbackInputStream(src, 1)
    }

    private var pending: Rec = _
    private var done = false
    private var _truncated = false
    private var n = 0L

    /** Bytes the parser had to drop (valid after exhaustion). */
    def truncated: Boolean = _truncated

    /** Whole records emitted so far (the audit count once exhausted). */
    def recCount: Long = n

    override def hasNext: Boolean = {
      if (pending == null && !done) advance()
      pending != null
    }

    override def next(): Rec = {
      if (!hasNext) throw new NoSuchElementException("WARC cursor exhausted")
      val r = pending; pending = null; r
    }

    /** Parse the next whole record into `pending`, or mark done
      * (setting `_truncated` when trailing bytes had to be dropped). */
    private def advance(): Unit = try {
      // skip inter-record padding (blank lines), find the version line
      var version: String = null
      while (version == null && !done) readLine() match {
        case null => done = true // clean EOF at a record boundary
        case "" => () // padding
        case line =>
          if (line.startsWith("WARC/")) version = line
          else { done = true; _truncated = true } // garbage between records
      }
      if (done) return
      // headers up to the blank line
      var wtype = ""; var uri = ""; var clen = -1L
      var headersDone = false
      while (!headersDone) readLine() match {
        case null => done = true; _truncated = true; return // EOF mid-headers
        case "" => headersDone = true
        case line =>
          val i = line.indexOf(':')
          if (i > 0) {
            val k = line.substring(0, i).trim.toLowerCase
            val v = line.substring(i + 1).trim
            k match {
              case "warc-type" => wtype = v
              case "warc-target-uri" => uri = v
              case "content-length" => clen = v.toLongOption.getOrElse(-1L)
              case _ => ()
            }
          }
      }
      if (clen < 0 || clen > Int.MaxValue) { done = true; _truncated = true; return }
      val block = in.readNBytes(clen.toInt)
      if (block.length < clen) { done = true; _truncated = true; return }
      pending = Rec(file, n, wtype, uri, if (decodeBodies) decodeBody(block) else "")
      n += 1
    } catch {
      // corrupt gzip member (or any stream fault): stop at the last
      // whole record, loudly flagged for the audit
      case _: java.io.IOException => done = true; _truncated = true
    }

    /** The \r\n-terminated line at the cursor → its text; "" for a
      * blank line; null at clean EOF BEFORE any byte. EOF after bytes
      * but before the terminator is a truncated tail (flag + stop,
      * reported as null with `done` set by the caller seeing
      * `_truncated`). A lone \r (not followed by \n) is line content.
      */
    private def readLine(): String = {
      val buf = new java.io.ByteArrayOutputStream(128)
      var b = in.read()
      if (b < 0) return null // clean EOF
      while (b >= 0) {
        if (b == '\r') {
          val c = in.read()
          if (c == '\n')
            return new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
          if (c >= 0) in.unread(c)
          buf.write(b)
        } else buf.write(b)
        b = in.read()
      }
      // bytes but no terminator: truncated tail
      _truncated = true
      null
    }
  }

  // ----------------------------------------------------------- charset

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")
  private val CharsetParam =
    java.util.regex.Pattern.compile(
      "(?i)content-type:[^\\r\\n]*?charset=\"?([A-Za-z0-9_\\-]+)\"?")

  /** Decode one content block per the object-doc charset rules. */
  private[graft] def decodeBody(block: Array[Byte]): String = {
    if (!startsWithAscii(block, "HTTP/")) return strictUtf8OrCp1252(block)
    val sep = indexOfCrlfCrlf(block)
    if (sep < 0) return strictUtf8OrCp1252(block)
    val envelope = new String(block, 0, sep, Latin1)
    val payload = java.util.Arrays.copyOfRange(block, sep + 4, block.length)
    val m = CharsetParam.matcher(envelope)
    val decoded =
      if (m.find()) decodeDeclared(m.group(1), payload)
      else strictUtf8OrCp1252(payload)
    envelope + "\r\n\r\n" + decoded
  }

  /** Declared charset, strictly; windows-1252 when the name is
    * unknown or the bytes don't conform to it. */
  private def decodeDeclared(name: String, b: Array[Byte]): String =
    try strictDecode(java.nio.charset.Charset.forName(name), b)
    catch { case scala.util.control.NonFatal(_) => new String(b, Cp1252) }

  /** UTF-8 fast path (strict); windows-1252 fallback — never lossy,
    * never throws (every byte maps). */
  private def strictUtf8OrCp1252(b: Array[Byte]): String =
    try strictDecode(Utf8, b)
    catch { case scala.util.control.NonFatal(_) => new String(b, Cp1252) }

  private def strictDecode(cs: java.nio.charset.Charset, b: Array[Byte]): String =
    cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      .decode(java.nio.ByteBuffer.wrap(b))
      .toString

  private def startsWithAscii(b: Array[Byte], p: String): Boolean = {
    if (b.length < p.length) return false
    var i = 0
    while (i < p.length) { if (b(i) != p.charAt(i).toByte) return false; i += 1 }
    true
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }
}
