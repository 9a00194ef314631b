package graft

/** q157_source_report (per-source curation report card): sources
  * engineered with distinct failure profiles — one gate-fodder + a
  * clone pair, one mirror-heavy (near-dup pair), one clean — and the
  * whole card must equal a JVM replica of the q118 bucket assignment
  * grouped by source with token accounting.
  */
class SourceReportSpec extends SparkSuite {

  private val baseP =
    ("the quick brown fox jumps over the lazy dog while counting " * 4).take(230)
  private val baseP2 =
    ("one of many winding rivers flows gently beneath ancient stone bridges today " * 3).take(230)

  private def fixture: Seq[(Long, String, String)] = Seq(
    (0L, "tiny", "srcA"),                    // gate drop
    (1L, baseP, "srcA"),                     // kept canonical
    (2L, baseP, "srcA"),                     // exact drop
    (3L, baseP2, "srcB"),                    // kept canonical
    (4L, "zz " + baseP2.take(197), "srcB"),  // near drop
    (5L, "the " + (1 to 39).map(i => "pa" + ('a' + i % 26).toChar + ('a' + i / 26).toChar).mkString(" "), "srcC"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def gatePass(t: String): Boolean =
    t.length >= 30 &&
      "\\b(the|a|and|of|to|in)\\b".r.findFirstIn(t.toLowerCase).isDefined

  private def tok(t: String): Long = t.split(" ").count(_.nonEmpty).toLong

  test("per-source cells ≡ replica; profiles land as planted") {
    import spark.implicits._
    val docs = fixture
    val dir = java.nio.file.Files.createTempDirectory("srep").toString
    docs.toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val pairs = graft.queries.Llm.minhashLshPairs(
      spark.read.parquet(s"$dir/documents.parquet"), 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nearDropped = pairs.map(_._2).toSet
    val gated = docs.filter(d => gatePass(d._2))
    val canon = gated
      .groupBy(d => md5hex(d._2.toLowerCase.replaceAll("\\s+", " ").trim))
      .map { case (_, ds) => ds.map(_._1).min -> ds.map(_._1).toSet }
    def reason(id: Long, t: String): Option[String] =
      if (!gatePass(t)) Some("quality_gate")
      else if (canon.exists { case (c, ms) => ms(id) && c < id }) Some("exact_dup")
      else if (nearDropped(id)) Some("near_dup")
      else None
    val want = docs.groupBy(_._3).map { case (src, ds) =>
      val rs = ds.map(d => (reason(d._1, d._2), tok(d._2)))
      src -> ((ds.size.toLong,
        rs.count(_._1.contains("quality_gate")).toLong,
        rs.count(_._1.contains("exact_dup")).toLong,
        rs.count(_._1.contains("near_dup")).toLong,
        rs.count(_._1.isEmpty).toLong,
        rs.map(_._2).sum,
        rs.collect { case (None, n) => n }.sum))
    }
    val got = SparkEntry.queries("q157_source_report")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    assert(got == want, s"got $got\nwant $want")
    // planted profiles: A drops to gate+exact, B is mirror-heavy,
    // C keeps everything
    assert(got("srcA")._2 == 1L && got("srcA")._3 == 1L && got("srcA")._5 == 1L)
    assert(got("srcB")._4 == 1L && got("srcB")._5 == 1L)
    assert(got("srcC") == ((1L, 0L, 0L, 0L, 1L, 40L, 40L)))
  }
}
