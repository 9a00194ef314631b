package graft

/** q148_substring_flow (cross-source shared-passage matrix): a
  * passage planted in two sources must produce exactly one matrix
  * row with the right carrier counts; a passage repeated only WITHIN
  * one source must not appear (the matrix reports cross-source flow,
  * not self-boilerplate); and the whole output must equal a JVM
  * replica that rebuilds the aligned-block/source algebra from first
  * principles (block text as identity — md5 is injective on the
  * fixture).
  */
class SubstringFlowSpec extends SparkSuite {

  private val passP = (1 to 10).map(i => s"flow$i").mkString(" ")
  private val passQ = (1 to 10).map(i => s"self$i").mkString(" ")

  /** (doc_id, text, source): P flows A→B (two carriers in A, one in
    * B); Q repeats within A only; C is clean. Tails are unique and
    * < 10 tokens, so each doc's second block is its own.
    */
  private def fixture: Seq[(Long, String, String)] = Seq(
    (0L, passP + " " + (1 to 5).map(i => s"ta$i").mkString(" "), "srcA"),
    (1L, passP + " " + (1 to 5).map(i => s"tb$i").mkString(" "), "srcA"),
    (2L, passP + " " + (1 to 5).map(i => s"tc$i").mkString(" "), "srcB"),
    (3L, passQ + " " + (1 to 5).map(i => s"td$i").mkString(" "), "srcA"),
    (4L, passQ + " " + (1 to 5).map(i => s"te$i").mkString(" "), "srcA"),
    (5L, (1 to 12).map(i => s"cl$i").mkString(" "), "srcC"))

  private def run(docs: Seq[(Long, String, String)]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("flow").toString
    docs.toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    SparkEntry.queries("q148_substring_flow")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
  }

  /** First-principles replica: aligned 10-token blocks keyed by their
    * text, distinct (block, source, doc) triples, per-block source
    * pairs, carrier counts.
    */
  private def replica(docs: Seq[(Long, String, String)]): Set[(String, String, Long, Long, Long)] = {
    val bsd = docs.flatMap { case (id, t, src) =>
      val toks = t.split(" ").filter(_.nonEmpty)
      toks.grouped(10).map(b => (b.mkString(" "), src, id))
    }.distinct
    val bsrc = bsd.map(b => (b._1, b._2)).distinct
    val prs = for {
      (bh1, s1) <- bsrc; (bh2, s2) <- bsrc
      if bh1 == bh2 && s1 < s2
    } yield (bh1, s1, s2)
    prs.groupBy(p => (p._2, p._3)).map { case ((sa, sb), ps) =>
      val bhs = ps.map(_._1).toSet
      val da = bsd.collect { case (bh, s, id) if s == sa && bhs(bh) => id }.distinct.size
      val db = bsd.collect { case (bh, s, id) if s == sb && bhs(bh) => id }.distinct.size
      (sa, sb, bhs.size.toLong, da.toLong, db.toLong)
    }.toSet
  }

  test("planted cross-source passage yields one row; within-source passage none") {
    val got = run(fixture)
    assert(got == Set(("srcA", "srcB", 1L, 2L, 1L)), s"got $got")
    assert(got == replica(fixture))
  }

  test("matrix ≡ replica on a denser mixed fixture") {
    // P in all three sources, Q in A+C, plus within-source repeats
    val docs = Seq(
      (0L, passP + " ua ub uc", "srcA"),
      (1L, passP + " ud ue uf", "srcB"),
      (2L, passP + " ug uh ui", "srcC"),
      (3L, passQ + " uj uk ul", "srcA"),
      (4L, passQ + " um un uo", "srcC"),
      (5L, passQ + " up uq ur", "srcC"),
      (6L, passP + " us ut uu", "srcA"))
    val got = run(docs)
    val want = replica(docs)
    assert(got == want, s"got $got\nwant $want")
    // shape sanity: P links all three pairs, Q adds mass to A-C
    assert(got.map(r => (r._1, r._2)) ==
      Set(("srcA", "srcB"), ("srcA", "srcC"), ("srcB", "srcC")))
    val ac = got.find(r => r._1 == "srcA" && r._2 == "srcC").get
    assert(ac._3 == 2L, s"A-C must share both passages: $ac")
  }
}
