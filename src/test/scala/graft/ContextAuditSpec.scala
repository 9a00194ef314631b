package graft

/** q150_context_audit (context-length policy costs): boundary-exact
  * fixture — empty doc, single token, exactly L, L+1, far over L —
  * checked cell by cell against a JVM integer replica of the three
  * policies (truncate / split+pad / concat), including the ceiling
  * algebra at the boundaries.
  */
class ContextAuditSpec extends SparkSuite {

  private def docOf(n: Int): String = Seq.fill(n)("w").mkString(" ")

  private def fixture: Seq[(Long, String)] = Seq(
    (0L, ""),            // 0 tokens: 0 sequences under every policy
    (1L, docOf(1)),
    (2L, docOf(512)),    // exactly one 512-context: no pad, no truncation
    (3L, docOf(513)),    // one token over
    (4L, docOf(8192)),
    (5L, docOf(10000)))

  test("per-L cells ≡ integer replica; boundaries exact") {
    import spark.implicits._
    val docs = fixture
    val dir = java.nio.file.Files.createTempDirectory("ctx").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val ns = docs.map(d => d._2.split(" ").count(_.nonEmpty).toLong)
    def ceilDiv(a: Long, b: Long) = (a + b - 1) / b
    val want = Seq(512L, 1024L, 2048L, 8192L).map { l =>
      val splitSeqs = ns.map(n => ceilDiv(n, l)).sum
      val total = ns.sum
      (l, ns.size.toLong, total,
        ns.count(_ > l).toLong,
        ns.map(n => math.max(n - l, 0L)).sum,
        splitSeqs,
        splitSeqs * l - total,
        ceilDiv(total, l))
    }.toSet
    val got = SparkEntry.queries("q150_context_audit")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSet
    assert(got == want, s"got $got\nwant $want")
    // boundary spot-checks at L=512: doc2 contributes one full
    // sequence (no pad), doc3 two sequences (511 pad) and one lost
    // token under truncation
    val at512 = got.find(_._1 == 512L).get
    assert(at512._4 == 3L, s"n_over@512: $at512")        // 513, 8192, 10000
    assert(at512._5 == (1L + 7680L + 9488L), s"trunc@512: $at512")
  }
}
