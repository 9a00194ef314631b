package graft

/** q144_dedup_overlap (strategy Venn audit): planted fixtures exercise
  * every interesting cell — an exact clone (flagged by exact AND
  * near), a paraphrase (near only), a shared-passage trio (boiler
  * only), a clean doc (none), and a CASE variant that only the
  * NORMALIZED fingerprint catches (the audit runs q100's production
  * exact rule — lower/collapse-whitespace/trim before md5 — not
  * q20's raw md5; a raw rule would answer the exact-vs-near question
  * wrong for precisely the case/whitespace docs it is about) — with
  * the flags exactly as each underlying strategy (q100's keep-first
  * rule, q85's drop set, q110's ≥3-doc blocks) defines them.
  */
class DedupOverlapSpec extends SparkSuite {

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("venn").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    SparkEntry.queries("q144_dedup_overlap")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("planted clone / paraphrase / shared-passage / clean docs land in the right cells") {
    val base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5).take(230)
    val passage = (1 to 10).map(i => s"boiler$i").mkString(" ") // exactly one 10-token block
    val docs = Seq(
      (0L, base),                  // canonical: kept by both doc-level rules
      (1L, base),                  // exact clone → exact AND near
      // paraphrase: one leading token SHIFTS every 10-token block
      // boundary (no aligned block matches base), but the char-level
      // 5-shingle sets still overlap heavily → near only
      (2L, "zz " + base.take(197)),
      (3L, passage + " " + (1 to 10).map(i => s"xa$i").mkString(" ")),
      (4L, passage + " " + (1 to 10).map(i => s"xb$i").mkString(" ")),
      (5L, passage + " " + (1 to 10).map(i => s"xc$i").mkString(" ")),
      (6L, "a clean document with its very own words " +
        (1 to 20).map(i => s"own$i").mkString(" ")),
      // CASE variant of base: raw md5 would call it unique; the
      // normalized (q100) rule flags it as an exact dup of doc 0.
      // Its raw tokens differ in case, so its 10-token blocks do NOT
      // match base's (boiler stays 2-doc, below the ≥3 bar).
      (7L, base.toUpperCase))
    val got = run(docs)
    assert(got.size == 8)
    // base's blocks live in only TWO docs (0, 1) — below the ≥3 bar
    assert(got(0L) == ((0L, 0L, 0L)), s"canonical: ${got(0L)}")
    assert(got(1L) == ((1L, 1L, 0L)), s"clone: ${got(1L)}")
    assert(got(2L) == ((0L, 1L, 0L)), s"paraphrase: ${got(2L)}")
    assert(got(3L)._3 == 1L && got(4L)._3 == 1L && got(5L)._3 == 1L,
      "shared passage must flag all three carriers")
    assert(got(3L)._1 == 0L && got(3L)._2 == 0L,
      "passage sharers are not document-level dups")
    assert(got(6L) == ((0L, 0L, 0L)), s"clean doc: ${got(6L)}")
    // the audit's raison d'être: the normalized exact rule catches
    // the case variant (near_dup depends on the shingle pipeline's
    // own case handling — not asserted here; boiler must stay 0)
    assert(got(7L)._1 == 1L, s"case variant must be an exact dup: ${got(7L)}")
    assert(got(7L)._3 == 0L, s"case variant must not share raw blocks: ${got(7L)}")
  }
}
