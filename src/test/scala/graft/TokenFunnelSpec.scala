package graft

/** q147_token_funnel (stage-by-stage doc/token attrition): planted
  * fixture drops exactly one doc per stage — a short doc at the gate,
  * an exact clone at exact-dedup, a paraphrase at near-dedup — and a
  * shared 10-token passage across three surviving docs that only the
  * boilerplate stage touches (token loss with NO doc loss). Expected
  * numbers come from a JVM whitespace-token replica of the fixture,
  * so every cell is checked, not just the shape.
  */
class TokenFunnelSpec extends SparkSuite {

  private val baseP =
    ("the quick brown fox jumps over the lazy dog while counting " * 4).take(230)
  private val baseP2 =
    ("one of many winding rivers flows gently beneath ancient stone bridges today " * 3).take(230)
  private val passage = (1 to 10).map(i => s"boiler$i").mkString(" ")

  private def fixture: Seq[(Long, String)] = Seq(
    (0L, "tiny"),                       // fails the quality gate
    (1L, baseP),                        // kept (canonical of the clone pair)
    (2L, baseP),                        // exact clone → dropped at exact_dedup
    (3L, baseP2),                       // kept (near-dup canonical)
    (4L, "zz " + baseP2.take(197)),     // paraphrase → dropped at near_dedup
    // three passage carriers: pass every doc stage, lose the shared
    // block (10 tokens each) at the boilerplate stage
    (5L, passage + " the " + (1 to 9).map(i => s"xa$i").mkString(" ")),
    (6L, passage + " the " + (1 to 9).map(i => s"xb$i").mkString(" ")),
    (7L, passage + " the " + (1 to 9).map(i => s"xc$i").mkString(" ")))

  private def tok(t: String): Long =
    t.split(" ").count(_.nonEmpty).toLong

  test("each stage drops exactly its planted doc/token mass") {
    import spark.implicits._
    val docs = fixture
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q147_token_funnel")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val tokOf = docs.toMap.view.mapValues(tok).toMap
    val inTok = docs.map(d => tokOf(d._1)).sum
    val want = Seq(
      (0L, "input", 8L, inTok),
      (1L, "quality_gate", 7L, inTok - tokOf(0L)),
      (2L, "exact_dedup", 6L, inTok - tokOf(0L) - tokOf(2L)),
      (3L, "near_dedup", 5L, inTok - tokOf(0L) - tokOf(2L) - tokOf(4L)),
      // boilerplate: same docs, minus the 10-token passage from each
      // of the three carriers
      (4L, "boilerplate", 5L,
        inTok - tokOf(0L) - tokOf(2L) - tokOf(4L) - 30L))
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    // funnel invariant: both columns monotonically non-increasing
    got.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4, s"funnel not monotone: $a -> $b")
    }
  }
}
