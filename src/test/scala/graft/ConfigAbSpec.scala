package graft

import org.apache.spark.sql.functions._

/** q183_config_ab: engineered fixtures for every divergence class the
  * corpus itself doesn't exercise — a gate flip, the exact-dup
  * CASCADE (config B gates out a canonical, flipping its surviving
  * duplicate's verdict), and a near-dup pair whose jaccard sits in
  * [0.35, 0.5) so config B's stricter bar un-drops it.
  */
class ConfigAbSpec extends SparkSuite {

  private def fixture: Seq[(Long, String)] = {
    val r = new scala.util.Random(24)
    def seg(n: Int): String =
      (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    // G: 40 chars, stopwords present — passes A (>=30), fails B (<60)
    val g = "the cat and dog run very fast over here"
    // X (45 chars) and Y (X + trailing spaces, 75 chars): identical
    // NORMALIZED fp; under A canon=X and Y is exact_dup; under B the
    // gate removes X (45 < 60) and Y becomes its group's canonical
    val x = "the old mill and the tall oak of the valley."
    val y = x + (" " * 30)
    // P ⊂ Q superset pair, both pass BOTH gates (62 chars, 2+
    // stopwords): Q = P + 62 random chars → char-5-shingle jaccard
    // 57/119 ≈ 0.479 ∈ [0.35, 0.5) — dropped under A, un-dropped
    // under B's jac >= 0.5 bar. Seed 24 tuned so the 2×4 LSH banding
    // actually candidates the pair (hit probability ≈ 10% per seed)
    val p = "the quick brown fox and the lazy dog jump over all of it fine"
    val q = p + seg(62)
    // clean unrelated doc — must appear in NO output row
    val clean = "the completely unrelated and separate document about other things entirely"
    Seq((10L, g), (20L, x), (21L, y), (30L, p), (31L, q), (40L, clean))
  }

  test("gate flip, exact-dup cascade and near-dup un-drop all surface") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("configab").toString
    fixture.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q183_config_ab")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4),
          r.getString(5))))
      .toMap
    assert(!got.contains(40L), "clean doc leaked into the diff")
    assert(!got.contains(30L), "pair survivor P flipped")
    // G: kept under A, gated out under B
    assert(got(10L) == ((1L, 0L, "kept", "quality_gate", "quality_gate")),
      s"G: ${got.get(10L)}")
    // X: canonical under A, gated out under B
    assert(got(20L) == ((1L, 0L, "kept", "quality_gate", "quality_gate")),
      s"X: ${got.get(20L)}")
    // Y (the CASCADE): exact_dup of X under A; under B X is gated
    // out, Y becomes its fp-group's canonical — and is then caught by
    // the NEXT stage (the near-whitespace-identical (X,Y) LSH pair
    // survives B's jac bar), so its drop REASON migrates exact_dup →
    // near_dup with the divergence attributed to the exact stage —
    // the cascade verdict no single-config report predicts
    assert(got(21L) == ((0L, 0L, "exact_dup", "near_dup", "exact_dup")),
      s"Y: ${got.get(21L)}")
    // Q: near-dup of P at jac ≈ 0.479 — dropped under A, un-dropped
    // under B's stricter bar
    assert(got(31L) == ((0L, 1L, "near_dup", "kept", "near_dup")),
      s"Q: ${got.get(31L)}")
    assert(got.size == 4, s"unexpected extra rows: ${got.keySet}")
  }
}
