package graft

import graft.ops.{Layouts, LexIndex}
import org.apache.spark.sql.functions._

/** LexIndex.forget: a deletion request must make every BM25 input
  * (postings, df, nd, sum_dl) read as if the docs were never indexed
  * — searches after forget() must be BIT-EXACT with an index rebuilt
  * without them (df correction changes SURVIVORS' scores, not just
  * the forgotten doc's absence), transparently, with no caller
  * cooperation. forgetCompact() then makes it physical: raw chunks
  * lose the postings, the stats row re-sums, tombstones clear, and
  * the same searches still match bit-exactly.
  */
class LexForgetSpec extends SparkSuite {

  // doc texts over a tiny shared vocabulary: doc 1 is the forget
  // target and shares "alpha"/"beta" with survivors, so its removal
  // moves df and avgdl for everyone
  private val docs: Seq[(Long, String)] = Seq(
    (1L, "alpha beta alpha gamma delta"),
    (2L, "alpha beta beta epsilon"),
    (3L, "alpha gamma gamma zeta beta"),
    (4L, "beta delta epsilon epsilon"),
    (5L, "gamma zeta alpha alpha beta")) ++
    (10 until 30).map(i => (i.toLong,
      s"word$i filler${i % 3} alpha common text body number$i"))

  private val terms = Seq("alpha", "beta", "gamma")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSet

  test("forget ≡ rebuild-without, bit-exact; compact makes it physical") {
    import spark.implicits._
    val full = docs.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lexf").toString
    LexIndex.save(full, dir)

    val before = rows(LexIndex.search(spark, dir, terms))
    assert(before.exists(_._1 == 1L))

    // the rebuilt-without reference
    val refDir = java.nio.file.Files.createTempDirectory("lexr").toString
    LexIndex.save(full.filter($"doc_id" =!= 1L), refDir)
    val want = rows(LexIndex.search(spark, refDir, terms))
    assert(want != before, "fixture: forgetting doc 1 must move scores")

    // request + probe-time guarantee (plus an id absent from the
    // index — must contribute nothing)
    LexIndex.forget(spark, dir, Seq(1L, 424242L).toDF("doc_id"), 0L)
    val after = rows(LexIndex.search(spark, dir, terms))
    assert(after == want,
      s"probe-time forget drifted from rebuild: only-forget=${after -- want} only-rebuild=${want -- after}")

    // physical guarantee
    LexIndex.forgetCompact(spark, dir)
    val raw = Layouts.readChildren(spark, s"$dir/chunks",
      "kind STRING, tok STRING, doc_id BIGINT, tf BIGINT, dl BIGINT, sum_dl BIGINT, nd BIGINT")
    assert(raw.filter($"kind" === "p" && $"doc_id" === 1L).count() == 0)
    val st = raw.filter($"kind" === "s")
      .agg(sum($"sum_dl"), sum($"nd")).collect()(0)
    val refSt = Layouts.readChildren(spark, s"$refDir/chunks",
        "kind STRING, tok STRING, doc_id BIGINT, tf BIGINT, dl BIGINT, sum_dl BIGINT, nd BIGINT")
      .filter($"kind" === "s").agg(sum($"sum_dl"), sum($"nd")).collect()(0)
    assert(st == refSt, s"stats row after compact $st != rebuilt $refSt")
    assert(Layouts.liveChildren(spark, s"$dir/forget").isEmpty)
    assert(rows(LexIndex.search(spark, dir, terms)) == want)
    // idempotent: nothing pending
    LexIndex.forgetCompact(spark, dir)
    assert(rows(LexIndex.search(spark, dir, terms)) == want)
  }

  test("absent-only requests leave scores intact (no NULL correction)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lexe").toString
    LexIndex.save(docs.toDF("doc_id", "text"), dir)
    val before = rows(LexIndex.search(spark, dir, terms))
    // every id absent from the index → empty tombstone child; the
    // stats correction must be a zero delta, not NULL
    LexIndex.forget(spark, dir, Seq(90001L, 90002L).toDF("doc_id"), 0L)
    val after = rows(LexIndex.search(spark, dir, terms))
    assert(after == before, s"zero-delta request moved scores")
    LexIndex.forgetCompact(spark, dir)
    assert(Layouts.liveChildren(spark, s"$dir/forget").isEmpty)
  }

  test("bounded forgetCompact defers wholesale when a chunk child is skipped") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lexb").toString
    LexIndex.save(docs.toDF("doc_id", "text"), dir)
    // doc 1's postings arrive in trigger child b5 — a bound at 5
    // must defer the WHOLE physical application (a partial fold plus
    // surviving tombstones would double-subtract the stats delta)
    LexIndex.append(Seq((100L, "alpha beta fresh content here"))
      .toDF("doc_id", "text"), dir, batchId = 5L)
    val want = {
      val refDir = java.nio.file.Files.createTempDirectory("lexbr").toString
      LexIndex.save(docs.filter(_._1 != 1L).toDF("doc_id", "text")
        .unionAll(Seq((100L, "alpha beta fresh content here"))
          .toDF("doc_id", "text")), refDir)
      rows(LexIndex.search(spark, refDir, terms))
    }
    LexIndex.forget(spark, dir, Seq(1L).toDF("doc_id"), 0L)
    assert(rows(LexIndex.search(spark, dir, terms)) == want)
    LexIndex.forgetCompact(spark, dir, beforeBatch = Some(5L))
    // deferred: tombstones AND doc 1's raw postings both still there
    assert(Layouts.liveChildren(spark, s"$dir/forget").nonEmpty)
    assert(Layouts.readChildren(spark, s"$dir/chunks",
        "kind STRING, tok STRING, doc_id BIGINT, tf BIGINT, dl BIGINT, sum_dl BIGINT, nd BIGINT")
      .filter($"kind" === "p" && $"doc_id" === 1L).count() > 0)
    assert(rows(LexIndex.search(spark, dir, terms)) == want)
    // quiescent cadence applies and clears; searches bit-stable
    LexIndex.forgetCompact(spark, dir)
    assert(Layouts.liveChildren(spark, s"$dir/forget").isEmpty)
    assert(rows(LexIndex.search(spark, dir, terms)) == want)
  }
}
