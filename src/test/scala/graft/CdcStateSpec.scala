package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ops.CdcDedupState: update propagation ≡ rebuild over the
  * post-change corpus for ALL THREE state families (bands symmetric
  * difference, winnow/block signed deltas), crash-replay idempotence
  * (marker skip, mid-apply crash resume), and compaction that applies
  * the band tombstones without changing any read view.
  */
class CdcStateSpec extends SparkSuite {

  import graft.ops.CdcDedupState

  // near-dup-rich fixture: base sentences long enough to shingle (the
  // 200-char prefix 5-gram domain) and to winnow (≥ 27 chars)
  private def sent(seed: Int): String =
    s"the quick brown fox number $seed jumps over the lazy dog while " +
      s"seven wizards brew ${seed % 3} quarts of potion in the castle"

  private def v0: Seq[(Long, String)] =
    (0L until 12L).map(i => (i, sent((i % 4).toInt))) // planted dup groups

  // v1: remove 2 docs, add 2 docs, change 2 docs (one small edit that
  // shifts some shingles/fps, one full rewrite)
  private def v1: Seq[(Long, String)] =
    v0.filterNot { case (id, _) => id == 3L || id == 7L }
      .map {
        case (5L, t) => (5L, t.replace("quick", "sluggish"))
        case (9L, _) => (9L, sent(99) + " entirely rewritten body text here")
        case other => other
      } ++ Seq((20L, sent(1)), (21L, "completely fresh document twenty one with its own words"))

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def bandSet(dir: String): Set[(String, Long)] =
    CdcDedupState.bands(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
  private def countMap(f: DataFrame): Map[Long, Long] =
    f.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
  private def winnow(dir: String): Map[Long, Long] =
    countMap(CdcDedupState.winnowCounts(spark, dir))
  private def blocks(dir: String): Map[Long, Long] =
    countMap(CdcDedupState.blockCounts(spark, dir))

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/state"

  test("applyChanges ≡ rebuild over the post-change corpus, all three families") {
    val dir = freshDir("cdc-upd")
    val ref = freshDir("cdc-ref")
    CdcDedupState.save(df(v0), dir)
    val manifest = CdcDedupState.manifestOf(df(v0), df(v1))
    // the manifest is change-sized: 2 removed + 2 added + 2 changed
    assert(manifest.count() === 6)
    assert(CdcDedupState.applyChanges(spark, manifest, dir, updateId = 1L) === 6L)
    CdcDedupState.save(df(v1), ref)

    assert(bandSet(dir) === bandSet(ref), "band view diverged from rebuild")
    assert(winnow(dir) === winnow(ref), "winnow counts diverged from rebuild")
    assert(blocks(dir) === blocks(ref), "block counts diverged from rebuild")
    // sanity: the update actually had to do something on every family
    assert(bandSet(dir).exists(_._2 >= 20L) && !bandSet(dir).exists(_._2 == 3L))
  }

  test("replay skips at the marker; a mid-apply crash replays to the identical state") {
    val dir = freshDir("cdc-crash")
    val ref = freshDir("cdc-crash-ref")
    CdcDedupState.save(df(v0), dir)
    CdcDedupState.save(df(v1), ref)
    val manifest = CdcDedupState.manifestOf(df(v0), df(v1))
    assert(CdcDedupState.applyChanges(spark, manifest, dir, 1L) === 6L)
    val (b, w, k) = (bandSet(dir), winnow(dir), blocks(dir))

    // committed id: a duplicated delivery is a no-op
    assert(CdcDedupState.applyChanges(spark, manifest, dir, 1L) === -1L)
    assert(bandSet(dir) === b && winnow(dir) === w && blocks(dir) === k)

    // crash simulation: some children written, marker never advanced —
    // drop the marker AND one child, then replay the same update
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/cdc__commits"), false))
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/band_dead/b1"), true))
    assert(CdcDedupState.applyChanges(spark, manifest, dir, 1L) === 6L)
    assert(bandSet(dir) === b && winnow(dir) === w && blocks(dir) === k,
      "replay after a mid-apply crash must converge to the same state")
    assert(bandSet(dir) === bandSet(ref))
  }

  test("compact applies band tombstones and folds deltas without changing any view") {
    val dir = freshDir("cdc-compact")
    CdcDedupState.save(df(v0), dir)
    CdcDedupState.applyChanges(spark, CdcDedupState.manifestOf(df(v0), df(v1)), dir, 1L)
    val (b, w, k) = (bandSet(dir), winnow(dir), blocks(dir))

    CdcDedupState.compact(spark, dir)
    assert(bandSet(dir) === b, "compact changed the band view")
    assert(winnow(dir) === w, "compact changed the winnow counts")
    assert(blocks(dir) === k, "compact changed the block counts")
    // tombstones are applied-and-cleared; negative deltas folded away
    assert(graft.ops.Layouts
      .readChildren(spark, s"$dir/band_dead", "bkey STRING, doc_id BIGINT")
      .isEmpty, "band tombstones must clear after the fold applied them")
    val fps = graft.ops.Layouts
      .readChildren(spark, s"$dir/fps", "fp BIGINT, ndocs BIGINT")
    assert(fps.filter(col("ndocs") < 0).isEmpty,
      "negative winnow deltas must fold away")
  }

  test("remove-then-readd and change-then-revert WITHOUT compaction still ≡ rebuild") {
    // the stale-tombstone hazard: update 1's (bkey, doc_id) tombstones
    // must not hide update 2's re-added rows — precedence (dead.uid >
    // row.uid), not a bare anti-join, is what makes this pass with the
    // tombstone children still live (no compact() in between)
    val dir = freshDir("cdc-readd")
    val ref = freshDir("cdc-readd-ref")
    val v2 = v1.map { case (5L, t) => (5L, t.replace("sluggish", "quick")) // revert
                      case other => other } ++
      Seq((3L, v0.find(_._1 == 3L).get._2)) // re-add with the ORIGINAL text
    CdcDedupState.save(df(v0), dir)
    CdcDedupState.applyChanges(spark, CdcDedupState.manifestOf(df(v0), df(v1)), dir, 1L)
    CdcDedupState.applyChanges(spark, CdcDedupState.manifestOf(df(v1), df(v2)), dir, 2L)
    CdcDedupState.save(df(v2), ref)
    assert(bandSet(dir) === bandSet(ref),
      "stale tombstones must not hide re-added band rows")
    assert(winnow(dir) === winnow(ref))
    assert(blocks(dir) === blocks(ref))
    // the re-added doc's bands are genuinely visible again
    assert(bandSet(dir).exists(_._2 == 3L), "re-added doc has no live bands")
    // and a compact AFTER the re-add keeps them
    CdcDedupState.compact(spark, dir)
    assert(bandSet(dir) === bandSet(ref), "compact dropped re-added rows")
  }

  test("a second update stacks: changed-again and re-added docs still ≡ rebuild") {
    val dir = freshDir("cdc-upd2")
    val ref = freshDir("cdc-ref2")
    // v2: re-change doc 9 again, remove an added doc, re-add a removed one
    val v2 = v1.filterNot(_._1 == 21L)
      .map { case (9L, _) => (9L, sent(2)) case other => other } ++
      Seq((3L, sent(3) + " back from the dead"))
    CdcDedupState.save(df(v0), dir)
    CdcDedupState.applyChanges(spark, CdcDedupState.manifestOf(df(v0), df(v1)), dir, 1L)
    CdcDedupState.compact(spark, dir) // interleave a compaction cadence
    CdcDedupState.applyChanges(spark, CdcDedupState.manifestOf(df(v1), df(v2)), dir, 2L)
    CdcDedupState.save(df(v2), ref)
    assert(bandSet(dir) === bandSet(ref))
    assert(winnow(dir) === winnow(ref))
    assert(blocks(dir) === blocks(ref))
  }
}
