package graft

import graft.ops.{Layouts, WinnowState}
import graft.streaming.StreamWinnow
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Streaming ExactSubstr scoring: ordered micro-batch drops must equal
  * the same sequence of batch-mode WinnowState probes row for row
  * (which WinnowStateSpec proves ≡ a full recompute), a restart from
  * the checkpoint replays nothing, replayed batch ids are no-ops, and
  * compactStream's token-guarded fold protocol neither under- nor
  * double-counts at either crash point.
  */
class StreamWinnowSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  private def docs = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text".as("t"))
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    df.select(col("doc_id"), col("n_fp"), col("n_dup"), col("dup_frac"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet

  private def stateAgg(dir: String): Map[Long, Long] =
    WinnowState.stateFps(spark, dir)
      .groupBy(col("fp")).agg(sum(col("ndocs")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("ordered streamed drops ≡ sequential batch probes; restart replays nothing") {
    import spark.implicits._
    import java.nio.file.Files
    val corpus = docs.filter($"doc_id" < 300)
    val b1 = docs.filter($"doc_id" >= 300 && $"doc_id" < 400)
    val b2 = docs.filter($"doc_id" >= 400)
    val streamState = Files.createTempDirectory("sw-state").toString
    val refState = Files.createTempDirectory("sw-ref").toString
    WinnowState.save(corpus, streamState, w = 8)
    WinnowState.save(corpus, refState, w = 8)

    val srcDir = Files.createTempDirectory("sw-src").toString
    val ckpt = Files.createTempDirectory("sw-ckpt").toString
    val outDir = Files.createTempDirectory("sw-out").toString

    def runOnce(): Unit = {
      val src = spark.readStream.schema(docs.schema).parquet(srcDir)
      val q = StreamWinnow.start(src, streamState, outDir, ckpt)
      q.processAllAvailable()
      q.stop()
    }

    // drop 1, run, STOP — then drop 2 and restart from the checkpoint
    b1.write.mode("append").parquet(srcDir)
    runOnce()
    b2.write.mode("append").parquet(srcDir)
    runOnce()

    // batch-mode reference: the same two probes in the same order
    val ref1 = rowsOf(WinnowState.probe(b1, refState, w = 8, commit = true))
    val ref2 = rowsOf(WinnowState.probe(b2, refState, w = 8, commit = true))
    assert(rowsOf(spark.read.parquet(s"$outDir/batch_0")) == ref1,
      "first streamed drop diverges from the batch probe")
    assert(rowsOf(spark.read.parquet(s"$outDir/batch_1")) == ref2,
      "second streamed drop diverges from the batch probe (state fold broken?)")

    // folded state content ≡ the flat-append reference state
    assert(stateAgg(streamState) == stateAgg(refState))

    // a replayed batch id is a no-op even with data aboard
    assert(!StreamWinnow.scoreBatch(b2, streamState, outDir, batchId = 1L, w = 8))
    assert(stateAgg(streamState) == stateAgg(refState),
      "replayed batch id mutated the state")

    // the combined read side covers both drops exactly once
    val all = StreamWinnow.scores(spark, outDir)
    assert(all.count() == b1.filter(length($"t") >= 27).count() +
      b2.filter(length($"t") >= 27).count())
    assert(all.select("batch_id").distinct().count() == 2)
  }

  test("compactStream: fold preserves counts and survives both crash points") {
    import spark.implicits._
    import java.nio.file.Files
    val corpus = docs.filter($"doc_id" < 100)
    val b1 = docs.filter($"doc_id" >= 100 && $"doc_id" < 150)
    val b2 = docs.filter($"doc_id" >= 150 && $"doc_id" < 200)
    val dir = Files.createTempDirectory("sw-compact").toString
    WinnowState.save(corpus, dir, w = 8)
    WinnowState.probe(b1, dir, w = 8, commit = true, batchId = Some(0L))
    WinnowState.probe(b2, dir, w = 8, commit = true, batchId = Some(1L))
    val before = stateAgg(dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // crash point A — pending sidecar written, publish never happened:
    // readers must still include the stream dirs (no undercount), and
    // the next compactStream discards the stale sidecar and folds
    Layouts.writeSidecar(fs, new Path(s"$dir/_fold_pending"),
      "deadbeef-token\nb0\nb1\n")
    assert(stateAgg(dir) == before, "unpublished fold made readers undercount")
    WinnowState.compactStream(spark, dir)
    assert(stateAgg(dir) == before, "fold changed the state contents")
    assert(!fs.exists(new Path(s"$dir/fps_stream/b0")) &&
      !fs.exists(new Path(s"$dir/fps_stream/b1")), "folded dirs not deleted")

    // crash point B — fold published but deletions didn't finish:
    // replay the protocol steps by hand up to the crash
    val b3 = docs.filter($"doc_id" >= 200 && $"doc_id" < 250)
    WinnowState.probe(b3, dir, w = 8, commit = true, batchId = Some(2L))
    val withB3 = stateAgg(dir)
    val token = "crash-after-publish-token"
    val tmp = s"$dir/fps__compact_tmp"
    WinnowState.stateFps(spark, dir).write.mode("overwrite").parquet(tmp)
    Layouts.writeSidecar(fs, new Path(s"$tmp/_fold"), s"$token\n")
    Layouts.writeSidecar(fs, new Path(s"$dir/_fold_pending"), s"$token\nb2\n")
    Layouts.publish(spark, s"$dir/fps", tmp)
    // CRASH here: b2 still on disk, but the published fps carries the
    // token — readers must exclude b2 (no double-count)
    assert(fs.exists(new Path(s"$dir/fps_stream/b2")))
    assert(stateAgg(dir) == withB3, "published fold double-counts the folded dir")
    // recovery finishes the deletions
    WinnowState.compactStream(spark, dir)
    assert(stateAgg(dir) == withB3)
    assert(!fs.exists(new Path(s"$dir/fps_stream/b2")))
    assert(!fs.exists(new Path(s"$dir/_fold_pending")))

    // probes read identically through fold and recovery
    val probe = WinnowState.probe(docs.filter($"doc_id" >= 250 && $"doc_id" < 260),
      dir, w = 8, commit = false)
    assert(probe.count() > 0)
  }
}
