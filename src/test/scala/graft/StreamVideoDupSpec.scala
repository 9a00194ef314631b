package graft

import graft.streaming.StreamVideoDup
import org.apache.spark.sql.functions._

/** StreamVideoDup (the 15th maintainer — streaming video near-dup):
  * ordered micro-batches reproduce the first-wins frame-set-Jaccard
  * replica exactly on a mixed real-GIF + stub corpus, a replayed
  * batch is a no-op, compaction preserves decisions, and the
  * readStream plumbing dedups end to end.
  */
class StreamVideoDupSpec extends SparkSuite {

  import TestScenes.{animatedGif, sceneImage}

  private def gif(seeds: Int*): Array[Byte] =
    animatedGif(seeds.map(sd => sceneImage(sd, 110, 60)))

  private def stub(i: Long, first: Long, nBlocks: Int): (Long, Array[Byte], String) =
    (i, (0 until nBlocks).map(b => f"blk-${first + b}%05d".padTo(64, 'x'))
      .mkString.getBytes("UTF-8"), "video/fake")

  // 9 videos in arrival order (3-video batches): GIF 1 kept, its
  // re-encode 2 an IN-batch dup, its frame-drop 4 a CROSS-batch dup;
  // stub 3 kept, its tail-truncated clone 5 (9 of 10 blocks) a
  // cross-batch dup; 6 partial-overlap (below gate) kept; 7 fresh
  // GIF kept; 8 reorder of 7 in the SAME batch (dup); 9 fresh stub
  private def vids: Seq[(Long, Array[Byte], String)] = Seq(
    (1L, gif(1, 2, 3, 4, 5), "image/gif"),
    (2L, gif(1, 2, 3, 4, 5), "image/gif"),
    stub(3L, 100L, 10),
    (4L, gif(1, 2, 3, 4), "image/gif"),
    stub(5L, 100L, 9),
    stub(6L, 104L, 10),
    (7L, gif(20, 21, 22, 23, 24), "image/gif"),
    (8L, gif(24, 23, 22, 21, 20), "image/gif"),
    stub(9L, 500L, 6))

  private def df(rows: Seq[(Long, Array[Byte], String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "media", "mime_hint")
  }

  /** First-wins replica on full frame-hash sets at jac ≥ 4/5. */
  private def replicaKept(sets: Map[Long, Set[Long]]): Set[Long] =
    sets.keys.toSeq.sorted.filter { d =>
      !sets.keys.exists { d2 =>
        val (a, b) = (sets(d2), sets(d))
        val i = (a & b).size
        d2 < d && i * 9 >= 4 * (a.size + b.size)
      }
    }.toSet

  private def setsOf(rows: Seq[(Long, Array[Byte], String)]): Map[Long, Set[Long]] =
    graft.ops.Multimodal.videoFrameHashes(df(rows), chunkBytes = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (d, a) => d -> a.map(_._2).toSet }

  private def keptIds(outDir: String): Set[Long] =
    StreamVideoDup.kept(spark, outDir).select("doc_id").collect().map(_.getLong(0)).toSet

  test("ordered drops ≡ first-wins replica; dups cross batches; compaction preserves") {
    val root = java.nio.file.Files.createTempDirectory("svdup").toString
    val (stateDir, outDir) = (s"$root/state", s"$root/out")
    val batches = vids.grouped(3).toSeq
    batches.zipWithIndex.foreach { case (b, i) =>
      assert(StreamVideoDup.processBatch(spark, df(b), stateDir, outDir, i.toLong))
    }
    val want = replicaKept(setsOf(vids))
    assert(keptIds(outDir) === want, s"stream kept ${keptIds(outDir)}, replica $want")
    // the planted structure, explicitly
    assert(Set(1L, 3L, 6L, 7L, 9L).subsetOf(want))
    assert(Set(2L, 4L, 5L, 8L).intersect(want).isEmpty)
    // replay is a no-op; compaction changes nothing
    assert(!StreamVideoDup.processBatch(spark, df(batches.head), stateDir, outDir, 0L))
    StreamVideoDup.compactState(spark, stateDir)
    assert(keptIds(outDir) === want)
  }

  test("crash replay rewrites bit-identical children") {
    val root = java.nio.file.Files.createTempDirectory("svdup-crash").toString
    val (stateDir, outDir) = (s"$root/state", s"$root/out")
    val batches = vids.grouped(3).toSeq
    assert(StreamVideoDup.processBatch(spark, df(batches(0)), stateDir, outDir, 0L))
    assert(StreamVideoDup.processBatch(spark, df(batches(1)), stateDir, outDir, 1L))
    // crash before commit: rewrite batch 1's children by hand-rolling
    // the attempt (delete the marker advance is simulated by replay
    // with the same id — must be skipped; then a FRESH state dir run
    // of the same prefix must converge to the same kept set)
    assert(!StreamVideoDup.processBatch(spark, df(batches(1)), stateDir, outDir, 1L))
    val after2 = keptIds(outDir)
    val root2 = java.nio.file.Files.createTempDirectory("svdup-crash2").toString
    batches.take(2).zipWithIndex.foreach { case (b, i) =>
      assert(StreamVideoDup.processBatch(spark, df(b), s"$root2/state", s"$root2/out", i.toLong))
    }
    assert(keptIds(s"$root2/out") === after2)
  }

  test("readStream → foreachBatch plumbing dedups a single trigger") {
    val root = java.nio.file.Files.createTempDirectory("svdup-stream").toString
    val (stateDir, outDir, srcDir) = (s"$root/state", s"$root/out", s"$root/src")
    val data = df(vids)
    data.write.parquet(srcDir)
    val src = spark.readStream.schema(data.schema).parquet(srcDir)
    val q = StreamVideoDup.start(src, stateDir, outDir)
    q.processAllAvailable()
    q.stop()
    assert(keptIds(outDir) === replicaKept(setsOf(vids)))
  }
}
