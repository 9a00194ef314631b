package graft

import graft.ops.Decontam
import graft.streaming.StreamDecontam
import org.apache.spark.sql.functions._

/** Streaming benchmark decontamination: ordered micro-batch drops
  * must equal the same batch-mode Decontam probes row for row, a
  * restart from the checkpoint replays nothing, a replayed batch id
  * overwrites its report idempotently, and the frozen gram-width
  * guard fires before any output is written.
  */
class StreamDecontamSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  private def docs = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet").select($"doc_id", $"text")
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
    df.select(col("doc_id"), col("n_hit_grams"), col("n_eval_docs"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("ordered streamed drops ≡ batch probes; restart replays nothing") {
    import spark.implicits._
    import java.nio.file.Files
    // q137's convention: the benchmark is the doc_id % 19 = 7 slice
    val eval = docs.filter($"doc_id" % 19 === 7)
    val b1 = docs.filter($"doc_id" % 19 =!= 7 && $"doc_id" < 250)
    val b2 = docs.filter($"doc_id" % 19 =!= 7 && $"doc_id" >= 250)
    val state = Files.createTempDirectory("sd-state").toString
    Decontam.save(eval, state)

    val srcDir = Files.createTempDirectory("sd-src").toString
    val ckpt = Files.createTempDirectory("sd-ckpt").toString
    val outDir = Files.createTempDirectory("sd-out").toString

    def runOnce(): Unit = {
      val src = spark.readStream.schema(docs.schema).parquet(srcDir)
      val q = StreamDecontam.start(src, state, outDir, ckpt)
      q.processAllAvailable()
      q.stop()
    }

    b1.write.mode("append").parquet(srcDir)
    runOnce()
    b2.write.mode("append").parquet(srcDir)
    runOnce()

    val ref1 = rowsOf(Decontam.probe(b1, state))
    val ref2 = rowsOf(Decontam.probe(b2, state))
    assert(ref1.nonEmpty && ref2.nonEmpty, "fixture produced no contamination")
    assert(rowsOf(spark.read.parquet(s"$outDir/batch_0")) == ref1,
      "first streamed drop diverges from the batch probe")
    assert(rowsOf(spark.read.parquet(s"$outDir/batch_1")) == ref2,
      "second streamed drop diverges from the batch probe")
    // union reader sees exactly the two batches
    assert(StreamDecontam.flagged(spark, outDir).count() ==
      ref1.size + ref2.size)
    // restart with no new data: no third batch directory appears
    runOnce()
    val batches = new java.io.File(outDir).listFiles().map(_.getName).toSet
    assert(batches == Set("batch_0", "batch_1"), s"replayed dirs: $batches")
  }

  test("replayed batch id overwrites idempotently; width guard fires first") {
    import spark.implicits._
    import java.nio.file.Files
    val eval = docs.filter($"doc_id" % 19 === 7)
    val batch = docs.filter($"doc_id" % 19 =!= 7 && $"doc_id" < 250)
    val state = Files.createTempDirectory("sd2-state").toString
    val outDir = Files.createTempDirectory("sd2-out").toString
    Decontam.save(eval, state)
    assert(StreamDecontam.probeBatch(batch, state, outDir, 5L))
    val first = rowsOf(spark.read.parquet(s"$outDir/batch_5"))
    // replay of the same id (crash-after-write, marker-free protocol):
    // the report is rewritten identically, not duplicated
    assert(StreamDecontam.probeBatch(batch, state, outDir, 5L))
    assert(rowsOf(spark.read.parquet(s"$outDir/batch_5")) == first)
    // probing at a different gram width must fail loudly BEFORE
    // writing anything
    val ex = intercept[IllegalArgumentException] {
      StreamDecontam.probeBatch(batch, state, outDir, 6L, gramTokens = 5)
    }
    assert(ex.getMessage.contains("frozen"), ex.getMessage)
    assert(!new java.io.File(s"$outDir/batch_6").exists(),
      "guarded probe must not write output")
    // empty batch: no report
    assert(!StreamDecontam.probeBatch(batch.filter(lit(false)), state, outDir, 7L))
    assert(!new java.io.File(s"$outDir/batch_7").exists())
  }
}
