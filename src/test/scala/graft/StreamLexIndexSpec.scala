package graft

import graft.ops.LexIndex

/** graft.streaming.StreamLexIndex (streaming lexical-index
  * maintenance): streamed drops ≡ a full rebuild BIT-FOR-BIT —
  * including every BM25 double — across a checkpoint restart, and the
  * top-k read path served from the streamed state matches the
  * rebuilt index's.
  */
class StreamLexIndexSpec extends SparkSuite {

  private val terms = Seq("spark", "window", "table")

  private def searchMap(path: String): Map[Long, (Long, Long, Double)] =
    StreamLexIndexSpecHelper.collect(spark, path, terms)

  test("streamed drops ≡ rebuild bit-for-bit (every BM25 double) across a restart") {
    import spark.implicits._
    import java.nio.file.Files
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select($"doc_id", $"text")
    val idxDir = Files.createTempDirectory("lex-stream").toString
    val srcDir = Files.createTempDirectory("lex-src").toString
    // base over the first third, stream the rest in two runs — the
    // second resumes from the sink checkpoint
    LexIndex.save(docs.filter($"doc_id" < 170), idxDir)
    def runOnce(): Unit = {
      val src = spark.readStream.schema(docs.schema).parquet(srcDir)
      val q = graft.streaming.StreamLexIndex.start(src, idxDir)
      q.processAllAvailable()
      q.stop()
    }
    docs.filter($"doc_id" >= 170 && $"doc_id" < 340)
      .write.mode("append").parquet(srcDir)
    runOnce()
    docs.filter($"doc_id" >= 340).write.mode("append").parquet(srcDir)
    runOnce()

    val fullDir = Files.createTempDirectory("lex-stream-ref").toString
    LexIndex.save(docs, fullDir)
    val streamed = searchMap(idxDir)
    val rebuilt = searchMap(fullDir)
    assert(streamed == rebuilt,
      s"streamed index diverges from rebuild: ${
        (streamed.toSet diff rebuilt.toSet).take(3)} / ${
        (rebuilt.toSet diff streamed.toSet).take(3)}")
    assert(streamed.nonEmpty)

    // the bounded top-k read path agrees too
    val tk1 = graft.streaming.StreamLexIndex.search(spark, idxDir, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    val tk2 = LexIndex.search(spark, fullDir, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(tk1.sortBy(_._1).toSeq == tk2.sortBy(_._1).toSeq)
  }
}

private object StreamLexIndexSpecHelper {
  def collect(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      terms: Seq[String]): Map[Long, (Long, Long, Double)] =
    LexIndex.search(spark, path, terms)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
}
