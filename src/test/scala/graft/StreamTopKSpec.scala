package graft

import graft.streaming.StreamTopK
import org.apache.spark.sql.functions._

/** StreamTopK (streaming Misra–Gries heavy hitters): the batch
  * sketch's guarantees survive micro-batch merging — after streaming
  * the corpus in drops, the ≤ k-row state never overcounts, undercounts
  * by at most n/(k+1) of the WHOLE stream, finds every true heavy
  * hitter, and the real readStream → foreachBatch plumbing agrees with
  * the ordered-drop harness.
  */
class StreamTopKSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  private def exactCounts() = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(lower($"text"), "[^a-z]+")).as("tok"))
      .filter($"tok" =!= "")
      .groupBy($"tok").agg(count(lit(1)).cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private def stateOf(dir: String) = {
    import spark.implicits._
    StreamTopK.topN(spark, dir, Int.MaxValue)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("three ordered drops: state bounded at k with the full-stream MG guarantee") {
    import spark.implicits._
    val k = 256
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val stateDir = java.nio.file.Files.createTempDirectory("stk-state").toString
    Seq(0, 1, 2).foreach { r =>
      StreamTopK.processBatch(spark, docs.filter($"doc_id" % 3 === r), stateDir, k,
        batchId = r.toLong)
      assert(stateOf(stateDir).size <= k, s"state exceeded k after drop $r")
    }
    // a REPLAYED trigger must not double its batch's mass: recompute
    // batch 2 from the generation below it — state content unchanged
    val committed = stateOf(stateDir)
    StreamTopK.processBatch(spark, docs.filter($"doc_id" % 3 === 2), stateDir, k,
      batchId = 2L)
    assert(stateOf(stateDir) == committed,
      "replayed trigger changed the sketch (double-merged its batch)")
    val exact = exactCounts()
    val n = exact.values.sum
    val bound = n / (k + 1)
    val est = stateOf(stateDir)
    est.foreach { case (tok, e) =>
      val truth = exact.getOrElse(tok, 0L)
      assert(e <= truth, s"'$tok' overcounted: $e > $truth")
      assert(truth - e <= bound, s"'$tok' undercount ${truth - e} > $bound")
    }
    exact.filter(_._2 > bound).keys.foreach { tok =>
      assert(est.contains(tok), s"true heavy hitter '$tok' lost in streaming merge")
    }
  }

  test("real plumbing: parquet-source stream over the corpus matches the bounds") {
    import spark.implicits._
    val k = 256
    val docs = spark.read.parquet(s"$sf/documents.parquet").select($"doc_id", $"text")
    val srcDir = java.nio.file.Files.createTempDirectory("stk-src").toString
    docs.write.mode("overwrite").parquet(srcDir)
    val stateDir = java.nio.file.Files.createTempDirectory("stk-state2").toString
    val src = spark.readStream.schema(docs.schema).parquet(srcDir)
    val q = StreamTopK.start(src, stateDir, k)
    q.processAllAvailable()
    q.stop()
    val exact = exactCounts()
    val bound = exact.values.sum / (k + 1)
    val est = stateOf(stateDir)
    assert(est.nonEmpty && est.size <= k)
    est.foreach { case (tok, e) =>
      assert(e <= exact.getOrElse(tok, 0L) && exact.getOrElse(tok, 0L) - e <= bound,
        s"'$tok': est $e true ${exact.getOrElse(tok, 0L)} bound $bound")
    }
  }

  test("tiny k forces compression and the hot token still dominates") {
    import spark.implicits._
    val k = 4
    val docs = ((1 to 60).map(i => (i.toLong, "hot " * 5 + s"cold$i")) ++
      (61 to 80).map(i => (i.toLong, s"warm${i % 3} filler$i"))).toDF("doc_id", "text")
    val stateDir = java.nio.file.Files.createTempDirectory("stk-state3").toString
    Seq(0, 1).foreach { r =>
      StreamTopK.processBatch(spark, docs.filter($"doc_id" % 2 === r), stateDir, k,
        batchId = r.toLong)
    }
    val est = stateOf(stateDir)
    assert(est.size <= k)
    assert(est.maxBy(_._2)._1 == "hot", s"got $est")
    val n = docs.select(explode(split(lower($"text"), "[^a-z]+")).as("t"))
      .filter($"t" =!= "").count()
    assert(est("hot") >= 300L - n / (k + 1), s"got $est, n=$n")
  }
}
