package graft

import graft.ops.{IvfIndex, SemDedup}
import org.apache.spark.sql.functions._

/** streaming.StreamSemDedup: streamed drops ≡ the sequential-survivor
  * batch replica (prior survivors + lower-id batch mates veto; dropped
  * content cannot), across a checkpoint restart; a replayed trigger is
  * a no-op; and the sequential semantics genuinely diverge from the
  * global one-pass prune on a chain fixture (the documented contract).
  */
class StreamSemDedupSpec extends SparkSuite {

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Sequential-survivor replica: per drop in order, per vec in id
    * order — prior = accumulated survivors plus ALL lower-id batch
    * mates of the same cell (pruneIncremental's one-pass in-batch
    * rule); survivors join the state.
    */
  private def replica(
      model: IvfIndex.IvfModel,
      seed: Seq[(Long, Array[Float])],
      drops: Seq[Seq[(Long, Array[Float])]],
      tau: Double): Map[Long, Array[Float]] = {
    val state = scala.collection.mutable.Map.empty[Long, (Int, Array[Float])]
    seed.foreach { case (id, e) => state(id) = (model.cellOf(e), e) }
    drops.foreach { batch =>
      val assigned = batch.sortBy(_._1).map { case (id, e) => (id, model.cellOf(e), e) }
      val kept = scala.collection.mutable.ListBuffer.empty[(Long, Int, Array[Float])]
      assigned.foreach { case (id, c, e) =>
        val priors =
          state.values.filter(_._1 == c).map(_._2) ++
            assigned.filter(x => x._2 == c && x._1 < id).map(_._3)
        val msim = if (priors.isEmpty) -1.0 else priors.map(cos(_, e)).max
        if (msim < tau) kept += ((id, c, e))
      }
      kept.foreach { case (id, c, e) => state(id) = (c, e) }
    }
    state.map { case (id, (_, e)) => id -> e }.toMap
  }

  test("streamed drops ≡ sequential replica across a restart; replay is a no-op; ≠ global prune") {
    import spark.implicits._
    import java.nio.file.Files
    val all = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().sortBy(_._1)
    val seed = all.filter(_._1 < 250).toSeq
    val drop1 = all.filter(t => t._1 >= 250 && t._1 < 380).toSeq
    val drop2 = all.filter(_._1 >= 380).toSeq
    val tau = 0.3

    val seedDf = seed.toDF("vec_id", "embedding")
    val cents = IvfIndex.train(seedDf, k = 4, iters = 3, dim = 64)
    val model = IvfIndex.refine(seedDf, cents, maxCell = 100L, subK = 4, iters = 3, dim = 64)
    val path = Files.createTempDirectory("ssd-layout").toString
    val ckpt = Files.createTempDirectory("ssd-ckpt").toString
    val srcDir = Files.createTempDirectory("ssd-src").toString
    SemDedup.saveAssigned(seedDf, model, path)

    def runOnce(): Unit = {
      val src = spark.readStream.schema(seedDf.schema).parquet(srcDir)
      val q = graft.streaming.StreamSemDedup.start(src, model, path, ckpt, tau)
      q.processAllAvailable()
      q.stop()
    }
    drop1.toDF("vec_id", "embedding").write.mode("append").parquet(srcDir)
    runOnce()
    drop2.toDF("vec_id", "embedding").write.mode("append").parquet(srcDir)
    runOnce() // restart from the sink checkpoint

    val got = graft.streaming.StreamSemDedup.curated(spark, path)
      .select($"vec_id").as[Long].collect().toSet
    val want = replica(model, seed, Seq(drop1, drop2), tau).keySet
    assert(got == want, s"curated set diverged: extra=${got -- want} missing=${want -- got}")
    assert(drop1.exists(t => !got(t._1)) || drop2.exists(t => !got(t._1)),
      "fixture exercised no streaming drops")

    // a replayed trigger (marker at or below committed) must not
    // double-append: re-running over the same source adds nothing
    val before = graft.streaming.StreamSemDedup.curated(spark, path).count()
    runOnce()
    assert(graft.streaming.StreamSemDedup.curated(spark, path).count() == before)

    // the sequential-survivor semantics DIFFER from the global
    // one-pass prune by design: a chain a~b, b~c, a!~c — one-pass
    // drops both b and c (each has a lower-id mate >= tau); the
    // sequential loop keeps c once b is gone
    // 45° steps: cos(a,b) = cos(b,c) ≈ 0.707, cos(a,c) = 0
    val a = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val bv = Array(0.7071f, 0.7071f, 0.0f, 0.0f)
    val cv = Array(0.0f, 1.0f, 0.0f, 0.0f)
    assert(cos(a, bv) >= 0.7 && cos(bv, cv) >= 0.7 && cos(a, cv) < 0.7)
    val chainModel = IvfIndex.IvfModel(Array(Array(1.0f, 1.0f, 0.0f, 0.0f)), Map.empty)
    val chain = replica(chainModel, Seq(1L -> a), Seq(Seq(2L -> bv), Seq(3L -> cv)), 0.7)
    assert(chain.keySet == Set(1L, 3L), s"sequential chain kept ${chain.keySet}")
    val onePass = SemDedup.prune(
      Seq((0L, 1L, a), (0L, 2L, bv), (0L, 3L, cv)).toDF("cell", "vec_id", "embedding"),
      tau = 0.7)
      .filter($"keep" === 1L).select($"vec_id").as[Long].collect().toSet
    assert(onePass == Set(1L), s"one-pass kept $onePass")
  }
}
