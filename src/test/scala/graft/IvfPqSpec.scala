package graft

import org.apache.spark.sql.functions._

/** ops.IvfPq (q99): the composed IVF-PQ index must recover most of the
  * exact cosine top-10 while scanning only the probed cells, and both
  * trainings must stay deterministic through the composition.
  */
class IvfPqSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.01"

  private def exactTop10(qid: Long, all: Array[(Long, Array[Float])]): Set[Long] = {
    val q = all.find(_._1 == qid).get._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    all.filter(_._1 != qid)
      .map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, s) => (-s, id) }
      .take(10).map(_._1).toSet
  }

  test("IVF-PQ recall@10 vs exact cosine top-10 (nprobe=3 of 8 cells)") {
    import spark.implicits._
    val all = Sql.table(spark, dir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val got = SparkEntry.queries("q99_ann_ivfpq")(spark, dir)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = (0L until 5L).map { qid =>
      val r = (got(qid) & exactTop10(qid, all)).size / 10.0
      info(f"qid=$qid recall@10 = $r%.2f")
      r
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@10 = $mean%.2f")
    // nprobe=3/8 bounds recall by the cell hit rate: an exact
    // neighbour in an unprobed cell is unreachable by design.
    // Observed 0.94 on this corpus (residual quantization is finer
    // than q89's direct PQ at 0.88); 0.5 catches a composition
    // regression without demanding exhaustive probing.
    assert(mean >= 0.5, f"IVF-PQ recall collapsed: $mean%.2f")
  }

  test("training is deterministic run-over-run through the composition") {
    import spark.implicits._
    val e = Sql.table(spark, dir, "embeddings").select($"vec_id", $"embedding")
    val m1 = graft.ops.IvfPq.train(e, kCells = 8, m = 8, kSub = 16, dim = 64, iters = 3)
    val m2 = graft.ops.IvfPq.train(e, kCells = 8, m = 8, kSub = 16, dim = 64, iters = 3)
    assert(m1.cells.flatten.toSeq == m2.cells.flatten.toSeq)
    assert(m1.pq.centroids.flatten.flatten.toSeq == m2.pq.centroids.flatten.flatten.toSeq)
  }

  test("the probed-cell isin filter reaches the code scan") {
    import spark.implicits._
    val e = Sql.table(spark, dir, "embeddings").select($"vec_id", $"embedding")
    val df = graft.ops.IvfPq.topK(spark, e, e.filter($"vec_id" < 2), k = 5)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("cell#") && p.contains(" IN "),
      s"no probed-cell filter in the scan-side plan:\n$p")
  }

  test("index assigns every vector to exactly one cell with a code of m ints") {
    import spark.implicits._
    val e = Sql.table(spark, dir, "embeddings").select($"vec_id", $"embedding")
    val model = graft.ops.IvfPq.train(e, kCells = 8, m = 8, kSub = 16, dim = 64, iters = 3)
    val idx = graft.ops.IvfPq.index(e, model)
      .as[(Int, Long, Array[Int])].collect()
    assert(idx.length == e.count())
    assert(idx.map(_._2).distinct.length == idx.length)
    idx.foreach { case (c, vid, code) =>
      assert(c >= 0 && c < 8, s"vec $vid in out-of-range cell $c")
      assert(code.length == 8 && code.forall(x => x >= 0 && x < 16),
        s"vec $vid has malformed code ${code.toSeq}")
    }
  }
}
