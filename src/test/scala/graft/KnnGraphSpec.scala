package graft

/** graft.queries.Embeddings.knnGraph (q130, cell-blocked k-NN graph):
  * bit-exact agreement with a sequential in-JVM replica (index-order
  * cosine folds, strict (sim desc, id asc) order), under-full cells
  * (k larger than the cell), and the no-window plan shape — the
  * quadratic pair stream must flow through the bounded TopKSimAgg,
  * never a per-vector window sort.
  */
class KnnGraphSpec extends SparkSuite {

  /** Replica of the engine's double arithmetic: cosine folded in
    * index order (dot/na/nb in one left-to-right pass — the CosineSim
    * accumulation order), neighbors sorted by the strict
    * (sim desc, id asc) total order. Identical IEEE op sequence, so
    * sim comparisons are ==.
    */
  private def replica(
      emb: Seq[(Long, Array[Float], Int)],
      k: Int): Map[(Long, Long), (Double, Long)] =
    emb.groupBy(_._3).flatMap { case (_, xs) =>
      xs.flatMap { case (id, v, _) =>
        val nbrs = xs.filter(_._1 != id).map { case (oid, w, _) =>
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < v.length) {
            dot += v(i).toDouble * w(i).toDouble
            na += v(i).toDouble * v(i).toDouble
            nb += w(i).toDouble * w(i).toDouble
            i += 1
          }
          oid -> dot / (math.sqrt(na) * math.sqrt(nb))
        }
        nbrs.sortBy { case (oid, s) => (-s, oid) }.take(k).zipWithIndex
          .map { case ((oid, s), rk0) => (id, oid) -> (s, rk0 + 1L) }
      }
    }

  private def fixture: Seq[(Long, Array[Float], Int)] = {
    val r = new scala.util.Random(11)
    (0L until 60L).map { id =>
      val label = (id % 3).toInt
      val base = Array.tabulate(8)(i => if (i == label) 1.0f else 0.1f)
      val v = base.map(x => x + (r.nextFloat() - 0.5f) * 0.6f)
      (id, v, label)
    }
  }

  private def run(k: Int): Map[(Long, Long), (Double, Long)] = {
    import spark.implicits._
    graft.queries.Embeddings.knnGraph(
      fixture.toDF("vec_id", "embedding", "label"), k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
  }

  test("engine ≡ replica bit-for-bit (sims ==, neighbor sets, ranks)") {
    val got = run(5)
    val want = replica(fixture, 5)
    assert(got.keySet == want.keySet)
    got.foreach { case (key, (sim, rk)) =>
      val (wsim, wrk) = want(key)
      assert(sim == wsim, s"edge $key sim $sim != $wsim")
      assert(rk == wrk, s"edge $key rank $rk != $wrk")
    }
    // every vector has exactly k = 5 neighbors (cells hold 20 > 5)
    assert(got.keySet.groupBy(_._1).forall(_._2.size == 5))
  }

  test("k past the cell size fills with the whole cell, still exact") {
    val got = run(25)
    val want = replica(fixture, 25)
    assert(got == want)
    // 3 cells of 20 vectors: every vector gets all 19 in-cell others
    assert(got.keySet.groupBy(_._1).forall(_._2.size == 19))
  }

  test("plan has no Window node: top-k runs in the bounded aggregator") {
    import spark.implicits._
    val df = graft.queries.Embeddings.knnGraph(
      fixture.toDF("vec_id", "embedding", "label"), 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window sort:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      "expected the TopKSimAgg aggregate on the pair stream")
  }
}
