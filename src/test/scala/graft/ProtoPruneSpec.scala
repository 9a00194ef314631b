package graft

import org.apache.spark.sql.functions._

/** graft.queries.Embeddings.protoPrune (q120, SSL-prototypes /D4
  * pruning): bit-exact agreement with an in-JVM replica (ordered-fold
  * cosine to the label centroid, rank, ceil(n/4) drop), per-label
  * prune-count arithmetic, and the most-prototypical-goes-first
  * ordering on the real corpus.
  */
class ProtoPruneSpec extends SparkSuite {

  /** Replica of the engine's double arithmetic: centroid = per-index
    * mean summed in vec_id order (= q84's depth-3 tree when every
    * segment holds < 64 vectors), cosine folded in index order —
    * identical IEEE operation sequence, so comparisons are ==.
    */
  private def replica(
      emb: Seq[(Long, Array[Float], Int)]): Map[Long, (Double, Long, Long)] =
    emb.groupBy(_._3).flatMap { case (_, xs) =>
      val sorted = xs.sortBy(_._1)
      val d = sorted.head._2.length
      val cent = (0 until d).map { i =>
        var s = 0.0
        sorted.foreach { case (_, v, _) => s += v(i).toDouble }
        s / sorted.length
      }.toArray
      var nb = 0.0
      cent.foreach(c => nb += c * c)
      val sims = sorted.map { case (id, v, _) =>
        var dot = 0.0; var na = 0.0; var i = 0
        while (i < d) {
          dot += v(i).toDouble * cent(i); na += v(i).toDouble * v(i).toDouble; i += 1
        }
        id -> dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val ranked = sims.sortBy { case (id, s) => (-s, id) }.zipWithIndex
      val n = ranked.length.toLong
      ranked.map { case ((id, s), rk0) =>
        id -> (s, rk0 + 1L, if (rk0 + 1L <= (n + 3) / 4) 1L else 0L)
      }
    }

  private def fixture: Seq[(Long, Array[Float], Int)] = {
    // vec_ids < 64 keep every label inside ONE q84 tree segment, so
    // the replica's sequential vec_id-order fold is the same IEEE
    // association as the engine's depth-3 tree
    val r = new scala.util.Random(7)
    (0L until 60L).map { id =>
      val label = (id % 3).toInt
      val base = Array.tabulate(8)(i => if (i == label) 1.0f else 0.1f)
      val v = base.map(x => x + (r.nextFloat() - 0.5f) * 0.6f)
      (id, v, label)
    }
  }

  test("engine ≡ replica bit-for-bit (sims ==, ranks, prune flags)") {
    import spark.implicits._
    val emb = fixture
    val got = graft.queries.Embeddings.protoPrune(
      emb.toDF("vec_id", "embedding", "label"))
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toMap
    val want = replica(emb)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (sim, rk, pr)) =>
      val (wsim, wrk, wpr) = want(id)
      assert(sim == wsim, s"vec $id sim $sim != $wsim")
      assert(rk == wrk && pr == wpr, s"vec $id rank/flag diverged")
    }
  }

  test("plan: per-label ranks come from GlobalRank, not a window stripe") {
    val df = SparkEntry.queries("q120_proto_prune")(spark, "/root/testdata/sf0.01")
    assert(df.count() > 0) // action first: assert the EXECUTED plan
    assertNoWindowExec(df)
  }

  test("per-label prune count is exactly ceil(n/4), top ranks first") {
    val rows = SparkEntry.queries("q120_proto_prune")(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (label, xs) =>
      val n = xs.length.toLong
      val pruned = xs.filter(_._4 == 1L)
      assert(pruned.length.toLong == (n + 3) / 4, s"label $label count")
      // pruned = exactly the lowest ranks = the highest sims
      assert(pruned.map(_._3).sorted.toSeq == (1L to (n + 3) / 4).toSeq)
      val keptMaxSim = xs.filter(_._4 == 0L).map(_._2).max
      assert(pruned.map(_._2).min >= keptMaxSim, s"label $label ordering")
    }
  }
}
