package graft

import org.apache.spark.sql.functions._

/** q117's margin engine beyond the oracle: an exact driver-side
  * replica on random blocked data, and the property the ratio margin
  * exists for — a HUB target (close to every source) wins plain
  * cosine top-1 but its inflated k-NN neighborhood demotes it, so
  * margin mining recovers the planted true pairs.
  */
class BitextMarginSpec extends SparkSuite {

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Driver replica of the full margin pipeline (k = 4). */
  private def replica(
      src: Seq[(Long, Long, Array[Float])],
      tgt: Seq[(Long, Long, Array[Float])]): Map[Long, (Long, Double)] = {
    val pairs = for {
      (cu, u, ea) <- src; (cv, v, eb) <- tgt if cu == cv
    } yield (u, v, cos(ea, eb))
    def knnAvg(xs: Seq[(Long, Double)]): Map[Long, Double] =
      xs.groupBy(_._1).map { case (k, vs) =>
        val top = vs.map(_._2).sorted(Ordering[Double].reverse).take(4)
        k -> top.sum / top.size
      }
    val au = knnAvg(pairs.map(p => (p._1, p._3)))
    val av = knnAvg(pairs.map(p => (p._2, p._3)))
    pairs.map { case (u, v, s) => (u, v, s / ((au(u) + av(v)) / 2.0)) }
      .groupBy(_._1)
      .map { case (u, ms) =>
        val best = ms.minBy(m => (-m._3, m._2))
        u -> (best._2, best._3)
      }
  }

  test("engine ≡ exact driver replica on random blocked vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    def vec() = Array.fill(8)(rnd.nextFloat() - 0.3f)
    val src = (0L until 40L).map(i => (rnd.nextInt(3).toLong, i, vec()))
    val tgt = (100L until 160L).map(i => (rnd.nextInt(3).toLong, i, vec()))
    val got = graft.queries.Selection.bitextMargin(
        src.toDF("cell", "u", "ea"), tgt.toDF("cell", "v", "eb"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3)))
      .toMap
    val want = replica(src, tgt)
    assert(got.keySet == want.keySet)
    got.foreach { case (u, (v, m)) =>
      val (wv, wm) = want(u)
      assert(v == wv, s"src $u matched $v, replica says $wv")
      assert(math.abs(m - wm) < 1e-12, s"src $u margin $m vs $wm")
    }
  }

  test("a hub target wins raw cosine but margin recovers the true pairs") {
    import spark.implicits._
    val d = 8
    // 6 sources in near-orthogonal directions (all in one sign-cell)
    val src = (0 until 6).map { i =>
      val a = Array.fill(d)(0.05f)
      a(i) = 1.0f
      (0L, i.toLong, a)
    }
    // true pairs: WEAKLY aligned with their source (0.45 spike) plus a
    // large component orthogonal to every source (coord 6) — so the
    // hub (sum of all sources, moderately close to everyone) beats
    // each true pair on raw cosine, while each true pair's OWN
    // neighborhood stays cold (its other-source sims are tiny). That
    // asymmetry is exactly what the ratio margin keys on.
    val truePairs = (0 until 6).map { i =>
      val b = Array.fill(d)(0.02f)
      b(i) = 0.45f
      b(6) = 1.0f
      (0L, 100L + i, b)
    }
    val hub = {
      val h = new Array[Float](d)
      src.foreach { case (_, _, a) => (0 until d).foreach(j => h(j) += a(j)) }
      (0L, 999L, h)
    }
    val tgt = truePairs :+ hub
    // raw cosine top-1: the hub must win for EVERY source — otherwise
    // this fixture proves nothing
    val rawWins = src.count { case (_, _, a) =>
      tgt.maxBy(t => cos(a, t._3))._2 == 999L
    }
    assert(rawWins == 6, s"fixture weak: hub wins only $rawWins/6 raw top-1s")
    val got = graft.queries.Selection.bitextMargin(
        src.toDF("cell", "u", "ea"), tgt.toDF("cell", "v", "eb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // margin mining: every source recovers ITS true pair, not the hub
    (0 until 6).foreach { i =>
      assert(got(i.toLong) == 100L + i,
        s"src $i matched ${got(i.toLong)} instead of its true pair ${100 + i}")
    }
  }
}
