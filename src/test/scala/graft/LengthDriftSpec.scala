package graft

/** q143_length_drift (drop-vs-corpus KS over 50-char length buckets):
  * exact agreement with a JVM replica, and the statistic's anchors —
  * identically-distributed sides read KS = 0, fully separated length
  * regimes read KS = 1 with the gap at the boundary bucket.
  */
class LengthDriftSpec extends SparkSuite {

  private def replica(docs: Seq[(Long, Long)]): (Long, Long, Long, Double) = {
    val bkts = docs.map { case (id, n) => (if (id % 10 == 3) 1 else 0, n / 50) }
    val byB = bkts.groupBy(_._2).view.mapValues { xs =>
      (xs.count(_._1 == 1).toLong, xs.count(_._1 == 0).toLong)
    }.toMap
    val nd = byB.values.map(_._1).sum
    val nc = byB.values.map(_._2).sum
    var (fd, fc) = (0L, 0L)
    val gaps = byB.keys.toSeq.sorted.map { b =>
      fd += byB(b)._1; fc += byB(b)._2
      (b, math.abs(fd.toDouble / nd.toDouble - fc.toDouble / nc.toDouble))
    }
    val best = gaps.minBy { case (b, g) => (-g, b) }
    (best._1, nd, nc, best._2)
  }

  private def run(docs: Seq[(Long, Long)]): (Long, Long, Long, Double) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ksdrift").toString
    docs.toDF("doc_id", "n_chars").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q143_length_drift")(spark, dir).collect()
    assert(r.length == 1, s"expected one row, got ${r.length}")
    (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getDouble(3))
  }

  test("identical length distributions read KS = 0") {
    // every id gets length 120 — both sides identical
    val docs = (0L until 200L).map(id => (id, 120L))
    val (_, nd, nc, ks) = run(docs)
    assert(nd == 20L && nc == 180L)
    assert(ks == 0.0, s"ks $ks")
  }

  test("separated length regimes read KS = 1 at the boundary; engine ≡ replica") {
    // drop docs (id % 10 == 3) are all short (40 chars → bucket 0),
    // corpus docs all long (500 chars → bucket 10)
    val docs = (0L until 200L).map { id =>
      (id, if (id % 10 == 3) 40L else 500L)
    }
    val got = run(docs)
    assert(got == replica(docs), s"got $got")
    assert(got._4 == 1.0, s"fully separated regimes must read KS = 1, got ${got._4}")
    assert(got._1 == 0L, "the gap peaks at the short side's bucket")
  }

  test("random mixed lengths ≡ replica exactly") {
    val r = new scala.util.Random(311)
    val docs = (0L until 400L).map { id =>
      // the drop skews slightly longer — a realistic drift shape
      val base = if (id % 10 == 3) 80 + r.nextInt(400) else 50 + r.nextInt(350)
      (id, base.toLong)
    }
    assert(run(docs) == replica(docs))
  }
}
