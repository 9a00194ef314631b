package graft

import org.apache.spark.sql.functions._

/** q205 quality slices + q206 Poisson bootstrap.
  *
  * q205: the flag gate is a pure function of the emitted integers, so
  * the spec re-derives every flag from the returned (n, n_pass) cells
  * and the recomputed global totals — a full consistency replica with
  * no second Gopher run — plus partition-of-the-corpus invariants.
  *
  * q206: an exact JVM replica of the md5→uniform→Poisson-CDF weight
  * derivation reproduces all 32 replica rows bit-for-bit, and the
  * statistical sanity claims hold (n_eff ≈ n per replica; the replica
  * means bracket the true corpus mean).
  */
class SliceBootstrapSpec extends SparkSuite {

  test("q205: flags ≡ gate recomputed from the emitted cells; cells partition the corpus") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q205_quality_slices")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getLong(7)))
    assert(rows.nonEmpty)
    val nTot = rows.map(_._4).sum
    val passTot = rows.map(_._5).sum
    val corpus = Sql.table(spark, dir, "documents").count()
    assert(nTot == corpus, s"cells must partition the corpus: $nTot vs $corpus")
    rows.foreach { case (lang, source, bucket, n, nPass, rate, gRate, flagged) =>
      assert(nPass <= n && rate >= 0.0 && rate <= 1.0, s"cell ($lang,$source,$bucket)")
      assert(rate == nPass.toDouble / n.toDouble)
      assert(gRate == passTot.toDouble / nTot.toDouble)
      val want =
        if (n >= 20 &&
          20 * (BigInt(nPass) * BigInt(nTot) - BigInt(passTot) * BigInt(n)).abs >=
            3 * BigInt(n) * BigInt(nTot)) 1L
        else 0L
      assert(flagged == want, s"cell ($lang,$source,$bucket): flag $flagged want $want")
    }
    info(s"${rows.length} cells, ${rows.count(_._8 == 1L)} flagged, global rate " +
      f"${passTot.toDouble / nTot}%.3f")
  }

  test("q206: exact JVM replica of the Poisson weights; statistical sanity") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q206_poisson_bootstrap")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.size == 32)

    val docs = Sql.table(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ts = Array(0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
      0.9810118431238463, 0.9963401531726563, 0.9994058151824183, 0.999916758850712)
    def w(docId: Long, b: Int): Long = {
      val u = graft.ops.Md5Hash60.ofString(s"$docId|$b").toDouble / (1L << 60).toDouble
      ts.count(u >= _).toLong
    }
    (0 until 32).foreach { b =>
      val ws = docs.map { case (id, nc) => (w(id, b), nc) }
      val nEff = ws.map(_._1).sum
      val mean = if (nEff == 0) 0.0
        else ws.map { case (k, nc) => k * nc }.sum.toDouble / nEff.toDouble
      assert(got(b.toLong) == ((nEff, mean)), s"replica $b diverged")
    }
    // Poisson(1): E[n_eff] = n — every replica within ±20% of n
    val n = docs.length.toLong
    got.values.foreach { case (nEff, _) =>
      assert(math.abs(nEff - n) <= n / 5, s"n_eff $nEff vs n $n") }
    // the replica means bracket the true mean (some above, some below)
    val trueMean = docs.map(_._2).sum.toDouble / n
    val means = got.values.map(_._2)
    assert(means.exists(_ < trueMean) && means.exists(_ > trueMean),
      s"32 replica means all on one side of $trueMean")
    val sd = math.sqrt(means.map(m => (m - trueMean) * (m - trueMean)).sum / 32)
    info(f"corpus mean $trueMean%.1f chars, bootstrap SE $sd%.2f over 32 replicas")
  }
}
