package graft

/** q190_gate_classifier_kappa: the 2×2 collapse and the kappa algebra
  * replicated in the JVM from q135's own calibration cells (the two
  * queries share classifierCalibration, so the cells ARE the ground
  * truth), double-for-double — plus a hand-computed fixture check of
  * the kappa formula itself.
  */
class KappaSpec extends SparkSuite {

  test("kappa ≡ JVM replica over q135's cells; known 2×2 hand-checks") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val cells = SparkEntry.queries("q135_classifier_calibration")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val n11 = cells.filter(_._1 == 1L).map(_._3).sum
    val n10 = cells.filter(_._1 == 0L).map(_._3).sum
    val n01 = cells.filter(_._1 == 1L).map(c => c._2 - c._3).sum
    val n00 = cells.filter(_._1 == 0L).map(c => c._2 - c._3).sum
    val n = n11 + n10 + n01 + n00
    // same arithmetic order as the engine: exact integer products
    // (BigInt stands in for DECIMAL(38,0)), ONE conversion, ONE division
    val chance = (BigInt(n11 + n10) * (n11 + n01) +
      BigInt(n01 + n00) * (n10 + n00))
    val po = (n11 + n00).toDouble / n.toDouble
    val pe = chance.toDouble / (BigInt(n) * n).toDouble
    val kappa = (BigInt(n) * (n11 + n00) - chance).toDouble /
      (BigInt(n) * n - chance).toDouble
    val got = SparkEntry.queries("q190_gate_classifier_kappa")(spark, dir)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((n11, n10, n01, n00)))
    assert(r.getDouble(4) == po && r.getDouble(5) == pe &&
      r.getDouble(6) == kappa,
      s"kappa mismatch: got ${r.getDouble(6)}, replica $kappa")
    // the statistic is informative on this corpus (not degenerate)
    assert(n > 0 && kappa > -1.0 && kappa < 1.0)
    // hand-checks of the formula the replica itself uses: perfect
    // agreement → 1; independence (random marginals) → 0
    def k4(a: Long, b: Long, c: Long, d: Long): Double = {
      val ch = BigInt(a + b) * (a + c) + BigInt(c + d) * (b + d)
      val t = a + b + c + d
      (BigInt(t) * (a + d) - ch).toDouble / (BigInt(t) * t - ch).toDouble
    }
    assert(k4(40, 0, 0, 60) == 1.0)
    assert(math.abs(k4(30, 30, 20, 20)) < 1e-15) // marginals independent
  }
}
