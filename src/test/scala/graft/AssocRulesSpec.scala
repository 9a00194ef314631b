package graft

/** q162_assoc_rules (Apriori k=2 pass): output must equal a JVM
  * replica computed straight from the basket fixture — every count
  * and all three ratio doubles (single IEEE divisions of the same
  * integer operands). Planted: a hot pair {1,2} in 3 of 8 baskets
  * (above the n_ab ≥ 2 gate), a once-only pair (gated out), and a
  * duplicate lineitem row (the DISTINCT collapse must count it once).
  */
class AssocRulesSpec extends SparkSuite {

  // (order, part); order 10 carries part 1 twice — distinct test
  private val baskets: Seq[(Long, Long)] = Seq(
    (10L, 1L), (10L, 1L), (10L, 2L), (10L, 5L),
    (11L, 1L), (11L, 2L),
    (12L, 1L), (12L, 2L), (12L, 3L),
    (13L, 1L), (13L, 4L),
    (14L, 3L), (14L, 4L),
    (15L, 3L), (15L, 4L),
    (16L, 5L), (16L, 6L), // pair (5,6) occurs once -> gated
    (17L, 7L))

  test("rules ≡ replica: counts, confidences, lift") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("assoc").toString
    baskets.toDF("l_orderkey", "l_partkey").write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")

    val items = baskets.distinct
    val nOrders = items.map(_._1).distinct.size.toLong
    val marg = items.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pairCounts = items.groupBy(_._1).values.flatMap { b =>
      val ps = b.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val replica = pairCounts.collect {
      case ((p1, p2), nab) if nab >= 2 =>
        val (na, nb) = (marg(p1), marg(p2))
        (p1, p2, nab, na, nb, nOrders,
          nab.toDouble / na, nab.toDouble / nb,
          (nab * nOrders).toDouble / (na * nb))
    }.toSet

    val rows = SparkEntry.queries("q162_assoc_rules")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8)))
      .toSet
    assert(rows == replica, s"engine=${rows.size} replica=${replica.size}")
    // the planted hot pair, by hand: n_ab=3, n_a=4, n_b=3, N=8
    assert(rows.contains((1L, 2L, 3L, 4L, 3L, 8L,
      3.0 / 4, 3.0 / 3, (3L * 8L).toDouble / (4L * 3L))))
    // the once-only pair is gated
    assert(!rows.exists(r => r._1 == 5L && r._2 == 6L))
  }
}
