package graft

/** q169_equidepth_hist: the bucket table must equal an integer-rank
  * replica on a 25-row fixture (bucket sizes alternate 3/2 — never
  * off by more than one), including a planted run of EQUAL values
  * spanning a bucket boundary: the (price, orderkey, linenumber)
  * total key must split them deterministically.
  */
class EquidepthSpec extends SparkSuite {

  // 25 rows: values 1..20 plus five copies of 21 (the tie run at the
  // top — it spans the last two buckets)
  private val rows: Seq[(Double, Long, Int)] =
    (1 to 20).map(v => (v.toDouble, 1000L + v, 1)) ++
      (1 to 5).map(i => (21.0, 2000L + i, i))

  test("buckets ≡ integer-rank replica; ties split by the total key") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("eqd").toString
    rows.toDF("l_extendedprice", "l_orderkey", "l_linenumber")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val sorted = rows.sortBy(r => (r._1, r._2, r._3))
    val n = sorted.size.toLong
    val want = sorted.zipWithIndex
      .map { case ((v, _, _), i) => (i.toLong * 10 / n, v) }
      .groupBy(_._1).map { case (b, vs) =>
        (b, vs.size.toLong, vs.map(_._2).min, vs.map(_._2).max,
          vs.map(_._2).sum)
      }.toSet

    val got = SparkEntry.queries("q169_equidepth_hist")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
      .toSet
    assert(got == want, s"got $got\nwant $want")
    // equi-depth: sizes differ by at most one
    val sizes = got.toSeq.map(_._2)
    assert(sizes.max - sizes.min <= 1, s"sizes $sizes")
    // the tie run (five 21.0s) spans buckets 8 and 9
    val hi = got.filter(_._3 == 21.0).map(_._1)
    assert(hi == Set(8L, 9L), s"tie run landed in $hi")
  }
}
