package graft

/** q170_shuffle_skew: replica over a fixture with one planted hot key
  * (60% of rows) — the audit must read skew ≫ 1 at every P with
  * top_key_share = 0.6, exactly, from the same md5 bucket arithmetic.
  */
class ShuffleSkewSpec extends SparkSuite {

  private def md5u60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
  }

  // key 7 carries 600 rows; keys 100..199 carry 4 each (1000 total)
  private val keyCounts: Map[Long, Long] =
    Map(7L -> 600L) ++ (100L until 200L).map(k => k -> 4L).toMap

  test("skew and share ≡ md5 replica; hot key dominates at every P") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("skew").toString
    keyCounts.toSeq.flatMap { case (k, n) => Seq.fill(n.toInt)(k) }
      .toDF("l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val n = keyCounts.values.sum
    val want = Seq(16L, 64L, 256L).map { p =>
      val buckets = keyCounts.groupBy { case (k, _) => md5u60(k.toString) % p }
        .map { case (b, ks) => b -> ks.values.sum }
      (p, keyCounts.size.toLong, buckets.size.toLong, buckets.values.max,
        n, 600L, (buckets.values.max * p).toDouble / n, 600.0 / n)
    }.toSet

    val got = SparkEntry.queries("q170_shuffle_skew")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
      .toSet
    assert(got == want, s"got $got\nwant $want")
    // the planted hot key forces skew well above balanced at every P
    assert(got.forall(_._7 > 5.0), s"hot key not visible: ${got.map(_._7)}")
  }
}
