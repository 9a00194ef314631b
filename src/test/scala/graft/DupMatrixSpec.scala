package graft

/** q125 cross-source near-dup matrix: exact agreement with a JVM
  * regroup of q21's verified pairs by source metadata — the matrix is
  * an exact re-aggregation, not a new approximation.
  */
class DupMatrixSpec extends SparkSuite {

  test("matrix ≡ q21 pairs regrouped by source; unordered keys; totals conserve") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val src = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = SparkEntry.queries("q21_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = pairs
      .map { case (d1, d2, jac) =>
        val (s1, s2) = (src(d1), src(d2))
        ((if (s1 <= s2) s1 else s2, if (s1 <= s2) s2 else s1), jac)
      }
      .groupBy(_._1)
      .map { case (k, xs) => k -> ((xs.length.toLong, xs.map(_._2).max)) }
    val got = SparkEntry.queries("q125_dup_source_matrix")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == want)
    got.keys.foreach { case (sa, sb) => assert(sa <= sb) }
    assert(got.values.map(_._1).sum == pairs.length.toLong,
      "matrix cells must conserve the total pair count")
  }
}
