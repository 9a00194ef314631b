package graft

/** q159_rank_suite (dense_rank / percent_rank / cume_dist / ntile /
  * lag / lead on one deterministic order): a small two-partition
  * fixture pins the peer semantics — the unique tie-break makes every
  * row its own peer group, so dense_rank equals the row index and
  * percent_rank/cume_dist are the exact (i−1)/(N−1) and i/N
  * fractions — and the lag/lead sentinels at the partition borders.
  */
class RankSuiteSpec extends SparkSuite {

  test("ranks, fractions, ntile and boundary sentinels are exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rank").toString
    // priority P1: prices 100, 100, 90, 80 (tie split by key);
    // priority P2: single row (percent_rank of a 1-row partition = 0)
    Seq(
      (1L, 5L, "O", 100.0, "P1"), (2L, 5L, "O", 100.0, "P1"),
      (3L, 5L, "O", 90.0, "P1"), (4L, 5L, "O", 80.0, "P1"),
      (5L, 5L, "O", 50.0, "P2"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q159_rank_suite")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4), r.getDouble(5),
        r.getLong(6), r.getDouble(7), r.getDouble(8))))
      .toMap
    // the tie-broken total order means every row is its own peer
    // group: drk = i, prk = (i-1)/3, cd = i/4 for the 4-row partition
    assert(got(1L) == ((1L, 0.0, 0.25, 1L, -1.0, 100.0)), got(1L))
    assert(got(2L) == ((2L, 1.0 / 3.0, 0.5, 2L, 100.0, 90.0)), got(2L))
    assert(got(3L) == ((3L, 2.0 / 3.0, 0.75, 3L, 100.0, 80.0)), got(3L))
    assert(got(4L) == ((4L, 1.0, 1.0, 4L, 90.0, -1.0)), got(4L))
    // single-row partition: rank fractions degenerate to 0 and 1,
    // both lag and lead take the sentinel
    assert(got(5L) == ((1L, 0.0, 1.0, 1L, -1.0, -1.0)), got(5L))
  }
}
