package graft

import org.apache.spark.sql.functions._

/** q203 sign random projection: the JL property it exists for —
  * projected squared distances track original squared distances on
  * the real embeddings table — plus the pure-scan plan shape (no
  * shuffle anywhere: the sign matrix is derived inside codegen, not
  * joined).
  */
class RandomProjectionSpec extends SparkSuite {

  private def q203 = SparkEntry.queries("q203_random_projection")

  test("projected distances track original distances (JL at m=16)") {
    import spark.implicits._
    val emb = Sql.table(spark, "/root/testdata/sf0.001", "embeddings")
    val orig = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val proj = q203(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (v, a) =>
        v -> a.sortBy(_._2).map(_._3) }
    assert(proj.head._2.length == 16)

    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted.take(40)
    val pairs = for (i <- ids.indices; k <- (i + 1) until ids.length)
      yield (d2(orig(ids(i)), orig(ids(k))),
             d2(proj(ids(i)).toArray, proj(ids(k)).toArray))
    // The JL estimator property: E[d²_proj] = d²_orig (the ±1/√m
    // projection is an UNBIASED distance estimator), so the pair-mean
    // ratio must sit near 1 — the sharp check on this table, whose
    // pairwise distances CONCENTRATE (std/mean ≈ 0.12: near-isotropic
    // vectors), which caps any correlation score at m=16 around 0.33
    // (verified against an independent NumPy replica of the same md5
    // sign matrix — identical to 12 digits). Both thresholds are
    // loose; the data is deterministic so the values are stable.
    val n = pairs.length.toDouble
    val (mx, my) = (pairs.map(_._1).sum / n, pairs.map(_._2).sum / n)
    val ratio = my / mx
    assert(ratio > 0.8 && ratio < 1.2, s"biased estimator: ratio = $ratio")
    val cov = pairs.map { case (x, y) => (x - mx) * (y - my) }.sum
    val sx = math.sqrt(pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum)
    val sy = math.sqrt(pairs.map(p => (p._2 - my) * (p._2 - my)).sum)
    val corr = cov / (sx * sy)
    assert(corr > 0.25, s"JL geometry lost: corr = $corr")
    info(f"mean-d² ratio = $ratio%.3f, corr = $corr%.3f over ${pairs.length} pairs")
  }

  test("pure scan: no shuffle exchange in the executed plan") {
    val df = q203(spark, "/root/testdata/sf0.001")
    df.collect()
    assert(!executedNodes(df).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      "the projection must run at scan throughput:\n" +
        df.queryExecution.executedPlan)
  }
}
