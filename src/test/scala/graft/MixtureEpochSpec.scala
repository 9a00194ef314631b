package graft

import org.apache.spark.sql.functions._

/** q179_epoch_manifest: perfect-square source sizes (1/4/16/64 docs →
  * √ = 1/2/4/8, Σ = 15, total 85) make every quota exactly
  * hand-computable; the invariants the apply step must satisfy: Σ
  * n_copies ≡ quota per source, tails upsample, heads downsample,
  * and the allocation is a pure function of doc_id (re-run stable).
  */
class MixtureEpochSpec extends SparkSuite {

  test("copy counts realize the quota exactly; tails up, heads down") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mixapply").toString
    val docs = Seq(("a", 1), ("b", 4), ("c", 16), ("d", 64))
      .flatMap { case (src, n) =>
        (0 until n).map(i => (src.hashCode * 1000L + i, "xyz", "en", src, 3L))
      }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q179_epoch_manifest")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 85)
    // quotas: floor(√n/15 · 85 + 0.5) = floor(85/15·√n + 0.5)
    def quota(n: Long) =
      math.floor(math.sqrt(n.toDouble) / 15.0 * 85.0 + 0.5).toLong
    val bySrc = got.groupBy(_._2)
    Seq(("a", 1L), ("b", 4L), ("c", 16L), ("d", 64L)).foreach {
      case (src, n) =>
        val q = quota(n)
        assert(bySrc(src).map(_._4).sum == q, s"$src quota")
        // ranks are a permutation of 1..n
        assert(bySrc(src).map(_._3).sorted.toSeq == (1L to n).toSeq,
          s"$src ranks")
        // copy counts differ by at most 1 within a source
        val cs = bySrc(src).map(_._4)
        assert(cs.max - cs.min <= 1, s"$src spread")
    }
    // the 1-doc tail upsamples (quota 6), the 64-doc head downsamples
    assert(bySrc("a").head._4 == quota(1L) && quota(1L) >= 2)
    assert(quota(64L) < 64L && bySrc("d").map(_._4).max <= 1L)
    // determinism: a second run yields the identical manifest
    val again = SparkEntry.queries("q179_epoch_manifest")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("plan: no corpus frame under a bounded-partition window") {
    import spark.implicits._
    // parquet-backed (LocalRelation fixtures constant-fold plan-shape
    // checks away); the per-source rank must come from GlobalRank's
    // range-partition pass, never a `partition by source` WindowExec
    // whose partition count is the bounded |sources| handful
    val dir = java.nio.file.Files.createTempDirectory("mixplan").toString
    (0L until 200L).map(i => (i, "t", "en", s"s${i % 3}", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = SparkEntry.queries("q179_epoch_manifest")(spark, dir)
    assert(df.count() == 200L) // action first: assert the EXECUTED plan
    def kids(p: org.apache.spark.sql.execution.SparkPlan) = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case other => other.children
    }
    def all(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: kids(p).flatMap(all)
    assert(!all(df.queryExecution.executedPlan)
      .exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "corpus-proportional window survived the GlobalRank migration:\n" +
        df.queryExecution.executedPlan)
  }
}
