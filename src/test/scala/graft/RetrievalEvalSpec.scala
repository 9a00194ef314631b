package graft

import org.apache.spark.sql.functions._

/** q184_retrieval_eval: a hand-computable geometry — query 0's
  * relevant docs planted at cosines 1.0 / 0.6 / 0.0 among known
  * distractors, so first-rank, P@10, R@10 and the exact AP fold
  * ((1 + 2/3) + 3/8) / 3 are all checkable as the same IEEE doubles
  * the engine must produce (division order replicated).
  */
class RetrievalEvalSpec extends SparkSuite {

  test("MRR / P@10 / R@10 / AP@20 ≡ hand computation on planted ranks") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("releval").toString
    def v(a: Double, b: Double, c: Double, d: Double): Array[Float] =
      Array(a.toFloat, b.toFloat, c.toFloat, d.toFloat)
    // qid 0 (label 9) against: v10 cos 1.0 (label 9), v11 cos 0.8
    // (label 5), v12 cos 0.6 (label 9), v13 cos 0.0 (label 9), and
    // the other four query vectors (label 7, orthogonal, cos 0.0).
    // Zero-sim ties break by vec_id: ranks 4..8 = ids 1,2,3,4,13 →
    // relevant ranks for qid 0 are exactly 1, 3, 8.
    val rows = Seq(
      (0L, v(1, 0, 0, 0), 9),
      (1L, v(0, 0, 1, 0), 7),
      (2L, v(0, 0, 1, 0), 7),
      (3L, v(0, 0, 1, 0), 7),
      (4L, v(0, 0, 1, 0), 7),
      (10L, v(1, 0, 0, 0), 9),
      (11L, v(0.8, 0.6, 0, 0), 5),
      (12L, v(0.6, 0.8, 0, 0), 9),
      (13L, v(0, 1, 0, 0), 9))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val got = SparkEntry.queries("q184_retrieval_eval")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(got.size == 5, s"queries: ${got.keySet}")
    val (nRel, firstRank, rr, p10, r10, ap) = got(0L)
    assert(nRel == 3L && firstRank == 1L && rr == 1.0)
    assert(p10 == 3.0 / 10.0, s"p10 $p10")
    assert(r10 == 3.0 / 3.0, s"r10 $r10")
    // AP fold in rank order: precision at hits 1, 3, 8 — the engine
    // sums sequentially then divides once
    assert(ap == ((1.0 + 2.0 / 3.0) + 3.0 / 8.0) / 3.0, s"ap $ap")
    // the label-7 queries see each other at cos 1.0: perfect first
    // rank and full recall of their 3-member ground truth
    (1L to 4L).foreach { q =>
      val (n, fr, rrq, _, rq, _) = got(q)
      assert(n == 3L && fr == 1L && rrq == 1.0 && rq == 1.0, s"q$q: ${got(q)}")
    }
  }
}
