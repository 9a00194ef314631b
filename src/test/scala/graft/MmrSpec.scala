package graft

import org.apache.spark.sql.functions._

/** Embeddings.mmrGreedy: exact equivalence with a sequential JVM
  * replica of the greedy on an engineered candidate set where
  * relevance order and diversity order CONFLICT — the top-relevance
  * cluster is mutually near-identical, so plain top-k would pick all
  * of it and MMR must interleave the lower-relevance outsiders.
  */
class MmrSpec extends SparkSuite {

  // candidates: ids 1-3 form a redundant cluster (rel .90/.89/.88,
  // pairwise sim .95); ids 4-6 are diverse (rel .60/.55/.50, all
  // cross sims .10)
  private val rel = Map(1L -> 0.90, 2L -> 0.89, 3L -> 0.88,
    4L -> 0.60, 5L -> 0.55, 6L -> 0.50)
  private def sim(a: Long, b: Long): Double =
    if (a == b) 1.0 else if (a <= 3 && b <= 3) 0.95 else 0.10

  private def replica(k: Int): Seq[(Long, Long, Double)] = {
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    (1 to k).foreach { t =>
      val picked = sel.map(_._2).toSet
      val best = rel.keys.toSeq.filterNot(picked).map { c =>
        val ms = if (picked.isEmpty) 0.0 else picked.map(s => sim(c, s)).max
        (c, 0.7 * rel(c) - 0.3 * ms)
      }.minBy { case (c, sc) => (-sc, c) }
      sel += ((t.toLong, best._1, best._2))
    }
    sel.toSeq
  }

  test("greedy ≡ sequential replica; diversity beats raw relevance") {
    import spark.implicits._
    val cand = rel.toSeq.map { case (id, r) => (id, r) }.toDF("vec_id", "rel")
    val sims = (for {
      a <- rel.keys; b <- rel.keys if a != b
    } yield (a, b, sim(a, b))).toSeq.toDF("c1", "c2", "sim")
    val got = graft.queries.Embeddings.mmrGreedy(cand, sims, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
      .sortBy(_._1)
    val want = replica(5)
    assert(got == want, s"got $got\nwant $want")
    // step 1 takes the most relevant; step 2 must SKIP the redundant
    // cluster-mates (0.7·.89 − 0.3·.95 = .338 < 0.7·.60 − 0.3·.10 = .39)
    assert(got.head._2 == 1L)
    assert(got(1)._2 == 4L)
    // the redundant cluster contributes exactly one of the first
    // three picks (its second member re-enters only at step 4, when
    // the .338 redundancy-penalized score finally beats id 6's .32)
    assert(got.take(3).map(_._2).count(_ <= 3L) == 1)
  }
}
