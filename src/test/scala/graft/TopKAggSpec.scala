package graft

import graft.functions.TopKAgg
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** graft.functions.TopKAgg (bounded grouped top-k): algebraic laws on
  * random inputs — any fold/merge tree over any permutation equals
  * global sort-take-k, buffers never exceed k — and the q114 query
  * path must coincide with q75's window formulation row for row.
  */
class TopKAggSpec extends SparkSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7000L + i)))

  private def globalTopK(xs: Seq[(String, Long)], k: Int): Seq[(Long, String)] =
    xs.map { case (t, n) => (n, t) }
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      .take(k)

  test("fold ∘ merge over any split/permutation ≡ global sort-take-k; state ≤ k") {
    val itemGen = for {
      t <- Gen.stringOfN(3, Gen.alphaLowerChar)
      n <- Gen.choose(0L, 50L)
    } yield (t, n)
    val streamGen = Gen.listOfN(60, itemGen)
    samples(streamGen, 10).zipWithIndex.foreach { case (xs, i) =>
      val k = 1 + (i % 7)
      val agg = new TopKAgg(k)
      // three different fold/merge trees over permutations
      val whole = xs.foldLeft(agg.zero)(agg.reduce)
      val (l, r) = scala.util.Random.javaRandomToRandom(
        new java.util.Random(i)).shuffle(xs).splitAt(xs.size / 3)
      val split = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      val singles = xs.reverse.map(x => agg.reduce(agg.zero, x))
        .foldLeft(agg.zero)(agg.merge)
      val expect = globalTopK(xs, k)
      assert(agg.finish(whole) == expect, s"k=$k whole diverged")
      assert(agg.finish(split) == expect, s"k=$k split diverged")
      assert(agg.finish(singles) == expect, s"k=$k singles diverged")
      assert(whole.size <= k && split.size <= k && singles.size <= k)
    }
  }

  test("q114 (bounded Aggregator) ≡ q75 (window) on the real corpus") {
    val sf = "/root/testdata/sf0.01"
    def rows(name: String) = SparkEntry.queries(name)(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(rows("q114_grouped_topk_agg") == rows("q75_vocab_topk"))
  }
}
