package graft

import graft.ops.ConnectedComponents

/** Connected-components strategies: the O(diameter) local hash-min form
  * and the O(log n) large-star/small-star form must label identically,
  * and the star form's round count on a long path graph must be
  * logarithmic, not linear — the property that makes it the 100 TB path
  * (a 256-hop chain in ~8 rounds instead of ~256).
  */
class CcSpec extends SparkSuite {

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("large-star/small-star equals hash-min on a mixed component graph") {
    import spark.implicits._
    // components: a 30-vertex path, a 10-vertex star, a triangle with a
    // pendant, several isolated edges — deterministic shuffle-ish ids
    val edges =
      (0L until 29L).map(i => (i * 7 % 1000 + 100, (i + 1) * 7 % 1000 + 100)) ++ // path (relabeled)
        (1L to 9L).map(i => (2000L, 2000L + i)) ++ // star
        Seq((3000L, 3001L), (3001L, 3002L), (3002L, 3000L), (3002L, 3003L)) ++ // triangle+pendant
        Seq((4000L, 4001L), (4002L, 4003L), (4004L, 4005L)) // isolated edges
    val df = edges.toDF("d1", "d2")
    val hm = labelsOf(ConnectedComponents.hashMinLocal(df))
    val (lsss, _) = ConnectedComponents.largeStarSmallStar(df)
    assert(hm === labelsOf(lsss))
    // the driver-local union-find (auto()'s under-threshold branch)
    // must agree with both distributed forms
    assert(hm === labelsOf(ConnectedComponents.dsuLocal(df)))
    // spot-check semantics: every vertex of the star labels to its min
    assert(hm(2009L) === 2000L)
    assert(hm(3003L) === 3000L)
  }

  test("large-star/small-star converges in O(log n) rounds on a 256-path") {
    import spark.implicits._
    val n = 256
    val path = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    val (labels, rounds) = ConnectedComponents.largeStarSmallStar(path)
    val m = labelsOf(labels)
    assert(m.size === n)
    assert(m.values.forall(_ === 0L), "every path vertex joins component 0")
    // diameter is 255; a hash-min loop needs ~255 rounds. The star
    // alternation must stay logarithmic (2*log2(256)=16, +slack).
    assert(rounds <= 20, s"expected O(log n) rounds, got $rounds")
  }

  test("auto picks each strategy and both match q45 semantics") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val viaLocal = labelsOf(ConnectedComponents.auto(edges, localThreshold = 1000L))
    val viaStars = labelsOf(ConnectedComponents.auto(edges, localThreshold = 0L))
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    assert(viaLocal === expected)
    assert(viaStars === expected)
  }

  test("empty pair graph yields empty labels on both strategies") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.hashMinLocal(empty).count() === 0)
    assert(ConnectedComponents.largeStarSmallStar(empty)._1.count() === 0)
    assert(ConnectedComponents.dsuLocal(empty).count() === 0)
  }
}
