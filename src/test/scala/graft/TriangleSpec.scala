package graft

import graft.queries.Selection

/** q113 (degree-oriented triangle counting): hand-computable planted
  * graphs rendered as bigram corpora — a 3-cycle (1 triangle), a path
  * (0), K4 (4), a hub star (0: wedges everywhere, no closing edges) —
  * plus the local clustering sanity of the real corpus's near-clique
  * word graph.
  */
class TriangleSpec extends SparkSuite {

  private def run(rows: Seq[(Long, String)]): (Long, Long, Long) = {
    import spark.implicits._
    val r = Selection.triangleCount(rows.toDF("doc_id", "text")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("3-cycle → 1 triangle; path → 0; both together stay disjoint") {
    assert(run(Seq(1L -> "x y z x")) == ((3L, 3L, 1L)))
    assert(run(Seq(1L -> "p q r s")) == ((4L, 3L, 0L)))
    assert(run(Seq(1L -> "x y z x", 2L -> "p q r s")) == ((7L, 6L, 1L)))
  }

  test("K4 walked in one document → 4 triangles, each counted once") {
    // walk covering all 6 edges of {a,b,c,d}: ab bc cd da ac ~ bd via
    // 'a b c d a c b d' pairs: ab,bc,cd,da,ac,cb,bd — distinct = K4
    assert(run(Seq(1L -> "a b c d a c b d")) == ((4L, 6L, 4L)))
  }

  test("hub star: many wedges, zero triangles (orientation does not overcount)") {
    // h-l1 h-l2 ... h-l6 — the hub has degree 6, leaves 1; all edges
    // orient leaf → hub, so the wedge join finds NO common source
    // pairs closing anywhere
    // letter-only leaf names: the [^a-z]+ tokenizer strips digits
    val star = Seq("la", "lb", "lc", "ld", "le", "lf")
      .map(l => s"h $l h").mkString(" ")
    // "h la h h lb h ..." introduces only hub-leaf edges (h h pairs
    // drop as self-loops)
    assert(run(Seq(1L -> star)) == ((7L, 6L, 0L)))
  }

  test("triangle shared across documents counts once (edges are corpus-distinct)") {
    assert(run(Seq(1L -> "x y z x", 2L -> "y x", 3L -> "z y x z")) ==
      ((3L, 3L, 1L)))
  }

  test("random graphs ≡ brute-force triangle enumeration") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val names = ('a' to 'p').map(c => s"n$c")
    val edgeGen = for {
      a <- Gen.oneOf(names); b <- Gen.oneOf(names) if a != b
    } yield (Seq(a, b).min, Seq(a, b).max)
    val graphGen = Gen.listOfN(40, edgeGen).map(_.distinct)
    (0 until 8).flatMap(i =>
      graphGen.apply(Gen.Parameters.default, Seed(9000L + i))).foreach { edges =>
      // render each edge as its own 2-token document — the bigram
      // graph is then exactly this edge set
      val docs = edges.zipWithIndex.map { case ((a, b), i) =>
        (i.toLong + 1, s"$a $b")
      }
      val es = edges.toSet
      val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val brute = (for {
        i <- vs.indices; j <- (i + 1) until vs.size; l <- (j + 1) until vs.size
        if es.contains((vs(i), vs(j))) && es.contains((vs(j), vs(l))) &&
          es.contains((vs(i), vs(l)))
      } yield 1).size.toLong
      val (n, m, t) = run(docs)
      assert(n == vs.size.toLong && m == edges.size.toLong && t == brute,
        s"graph $edges: engine ($n,$m,$t) vs brute ($brute)")
    }
  }
}
