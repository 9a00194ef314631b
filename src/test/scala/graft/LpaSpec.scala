package graft

/** q126 deterministic synchronous LPA: exact agreement with a JVM
  * replica of the min-over-(−count, label) update on hand graphs and
  * random graphs, plus hand-checked community structure (two
  * triangles joined by a bridge separate; a star collapses onto its
  * min leaf).
  */
class LpaSpec extends SparkSuite {

  private def replica(edges: Seq[(String, String)], rounds: Int): Map[String, String] = {
    val nbrs = (edges ++ edges.map(_.swap))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var lbl = nbrs.keys.map(v => v -> v).toMap
    (1 to rounds).foreach { _ =>
      lbl = nbrs.map { case (v, ns) =>
        val counts = ns.groupBy(lbl).map { case (l, xs) => (l, xs.size.toLong) }
        v -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lbl
  }

  private def run(edges: Seq[(String, String)], rounds: Int): Map[String, String] = {
    import spark.implicits._
    graft.queries.Selection.labelProp(edges.toDF("a", "b"), rounds)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("two triangles + bridge: communities converge to the triangle minima") {
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z"),
      ("c", "x"))
    val got = run(edges, 4)
    assert(got == replica(edges, 4))
    // both triangles collapse onto 'a' ('a' invades over the bridge
    // by the min tie-break — the deterministic variant's contract)
    assert(Set("a", "b", "c").map(got) == Set("a"))
  }

  test("star: synchronous LPA oscillates on bipartite structure (known property)") {
    // the textbook failure mode synchronous LPA is documented for:
    // on a star the hub and leaves SWAP labels every round (hub takes
    // the min leaf, leaves take the hub's previous label), so parity
    // decides the labeling — the engine must reproduce exactly this,
    // not silently damp it
    val edges = (1 to 9).map(i => ("hub", s"leaf$i"))
    val r2 = run(edges, 2)
    assert(r2 == replica(edges, 2))
    assert(r2("hub") == "hub" && (1 to 9).forall(i => r2(s"leaf$i") == "leaf1"))
    val r3 = run(edges, 3)
    assert(r3 == replica(edges, 3))
    assert(r3("hub") == "leaf1" && (1 to 9).forall(i => r3(s"leaf$i") == "hub"))
  }

  test("engine ≡ replica on random graphs (ties everywhere)") {
    val r = new scala.util.Random(11)
    (0 until 3).foreach { trial =>
      val n = 20 + trial * 10
      val edges = (0 until n * 2).map { _ =>
        val a = r.nextInt(n); var b = r.nextInt(n)
        while (b == a) b = r.nextInt(n)
        (f"v$a%02d", f"v$b%02d")
      }.distinct
        .map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
      val rounds = 1 + trial
      assert(run(edges, rounds) == replica(edges, rounds), s"trial $trial diverged")
    }
  }
}
