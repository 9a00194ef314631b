package graft

/** q115 (hybrid BM25 + vector retrieval, reciprocal-rank fusion):
  * plan-shape and semantics pins beyond the DuckDB oracle — both
  * retrieval legs must run as bounded distributed top-k
  * (TakeOrderedAndProject: per-partition heaps + a 50-row merge), not
  * a global sort or a single-partition window over the corpus, and
  * the fused scores must decompose into exactly Σ 1/(60+rank) over
  * the legs each document appears in.
  */
class HybridRrfSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("both legs are TakeOrderedAndProject; no rank window over the corpus") {
    val df = SparkEntry.queries("q115_hybrid_rrf")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // two bounded top-k legs + the final top-20
    val takes = p.linesIterator.count(_.contains("TakeOrderedAndProject"))
    assert(takes >= 3, s"expected >= 3 TakeOrderedAndProject (two legs + fusion), got $takes in:\n$p")
    // every Window node must sit ABOVE a bounded take (rank over <= 50
    // rows), never directly over a corpus-sized exchange: the plan tree
    // prints children indented under parents, so a Window line whose
    // subtree (more-indented following lines) contains no
    // TakeOrderedAndProject would be ranking unbounded input.
    val lines = p.linesIterator.toVector
    def indent(s: String): Int = s.takeWhile(c => !c.isLetter).length
    lines.zipWithIndex.filter(_._1.contains("Window")).foreach { case (l, i) =>
      val ind = indent(l)
      val subtree = lines.drop(i + 1).takeWhile(x => indent(x) > ind || x.trim.isEmpty)
      assert(subtree.exists(_.contains("TakeOrderedAndProject")),
        s"Window at line $i ranks unbounded input:\n$l\n${subtree.take(5).mkString("\n")}")
    }
  }

  test("fused scores decompose into 1/(60+rank) over the legs present") {
    val rows = SparkEntry.queries("q115_hybrid_rrf")(spark, sf).collect()
    assert(rows.length == 20)
    var sawBoth = false
    var sawOne = false
    rows.foreach { r =>
      val br = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val ar = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val rrf = r.getDouble(3)
      assert(br.nonEmpty || ar.nonEmpty)
      val want = br.map(b => 1.0 / (60 + b)).getOrElse(0.0) +
        ar.map(a => 1.0 / (60 + a)).getOrElse(0.0)
      assert(java.lang.Double.doubleToLongBits(rrf) ==
        java.lang.Double.doubleToLongBits(want),
        s"doc ${r.getLong(0)}: rrf $rrf != $want (br=$br ar=$ar)")
      if (br.nonEmpty && ar.nonEmpty) sawBoth = true
      if (br.isEmpty || ar.isEmpty) sawOne = true
      br.foreach(b => assert(b >= 1 && b <= 50))
      ar.foreach(a => assert(a >= 1 && a <= 50))
    }
    // the fixture corpus exercises both fusion cases
    assert(sawBoth, "no document ranked by both legs — fusion untested")
    assert(sawOne, "every document ranked by both legs — single-leg fallback untested")
    // final order: rrf desc with doc_id tie-break, rk = 1..20
    val sorted = rows.sortBy(r => (-r.getDouble(3), r.getLong(0)))
    assert(sorted.map(_.getLong(4)).toSeq == (1L to 20L))
    assert(rows.map(_.getLong(0)).distinct.length == 20)
  }
}
