package graft

import graft.ops.PageRank
import org.apache.spark.sql.functions._

/** Two-tier PageRank (ops.PageRank, q96's engine): the driver tier and
  * the distributed tier must agree BIT-FOR-BIT — `auto` may only ever
  * change the plan, never the numbers (the ConnectedComponents.auto
  * contract).
  */
class PageRankSpec extends SparkSuite {

  private def corpusEdges = {
    import spark.implicits._
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select($"doc_id",
        expr("filter(split(lower(text), '[^a-z]+'), x -> x <> '')").as("ws"))
      .filter(size($"ws") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws)-1), i -> struct(element_at(ws, i) AS w1, element_at(ws, i+1) AS w2))")).as("e"))
      .select($"e.w1".as("w1"), $"e.w2".as("w2"))
      .groupBy($"w1", $"w2").agg(count(lit(1)).cast("long").as("c"))
  }

  test("local and distributed tiers agree bit-for-bit on the corpus graph") {
    val local = PageRank.run(corpusEdges, rounds = 5, strategy = "local")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dist = PageRank.run(corpusEdges, rounds = 5, strategy = "distributed")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(local.keySet == dist.keySet)
    local.foreach { case (w, p) =>
      assert(java.lang.Double.doubleToLongBits(p) ==
        java.lang.Double.doubleToLongBits(dist(w)), s"tier mismatch at $w: $p vs ${dist(w)}")
    }
  }

  test("dangling mass is redistributed: ranks sum to 1 on a dangling graph") {
    import spark.implicits._
    // b and c have no out-edges — without dangling handling, mass leaks
    val edges = Seq(("a", "b", 2L), ("a", "c", 1L), ("d", "a", 1L))
      .toDF("w1", "w2", "c")
    Seq("local", "distributed").foreach { tier =>
      val pr = PageRank.run(edges, rounds = 10, strategy = tier)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(pr.size == 4)
      assert(math.abs(pr.values.sum - 1.0) < 1e-9, s"$tier mass=${pr.values.sum}")
      // b receives 2/3 of a's emitted mass, c 1/3 — order must hold
      assert(pr("b") > pr("c"), s"$tier: ${pr("b")} !> ${pr("c")}")
    }
  }

  test("auto picks the local tier under the threshold, distributed above") {
    // behavioural check: both settings return the same ranks on the
    // corpus graph regardless of which tier the threshold selects
    val viaAuto = PageRank.run(corpusEdges, rounds = 3, strategy = "auto",
      localThreshold = 1L) // forces the distributed tier
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaLocal = PageRank.run(corpusEdges, rounds = 3, strategy = "local")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaAuto == viaLocal)
  }
}
