package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank (Brin & Page 1998) with uniform dangling-mass
  * redistribution — fixed-round, deterministic, and bit-identical
  * across its two execution tiers (the [[ConnectedComponents.auto]]
  * precedent):
  *
  *  - `local`: the node/edge frames are collected (bounded by the
  *    caller's threshold) and the rounds run on driver arrays — one
  *    tiny job instead of one-plus jobs per round. Right whenever the
  *    graph is dimension-sized (a vocabulary, a label set).
  *  - `distributed`: each round is one hash join + one ordered-fold
  *    aggregation + a 1-row dangling aggregate, with localCheckpoint
  *    keeping the lineage linear and every superseded checkpoint
  *    unpersisted (the q45 eager-iteration discipline). The
  *    100 TB-vocabulary path.
  *
  * Both tiers evaluate the SAME IEEE operation sequence — transition
  * weights are single exact-integer divisions; per-node in-sums fold
  * in ascending source order; the dangling sum folds in ascending node
  * order; the update is `(1−d)/n + d·(insum + dsum/n)` with that exact
  * op tree — and the local tier orders strings by UTF-8 bytes, the
  * binary collation Spark's `sort_array` (and DuckDB ORDER BY) uses,
  * NOT Java's UTF-16 `compareTo` (they disagree on supplementary-plane
  * code points). So `auto` never changes results, only plans
  * (PageRankSpec pins tier equality bit-for-bit).
  *
  * Input `edges`: (w1, w2, c) — directed, integer-weighted, already
  * aggregated (one row per edge). Output: (w, pr).
  */
object PageRank {

  /** UTF-8 binary string order — the canonical fold order both engines
    * and both tiers share.
    */
  private[ops] val utf8Order: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
  }

  def run(
      edges: DataFrame,
      rounds: Int,
      strategy: String = "auto",
      localThreshold: Long = 100000L): DataFrame = strategy match {
    case "local" => iterateLocal(edges, rounds)
    case "distributed" => iterateDistributed(edges.localCheckpoint(), rounds)
    case "auto" =>
      // materialize the edge set ONCE: the threshold probe is an
      // action, and without this the whole upstream pipeline (q96's
      // corpus-sized bigram aggregation) would execute twice — once
      // for the count, once for the iteration
      val e = edges.localCheckpoint()
      if (e.count() <= localThreshold) {
        val r = iterateLocal(e, rounds)
        Checkpoints.release(e)
        r
      } else iterateDistributed(e, rounds) // releases e when done
    case other => throw new IllegalArgumentException(s"unknown strategy $other")
  }

  /** Driver tier: edge list ≤ threshold rows by contract (vocab²-
    * bounded for word graphs — the q45 dsuLocal shape).
    */
  def runLocal(edges: DataFrame, rounds: Int): DataFrame =
    iterateLocal(edges, rounds)

  /** Distributed tier: vocab-sized frames, one join + ordered-fold agg
    * + dangling scalar per round.
    */
  def runDistributed(edges: DataFrame, rounds: Int): DataFrame =
    iterateDistributed(edges.localCheckpoint(), rounds)

  private def iterateLocal(edges: DataFrame, rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.select(col("w1"), col("w2"), col("c").cast("long"))
      .as[(String, String, Long)].collect()
    val wout = es.groupBy(_._1).map { case (w, g) => w -> g.map(_._3).sum }
    // p = c/wout: the same single exact-BIGINT division the SQL does
    val trans = es.map { case (w1, w2, c) => (w1, w2, c.toDouble / wout(w1).toDouble) }
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted(utf8Order)
    val n = nodes.length.toDouble
    val incoming = trans.groupBy(_._2).map { case (w2, g) =>
      w2 -> g.sortBy(_._1)(utf8Order) // ascending source order — the fold order
    }
    val dangling = nodes.filterNot(wout.contains) // sorted (nodes is)
    var pr = nodes.map(w => w -> (1.0 / n)).toMap
    var it = 0
    while (it < rounds) {
      var dsum = 0.0
      dangling.foreach { w => dsum += pr(w) }
      pr = nodes.map { w =>
        var insum = 0.0
        incoming.getOrElse(w, Array.empty[(String, String, Double)])
          .foreach { case (w1, _, p) => insum += pr(w1) * p }
        w -> (0.15 / n + 0.85 * (insum + dsum / n))
      }.toMap
      it += 1
    }
    nodes.map(w => (w, pr(w))).toSeq.toDF("w", "pr")
  }

  /** `e` must already be materialized (localCheckpoint'ed) by the
    * caller — every public entry does.
    */
  private def iterateDistributed(e0: DataFrame, rounds: Int): DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    val e = e0.select(col("w1"), col("w2"), col("c").cast("long").as("c"))
    val wout = e.groupBy($"w1").agg(sum($"c").cast("long").as("wout"))
    val trans = e.join(wout, "w1")
      .select($"w1", $"w2", ($"c".cast("double") / $"wout".cast("double")).as("p"))
      .localCheckpoint()
    val nodes = e.select($"w1".as("w")).union(e.select($"w2".as("w"))).distinct()
      .coalesce(1)
      .localCheckpoint()
    // |V| as a driver scalar (1-row collect): constant-folds into the
    // round update as the same single divisions the oracle performs
    val n = nodes.count().toDouble
    val outW = trans.select($"w1".as("w")).distinct().localCheckpoint()
    var pr = nodes.select($"w", (lit(1.0) / lit(n)).as("pr")).localCheckpoint()
    var it = 0
    while (it < rounds) {
      val dang = pr.join(outW, Seq("w"), "left_anti")
        .agg(sort_array(collect_list(struct($"w", $"pr"))).as("xs"))
        .select(expr(
          "aggregate(xs, CAST(0.0 AS DOUBLE), (a, e) -> a + e.pr)").as("dsum"))
      val insum = trans.join(pr, trans("w1") === pr("w"))
        .select($"w2", $"w1", ($"pr" * $"p").as("ct"))
        .groupBy($"w2")
        .agg(sort_array(collect_list(struct($"w1", $"ct"))).as("xs"))
        .select($"w2".as("w"), expr(
          "aggregate(xs, CAST(0.0 AS DOUBLE), (a, e) -> a + e.ct)").as("insum"))
      val next = nodes.join(insum, Seq("w"), "left")
        .crossJoin(broadcast(dang))
        .select($"w",
          (lit(0.15) / lit(n) + lit(0.85) *
            (coalesce($"insum", lit(0.0)) + $"dsum" / lit(n))).as("pr"))
        .localCheckpoint()
      // release the superseded round's blocks — R rank-frame copies
      // would otherwise stay cached for the session's lifetime
      Checkpoints.release(pr)
      pr = next
      it += 1
    }
    // intermediates are no longer read once the final rank frame is
    // materialized; only `pr` (returned) stays cached
    Seq(e0, trans, nodes, outW).foreach(Checkpoints.release)
    pr
  }
}
