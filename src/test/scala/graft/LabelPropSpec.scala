package graft

import org.apache.spark.sql.functions._

/** ops.LabelProp: hand-solved fixtures land exactly (two weight-10
  * triangles bridged by a weight-1 edge resolve to two communities in
  * 3 rounds; a weight tie breaks to the smallest label; a self-loop
  * never relabels its node), and the q239 corpus run is deterministic
  * with the nofollow-only spam farm absent from the node set.
  */
class LabelPropSpec extends SparkSuite {

  private def edges(rows: Seq[(String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("a", "b", "w")
  }

  test("two bridged triangles resolve to exactly two communities") {
    val e = edges(Seq(
      ("a1", "a2", 10L), ("a2", "a3", 10L), ("a1", "a3", 10L),
      ("b1", "b2", 10L), ("b2", "b3", 10L), ("b1", "b3", 10L),
      ("a3", "b1", 1L)))
    val got = graft.ops.LabelProp.run(e, rounds = 3).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "a1" -> "a1", "a2" -> "a1", "a3" -> "a1",
      "b1" -> "b1", "b2" -> "b1", "b3" -> "b1"))
  }

  test("weight tie breaks to the smallest label; heavier weight wins outright") {
    // x sees m and z at equal weight after one round → min label 'm'
    val tie = graft.ops.LabelProp.run(
      edges(Seq(("x", "m", 5L), ("x", "z", 5L))), rounds = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tie("x") === "m")
    // but a heavier z-edge overrides the label order
    val heavy = graft.ops.LabelProp.run(
      edges(Seq(("x", "m", 5L), ("x", "z", 6L))), rounds = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(heavy("x") === "z")
  }

  test("self-loops are dropped: a loop-only node keeps its own label") {
    val got = graft.ops.LabelProp.run(
      edges(Seq(("s", "s", 99L), ("p", "q", 1L))), rounds = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("s") === "s")
  }

  test("q239 corpus: node set excludes the nofollow-only spam farm; deterministic") {
    val dir = "/root/testdata/sf0.001"
    val run1 = SparkEntry.queries("q239_host_communities")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(run1.nonEmpty)
    assert(!run1.exists(_._1.contains("spam-farm")),
      "nofollow edges may not seed the community graph")
    // communities are labels drawn from the node set itself
    val hosts = run1.map(_._1)
    assert(run1.map(_._2).subsetOf(hosts))
    val run2 = SparkEntry.queries("q239_host_communities")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(run1 === run2)
  }

  test("q240 audit: the mirror is the ONLY suspect, at exactly zero trust") {
    val dir = "/root/testdata/sf0.001"
    val audit = SparkEntry.queries("q240_host_trust_audit")(spark, dir)
      .localCheckpoint()
    val suspects = audit.filter(col("is_suspect") === 1L).collect()
    assert(suspects.map(_.getString(0)).toSet === Set("freestuff-mirror.biz"),
      "every mirror page is seed-unreachable; every other host carries trust")
    // EXACT zero, not merely small: the TrustRank walk never reaches it
    assert(suspects.head.getLong(4) === 0L)
    assert(suspects.head.getLong(5) === 0L)
    // the flag/percent algebra holds corpus-wide
    assert(audit.filter(
      "trust_pct <> CAST(trust_mass * 100 div greatest(rank_mass, 1) AS BIGINT)")
      .count() === 0)
    assert(audit.filter(
      "is_suspect <> CAST(CASE WHEN trust_pct <= 5 THEN 1 ELSE 0 END AS BIGINT)")
      .count() === 0)
    // community context present for every host (self-labeled fallback)
    assert(audit.filter("community IS NULL OR community = ''").count() === 0)
    audit.unpersist()
  }
}
