package graft

import org.apache.spark.sql.functions._

/** q171_classifier_lift: the TABLE ALGEBRA (deciles, rates, lift,
  * gains) replicated in the JVM from the same margin/verdict inputs
  * (whose own correctness is pinned by q109's oracle and the gopher
  * specs) — plus the invariants a gains table must satisfy: docs and
  * passes partition across deciles, cum_gain ends at 1, and the
  * docs-weighted mean lift is 1.
  */
class ClassifierLiftSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("decile table ≡ JVM replica of the lift algebra; invariants") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val margins = SparkEntry.queries("q109_quality_classifier")(spark, sf)
      .select($"doc_id", $"margin")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pass = graft.queries.Mining.gopherRules(
        docs.select($"doc_id", $"text"))
      .select($"doc_id", $"pass")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // q169's equi-depth integer cut: rank rk (1-based) → decile
    // (rk−1)·10 div n + 1 (bucket sizes differ by ≤ 1)
    val ordered = margins.sortBy { case (id, m) => (-m, id) }
    val n = ordered.length
    val deciles = ordered.zipWithIndex
      .map { case ((id, _), i) => (i.toLong * 10 / n + 1, id) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, xs) => (d, xs.map(_._2)) }
    val np = margins.map { case (id, _) => pass.getOrElse(id, 0L) }.sum
    val want = deciles.map { case (d, ids) =>
      val nPass = ids.map(pass.getOrElse(_, 0L)).sum
      (d, ids.size.toLong, nPass)
    }
    val cum = want.scanLeft(0L)(_ + _._3).tail
    val wantFull = want.zip(cum).map { case ((d, nd, npv), c) =>
      (d, nd, npv, npv.toDouble / nd,
        (npv * n).toDouble / (nd * np), c.toDouble / np)
    }.toSet

    val got = SparkEntry.queries("q171_classifier_lift")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
      .toSet
    assert(got == wantFull,
      s"only-got=${got -- wantFull} only-want=${wantFull -- got}")
    // invariants
    val rowsByD = got.toSeq.sortBy(_._1)
    assert(rowsByD.map(_._2).sum == n && rowsByD.map(_._3).sum == np)
    assert(rowsByD.last._6 == 1.0, s"cum_gain tail ${rowsByD.last._6}")
    val meanLift = rowsByD.map(r => r._5 * r._2).sum / n
    assert(math.abs(meanLift - 1.0) < 1e-9, s"weighted mean lift $meanLift")
  }
}
