package graft

/** q118 (curation audit manifest) beyond the oracle: the keep = 1 set
  * must be EXACTLY q100's survivor set (the audit is a faithful
  * explanation of the pipeline, not a parallel reimplementation that
  * can drift), every row is internally consistent (dropped rows carry
  * the FIRST failing stage in q100's order, kept rows carry nothing),
  * and every input document appears exactly once.
  */
class CurationAuditSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("keep set ≡ q100 survivors; reasons are first-failing-stage consistent") {
    val audit = SparkEntry.queries("q118_curation_audit")(spark, sf).collect()
    val survivors = SparkEntry.queries("q100_curation_pipeline")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(audit.length == nDocs, "audit must cover every input document")
    assert(audit.map(_.getLong(0)).distinct.length == audit.length)

    val kept = audit.filter(_.getLong(5) == 1L).map(_.getLong(0)).toSet
    assert(kept == survivors,
      s"audit keep set diverges from q100: only-audit=${(kept -- survivors).take(5)} " +
        s"only-q100=${(survivors -- kept).take(5)}")

    var reasons = Map.empty[String, Int].withDefaultValue(0)
    audit.foreach { r =>
      val gate = r.getLong(1) == 1L
      val exactOf = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val nearOf = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val reason = if (r.isNullAt(4)) None else Some(r.getString(4))
      val keep = r.getLong(5) == 1L
      // keep ⟺ all stages pass
      assert(keep == (gate && exactOf.isEmpty && nearOf.isEmpty),
        s"doc ${r.getLong(0)}: keep bit inconsistent with stage flags")
      // first-failing-stage order: gate → exact → near
      val want =
        if (!gate) Some("quality_gate")
        else if (exactOf.nonEmpty) Some("exact_dup")
        else if (nearOf.nonEmpty) Some("near_dup")
        else None
      assert(reason == want, s"doc ${r.getLong(0)}: reason $reason, want $want")
      // a dup pointer always points at a LOWER id (the canonical doc)
      exactOf.foreach(c => assert(c < r.getLong(0)))
      nearOf.foreach(c => assert(c < r.getLong(0)))
      reason.foreach(x => reasons = reasons.updated(x, reasons(x) + 1))
    }
    // the corpus exercises the gate and near-dup stages (it holds no
    // exact duplicate that also passes the gate — the exact-dup path
    // is pinned by the oracle's null-for-null hash match and by the
    // planted fixture below)
    assert(reasons("quality_gate") > 0 && reasons("near_dup") > 0,
      s"stages not exercised: $reasons")
    assert(kept.size + reasons.values.sum == nDocs)
  }

  test("a planted gated exact duplicate reports exact_dup ahead of near_dup") {
    import spark.implicits._
    // two identical long gated texts (near-dups of each other too —
    // exact_dup must win the first-failing-stage order), plus one
    // gate failure and one clean survivor
    val base = "the quick brown fox jumps over the lazy dog and keeps " * 3
    val docs = Seq(
      (1L, "en", "web", base),
      (2L, "en", "web", base),
      (3L, "en", "web", "short"),
      (4L, "en", "web", "a completely different long document of the corpus " * 3))
      .toDF("doc_id", "lang", "source", "text")
    val pairs = graft.queries.Llm.minhashLshPairs(docs, 64).select($"d1", $"d2")
    assert(pairs.filter($"d2" === 2L).count() > 0,
      "fixture: docs 1/2 must also be LSH near-dups")
    val audit = graft.queries.Curation.curationAudit(docs, pairs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(4)) null else r.getString(4), r.getLong(5)))
      .toMap
    assert(audit(1L) == ((1L, null, 1L)), s"canonical doc: ${audit(1L)}")
    // doc 2 is BOTH an exact and a near dup — exact_dup is the first
    // failing stage in q100's order
    assert(audit(2L) == ((1L, "exact_dup", 0L)), s"duplicate doc: ${audit(2L)}")
    assert(audit(3L) == ((0L, "quality_gate", 0L)), s"gate-fail doc: ${audit(3L)}")
    assert(audit(4L) == ((1L, null, 1L)), s"survivor doc: ${audit(4L)}")
  }
}
