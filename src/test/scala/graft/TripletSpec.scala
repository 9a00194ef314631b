package graft

/** graft.queries.Selection.contrastiveTriplets (q131, dense-retriever
  * training pairs): bit-exact agreement of the hard-negative ranking
  * with an in-JVM BM25 replica (anchor's 5 lowest-df terms, sorted
  * term-order fold), and the exclusion invariants that make a
  * negative HARD but not WRONG — the anchor itself, its exact
  * duplicates (fp-equal), and its verified near-duplicates can never
  * appear as negatives, while the best verified near-duplicate is the
  * positive.
  */
class TripletSpec extends SparkSuite {

  /** 30 docs, one anchor (doc 7): doc 12 is an exact copy of the
    * anchor, doc 13 a near-duplicate (one late word changed), docs
    * 14/15 share the anchor's three rare marker words (hard
    * negatives), the rest are unrelated word salad over a 40-word
    * vocabulary (wide enough that salad docs stay below the 0.35
    * near-dup threshold against the anchor).
    */
  private def fixture: Seq[(Long, String)] = {
    val r = new scala.util.Random(29)
    val vocab = (0 until 40).map(_ =>
      (0 until 4 + r.nextInt(4)).map(_ => ('a' + r.nextInt(26)).toChar).mkString)
    def salad(n: Int): String =
      (0 until n).map(_ => vocab(r.nextInt(vocab.length))).mkString(" ")
    val anchorText = "zebra quokka axolotl " + salad(20)
    (0 until 30).map { i =>
      val text = i match {
        case 7  => anchorText
        case 12 => anchorText
        case 13 => anchorText.dropRight(6) + " stray"
        case 14 => "zebra quokka axolotl zebra " + salad(18)
        case 15 => "quokka axolotl " + salad(22)
        case _  => salad(24)
      }
      (i.toLong, text)
    }
  }

  private def toks(t: String): Seq[String] =
    t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq

  /** Replica of the engine's negative ranking: BM25 over the anchor's
    * 5 lowest-(df, w) terms, ts summed in sorted term order — the
    * identical IEEE op sequence, so score comparisons are ==.
    */
  private def replicaNegs(
      docs: Seq[(Long, String)],
      anchor: Long,
      excluded: Set[Long],
      dfBudget: Long = Long.MaxValue): Seq[(Long, Double)] = {
    val wc = docs.map { case (id, t) =>
      id -> toks(t).groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    }.toMap
    val dl = wc.map { case (id, m) => id -> m.values.sum }
    val nd = dl.size.toLong
    val sumDl = dl.values.sum
    val df = wc.values.flatMap(_.keys).groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    // engine rule: 5 lowest-(df, w) terms, then the INCLUSIVE
    // cumulative-df budget (first term mandatory)
    val anchorTerms = {
      var cum = 0L
      wc(anchor).keys.toSeq.sortBy(w => (df(w), w)).take(5)
        .zipWithIndex.filter { case (w, i) =>
          cum += df(w); cum < dfBudget || i == 0
        }.map(_._1)
    }
    val scored = docs.collect { case (id, _) if id != anchor && !excluded.contains(id) =>
      val shared = anchorTerms.filter(wc(id).contains).sorted
      if (shared.isEmpty) None
      else {
        var s = 0.0
        shared.foreach { w =>
          val tf = wc(id)(w).toDouble
          val ts = (tf * 2.2) /
            (tf + 1.2 * (0.25 + 0.75 * (dl(id).toDouble / (sumDl.toDouble / nd.toDouble)))) *
            ((nd.toDouble - df(w).toDouble + 0.5) / (df(w).toDouble + 0.5))
          s += ts
        }
        Some(id -> s)
      }
    }.flatten
    scored.sortBy { case (id, s) => (-s, id) }.take(3)
  }

  test("negatives ≡ BM25 replica bit-for-bit; exclusions hold; positive is the best partner") {
    import spark.implicits._
    val docs = fixture
    val df = docs.toDF("doc_id", "text")
    val rows = graft.queries.Selection.contrastiveTriplets(df).collect()
    assert(rows.nonEmpty)
    // single anchor on this fixture, and it is the sampled id
    assert(rows.map(_.getLong(0)).toSet == Set(7L))

    // the verified near-dup partners (engine pair machinery, pinned
    // independently by LshSpec/LshCalibrationSpec)
    val pairs = graft.queries.Llm.minhashLshPairs(df, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val partners = pairs.collect {
      case (a, b, j) if a == 7L => (b, j)
      case (a, b, j) if b == 7L => (a, j)
    }
    assert(partners.map(_._1).toSet == Set(12L, 13L), s"partners: ${partners.toSeq}")

    // positive = best partner by (jac desc, id asc): the exact copy
    val best = partners.sortBy { case (id, j) => (-j, id) }.head
    rows.foreach { r =>
      assert(r.getLong(1) == best._1 && r.getDouble(2) == best._2,
        s"positive ${r.getLong(1)} != ${best._1}")
    }

    // negatives: never the anchor, the fp-equal copy, or a partner
    val negIds = rows.map(_.getLong(3)).toSeq
    val banned = Set(7L) ++ partners.map(_._1)
    assert(negIds.toSet.intersect(banned).isEmpty, s"banned negative in $negIds")
    // the planted marker-sharers outrank the salad docs
    assert(negIds.take(2).toSet == Set(14L, 15L), s"negs: $negIds")

    // ranking ≡ replica exactly (ids, ranks, scores ==)
    val want = replicaNegs(docs, 7L, banned)
    val got = rows.sortBy(_.getLong(5)).map(r => (r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
  }

  test("anchor-proportional broadcasts are budget-gated, and both forms agree") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, ResolvedHint}
    val df = fixture.toDF("doc_id", "text")
    // anchors scale as |docs|/25, so aterms and po scale linearly
    // with the corpus — an UNCONDITIONAL broadcast hint on either
    // would override AQE and OOM at 100× (round-9 verdict). The hint
    // is gated on a measured row count: with the budget forced to 0,
    // the only hint left in the plan is the 1-row global-stats
    // aggregate.
    val over = graft.queries.Selection.contrastiveTriplets(df, hintBudgetRows = 0L)
    val hints = over.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.size == 1, s"expected only the stats hint, got ${hints.size}")
    val isGlobalAgg = hints.head.child.collectFirst {
      case a: Aggregate if a.groupingExpressions.isEmpty => a
    }.isDefined
    assert(isGlobalAgg, s"hinted subtree is not the 1-row stats frame:\n${hints.head}")
    // within budget (the default) the hints apply — and the result is
    // identical either way: the gate changes the plan, never the rows
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        java.lang.Double.doubleToLongBits(r.getDouble(4)), r.getLong(5))).toSet
    assert(rows(graft.queries.Selection.contrastiveTriplets(df)) == rows(over))
  }

  test("anchor df budget clamps terms but never starves an anchor") {
    import spark.implicits._
    val df = fixture.toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        java.lang.Double.doubleToLongBits(r.getDouble(4)), r.getLong(5))).toSet
    // slack budget ≡ default on this fixture (all 5 terms fit)
    val slack = rows(graft.queries.Selection.contrastiveTriplets(
      df, dfBudget = Long.MaxValue))
    assert(slack == rows(graft.queries.Selection.contrastiveTriplets(df)))
    // budget 1: cum < 1 fails for every term (cum ≥ df ≥ 1), so each
    // anchor keeps exactly its rarest term — and still produces
    // negatives (the mandatory-first-term guarantee)
    val clamped = graft.queries.Selection.contrastiveTriplets(df, dfBudget = 1L)
      .collect()
    assert(clamped.nonEmpty, "budget clamp starved the anchor")
    assert(clamped.map(_.getLong(0)).toSet == Set(7L))
  }

  test("budget gate is INCLUSIVE: a hot term never rides in on a slack prefix") {
    import spark.implicits._
    val docs = fixture
    val df = docs.toDF("doc_id", "text")
    // Compute the anchor's sorted (df, w) term list replica-side and
    // pick budget = cum(3 terms): the inclusive gate cuts term 3
    // (cum = budget is NOT < budget) where an exclusive gate
    // (cum − df < budget) would admit it — the hole the round-10
    // review closed: with an exclusive gate, one arbitrarily-hot term
    // always rides in whenever the PRECEDING cumulative is under
    // budget (df=1 tracker token followed by a df=Θ(N) stopword),
    // re-opening the quadratic candidate join.
    val wc = docs.map { case (id, t) =>
      id -> toks(t).groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    }.toMap
    val dfm = wc.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val sorted = wc(7L).keys.toSeq.sortBy(w => (dfm(w), w)).take(5)
    val budget = sorted.take(3).map(dfm).sum
    // partners pinned by the first test: 12 (exact copy), 13 (near-dup)
    val banned = Set(7L, 12L, 13L)
    val rows = graft.queries.Selection.contrastiveTriplets(df, dfBudget = budget)
      .collect().sortBy(_.getLong(5)).map(r => (r.getLong(3), r.getDouble(4))).toSeq
    val wantIncl = replicaNegs(docs, 7L, banned, dfBudget = budget)
    assert(rows == wantIncl, s"got $rows\nwant $wantIncl")
    // non-vacuity: the third term's admission actually changes the
    // scoring (otherwise this test could not tell the gates apart)
    val wantExcl = replicaNegs(docs, 7L, banned, dfBudget = budget + sorted.drop(2).take(1).map(dfm).sum)
    assert(wantIncl != wantExcl,
      s"fixture cannot distinguish inclusive from exclusive gate: $wantIncl")
  }
}
