package graft

import org.apache.spark.sql.functions._

/** Hot-bucket behavior of the LSH candidate generators (ops.Lsh).
  *
  * q21 (minhash, fine buckets): a boilerplate bucket above the cap is
  * dropped, bounding per-bucket pair expansion — the skew fixture shares
  * one 200-char prefix across 20% of docs and asserts the shipped
  * pipeline (Llm.minhashLshPairs) stays bounded with the cap and
  * explodes without it.
  *
  * q38 (simhash, coarse buckets): hot buckets are sub-banded EXACTLY —
  * the capped candidate path must produce the identical hamming≤3 pair
  * set as brute-force all-pairs, on a fixture with a deliberately hot
  * band bucket.
  */
class LshSpec extends SparkSuite {

  test("minhash LSH cap drops the boilerplate bucket and bounds pair expansion") {
    import spark.implicits._
    // 100 docs: ids 0..19 share ONE boilerplate 200-char prefix (20% of
    // corpus → one bucket of 20 in each band); ids 20+ are distinct
    // texts with no 5-shingle overlap (digit-salted words).
    val boiler = ("lorem ipsum dolor sit amet consectetur adipiscing elit " * 5).take(200)
    val docs = (0 until 100).map { i =>
      if (i < 20) (i.toLong, boiler + s" tail $i")
      else (i.toLong, s"unique document number $i " + (1 to 30).map(k => s"w$i-$k").mkString(" "))
    }.toDF("doc_id", "text")

    val capped = graft.queries.Llm.minhashLshPairs(docs, maxBucket = 16)
      .select($"d1", $"d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = graft.queries.Llm.minhashLshPairs(docs, maxBucket = 1000000)
      .select($"d1", $"d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val boilerPairs = uncapped.filter { case (a, b) => a < 20 && b < 20 }
    assert(boilerPairs.size === 20 * 19 / 2,
      "without the cap the boilerplate bucket expands quadratically")
    assert(capped.intersect(boilerPairs).isEmpty,
      "the cap must drop the boilerplate bucket")
    assert(capped === uncapped -- boilerPairs,
      "the cap must not disturb pairs outside hot buckets")
  }

  test("hotBuckets reports buckets above the cap") {
    import spark.implicits._
    val bands = Seq.tabulate(30)(i => (i.toLong, 0L, if (i < 20) "HOT" else s"c$i"))
      .toDF("doc_id", "band", "bsig")
    val hot = graft.ops.Lsh.hotBuckets(bands, Seq("band", "bsig"), maxBucket = 16)
      .collect()
    assert(hot.length === 1)
    assert(hot(0).getAs[String]("bsig") === "HOT")
    assert(hot(0).getAs[Long]("n") === 20L)
  }

  test("persisted corpus band table serves incremental probes with bucket pruning") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS corpus_bands")
    // corpus: 80 docs, two shared-signature groups; batch: 5 docs, two
    // of which collide with corpus signatures
    val corpus = (0 until 80).map { i =>
      (i.toLong, 0L, if (i < 3) "SIG-A" else if (i < 6) "SIG-B" else s"uniq-$i")
    }.toDF("doc_id", "band", "bsig")
    val batch = Seq(
      (100L, 0L, "SIG-A"), (101L, 0L, "SIG-B"), (102L, 0L, "fresh-1"),
      (103L, 0L, "fresh-2"), (104L, 0L, "fresh-3")
    ).toDF("doc_id", "band", "bsig")

    graft.ops.Lsh.saveBands(corpus, "corpus_bands", numBuckets = 16)
    val cand = graft.ops.Lsh.incrementalCandidates(spark, "corpus_bands", batch)
    val pairs = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set(
      (0L, 100L), (1L, 100L), (2L, 100L),
      (3L, 101L), (4L, 101L), (5L, 101L)))

    // the batch-pipeline hot-bucket cap carries over: a probed corpus
    // bucket above the cap is boilerplate and emits NO pairs
    val cappedOut = graft.ops.Lsh
      .incrementalCandidates(spark, "corpus_bands", batch, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedOut.isEmpty, s"hot buckets (size 3 > cap 2) must be dropped: $cappedOut")

    // the cap measures the COMBINED bucket (corpus + probing batch
    // rows), same as expandPairsCapped's total-bucket-size contract: at
    // maxBucket=3 the SIG-A/SIG-B buckets hold 3 corpus + 1 batch = 4
    // rows and must be dropped even though the corpus side alone fits
    val combinedCap = graft.ops.Lsh
      .incrementalCandidates(spark, "corpus_bands", batch, maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(combinedCap.isEmpty,
      s"cap must count corpus+batch rows per bucket (3+1 > 3): $combinedCap")
    // ...and at maxBucket=4 the combined bucket fits exactly
    val atBoundary = graft.ops.Lsh
      .incrementalCandidates(spark, "corpus_bands", batch, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(atBoundary === pairs)

    // the probe scan must read a strict subset of the corpus buckets —
    // the batch never triggers a corpus re-scan, let alone re-shingling
    val plan = cand.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(sel.isDefined, s"no bucket pruning:\n$plan")
    assert(sel.get.group(1).toInt < sel.get.group(2).toInt, sel.get.matched)
  }

  test("incremental tiers agree at every cap; distributed tier never shuffles the corpus") {
    import spark.implicits._
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    spark.sql("DROP TABLE IF EXISTS corpus_bands_t")
    val corpus = (0 until 80).map { i =>
      (i.toLong, 0L, if (i < 3) "SIG-A" else if (i < 6) "SIG-B" else s"uniq-$i")
    }.toDF("doc_id", "band", "bsig")
    val batch = Seq(
      (100L, 0L, "SIG-A"), (101L, 0L, "SIG-B"), (102L, 0L, "fresh-1"),
      (103L, 0L, "fresh-2"), (104L, 0L, "fresh-3")
    ).toDF("doc_id", "band", "bsig")
    graft.ops.Lsh.saveBands(corpus, "corpus_bands_t", numBuckets = 16)

    // tier equality: driverMaxRows = 0 forces the distributed tier on
    // the same inputs — identical pairs at every cap, including the
    // combined-population boundary cases the driver-tier test pins
    for (cap <- Seq(2, 3, 4, 64)) {
      def run(driverMax: Long) = graft.ops.Lsh
        .incrementalCandidates(spark, "corpus_bands_t", batch,
          maxBucket = cap, driverMaxRows = driverMax)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(run(graft.ops.Lsh.DriverBatchRows) === run(0L),
        s"tiers disagree at maxBucket=$cap")
    }

    // the corpus side must only ever be SCANNED: the saved table's
    // bucketing co-locates every bkey-keyed operator, so no shuffle
    // exchange may have the corpus scan in its subtree (only
    // batch-sized frames and the final pair distinct may shuffle).
    // The traversal must (a) run AFTER an action so AQE's plan is
    // final, and (b) unwrap AQE wrapper nodes — a naive collect over
    // sparkPlan sees NO exchanges at all (EnsureRequirements adds
    // them later) and would pass vacuously.
    val cand = graft.ops.Lsh.incrementalCandidates(
      spark, "corpus_bands_t", batch, driverMaxRows = 0L)
    cand.collect()
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    // the output distinct necessarily shuffles (corpus_doc, batch_doc)
    // PAIR rows above everything — that exchange is hit-sized and
    // fine. What must never exist is a bkey-keyed exchange with the
    // corpus scan beneath it: that would mean corpus ROWS were
    // repartitioned to meet a join/agg, i.e. the corpus shuffled.
    def findCorpusScan(p: SparkPlan, underBkeyShuffle: Boolean): Seq[(FileSourceScanExec, Boolean)] = {
      val nowUnder = underBkeyShuffle || (p match {
        case s: ShuffleExchangeLike => s.outputPartitioning.toString.contains("bkey")
        case _ => false
      })
      val here = p match {
        case f: FileSourceScanExec
          if f.tableIdentifier.exists(_.table == "corpus_bands_t") =>
          Seq((f, underBkeyShuffle))
        case _ => Nil
      }
      here ++ kids(p).flatMap(findCorpusScan(_, nowUnder))
    }
    val scans = findCorpusScan(cand.queryExecution.executedPlan, underBkeyShuffle = false)
    assert(scans.nonEmpty, "fixture lost its corpus scan:\n" +
      cand.queryExecution.executedPlan.toString)
    assert(scans.forall(!_._2), "corpus rows repartitioned by a bkey exchange:\n" +
      cand.queryExecution.executedPlan.toString)
    // sanity against vacuity: bkey-keyed exchanges DO exist (the
    // batch-side aggregates) — they just never contain the corpus
    val bkeyShuffles = {
      def all(p: SparkPlan): Seq[SparkPlan] = p +: kids(p).flatMap(all)
      all(cand.queryExecution.executedPlan).collect {
        case s: ShuffleExchangeLike if s.outputPartitioning.toString.contains("bkey") => s
      }
    }
    assert(bkeyShuffles.nonEmpty, "expected batch-side bkey exchanges in the fixture plan")
  }

  test("simhash sub-banding is exact: capped candidates = brute-force hamming<=3") {
    import spark.implicits._
    // 400 sigs, all sharing band 0 (low byte = 0) → one hot bucket of
    // 400 for b=0. Even ids: deterministic pseudo-random upper 24 bits;
    // odd ids: previous sig with 1-3 bits flipped (true near-dups).
    val sigs = (0 until 400).map { i =>
      val base = ((i / 2) * 2654435761L) & 0xFFFFFF00L
      val sig = if (i % 2 == 0) base
      else base ^ (1L << (8 + (i % 24))) ^ (if (i % 3 == 0) 1L << 31 else 0L)
      (i.toLong, sig & 0xFFFFFFFFL)
    }.toDF("doc_id", "simhash")

    val bands = sigs
      .select($"doc_id", $"simhash", explode(expr("sequence(0, 3)")).as("b"))
      .withColumn("band", expr("shiftright(simhash, b * 8) & 255"))
    assert(graft.ops.Lsh.hotBuckets(bands, Seq("b", "band"), 64).count() >= 1,
      "fixture must actually contain a hot bucket")

    val capped = graft.ops.Lsh
      .simhashCandidates(bands, bandBits = 8, subBands = 4, subBits = 6, maxBucket = 64)
      .withColumn("hamming", expr("bit_count(s1 ^ s2)"))
      .filter($"hamming" <= 3)
      .select($"d1", $"d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val brute = sigs.as("x").crossJoin(sigs.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .filter(expr("bit_count(x.simhash ^ y.simhash) <= 3"))
      .select(col("x.doc_id"), col("y.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(brute.nonEmpty, "fixture must contain hamming<=3 pairs")
    assert(capped === brute)
  }

  test("simhashCandidates rejects sub-banding wider than the remaining bits") {
    import spark.implicits._
    val bands = Seq((1L, 0L, 0L, 0L)).toDF("doc_id", "simhash", "b", "band")
    // 8 x 8 = 64 sub-band bits > 64 - 8 remaining: the top band's
    // compaction leaves junk in that region, so the op must fail loudly
    // instead of silently losing pairs
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Lsh.simhashCandidates(bands, bandBits = 8, subBands = 8, subBits = 8, maxBucket = 64)
    }
    assert(ex.getMessage.contains("remaining bits"))
  }

  test("q38's pair-materializing form fails loudly over its output budget") {
    // "emit all radius-3 pairs" is quadratic on dense neighborhoods by
    // CONTRACT (a k-clique owes k(k-1)/2 rows — the 100× soak measured
    // 104 M rows / 28 GB of spill): over budget the query must point at
    // the bounded forms instead of silently spilling
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val q = SparkEntry.queries("q38_simhash_pairs")
    spark.conf.set("graft.q38.maxPairs", "1")
    try {
      val ex = intercept[IllegalStateException] { q(spark, dir) }
      assert(ex.getMessage.contains("budget") && ex.getMessage.contains("q21"))
    } finally spark.conf.unset("graft.q38.maxPairs")
    // under the default budget the same corpus passes unchanged
    assert(q(spark, dir).count() > 0)
  }
}
