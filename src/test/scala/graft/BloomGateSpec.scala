package graft

import org.apache.spark.sql.functions._

/** graft.ops.BloomGate (q122): the bloom prefilter provably never
  * changes the exact-membership answer (even at fpp = 0.5), has no
  * false negatives, actually discards most non-members at the scan,
  * and the might_contain probe sits in the executed plan.
  */
class BloomGateSpec extends SparkSuite {

  private def fps(xs: Seq[String]) = {
    import spark.implicits._
    xs.toDF("fp")
  }

  private def batchOf(xs: Seq[(Long, String)]) = {
    import spark.implicits._
    xs.toDF("doc_id", "fp")
  }

  test("membership ≡ exact semi join even at fpp = 0.5 (FPs verified away)") {
    val r = new scala.util.Random(3)
    val corpus = (0 until 400).map(_ => r.nextLong().toString).distinct
    val members = corpus.take(50)
    val outsiders = (0 until 300).map(i => s"out_$i")
    val batch = (members ++ outsiders).zipWithIndex.map { case (fp, i) => (i.toLong, fp) }
    val got = graft.ops.BloomGate
      .membership(fps(corpus), batchOf(batch), fpp = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = batch.map { case (id, fp) =>
      id -> (if (corpus.contains(fp)) 1L else 0L)
    }.toMap
    assert(got == want)
  }

  test("duplicate doc_ids get per-ROW verdicts, no smear, no multiplication") {
    // one doc_id carrying two different fps (only one in the corpus),
    // plus an exact-duplicate row pair: verdicts must be per (doc_id,
    // fp) row — a doc_id-only key would smear the hit across both fps
    // and cross-multiply the duplicates (the round-9 review finding)
    val corpus = Seq("in_corpus")
    val batch = Seq(
      (7L, "in_corpus"), (7L, "not_in_corpus"),
      (8L, "in_corpus"), (8L, "in_corpus"))
    val got = graft.ops.BloomGate.membership(fps(corpus), batchOf(batch))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((7L, 0L), (7L, 1L), (8L, 1L), (8L, 1L)), s"got $got")
  }

  test("no false negatives; prefilter discards most non-members at fpp = 0.01") {
    val corpus = (0 until 1000).map(i => s"c_$i")
    val bytes = graft.ops.BloomGate.sketch(fps(corpus), corpus.size.toLong, 0.01)
    val members = (0 until 200).map(i => (i.toLong, s"c_${i * 5}"))
    val outsiders = (0 until 1000).map(i => (10000L + i, s"x_$i"))
    val passedMembers = graft.ops.BloomGate.prefilter(batchOf(members), bytes).count()
    assert(passedMembers == members.size.toLong, "bloom dropped a true member")
    val passedOutsiders = graft.ops.BloomGate.prefilter(batchOf(outsiders), bytes).count()
    assert(passedOutsiders < 100, s"prefilter too leaky: $passedOutsiders of 1000")
  }

  test("the might_contain probe is in the executed plan, before the verify join") {
    // parquet-backed batch, like the real query: an in-memory
    // LocalRelation fixture would let the optimizer constant-fold the
    // probe into the relation and hide it from the plan
    val dir = java.nio.file.Files.createTempDirectory("bloomgate").toString
    batchOf((0 until 100).map(i => (i.toLong, s"c_${i * 2}")))
      .write.mode("overwrite").parquet(s"$dir/batch")
    val corpus = (0 until 100).map(i => s"c_$i")
    val df = graft.ops.BloomGate.membership(
      fps(corpus), spark.read.parquet(s"$dir/batch"))
    // the registered alias resolves to Spark's BloomFilterMightContain,
    // whose prettyName is might_contain
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), s"probe missing:\n$plan")
    // and the probe sits on the batch SCAN side, below the semi join:
    // the executed plan pushes it into the parquet reader's filters
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("might_contain"), s"probe not in physical plan:\n$phys")
    df.collect() // and it still executes to the exact answer
  }
}
