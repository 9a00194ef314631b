package graft

import graft.ops.Decontam
import org.apache.spark.sql.functions._

/** ops.Decontam — benchmark decontamination at ingest: probes must
  * equal the self-contained q137 query restricted to the batch, a
  * planted verbatim 8-token run must be counted exactly, the frozen
  * gram width must be enforced loudly, and the probe plan must keep
  * the benchmark side broadcast-only with no batch-side shuffle
  * before the join.
  */
class DecontamSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  private def rows(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("probe ≡ q137 on the same eval/corpus split") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("decontam").toString
    Decontam.save(docs.filter(col("doc_id") % 19 === 7), dir)
    val got = rows(Decontam.probe(docs.filter(col("doc_id") % 19 =!= 7), dir))
    val want = rows(SparkEntry.queries("q137_decontam")(spark, sf))
    assert(got == want, s"probe diverged: ${(got.toSet -- want.toSet).take(3)}")
    assert(got.nonEmpty, "fixture has no contamination — the spec proves nothing")
  }

  test("a planted 8-token run is counted exactly; shorter overlap is not flagged") {
    import spark.implicits._
    val run = "alpha beta gamma delta epsilon zeta eta theta" // exactly 8 tokens
    val docs = Seq(
      (7L, s"benchmark question one $run and some answer text", "ev"),
      (26L, s"second benchmark item $run trailing words here", "ev"),
      // contaminated: carries the full run → shares 1 gram with BOTH
      // eval docs
      (1L, s"scraped page containing $run verbatim copy", "co"),
      // only 7 of the 8 tokens — below the window, must NOT flag
      (2L, "page with alpha beta gamma delta epsilon zeta eta only", "co"),
      (3L, "entirely unrelated text with different words", "co"))
      .toDF("doc_id", "text", "kind")
    val dir = java.nio.file.Files.createTempDirectory("decontam-p").toString
    Decontam.save(docs.filter($"kind" === "ev"), dir)
    val got = rows(Decontam.probe(docs.filter($"kind" === "co"), dir))
    assert(got == Map(1L -> ((1L, 2L))), s"got $got")
  }

  test("geometry guard: probing at a different gram width fails loudly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(20)
    val dir = java.nio.file.Files.createTempDirectory("decontam-g").toString
    Decontam.save(docs, dir, gramTokens = 8)
    val e = intercept[IllegalArgumentException] {
      Decontam.probe(docs, dir, gramTokens = 13)
    }
    assert(e.getMessage.contains("frozen at 8"), e.getMessage)
  }

  test("probe plan: benchmark broadcast-only, exchanges hit-sized only") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("decontam-plan").toString
    Decontam.save(docs.filter(col("doc_id") % 19 === 7), dir)
    val p = Decontam.probe(docs.filter(col("doc_id") % 19 =!= 3), dir)
      .queryExecution.executedPlan.toString
    // the benchmark side joins as a broadcast build, never sort-merge
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // every hash exchange sits ABOVE the join (the multi-distinct
    // agg's expand + final agg over rows that HIT): the batch gram
    // stream itself never shuffles, so at most the two agg exchanges
    // may appear
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles <= 2, s"unexpected exchanges ($shuffles):\n$p")
    // both agg exchanges key on doc_id (hit-sized), never on the
    // gram hash of the full batch stream
    assert("Exchange hashpartitioning\\(doc_id".r.findAllIn(p).length == shuffles,
      s"an exchange keys on something other than doc_id:\n$p")
  }
}
