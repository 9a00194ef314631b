package graft

import graft.ops.CurationPipeline
import org.apache.spark.sql.functions._

class CurationPipelineSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("curation pipeline composes gate, exact dedup, near dedup in one plan") {
    val docs = graft.Sql.table(spark, sf, "documents")
    val pairs = SparkEntry.queries("q21_minhash_lsh")(spark, sf)
    val curated = CurationPipeline.curate(spark, docs, pairs)
    val out = curated.collect()

    val total = docs.count()
    val gated = CurationPipeline.qualityGate(docs).count()
    val pairCount = pairs.select(col("d2")).distinct().count()

    // the pipeline only ever removes rows, each stage monotonically
    assert(out.length <= gated && gated <= total)
    // near-dedup removed at most one doc per distinct d2
    assert(out.length >= gated - pairCount - (total - gated))
    // no surviving near-dup pair: both ends of a pair never co-exist
    val ids = out.map(_.getLong(0)).toSet
    val both = pairs.collect().count(r => ids(r.getLong(0)) && ids(r.getLong(1)))
    assert(both === 0)
    // schema contract
    assert(curated.columns.toSeq ===
      Seq("doc_id", "lang", "source", "n_chars", "n_tokens", "text"))
  }
}
