package graft

import graft.ops.{Layouts, LexIndex}
import org.apache.spark.sql.functions._

/** ops.LexIndex (q129): incremental appends ≡ a full rebuild
  * bit-for-bit (including every BM25 double), a replayed drop is a
  * no-op, compaction folds both child roots without moving a score,
  * the term probe carries the pushed In(tok, …) filter, and top-k is
  * a prefix of the full ordering.
  */
class LexIndexSpec extends SparkSuite {

  private val terms = Seq("spark", "window", "table")

  private def searchAll(path: String): Map[Long, (Long, Long, Double)] =
    LexIndex.search(spark, path, terms)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("appends ≡ rebuild bit-for-bit; replay no-op; compact preserves; pruned probe") {
    import spark.implicits._
    import java.nio.file.Files
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select($"doc_id", $"text").localCheckpoint()
    val inc = Files.createTempDirectory("lex-inc").toString
    val full = Files.createTempDirectory("lex-full").toString
    LexIndex.save(docs.filter($"doc_id" % 3 === 0), inc)
    LexIndex.append(docs.filter($"doc_id" % 3 === 1), inc, 0L)
    LexIndex.append(docs.filter($"doc_id" % 3 === 2), inc, 1L)
    LexIndex.save(docs, full)
    val want = searchAll(full)
    assert(searchAll(inc) == want, "incremental index diverges from rebuild")

    // a replayed drop overwrites both its children with identical
    // content — scores cannot move
    LexIndex.append(docs.filter($"doc_id" % 3 === 2), inc, 1L)
    assert(searchAll(inc) == want, "replayed drop changed the index")

    // compaction folds to one child, same answer
    assert(Layouts.liveChildren(spark, s"$inc/chunks").size > 1)
    LexIndex.compact(spark, inc)
    assert(Layouts.liveChildren(spark, s"$inc/chunks").size == 1)
    assert(searchAll(inc) == want, "compaction changed the index")

    // the probe scan carries the pushed kind + term filters
    val p = LexIndex.search(spark, inc, terms)
      .queryExecution.executedPlan.toString
    assert(p.contains("EqualTo(kind,p), In(tok"), s"term probe not pushed:\n$p")

    // top-k = the k-prefix of the full (score desc, doc_id) ordering
    val top5 = LexIndex.search(spark, inc, terms, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    val wantTop = want.toSeq
      .sortBy { case (id, (_, _, sc)) => (-sc, id) }.take(5)
      .map { case (id, (_, _, sc)) => (id, sc) }
    assert(top5 == wantTop)
  }
}
