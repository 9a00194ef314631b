package graft

import org.apache.spark.sql.functions._

/** Mining.blocklistVerdicts (q197): planted verdict anchors — one
  * severe occurrence drops, mild terms accumulate to the score-5
  * threshold, zero-hit documents KEEP (the row must exist, not
  * vanish), tokenization is case-insensitive and punctuation-bounded —
  * plus a whole-output equivalence against an independent in-JVM
  * replica on the real corpus.
  */
class BlocklistSpec extends SparkSuite {

  private val terms = Seq("slow" -> 3, "crash" -> 3, "big" -> 1, "merge" -> 1, "batch" -> 1)

  test("planted verdict anchors") {
    import spark.implicits._
    val docs = Seq(
      // one severe hit → dropped regardless of score
      (1L, "en", "a perfectly fine doc until it goes SLOW once"),
      // five mild hits → score 5 → dropped
      (2L, "en", "big big merge merge batch elsewhere fine"),
      // four mild hits → score 4 → kept
      (3L, "en", "big big merge batch and nothing else"),
      // zero hits → kept, row present
      (4L, "de", "completely clean text with no offending words"),
      // severe term inside punctuation/case noise → still one hit
      (5L, "en", "header...Crash!footer"),
      // substring must NOT match: 'bigger' is not 'big'
      (6L, "en", "bigger merger batches are different words entirely"))
      .toDF("doc_id", "lang", "text")
    val got = graft.queries.Mining.blocklistVerdicts(docs, terms)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap

    assert(got(1L) == ((1L, 1L, 3L, 3L, 1L)), s"severe once: ${got(1L)}")
    assert(got(2L) == ((5L, 3L, 5L, 1L, 1L)), s"mild to threshold: ${got(2L)}")
    assert(got(3L) == ((4L, 3L, 4L, 1L, 0L)), s"mild below threshold: ${got(3L)}")
    assert(got(4L) == ((0L, 0L, 0L, 0L, 0L)), s"zero hits keeps: ${got(4L)}")
    assert(got(5L) == ((1L, 1L, 3L, 3L, 1L)), s"case/punct severe: ${got(5L)}")
    assert(got(6L) == ((0L, 0L, 0L, 0L, 0L)), s"no substring matches: ${got(6L)}")
  }

  test("whole output ≡ independent replica on the real corpus") {
    import spark.implicits._
    val docs = Sql.table(spark, "/root/testdata/sf0.001", "documents")
    val got = graft.queries.Mining.blocklistVerdicts(docs, terms)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap

    val raw = docs.select($"doc_id", $"lang", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(raw.nonEmpty)
    val tw = terms.toMap
    raw.foreach { case (id, lang, text) =>
      val ws = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      val cnt = terms.map { case (t, _) => t -> ws.count(_ == t) }.toMap
      val hits = cnt.values.sum.toLong
      val nTerms = cnt.values.count(_ > 0).toLong
      val score = cnt.map { case (t, c) => tw(t) * c }.sum.toLong
      val maxW = cnt.collect { case (t, c) if c > 0 => tw(t) }
        .maxOption.getOrElse(0).toLong
      val severe = cnt.exists { case (t, c) => tw(t) >= 3 && c > 0 }
      val dropped = if (severe || score >= 5) 1L else 0L
      assert(got(id) == ((lang, hits, nTerms, score, maxW, dropped)),
        s"doc $id: got ${got(id)}, want ($lang,$hits,$nTerms,$score,$maxW,$dropped)")
    }
    assert(got.size == raw.length, "one verdict row per document")
  }

  test("in-row shape: no shuffle exchange anywhere in the executed plan") {
    val docs = Sql.table(spark, "/root/testdata/sf0.001", "documents")
    val df = graft.queries.Mining.blocklistVerdicts(docs, terms)
    df.collect()
    assert(!executedNodes(df).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      "the blocklist gate must be a pure scan projection:\n" +
        df.queryExecution.executedPlan)
  }
}
