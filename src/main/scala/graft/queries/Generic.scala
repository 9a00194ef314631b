package graft.queries

import java.nio.charset.StandardCharsets.UTF_8

import graft.Q
import graft.Sql._
import graft.core.{KeyValue, MapReduce, WorkloadRegistry}

/** Queries exercising the generic byte-level MapReduce surface
  * ([[graft.core.MapReduce]]) end-to-end inside a DataFrame plan, so the
  * driver's DuckDB oracle checks the typed Workload path too — same
  * oracle SQL as the declarative q15 wordcount.
  */
object Generic {

  val all: Seq[Q] = Seq(
    Q(
      "q19_mr_wordcount",
      (s, dir) => {
        import s.implicits._
        import MapReduce._
        // single-row-group local file → spread the map phase across
        // cores (explicit count so AQE can't coalesce to 1; see
        // Llm.docsSpread)
        val input = table(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, $"doc_id")
          .select($"doc_id".cast("string"), $"text")
          .as[(String, String)]
          .map { case (k, v) => KeyValue.utf8(k, v) }
        MapReduce.run(WorkloadRegistry.wc, input)
          .map(b => new String(b, UTF_8).trim)
          .map { line =>
            val i = line.lastIndexOf(' ')
            (line.substring(0, i), line.substring(i + 1).toLong)
          }
          .toDF("word", "cnt")
      },
      Some("""
        SELECT word, count(*) AS cnt FROM (
          SELECT lower(unnest(regexp_split_to_array(text, '[^\p{L}]+'))) AS word
          FROM documents) t
        WHERE word <> '' GROUP BY word"""))
  )
}
