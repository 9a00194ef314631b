package graft.queries

import graft.Q
import graft.Sql._
import org.apache.spark.sql.functions._

/** The reference's five workload programs re-expressed as declarative
  * DataFrame queries over the driver testdata (oracle-checkable). The
  * byte-level MapReduce-parity forms over reference-shaped text fixtures
  * live in [[graft.ops]] / [[graft.core.MapReduce]].
  *
  * Reference semantics (cited):
  *  - wc: split on non-alphabetic (Unicode), lowercase, drop empties,
  *    count per word — /root/reference/workload/src/wc.rs:10-15,32-44
  *  - grep: keep lines containing the literal term —
  *    /root/reference/workload/src/grep.rs:25-28
  *  - vertex-degree: each edge increments both endpoints —
  *    /root/reference/workload/src/vertex_degree.rs:31-42,46-61
  *  - matrix-multiply: inner equi-join A.col=B.row, multiply, sum per
  *    (i,j) — /root/reference/workload/src/matrix_multiply.rs:8-96,98-152
  */
object Workloads {

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------- q15
    // Word count over documents.text. explode(split) pipelines inside
    // whole-stage codegen; one shuffle for the final hash agg (map-side
    // partial agg collapses the token stream — the reference shuffles
    // every token unreduced, which would not survive 100 TB).
    Q(
      "q15_wordcount",
      (s, dir) => {
        import s.implicits._
        // single-row-group local file → spread the tokenize across cores
        // (explicit count so AQE can't coalesce to 1; see Llm.docsSpread)
        table(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, $"doc_id")
          .select(explode(split($"text", "[^\\p{L}]+")).as("t"))
          .filter($"t" =!= "")
          .select(lower($"t").as("word"))
          .groupBy($"word")
          .agg(count(lit(1)).as("cnt"))
      },
      Some("""
        SELECT word, count(*) AS cnt FROM (
          SELECT lower(unnest(regexp_split_to_array(text, '[^\p{L}]+'))) AS word
          FROM documents) t
        WHERE word <> '' GROUP BY word""")),

    // ---------------------------------------------------------------- q16
    // Grep: substring predicate, pushed to the scan. The reference
    // downloads whole files then filters (no pushdown) — SURVEY.md §4.1.
    Q(
      "q16_grep",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .filter($"text".contains("spark"))
          .select($"doc_id", $"source", $"text")
      },
      Some("SELECT doc_id, source, text FROM documents WHERE contains(text, 'spark')")),

    // ---------------------------------------------------------------- q17
    // Vertex degree over the (l_orderkey, l_partkey) edge list: explode
    // both endpoints, count per vertex. Narrow until the single agg
    // shuffle; partial agg keeps shuffle volume at |V| not |E|.
    Q(
      "q17_vertex_degree",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .select(explode(array($"l_orderkey", $"l_partkey")).as("v"))
          .groupBy($"v")
          .agg(count(lit(1)).as("deg"))
      },
      Some("""
        SELECT v, count(*) AS deg FROM (
          SELECT l_orderkey AS v FROM lineitem
          UNION ALL
          SELECT l_partkey AS v FROM lineitem) e
        GROUP BY v""")),

    // ---------------------------------------------------------------- q18
    // Sparse matrix multiply C = A×B with A(i,k) from lineitem and
    // B(k,j) from orders (keys folded mod 100). Both phases of the
    // reference fuse into one plan: pre-aggregate each matrix to its
    // cells (bounds the join input at |cells| ≤ 100×100 regardless of
    // sf), equi-join on the contraction index k, multiply, sum per
    // (i,j). Integer-valued → exact BIGINT arithmetic on both engines.
    Q(
      "q18_matrix_multiply",
      (s, dir) => {
        import s.implicits._
        val a = table(s, dir, "lineitem")
          .select(($"l_orderkey" % 100).as("i"), ($"l_partkey" % 100).as("k"),
            $"l_quantity".cast("long").as("v"))
          .groupBy($"i", $"k").agg(sum($"v").as("va"))
        val b = table(s, dir, "orders")
          .select(($"o_orderkey" % 100).as("k"), ($"o_custkey" % 100).as("j"),
            floor($"o_totalprice").cast("long").as("v"))
          .groupBy($"k", $"j").agg(sum($"v").as("vb"))
        a.join(b, "k")
          .groupBy($"i", $"j")
          .agg(sum($"va" * $"vb").as("c"))
      },
      Some("""
        WITH a AS (
          SELECT l_orderkey % 100 AS i, l_partkey % 100 AS k,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS va
          FROM lineitem GROUP BY 1, 2),
        b AS (
          SELECT o_orderkey % 100 AS k, o_custkey % 100 AS j,
                 CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS vb
          FROM orders GROUP BY 1, 2)
        SELECT i, j, CAST(sum(va * vb) AS BIGINT) AS c
        FROM a JOIN b USING (k) GROUP BY i, j"""))
  )
}
