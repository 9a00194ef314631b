package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded grouped top-k over (id, score) pairs — [[TopKAgg]]'s twin
  * for similarity streams (kNN graph edges, retrieval shortlists):
  * keeps at most k (score, id) pairs of state per group under the
  * STRICT total order (score desc, id asc), so partial aggregation
  * bounds every map task's contribution to k rows per group and no
  * sort ever sees more than k elements — the scale form of
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id) <= k`
  * over a pair stream that is quadratic in the blocking-cell size.
  *
  * Determinism: scores are exact IEEE doubles identical on both
  * engines (ordered in-row folds), and the id tiebreak makes the
  * order total, so the output is row-identical to the window
  * formulation (pinned by the q130 oracle).
  */
class TopKSimAgg(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1, s"TopKSimAgg needs k >= 1, got $k")

  /** (score desc, id asc) — strict TOTAL order on (score, id), via
    * java.lang.Double.compare so a NaN score (e.g. a zero-norm
    * cosine) ranks above every real score deterministically — the
    * same place Spark's and DuckDB's ORDER BY sim DESC both put it —
    * instead of poisoning sortWith with an irreflexive comparator.
    */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    // + 0.0 collapses -0.0 to +0.0 first, so the only place this
    // total order differs from IEEE == is NaN itself
    val c = java.lang.Double.compare(a._1 + 0.0, b._1 + 0.0)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(buf: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] = {
    val item = (in._2, in._1)
    if (buf.size >= k && !better(item, buf.last)) buf
    else (buf :+ item).sortWith(better).take(k)
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
