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

  /** (score desc, id asc) — strict total order on (score, id). */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

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
