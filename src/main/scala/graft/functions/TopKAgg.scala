package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded grouped top-k aggregator — the SCALE form of the
  * `row_number() OVER (PARTITION BY g ORDER BY …) <= k` idiom (q75):
  * the window sorts EVERY group in full (O(|group| log |group|) and
  * the whole group's rows shuffle), while this Aggregator keeps at
  * most k (n, key) pairs of state per group and gets Spark's partial
  * aggregation for free — each map task contributes ≤ k rows per
  * group to the shuffle, merge is a bounded list merge, and no sort
  * ever sees more than k elements. Order is the STRICT total order
  * (n desc, key asc), so the output is deterministic and — pinned by
  * the q114 oracle — row-identical to the window formulation.
  */
class TopKAgg(k: Int)
    extends Aggregator[(String, Long), Seq[(Long, String)], Seq[(Long, String)]] {
  require(k >= 1, s"TopKAgg needs k >= 1, got $k")

  /** (n desc, key asc) — strict total order on (n, key) pairs. */
  private def better(a: (Long, String), b: (Long, String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, String)] = Nil

  override def reduce(buf: Seq[(Long, String)], in: (String, Long)): Seq[(Long, String)] = {
    val item = (in._2, in._1)
    // buffers stay sorted best-first: skip early when full and worse
    // than the current worst, else insert in place and trim
    if (buf.size >= k && !better(item, buf.last)) buf
    else (buf :+ item).sortWith(better).take(k)
  }

  override def merge(a: Seq[(Long, String)], b: Seq[(Long, String)]): Seq[(Long, String)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(buf: Seq[(Long, String)]): Seq[(Long, String)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, String)]]()

  override def outputEncoder: Encoder[Seq[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, String)]]()
}
