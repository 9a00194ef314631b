package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash sketch aggregator: folds a stream of shingles into a
  * k-slot signature of minimal 60-bit hash values — the
  * `Aggregator[IN,BUF,OUT]` form of the UDAF surface (SURVEY.md
  * §2.11/§7.4; the reference's reduce functions are exactly this
  * shape, `common/src/lib.rs:39-43`).
  *
  * Uses THE engine hash family ([[MinHashLongs.hash60]]: first 60 bits
  * of md5("<j+1>|" + shingle)), so signatures are interchangeable with
  * the q21 SQL formulation and the native expression —
  * MinHashAggSpec proves equality. Being an Aggregator it gets Spark's
  * partial aggregation (map-side combine, merge trees) for free: the
  * sketch is k longs per group regardless of input size, the textbook
  * bounded-state sketch at 100 TB.
  */
class MinHashAgg(k: Int) extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    var j = 0
    while (j < k) {
      val h = MinHashLongs.hash60(j, shingle)
      if (h < buf(j)) buf(j) = h
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) {
      if (b(j) < a(j)) a(j) = b(j)
      j += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
