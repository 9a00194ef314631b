package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash sketch aggregator: folds a stream of shingles into a
  * k-slot signature of lexicographically-minimal md5 hex digests —
  * the `Aggregator[IN,BUF,OUT]` form of the UDAF surface (SURVEY.md
  * §2.11/§7.4; the reference's reduce functions are exactly this
  * shape, `common/src/lib.rs:39-43`).
  *
  * Uses the same hash family as query q21 (`md5("<j>|<shingle>")`,
  * min by hex-string order), so signatures are interchangeable with
  * the SQL formulation — MinHashAggSpec proves equality. Being an
  * Aggregator it gets Spark's partial aggregation (map-side combine,
  * merge trees) for free: the sketch is 'k' 32-char strings per group
  * regardless of input size, the textbook bounded-state sketch at
  * 100 TB.
  */
class MinHashAgg(k: Int) extends Aggregator[String, Array[String], Array[String]] {

  private def md5hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  override def zero: Array[String] = Array.fill(k)(null)

  override def reduce(buf: Array[String], shingle: String): Array[String] = {
    var j = 0
    while (j < k) {
      val h = md5hex(s"${j + 1}|$shingle")
      if (buf(j) == null || h < buf(j)) buf(j) = h
      j += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var j = 0
    while (j < k) {
      if (a(j) == null || (b(j) != null && b(j) < a(j))) a(j) = b(j)
      j += 1
    }
    a
  }

  override def finish(buf: Array[String]): Array[String] = buf

  override def bufferEncoder: Encoder[Array[String]] =
    Encoders.kryo[Array[String]]

  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
