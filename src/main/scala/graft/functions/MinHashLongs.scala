package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all `numHashes` MinHash family hashes of
  * one shingle in a single call. Element j (0-based) is the first 60
  * bits of md5 of the bytes of `"${j+1}|" + input`, as a non-negative
  * BIGINT — numerically equal to DuckDB's
  * `CAST(CAST('0x' || substr(md5((j+1) || '|' || g), 1, 15) AS UBIGINT)
  * AS BIGINT)`, so the oracle replays it with builtins.
  *
  * Why a custom expression instead of 8 builtin md5(concat(...))
  * columns (the round-1 formulation):
  *  - the builtin path allocates an UTF8String concat AND a fresh
  *    MessageDigest (commons-codec) per hash per row — 8× per shingle
  *    on the hottest stage of the LSH dedup pipeline; this one reuses
  *    a single digest and the input byte array across all 8 hashes
  *    and allocates no strings at all;
  *  - LONG minhash values make the per-doc `min` aggregation
  *    hash-aggregatable: min(STRING) has an UnsafeRow-immutable buffer
  *    type, so Spark plans SortAggregate — a full sort of the shingle
  *    stream; min(BIGINT) runs in HashAggregateExec with a mutable
  *    buffer (the Sort node disappears from the plan — PlanSpec pins
  *    this).
  *
  * 60 bits (not 64): keeps the value non-negative in both engines'
  * signed BIGINT (no sign-wrap disagreement) and within DuckDB's exact
  * UBIGINT→BIGINT cast range. Min-wise family quality is unaffected
  * (two distinct md5s sharing 60 leading bits is ~2^-60).
  *
  * Thread-safety: the mutable MessageDigest lives in a @transient lazy
  * val; tasks deserialize their own expression instance (the standard
  * per-task reference deserialization), so the digest is single-task —
  * the same pattern as Spark's own transient regex caches.
  */
case class MinHashLongs(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(j => s"${j + 1}|".getBytes(UTF_8))

  /** Called from both interpreted eval and generated code. */
  def hashAll(g: UTF8String): ArrayData = {
    val bytes = g.getBytes
    val out = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      md.reset()
      md.update(prefixes(j))
      md.update(bytes)
      val d = md.digest()
      // first 60 bits big-endian = first 15 hex digits as an integer
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      out(j) = v >>> 4
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    hashAll(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashLongs", this, classOf[MinHashLongs].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.hashAll($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashLongs {

  private val tlMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The engine's minhash family as a plain function (shared with the
    * typed [[MinHashAgg]] surface): first 60 bits of
    * md5("<j+1>|" + s), non-negative.
    */
  def hash60(j: Int, s: String): Long = {
    val md = tlMd.get()
    md.reset()
    md.update(s"${j + 1}|".getBytes(UTF_8))
    md.update(s.getBytes(UTF_8))
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Build from a function-registry argument list (n must be foldable —
    * a clear error beats the NPE a non-literal would hit in eval).
    */
  def fromExprs(exprs: Seq[Expression]): MinHashLongs = {
    require(exprs(1).foldable, "minhash_longs(g, n): n must be a literal")
    MinHashLongs(exprs(0), exprs(1).eval(null).asInstanceOf[Number].intValue)
  }

  /** Register `minhash_longs(g, n)` (n must be a literal) for expr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_longs", fromExprs, "scala_udf")
}
