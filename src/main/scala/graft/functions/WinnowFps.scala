package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared machinery for the two winnowing expressions: UTF-8 character
  * offsets (so gram boundaries match SQL `substring`'s character
  * semantics byte-for-byte) and the O(n) sliding-window minimum +
  * insertion-ordered distinct that IS Schleimer winnowing's selection
  * rule.
  *
  * Why native expressions at all: winnowing is document-local, but the
  * declarative forms both pay for that locality — the window-over-
  * doc_id form shuffles and sorts the ENTIRE gram stream twice (once
  * for the ROWS frame, once for the DISTINCT), and the higher-order-
  * function form (`transform` + `least(element_at…)`) evaluates an
  * interpreted lambda per gram per window slot (measured 1.5× slower
  * than the shuffle form at sf0.1 even though it shuffles nothing).
  * This expression does the whole selection in one tight pass inside
  * whole-stage codegen: a monotonic-deque sliding min (O(1) amortized
  * per gram vs O(w)), one reused MessageDigest, primitive long arrays,
  * open-addressing distinct — no gram rows, no shuffle, no boxing. At
  * 100 TB nothing but the ~2/(w+1)-density fingerprints ever leaves
  * the scan; locally it beats both declarative forms.
  */
object Winnow {

  /** Char-start byte offsets of `bytes` (UTF-8), plus the end offset —
    * offs(i) is the byte position of 1-based character i+1, exactly the
    * boundaries SQL `substring(t, i, len)` cuts at.
    */
  def charOffsets(bytes: Array[Byte]): Array[Int] = {
    // worst case every byte starts a char
    val offs = new Array[Int](bytes.length + 1)
    var i = 0
    var n = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { offs(n) = i; n += 1 }
      i += 1
    }
    offs(n) = bytes.length
    java.util.Arrays.copyOf(offs, n + 1)
  }

  /** Distinct minima of every full width-`w` window over `m`, in first-
    * selection order — the winnowed fingerprint set. Monotonic deque
    * (O(n)) + linear-probe long set (values are non-negative; -1 is the
    * empty slot).
    */
  def slidingDistinct(m: Array[Long], w: Int): Array[Long] = {
    val n = m.length
    val nw = n - w + 1
    if (nw <= 0) return Array.emptyLongArray
    var cap = 16
    while (cap < nw * 2 && cap > 0) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    java.util.Arrays.fill(keys, -1L)
    val out = new Array[Long](nw)
    var nOut = 0
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    var i = 0
    while (i < n) {
      while (tail > head && m(dq(tail - 1)) >= m(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) {
        val k = m(dq(head))
        var idx = (((k * 0x9e3779b97f4a7c15L) >>> 33).toInt) & mask
        var done = false
        while (!done) {
          val cur = keys(idx)
          if (cur == k) done = true
          else if (cur == -1L) {
            keys(idx) = k
            out(nOut) = k
            nOut += 1
            done = true
          } else idx = (idx + 1) & mask
        }
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, nOut)
  }
}

/** Native Catalyst expression behind q102/q107's full-document
  * ExactSubstr winnowing (graft.queries.Mining.selectedFingerprints):
  * the distinct window-minima of `m_i = hash·posMod + i` over all
  * 20-char grams of `t`, divided back to the hash — numerically equal,
  * gram for gram, to the declarative
  * `array_distinct(window-min over CAST(conv(substr(md5(substring(t,
  * i, 20)), 1, hashHex), 16, 10) AS BIGINT) * posMod + i) div posMod`
  * that the DuckDB oracle replays with builtins: the hash is the first
  * `hashHex` hex digits of md5 (big-endian bytes, right-shifted to the
  * 4·hashHex-bit value), grams are cut at CHARACTER boundaries, and
  * `i` is the 1-based gram position. (hashHex, posMod) is the corpus-
  * sized pos ladder rung (Mining.posLadder): hash+pos stays 60 bits.
  *
  * Thread-safety: the MessageDigest is @transient lazy — each task
  * deserializes its own instance (the MinHashLongs pattern).
  */
case class WinnowFps(child: Expression, w: Int, hashHex: Int, posMod: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  /** Called from both interpreted eval and generated code. */
  def fps(t: UTF8String): ArrayData = {
    val bytes = t.getBytes
    val offs = Winnow.charOffsets(bytes)
    val nChars = offs.length - 1
    val n = nChars - 19
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val nb = (hashHex + 1) / 2
    val shift = 8 * nb - 4 * hashHex
    val m = new Array[Long](n)
    var i = 0
    while (i < n) {
      val from = offs(i)
      md.reset()
      md.update(bytes, from, offs(i + 20) - from)
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < nb) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      m(i) = (v >>> shift) * posMod + (i + 1)
      i += 1
    }
    val wmins = Winnow.slidingDistinct(m, w)
    i = 0
    while (i < wmins.length) { wmins(i) = wmins(i) / posMod; i += 1 }
    new GenericArrayData(wmins)
  }

  override protected def nullSafeEval(input: Any): Any =
    fps(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowFps", this, classOf[WinnowFps].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.fps($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFps {

  /** Build from a function-registry argument list (the non-column args
    * must be literals — a clear error beats an eval-time NPE).
    */
  def fromExprs(exprs: Seq[Expression]): WinnowFps = {
    require(exprs.drop(1).forall(_.foldable),
      "winnow_fps(t, w, hash_hex, pos_mod): w, hash_hex, pos_mod must be literals")
    WinnowFps(
      exprs(0),
      exprs(1).eval(null).asInstanceOf[Number].intValue,
      exprs(2).eval(null).asInstanceOf[Number].intValue,
      exprs(3).eval(null).asInstanceOf[Number].longValue)
  }

  /** Register `winnow_fps(t, w, hash_hex, pos_mod)` for expr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fps", fromExprs, "scala_udf")
}

/** Native Catalyst expression for the ExactSubstr gram-hash pipelines
  * (q86/q108/q67's map side): element i (0-based) is the first
  * `hexChars` hex digits of md5 of the `width`-char gram starting at
  * 1-based character position i+1 — numerically equal to
  * `transform(sequence(1, length(t)-width+1), i ->
  * CAST(conv(substr(md5(substring(t, i, width)), 1, hexChars), 16,
  * 10) AS BIGINT))`, which the DuckDB oracles replay with builtins.
  * Returns an empty array when the text is shorter than one gram.
  *
  * vs the declarative transform: no interpreted lambda per gram and
  * no per-gram UTF8String allocation — one reused MessageDigest runs
  * directly over the document's byte range per gram (character
  * boundaries from one offsets pass, so multibyte text cuts exactly
  * like SQL substring). Positions are recoverable downstream via
  * `posexplode` (p = pos+1), which is how q108 keeps its (p, gh)
  * pairs without the struct-building lambda.
  */
case class Md5GramHashes(child: Expression, width: Int, hexChars: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  def hashes(t: UTF8String): ArrayData = {
    val bytes = t.getBytes
    val offs = Winnow.charOffsets(bytes)
    val n = offs.length - 1 - (width - 1)
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val nb = (hexChars + 1) / 2
    val shift = 8 * nb - 4 * hexChars
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val from = offs(i)
      md.reset()
      md.update(bytes, from, offs(i + width) - from)
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < nb) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = v >>> shift
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    hashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5GramHashes", this, classOf[Md5GramHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.hashes($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5GramHashes {

  def fromExprs(exprs: Seq[Expression]): Md5GramHashes = {
    require(exprs.drop(1).forall(_.foldable),
      "md5_gram_hashes(t, width, hex_chars): width and hex_chars must be literals")
    Md5GramHashes(
      exprs(0),
      exprs(1).eval(null).asInstanceOf[Number].intValue,
      exprs(2).eval(null).asInstanceOf[Number].intValue)
  }

  /** Register `md5_gram_hashes(t, width, hex_chars)` for expr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_gram_hashes", fromExprs, "scala_udf")
}

/** Native Catalyst expression behind q62's MOSS fingerprints: the
  * distinct window-minima (width `w`) of the base-31 polynomial
  * rolling hash over character 8-grams of `s`, mod 2^31−1 — the exact
  * integers of the declarative form
  * `min((Σ_j ascii(substring(s, i+j, 1))·31^(7−j)) % 2147483647) OVER
  * (ROWS w−1 PRECEDING)` that the DuckDB oracle replays with `ord`.
  * Contract: `s` must be ASCII (q62 normalizes to [a-z] first) — gram
  * character values are read as single bytes, which equals `ascii()`
  * exactly on ASCII input.
  */
case class WinnowPolyFps(child: Expression, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // 31^7 .. 31^0
  private val pows = Array(27512614111L, 887503681L, 28629151L, 923521L,
    29791L, 961L, 31L, 1L)

  def fps(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length - 7
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val m = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0L
      var j = 0
      while (j < 8) { h += (bytes(i + j) & 0xffL) * pows(j); j += 1 }
      m(i) = h % 2147483647L
      i += 1
    }
    new GenericArrayData(Winnow.slidingDistinct(m, w))
  }

  override protected def nullSafeEval(input: Any): Any =
    fps(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowPolyFps", this, classOf[WinnowPolyFps].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.fps($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowPolyFps {

  def fromExprs(exprs: Seq[Expression]): WinnowPolyFps = {
    require(exprs.drop(1).forall(_.foldable),
      "winnow_poly_fps(s, w): w must be a literal")
    WinnowPolyFps(exprs(0), exprs(1).eval(null).asInstanceOf[Number].intValue)
  }

  /** Register `winnow_poly_fps(s, w)` for expr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_poly_fps", fromExprs, "scala_udf")
}
