package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: single-pass RFC 3986 §2.3 percent-decode
  * of UNRESERVED octets only — `%XX` (either hex case) becomes its
  * character when that character is A–Z / a–z / 0–9 / `-` / `.` / `_`
  * / `~`; every other byte, including reserved octets like %2F and
  * invalid/truncated triplets, is copied through verbatim. This is THE
  * hot step of URL canonicalization (q215/q219,
  * [[graft.streaming.StreamFrontier]]): the declarative form is an
  * 84-step nested replace() chain (one replace per unreserved code per
  * hex case — [[graft.queries.Mining.pctDecodeSql]], which remains the
  * DuckDB oracle mirror), i.e. 84 full string scans per row where one
  * suffices. This expression is one byte scan, zero allocation beyond
  * the output buffer, and stays inside whole-stage codegen.
  *
  * Semantics note (PctDecodeSpec pins it): on VALID inputs (no bare
  * '%') the replace chain and this single pass are identical. On
  * malformed inputs the chain can CASCADE — a decoded character may
  * complete a new %XX pattern for a later replace ('%4%41' → chain
  * decodes %41→A then re-decodes the created %4A→J) — where this
  * single pass, per the RFC, decodes each source octet at most once
  * ('%4%41' → '%4A'). The synthesized corpora contain no bare '%', so
  * the oracle hash match holds while the engine side carries the
  * correct semantics.
  */
case class PctDecodeUnreserved(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "pct_decode_unreserved"

  override protected def nullSafeEval(input: Any): Any =
    PctDecodeUnreserved.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // MODULE$ access: explicit and forwarder-independent (a companion
    // class suppresses static forwarders when signatures collide)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PctDecodeUnreserved$$.MODULE$$.decode($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PctDecodeUnreserved {

  /** unreserved(b) for 0 ≤ b < 128. */
  private val Unreserved: Array[Boolean] = {
    val t = new Array[Boolean](128)
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ Seq('-', '.', '_', '~'))
      .foreach(c => t(c.toInt) = true)
    t
  }

  private def hex(b: Byte): Int = b match {
    case d if d >= '0' && d <= '9' => d - '0'
    case u if u >= 'A' && u <= 'F' => u - 'A' + 10
    case l if l >= 'a' && l <= 'f' => l - 'a' + 10
    case _ => -1
  }

  /** One left-to-right byte pass; called from interpreted eval AND the
    * generated code (static — no reference object needed). */
  def decode(s: UTF8String): UTF8String = {
    val in = s.getBytes
    var i = 0
    var n = in.length
    // fast path: no '%' at all → return the input untouched
    var hasPct = false
    while (i < n && !hasPct) { hasPct = in(i) == '%'; i += 1 }
    if (!hasPct) return s
    val out = new Array[Byte](n)
    var o = 0
    i = 0
    while (i < n) {
      val b = in(i)
      if (b == '%' && i + 2 < n) {
        val h1 = hex(in(i + 1)); val h2 = hex(in(i + 2))
        if (h1 >= 0 && h2 >= 0) {
          val v = (h1 << 4) | h2
          if (v < 128 && Unreserved(v)) { out(o) = v.toByte; o += 1; i += 3 }
          else { out(o) = b; o += 1; i += 1 }
        } else { out(o) = b; o += 1; i += 1 }
      } else { out(o) = b; o += 1; i += 1 }
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  def fromExprs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"pct_decode_unreserved takes 1 argument, got ${exprs.length}")
    PctDecodeUnreserved(exprs.head)
  }

  /** Temp-function registration for vanilla sessions (the
    * [[MinHashLongs]] pattern — the driver's session has no
    * extensions configured). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pct_decode_unreserved", fromExprs, "scala_udf")
}
