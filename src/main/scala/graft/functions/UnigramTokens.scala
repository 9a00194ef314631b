package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for scan-scale UNIGRAM token counting —
  * q106's role for the q209 tokenizer family: a production pipeline
  * trains the unigram vocabulary once (a frozen artifact, exactly how
  * SentencePiece models ship) and then token-COUNTS every document at
  * scan throughput (cost estimation, packing budgets, length gates —
  * the most-executed operation in a training-data pipeline).
  * `unigram_tokens(text, 'name')` = the summed Viterbi segment count
  * of every lowercase a–z word of `text` (the corpus tokenizer's
  * `[^a-z]+` alphabet, applied bytewise) under the named frozen
  * vocabulary from [[UnigramVocabs]].
  *
  * Viterbi here is [[graft.ops.UnigramTrain.segment]]'s rule — max
  * total logprob; ties prefer the longer last piece — with one
  * production addition: characters OUTSIDE the vocabulary fall back
  * to single-char pieces at a fixed penalty (every real tokenizer has
  * a byte-fallback; dying on an OOV char would make token counting
  * partial exactly where corpora are dirtiest). UnigramTokensSpec
  * pins agreement with a segment-based replica and the
  * interpreted ≡ codegen contract.
  *
  * Case-folding contract: the expression's own fold is bytewise ASCII
  * (A–Z only — anything heavier does not belong in the per-byte inner
  * loop). The q209 trainer's convention is `lower(text)` +
  * `[^a-z]+`, and Spark's `lower` does FULL Unicode folding ('İ' →
  * 'i' + combining dot), so callers on possibly-non-ASCII corpora
  * must feed `lower(text)` (q212 does) — then non-ASCII bytes are
  * separators on both sides and the counts agree; feeding raw text
  * is exact only for ASCII-cased input.
  *
  * Why native: token counting is per-row and the hot path of the
  * whole pipeline — the expression runs one tight DP per word inside
  * whole-stage codegen (primitive arrays, no per-piece allocation:
  * candidate pieces are probed by (start, length) against a
  * length-bucketed hash of the vocab bytes), where any declarative
  * form would explode a per-character lattice into rows. Rows-only by
  * design (iterative DP is not one SQL statement) — the [[WinnowFps]]
  * rationale at the apply tier.
  */
case class UnigramTokens(child: Expression, vocabName: String)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  @transient private lazy val vocab = UnigramVocabs.byName(vocabName)
  // BYTE length, not String.length: the DP window below slides over
  // UTF-8 byte offsets, so a multi-byte piece measured in UTF-16 chars
  // would silently shrink the window and undercount (round-14 advice).
  @transient private lazy val maxLen =
    vocab.keysIterator.map(_.getBytes("UTF-8").length).max

  /** OOV single-char penalty — well below every trained logprob, so a
    * real piece always outranks falling back through its chars. */
  private val OovLp = -100.0

  /** Open-addressing (packed-bytes → logprob) table for pieces of ≤ 7
    * bytes (key = len << 56 | bytes little-endian; 0 = empty slot —
    * impossible for a real key since len ≥ 1 sets bits ≥ 56), plus a
    * string-map spillover for longer pieces. This is what lets
    * [[pieceLp]] probe candidates by (offset, length) with ZERO
    * allocation on the short path — the DP's inner loop.
    */
  @transient private lazy val probe: (Array[Long], Array[Double], Int, Map[String, Double]) = {
    val (short, long) = vocab.partition(_._1.getBytes("UTF-8").length <= 7)
    var cap = 16
    while (cap < short.size * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val vals = new Array[Double](cap)
    val mask = cap - 1
    short.foreach { case (p, lp) =>
      val b = p.getBytes("UTF-8")
      var k = b.length.toLong << 56
      var i = 0
      while (i < b.length) { k |= (b(i) & 0xffL) << (8 * i); i += 1 }
      var idx = (((k * 0x9e3779b97f4a7c15L) >>> 33).toInt) & mask
      while (keys(idx) != 0L) idx = (idx + 1) & mask
      keys(idx) = k
      vals(idx) = lp
    }
    (keys, vals, mask, long)
  }

  /** Called from both interpreted eval and generated code. */
  def tokens(t: UTF8String): Long = {
    val bytes = t.getBytes
    var total = 0L
    var i = 0
    var start = -1
    while (i <= bytes.length) {
      val c = if (i < bytes.length) bytes(i) else 0
      val lower = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
      val isAz = lower >= 'a' && lower <= 'z'
      if (isAz && start < 0) start = i
      else if (!isAz && start >= 0) {
        total += wordTokens(bytes, start, i)
        start = -1
      }
      i += 1
    }
    total
  }

  /** Viterbi over one word's byte range [from, to). */
  private def wordTokens(bytes: Array[Byte], from: Int, to: Int): Long = {
    val n = to - from
    val score = new Array[Double](n + 1)
    val count = new Array[Long](n + 1)
    var j = 1
    while (j <= n) {
      score(j) = Double.NegativeInfinity
      var i = math.max(0, j - maxLen)
      while (i < j) {
        if (score(i) != Double.NegativeInfinity) {
          val lp = pieceLp(bytes, from + i, j - i)
          if (lp != Double.NegativeInfinity) {
            val s = score(i) + lp
            // ties prefer the longer last piece (smaller i) — i
            // ascends, so strict > keeps the first (longest) winner
            if (s > score(j)) { score(j) = s; count(j) = count(i) + 1 }
          }
        }
        i += 1
      }
      j += 1
    }
    count(n)
  }

  /** Logprob of the lowercased piece bytes [pos, pos+len), or the OOV
    * penalty for single chars, or -inf. Short pieces (≤ 7 bytes — the
    * DP's inner loop) probe the packed open-addressing table with no
    * allocation; longer pieces take the rare string-map path. */
  private def pieceLp(bytes: Array[Byte], pos: Int, len: Int): Double = {
    val (keys, vals, mask, longPieces) = probe
    if (len <= 7) {
      var k = len.toLong << 56
      var i = 0
      while (i < len) {
        var c = bytes(pos + i)
        if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
        k |= (c & 0xffL) << (8 * i)
        i += 1
      }
      var idx = (((k * 0x9e3779b97f4a7c15L) >>> 33).toInt) & mask
      while (true) {
        val cur = keys(idx)
        if (cur == k) return vals(idx)
        if (cur == 0L)
          return if (len == 1) OovLp else Double.NegativeInfinity
        idx = (idx + 1) & mask
      }
      Double.NegativeInfinity // unreachable
    } else {
      val sb = new java.lang.StringBuilder(len)
      var k = 0
      while (k < len) {
        val c = bytes(pos + k)
        sb.append((if (c >= 'A' && c <= 'Z') c + 32 else c.toInt).toChar)
        k += 1
      }
      longPieces.getOrElse(sb.toString, Double.NegativeInfinity)
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTokens", this, classOf[UnigramTokens].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.tokens($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramTokens {

  def fromExprs(exprs: Seq[Expression]): UnigramTokens = {
    require(exprs.length == 2 && exprs(1).foldable,
      "unigram_tokens(text, vocab_name): vocab_name must be a literal")
    val name = exprs(1).eval(null).asInstanceOf[UTF8String].toString
    require(UnigramVocabs.names.contains(name),
      s"unknown unigram vocab '$name' (have: ${UnigramVocabs.names.mkString(", ")})")
    UnigramTokens(exprs(0), name)
  }

  /** Register `unigram_tokens(text, vocab_name)` for expr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unigram_tokens", fromExprs, "scala_udf")
}

/** The frozen unigram vocabularies — shipped-tokenizer artifacts (the
  * q106 frozen-merge-ladder convention): `v1` is the q209 trainer's
  * actual output on the sf0.01 corpus (vocabSize 96, seed 1024,
  * maxPieceLen 6 — whole corpus words become pieces, single chars are
  * the coverage floor), pasted verbatim. A FIXED literal, not a
  * training call: apply must be stable across corpus versions, and
  * the spec's parity replica segments under exactly this table.
  */
object UnigramVocabs {

  val V1: Map[String, Double] = Map(
    "join" -> -3.372397973779151,
    "hash" -> -3.390190175203621,
    "row" -> -3.39442298575624,
    "batch" -> -3.4008059861512763,
    "scan" -> -3.401873791912106,
    "column" -> -3.4040128301608554,
    "custom" -> -3.4040128301608554,
    "er" -> -3.4040128301608554,
    "filter" -> -3.4050840675423544,
    "small" -> -3.4104575356034985,
    "merge" -> -3.4212918777692067,
    "slow" -> -3.4212918777692067,
    "order" -> -3.4278492783153673,
    "vector" -> -3.4278492783153673,
    "line" -> -3.4300446688788035,
    "table" -> -3.4322448897884037,
    "data" -> -3.432244890889727,
    "agg" -> -3.4399840118912373,
    "value" -> -3.4444334063309014,
    "key" -> -3.445548855414767,
    "stream" -> -3.4545175253975273,
    "window" -> -3.4567723177846155,
    "a" -> -3.463567358644717,
    "spark" -> -3.4635673609174447,
    "group" -> -3.4658426747545796,
    "part" -> -3.4658426747545796,
    "big" -> -3.4681231774533074,
    "sort" -> -3.4726998444807187,
    "query" -> -3.4738472915371936,
    "fast" -> -3.493558074601129,
    "the" -> -3.510087376552338,
    "dup" -> -6.985392730368215,
    "b" -> -24.058999826353972,
    "c" -> -24.058999826353972,
    "d" -> -24.058999826353972,
    "dat" -> -24.058999826353972,
    "e" -> -24.058999826353972,
    "f" -> -24.058999826353972,
    "g" -> -24.058999826353972,
    "gg" -> -24.058999826353972,
    "h" -> -24.058999826353972,
    "i" -> -24.058999826353972,
    "j" -> -24.058999826353972,
    "k" -> -24.058999826353972,
    "l" -> -24.058999826353972,
    "m" -> -24.058999826353972,
    "n" -> -24.058999826353972,
    "o" -> -24.058999826353972,
    "p" -> -24.058999826353972,
    "q" -> -24.058999826353972,
    "r" -> -24.058999826353972,
    "s" -> -24.058999826353972,
    "t" -> -24.058999826353972,
    "u" -> -24.058999826353972,
    "v" -> -24.058999826353972,
    "w" -> -24.058999826353972,
    "y" -> -24.058999826353972)

  val names: Set[String] = Set("v1")

  def byName(name: String): Map[String, Double] = name match {
    case "v1" => V1
    case other => throw new IllegalArgumentException(s"unknown unigram vocab: $other")
  }
}
