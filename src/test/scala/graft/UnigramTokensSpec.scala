package graft

import graft.functions.{UnigramTokens, UnigramVocabs}
import org.apache.spark.sql.functions._

/** functions.UnigramTokens: the native Viterbi token counter agrees
  * with a UnigramTrain.segment-based replica on in-vocab text, the
  * OOV single-char fallback counts dirty words instead of dying,
  * interpreted eval ≡ the codegen'd path, and registration rejects
  * unknown vocab names loudly.
  */
class UnigramTokensSpec extends SparkSuite {

  private def replicaTokens(text: String): Long =
    "[^a-z]+".r.split(text.toLowerCase).filter(_.nonEmpty).map { w =>
      graft.ops.UnigramTrain.segment(w, UnigramVocabs.V1, maxPieceLen = 6).length.toLong
    }.sum

  test("expression ≡ segment replica on in-vocab text (case + punctuation)") {
    import spark.implicits._
    UnigramTokens.register(spark)
    val texts = Seq(
      "the fast key order sort table scan merge part window",
      "SPARK Window, window; dup!dup the-batch",
      "customer data stream aggregate",  // customer = custom+er, aggregate = agg+r+e+gat? Viterbi decides
      "", "   ", "a", "veryverylongestword")
    val got = texts.toDF("text")
      .select(expr("unigram_tokens(text, 'v1')").as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === texts.map(replicaTokens),
      s"got $got want ${texts.map(replicaTokens)}")
    // whole corpus words count ONE token each
    assert(got.head === 10L)
  }

  test("OOV chars fall back to single-char pieces; vocab pieces still win") {
    val e = UnigramTokens(org.apache.spark.sql.catalyst.expressions.Literal("x"), "v1")
    def n(s: String) = e.tokens(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    assert(n("xyzzy") === 5L, "all-OOV word counts its chars")
    assert(n("sparkx") === 2L, "spark + x fallback")
    assert(n("spark") === 1L)
    // the replica THROWS on OOV (strict contract); the expression must
    // not — that asymmetry is the production fallback, pinned here
    intercept[IllegalArgumentException] {
      graft.ops.UnigramTrain.segment("xyzzy", UnigramVocabs.V1, 6)
    }
  }

  test("non-ASCII input agrees with the replica when fed through lower()") {
    import spark.implicits._
    UnigramTokens.register(spark)
    // 'İ' (U+0130) Unicode-lowercases to 'i' + combining dot — the
    // q212 contract routes text through Spark lower() FIRST, so the
    // expression's bytewise fold never sees non-ASCII uppercase and
    // both sides treat the combining byte as a separator
    val texts = Seq("İstanbul SPARK", "ÀÉÎ join", "ıii")
    val got = texts.toDF("text")
      .select(expr("unigram_tokens(lower(text), 'v1')")).collect().map(_.getLong(0)).toSeq
    assert(got === texts.map(t => replicaTokens(t.toLowerCase)))
  }

  test("interpreted eval ≡ codegen path; null in, null out") {
    import spark.implicits._
    UnigramTokens.register(spark)
    val texts = Seq("spark table xflow", "the the the", "zzz")
    val viaDf = texts.toDF("text")
      .select(expr("unigram_tokens(text, 'v1')")).collect().map(_.getLong(0)).toSeq
    val e = UnigramTokens(org.apache.spark.sql.catalyst.expressions.Literal("x"), "v1")
    val direct = texts.map(t =>
      e.tokens(org.apache.spark.unsafe.types.UTF8String.fromString(t)))
    assert(viaDf === direct)
    val withNull = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
      .select(expr("unigram_tokens(text, 'v1')")).collect().head
    assert(withNull.isNullAt(0))
  }

  test("unknown vocab name fails at registration time, not eval time") {
    UnigramTokens.register(spark)
    val ex = intercept[Exception] {
      spark.sql("SELECT unigram_tokens('spark', 'nope')").collect()
    }
    assert(ex.getMessage.contains("unknown unigram vocab") ||
      ex.getCause != null && ex.getCause.getMessage.contains("unknown unigram vocab"))
  }
}
