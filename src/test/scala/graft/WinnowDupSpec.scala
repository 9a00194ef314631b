package graft

import graft.queries.Mining
import org.apache.spark.sql.functions._

/** q102 (winnowed full-document ExactSubstr coverage): the w = 1
  * degenerate case must reproduce q86's statistic bit-for-bit on the
  * prefix domain (every gram position is its own window minimum →
  * selection keeps everything), and the full-document form must
  * recover a duplicate planted PAST the 200-char prefix — the blind
  * spot that motivates it over q86/q91.
  */
class WinnowDupSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("w=1 on the prefix domain reproduces q86 exactly") {
    import spark.implicits._
    val q86 = SparkEntry.queries("q86_substring_dup_coverage")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // the q86 domain: raw 200-char prefix, ≥20 chars (Llm.docPrefix)
    val prefix = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", substring($"text", 1, 200).as("t"))
      .filter(length($"t") >= 20)
    val got = Mining.winnowDupCoverage(prefix, w = 1)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == q86.keySet)
    got.foreach { case (d, (nFp, nDup, frac)) =>
      val (nGrams, nDup86, frac86) = q86(d)
      assert(nFp == nGrams && nDup == nDup86, s"doc $d: ($nFp,$nDup) vs q86 ($nGrams,$nDup86)")
      assert(java.lang.Double.doubleToLongBits(frac) ==
        java.lang.Double.doubleToLongBits(frac86), s"doc $d dup_frac")
    }
  }

  test("recovers a full-document duplicate the prefix domain cannot see") {
    import spark.implicits._
    // 120 shared chars planted at position 221 — q86/q91's substr(1,200)
    // domain ends before it, and the two prefixes share nothing
    val block = "x" * 120
    val docs = Seq(
      (1L, "a" * 220 + block + "p" * 60),
      (2L, "b" * 220 + block + "q" * 60)).toDF("doc_id", "t")
    val full = Mining.winnowDupCoverage(docs, w = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(full(1L) > 0 && full(2L) > 0,
      s"planted duplicate not recovered: $full")
    // the same operator restricted to the q86 domain must NOT see it
    val prefixOnly = Mining.winnowDupCoverage(
      docs.select($"doc_id", substring($"t", 1, 200).as("t")), w = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(prefixOnly(1L) == 0 && prefixOnly(2L) == 0,
      s"prefix domain should be blind to the planted block: $prefixOnly")
  }

  test("pos field auto-widens past 65,535 grams: duplicate planted past 64 KB recovered") {
    import spark.implicits._
    assert(Mining.posLadder(65535L) == ((11, 65536L)))
    assert(Mining.posLadder(65536L) == ((9, 16777216L)))
    assert(Mining.posLadder(16777216L) == ((7, 4294967296L)))
    // the shared 160-char block sits at gram positions whose `div 65536`
    // differs between the two docs (1 vs 2) — under the old fixed 16-bit
    // packing pos overflowed into the hash, the two copies got DIFFERENT
    // fingerprints, and the duplicate was silently lost; the 24-bit
    // ladder rung recovers it
    val block = "shared-winnow-block!" * 8
    val docs = Seq(
      (1L, "a" * 70000 + block + "c" * 80000),
      (2L, "b" * 140000 + block + "d" * 10000)).toDF("doc_id", "t")
    val got = Mining.winnowDupCoverage(docs, w = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) > 0 && got(2L) > 0,
      s"duplicate past the 16-bit pos horizon not recovered: $got")
  }
}
