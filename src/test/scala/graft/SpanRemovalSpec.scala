package graft

import graft.queries.Mining
import org.apache.spark.sql.functions._

/** q108 (ExactSubstr span removal): the removal tail over planted
  * fixtures — exact excision of a shared block from every non-owner
  * document, owner-keeps semantics, island merging of overlapping
  * gram spans, pass-through of unique documents — plus the
  * conservation invariant clean_len + rm_chars = length(t200) over
  * the real corpus.
  */
class SpanRemovalSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    Mining.removeDupSpans(rows.toDF("doc_id", "t200"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))))
      .toMap
  }

  test("shared block excised exactly from the non-owner; owner keeps it") {
    // 40 shared chars inside otherwise-unique context: the duplicated
    // 20-grams are exactly those fully inside the block, so the merged
    // island covers the block and nothing else
    val block = "0123456789abcdefghijklmnopqrstuvwxyz!@#$"
    val d1 = "a" * 30 + block + "c" * 30
    val d2 = "e" * 25 + block + "g" * 35
    val got = run(Seq(1L -> d1, 2L -> d2))
    val (n1, rm1, t1, l1) = got(1L)
    val (n2, rm2, t2, l2) = got(2L)
    assert(n1 == 0L && rm1 == 0L && t1 == d1 && l1 == d1.length.toLong,
      s"owner must keep its copy: $got")
    assert(n2 == 1L && rm2 == block.length.toLong,
      s"non-owner should lose exactly the block: $got")
    assert(t2 == "e" * 25 + "g" * 35 && l2 == d2.length.toLong - block.length)
  }

  test("two far-apart shared blocks become two spans; in-between text survives") {
    val b1 = "0123456789abcdefghij"
    val b2 = "ABCDEFGHIJKLMNOPQRST"
    val mid = "m" * 40
    val d1 = b1 + mid + b2
    val d2 = "x" * 20 + b1 + "y" * 40 + b2 + "z" * 20
    val got = run(Seq(1L -> d1, 2L -> d2))
    assert(got(1L)._1 == 0L, "owner untouched")
    val (n2, rm2, t2, _) = got(2L)
    assert(n2 == 2L && rm2 == (b1.length + b2.length).toLong, s"got $got")
    assert(t2 == "x" * 20 + "y" * 40 + "z" * 20)
  }

  test("owner keeps BOTH copies of a gram it repeats; the other doc loses its one") {
    val block = "qwertyuiopasdfghjklz"
    val d1 = block + "1" * 30 + block
    val d2 = "2" * 30 + block + "3" * 30
    val got = run(Seq(1L -> d1, 2L -> d2))
    assert(got(1L)._3 == d1, s"owner must keep both copies: $got")
    assert(got(2L)._3 == "2" * 30 + "3" * 30)
  }

  test("all-unique corpus passes through; short docs (<20 chars) untouched") {
    val d1 = "a" * 50
    val d2 = "b" * 50
    val d3 = "tiny"
    val got = run(Seq(1L -> d1, 2L -> d2, 3L -> d3))
    got.foreach { case (id, (n, rm, t, l)) =>
      assert(n == 0L && rm == 0L, s"doc $id should be untouched")
      assert(l == t.length.toLong)
    }
    assert(got(1L)._3 == d1 && got(2L)._3 == d2 && got(3L)._3 == d3)
  }

  test("conservation invariant on the real corpus: clean_len + rm_chars = len(t200)") {
    import spark.implicits._
    val out = SparkEntry.queries("q108_exactsubstr_removal")(spark, sf)
    val lens = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", length(substring($"text", 1, 200)).cast("long").as("len"))
    val bad = out.join(lens, "doc_id")
      .filter($"clean_len" + $"rm_chars" =!= $"len" ||
        length($"clean_text").cast("long") =!= $"clean_len")
      .count()
    assert(bad == 0L, s"$bad docs violate clean_len + rm_chars = len")
    // and the corpus genuinely exercises the operator: something removed
    val removed = out.filter($"n_spans" > 0).count()
    assert(removed > 0L, "fixture corpus should contain cross-doc duplicates")
    assert(out.count() == lens.count(), "every document must appear")
  }
}
