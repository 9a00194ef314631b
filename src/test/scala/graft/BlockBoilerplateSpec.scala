package graft

import graft.queries.Curation

/** q110 (repeated-passage / boilerplate removal): planted fixtures for
  * the block unit — a block-aligned passage shared by ≥ minDocs
  * documents disappears from ALL of them (no owner), an under-
  * threshold passage survives, reconstruction preserves order around
  * a mid-document removal, and the trailing partial block counts as a
  * block.
  */
class BlockBoilerplateSpec extends SparkSuite {

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    Curation.removeBoilerplateBlocks(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("a block in 3 docs is dropped from all 3; a block in 2 docs survives") {
    val nav = toks("nav", 10)
    val promo = toks("promo", 10)
    val got = run(Seq(
      1L -> (nav + " " + toks("a", 15)),
      2L -> (nav + " " + toks("b", 12)),
      3L -> (nav + " " + toks("c", 8)),
      4L -> (promo + " " + toks("d", 10)),
      5L -> (promo + " " + toks("e", 10))))
    assert(got(1L) == ((3L, 1L, toks("a", 15))), s"got $got")
    assert(got(2L) == ((3L, 1L, toks("b", 12))))
    assert(got(3L) == ((2L, 1L, toks("c", 8))))
    // two occurrences < minDocs=3: the promo block survives everywhere
    assert(got(4L) == ((2L, 0L, promo + " " + toks("d", 10))))
    assert(got(5L) == ((2L, 0L, promo + " " + toks("e", 10))))
  }

  test("mid-document removal preserves surrounding order") {
    val footer = toks("footer", 10)
    val got = run(Seq(
      6L -> (toks("f", 10) + " " + footer + " " + toks("g", 10)),
      7L -> (footer + " " + toks("h", 10)),
      8L -> (footer + " " + toks("i", 10))))
    assert(got(6L) == ((3L, 1L, toks("f", 10) + " " + toks("g", 10))), s"got $got")
    assert(got(7L) == ((2L, 1L, toks("h", 10))))
  }

  test("fully-boilerplate doc reconstructs to empty; unique corpus untouched") {
    val spam = toks("spam", 10)
    val got = run(Seq(
      1L -> spam, 2L -> spam, 3L -> spam,
      4L -> toks("u", 7)))
    assert(got(1L) == ((1L, 1L, "")), s"got $got")
    assert(got(4L) == ((1L, 0L, toks("u", 7))))
  }
}
