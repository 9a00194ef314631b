package graft

/** q127 corpus datasheet + q128 tokenizer fertility: internal
  * consistency that the hash oracle alone would not localize — the
  * grouping-set strata must sum to each other exactly, and the
  * fertility rollup must agree with q106's per-document token counts
  * regrouped in plain JVM arithmetic.
  */
class DatasheetSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("q127: strata sum exactly — (lang,source) -> (lang) -> (); grains marked") {
    // rows keyed by the GROUPING() markers, which disambiguate rollup
    // rows from genuine NULL / literal-'ALL' values (the review
    // finding the markers exist for)
    val rows = SparkEntry.queries("q127_corpus_datasheet")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7))))
      .toMap
    val cells = rows.collect { case ((l, s, 0L, 0L), v) => (l, s) -> v }
    def sum3(xs: Iterable[(Long, Long, Long, Double)]) =
      (xs.map(_._1).sum, xs.map(_._2).sum, xs.map(_._3).sum)
    // per-language rows (g_source = 1) = sum of their cells
    rows.keys.collect { case (l, _, 0L, 1L) => l }.foreach { l =>
      val want = sum3(cells.collect { case ((`l`, _), v) => v })
      val got = rows((l, "ALL", 0L, 1L))
      assert((got._1, got._2, got._3) == want, s"lang $l stratum mismatch")
    }
    // per-source rows (g_lang = 1) = sum of their cells
    rows.keys.collect { case (_, s, 1L, 0L) => s }.foreach { s =>
      val want = sum3(cells.collect { case ((_, `s`), v) => v })
      val got = rows(("ALL", s, 1L, 0L))
      assert((got._1, got._2, got._3) == want, s"source $s stratum mismatch")
    }
    // the grand-total row (both markers) = sum of all cells = corpus
    val tot = rows(("ALL", "ALL", 1L, 1L))
    assert((tot._1, tot._2, tot._3) == sum3(cells.values))
    assert(tot._1 == spark.read.parquet(s"$sf/documents.parquet").count())
    // exactly the four grains, nothing else
    assert(rows.keys.map(k => (k._3, k._4)).toSet ==
      Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
    // mean is exactly sum/n in every row
    rows.values.foreach { case (n, chars, _, avg) =>
      assert(avg == chars.toDouble / n, "avg_chars is not sum/n")
    }
  }

  test("q128 ≡ q106's per-doc token counts regrouped by language") {
    import spark.implicits._
    val lang = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang", $"text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val q106 = SparkEntry.queries("q106_bpe_apply")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = q106.toSeq
      .map { case (id, nt) =>
        val (l, text) = lang(id)
        val pre = text.take(64).toLowerCase.replaceAll("[^a-z ]", "")
        val words = pre.split(" ").count(_.nonEmpty).toLong
        (l, nt, words)
      }
      .filter(_._3 >= 1L)
      .groupBy(_._1)
      .map { case (l, xs) =>
        l -> ((xs.length.toLong, xs.map(_._3).sum, xs.map(_._2).sum))
      }
    val got = SparkEntry.queries("q128_tokenizer_fertility")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (l, (nd, nw, nt)) =>
      val (gd, gw, gt, fert) = got(l)
      assert((gd, gw, gt) == ((nd, nw, nt)), s"lang $l totals diverge")
      assert(fert == nt.toDouble / nw.toDouble)
    }
  }
}
