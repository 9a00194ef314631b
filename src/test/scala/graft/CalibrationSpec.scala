package graft

import java.security.MessageDigest

/** q135_classifier_calibration (q109 evidence bands × q87 gate
  * verdicts): exact agreement with a first-principles JVM replica
  * (md5 bucket hashing, ppm integer model, gopher rules, integer
  * banding), plus the band-algebra invariants — bands ≥ 11 are
  * entirely selected, bands ≤ 9 entirely unselected (band 10 is
  * where the sel cut lives, by construction).
  */
class CalibrationSpec extends SparkSuite {

  private val stop = Set("the", "a", "an", "and", "of", "to", "in", "is", "that", "it")

  private def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  private def toks(t: String): Seq[String] =
    t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq

  private def replica(
      docs: Seq[(Long, String, String)]): Map[(Long, Long), (Long, Long)] = {
    // classifier evidence: bucket counts -> ppm model -> per-doc band/sel
    val tok = docs.flatMap { case (id, text, lang) =>
      toks(text).map(t => (id, lang, h60(t) % 256))
    }
    val c = tok.groupBy(_._3).map { case (bh, xs) => bh -> xs.size.toLong }
    val cp = tok.groupBy(_._3).map { case (bh, xs) =>
      bh -> xs.count(_._2 == "en").toLong
    }
    val nAll = c.values.sum
    val nPos = cp.values.sum
    val w = c.map { case (bh, n) => bh -> (cp(bh) + 1L) * 1000000L / (n + 2L) }
    val prior = (nPos + 1L) * 1000000L / (nAll + 2L)
    val ev = docs.flatMap { case (id, text, _) =>
      val ts = toks(text)
      if (ts.isEmpty) None
      else {
        val sw = ts.map(t => w(h60(t) % 256)).sum
        val n = ts.size.toLong
        Some(id -> ((sw * 10L) / (n * prior), if (sw > n * prior) 1L else 0L))
      }
    }.toMap
    // gopher gate
    val gate = docs.flatMap { case (id, text, _) =>
      val ts = toks(text)
      if (ts.isEmpty) None
      else {
        val wc = ts.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
        val nW = ts.size.toLong
        val meanWlen = ts.map(_.length.toLong).sum.toDouble / nW
        val stopFrac = ts.count(stop).toDouble / nW
        val topFrac = wc.values.max.toDouble / nW
        val pass = nW >= 30 && nW <= 100000 && meanWlen >= 3.0 &&
          meanWlen <= 5.0 && stopFrac > 0.0 && topFrac <= 0.15
        Some(id -> (if (pass) 1L else 0L))
      }
    }.toMap
    ev.toSeq.map { case (id, (band, sel)) => (band, gate(id), sel) }
      .groupBy { case (band, g, _) => (band, g) }
      .map { case (k, xs) => k -> (xs.size.toLong, xs.map(_._3).sum) }
  }

  /** Mixed fixture: long stopword-bearing docs (gate candidates),
    * short docs (gate fails), en and non-en (moves the model), and a
    * high-repetition doc (top_frac fail).
    */
  private def fixture: Seq[(Long, String, String)] = {
    val r = new scala.util.Random(53)
    def word = (0 until 3 + r.nextInt(4)).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    (0L until 40L).map { id =>
      val lang = if (id % 3 == 0) "en" else "xx"
      val text =
        if (id % 7 == 6) "spam " * 40
        else if (id % 5 == 4) s"$word $word $word"
        else ((0 until 35).map(_ => word) :+ "the").mkString(" ")
      (id, text.trim, lang)
    }
  }

  test("engine ≡ replica exactly; band algebra brackets the sel cut") {
    import spark.implicits._
    val docs = fixture
    val got = graft.queries.Selection.classifierCalibration(
      docs.toDF("doc_id", "text", "lang"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val want = replica(docs)
    assert(got == want, s"got $got\nwant $want")
    assert(got.nonEmpty)
    // the gate actually splits this fixture
    assert(got.keySet.map(_._2) == Set(0L, 1L))
    // band ≥ 11 ⇒ sw·10 ≥ 11·n·p > 10·n·p ⇒ sel = 1 for every doc;
    // band ≤ 9 ⇒ sw·10 < 10·n·p ⇒ sel = 0 for every doc
    got.foreach { case ((band, _), (nDocs, nSel)) =>
      if (band >= 11L) assert(nSel == nDocs, s"band $band not fully selected")
      if (band <= 9L) assert(nSel == 0L, s"band $band not fully unselected")
    }
  }
}
