package graft

import java.security.MessageDigest

/** q136_drop_drift (per-language drop-vs-corpus total variation):
  * exact agreement with a JVM replica, the volume columns, and the
  * metric anchors — a language whose drop is textually identical in
  * distribution to its corpus side reads TV = 0, a language whose
  * drop uses disjoint vocabulary reads TV = 1, languages absent from
  * either side drop out.
  */
class DropDriftSpec extends SparkSuite {

  private def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  private def toks(t: String): Seq[String] =
    t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq

  private def replica(
      docs: Seq[(Long, String, String)]): Map[String, (Long, Long, Long, Long, Double)] = {
    val sided = docs.map { case (id, text, lang) =>
      (if (id % 10 == 3) 1 else 0, lang, id, toks(text))
    }.filter(_._4.nonEmpty)
    val langs = sided.filter(_._1 == 1).map(_._2).toSet
      .intersect(sided.filter(_._1 == 0).map(_._2).toSet)
    langs.toSeq.map { lang =>
      def sideOf(s: Int) = sided.filter(x => x._1 == s && x._2 == lang)
      val (drop, rest) = (sideOf(1), sideOf(0))
      def buckets(xs: Seq[(Int, String, Long, Seq[String])]): Map[Long, Long] =
        xs.flatMap(_._4).map(t => h60(t) % 64)
          .groupBy(identity).map { case (i, ys) => i -> ys.size.toLong }
      val (bd, br) = (buckets(drop), buckets(rest))
      val (nd, nr) = (bd.values.sum, br.values.sum)
      // ordered double fold, ascending bucket index — the engine's
      // tvFold op sequence verbatim (overflow-safe at 100 TB token
      // counts, unlike the BIGINT cross-product form)
      var acc = 0.0
      (0L until 64L).foreach { i =>
        acc += math.abs(bd.getOrElse(i, 0L).toDouble / nd.toDouble -
          br.getOrElse(i, 0L).toDouble / nr.toDouble)
      }
      lang -> (drop.map(_._3).distinct.size.toLong, nd,
        rest.map(_._3).distinct.size.toLong, nr, acc / 2.0)
    }.toMap
  }

  private def run(docs: Seq[(Long, String, String)]): Map[String, (Long, Long, Long, Long, Double)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    docs.toDF("doc_id", "text", "lang").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    graft.SparkEntry.queries("q136_drop_drift")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
  }

  test("engine ≡ replica exactly; TV anchors; one-sided languages drop out") {
    val r = new scala.util.Random(61)
    def word = (0 until 3 + r.nextInt(5)).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    val sameText = "alpha beta gamma delta alpha beta"
    // "mixed" draws from ONE shared 8-word pool on both sides (in-
    // distribution up to sampling noise); "shift"'s drop vocabulary
    // is disjoint from its corpus side
    val pool = Seq("kappa", "lambda", "mu", "nu", "xi", "omicron", "pi", "rho")
    def mixedText = (0 until 12).map(_ => pool(r.nextInt(pool.length))).mkString(" ")
    // drop ids are 3, 13, 23, 33 (id % 10 == 3) — assigned explicitly
    val docs = (0L until 40L).map { id =>
      if (id == 3L || id == 23L) (id, sameText, "same")
      else if (id == 13L) (id, "zzqx zzwv zzpk zzmn zzar", "shift")
      else if (id == 33L) (id, mixedText, "mixed")
      else if (id % 4 == 3) (id, sameText, "same")
      else if (id % 4 == 1) (id, "epsilon zeta eta theta iota " + word, "shift")
      else if (id % 4 == 2) (id, (0 until 10).map(_ => word).mkString(" "), "corpusonly")
      else (id, mixedText, "mixed")
    }
    val got = run(docs)
    val want = replica(docs)
    assert(got == want, s"got $got\nwant $want")
    assert(got("same")._5 == 0.0, "identical distributions must read TV = 0")
    assert(!got.contains("corpusonly"), "one-sided language must drop out")
    assert(got.contains("shift") && got.contains("mixed"))
    assert(got.values.forall { case (_, _, _, _, tv) => tv >= 0.0 && tv <= 1.0 })
    // the vocabulary-shifted language reads far above the in-
    // distribution one (exact values pinned by the replica equality)
    assert(got("shift")._5 > 0.5 && got("shift")._5 > got("mixed")._5)
  }
}
