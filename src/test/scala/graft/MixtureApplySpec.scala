package graft

import java.security.MessageDigest

/** q142_mixture_apply (deterministic execution of the q139 waterfill
  * plan): exact agreement with a JVM replica that mirrors the
  * engine's draw (60-bit md5 vs floor(f·2⁶⁰)), plus the apply
  * invariants — capped languages keep every document, realized token
  * draws land near the allocation, and the draw is reproducible
  * (re-running returns the identical selection).
  */
class MixtureApplySpec extends SparkSuite {

  private def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  private def toks(t: String): Seq[String] =
    t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq

  private def replica(
      docs: Seq[(Long, String, String)]): Map[String, (Long, Double, Long, Long, Long)] = {
    val counts = docs.groupBy(_._3).view
      .mapValues(_.map(d => toks(d._2).size.toLong).sum).toMap
      .filter(_._2 > 0)
    val sorted = counts.toSeq.sortBy { case (l, c) => (c, l) }
    val n = sorted.size.toLong
    val b = sorted.map(_._2).sum / 5
    val pres = sorted.scanLeft(0L)(_ + _._2).tail
    val kstar = sorted.zipWithIndex.collectFirst {
      case ((_, c), i) if pres(i) - c + (n - i) * c >= b => (i + 1).toLong
    }
    val preK = kstar.map(k => pres(k.toInt - 1) - sorted(k.toInt - 1)._2)
    val plan = sorted.zipWithIndex.map { case ((l, c), i) =>
      val capped = kstar.forall(ks => (i + 1).toLong < ks)
      val alloc =
        if (capped) c.toDouble
        else (b - preK.get).toDouble / (n - kstar.get + 1L).toDouble
      l -> (c, alloc)
    }.toMap
    plan.map { case (l, (c, alloc)) =>
      val thresh = math.floor(alloc / c.toDouble * 1.152921504606846976e18).toLong
      // every doc of the language joins the plan row — including
      // zero-token docs (they count in n_docs, never in sel_tokens)
      val members = docs.filter(_._3 == l)
      val sel = members.filter(d => h60(s"${d._1}|mix") < thresh)
      l -> (c, alloc, members.size.toLong, sel.size.toLong,
        sel.map(d => toks(d._2).size.toLong).sum)
    }
  }

  private def run(docs: Seq[(Long, String, String)]): Map[String, (Long, Double, Long, Long, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mixapply").toString
    docs.toDF("doc_id", "text", "lang").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    SparkEntry.queries("q142_mixture_apply")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
  }

  test("engine ≡ replica; capped languages keep everything; draw reproducible") {
    val r = new scala.util.Random(47)
    val pool = Seq("kap", "lam", "mu", "nu", "xi", "om")
    def text(n: Int) = (0 until n).map(_ => pool(r.nextInt(pool.length))).mkString(" ")
    // scarce: 2 docs × 5 tokens; mid: 20 docs × 10; big: 60 docs × 20
    val docs =
      (0L until 2L).map(i => (i, text(5), "scarce")) ++
      (10L until 30L).map(i => (i, text(10), "mid")) ++
      (100L until 160L).map(i => (i, text(20), "big"))
    val got = run(docs)
    val want = replica(docs)
    assert(got == want, s"got $got\nwant $want")
    // B = (10+200+1200)/5 = 282: scarce (10) capped → every doc kept
    assert(got("scarce")._4 == got("scarce")._3,
      "a supply-capped language must keep every document (f = 1)")
    // uncapped languages: the realized token draw approximates the
    // allocation (Bernoulli over ~docs — allow generous slack)
    val (_, alloc, _, _, selTok) = got("big")
    assert(selTok > 0 && math.abs(selTok - alloc) < alloc,
      s"realized $selTok vs alloc $alloc")
    // reproducibility: the draw is content-addressed, not random()
    assert(run(docs) == got)
  }
}
