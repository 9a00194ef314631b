package graft

import org.apache.spark.sql.functions._

/** graft.queries.TrainPrep.pplBuckets (q119, CCNet head/middle/tail):
  * exact agreement with an independent in-JVM replica of the sampled
  * tercile-cutoff semantics, the per-language value ordering the
  * buckets must respect, the unsampled-language fallback, and
  * partitioning independence of the content-addressed sample.
  */
class PplBucketSpec extends SparkSuite {

  /** The q53/q119 content-addressed bucket: first 32 bits of
    * md5(key || salt) mod 100, replicated with plain JDK md5.
    */
  private def hashBucket(key: String, salt: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest((key + salt).getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % 100
  }

  /** Pure-Scala replica: scores, 20% sample, per-lang tercile cutoff
    * VALUES at positions ceil(m/3) / ceil(2m/3) of the sorted sample,
    * value-based bucket assignment, 'middle' for unsampled langs.
    */
  private def replica(docs: Seq[(Long, String, String)]): Map[Long, (Long, String)] = {
    val scored = docs.flatMap { case (id, lang, text) =>
      val toks = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else Some((id, lang, toks.map(_.length.toLong).sum * 1000000L / toks.length))
    }
    val cuts = scored
      .filter { case (id, _, _) => hashBucket(id.toString, "|pplcut") < 20 }
      .groupBy(_._2)
      .map { case (lang, xs) =>
        val l = xs.map(_._3).sorted
        val m = l.length.toLong
        lang -> (l(((m + 2) / 3).toInt - 1), l(((2 * m + 2) / 3).toInt - 1))
      }
    scored.map { case (id, lang, score) =>
      val bucket = cuts.get(lang) match {
        case None => "middle"
        case Some((c1, _)) if score <= c1 => "head"
        case Some((_, c2)) if score <= c2 => "middle"
        case _ => "tail"
      }
      id -> (score, bucket)
    }.toMap
  }

  private def fixture: Seq[(Long, String, String)] = {
    // two languages with spread-out mean word lengths, plus a rare
    // language and an empty/punctuation-only doc
    val r = new scala.util.Random(42)
    val langs = Seq("aa", "bb")
    (0L until 120L).map { id =>
      val lang = langs((id % 2).toInt)
      val wordLen = 2 + r.nextInt(9)
      val words = Seq.fill(5 + r.nextInt(10))("x" * wordLen)
      (id, lang, words.mkString(" "))
    } ++ Seq(
      (200L, "zz", "lonely document of a rare language"),
      (201L, "aa", "!!! 123 ..."))
  }

  test("engine ≡ independent replica on a synthetic corpus") {
    import spark.implicits._
    val docs = fixture
    val got = graft.queries.TrainPrep.pplBuckets(
      docs.toDF("doc_id", "lang", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    val want = replica(docs)
    assert(got == want)
    // the token-less doc is excluded, everything else is bucketed
    assert(!got.contains(201L) && got.size == docs.size - 1)
  }

  test("per-language value ordering: head ≤ cut1 < middle ≤ cut2 < tail") {
    val rows = SparkEntry.queries("q119_ppl_buckets")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getString(3)))
    rows.groupBy(_._1).foreach { case (lang, xs) =>
      def scores(b: String) = xs.filter(_._3 == b).map(_._2)
      val (h, m, t) = (scores("head"), scores("middle"), scores("tail"))
      if (h.nonEmpty && m.nonEmpty)
        assert(h.max < m.min, s"$lang: head/middle overlap")
      if (m.nonEmpty && t.nonEmpty)
        assert(m.max < t.min, s"$lang: middle/tail overlap")
      // with a sampled language, all three strata exist at sf0.01 size
      if (xs.length > 50)
        assert(h.nonEmpty && m.nonEmpty && t.nonEmpty, s"$lang strata empty")
    }
  }

  test("language absent from the sample falls back to 'middle'") {
    import spark.implicits._
    // pick a doc_id OUTSIDE the 20% sample for the rare language
    val unsampledId = (300L until 400L)
      .find(id => hashBucket(id.toString, "|pplcut") >= 20).get
    val docs = fixture.filterNot(_._2 == "zz") :+
      ((unsampledId, "zz", "some words here"))
    val got = graft.queries.TrainPrep.pplBuckets(
      docs.toDF("doc_id", "lang", "text"))
      .filter($"lang" === "zz").collect()
    assert(got.length == 1 && got.head.getString(3) == "middle")
  }

  test("content-addressed sample: result invariant under repartitioning") {
    import spark.implicits._
    val df = fixture.toDF("doc_id", "lang", "text")
    val a = graft.queries.TrainPrep.pplBuckets(df)
      .collect().map(_.toSeq).toSet
    val b = graft.queries.TrainPrep.pplBuckets(df.repartition(7))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
