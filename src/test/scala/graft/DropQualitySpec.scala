package graft

/** q149_drop_quality (per-bucket quality profile of curation drops):
  * planted docs land one per drop bucket (gate-fail, exact clone,
  * near-dup paraphrase) plus kept docs on both sides of the Gopher
  * verdict, and the whole table must equal a JVM replica that
  * rebuilds the bucket assignment (q118's stage order over the
  * engine's own pair stream) and the Gopher flags from first
  * principles.
  */
class DropQualitySpec extends SparkSuite {

  private val baseP =
    ("the quick brown fox jumps over the lazy dog while counting " * 4).take(230)
  private val baseP2 =
    ("one of many winding rivers flows gently beneath ancient stone bridges today " * 3).take(230)

  private def uniq(n: Int, pre: String) = (1 to n)
    .map(i => pre + ('a' + i % 26).toChar + ('a' + i / 26).toChar)
    .mkString(" ")

  private def fixture: Seq[(Long, String)] = Seq(
    (0L, "tiny"),                   // quality_gate
    (1L, baseP),                    // kept (clone canonical)
    (2L, baseP),                    // exact_dup
    (3L, baseP2),                   // kept (near-dup canonical)
    (4L, "zz " + baseP2.take(197)), // near_dup
    (5L, "the " + uniq(39, "pa")),  // kept, gopher-passing
    (6L, "the quick little brown owl"
      + " sits calmly tonight"))    // kept, gopher-failing (n_words < 30)

  // --- JVM replicas of the engines under audit ---

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def gatePass(t: String): Boolean =
    t.length >= 30 &&
      "\\b(the|a|and|of|to|in)\\b".r.findFirstIn(t.toLowerCase).isDefined

  private val stop = Set("the", "a", "an", "and", "of", "to", "in", "is", "that", "it")

  private def gopherPass(t: String): Boolean = {
    val ws = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
    if (ws.isEmpty) return false
    val wc = ws.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val n = ws.length.toLong
    val meanW = wc.map { case (w, c) => w.length * c }.sum.toDouble / n
    val stopFrac = wc.collect { case (w, c) if stop(w) => c }.sum.toDouble / n
    val topFrac = wc.values.max.toDouble / n
    n >= 30 && n <= 100000 && meanW >= 3.0 && meanW <= 5.0 &&
      stopFrac > 0.0 && topFrac <= 0.15
  }

  private def tok(t: String): Long = t.split(" ").count(_.nonEmpty).toLong

  test("buckets land as planted; table ≡ JVM replica incl. gopher profile") {
    import spark.implicits._
    val docs = fixture
    val dir = java.nio.file.Files.createTempDirectory("dq").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    // replica bucket assignment: q118's stage order over the engine's
    // own verified pair stream (pinned separately by LshSpec et al.)
    val pairs = graft.queries.Llm.minhashLshPairs(
      spark.read.parquet(s"$dir/documents.parquet"), 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nearDropped = pairs.map(_._2).toSet
    val gated = docs.filter(d => gatePass(d._2))
    val canon = gated.groupBy(d => md5hex(d._2.toLowerCase.replaceAll("\\s+", " ").trim))
      .map { case (_, ds) => ds.map(_._1).min -> ds.map(_._1).toSet }
    def bucket(id: Long, t: String): String =
      if (!gatePass(t)) "quality_gate"
      else if (canon.exists { case (c, ms) => ms(id) && c < id }) "exact_dup"
      else if (nearDropped(id)) "near_dup"
      else "kept"
    val byBucket = docs.groupBy { case (id, t) => bucket(id, t) }
    val want = byBucket.map { case (b, ds) =>
      b -> ((ds.size.toLong,
        ds.count(d => gopherPass(d._2)).toLong,
        ds.map(d => tok(d._2)).sum,
        ds.collect { case d if gopherPass(d._2) => tok(d._2) }.sum))
    }

    // planted shape
    assert(bucket(0L, docs(0)._2) == "quality_gate")
    assert(bucket(2L, docs(2)._2) == "exact_dup")
    assert(bucket(4L, docs(4)._2) == "near_dup")
    assert(Seq(1L, 3L, 5L, 6L).forall(i => bucket(i, docs(i.toInt)._2) == "kept"))
    assert(gopherPass(docs(5)._2) && !gopherPass(docs(6)._2),
      "kept bucket must straddle the gopher verdict")

    val got = SparkEntry.queries("q149_drop_quality")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
      .toMap
    assert(got == want, s"got $got\nwant $want")
  }
}
