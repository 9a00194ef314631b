package graft

/** q140_repeat_runs (longest consecutive repeated-token run): exact
  * agreement with a JVM replica on random degenerate text, plus
  * hand-counted anchors — a planted loop is found with its exact
  * start, clean text reports run 1 with the deterministic (token asc,
  * pos asc) tiebreak, and a run broken by one interloper does not
  * bridge.
  */
class RepeatRunsSpec extends SparkSuite {

  private def toks(t: String): Seq[String] =
    t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq

  private def replica(docs: Seq[(Long, String)]): Map[Long, (String, Long, Long)] =
    docs.flatMap { case (id, text) =>
      val ts = toks(text)
      if (ts.isEmpty) None
      else {
        // all maximal runs: (token, len, startPos 1-based)
        val runs = scala.collection.mutable.ListBuffer.empty[(String, Long, Long)]
        var i = 0
        while (i < ts.length) {
          var j = i
          while (j < ts.length && ts(j) == ts(i)) j += 1
          runs += ((ts(i), (j - i).toLong, (i + 1).toLong))
          i = j
        }
        Some(id -> runs.maxBy { case (w, len, pos) => (len, Reverse(w), -pos) })
      }
    }.toMap

  // orders Strings DESCENDING under maxBy (so ties pick token ASC)
  private case class Reverse(s: String) extends Ordered[Reverse] {
    def compare(that: Reverse): Int = that.s.compare(s)
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, (String, Long, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("runs").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    SparkEntry.queries("q140_repeat_runs")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("planted loops, broken runs, clean-text tiebreak — engine ≡ replica") {
    val docs = Seq(
      (0L, "normal text then the the the the the end"),        // run 5 at pos 4
      (1L, "ba ba ba zz ba ba"),                               // interloper: run 3, not 5
      (2L, "clean words only here"),                           // run 1, token asc → "clean"
      (3L, "xx xx yy yy"),                                     // tie on len → token asc "xx"
      (4L, ""))                                                // empty: no row
    val got = run(docs)
    assert(got(0L) == (("the", 5L, 4L)), got(0L))
    assert(got(1L) == (("ba", 3L, 1L)), got(1L))
    assert(got(2L) == (("clean", 1L, 1L)), got(2L))
    assert(got(3L) == (("xx", 2L, 1L)), got(3L))
    assert(!got.contains(4L))
    assert(got == replica(docs.filter(_._1 != 4L)))
  }

  test("random degenerate text ≡ replica exactly") {
    val r = new scala.util.Random(83)
    val pool = Seq("a", "b", "c")
    val docs = (0L until 60L).map { id =>
      // bursty generator: each step repeats one token 1–6 times
      val sb = new StringBuilder
      (0 until 8).foreach { _ =>
        val w = pool(r.nextInt(pool.length))
        (0 until 1 + r.nextInt(6)).foreach(_ => sb.append(w).append(' '))
      }
      (id, sb.toString.trim)
    }
    assert(run(docs) == replica(docs))
  }
}
