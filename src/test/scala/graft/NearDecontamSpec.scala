package graft

import org.apache.spark.sql.functions._

/** q141_near_decontam (paraphrased-benchmark leakage via verified
  * LSH): planted near-copies of eval docs are flagged with the right
  * partner and count, verbatim-different corpus docs are not, and the
  * output is exactly the engine's own verified pair stream (pinned
  * independently by LshSpec/LshCalibrationSpec) restricted to
  * eval×corpus pairs and ranked.
  */
class NearDecontamSpec extends SparkSuite {

  // ids 7 and 26 are the eval side (doc_id % 19 = 7)
  private def fixture = {
    val a = ("the quick brown fox jumps over the lazy dog again and again " * 4).take(220)
    val b = ("entirely different benchmark prose about spark shuffles and plans " * 4).take(220)
    Seq(
      (7L, a),                         // eval
      (26L, b),                        // eval
      (1L, a.take(200) + " tiny tail"),// near-copy of 7 → flagged
      (2L, b.take(200) + " same tail"),// near-copy of 26 → flagged
      (3L, "unrelated text with its own words entirely " +
        (1 to 25).map(i => s"w$i").mkString(" ")))
  }

  private def run(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("neardecon").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    (dir, SparkEntry.queries("q141_near_decontam")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap)
  }

  test("planted near-copies flagged with partner and count; clean docs not") {
    import spark.implicits._
    val (dir, got) = run(fixture)
    assert(got.keySet == Set(1L, 2L), s"flagged: $got")
    assert(got(1L)._2 == 7L && got(1L)._1 == 1L, got(1L))
    assert(got(2L)._2 == 26L && got(2L)._1 == 1L, got(2L))
    assert(got(1L)._3 >= 0.35 && got(2L)._3 >= 0.35)

    // composition check: exactly the engine's verified pair stream
    // restricted to cross pairs, best partner by (jac desc, id asc)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pairs = graft.queries.Llm
      .minhashLshPairs(docs, graft.queries.Llm.lshMaxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val cross = pairs.flatMap { case (d1, d2, j) =>
      (d1 % 19 == 7, d2 % 19 == 7) match {
        case (true, false) => Some((d2, d1, j))
        case (false, true) => Some((d1, d2, j))
        case _ => None
      }
    }
    val want = cross.groupBy(_._1).map { case (doc, xs) =>
      val best = xs.minBy { case (_, ev, j) => (-j, ev) }
      doc -> ((xs.length.toLong, best._2, best._3))
    }
    assert(got == want, s"got $got\nwant $want")
  }
}
