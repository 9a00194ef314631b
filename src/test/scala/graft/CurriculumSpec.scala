package graft

import org.apache.spark.sql.functions._

/** q237_curriculum_order: the easy→hard ordering is real (phase
  * difficulty ranges are monotone), the token accounting is exact
  * (last cumulative = corpus total; phase shares respect the 20/60/20
  * cuts within one document's tokens), and the global prefix sum never
  * degenerates into a one-partition Window (the GlobalRank contract).
  */
class CurriculumSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("phases are difficulty-monotone with exact token accounting") {
    val df = SparkEntry.queries("q237_curriculum_order")(spark, dir)
      .localCheckpoint()
    val total = df.agg(sum("n_tokens")).head().getLong(0)
    assert(df.agg(max("cum_tokens")).head().getLong(0) === total)
    // all three phases occur and their difficulty ranges are monotone
    val rng = df.groupBy("phase")
      .agg(min("difficulty_q").as("lo"), max("difficulty_q").as("hi"),
        sum("n_tokens").as("tok"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rng.keySet === Set("warmup", "main", "final"))
    assert(rng("warmup")._2 <= rng("main")._1 ||
      rng("warmup")._2 <= rng("main")._2, "warmup is the easy end")
    assert(rng("warmup")._1 <= rng("main")._1)
    assert(rng("main")._1 <= rng("final")._1 && rng("main")._2 <= rng("final")._2)
    // phase cuts respect the exact 20/60/20 boundaries: every warmup
    // row satisfies cum*5 <= total, etc. (the flag definition itself)
    assert(df.filter("phase = 'warmup' AND cum_tokens * 5 > " + total)
      .count() === 0)
    assert(df.filter(s"phase = 'main' AND cum_tokens * 5 > ${total} * 4")
      .count() === 0)
    assert(df.filter(s"phase = 'final' AND cum_tokens * 5 <= ${total} * 4")
      .count() === 0)
    // cum is a genuine prefix sum of n_tokens in (difficulty, doc_id)
    // order: re-sort and compare against a driver-side running sum
    val rows = df.select("difficulty_q", "doc_id", "n_tokens", "cum_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    var run = 0L
    rows.foreach { case (_, _, nt, cum) => run += nt; assert(cum === run) }
    df.unpersist()
  }

  test("no one-partition Window on the global prefix-sum path") {
    val df = SparkEntry.queries("q237_curriculum_order")(spark, dir)
    df.collect()
    assertNoWindowExec(df)
  }
}
