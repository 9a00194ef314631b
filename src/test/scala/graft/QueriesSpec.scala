package graft

/** Smoke + cross-implementation checks for the registered queries on the
  * sf0.001 testdata (full oracle equivalence is the driver's DuckDB gate;
  * local equivalent: tools/check_oracle.py at sf0.01).
  */
class QueriesSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("every registered query runs and the oracle-backed ones are non-trivial") {
    SparkEntry.allQueries.foreach { q =>
      val n = q.run(spark, sf).count()
      withClue(q.name) { assert(n >= 0) }
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL exists for every SQL-expressible query and names match") {
    val names = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
  }

  test("generic MR wordcount equals declarative wordcount") {
    val declarative = SparkEntry.queries("q15_wordcount")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val generic = SparkEntry.queries("q19_mr_wordcount")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(generic === declarative)
  }
}
