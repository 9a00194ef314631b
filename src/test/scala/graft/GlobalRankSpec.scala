package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ops.GlobalRank: the distributed two-phase total-order rank must
  * agree exactly with the single-partition window form, while keeping
  * the data spread over many partitions (the point of the op).
  */
class GlobalRankSpec extends SparkSuite {

  test("two-phase rank equals single-window row_number, stays multi-partition") {
    import spark.implicits._
    // keys with heavy ties (v = i % 97) force the doc-id tiebreak; the
    // values are deliberately not in input order
    val df = (0 until 5000).map(i => ((i * 131) % 5000, (i * 7919) % 97)).toDF("id", "v")

    val ranked = graft.ops.GlobalRank.withRank(
      df, Seq($"v".desc, $"id".asc), "g_rank", numPartitions = 8)

    val expected = df
      .withColumn("g_rank", row_number().over(Window.orderBy($"v".desc, $"id".asc)).cast("long"))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap

    val got = ranked.collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(got.size === 5000)
    assert(got === expected)

    // physical shape: the ranked frame must still be spread over the
    // requested partitions — no single-partition concentration
    assert(ranked.rdd.getNumPartitions === 8,
      s"expected 8 partitions, got ${ranked.rdd.getNumPartitions}")
    val perPart = ranked.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.count(_ > 0) >= 4, s"rows concentrated: ${perPart.toSeq}")
  }
}
