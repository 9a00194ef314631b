package graft

import org.apache.spark.sql.functions._

class DebugRankSpec extends SparkSuite {
  test("q83 through the Verify write path") {
    import spark.implicits._
    val df = SparkEntry.queries("q83_global_rank")(spark, "/root/testdata/sf0.01")
    df.coalesce(1).write.mode("overwrite").parquet("/tmp/debug_rank.parquet")
    val back = spark.read.parquet("/tmp/debug_rank.parquet")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val expected = graft.Sql.table(spark, "/root/testdata/sf0.01", "documents")
      .select($"doc_id", $"n_chars")
      .withColumn("g_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"n_chars".desc, $"doc_id".asc)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val bad = back.filter { case (k, v) => expected(k) != v }
    println(s"DEBUGRANK mismatches=${bad.size} sample=${bad.take(5)}")
    assert(bad.isEmpty)
  }
}
