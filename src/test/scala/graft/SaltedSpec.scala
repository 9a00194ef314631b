package graft

import graft.ops.Salted
import org.apache.spark.sql.functions._

class SaltedSpec extends SparkSuite {

  test("salted aggregation equals direct aggregation on a skewed key") {
    import spark.implicits._
    // heavily skewed: 90% of rows share one key
    val df = spark.range(0, 100000)
      .select(when($"id" % 10 < 9, lit(0L)).otherwise($"id" % 100).as("k"),
        lit(1.0).as("v"))

    val direct = df.groupBy($"k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Salted.saltedCount(df, $"k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted === direct)

    val directSum = df.groupBy($"k").agg(sum($"v")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val saltedSum = Salted.saltedSum(df, $"k", $"v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(saltedSum === directSum)
  }

  test("GraftExtensions wires cosine_sim into a SparkSessionExtensions instance") {
    // a session built with these extensions resolves cosine_sim in SQL;
    // the shared test session already exists, so exercise the injection
    // callback directly (builder-path coverage) plus the SQL surface via
    // the per-session fallback registration
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(exts) // must not throw
    graft.functions.CosineSim.register(spark)
    val sim = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").collect()(0).getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
  }
}
