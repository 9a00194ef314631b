package graft

import graft.functions.MinHashAgg
import org.apache.spark.sql.functions._

/** The typed Aggregator's signatures must equal the SQL/native-
  * expression min-agg formulation inside q21 (same hash family, same
  * min order). */
class MinHashAggSpec extends SparkSuite {

  test("MinHashAgg signature equals the minhash_longs min-agg signature") {
    graft.functions.MinHashLongs.register(spark)
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", substring($"text", 1, 200).as("t200"))
      .filter(length($"t200") >= 5)
    val sh = docs.select($"doc_id",
      explode(expr("transform(sequence(1, length(t200)-4), i -> substring(t200, i, 5))")).as("g"))
      .distinct()

    // SQL/native formulation (as in q21)
    val sqlSig = sh.select($"doc_id", expr("minhash_longs(g, 8)").as("hs"))
      .groupBy($"doc_id")
      .agg(min($"hs".getItem(0)).as("m1"),
        (2 to 8).map(j => min($"hs".getItem(j - 1)).as(s"m$j")): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to 8).map(j => r.getLong(j)).toVector)
      .toMap

    // typed Aggregator formulation
    val agg = new MinHashAgg(8).toColumn
    val typedSig = sh.as[(Long, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("sig"))
      .collect()
      .map { case (id, sig) => id -> sig.toVector }
      .toMap

    assert(typedSig === sqlSig)
  }
}
