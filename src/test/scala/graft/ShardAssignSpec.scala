package graft

import org.apache.spark.sql.functions._

/** graft.queries.TrainPrep.shardAssign (q121): exact ±0/±1 shard
  * balance by construction, rank = a permutation in content-addressed
  * hash order, round-robin consistency, and invariance under input
  * partitioning (the property rand()-based shuffles lack).
  */
class ShardAssignSpec extends SparkSuite {

  test("ranks are 1..n, shards exactly balanced, round-robin consistent") {
    val rows = SparkEntry.queries("q121_shard_assign")(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = rows.length
    assert(rows.map(_._3).sorted.toSeq == (1L to n.toLong).toSeq)
    rows.foreach { case (_, _, rk, sh) => assert(sh == (rk - 1) % 16) }
    val sizes = rows.groupBy(_._4).values.map(_.length)
    assert(sizes.max - sizes.min <= 1, s"shard skew: $sizes")
    // rank order is (h, doc_id) order
    val sorted = rows.sortBy(r => (r._2, r._1))
    assert(sorted.map(_._3).toSeq == (1L to n.toLong).toSeq)
  }

  test("assignment invariant under input partitioning") {
    import spark.implicits._
    val docs = (0L until 257L).toDF("doc_id")
    val a = graft.queries.TrainPrep.shardAssign(docs, 8, 4)
      .collect().map(_.toSeq).toSet
    val b = graft.queries.TrainPrep.shardAssign(docs.repartition(11), 8, 3)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    // 257 docs over 8 shards: sizes 33/32 exactly
    val sizes = a.groupBy(_.apply(3)).values.map(_.size).toSeq.sorted
    assert(sizes == Seq(32, 32, 32, 32, 32, 32, 32, 33))
  }
}
