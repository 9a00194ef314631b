package graft

import graft.ops.SkyState
import org.apache.spark.sql.functions._

/** SkyState/StreamSkyline: incremental frontier ≡ batch rebuild
  * bit-for-bit across ordered drops, a replayed drop is a no-op, the
  * geometry freeze rejects mismatched state dirs, and the real
  * readStream → foreachBatch plumbing converges to the same frontier.
  */
class StreamSkylineSpec extends SparkSuite {

  private val rnd = new scala.util.Random(19)
  private val rows: Seq[(Long, Long, Long)] =
    (1L to 300L).map(id => (id, rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))

  private def brute(rs: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    def dom(a: (Long, Long, Long)) = rs.exists(b =>
      b._2 >= a._2 && b._3 >= a._3 && (b._2 > a._2 || b._3 > a._3))
    rs.filterNot(dom).toSet
  }

  private def stateOf(dir: String): Set[(Long, Long, Long)] =
    SkyState.skyline(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("increment ≡ rebuild across three drops; replayed drop is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("skystate").toString
    val df = rows.toDF("id", "x", "y")
    SkyState.save(df.filter($"id" % 3 === 0), dir, "id", Seq("x", "y"))
    SkyState.add(df.filter($"id" % 3 === 1), dir)
    assert(stateOf(dir) ==
      brute(rows.filter(r => r._1 % 3 == 0 || r._1 % 3 == 1)),
      "mid-stream frontier diverged from the rebuild")
    SkyState.add(df.filter($"id" % 3 === 2), dir)
    assert(stateOf(dir) == brute(rows), "final frontier diverged")
    // replay: the last drop re-delivered — state must not move
    val committed = stateOf(dir)
    SkyState.add(df.filter($"id" % 3 === 2), dir)
    assert(stateOf(dir) == committed, "replayed drop changed the frontier")
  }

  test("real plumbing: parquet-source stream converges to the frontier") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("skystream").toString
    val srcDir = java.nio.file.Files.createTempDirectory("skysrc").toString
    val df = rows.toDF("id", "x", "y")
    df.write.mode("overwrite").parquet(srcDir)
    SkyState.save(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), df.schema),
      dir, "id", Seq("x", "y"))
    val src = spark.readStream.schema(df.schema).parquet(srcDir)
    val q = graft.streaming.StreamSkyline.start(src, dir)
    q.processAllAvailable()
    q.stop()
    assert(stateOf(dir) == brute(rows))
  }

  test("geometry freeze: mismatched state dir is rejected loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("skygeom").toString
    intercept[IllegalArgumentException] {
      SkyState.add(rows.take(3).toDF("id", "x", "y"), dir)
    }
  }
}
