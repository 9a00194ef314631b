package graft

import graft.ops.{CmsState, Layouts}
import org.apache.spark.sql.functions._

/** Count-Min counter state at rest (q123's machinery): increment ≡
  * rebuild is BIT equality on the merged counter table (counters are
  * deterministic functions of the value multiset), a replayed batch id
  * is a no-op (idempotent child overwrite — sum-merge itself is NOT
  * idempotent, the layout carries the replay safety), compaction
  * sum-folds children without changing the merged table, and point
  * estimates obey the one-sided CMS bound against exact counts.
  */
class CmsStateSpec extends SparkSuite {

  private def cntsOf(dir: String): Map[(String, Int, Long), Long] =
    CmsState.merged(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap

  // zipf-ish multiset: token t_i appears ~ 2000/i times, two keys
  private def corpus = {
    import spark.implicits._
    (1 to 60).flatMap { i =>
      (0 until (2000 / i)).map(n => (s"k${n % 2}", s"tok_$i"))
    }.toDF("key", "v")
  }

  test("incremental adds ≡ full rebuild; replayed batch id is a no-op; compact preserves") {
    import spark.implicits._
    import java.nio.file.Files
    val vals = corpus.localCheckpoint()
    val inc = Files.createTempDirectory("cms-inc").toString
    val full = Files.createTempDirectory("cms-full").toString
    // split into base + two drops by a value hash, rebuild from all
    val h = expr("CAST(conv(substr(md5(concat(v, key)), 1, 4), 16, 10) AS BIGINT) % 3")
    CmsState.save(vals.filter(h === 0), inc, "key", "v", d = 4, w = 256)
    CmsState.add(vals.filter(h === 1), inc, "key", "v", batchId = Some(0L))
    CmsState.add(vals.filter(h === 2), inc, "key", "v", batchId = Some(1L))
    CmsState.save(vals, full, "key", "v", d = 4, w = 256)
    assert(cntsOf(inc) == cntsOf(full), "incremental counters diverge from rebuild")

    // replaying a batch id rewrites its own child with identical rows:
    // the sum over children is unchanged (sum-merge alone would
    // double-count — the layout is what makes this safe)
    val before = cntsOf(inc)
    CmsState.add(vals.filter(h === 2), inc, "key", "v", batchId = Some(1L))
    assert(cntsOf(inc) == before, "replayed batch id changed the counters")

    // compaction folds the children to one, same merged table
    assert(Layouts.liveChildren(spark, s"$inc/cnts").size > 1)
    CmsState.compact(spark, inc)
    assert(Layouts.liveChildren(spark, s"$inc/cnts").size == 1)
    assert(cntsOf(inc) == before, "compaction changed the merged counters")
    assert(Layouts.readChildren(spark, s"$inc/cnts",
      "key STRING, j INT, c BIGINT, cnt BIGINT").count() == before.size)
  }

  test("StreamCms plumbing: streamed drops ≡ rebuild bit-for-bit across a restart") {
    import spark.implicits._
    import java.nio.file.Files
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select($"doc_id", $"lang".as("key"), $"text".as("v"))
    val stateDir = Files.createTempDirectory("cms-stream").toString
    val srcDir = Files.createTempDirectory("cms-src").toString
    // freeze the geometry over the first third, stream the rest in two
    // runs — the second resumes from the sink checkpoint
    CmsState.save(docs.filter($"doc_id" < 170), stateDir, "key", "v", d = 4, w = 256)
    def runOnce(): Unit = {
      val src = spark.readStream.schema(docs.schema).parquet(srcDir)
      val q = graft.streaming.StreamCms.start(src, stateDir, "key", "v")
      q.processAllAvailable()
      q.stop()
    }
    docs.filter($"doc_id" >= 170 && $"doc_id" < 340)
      .write.mode("append").parquet(srcDir)
    runOnce()
    docs.filter($"doc_id" >= 340).write.mode("append").parquet(srcDir)
    runOnce()
    val full = Files.createTempDirectory("cms-stream-ref").toString
    CmsState.save(docs, full, "key", "v", d = 4, w = 256)
    assert(cntsOf(stateDir) == cntsOf(full),
      "streamed counters diverge from a full rebuild")
  }

  test("point estimates: never undercount, overcount within the CMS bound, unseen ≈ 0") {
    import spark.implicits._
    import java.nio.file.Files
    val vals = corpus.localCheckpoint()
    val dir = Files.createTempDirectory("cms-est").toString
    CmsState.save(vals, dir, "key", "v", d = 4, w = 256)
    val exact = vals.groupBy($"key", $"v").agg(count(lit(1)).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nTotal = exact.filter(_._1._1 == "k0").values.sum // per-key stream size
    val items = ((1 to 60).map(i => ("k0", s"tok_$i")) :+ (("k0", "never_seen")))
      .toDF("key", "v")
    val est = CmsState.pointEstimate(spark, dir, items)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    est.foreach { case ((k, v), e) =>
      val ex = exact.getOrElse((k, v), 0L)
      assert(e >= ex, s"($k,$v): CMS undercounted $e < $ex")
      // E[overcount per row] = n/w; min over 4 rows — 16·n/w leaves
      // vast slack while still catching a broken hash ladder
      assert(e - ex <= 16L * nTotal / 256,
        s"($k,$v): overcount ${e - ex} beyond bound")
    }
  }
}
