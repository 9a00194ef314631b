package graft

import graft.ops.{HllState, Layouts}
import org.apache.spark.sql.functions._

/** HLL register state at rest: increment ≡ rebuild is BIT equality on
  * the merged register table (registers are deterministic functions
  * of the value set), re-adding a batch is a no-op (max-merge
  * idempotence — the property that spares this state the own-child
  * replay exclusion the other maintainers need), compaction preserves
  * the merged table while squashing children, and the cardinality
  * estimate hits the standard error bounds in both the raw and the
  * linear-counting range.
  */
class HllStateSpec extends SparkSuite {

  private def regsOf(dir: String): Set[(String, Long, Int)] =
    HllState.merged(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet

  private def estOf(dir: String): Map[String, Double] =
    HllState.estimate(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("incremental adds ≡ full rebuild, bit-for-bit on the register table") {
    import spark.implicits._
    import java.nio.file.Files
    val vals = (1 to 30000)
      .map(i => (s"k${i % 3}", s"value-$i-${i * 2654435761L}")).toDF("key", "v")
    val inc = Files.createTempDirectory("hll-inc").toString
    val full = Files.createTempDirectory("hll-full").toString
    HllState.save(vals.filter($"v".substr(7, 1) =!= "1"), inc, "key", "v")
    HllState.add(vals.filter($"v".substr(7, 1) === "1" && $"key" =!= "k2"),
      inc, "key", "v", batchId = Some(0L))
    HllState.add(vals.filter($"v".substr(7, 1) === "1" && $"key" === "k2"),
      inc, "key", "v", batchId = Some(1L))
    HllState.save(vals, full, "key", "v")
    assert(regsOf(inc) == regsOf(full), "incremental registers diverge from rebuild")

    // re-adding an already-folded batch (same or new child id) is a
    // no-op: max-merge is idempotent
    val before = regsOf(inc)
    HllState.add(vals.filter($"v".substr(7, 1) === "1" && $"key" === "k2"),
      inc, "key", "v", batchId = Some(1L))
    assert(regsOf(inc) == before)
    HllState.add(vals.filter($"key" === "k0"), inc, "key", "v", batchId = Some(2L))
    assert(regsOf(inc) == before, "re-added values changed the registers")

    // compaction max-merges the children down to one, same table
    assert(Layouts.liveChildren(spark, s"$inc/regs").size > 1)
    HllState.compact(spark, inc)
    assert(Layouts.liveChildren(spark, s"$inc/regs").size == 1)
    assert(regsOf(inc) == before, "compaction changed the merged registers")
    // and the folded child holds the MERGED row count (not the concat)
    assert(Layouts.readChildren(spark, s"$inc/regs",
      "key STRING, reg BIGINT, rho INT").count() == before.size)
  }

  test("StreamDistinct plumbing: streamed drops ≡ rebuild, restart replays nothing") {
    import spark.implicits._
    import java.nio.file.Files
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select($"doc_id", $"lang".as("key"), $"text".as("v"))
    val stateDir = Files.createTempDirectory("hll-stream").toString
    val srcDir = Files.createTempDirectory("hll-src").toString
    // freeze the precision over the first third, stream the rest
    HllState.save(docs.filter($"doc_id" < 170), stateDir, "key", "v")
    def runOnce(): Unit = {
      val src = spark.readStream.schema(docs.schema).parquet(srcDir)
      val q = graft.streaming.StreamDistinct.start(src, stateDir, "key", "v")
      q.processAllAvailable()
      q.stop()
    }
    docs.filter($"doc_id" >= 170 && $"doc_id" < 340)
      .write.mode("append").parquet(srcDir)
    runOnce()
    docs.filter($"doc_id" >= 340).write.mode("append").parquet(srcDir)
    runOnce()
    val full = Files.createTempDirectory("hll-stream-ref").toString
    HllState.save(docs, full, "key", "v")
    assert(regsOf(stateDir) == regsOf(full),
      "streamed registers diverge from a full rebuild")
    assert(estOf(stateDir) == estOf(full))
  }

  test("estimates: ~1.6% σ in the raw range, near-exact linear counting below it") {
    import spark.implicits._
    import java.nio.file.Files
    // raw range: 40k distinct per key >> 2.5·m = 10240
    val big = (1 to 40000).map(i => ("k", s"item-$i")).toDF("key", "v")
    val dirB = Files.createTempDirectory("hll-big").toString
    HllState.save(big, dirB, "key", "v")
    val eb = estOf(dirB)("k")
    assert(math.abs(eb - 40000) / 40000.0 < 0.05,
      s"raw-range estimate $eb off by ${math.abs(eb - 40000) / 400.0}%")

    // linear-counting range: 100 distinct
    val small = (1 to 100).map(i => ("k", s"item-$i")).toDF("key", "v")
    val dirS = Files.createTempDirectory("hll-small").toString
    HllState.save(small, dirS, "key", "v")
    val es = estOf(dirS)("k")
    assert(math.abs(es - 100) <= 5, s"linear-counting estimate $es for 100 distinct")

    // duplicates never move an estimate (set semantics)
    val dup = big.union(big).union(small.withColumn("key", lit("k")))
    val dirD = Files.createTempDirectory("hll-dup").toString
    HllState.save(dup, dirD, "key", "v")
    val full = (1 to 40000).map(i => ("k", s"item-$i")).toDF("key", "v")
    val dirF = Files.createTempDirectory("hll-dupref").toString
    HllState.save(full, dirF, "key", "v")
    assert(estOf(dirD)("k") == estOf(dirF)("k"))
  }
}
