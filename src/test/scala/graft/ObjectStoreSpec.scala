package graft

import java.net.URI
import java.nio.file.Files

import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.spark.sql.functions._

/** A Hadoop FileSystem with its own scheme, backed by local disk —
  * registered purely through configuration (`fs.mrlfs.impl`), exactly
  * how `s3a://` is wired (`fs.s3a.impl` + credentials). Test-only
  * scaffolding standing in for the reference's MinIO object store
  * (`common/src/minio.rs:119-361`) in a zero-egress container.
  */
class MrlTestFs extends RawLocalFileSystem {
  override def getScheme: String = "mrlfs"
  override def getUri: URI = URI.create("mrlfs:///")
}

/** Backs SCALING.md's "object-store paths are config, not code" claim
  * with a run instead of an assertion: every engine IO path (whole-file
  * glob read, text multipart write, parquet write/read) runs end-to-end
  * against a NON-file scheme that Spark only knows through
  * `fs.<scheme>.impl` — the engine itself contains no scheme-specific
  * branches, so pointing it at `s3a://` is the same one-line config.
  * Committer hygiene is asserted the way the reference's temp-cleanup
  * does it: job-commit leaves part files + _SUCCESS and no _temporary.
  * (S3A additionally swaps in its magic/staging committer — also
  * config; rename-based commit semantics are NOT claimed here.)
  */
class ObjectStoreSpec extends SparkSuite {

  private def fsRoot() = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mrlfs.impl", classOf[MrlTestFs].getName)
    Files.createTempDirectory("mrlfs-root").toString
  }

  test("wc workload runs end-to-end on the mrlfs:// scheme with clean commit") {
    val root = fsRoot()
    // write the inputs through the scheme's own FS API (covers create)
    val fs = new org.apache.hadoop.fs.Path(s"mrlfs://$root")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.isInstanceOf[MrlTestFs], s"scheme not wired: ${fs.getClass}")
    for ((name, text) <- Seq("a.txt" -> "hello object store hello\n", "b.txt" -> "store of objects\n")) {
      val out = fs.create(new org.apache.hadoop.fs.Path(s"mrlfs://$root/in/$name"))
      out.write(text.getBytes("UTF-8")); out.close()
    }

    graft.core.MapReduce.runWorkload(
      spark, "wc", s"mrlfs://$root/in/*.txt", s"mrlfs://$root/out", Nil, 2)

    import scala.jdk.CollectionConverters._
    val outDir = java.nio.file.Paths.get(root, "out")
    val files = Files.list(outDir).iterator().asScala.map(_.getFileName.toString).toSeq
    assert(files.exists(_.startsWith("part-")), files.toString)
    assert(files.contains("_SUCCESS"), s"no commit marker: $files")
    assert(!files.exists(_.contains("_temporary")), s"committer left temp state: $files")
    val counts = Files.list(outDir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => Files.readAllLines(p).asScala).filter(_.nonEmpty)
      .map { l => val i = l.lastIndexOf(' '); l.substring(0, i) -> l.substring(i + 1).toLong }
      .toMap
    assert(counts("hello") === 2L)
    assert(counts("store") === 2L)
  }

  test("parquet round-trips through mrlfs:// with pushdown intact") {
    val root = fsRoot()
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"row$i", i * 1.5)).toDF("id", "name", "v")
    df.write.parquet(s"mrlfs://$root/t.parquet")

    val back = spark.read.parquet(s"mrlfs://$root/t.parquet").filter($"id" > 90)
    assert(back.count() === 10)
    // filters/pruning reach the scan on this scheme like any other
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)]"), plan)

    import scala.jdk.CollectionConverters._
    val files = Files.list(java.nio.file.Paths.get(root, "t.parquet"))
      .iterator().asScala.map(_.getFileName.toString).toSeq
    assert(files.contains("_SUCCESS") && !files.exists(_.contains("_temporary")), files.toString)
  }
}
