package graft

import graft.ops.Layouts
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The round-9 crash-protocol hardening of graft.ops.Layouts: a fold
  * bounded by beforeBatch leaves at-or-above children unfolded (the
  * replay-hygiene hole), readSidecar recovers a sidecar whose
  * writeSidecar crashed between delete and rename, and publish
  * restores a layout stranded between its two renames.
  */
class LayoutsSpec extends SparkSuite {

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeChild(root: String, name: String, xs: Seq[Long]): Unit = {
    import spark.implicits._
    xs.toDF("x").write.mode("overwrite").parquet(s"$root/$name")
  }

  private def rows(root: String): Map[String, Long] = {
    import spark.implicits._
    Layouts.liveChildren(spark, root)
      .map(p => p.getName -> spark.read.parquet(p.toString).count()).toMap
  }

  test("foldChildren with beforeBatch leaves at-or-above children unfolded") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("layouts-fold").toString + "/state"
    writeChild(root, "base", 1L to 10L)
    writeChild(root, "b0", 11L to 15L)
    writeChild(root, "b1", 16L to 18L)
    writeChild(root, "b2", 19L to 20L) // a crashed attempt's own child
    Layouts.foldChildren(spark, root, beforeBatch = Some(2L))
    val after = rows(root)
    // base/b0/b1 folded into one; b2 untouched under its OWN name, so
    // liveChildrenBefore(…, Some(2)) can still exclude it on replay
    assert(after.keySet.exists(_.startsWith("fold_")))
    assert(after.contains("b2"), s"b2 was folded away: ${after.keySet}")
    assert(after.values.sum == 20L)
    val replayView = Layouts
      .readChildren(spark, root, "x BIGINT", beforeBatch = Some(2L)).count()
    assert(replayView == 18L, s"replay view must exclude b2, saw $replayView rows")
  }

  test("readSidecar recovers from a crash between writeSidecar's delete and rename") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("layouts-sidecar").toString
    val p = new Path(s"$dir/_marker")
    val fs = fsOf(dir)
    Layouts.writeSidecar(fs, p, "7\n")
    // simulate the crash window: the NEXT write completed its tmp,
    // deleted the target, and died before the rename
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    out.write("8\n".getBytes("UTF-8")); out.close()
    fs.delete(p, false)
    assert(Layouts.readSidecar(fs, p).map(_.trim) == Some("8"),
      "reader must fall back to the complete .tmp")
    // a live target always wins over a fresher in-flight tmp
    Layouts.writeSidecar(fs, p, "9\n")
    val out2 = fs.create(tmp, true)
    out2.write("10\n".getBytes("UTF-8")); out2.close()
    assert(Layouts.readSidecar(fs, p).map(_.trim) == Some("9"))
  }

  test("writeSidecar promotes an orphaned committed .tmp before destroying anything") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("layouts-orphan").toString
    val p = new Path(s"$dir/_marker")
    val fs = fsOf(dir)
    // committed state lives ONLY in .tmp (a prior write crashed
    // between delete(p) and rename): a subsequent write must not
    // open a window where both are gone — if it crashed right after
    // deleting the orphan, the marker would be lost and a commit
    // guard would reset (the double-append hazard)
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    out.write("41\n".getBytes("UTF-8")); out.close()
    assert(!fs.exists(p))
    Layouts.writeSidecar(fs, p, "42\n")
    assert(Layouts.readSidecar(fs, p).map(_.trim) == Some("42"))
    // and the stage file never survives as debris the fallback
    // could ever trust
    assert(!fs.exists(new Path(p.getParent, p.getName + ".stage")))
  }

  test("publish recovers a layout stranded between its two renames") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("layouts-publish").toString
    val path = s"$dir/layout"
    (1L to 5L).toDF("x").write.parquet(path)
    val fs = fsOf(dir)
    // simulate the crash: original staged aside, replacement never in
    assert(fs.rename(new Path(path), new Path(path + "__compact_bak")))
    assert(!fs.exists(new Path(path)))
    Layouts.recoverPublished(spark, path)
    assert(spark.read.parquet(path).count() == 5L)
    // and publish itself self-recovers before staging a new compact
    assert(fs.rename(new Path(path), new Path(path + "__compact_bak")))
    (1L to 5L).toDF("x").repartition(1).write.parquet(path + "__compact_tmp")
    Layouts.publish(spark, path, path + "__compact_tmp")
    assert(spark.read.parquet(path).count() == 5L)
    assert(!fs.exists(new Path(path + "__compact_bak")))
  }

  test("adoptSchema widens pre-upgrade children with typed NULLs and resumes a crash") {
    import java.nio.file.Files
    import spark.implicits._
    val root = Files.createTempDirectory("layouts-adopt").toString + "/fps"
    val ddl = "fp STRING, doc_id BIGINT"
    // old layout: fp only (StreamCuration's pre-provenance DDL)
    Seq("a", "b").toDF("fp").write.parquet(s"$root/base")
    // pre-migration read fails exactly as the upgrade would (all-old
    // children; a MIXED root instead picks one file's schema
    // arbitrarily — either way adoptSchema is the repair)
    intercept[Exception] { Layouts.readChildren(spark, root, ddl).collect() }
    // a new-layout child already carrying provenance is left alone
    Seq(("c", 7L)).toDF("fp", "doc_id").write.parquet(s"$root/b1")

    Layouts.adoptSchema(spark, root, ddl)
    val got = Layouts.readChildren(spark, root, ddl).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got === Set(("a", -1L), ("b", -1L), ("c", 7L)))
    // idempotent: nothing left to widen
    Layouts.adoptSchema(spark, root, ddl)
    assert(Layouts.readChildren(spark, root, ddl).count() === 3L)

    // crash simulation: a child stranded in staging with a PARTIAL
    // rewrite at the original name — staging is the authority
    val fs = fsOf(root)
    Seq("d", "e", "f").toDF("fp").write.parquet(s"$root/__adopt_b2")
    Seq(("junk", 0L)).toDF("fp", "doc_id").write.parquet(s"$root/b2")
    Layouts.adoptSchema(spark, root, ddl)
    assert(!fs.exists(new Path(s"$root/__adopt_b2")))
    val b2 = spark.read.parquet(s"$root/b2").collect()
      .map(r => (r.getString(0), r.isNullAt(1))).toSet
    assert(b2 === Set(("d", true), ("e", true), ("f", true)),
      "resume must rewrite from staging, discarding the partial target")
  }
}
