package graft

import java.nio.file.Files

import graft.core.MrlCtl

/** The mrl-ctl analog end-to-end: submit runs a named workload through
  * the CLI entry, and status/jobs answer from the scheduler's
  * statusTracker (the reference asks its coordinator the same
  * questions).
  */
class ControlPlaneSpec extends SparkSuite {

  test("submit CLI runs wc and status/jobs report scheduler state") {
    val in = Files.createTempDirectory("ctl-in")
    val out = Files.createTempDirectory("ctl-out").resolve("wc")
    Files.writeString(in.resolve("a.txt"), "the quick brown fox the end\n")
    Files.writeString(in.resolve("b.txt"), "the lazy dog\n")

    val reg = MrlCtl.trackJobs(spark)
    MrlCtl.main(Array(
      "submit", "--workload", "wc",
      "--input", in.toString + "/*.txt",
      "--output", out.toString,
      "--partitions", "2"))

    import scala.jdk.CollectionConverters._
    val lines = Files.list(out).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .filter(_.nonEmpty)
      .toSeq
    val counts = lines.map { l =>
      val i = l.lastIndexOf(' ')
      l.substring(0, i) -> l.substring(i + 1).toLong
    }.toMap
    assert(counts("the") === 3L)
    assert(counts("fox") === 1L)

    // the session this suite owns answered the reports during submit;
    // query them directly too — jobs must include completed entries
    val status = MrlCtl.statusReport(spark)
    assert(status.contains("workers"), status)
    val jobs = MrlCtl.jobsReport(spark, reg)
    assert("job \\d+: SUCCEEDED".r.findFirstIn(jobs).isDefined, jobs)
    assert(!jobs.contains("FAILED"), jobs)
  }

  test("job queue drains FIFO past a failing job, reports FAILED, and cleans its output") {
    val in = Files.createTempDirectory("ctlq-in")
    val outRoot = Files.createTempDirectory("ctlq-out")
    Files.writeString(in.resolve("a.txt"), "alpha beta alpha\n")

    val q = new MrlCtl.JobQueue(spark)
    val ok1 = q.submit("wc", in.toString + "/*.txt", outRoot.resolve("ok1").toString)
    val bad = q.submit("wc", "/nonexistent-ctlq-path/*.txt", outRoot.resolve("bad").toString)
    val ok2 = q.submit("grep", in.toString + "/*.txt", outRoot.resolve("ok2").toString,
      aux = Seq("alpha"))
    assert(Seq(ok1, bad, ok2) === Seq(0, 1, 2), "queue ids are FIFO submit order")
    assert(q.state(bad) === "QUEUED")

    q.runAll()

    assert(q.state(ok1) === "COMPLETED")
    assert(q.state(bad) === "FAILED")
    assert(q.state(ok2) === "COMPLETED", "queue must keep draining after a failure")
    assert(!Files.exists(outRoot.resolve("bad")), "failed job's partial output must be cleaned")
    assert(Files.list(outRoot.resolve("ok1")).iterator().hasNext)
    val report = q.report
    assert(report.startsWith("3 jobs"), report)
    assert(report.linesIterator.toSeq(1).contains("COMPLETED"), report)
    assert(report.linesIterator.toSeq(2).contains("FAILED"), report)
  }

  test("a job exceeding its timeout is cancelled, cleaned, and the queue keeps draining") {
    val in = Files.createTempDirectory("ctlt-in")
    val outRoot = Files.createTempDirectory("ctlt-out")
    Files.writeString(in.resolve("a.txt"), "gamma delta gamma\n")

    val q = new MrlCtl.JobQueue(spark)
    val slowOut = outRoot.resolve("slow").toString
    // a genuinely slow SPARK job (tasks sleep far past the deadline):
    // the watchdog's cancelJobGroup(interruptOnCancel) must abort it
    // mid-task — the 2s-timeout job would otherwise run ~100s
    val slow = q.submitBody("slow-sleep", in.toString, slowOut, Some(2L)) { () =>
      val s = spark
      s.range(0, 8, 1, 8).rdd.foreach { _ => Thread.sleep(100000) }
      s.range(1).write.mode("overwrite").parquet(slowOut)
    }
    val after = q.submit("wc", in.toString + "/*.txt", outRoot.resolve("after").toString)

    val t0 = System.nanoTime()
    q.runAll()
    val elapsedSec = (System.nanoTime() - t0) / 1e9

    assert(q.state(slow) === "FAILED", "timed-out job must land FAILED")
    assert(q.state(after) === "COMPLETED", "queue must keep draining after a timeout")
    assert(elapsedSec < 60.0,
      f"timeout did not abort the sleeping tasks: drain took $elapsedSec%.1f s")
    assert(!Files.exists(java.nio.file.Path.of(slowOut)),
      "timed-out job's partial output must be cleaned")
    assert(Files.list(outRoot.resolve("after")).iterator().hasNext)

    // an untimed (and an under-deadline) job is untouched by the
    // watchdog machinery — the group/timer attach only when asked
    val quick = q.submit("wc", in.toString + "/*.txt",
      outRoot.resolve("quick").toString, timeoutSec = Some(300L))
    q.runAll()
    assert(q.state(quick) === "COMPLETED")
  }

  test("failure cleanup never deletes a pre-existing output directory") {
    val outRoot = Files.createTempDirectory("ctlq-pre")
    val pre = outRoot.resolve("existing")
    Files.createDirectory(pre)
    Files.writeString(pre.resolve("keep.txt"), "precious\n")

    val q = new MrlCtl.JobQueue(spark)
    val bad = q.submit("wc", "/nonexistent-ctlq-path2/*.txt", pre.toString)
    q.runAll()

    assert(q.state(bad) === "FAILED")
    assert(Files.exists(pre.resolve("keep.txt")),
      "cleanup deleted data the failed job never wrote")
  }
}
