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
