package graft

import org.scalatest.funsuite.AnyFunSuite

/** Exercises straggler speculation for real (reference F10,
  * `mrl-coordinator/src/job_queue.rs:405-695`): SpeculationDemo stands
  * up a standalone master + two single-core workers on distinct
  * loopback hosts, runs a 16-task job whose attempt 0 of one partition
  * stalls 120 s, and proves the config-only claim — the speculation
  * thread flags the straggler, the copy launches on the other host,
  * wins, and the original is killed. Forked as a subprocess: the demo
  * owns its own SparkContext (master URL + speculation confs are
  * context-creation-time), which cannot coexist with the suites'
  * shared local session.
  */
class SpeculationSpec extends AnyFunSuite {

  test("spark.speculation=true races a straggler; the speculative copy wins and the original is killed") {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val pb = new ProcessBuilder(
      javaBin, "-Xmx1g", "-cp", sys.props("java.class.path"), "graft.core.SpeculationDemo")
    pb.redirectErrorStream(true)
    pb.redirectOutput(new java.io.File("/tmp/speculation-spec.log"))
    val p = pb.start()
    // generous wall budget: under a contended box, master/worker forks
    // and executor registration alone can eat minutes — the demo's own
    // internal timer (elapsed_sec) is what proves the race was fast
    assert(p.waitFor(480, java.util.concurrent.TimeUnit.SECONDS),
      "speculation demo did not finish in 480s (see /tmp/speculation-spec.log)")
    assert(p.exitValue() === 0, "demo failed (see /tmp/speculation-spec.log)")

    val out = scala.io.Source.fromFile("/tmp/speculation-spec.log").getLines().toSeq
    val json = out.reverse.find(_.startsWith("""{"speculative""""))
      .getOrElse(fail(s"no result line in demo output:\n${out.takeRight(20).mkString("\n")}"))
    val fields = """"(\w+)":([0-9.]+)""".r.findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    assert(fields("speculative") >= 1, s"no speculative task submitted: $json")
    assert(fields("killed") >= 1, s"losing attempt was not killed: $json")
    assert(fields("sum") === 136.0, s"race double-counted or dropped a partition: $json")
    assert(fields("retry_sum") === 136.0,
      s"task-retry leg (injected first-attempt failure) did not recover exactly: $json")
    // unraced, the straggler alone sleeps 120 s — the race must finish
    // well under that. Half the sleep (60 s) still separates cleanly
    // (an unraced run CANNOT beat 120 s) while tolerating a loaded box
    // slowing the fast tasks and the speculation scan itself.
    assert(fields("elapsed_sec") < graft.core.SpeculationDemo.StragglerMillis / 1000.0 / 2,
      s"speculation did not shortcut the straggler: $json")
  }
}
