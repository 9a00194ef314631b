package graft.core

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerSpeculativeTaskSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Demonstrates straggler speculation — the reference's largest
  * control-plane feature (`mrl-coordinator/src/job_queue.rs:405-695`:
  * race a second copy of a slow task, keep the winner, kill the loser)
  * — as Spark CONFIG, not code: `spark.speculation=true` plus the
  * interval/quantile/multiplier knobs.
  *
  * Two deployment facts force the shape of this demo:
  *  - TaskSchedulerImpl only starts the speculation thread on a
  *    non-local backend, so `local[*]` can never speculate;
  *  - the scheduler refuses to place a speculative copy on the same
  *    HOST as the running attempt (racing on the slow node is
  *    pointless), so `local-cluster[...]` — whose workers all report
  *    `localhost` — submits speculative tasks but can never launch one.
  *
  * So the demo stands up the smallest cluster where the race is real: a
  * standalone master on 127.0.0.1 and two worker JVMs pinned to
  * distinct loopback addresses (SPARK_LOCAL_HOSTNAME=127.0.0.2/.3 —
  * two "hosts" to the scheduler, one machine in fact). The straggler is
  * attempt-dependent (attempt 0 of one partition stalls; any other
  * attempt runs clean), modeling a slow node. Expected run: 15 fast
  * tasks drain, the speculation thread flags the straggler, the copy
  * lands on the OTHER host, wins, and the original is TaskKilled
  * ("another attempt succeeded") — job completes in seconds, exact sum,
  * no double-count.
  *
  * Prints one JSON line:
  *   {"speculative":N,"killed":K,"sum":S,"elapsed_sec":T}
  * SpeculationSpec forks this main and asserts N ≥ 1, K ≥ 1, S exact,
  * T well under the straggler's unraced sleep. SCALING.md cites it as
  * the evidence behind the "speculation is config" claim.
  */
object SpeculationDemo {

  /** Unraced, the straggler sleeps this long — success is finishing in
    * a small fraction of it. */
  val StragglerMillis = 120000L

  /** A currently-free ephemeral port (hermetic against other listeners
    * — a fixed 7077 would silently attach to a foreign master). */
  private def freePort(): Int = {
    val ss = new java.net.ServerSocket(0)
    try ss.getLocalPort finally ss.close()
  }

  private def fork(cls: String, args: Seq[String], host: String): Process = {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val cp = sys.props("java.class.path")
    val pb = new ProcessBuilder(
      (Seq(javaBin, "-Xmx768m", "-cp", cp, cls) ++ args): _*)
    pb.environment().put("SPARK_LOCAL_HOSTNAME", host)
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    pb.redirectOutput(new java.io.File(s"/tmp/specdemo-${cls.split('.').last}-$host.log"))
    pb.start()
  }

  private def awaitPort(port: Int, timeoutMs: Long): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var up = false
    while (!up && System.nanoTime() < deadline) {
      try {
        val s = new java.net.Socket("127.0.0.1", port)
        s.close(); up = true
      } catch { case _: java.io.IOException => Thread.sleep(200) }
    }
    require(up, s"port $port not up after ${timeoutMs}ms")
  }

  def run(): (Int, Int, Long, Double, Long) = {
    val procs = scala.collection.mutable.ListBuffer.empty[Process]
    try {
      val port = freePort()
      val masterUrl = s"spark://127.0.0.1:$port"
      val master = fork("org.apache.spark.deploy.master.Master",
        Seq("--host", "127.0.0.1", "--port", port.toString, "--webui-port", "0"), "127.0.0.1")
      procs += master
      awaitPort(port, 120000)
      require(master.isAlive, "forked master died (see /tmp/specdemo-Master-*.log)")
      val workRoot = java.nio.file.Files.createTempDirectory("specdemo-work").toString
      for (host <- Seq("127.0.0.2", "127.0.0.3"))
        procs += fork("org.apache.spark.deploy.worker.Worker",
          Seq(masterUrl, "--host", host, "--cores", "1", "--memory", "1g",
            "--webui-port", "0", "--work-dir", s"$workRoot/$host"), host)

      val spark = SparkSession.builder()
        .master(masterUrl)
        .appName("graft-speculation-demo")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.speculation", "true")
        .config("spark.speculation.interval", "100ms")
        .config("spark.speculation.multiplier", "1.5")
        .config("spark.speculation.quantile", "0.5")
        .config("spark.ui.enabled", "false")
        .config("spark.executor.memory", "700m")
        // ship the build's classes to the worker-spawned executor JVMs
        .config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .getOrCreate()
      val sc = spark.sparkContext
      sc.setLogLevel("WARN")
      val speculative = new AtomicInteger(0)
      val killed = new AtomicInteger(0)
      sc.addSparkListener(new SparkListener {
        override def onSpeculativeTaskSubmitted(e: SparkListenerSpeculativeTaskSubmitted): Unit =
          speculative.incrementAndGet()
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
          if (e.reason.toString.startsWith("TaskKilled")) killed.incrementAndGet()
      })
      val stragglerMs = StragglerMillis
      // wait until both workers' executors register: elapsed must time
      // the RACE, not cluster spin-up (under box load the executor JVMs
      // can take tens of seconds to come up, which previously billed
      // the race timer and flaked the elapsed bound)
      val execDeadline = System.nanoTime() + 120L * 1000000000L
      while (sc.statusTracker.getExecutorInfos.length < 3 && // driver + 2
             System.nanoTime() < execDeadline)
        Thread.sleep(200)
      val t0 = System.nanoTime()
      val sum = sc.parallelize(1 to 16, 16).map { i =>
        // attempt 0 of partition 0 is the straggler; sleep in slices so
        // the kill (thread interrupt) lands promptly once the
        // speculative attempt wins the race
        if (i == 1 && TaskContext.get().attemptNumber() == 0) {
          var slept = 0L
          while (slept < stragglerMs) { Thread.sleep(100); slept += 100 }
        }
        i.toLong
      }.sum().toLong
      val elapsed = (System.nanoTime() - t0) / 1e9
      // failure-handling leg (reference F13, jobs.rs failure states):
      // one task THROWS on its first attempt; the scheduler reschedules
      // it (spark.task.maxFailures default 4) and the job still
      // completes with the exact sum — retry semantics by run, not
      // claim. Distinct from the race above: this attempt dies, it is
      // not out-raced.
      val retrySum = sc.parallelize(1 to 16, 16).map { i =>
        if (i == 2 && TaskContext.get().attemptNumber() == 0)
          throw new RuntimeException("injected first-attempt failure")
        i.toLong
      }.sum().toLong
      // let the async bus deliver the final kill/end events — under
      // box contention delivery can lag well past any fixed sleep, so
      // poll the counters instead of sleeping a fixed second
      val evDeadline = System.nanoTime() + 30L * 1000000000L
      while ((speculative.get() < 1 || killed.get() < 1) &&
             System.nanoTime() < evDeadline)
        Thread.sleep(200)
      val result = (speculative.get(), killed.get(), sum, elapsed, retrySum)
      spark.stop()
      result
    } finally {
      procs.reverse.foreach(_.destroy())
      procs.foreach(_.waitFor(10, java.util.concurrent.TimeUnit.SECONDS))
      procs.foreach(p => if (p.isAlive) p.destroyForcibly())
    }
  }

  def main(args: Array[String]): Unit = {
    val (spec, kill, sum, elapsed, retrySum) = run()
    println(s"""{"speculative":$spec,"killed":$kill,"sum":$sum,"elapsed_sec":$elapsed,"retry_sum":$retrySum}""")
    if (spec < 1 || kill < 1 || sum != 136L || retrySum != 136L) sys.exit(1)
  }
}
