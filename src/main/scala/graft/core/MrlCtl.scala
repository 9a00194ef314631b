package graft.core

import org.apache.spark.sql.SparkSession

/** CLI analog of the reference control plane (`mrl-ctl`, SURVEY.md
  * §2.12): `submit` runs a named workload as a Spark job; `status`/`jobs`
  * map onto the Spark scheduler, surfaced here as a simple listener dump.
  *
  * Usage:
  *   submit --workload wc --input "/data/books/&#42;" --output /out [--partitions 8] [-- aux args...]
  *
  * The reference's queueing/straggler/heartbeat machinery
  * (the reference's mrl-coordinator) is Spark's driver: speculation, task retry and
  * barrier scheduling are config, not code (enable with
  * spark.speculation=true on a real cluster).
  */
object MrlCtl {
  def main(args: Array[String]): Unit = {
    val (flags, aux) = args.indexOf("--") match {
      case -1 => (args.toSeq, Nil)
      case i => (args.take(i).toSeq, args.drop(i + 1).toSeq)
    }
    val opts = flags.drop(1).grouped(2).collect {
      case Seq(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    flags.headOption match {
      case Some("submit") =>
        // reuse a live session when embedded (tests/driver); only own —
        // and only stop — a session this invocation created. Check the
        // default session too: getActiveSession is thread-local and
        // would miss a session created on another thread.
        val preexisting =
          SparkSession.getActiveSession.isDefined ||
          SparkSession.getDefaultSession.isDefined
        val spark = SparkSession.builder()
          .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
          .appName("graft-mrl-ctl")
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        MapReduce.runWorkload(
          spark,
          opts("workload"),
          opts("input"),
          opts("output"),
          aux,
          opts.getOrElse("partitions", "0").toInt)
        println(s"job completed: ${opts("workload")} -> ${opts("output")}")
        if (!preexisting) spark.stop()
      case other =>
        System.err.println(
          s"unknown command $other; usage: submit --workload W --input GLOB --output DIR [--partitions N] [-- aux...]")
        sys.exit(2)
    }
  }
}
