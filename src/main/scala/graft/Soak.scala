package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak: run the named queries ONCE each at a larger scale
  * factor, recording wall seconds, shuffle read/write bytes, and
  * memory/disk spill — the first empirical datapoint behind
  * SCALING.md's extrapolations (round-9 verdict ask #7: any
  * super-linear blowup from sf0.1 must be named with its stage).
  *
  * `runMain graft.Soak <sfDir> <outJson> [q1,q2,...]` — defaults to
  * the round-9 top-10 most expensive operators.
  *
  * Soak data: [[buildScaled]] (`runMain graft.Soak build <srcSf>
  * <destDir> <k>`) replicates a driver-generated documents table k×
  * with doc_id offsets that are multiples of 3800 =
  * lcm(4, 8, 10, 19, 25) — every doc_id-modulus convention in the
  * registry (drop side `% 10`, eval set `% 19`, anchors `% 25`,
  * batch splits `% 4` / `% 8`) keeps its
  * proportions — and a per-replica text salt PREFIX so replicas are
  * near-dup-shaped rather than exact clones (an exact 10-way clone of
  * every document would flood the LSH buckets with degenerate
  * all-pairs mass no real 10× corpus has; a salted prefix shifts
  * winnow positions and minhash prefixes the way fresh text does).
  */
object Soak {

  val Top10: Seq[String] = Seq(
    "q131_contrastive_triplets", "q86_substring_dup_coverage",
    "q107_incremental_winnow", "q108_exactsubstr_removal",
    "q105_incremental_clusters", "q100_curation_pipeline",
    "q129_lex_search", "q85_dedup_apply", "q38_simhash_pairs",
    "q94_ngram_novelty")

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Replicate `srcSf/documents.parquet` k× into
    * `destDir/documents.parquet` (see scaladoc for the salt/offset
    * contract). Other tables are copied by reference only if a soak
    * query needs them — the top-10 set reads documents only.
    */
  def buildScaled(spark: SparkSession, srcSf: String, destDir: String, k: Int): Unit = {
    val docs = spark.read.parquet(s"$srcSf/documents.parquet")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    // lcm(4, 8, 10, 25, 19) = 3800: the 19 covers q137/q141's eval-set
    // convention (doc_id % 19 = 7) — an offset that shifts residues
    // mod 19 would turn salted replicas of eval docs into corpus docs
    // and flood the decontam queries with artificial collisions
    val offset = ((maxId / 3800) + 1) * 3800
    val scaled = (0 until k).map { r =>
      if (r == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(r * offset))
        .withColumn("text", concat(lit(s"rep$r salt "), col("text")))
    }.reduce(_ unionByName _)
    scaled.repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$destDir/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    if (args.nonEmpty && args(0) == "build") {
      val spark = session()
      buildScaled(spark, args(1), args(2), args(3).toInt)
      println(s"[soak] built ${args(2)} at ${args(3)}x of ${args(1)}")
      spark.stop()
      return
    }
    val sfDir = args(0)
    val outJson = args(1)
    val names = if (args.length > 2) args(2).split(",").toSeq else Top10
    val spark = session()
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val memSpill = new java.util.concurrent.atomic.AtomicLong
    val diskSpill = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
        }
      }
    })
    def drain(): Unit = org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)

    // warm scan planning once so the first query doesn't absorb it
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    val rows = names.map { n =>
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      drain()
      val (sr0, sw0, ms0, ds0) =
        (shufRead.get(), shufWrite.get(), memSpill.get(), diskSpill.get())
      val t0 = System.nanoTime()
      val outcome =
        try { Right(SparkEntry.queries(n)(spark, sfDir).count()) }
        catch { case e: Throwable => Left(e.toString.take(200)) }
      val sec = (System.nanoTime() - t0) / 1e9
      drain()
      // full JSON string escaping: Spark exception messages routinely
      // carry newlines and backslashes (multi-line plan fragments) —
      // a raw embed would corrupt the artifact exactly when the error
      // field matters
      def jstr(s: String): String =
        "\"" + s.flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case '\n' => "\\n"
          case '\r' => "\\r"
          case '\t' => "\\t"
          case c if c < ' ' => f"\\u${c.toInt}%04x"
          case c => c.toString
        } + "\""
      val m = Map(
        "sec" -> Bench.fmt(sec, "%.3f"),
        "shuffle_read_b" -> (shufRead.get() - sr0).toString,
        "shuffle_write_b" -> (shufWrite.get() - sw0).toString,
        "mem_spill_b" -> (memSpill.get() - ms0).toString,
        "disk_spill_b" -> (diskSpill.get() - ds0).toString,
        "rows" -> outcome.fold(_ => "null", _.toString),
        "error" -> outcome.fold(e => jstr(e), _ => "null"))
      System.err.println(s"[soak] $n: ${m("sec")}s rows=${m("rows")} " +
        s"shufW=${m("shuffle_write_b")} spillD=${m("disk_spill_b")}")
      n -> m
    }
    val json = rows.map { case (n, m) =>
      "\"" + n + "\":{" + m.map { case (k, v) =>
        "\"" + k + "\":" + v
      }.mkString(",") + "}"
    }.mkString(s"""{"sf":"$sfDir","queries":{""", ",", "}}")
    Files.writeString(Paths.get(outJson), json + "\n")
    println(s"[soak] wrote $outJson")
    spark.stop()
  }
}
