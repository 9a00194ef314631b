package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evidence run for the q182/ops.Smb claim "the shuffle is paid once
  * at layout-build and amortized over every later join": replicate
  * orders+lineitem k×, then time the same per-order revenue join+agg
  * (q182's shape, no key filter — the full fact-fact join) two ways:
  *
  *  - PLAIN: parquet scans, shuffled sort-merge join every run;
  *  - SMB: one timed bucketed layout build, then the zero-exchange
  *    zero-sort merge join per run.
  *
  * Three timed runs each (min reported, the Bench discipline), plus
  * the build cost — the break-even read: build/(plain−smb) runs.
  * Broadcast disabled for the joins (a fact-fact join at scale is
  * never broadcastable; letting AQE broadcast the 10× orders side
  * here would measure the wrong plan).
  *
  * `runMain graft.SmbBench <sfDir> <k> <outJson>`
  */
object SmbBench {

  def main(args: Array[String]): Unit = {
    val Array(sfDir, kStr, outJson) = args.take(3)
    val k = kStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // k× replication; orderkey offset keeps replicas disjoint
    val ord0 = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val off = ord0.agg(max($"o_orderkey")).head().getLong(0) + 1
    def rep(df: DataFrame, key: String): DataFrame =
      (0 until k).map(r => df.withColumn(key, col(key) + lit(r * off)))
        .reduce(_ unionAll _)
    val scaled = java.nio.file.Files.createTempDirectory("smbbench").toString
    rep(ord0, "o_orderkey").write.mode("overwrite")
      .parquet(s"$scaled/orders.parquet")
    rep(li0, "l_orderkey").write.mode("overwrite")
      .parquet(s"$scaled/lineitem.parquet")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def revenueAgg(li: DataFrame, ord: DataFrame): DataFrame =
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderkey")
        .agg(count(lit(1)).cast("long").as("n_items"),
          max($"o_custkey").as("o_custkey"),
          sum(graft.Sql.discPrice($"l_extendedprice", $"l_discount"))
            .as("rev"))

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    def best3(f: => Long): (Double, Long) = {
      val rs = (1 to 3).map { _ => System.gc(); Thread.sleep(200); timed(f) }
      (rs.map(_._1).min, rs.head._2)
    }

    // PLAIN: shuffled SMJ per run
    val (plainSec, plainRows) = best3 {
      revenueAgg(
        spark.read.parquet(s"$scaled/lineitem.parquet"),
        spark.read.parquet(s"$scaled/orders.parquet")).count()
    }

    // SMB: timed one-time layout build, then the co-located join
    val db = "graft_smbbench"
    val loc = java.nio.file.Files.createTempDirectory("smbbench-wh").toString
    val (buildSec, _) = timed {
      graft.ops.Smb.saveBucketed(
        spark.read.parquet(s"$scaled/orders.parquet"),
        db, loc, "orders_b", "o_orderkey", cpus.toInt * 2)
      graft.ops.Smb.saveBucketed(
        spark.read.parquet(s"$scaled/lineitem.parquet")
          .withColumnRenamed("l_orderkey", "o_orderkey"),
        db, loc, "lineitem_b", "o_orderkey", cpus.toInt * 2)
      0L
    }
    val (smbSec, smbRows) = best3 {
      revenueAgg(
        graft.ops.Smb.read(spark, db, "lineitem_b")
          .withColumnRenamed("o_orderkey", "l_orderkey"),
        graft.ops.Smb.read(spark, db, "orders_b")).count()
    }
    require(plainRows == smbRows, s"row mismatch: $plainRows vs $smbRows")

    val breakEven =
      if (plainSec > smbSec) buildSec / (plainSec - smbSec) else -1.0
    val json =
      s"""{"sf":"$sfDir","k":$k,"rows":$plainRows,""" +
        s""""plain_join_sec":${Bench.fmt(plainSec, "%.3f")},""" +
        s""""smb_build_sec":${Bench.fmt(buildSec, "%.3f")},""" +
        s""""smb_join_sec":${Bench.fmt(smbSec, "%.3f")},""" +
        s""""speedup":${Bench.fmt(plainSec / smbSec, "%.2f")},""" +
        s""""break_even_joins":${Bench.fmt(breakEven, "%.1f")}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
