package graft

import org.apache.spark.sql.functions._

class StatsSpec extends SparkSuite {

  test("approx_count_distinct is within 5% of exact per group") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q37_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"group $k: approx=$a exact=$e")
    }
  }

  test("approx_percentile tracks exact percentiles within tight relative error") {
    val sf = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q72_approx_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = SparkEntry.queries("q35_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    exact.foreach { case (k, (m, p90, p25)) =>
      val (am, ap90, ap25) = approx(k)
      // interpolation differences only — at accuracy 10000 the sketch
      // is near-exact on this cardinality
      assert(math.abs(am - m) / m < 0.02, s"$k median: $am vs $m")
      assert(math.abs(ap90 - p90) / p90 < 0.02, s"$k p90: $ap90 vs $p90")
      assert(math.abs(ap25 - p25) / p25 < 0.02, s"$k p25: $ap25 vs $p25")
    }
  }

  test("q72b histogram percentiles bracket the exact values by one bucket width") {
    // the state-as-data guarantee: the reported bucket lower bound is
    // ≤ the exact percentile, and the exact percentile is < lo + width
    val sf = "/root/testdata/sf0.01"
    val hist = SparkEntry.queries("q72b_percentile_histogram")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val exact = SparkEntry.queries("q35_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    exact.foreach { case (k, (m, p90, p25)) =>
      val (l50, l90, lp25) = hist(k)
      assert(l50 <= m && m < l50 + 5, s"$k p50: lo=$l50 exact=$m")
      assert(l90 <= p90 && p90 < l90 + 5, s"$k p90: lo=$l90 exact=$p90")
      assert(lp25 <= p25 && p25 < lp25 + 5000, s"$k p25: lo=$lp25 exact=$p25")
    }
  }

  private def asofFixture = {
    import spark.implicits._
    // key 1: event BEFORE its first order (must yield NULL asof, not an
    // ANSI INVALID_ARRAY_INDEX error), one event between orders, one
    // after both. key 2: no orders at all (unmatched key).
    val left = Seq(
      (10L, 1L, 5L), (11L, 1L, 25L), (12L, 1L, 99L), (13L, 2L, 50L)
    ).toDF("id", "k", "t")
    val right = Seq(
      (1L, 20L, 100L), (1L, 20L, 101L), (1L, 30L, 102L)
    ).toDF("k", "t", "seq")
    (left, right)
  }

  private def runAsof(strategy: String): Map[Long, Option[Long]] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val (left, right) = asofFixture
    val st = struct($"t".as("rt"), $"seq")
    val out = strategy match {
      case "packed" =>
        graft.ops.AsOfJoin.packedHistory(left, $"k", $"t", right, $"k", st, "rt")
      case "range" =>
        graft.ops.AsOfJoin.rangeWindow(left, $"k", $"t", $"id", right, $"k", st, "rt")
      case "auto-packed" =>
        graft.ops.AsOfJoin.auto(left, $"k", $"t", $"id", right, $"k", st, "rt",
          maxHistPerKey = 100L)
      case "auto-range" =>
        graft.ops.AsOfJoin.auto(left, $"k", $"t", $"id", right, $"k", st, "rt",
          maxHistPerKey = 1L) // any key with >1 history rows trips the fallback
    }
    out.select($"id", $"asof.seq".as("seq"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
  }

  test("as-of join: empty history yields NULL (no ANSI error) and strategies agree") {
    val expected = Map(
      10L -> None, // event before the customer's first order
      11L -> Some(101L), // tie on t=20 → larger seq wins (desc tiebreak)
      12L -> Some(102L),
      13L -> None) // key with no right-side rows
    for (s <- Seq("packed", "range", "auto-packed", "auto-range"))
      assert(runAsof(s) === expected, s"strategy $s")
  }

  test("auto's merge tier aligns mismatched time types instead of failing past the threshold") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // left time LONG, right time INT — the packed tier accepts this via
    // HOF implicit casts; the merge tier must cast rather than throw
    val left = Seq((1L, 1L, 25L)).toDF("id", "k", "t")
    val right = Seq((1L, 20), (1L, 30)).toDF("k", "rt")
    val out = graft.ops.AsOfJoin.auto(
        left, $"k", $"t", $"id", right, $"k",
        struct($"rt", $"rt".as("seq")), "rt", maxHistPerKey = 1L)
      .select($"id", $"asof.rt".as("rt")).collect()
    assert(out.length === 1 && out(0).getInt(1) === 20)
  }

  test("as-of strategies agree on real testdata (q39 packed vs q65 fallback)") {
    val sf = "/root/testdata/sf0.001"
    val packed = SparkEntry.queries("q39_asof_join")(spark, sf)
      .collect().map(_.toSeq).toSet
    val fallback = SparkEntry.queries("q65_asof_fallback")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(packed.nonEmpty)
    assert(packed === fallback)
  }
}
