package graft

import graft.ops.PageRank
import org.apache.spark.sql.functions._

/** The round-15 optimization merged tree levels 2+3 of the PageRank/
  * HITS reduction tree into one single-pass fold (PageRank.fold23).
  * The contract: for a seg-ascending list of (seg, v) partials, the
  * fold must reproduce the EXACT IEEE op sequence of the unrolled
  * form — per 64-segment block, bsum = fold(0.0, v in seg order);
  * total = fold(0.0, bsum in blk order) — bit-for-bit. (PageRankSpec's
  * tier-equality test pins this on real corpus data; this spec pins
  * the expression itself on adversarial shapes: empty, one entry, one
  * block, block boundaries, gapped blocks, values whose sum order
  * matters in IEEE.)
  */
class Fold23Spec extends SparkSuite {

  /** The ORIGINAL two-level association, evaluated on the driver. */
  private def reference(xs: Seq[(Long, Double)]): Double = {
    val byBlk = xs.sortBy(_._1).groupBy(_._1 / 64).toSeq.sortBy(_._1)
    var tot = 0.0
    byBlk.foreach { case (_, entries) =>
      var bsum = 0.0
      entries.sortBy(_._1).foreach { case (_, v) => bsum += v }
      tot += bsum
    }
    tot
  }

  private def viaSql(xs: Seq[(Long, Double)]): Double = {
    import spark.implicits._
    val df =
      if (xs.isEmpty)
        // global agg over an empty frame still emits one row with an
        // empty collected list — the dangling-mass empty-set shape
        Seq((0L, 0.0)).toDF("seg", "ssum").filter(lit(false))
      else xs.toDF("seg", "ssum")
    df.agg(sort_array(collect_list(struct(col("seg"), col("ssum")))).as("xs"))
      .select(expr(PageRank.fold23("ssum")).as("v"))
      .collect()(0).getDouble(0)
  }

  private def check(xs: Seq[(Long, Double)]): Unit =
    assert(
      java.lang.Double.doubleToLongBits(viaSql(xs)) ==
        java.lang.Double.doubleToLongBits(reference(xs)),
      s"fold23 mismatch on $xs: ${viaSql(xs)} vs ${reference(xs)}")

  test("empty list folds to +0.0 (the empty dangling set)") {
    val v = viaSql(Nil)
    assert(java.lang.Double.doubleToLongBits(v) ==
      java.lang.Double.doubleToLongBits(0.0))
  }

  test("single entry, single block") { check(Seq(5L -> 0.123)) }

  test("several entries inside one block") {
    check(Seq(0L -> 0.1, 1L -> 0.2, 63L -> 0.4))
  }

  test("entries straddling a block boundary") {
    check(Seq(62L -> 0.1, 63L -> 0.2, 64L -> 0.4, 65L -> 0.8))
  }

  test("gapped blocks across the full 0..4095 segment range") {
    check(Seq(0L -> 1e-17, 63L -> 1.0, 64L -> 1e-17, 300L -> 0.5,
      4000L -> 1e300, 4095L -> 1e-300))
  }

  test("order-sensitive doubles: association grouping is the contract") {
    // (a+b)+c differs from a+(b+c) for these values, so a fold that
    // grouped differently would change bits — the exact risk the
    // merged expression must not introduce
    check(Seq(1L -> 1e16, 2L -> 1.0, 3L -> -1e16,
      70L -> 0.1, 71L -> 0.2, 130L -> 0.7))
  }
}
