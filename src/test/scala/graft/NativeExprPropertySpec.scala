package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Generative parity checks for the native expressions: whatever the
  * generator produces, the codegen'd expression must agree bit-for-bit
  * with the builtin-function formulation it replaces.
  */
class NativeExprPropertySpec extends SparkSuite {

  test("minhash_longs equals the md5-prefix formulation on generated strings") {
    graft.functions.MinHashLongs.register(spark)
    import spark.implicits._
    val gen = Gen.listOfN(200, Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.alphaNumStr,
      Gen.listOf(Gen.oneOf("α", "β", "界", "🙂", "|", "\n", "\\", "'", " "))
        .map(_.mkString)))
    val inputs = gen.sample.getOrElse(Nil).distinct
    assert(inputs.nonEmpty)
    val both = inputs.toDF("g").select(
      expr("minhash_longs(g, 8)").as("hs"),
      array((1 to 8).map(j =>
        expr(s"CAST(conv(substr(md5(concat('$j', '|', g)), 1, 15), 16, 10) AS BIGINT)")): _*).as("ref"))
      .collect()
    both.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("cosine_sim equals the aggregate(zip_with) fold on generated vectors") {
    graft.functions.CosineSim.register(spark)
    import spark.implicits._
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1000f, 1000f))
    val pairs = Gen.listOfN(100, Gen.zip(vecGen, vecGen)).sample.getOrElse(Nil)
      .map { case (a, b) => (a.toArray, b.toArray) }
    assert(pairs.nonEmpty)
    val both = pairs.toDF("ea", "eb").select(
      expr("cosine_sim(ea, eb)").as("native"),
      expr("aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        + " / (sqrt(aggregate(zip_with(ea, ea, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
        + " * sqrt(aggregate(zip_with(eb, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)))").as("hof"))
      .collect()
    both.foreach { r =>
      val (n, h) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToLongBits(n) === java.lang.Double.doubleToLongBits(h))
    }
  }
}
