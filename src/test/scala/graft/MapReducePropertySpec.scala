package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.core.{KeyValue, MapReduce, WorkloadRegistry}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants of the generic MapReduce surface, driven by
  * ScalaCheck generators with fixed seeds (the scalatest/scalacheck
  * bridge artifact isn't available offline, so samples are drawn
  * directly).
  */
class MapReducePropertySpec extends SparkSuite {

  import MapReduce._

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val docGen = Gen.listOf(wordGen).map(_.mkString(" "))
  private val corpusGen = Gen.listOfN(5, docGen)

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("wc totals equal input token count and are partition-invariant") {
    samples(corpusGen, 5).foreach { docs =>
      val input = spark.createDataset(
        docs.zipWithIndex.map { case (d, i) => KeyValue.utf8(s"f$i", d) })(kvEncoder)

      def run(n: Int): Map[String, Long] =
        MapReduce.run(WorkloadRegistry.wc, input, Nil, n)
          .collect().toSeq.map(new String(_, UTF_8).trim)
          .filter(_.nonEmpty)
          .map { l => val i = l.lastIndexOf(' '); l.substring(0, i) -> l.substring(i + 1).toLong }
          .toMap

      val r1 = run(1)
      val r3 = run(3)
      assert(r1 === r3)

      val expectedTotal = docs.flatMap(_.split("[^\\p{L}]+")).count(_.nonEmpty).toLong
      assert(r1.values.sum === expectedTotal)
    }
  }

  test("map emission count is preserved through the shuffle (vertex-degree)") {
    val edgeGen = Gen.listOf(Gen.zip(Gen.choose(0L, 50L), Gen.choose(0L, 50L)))
    samples(edgeGen, 5).foreach { edges =>
      val content = edges.map { case (a, b) => s"$a $b" }.mkString("\n")
      val input = spark.createDataset(Seq(KeyValue.utf8("edges", content)))(kvEncoder)
      val out = MapReduce.run(WorkloadRegistry.vertexDegree, input)
        .collect().toSeq.map(new String(_, UTF_8).trim).filter(_.nonEmpty)
      val degSum = out.map(_.split(", deg=")(1).toLong).sum
      assert(degSum === 2L * edges.length)
    }
  }
}
