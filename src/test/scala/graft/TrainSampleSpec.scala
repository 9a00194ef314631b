package graft

import graft.ops.{IvfIndex, PqIndex, TrainSample}
import org.apache.spark.sql.functions._

/** The sampled-training path the Ivf/Pq scaladocs promise for 100 TB:
  * the content-addressed sample is identical under any partitioning,
  * sampled training stays deterministic run-over-run, and a quantizer
  * trained on a quarter of the corpus still ranks well enough to pass
  * the recall bar.
  */
class TrainSampleSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.01"

  private def vectors = Sql.table(spark, dir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("the training sample is partitioning-independent and deterministic") {
    import spark.implicits._
    def ids(df: org.apache.spark.sql.DataFrame) =
      TrainSample.sample(df, 256).select($"vec_id").as[Long].collect().toSeq
    val base = ids(vectors)
    assert(base.length === 256)
    assert(base.distinct.length === 256)
    // same sample back from a completely different physical layout
    assert(ids(vectors.repartition(7, $"vec_id")) === base)
    assert(ids(vectors.repartition(3)) === base)
    // content-addressed, not "lowest ids": the sample is spread over
    // the id space, not the first 256 rows
    assert(base.max > 256L)
  }

  test("PQ training on a sample is deterministic and keeps recall") {
    import spark.implicits._
    val m1 = PqIndex.train(vectors, m = 8, k = 16, dim = 64, iters = 4, trainSample = 800)
    val m2 = PqIndex.train(vectors, m = 8, k = 16, dim = 64, iters = 4, trainSample = 800)
    assert(m1.centroids.flatten.flatten.toSeq === m2.centroids.flatten.flatten.toSeq)

    // recall of ADC ranking under the sampled codebook vs exact cosine
    val all = vectors.as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val recalls = (0L until 5L).map { qid =>
      val q = all.find(_._1 == qid).get._2
      val exact = all.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(q, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      val nq = PqIndex.normalize(q)
      val tab = m1.distTable(nq)
      val adc = all.filter(_._1 != qid).map { case (id, v) =>
        val code = m1.encode(PqIndex.normalize(v))
        var d = 0.0
        var mi = 0
        while (mi < code.length) { d += tab(mi)(code(mi)); mi += 1 }
        (id, d)
      }.sortBy { case (id, d) => (d, id) }.take(100).map(_._1)
      // exact re-rank of the 100-shortlist, as the query path does
      val top = adc.map(id => (id, cos(q, all.find(_._1 == id).get._2)))
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      (top & exact).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"sampled-training mean recall@10 = $mean%.2f")
    assert(mean >= 0.6, f"sampled codebook recall collapsed: $mean%.2f")
  }

  test("IVF training on a sample is deterministic and assigns every vector") {
    val c1 = IvfIndex.train(vectors, k = 16, iters = 3, dim = 64, trainSample = 800)
    val c2 = IvfIndex.train(vectors, k = 16, iters = 3, dim = 64, trainSample = 800)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
    assert(c1.nonEmpty && c1.length <= 16)
    // the sampled quantizer still partitions the FULL corpus sanely
    val idx = IvfIndex.index(vectors, c1)
    val cells = idx.groupBy(col("cell")).count().collect()
    assert(cells.map(_.getLong(1)).sum === vectors.count())
    assert(cells.length > 1, "sampled quantizer collapsed to one cell")
  }
}
