package graft.queries

import graft.Q
import graft.Sql._
import graft.ops.{AnnIndex, Multimodal}
import org.apache.spark.sql.functions._

/** Non-SQL-expressible extension operators (driver records rows-only
  * checks): the LSH ANN scale path and the multimodal decode pipeline.
  * Their correctness is covered by ScalaTest instead: AnnSpec checks
  * recall against the exact q25 baseline; MultimodalSpec checks the
  * decode contract.
  */
object Extensions {

  val all: Seq[Q] = Seq(
    // LSH-bucketed ANN (scale path of q25): sign-random-projection
    // buckets + multiprobe + codegen'd exact re-rank.
    Q(
      "q33_ann_lsh",
      (s, dir) => {
        import s.implicits._
        val e = table(s, dir, "embeddings")
        AnnIndex.topK(
          s,
          e.select($"vec_id", $"embedding"),
          e.filter($"vec_id" < 5).select($"vec_id", $"embedding"),
          k = 10)
      },
      None),

    // Multimodal feature extraction: binary media column → typed
    // metadata + fixed-size feature vector via per-partition decode.
    Q(
      "q34_multimodal_features",
      (s, dir) => {
        import s.implicits._
        val media = table(s, dir, "documents").select(
          $"doc_id",
          encode($"text", "UTF-8").as("media"),
          lit("text/plain").as("mime_hint"))
        Multimodal.extractFeatures(media).toDF()
      },
      None)
  )
}
