package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The decode step is a clearly-marked deterministic STUB — this
  * container has no media libraries — but the Spark-side plumbing is
  * real and tested: schema, binary column handling, partition batch
  * shape, and the mapPartitions feature-extraction contract match what
  * a real decoder (ffmpeg/PIL behind the same iterator signature) would
  * plug into. At 100 TB: records are read with the `binaryFile` source
  * or from parquet binary columns; decode is per-partition with bounded
  * memory (one media blob at a time, iterator-to-iterator, no
  * collect); partitioning by size via maxPartitionBytes keeps batches
  * even; features (small fixed-size vectors) shuffle instead of raw
  * media wherever possible.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, media: Array[Byte], mime_hint: String)
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      mime: String,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  implicit val recEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
  implicit val frameEnc: Encoder[(Long, Int, Int)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.scalaInt)

  /** STUB decoder: a real implementation would hand `media` to an image/
    * audio codec here. This fake derives deterministic "dimensions" and
    * an 8-dim "feature vector" from the bytes so the pipeline is fully
    * testable; the iterator-in/iterator-out shape (one blob in flight,
    * constant memory) is the real contract.
    */
  def decodeBatch(batch: Iterator[MediaRecord]): Iterator[MediaFeatures] =
    batch.map { r =>
      val n = r.media.length
      var h = 1125899906842597L
      var i = 0
      while (i < math.min(n, 1024)) { h = 31 * h + r.media(i); i += 1 }
      val feature = Array.tabulate(8) { d =>
        val z = h ^ (0x9E3779B97F4A7C15L * (d + 1))
        ((z % 1000L).toFloat / 1000.0f)
      }
      MediaFeatures(
        doc_id = r.doc_id,
        n_bytes = n.toLong,
        mime = r.mime_hint,
        width = 16 + (math.abs(h) % 1024).toInt,
        height = 16 + (math.abs(h >> 10) % 1024).toInt,
        n_frames = 1 + (n / 256),
        feature = feature)
    }

  /** Feature extraction over a (doc_id, media, mime_hint) frame. */
  def extractFeatures(df: DataFrame): Dataset[MediaFeatures] =
    df.as[MediaRecord].mapPartitions(decodeBatch _)

  /** Frame sampling stub: every `stride`-th chunk of the blob stands in
    * for a video frame; real impl would seek keyframes.
    */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame =
    df.as[MediaRecord].flatMap { r =>
      val n = math.max(r.media.length / 256, 1)
      (0 until n by stride).map(f => (r.doc_id, f, math.min(256, r.media.length)))
    }.toDF("doc_id", "frame_no", "frame_bytes")
}
