package graft

import org.apache.spark.sql.functions._

/** Multimodal.imagePhash + the q195 banding: REAL raster transforms.
  * A planted scene survives resize, brightness shift, and PNG
  * re-encode within the hamming ≤ 5 near-dup threshold; a structurally
  * different scene lands far outside it; and the banded candidate path
  * (Lsh.simhashCandidates pigeonhole) finds EXACTLY the brute-force
  * popcount pairs — the q38 exactness property on the image domain.
  */
class ImagePhashSpec extends SparkSuite {

  import TestScenes.{sceneJpeg, scenePng}

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("JPEG takes the real route: lossy re-encode pairs with its PNG original") {
    import spark.implicits._
    val jpeg = sceneJpeg(7, 220, 120)
    val blobs: Seq[(Long, Array[Byte], String)] = Seq(
      (1L, scenePng(7, 220, 120), "image/png"),     // lossless original
      (2L, jpeg, "image/jpeg"),                     // JPEG re-encode, same raster
      (3L, sceneJpeg(7, 110, 60), "image/jpeg"),    // JPEG + resize, stacked transforms
      (4L, sceneJpeg(8, 220, 120), "image/jpeg"),   // DISTINCT scene as JPEG
      (5L, jpeg.take(40), "image/jpeg"))            // truncated: SOI magic, no scan data
    val got = graft.ops.Multimodal.imagePhash(
        blobs.toDF("doc_id", "media", "mime_hint"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

    (1L to 4L).foreach(id => assert(got(id)._2, s"blob $id must take the real route"))
    assert(!got(5L)._2, "truncated JPEG must fall back to the stub route")
    val p1 = got(1L)._1
    // the production near-dup claim: DCT quantization noise at q=0.85
    // stays inside the hamming-5 pairing band (block means move ≪ the
    // inter-block contrast the scene plants)
    assert(hamming(p1, got(2L)._1) <= 5, s"jpeg re-encode: ${hamming(p1, got(2L)._1)}")
    assert(hamming(p1, got(3L)._1) <= 5, s"jpeg+resize: ${hamming(p1, got(3L)._1)}")
    assert(hamming(p1, got(4L)._1) > 5,
      s"distinct scene must stay apart: ${hamming(p1, got(4L)._1)}")
    info(s"hamming vs PNG original: jpeg=${hamming(p1, got(2L)._1)} " +
      s"jpeg+resize=${hamming(p1, got(3L)._1)} distinct=${hamming(p1, got(4L)._1)}")
  }

  test("dHash catches resize / brightness / re-encode; distinct scenes stay apart") {
    import spark.implicits._
    val blobs: Seq[(Long, Array[Byte], String)] = Seq(
      (1L, scenePng(7, 220, 120), "image/png"),               // original
      (2L, scenePng(7, 110, 60), "image/png"),                // resized
      (3L, scenePng(7, 220, 120, brighten = 12), "image/png"),// brightness shift
      (4L, scenePng(7, 220, 120), "image/png"),               // re-encode (same raster)
      (5L, scenePng(8, 220, 120), "image/png"),               // DISTINCT scene
      (6L, "not an image at all, just text bytes".getBytes("UTF-8"), "text/plain"),
      (8L, scenePng(7, 231, 126), "image/png"))               // OFF-GRID resize
    val got = graft.ops.Multimodal.imagePhash(
        blobs.toDF("doc_id", "media", "mime_hint"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

    // routing: PNGs decode for real, the text blob stubs out
    ((1L to 5L) :+ 8L).foreach(id => assert(got(id)._2, s"PNG $id must take the real route"))
    assert(!got(6L)._2, "text blob must take the stub route")
    // every hash fits the 60-bit contract (bands cover all bits)
    got.values.foreach { case (p, _) => assert(p >= 0L && p < (1L << 60)) }

    val p1 = got(1L)._1
    assert(hamming(p1, got(2L)._1) <= 5, s"resize: ${hamming(p1, got(2L)._1)}")
    assert(hamming(p1, got(3L)._1) <= 5, s"brightness: ${hamming(p1, got(3L)._1)}")
    assert(hamming(p1, got(4L)._1) == 0, "re-encode of the same raster must hash identically")
    // off-grid dimensions straddle the 11 × 6 block boundaries — the
    // means shift, the ORDER (mostly) doesn't: the perceptual claim
    assert(hamming(p1, got(8L)._1) <= 5, s"off-grid resize: ${hamming(p1, got(8L)._1)}")
    assert(hamming(p1, got(5L)._1) > 5,
      s"distinct scenes must stay apart: ${hamming(p1, got(5L)._1)}")
    info(s"hamming vs original: resize=${hamming(p1, got(2L)._1)} " +
      s"offgrid=${hamming(p1, got(8L)._1)} brightness=${hamming(p1, got(3L)._1)} " +
      s"distinct=${hamming(p1, got(5L)._1)}")
  }

  test("banded candidate path ≡ brute-force popcount on a mixed real+stub frame") {
    import spark.implicits._
    val blobs: Seq[(Long, Array[Byte], String)] =
      Seq(
        (1L, scenePng(7, 220, 120), "image/png"),
        (2L, scenePng(7, 110, 60), "image/png"),
        (3L, scenePng(7, 220, 120, brighten = 12), "image/png"),
        (5L, scenePng(8, 220, 120), "image/png"),
        (7L, scenePng(8, 110, 60), "image/png")) ++
        (100L until 130L).map(i => (i, s"stub text blob number $i".getBytes("UTF-8"), "text/plain")) :+
        ((200L, "stub text blob number 100".getBytes("UTF-8"), "text/plain")) // exact stub dup
    val ph = graft.ops.Multimodal.imagePhash(
      blobs.toDF("doc_id", "media", "mime_hint")).localCheckpoint()

    val banded = graft.ops.Lsh.simhashCandidates(
        graft.ops.Multimodal.phashBands(ph),
        bandBits = graft.ops.Multimodal.PhashBandBits,
        subBands = graft.ops.Multimodal.PhashSubBands,
        subBits = graft.ops.Multimodal.PhashSubBits, maxBucket = 4)
      .withColumn("hamming", expr("CAST(bit_count(s1 ^ s2) AS BIGINT)"))
      .filter($"hamming" <= 5)
      .select($"d1", $"d2", $"hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val hashes = ph.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (d1, p1) <- hashes; (d2, p2) <- hashes
      if d1 < d2 && java.lang.Long.bitCount(p1 ^ p2) <= 5
    } yield (d1, d2, java.lang.Long.bitCount(p1 ^ p2).toLong)).toSet
    // pigeonhole exactness (incl. the hot-bucket sub-band path, forced
    // by maxBucket = 4): banded candidates lose NOTHING under the
    // threshold and verify away everything above it
    assert(banded === brute, s"banded ${banded.size} vs brute ${brute.size}")
    // the planted structure is actually in there: both scene groups
    // pair up internally, the stub dup pairs, and no cross-scene pair
    assert(banded.contains((1L, 2L, banded.find(t => t._1 == 1L && t._2 == 2L).get._3)))
    assert(banded.exists(t => t._1 == 5L && t._2 == 7L))
    assert(banded.contains((100L, 200L, 0L)))
    assert(!banded.exists(t => t._1 <= 3L && (t._2 == 5L || t._2 == 7L)),
      "distinct scenes must not pair")
  }

  test("incremental probe: a batch's transformed raster finds its corpus original") {
    import spark.implicits._
    // corpus: two scenes + stub noise; batch: a RESIZED copy of scene 7
    // and a brand-new scene — the q196 shape on real rasters
    val corpus: Seq[(Long, Array[Byte], String)] =
      Seq((1L, scenePng(7, 220, 120), "image/png"),
        (5L, scenePng(8, 220, 120), "image/png")) ++
        (100L until 120L).map(i => (i, s"noise blob $i".getBytes("UTF-8"), "text/plain"))
    val batch: Seq[(Long, Array[Byte], String)] = Seq(
      (-1L, scenePng(7, 110, 60), "image/png"),   // near-dup of corpus doc 1
      (-2L, scenePng(9, 220, 120), "image/png"))  // genuinely new scene
    def ph(rows: Seq[(Long, Array[Byte], String)]) =
      graft.ops.Multimodal.imagePhash(rows.toDF("doc_id", "media", "mime_hint"))
        .localCheckpoint()
    val (cp, bp) = (ph(corpus), ph(batch))
    val M = graft.ops.Multimodal
    def probe(maxBucket: Int): Set[(Long, Long)] =
      graft.ops.Lsh.incrementalSimhashCandidates(
          cp.select($"doc_id", $"phash".as("simhash")),
          bp.select($"doc_id", $"phash".as("simhash")),
          numBands = M.PhashNumBands, bandBits = M.PhashBandBits,
          subBands = M.PhashSubBands, subBits = M.PhashSubBits,
          maxBucket = maxBucket)
        .filter(expr("bit_count(s1 ^ s2) <= 5"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs = probe(256)
    assert(pairs.contains((1L, -1L)),
      s"resized batch raster must find its corpus original: $pairs")
    assert(!pairs.exists(_._2 == -2L), s"a new scene must match nothing: $pairs")
    // hot-bucket exactness: maxBucket = 1 forces EVERY touched bucket
    // through the sub-band path — the probe must lose nothing (the cap
    // that a coarse-band corpus would hit at scale; the capped
    // incremental path would return empty here)
    assert(probe(1) === pairs,
      "sub-banded hot path must equal the cold path exactly")
  }
}
