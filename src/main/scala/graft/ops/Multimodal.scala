package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The decode step is REAL for PNG, JPEG, GIF and BMP — the pure-JDK
  * `javax.imageio` codecs, no external media library needed — and a
  * clearly-marked deterministic STUB for everything else (this
  * container has no ffmpeg/PIL). A blob is routed to the real decoder
  * only when its magic bytes say so AND the codec accepts it, so
  * arbitrary binary columns (like the synthetic test corpus) always
  * take the stub path and the DuckDB oracle stays SQL-expressible,
  * while genuine images come back with their true dimensions and
  * per-band luminance features (MultimodalDecodeSpec pins both
  * routes). The Spark-side plumbing is identical for both: schema,
  * binary column handling, partition batch shape, and the
  * mapPartitions feature-extraction contract are what any codec
  * (ffmpeg behind the same iterator signature) plugs into. At 100 TB:
  * records are read with the `binaryFile` source or from parquet
  * binary columns; decode is per-partition with bounded memory (one
  * media blob at a time, iterator-to-iterator, no collect);
  * partitioning by size via maxPartitionBytes keeps batches even;
  * features (small fixed-size vectors) shuffle instead of raw media
  * wherever possible.
  *
  * The stub derives everything from the md5 of the media bytes, so the
  * whole pipeline is SQL-expressible and the driver's DuckDB oracle
  * hash-checks it end-to-end (q34). The feature vector is exposed as
  * eight scalar DOUBLE columns (f0..f7) rather than an ArrayType —
  * array cells break the driver's pandas-side sort in the compare, and
  * scalar feature columns are also what a columnar store wants at
  * scale (no per-row array headers; each dimension prunes/compresses
  * independently).
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, media: Array[Byte], mime_hint: String)
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      mime: String,
      width: Long,
      height: Long,
      n_frames: Long,
      f0: Double, f1: Double, f2: Double, f3: Double,
      f4: Double, f5: Double, f6: Double, f7: Double) {
    /** Feature-vector view of the scalar columns. */
    def feature: Seq[Double] = Seq(f0, f1, f2, f3, f4, f5, f6, f7)
  }

  implicit val recEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
  // frame rows all-BIGINT so the oracle compare sees identical dtypes
  implicit val frameEnc: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)

  /** First 60 bits of the blob's md5 as a non-negative long — THE
    * oracle-parity-critical derivation shared by every stub path (and
    * replicated in the DuckDB SQL strings); the extraction itself is
    * single-sourced in [[Md5Hash60]] (shared with [[PageRank]]'s
    * segment keys) so the Scala copies can never drift apart.
    */
  private def hash60(md: java.security.MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    Md5Hash60.ofDigest(md.digest(bytes))
  }

  /** PNG's 8-byte signature, JPEG's FF D8 FF SOI+marker prefix, GIF's
    * "GIF87a"/"GIF89a", or BMP's "BM" — the formats the pure-JDK
    * codecs are asked to try. A magic match alone is NOT trusted
    * (random bytes hit "BM" at 2^-16): the codec must also accept the
    * stream, or the record falls back to the stub.
    *
    * JPEG caveat (the dominant format of any real image corpus):
    * unlike PNG/GIF/BMP, JPEG decode is IDCT output, and the JDK spec
    * allows conforming decoders to differ by ±1 per sample — so a
    * JPEG's dHash/features are deterministic for a given blob ON A
    * GIVEN JDK BUILD but not contractually bit-identical across JDK
    * vendors. dHash absorbs this by construction: a ±1-per-sample
    * wobble moves 20×20-block MEANS by ≲ 1/255 of full scale, far
    * inside the hamming-5 pairing tolerance ImagePhashSpec pins
    * (JPEG re-encode ↔ PNG original pair at ≤ 5). The DuckDB oracle
    * is unaffected: oracle-checked queries keep using stub fixtures.
    */
  private def sniffImage(b: Array[Byte]): Option[String] =
    if (b.length >= 8 &&
      b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a) Some("image/png")
    else if (b.length >= 3 &&
      b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte) Some("image/jpeg")
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') Some("image/gif")
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') Some("image/bmp")
    else None

  /** Raster-size cap for the real decoders (64 MPx ≈ 256 MB ARGB):
    * anything larger is treated as undecodable and stubs out. */
  private val MaxDecodePixels = 64L * 1024 * 1024

  /** Header-only raster-size gate, checked BEFORE every `rd.read(f)`.
    * GIF image descriptors declare each frame's dimensions
    * independently of frame 0 (up to 65535 × 65535), so a crafted blob
    * with a tiny first frame can still steer a LATER read into a
    * multi-GB raster allocation — and the resulting OutOfMemoryError
    * is an Error the `catch { case _: Exception => None }` fallback
    * would not stop. Gate every frame index actually read, not just
    * frame 0. */
  private def gateRaster(rd: javax.imageio.ImageReader, f: Int): Unit =
    if (rd.getWidth(f).toLong * rd.getHeight(f) > MaxDecodePixels)
      throw new java.io.IOException(s"declared raster too large (frame $f)")

  /** Open a positioned JDK ImageReader over the blob, run `use`, and
    * dispose reader + stream whatever happens. Returns None when no
    * installed codec claims the stream. */
  private def withReader[A](media: Array[Byte])(
      use: javax.imageio.ImageReader => A): Option[A] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(media))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try { r.setInput(iis); Some(use(r)) } finally r.dispose()
      }
    } finally iis.close()
  }

  /** REAL image decode via the pure-JDK codecs. Returns None when the
    * blob is not a decodable PNG/JPEG/GIF/BMP, routing it to the stub.
    * Features are the mean luminance (0..1) of 8 equal vertical bands
    * of the FIRST frame, summed row-major; n_frames is the true image
    * count (animated GIFs report their frame total) — deterministic
    * for a given blob.
    */
  private def decodeImage(r: MediaRecord): Option[MediaFeatures] =
    sniffImage(r.media).flatMap { mime =>
      try {
        withReader(r.media) { rd =>
          // header-only size gate BEFORE rd.read allocates the raster: a
          // noise blob that passes the 2-byte BM magic can declare
          // multi-GB dimensions, and the resulting OutOfMemoryError is
          // an Error the fallback catch would not stop
          gateRaster(rd, 0)
          val nImages = rd.getNumImages(true)
          val img = rd.read(0)
          val w = img.getWidth
          val h = img.getHeight
          val sums = new Array[Double](8)
          val counts = new Array[Long](8)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w) // bulk row fetch, not per-pixel
            var x = 0
            while (x < w) {
              val px = row(x)
              val lum = (((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)) / 3.0
              val b = math.min(x * 8 / w, 7)
              sums(b) += lum
              counts(b) += 1L // denominator = actual band membership
              x += 1
            }
            y += 1
          }
          def f(i: Int): Double = if (counts(i) == 0) 0.0 else sums(i) / (255.0 * counts(i))
          MediaFeatures(
            doc_id = r.doc_id,
            n_bytes = r.media.length.toLong,
            mime = mime,
            width = w.toLong,
            height = h.toLong,
            n_frames = math.max(nImages, 1).toLong,
            f0 = f(0), f1 = f(1), f2 = f(2), f3 = f(3),
            f4 = f(4), f5 = f(5), f6 = f(6), f7 = f(7))
        }
      } catch { case _: Exception => None }
    }

  def decodeBatch(batch: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    batch.map { r =>
      decodeImage(r).getOrElse(stubDecode(md, r))
    }
  }

  /** STUB decoder for non-image blobs: the honest fake the scaladoc
    * header documents — deterministic "dimensions" and an 8-dim
    * "feature vector" all derive from the md5 of the bytes (60-bit
    * non-negative, so % semantics agree across engines), keeping the
    * non-image path DuckDB-oracle-checkable end-to-end.
    */
  private def stubDecode(md: java.security.MessageDigest, r: MediaRecord): MediaFeatures = {
    val h = hash60(md, r.media)
    def f(d: Int): Double = ((h ^ (97531L * (d + 1))) % 1000L).toDouble / 1000.0
    MediaFeatures(
      doc_id = r.doc_id,
      n_bytes = r.media.length.toLong,
      mime = r.mime_hint,
      width = 16L + h % 1024L,
      height = 16L + (h >> 10) % 1024L,
      n_frames = 1L + r.media.length / 256,
      f0 = f(0), f1 = f(1), f2 = f(2), f3 = f(3),
      f4 = f(4), f5 = f(5), f6 = f(6), f7 = f(7))
  }

  /** Feature extraction over a (doc_id, media, mime_hint) frame. */
  def extractFeatures(df: DataFrame): Dataset[MediaFeatures] =
    df.as[MediaRecord].mapPartitions(decodeBatch _)

  /** Resize planning: fit (width, height) into a maxDim box preserving
    * aspect ratio, never upscaling — pure integer arithmetic so the
    * plan is engine-reproducible. A real implementation resamples
    * pixels inside [[decodeBatch]] using exactly these target dims;
    * the dims (and the output pixel count that drives batch sizing)
    * are the contract downstream GPU batching needs.
    */
  def resizePlan(features: org.apache.spark.sql.DataFrame, maxDim: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, greatest, least, lit, when}
    val m = greatest(col("width"), col("height"))
    features.select(
      col("doc_id"), col("width"), col("height"),
      when(m <= maxDim, col("width"))
        .otherwise(greatest(lit(1L), expr(s"width * $maxDim div greatest(width, height)")))
        .as("out_w"),
      when(m <= maxDim, col("height"))
        .otherwise(greatest(lit(1L), expr(s"height * $maxDim div greatest(width, height)")))
        .as("out_h"))
      .withColumn("n_px_out", col("out_w") * col("out_h"))
      .withColumn("downscaled", (least(col("out_w"), col("out_h")) < least(col("width"), col("height"))).cast("boolean"))
  }

  /** Frame sampling: REAL for animated GIF — every `stride`-th frame is
    * decoded by the JDK reader and reported with its ARGB raster size
    * (w·h·4), the number downstream GPU batching actually sizes on.
    * Other formats use the stub (every `stride`-th 256-byte chunk
    * stands in for a frame; a real video impl would seek keyframes
    * behind the same row shape).
    */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame =
    df.as[MediaRecord].flatMap { r =>
      gifFrames(r, stride).getOrElse {
        val n = math.max(r.media.length / 256, 1)
        (0 until n by stride).map(f =>
          (r.doc_id, f.toLong, math.min(256, r.media.length).toLong))
      }
    }.toDF("doc_id", "frame_no", "frame_bytes")

  /** Decode every `stride`-th frame of a (sniffed AND codec-accepted)
    * GIF; None routes to the stub. */
  private def gifFrames(r: MediaRecord, stride: Int): Option[Seq[(Long, Long, Long)]] =
    sniffImage(r.media) match {
      case Some("image/gif") =>
        try {
          withReader(r.media) { rd =>
            // same header-only size gate as decodeImage: never let a
            // forged header drive the raster allocation — per frame,
            // because GIF descriptors size each frame independently
            val n = math.max(rd.getNumImages(true), 1)
            (0 until n by stride).map { f =>
              gateRaster(rd, f)
              val img = rd.read(f)
              (r.doc_id, f.toLong, img.getWidth.toLong * img.getHeight.toLong * 4L)
            }
          }
        } catch { case _: Exception => None }
      case _ => None
    }

  /** 60-bit perceptual DIFFERENCE HASH (dHash) of an image blob — the
    * near-dup fingerprint for rasters (q38's role for text): REAL for
    * decodable PNG/JPEG/GIF/BMP, md5-stub otherwise (same honest-fake
    * contract as [[decodeBatch]], so a synthetic corpus stays
    * DuckDB-oracle-checkable end-to-end).
    *
    * Real path: the first frame's luminance is block-averaged onto an
    * 11 × 6 grid and each bit compares horizontally adjacent block
    * means (bit r·10+c = mean(r, c+1) > mean(r, c)) — 10 × 6 = 60
    * bits. 60, not the classic 64, deliberately: it matches the
    * repo-wide 60-bit md5 convention (the stub path), keeps the hash
    * non-negative on both engines, and lets SIX 10-bit hamming bands
    * cover EVERY bit — the q38 pigeonhole guarantee (hamming ≤ 5 ⇒
    * agreement on ≥ 1 band) breaks if any bit escapes the banding.
    * Block means compare via exact integer cross-multiplication
    * (sumA·cntB > sumB·cntA — block sums ≤ 765·(64 MPx/66) keep the
    * product under 2⁶³), so the hash is bit-reproducible on any JVM:
    * no floats anywhere. Mean-of-block luminance is what makes the
    * hash a PERCEPTUAL one: resampling, mild brightness shifts and
    * re-encoding preserve block-mean ORDER (ImagePhashSpec plants
    * exactly those transforms), while structurally different images
    * disagree on ~half the comparisons.
    *
    * Output (doc_id, phash, decoded); decoded = false marks the stub
    * route. Per-partition decode, one blob in flight — the
    * [[decodeBatch]] batch shape.
    */
  def imagePhash(df: DataFrame): DataFrame = {
    val out = df.as[MediaRecord].mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { r =>
        val real = dHashOf(r)
        (r.doc_id, real.getOrElse(hash60(md, r.media)), real.isDefined)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaBoolean))
    out.toDF("doc_id", "phash", "decoded")
  }

  /** The phash hamming-band GEOMETRY — six 10-bit bands cover every
    * bit of the 60-bit hash (pigeonhole: hamming ≤ 5 ⇒ agreement on
    * ≥ 1 band), six 9-bit sub-bands cover the remaining 50 bits
    * (hot buckets stay EXACT for hamming ≤ 5). One owner: q195, q196,
    * the StreamPhash maintainer and the specs all band through
    * [[phashBands]] / these constants — hand-copied expansions would
    * have to stay in lockstep or silently break pigeonhole coverage
    * (the Md5GramHashes lesson).
    */
  val PhashNumBands = 6
  val PhashBandBits = 10
  val PhashSubBands = 6
  val PhashSubBits = 9

  /** [[imagePhash]] output → the hamming-band rows, in
    * [[Lsh.simhashCandidates]]' column contract (doc_id, simhash, b,
    * band).
    */
  def phashBands(ph: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, explode, expr}
    ph.select(col("doc_id"), col("phash").as("simhash"),
        explode(expr(s"sequence(0, ${PhashNumBands - 1})")).as("b"))
      .withColumn("band",
        expr(s"shiftright(simhash, b * $PhashBandBits) & ${(1L << PhashBandBits) - 1}"))
  }

  /** The real-decode leg of [[imagePhash]]; None routes to the stub
    * (not an image, codec rejects, forged-header raster too large, or
    * smaller than the 11 × 6 grid).
    */
  private def dHashOf(r: MediaRecord): Option[Long] =
    sniffImage(r.media).flatMap { _ =>
      try {
        withReader(r.media) { rd =>
          gateRaster(rd, 0)
          dHashOfImage(rd.read(0)).getOrElse(
            throw new java.io.IOException("below the 11x6 dhash grid"))
        }
      } catch { case _: Exception => None }
    }

  /** The raster→60-bit-dHash kernel shared by [[imagePhash]] (first
    * frame) and [[videoFrameHashes]] (every sampled frame); None when
    * the raster is below the 11 × 6 grid. */
  private def dHashOfImage(img: java.awt.image.BufferedImage): Option[Long] = {
    val w = img.getWidth
    val h = img.getHeight
    if (w < 11 || h < 6) None
    else {
      val sums = Array.ofDim[Long](6, 11)
      val cnts = Array.ofDim[Long](6, 11)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        val br = math.min(y * 6 / h, 5)
        var x = 0
        while (x < w) {
          val px = row(x)
          val lum3 = ((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)
          val bc = math.min(x * 11 / w, 10)
          sums(br)(bc) += lum3
          cnts(br)(bc) += 1L
          x += 1
        }
        y += 1
      }
      var hash = 0L
      var gr = 0
      while (gr < 6) {
        var c = 0
        while (c < 10) {
          if (sums(gr)(c + 1) * cnts(gr)(c) > sums(gr)(c) * cnts(gr)(c + 1))
            hash |= 1L << (gr * 10 + c)
          c += 1
        }
        gr += 1
      }
      Some(hash)
    }
  }

  /** Per-frame 60-bit hashes of a video blob — the fingerprint stream
    * behind sequence-level near-dup (q199): REAL for animated GIF
    * (every frame decoded by the JDK reader and dHashed through the
    * [[imagePhash]] kernel — re-encodes and per-frame perceptual
    * transforms land on the same hashes), deterministic md5-stub
    * otherwise (every `chunkBytes`-byte slice stands in for a frame, a
    * short blob is one frame — the q56 chunk convention, so the whole
    * stub path is DuckDB-replayable). A GIF whose ANY frame falls
    * below the 11 × 6 dHash grid stubs out entirely (per-record
    * all-or-nothing keeps the routing decision a single bit per blob,
    * like every other multimodal op).
    *
    * Output (doc_id, frame_no, fhash, decoded). Downstream q199
    * reduces each video to its DISTINCT frame-hash SET and joins sets
    * at a rational Jaccard threshold ([[graft.queries.Llm.setSimJoinSets]]):
    * content-based, order-free — a re-cut that reorders scenes still
    * pairs, which is the property video dedup wants (temporal
    * alignment is a verify-stage concern, not a candidate-stage one).
    * Per-partition decode, one blob in flight.
    */
  def videoFrameHashes(df: DataFrame, chunkBytes: Int): DataFrame = {
    require(chunkBytes >= 1, s"chunkBytes must be positive: $chunkBytes")
    val out = df.as[MediaRecord].mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.flatMap { r =>
        gifFrameHashes(r.media) match {
          case Some(hs) =>
            hs.zipWithIndex.map { case (fh, i) => (r.doc_id, i.toLong, fh, true) }
          case None =>
            val nf = math.max(r.media.length / chunkBytes, 1)
            (0 until nf).map { i =>
              val lo = i * chunkBytes
              val hi = math.min(lo + chunkBytes, r.media.length)
              (r.doc_id, i.toLong,
                hash60(md, java.util.Arrays.copyOfRange(r.media, lo, hi)),
                false)
            }
        }
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaBoolean))
    out.toDF("doc_id", "frame_no", "fhash", "decoded")
  }

  /** The real-decode leg of [[videoFrameHashes]]: all frames of a
    * (sniffed AND codec-accepted) GIF, dHashed; None routes to the
    * stub. */
  private def gifFrameHashes(media: Array[Byte]): Option[Seq[Long]] =
    sniffImage(media) match {
      case Some("image/gif") =>
        try {
          withReader(media) { rd =>
            val n = math.max(rd.getNumImages(true), 1)
            (0 until n).map { f =>
              gateRaster(rd, f)
              dHashOfImage(rd.read(f)).getOrElse(
                throw new java.io.IOException("frame below the 11x6 dhash grid"))
            }
          }
        } catch { case _: Exception => None }
      case _ => None
    }

  /** 60-bit ENERGY DIFFERENCE HASH of an audio blob — [[imagePhash]]'s
    * role for waveforms, completing the multimodal near-dup family:
    * REAL for RIFF/WAVE 16-bit PCM (a pure byte-level parser — no
    * codec library; WAV is the interchange format a production
    * transcode step would emit anyway), md5-stub otherwise (the same
    * honest-fake contract as [[decodeBatch]], so a synthetic corpus
    * stays DuckDB-oracle-checkable end-to-end).
    *
    * Real path: the PCM sample stream is decimated to ≤ 2²² samples
    * (a fixed stride — deterministic, and the bound is what keeps the
    * integer comparisons overflow-free), distributed onto 61 equal
    * time frames (frame = i·61/n, the dHash grid rule), and bit i
    * compares the MEAN ABSOLUTE AMPLITUDE of adjacent frames —
    * sum(i+1)·cnt(i) > sum(i)·cnt(i+1), exact integer
    * cross-multiplication (|s| ≤ 2¹⁵ and ≤ 2²²/61 samples per frame ⇒
    * frame sums < 2³², cross-products < 2⁴⁸ — no floats anywhere,
    * bit-reproducible on any JVM). Mean-|amplitude| ORDER is what survives the transforms a
    * near-dup pass must catch: uniform volume change scales every
    * frame equally, re-encoding (chunk reshuffles, added LIST/INFO
    * metadata) leaves samples untouched, and moderate resampling
    * preserves the energy envelope — while different recordings
    * disagree on ~half the adjacent-frame comparisons
    * (AudioFingerprintSpec plants exactly those transforms).
    *
    * 60 bits (61 frames), not 64, for the same reason as
    * [[imagePhash]]: the repo-wide 60-bit md5 stub convention and the
    * six-10-bit-band pigeonhole (hamming ≤ 5 ⇒ ≥ 1 band agrees) that
    * [[phashBands]] implements for ANY 60-bit signature.
    *
    * Output (doc_id, ahash, decoded); decoded = false marks the stub
    * route (not RIFF/WAVE, not 16-bit PCM, missing/empty data chunk,
    * or fewer than 61 samples). Per-partition decode, one blob in
    * flight.
    */
  def audioFingerprint(df: DataFrame): DataFrame = {
    val out = df.as[MediaRecord].mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { r =>
        val real = eHashOf(r.media)
        (r.doc_id, real.getOrElse(hash60(md, r.media)), real.isDefined)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaBoolean))
    out.toDF("doc_id", "ahash", "decoded")
  }

  /** Decimation bound for [[audioFingerprint]]'s real path: caps the
    * samples actually read so the frame-sum cross-products stay far
    * under 2⁶³ (≤ 2²²/61 samples per frame ⇒ products < 2⁴⁸) AND
    * bounds per-blob CPU. */
  private val MaxFingerprintSamples = 1 << 22

  private def leU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def leU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Locate the PCM16 sample region of a RIFF/WAVE blob: walks the
    * chunk list (4-byte id, 4-byte LE size, even-padded payload),
    * requires an audioFormat=1 (PCM), bitsPerSample=16 "fmt " chunk
    * BEFORE the "data" chunk, and clips a lying declared size to the
    * bytes actually present. None on any structural violation. */
  private def wavPcm16Region(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 44 ||
      b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var off = 12
    var pcm16 = false
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = leU32(b, off + 4)
      val payload = off + 8
      if (id == "fmt ") {
        if (size < 16 || payload + 16 > b.length) return None
        if (leU16(b, payload) != 1 || leU16(b, payload + 14) != 16) return None
        pcm16 = true
      } else if (id == "data") {
        if (!pcm16) return None
        val avail = b.length - payload
        val n = math.min(size, avail.toLong).toInt
        return if (n >= 2) Some((payload, n - (n % 2))) else None
      }
      off = payload + size.toInt + (size.toInt & 1)
      if (size > Int.MaxValue - 8L || off <= payload) return None
    }
    None
  }

  /** The real-decode leg of [[audioFingerprint]]; None routes to the
    * stub. */
  private[graft] def eHashOf(b: Array[Byte]): Option[Long] =
    wavPcm16Region(b).flatMap { case (start, nBytes) =>
      val nAll = nBytes / 2
      if (nAll < 61) None
      else {
        val stride = (nAll - 1) / MaxFingerprintSamples + 1
        val n = (nAll + stride - 1) / stride
        val sums = new Array[Long](61)
        val cnts = new Array[Long](61)
        var i = 0
        while (i < n) {
          val si = start + 2 * (i * stride)
          val s = ((b(si) & 0xff) | (b(si + 1) << 8)).toShort.toInt
          val f = (i.toLong * 61 / n).toInt
          sums(f) += math.abs(s.toLong)
          cnts(f) += 1L
          i += 1
        }
        var hash = 0L
        var f = 0
        while (f < 60) {
          if (cnts(f) > 0 && cnts(f + 1) > 0 &&
            sums(f + 1) * cnts(f) > sums(f) * cnts(f + 1))
            hash |= 1L << f
          f += 1
        }
        Some(hash)
      }
    }

  final case class AudioStats(
      doc_id: Long,
      n_bytes: Long,
      sample_rate: Long,
      n_samples: Long,
      duration_s: Double,
      rms: Double)

  implicit val audioEnc: Encoder[AudioStats] = Encoders.product[AudioStats]

  /** Audio-path stub (same honest-fake contract as [[decodeBatch]]): a
    * real implementation hands the blob to a PCM/opus decoder and
    * computes waveform stats; this one derives sample rate / sample
    * count / RMS deterministically from the blob's md5 + length, so the
    * whole path is oracle-checkable while the partition shape (one
    * digest object, one blob in flight, iterator-to-iterator) is the
    * production contract. duration = n_samples / rate is one IEEE
    * double division on identical integers in both engines.
    */
  def audioStats(df: DataFrame): Dataset[AudioStats] =
    df.as[MediaRecord].mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { r =>
        val h = hash60(md, r.media)
        val rate = 8000L * (1L + h % 5L) // 8/16/24/32/40 kHz
        val samples = r.media.length.toLong * 16L
        AudioStats(
          doc_id = r.doc_id,
          n_bytes = r.media.length.toLong,
          sample_rate = rate,
          n_samples = samples,
          duration_s = samples.toDouble / rate,
          rms = ((h >> 20) % 1000L).toDouble / 1000.0)
      }
    }
}
