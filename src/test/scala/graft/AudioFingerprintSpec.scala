package graft

import org.apache.spark.sql.functions._

/** Multimodal.audioFingerprint (q198): REAL waveform transforms. A
  * planted recording survives uniform volume change, 2× decimation
  * resampling, and a metadata re-encode (extra LIST chunk) within the
  * hamming ≤ 5 near-dup threshold; a different recording lands far
  * outside it; non-WAV and non-PCM16 blobs take the stub route; and
  * the banded candidate path finds exactly the brute-force popcount
  * pairs on a mixed real+stub frame (the q38/q195 exactness property
  * on the audio domain).
  */
class AudioFingerprintSpec extends SparkSuite {

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Deterministic "recording": a square wave whose amplitude envelope
    * steps through 61 seeded levels — distinct per-frame mean
    * |amplitude| values, stable under decimation and volume scaling.
    */
  private def samplesOf(seed: Int, n: Int, vol: Double = 1.0, stride: Int = 1): Array[Short] = {
    val levels = Array.tabulate(61) { k =>
      var x = (seed * 2654435761L + k * 40503L) & 0x7fffffffL
      x = (x * 48271L) % 2147483647L
      1000 + (x % 15000L).toInt
    }
    val total = n * stride
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      val src = i * stride // decimation picks every stride-th source sample
      val env = levels((src.toLong * 61 / total).toInt)
      val sgn = if ((src / 25) % 2 == 0) 1 else -1
      out(i) = (sgn * math.min(32767, (env * vol).toInt)).toShort
      i += 1
    }
    out
  }

  /** Minimal RIFF/WAVE PCM16 writer (mono), optionally with a LIST
    * metadata chunk between fmt and data — the re-encode transform. */
  private def wavBytes(samples: Array[Short], rate: Int = 8000,
      extraChunk: Boolean = false): Array[Byte] = {
    val extra = if (extraChunk) {
      val payload = "INFOIART".getBytes("US-ASCII") ++ Array[Byte]('t', 'e', 's', 't')
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes("US-ASCII")).putInt(payload.length).put(payload)
      b.array()
    } else Array.empty[Byte]
    val dataLen = samples.length * 2
    val riffLen = 4 + (8 + 16) + extra.length + (8 + dataLen)
    val b = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(riffLen).put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    b.put(extra)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(b.putShort)
    b.array()
  }

  test("eHash catches volume / resample / re-encode; distinct recordings stay apart") {
    import spark.implicits._
    val n = 61 * 200
    val blobs: Seq[(Long, Array[Byte], String)] = Seq(
      (1L, wavBytes(samplesOf(7, n)), "audio/wav"),                 // original
      (2L, wavBytes(samplesOf(7, n, vol = 0.5)), "audio/wav"),      // volume halved
      (3L, wavBytes(samplesOf(7, n / 2, stride = 2), rate = 4000), "audio/wav"), // 2x decimated
      (4L, wavBytes(samplesOf(7, n), extraChunk = true), "audio/wav"), // metadata re-encode
      (5L, wavBytes(samplesOf(8, n)), "audio/wav"),                 // DISTINCT recording
      (6L, "not audio, just some text bytes".getBytes("UTF-8"), "text/plain"))
    val got = graft.ops.Multimodal.audioFingerprint(
        blobs.toDF("doc_id", "media", "mime_hint"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

    (1L to 5L).foreach(id => assert(got(id)._2, s"WAV $id must take the real route"))
    assert(!got(6L)._2, "text blob must take the stub route")
    got.values.foreach { case (h, _) => assert(h >= 0L && h < (1L << 60)) }

    val h1 = got(1L)._1
    assert(hamming(h1, got(2L)._1) <= 5, s"volume: ${hamming(h1, got(2L)._1)}")
    assert(hamming(h1, got(3L)._1) <= 5, s"resample: ${hamming(h1, got(3L)._1)}")
    assert(hamming(h1, got(4L)._1) == 0, "metadata re-encode must hash identically")
    assert(hamming(h1, got(5L)._1) > 5,
      s"distinct recordings must stay apart: ${hamming(h1, got(5L)._1)}")
    info(s"hamming vs original: volume=${hamming(h1, got(2L)._1)} " +
      s"resample=${hamming(h1, got(3L)._1)} distinct=${hamming(h1, got(5L)._1)}")
  }

  test("malformed/unsupported blobs stub out; truncated data still decodes") {
    // 8-bit PCM (bitsPerSample = 8) → stub
    val pcm8 = {
      val b = java.nio.ByteBuffer.allocate(8 + 4 + 24 + 8 + 200)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(4 + 24 + 8 + 200).put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
      b.put("data".getBytes("US-ASCII")).putInt(200).put(new Array[Byte](200))
      b.array()
    }
    assert(graft.ops.Multimodal.eHashOf(pcm8).isEmpty, "8-bit PCM must stub")
    // data chunk declares more bytes than present → clipped, decodes
    val full = wavBytes(samplesOf(7, 61 * 200))
    val truncated = full.dropRight(1000)
    assert(graft.ops.Multimodal.eHashOf(truncated).isDefined,
      "truncated data must clip to available bytes, not reject")
    // fewer than 61 samples → stub
    assert(graft.ops.Multimodal.eHashOf(wavBytes(samplesOf(7, 60))).isEmpty)
    // data before fmt (or no fmt) → stub
    val noFmt = {
      val b = java.nio.ByteBuffer.allocate(8 + 4 + 8 + 200)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + 200).put("WAVE".getBytes("US-ASCII"))
      b.put("data".getBytes("US-ASCII")).putInt(200).put(new Array[Byte](200))
      b.array()
    }
    assert(graft.ops.Multimodal.eHashOf(noFmt).isEmpty, "data without fmt must stub")
  }

  test("parser totality: RIFF-prefixed fuzz never throws — it hashes or stubs") {
    val rng = new scala.util.Random(42)
    (0 until 2000).foreach { i =>
      val len = rng.nextInt(4096)
      val b = new Array[Byte](len)
      rng.nextBytes(b)
      // half the blobs get a plausible RIFF/WAVE prefix so the chunk
      // walker actually engages (pure noise rarely passes the magic)
      if (i % 2 == 0 && len >= 12) {
        "RIFF".getBytes("US-ASCII").copyToArray(b, 0)
        "WAVE".getBytes("US-ASCII").copyToArray(b, 8)
      }
      val h = graft.ops.Multimodal.eHashOf(b) // must not throw
      h.foreach(v => assert(v >= 0L && v < (1L << 60), s"fuzz $i out of range"))
    }
  }

  test("banded candidate path ≡ brute-force popcount on a mixed real+stub frame") {
    import spark.implicits._
    val n = 61 * 100
    val blobs: Seq[(Long, Array[Byte], String)] =
      Seq(
        (1L, wavBytes(samplesOf(7, n)), "audio/wav"),
        (2L, wavBytes(samplesOf(7, n, vol = 0.7)), "audio/wav"),
        (3L, wavBytes(samplesOf(8, n)), "audio/wav"),
        (4L, wavBytes(samplesOf(8, n / 2, stride = 2), rate = 4000), "audio/wav")) ++
        (10L to 40L).map(i => (i, s"stub text payload number $i".getBytes("UTF-8"), "text/plain")) :+
        ((50L, s"stub text payload number 10".getBytes("UTF-8"), "text/plain")) // exact stub dup of 10
    val df = blobs.toDF("doc_id", "media", "mime_hint")
    val sig = graft.ops.Multimodal.audioFingerprint(df)
      .select(col("doc_id"), col("ahash").as("phash"))
      .localCheckpoint()

    val banded = graft.ops.Lsh.simhashCandidates(
        graft.ops.Multimodal.phashBands(sig),
        bandBits = graft.ops.Multimodal.PhashBandBits,
        subBands = graft.ops.Multimodal.PhashSubBands,
        subBits = graft.ops.Multimodal.PhashSubBits, maxBucket = 4)
      .withColumn("hamming", expr("CAST(bit_count(s1 ^ s2) AS BIGINT)"))
      .filter(col("hamming") <= 5)
      .select(col("d1"), col("d2"), col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val hs = sig.collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (d1, h1) <- hs; (d2, h2) <- hs if d1 < d2
      hm = hamming(h1, h2) if hm <= 5
    } yield (d1, d2, hm.toLong)).toSet

    assert(banded == brute, s"banded ${banded.size} vs brute ${brute.size}")
    assert(brute.exists(t => t._1 == 1L && t._2 == 2L),
      "volume-scaled recording must pair with its original")
    assert(brute.exists(t => t._1 == 10L && t._2 == 50L && t._3 == 0L),
      "exact stub duplicate must pair at hamming 0")
    info(s"${brute.size} near-dup pairs, banded path exact")
  }
}
