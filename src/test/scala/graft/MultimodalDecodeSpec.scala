package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.ops.Multimodal
import graft.ops.Multimodal.MediaRecord

/** The REAL decode route in ops.Multimodal: a genuine PNG/BMP goes
  * through the pure-JDK javax.imageio codec and comes back with its
  * true dimensions and per-band luminance features; anything else —
  * including bytes that fake the "BM" magic — falls back to the
  * md5 stub, so the oracle-checked q30/q34/q59 path is untouched by
  * the codec upgrade.
  */
class MultimodalDecodeSpec extends SparkSuite {

  /** A w×h image: left half black, right half white — band luminance
    * is a step function we can assert exactly. */
  private def fixture(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos), s"JDK lacks $format writer")
    bos.toByteArray
  }

  private def features(recs: Seq[MediaRecord]) = {
    import spark.implicits._
    Multimodal.extractFeatures(recs.toDF("doc_id", "media", "mime_hint"))
      .collect().map(f => f.doc_id -> f).toMap
  }

  test("a real PNG decodes with true dimensions and band luminance") {
    val png = fixture(64, 48, "png")
    val f = features(Seq(MediaRecord(1L, png, "application/octet-stream")))(1L)
    assert(f.mime === "image/png") // detected, not the hint
    assert(f.width === 64L && f.height === 48L && f.n_frames === 1L)
    assert(f.n_bytes === png.length.toLong)
    // left 4 bands black, right 4 bands white — exact step function
    assert(f.feature.take(4).forall(_ == 0.0), s"left bands not black: ${f.feature}")
    assert(f.feature.drop(4).forall(_ == 1.0), s"right bands not white: ${f.feature}")
  }

  test("band features stay exact when width is not a multiple of 8") {
    // w=10: band membership floor(8x/10) puts x=0..4 (black) in bands
    // 0-3 and x=5..9 (white) in bands 4-7 — denominators must count
    // actual membership, not floor-boundary arithmetic
    val png = fixture(10, 4, "png")
    val f = features(Seq(MediaRecord(9L, png, "x")))(9L)
    assert(f.width === 10L && f.height === 4L)
    assert(f.feature.take(4).forall(_ == 0.0), s"black bands: ${f.feature}")
    assert(f.feature.drop(4).forall(_ == 1.0), s"white bands: ${f.feature}")
  }

  test("a real BMP decodes through the same route") {
    val bmp = fixture(32, 16, "bmp")
    val f = features(Seq(MediaRecord(2L, bmp, "x")))(2L)
    assert(f.mime === "image/bmp")
    assert(f.width === 32L && f.height === 16L)
  }

  test("a real JPEG decodes through the same route (lossy: bands approximate)") {
    val jpg = fixture(64, 48, "jpg")
    val f = features(Seq(MediaRecord(8L, jpg, "application/octet-stream")))(8L)
    assert(f.mime === "image/jpeg") // detected from FF D8 FF, not the hint
    assert(f.width === 64L && f.height === 48L && f.n_frames === 1L)
    // DCT ringing blurs the step edge, but band MEANS stay near the
    // plateaus — the tolerance is the whole point of routing JPEG real
    assert(f.feature.take(3).forall(_ < 0.1), s"left bands not ~black: ${f.feature}")
    assert(f.feature.drop(5).forall(_ > 0.9), s"right bands not ~white: ${f.feature}")
  }

  /** A w×h animated GIF with `n` solid gray frames. */
  private def gifFixture(w: Int, h: Int, n: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until n).foreach { i =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(i * 40, i * 40, i * 40))
      g.fillRect(0, 0, w, h)
      g.dispose()
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  test("an animated GIF reports its true frame count through decode") {
    val gif = gifFixture(20, 10, 5)
    val f = features(Seq(MediaRecord(5L, gif, "x")))(5L)
    assert(f.mime === "image/gif")
    assert(f.width === 20L && f.height === 10L)
    assert(f.n_frames === 5L)
  }

  test("q56 frame sampling really decodes every stride-th GIF frame") {
    import spark.implicits._
    val gif = gifFixture(20, 10, 5)
    val junk = Array.tabulate[Byte](600)(i => (i * 7).toByte)
    val df = Seq(
      (6L, gif, "image/gif"), (7L, junk, "video/mp4"))
      .toDF("doc_id", "media", "mime_hint")
    val out = Multimodal.sampleFrames(df, stride = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // GIF: frames 0, 2, 4 with the decoded ARGB raster size 20*10*4
    assert(out.keySet.filter(_._1 == 6L) === Set((6L, 0L), (6L, 2L), (6L, 4L)))
    assert(out((6L, 0L)) === 800L && out((6L, 4L)) === 800L)
    // non-GIF blob keeps the stub chunking (600/256 = 2 chunks, stride 2 -> frame 0)
    assert(out.keySet.filter(_._1 == 7L) === Set((7L, 0L)))
    assert(out((7L, 0L)) === 256L)
  }

  test("garbage bytes — even with a faked BM magic — take the stub path") {
    val junk = Array[Byte]('B', 'M', 1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    val f = features(Seq(MediaRecord(3L, junk, "video/mp4")))(3L)
    // stub keeps the caller's mime hint and derives dims from the md5
    assert(f.mime === "video/mp4")
    assert(f.width >= 16L && f.width < 1040L)
  }

  test("decoded dims flow into the q59 resize plan") {
    import spark.implicits._
    val png = fixture(64, 48, "png")
    val feats = Multimodal.extractFeatures(
      Seq(MediaRecord(4L, png, "x")).toDF("doc_id", "media", "mime_hint")).toDF()
    val plan = Multimodal.resizePlan(feats, maxDim = 32).collect().head
    assert(plan.getAs[Long]("out_w") === 32L)
    assert(plan.getAs[Long]("out_h") === 24L)
    assert(plan.getAs[Boolean]("downscaled"))
  }
}
