package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

/** Shared raster fixture for the image-phash specs — ONE owner of the
  * scene formula (two hand-copied renderers would drift and silently
  * decouple the specs' hamming-threshold assumptions): a
  * deterministic 11 × 6 block scene rendered as a gray PNG. Block
  * luminance stays in [40, 200] so a brighten ≤ 55 never clips —
  * mean ORDER is preserved, the perceptual invariance dHash promises.
  * Rendering the same seed at different (w, h) is the resize
  * transform: same scene, different resolution.
  */
object TestScenes {

  def scenePng(seed: Int, w: Int, h: Int, brighten: Int = 0): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(sceneImage(seed, w, h, brighten), "png", bos)
    bos.toByteArray
  }

  /** The same scene as a REAL JPEG — the lossy re-encode transform the
    * production near-dup path must catch (JPEG is the dominant format
    * of any real image corpus). Explicit quality so the fixture pins
    * down how much DCT damage the hamming-5 tolerance is asked to
    * absorb. */
  def sceneJpeg(seed: Int, w: Int, h: Int, quality: Float = 0.85f,
      brighten: Int = 0): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      writer.write(null,
        new javax.imageio.IIOImage(sceneImage(seed, w, h, brighten), null, null), p)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** The scene raster itself (the PNG above, pre-encode) — frames for
    * [[animatedGif]]. */
  def sceneImage(seed: Int, w: Int, h: Int, brighten: Int = 0): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = math.min(y * 6 / h, 5)
        val c = math.min(x * 11 / w, 10)
        val v = math.min(40 + ((r * 31 + c * 17 + seed * 59) * 97) % 161 + brighten, 255)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Multi-frame GIF from the given rasters via the JDK's sequence
    * writer — the real-decode fixture for the video specs. The scene
    * grays (≤ 161 distinct levels) fit one GIF palette exactly, so
    * encode→decode is lossless and re-encoding the same rasters
    * reproduces identical dHashes.
    */
  def animatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }
}
