package graft.ops

/** First 60 bits of an md5 digest as a non-negative long — THE
  * driver-side twin of the engines' `conv(substr(md5(x), 1, 15), 16,
  * 10)` (15 hex chars = bytes 0–6 plus the high nibble of byte 7).
  * Single-sourced: [[PageRank]]'s segment keys and [[Multimodal]]'s
  * stub hashes must never drift from each other or from the SQL —
  * a divergent copy breaks oracle parity for whichever path wasn't
  * updated.
  */
private[graft] object Md5Hash60 {

  def ofDigest(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  def ofString(s: String): Long = ofDigest(
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
}
