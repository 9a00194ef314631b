package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** BYTE-level BPE (the GPT-2 recipe: Radford et al. 2019, "Language
  * Models are Unsupervised Multitask Learners", §2.2) — the production
  * default tokenizer family member beside char-BPE ([[BpeTrain]],
  * q97/q106) and unigram-LM ([[UnigramTrain]], q209/q212): the base
  * alphabet is the 256 BYTES of the word's UTF-8 encoding, so NOTHING
  * is ever out-of-vocabulary — an unseen character falls back to its
  * raw bytes instead of an UNK, which is why byte fallback is the
  * published default for web-scale multilingual corpora.
  *
  * The byte↔unicode bijection (reimplemented from the published
  * description): BPE machinery wants symbols that are printable,
  * distinct characters, so each byte maps to one code point —
  * "visible" latin-1 bytes (0x21–0x7E, 0xA1–0xAC, 0xAE–0xFF) keep
  * their own code point; the remaining 68 bytes (controls, space, DEL,
  * 0xA0, 0xAD) map to 256, 257, … in byte order. The mapping is a
  * bijection, so a trained token decodes back to exact bytes
  * (ByteBpeSpec pins the round-trip).
  *
  * Training is [[BpeTrain]]'s two-tier greedy verbatim — the ONLY
  * difference is the word→symbols splitter (one mapped char per UTF-8
  * byte, no end-of-word marker — the GPT-2 convention; word
  * boundaries come from the pre-tokenizer). Every determinism and
  * scale property carries over: exact integer pair counts, UTF-8
  * candidate order, corpus-sized work bounded by ONE word-count
  * aggregation.
  */
object ByteBpe {

  /** byte value → its symbol character. */
  val byteToChar: Array[Char] = {
    val keep = ((0x21 to 0x7e) ++ (0xa1 to 0xac) ++ (0xae to 0xff)).toSet
    val arr = new Array[Char](256)
    var next = 256
    (0 until 256).foreach { b =>
      if (keep(b)) arr(b) = b.toChar
      else { arr(b) = next.toChar; next += 1 }
    }
    arr
  }

  /** symbol character → its byte value (the inverse bijection). */
  val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => (c, b) }.toMap

  /** One symbol per UTF-8 byte of the word — the byte-level splitter
    * ([[BpeTrain.symbols]]'s counterpart; no end-of-word marker). */
  def symbols(word: String): Array[String] =
    word.getBytes("UTF-8").map(b => byteToChar(b & 0xff).toString)

  /** Train `rounds` byte-level merges over a (word, freq) dictionary —
    * [[BpeTrain.trainWith]] on the byte splitter; same two-tier
    * `auto`, same merge-table schema, same determinism. */
  def train(
      wordFreq: Dataset[(String, Long)],
      rounds: Int,
      strategy: String = "auto",
      localThreshold: Long = 1000000L): DataFrame =
    BpeTrain.trainWith(wordFreq, rounds, symbols _, 1, strategy, localThreshold)

  /** Segment a word under a trained ladder (rank order, left-to-right
    * all-occurrences — [[BpeTrain.applyMerge]] semantics). */
  def segment(word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms = symbols(word)
    merges.foreach { case (a, b) => syms = BpeTrain.applyMerge(syms, a, b) }
    syms
  }

  /** A token's symbol string → the exact bytes it covers. */
  def decode(sym: String): Array[Byte] =
    sym.map(c => charToByte(c).toByte).toArray

  /** The FROZEN demo ladder q217 applies at scan scale (how a
    * pretrained tokenizer ships — the q106 convention): multi-byte
    * fallback merges first (é/ß/ñ re-fuse from their UTF-8 byte
    * pairs), then common English pairs, then the full 'café' token.
    * Expressed via [[symbols]] so the mapped-space strings are
    * derived, not hand-encoded. */
  lazy val DemoLadder: Seq[(String, String)] = {
    def m(s: String): Array[String] = symbols(s)
    Seq(
      (m("é")(0), m("é")(1)),
      (m("ß")(0), m("ß")(1)),
      (m("ñ")(0), m("ñ")(1)),
      ("t", "h"), ("th", "e"),
      ("a", "n"), ("i", "n"), ("e", "r"), ("o", "n"), ("r", "e"),
      ("c", "a"), ("ca", "f"), ("caf", m("é").mkString))
  }
}
