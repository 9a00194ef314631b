package graft

import graft.ops.ByteBpe

/** ops.ByteBpe (GPT-2 byte-level BPE): the byte↔unicode bijection,
  * byte round-tripping through trained tokens, DemoLadder fusion of
  * multi-byte fallback pairs, trained-ladder parity with an
  * independent greedy replica, tier equality, and the q217 fertility
  * query against a driver-side replica on the real corpus.
  */
class ByteBpeSpec extends SparkSuite {

  test("byte↔unicode mapping is a bijection over all 256 bytes") {
    assert(ByteBpe.byteToChar.distinct.length === 256)
    (0 until 256).foreach { b =>
      assert(ByteBpe.charToByte(ByteBpe.byteToChar(b)) === b)
    }
    // visible latin-1 bytes keep their own code point
    assert(ByteBpe.byteToChar('a'.toInt) === 'a')
    assert(ByteBpe.byteToChar(0xe9) === 0xe9.toChar)
    // invisible bytes (space, controls, 0xA0, 0xAD) remap above 255
    assert(ByteBpe.byteToChar(' '.toInt).toInt >= 256)
    assert(ByteBpe.byteToChar(0).toInt >= 256)
    assert(ByteBpe.byteToChar(0xa0).toInt >= 256)
  }

  test("symbols split to UTF-8 bytes; tokens decode back to exact bytes") {
    val w = "café-日本"
    val syms = ByteBpe.symbols(w)
    assert(syms.length === w.getBytes("UTF-8").length,
      "one symbol per UTF-8 byte — nothing is ever OOV")
    val segs = ByteBpe.segment(w, ByteBpe.DemoLadder)
    assert(segs.flatMap(ByteBpe.decode).toSeq === w.getBytes("UTF-8").toSeq,
      "segmentation must round-trip to the exact source bytes")
  }

  test("DemoLadder fuses multi-byte fallback pairs and the café token") {
    assert(ByteBpe.segment("café", ByteBpe.DemoLadder).length === 1)
    assert(ByteBpe.segment("é", ByteBpe.DemoLadder).length === 1)
    val s = ByteBpe.segment("straße", ByteBpe.DemoLadder)
    assert(s.contains(ByteBpe.symbols("ß").mkString),
      s"ß must fuse from its byte pair, got ${s.mkString("|")}")
    // an unmerged multi-byte char stays one token PER BYTE
    assert(ByteBpe.segment("ü", Nil).length === 2)
  }

  /** Independent greedy replica: byte symbols, exact counts,
    * (count desc, left asc, right asc) under UTF-8 byte order —
    * written against the published algorithm, not the production
    * code path. */
  private def naiveTrain(
      dict: Seq[(String, Long)], rounds: Int): Seq[(String, String, Long)] = {
    def lt(x: String, y: String): Boolean = {
      val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      a.length < b.length
    }
    var vocab = dict.map { case (w, f) => (ByteBpe.symbols(w).toSeq, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var dry = false
    while (out.length < rounds && !dry) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ => ()
        }
      }
      if (counts.isEmpty) dry = true
      else {
        val (a, b) = counts.keys.toSeq.sortWith { case (p, q) =>
          if (counts(p) != counts(q)) counts(p) > counts(q)
          else if (p._1 != q._1) lt(p._1, q._1)
          else lt(p._2, q._2)
        }.head
        out += ((a, b, counts((a, b))))
        vocab = vocab.map { case (syms, f) =>
          val r = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              r += (a + b); i += 2
            } else { r += syms(i); i += 1 }
          }
          (r.toSeq, f)
        }
      }
    }
    out.toSeq
  }

  test("trained ladder == independent replica; tiers agree; multi-byte pair trains") {
    import spark.implicits._
    val dict = Seq(
      ("café", 50L), ("cafés", 20L), ("the", 40L), ("then", 10L),
      ("niño", 30L), ("straße", 25L), ("in", 15L))
    val wf = dict.toDS()
    def run(strategy: String) =
      ByteBpe.train(wf, rounds = 10, strategy = strategy).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
    val local = run("local")
    assert(local === run("distributed"), "tier equality")
    assert(local.map(t => (t._2, t._3, t._5)) === naiveTrain(dict, 10),
      "two-tier trainer must match the independent greedy replica")
    // é carries freq 70 (café+cafés) — byte-fallback content must fuse
    // (possibly via a chain like (af, Ã) → (afÃ, ©), so check bytes,
    // not a literal pair)
    def nonAscii(t: (Int, String, String, String, Long)): Boolean =
      (ByteBpe.decode(t._2) ++ ByteBpe.decode(t._3)).exists(b => (b & 0x80) != 0)
    assert(local.exists(nonAscii),
      s"multi-byte fallback content must train, got ${local.take(3)}")
  }

  test("q216 trains byte merges on the corpus; q217 fertility matches a driver replica") {
    val sf = "/root/testdata/sf0.001"
    val merges = SparkEntry.queries("q216_bytebpe_merges")(spark, sf).collect()
    assert(merges.length === 16)
    // the ×10-weighted accented suffix guarantees byte-fallback merges
    // inside the trained window
    val multiByte = merges.exists(r =>
      (ByteBpe.decode(r.getString(1)) ++ ByteBpe.decode(r.getString(2)))
        .exists(b => (b & 0x80) != 0))
    assert(multiByte, "ladder must contain a byte-fallback (non-ASCII) merge")
    // q217 vs a driver-side replica of the same snippet pipeline
    val got = SparkEntry.queries("q217_bytebpe_fertility")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val want = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (lang, rows) =>
        val perDoc = rows.map { case (_, text) =>
          val snippet = text.substring(0, math.min(64, text.length))
            .toLowerCase + " café straße niño"
          val words = snippet.split("[^\\p{L}]+").filter(_.nonEmpty)
          (words.length.toLong,
            words.map(w => ByteBpe.segment(w, ByteBpe.DemoLadder).length.toLong).sum)
        }
        lang -> ((rows.length.toLong, perDoc.map(_._1).sum, perDoc.map(_._2).sum))
      }
    assert(got === want)
    // byte fallback is visible: fertility strictly above 1 token/word
    got.values.foreach { case (_, w, t) => assert(t > w) }
  }
}
