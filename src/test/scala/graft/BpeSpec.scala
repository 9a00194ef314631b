package graft

import graft.ops.BpeTrain

/** BPE merge training (q97, ops.BpeTrain): correctness against a local
  * greedy replica of the published algorithm, determinism, and the
  * compression property that makes a merge table useful.
  */
class BpeSpec extends SparkSuite {

  /** UTF-8 byte order — the replica must break count ties with the
    * binary collation production uses (Java's UTF-16 compareTo
    * disagrees on supplementary-plane code points, so a default-String
    * minBy would make THE REPLICA the wrong side on a non-ASCII
    * fixture).
    */
  private val utf8: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Reference implementation: single-threaded Sennrich-2016 greedy
    * BPE over a word-frequency map — code-point symbols, UTF-8 argmax
    * tie-break, same as production.
    */
  private def replica(wf: Map[String, Long], rounds: Int): Seq[(String, String, Long)] = {
    var vocab = wf.toSeq.map { case (w, f) => (BpeTrain.symbols(w), f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var r = 0
    while (r < rounds) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        (0 until syms.length - 1).foreach { i =>
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
        }
      }
      if (counts.isEmpty) return out.toSeq
      val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }(
        Ordering.Tuple3(Ordering.Long, utf8, utf8))
      out += ((a, b, c))
      vocab = vocab.map { case (syms, f) => (BpeTrain.applyMerge(syms, a, b), f) }
      r += 1
    }
    out.toSeq
  }

  private def corpusWf: Map[String, Long] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(explode(expr(
        "filter(split(lower(text), '[^a-z]+'), x -> x <> '')")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("f"))
      .as[(String, Long)].collect().toMap
  }

  test("q97 merge table equals the local greedy replica") {
    val got = SparkEntry.queries("q97_bpe_merges")(spark, "/root/testdata/sf0.01")
      .collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    val want = replica(corpusWf, 8)
    assert(got.toSeq == want, s"got=${got.toSeq}\nwant=$want")
    assert(got.length == 8)
  }

  test("local and distributed tiers produce the identical merge table") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val wf = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(explode(expr(
        "filter(split(lower(text), '[^a-z]+'), x -> x <> '')")).as("w"))
      .groupBy($"w").agg(count(lit(1)).cast("long").as("f"))
      .as[(String, Long)]
    val local = BpeTrain.train(wf, rounds = 6, strategy = "local").collect().map(_.toSeq).toSeq
    val dist = BpeTrain.train(wf, rounds = 6, strategy = "distributed").collect().map(_.toSeq).toSeq
    assert(local == dist)
  }

  test("training is deterministic run-over-run") {
    val a = SparkEntry.queries("q97_bpe_merges")(spark, "/root/testdata/sf0.01")
      .collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("q97_bpe_merges")(spark, "/root/testdata/sf0.01")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("applyMerge is the published left-to-right greedy ('aaa' case)") {
    assert(BpeTrain.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(BpeTrain.applyMerge(Array("a", "b", "a", "b"), "a", "b").toSeq == Seq("ab", "ab"))
    assert(BpeTrain.applyMerge(Array("x"), "a", "b").toSeq == Seq("x"))
  }

  test("symbols splits by code point: a surrogate pair is ONE symbol") {
    val w = "a\uD83D\uDE00b" // a, U+1F600 (emoji, surrogate pair), b
    assert(BpeTrain.symbols(w).toSeq ==
      Seq("a", "\uD83D\uDE00", "b", BpeTrain.EndOfWord))
  }

  test("tiers agree on a non-BMP dictionary (UTF-8 argmax tie-break)") {
    import spark.implicits._
    // U+1F600 (4-byte UTF-8) vs U+FFFD (3-byte): Java UTF-16 order and
    // UTF-8 byte order DISAGREE on this pair; counts tie so the merge
    // winner is decided purely by the string tie-break
    val wf = Seq(("\uD83D\uDE00x", 3L), ("\uFFFDx", 3L)).toDS()
    val local = BpeTrain.train(wf, rounds = 2, strategy = "local")
      .collect().map(_.toSeq).toSeq
    val dist = BpeTrain.train(wf, rounds = 2, strategy = "distributed")
      .collect().map(_.toSeq).toSeq
    assert(local == dist)
    // round 1 merges (x, </w>) count 6; round 2 ties (emoji,x</w>) vs
    // (U+FFFD,x</w>) at 3 — UTF-8 byte order puts U+FFFD (EF BF BD)
    // before U+1F600 (F0 9F 98 80), so it must win the tie-break
    assert(local(1)(1) == "\uFFFD", s"round-2 merge left=${local(1)(1)}")
  }

  /** 256 words over 512 distinct code points, each word x y x y x y:
    * the top count tier is the 256 pairwise-DISJOINT (x_i, y_i) pairs
    * at 3f, every pair a merge creates stays at ≤ 2f — so batching is
    * provably greedy-safe for the first 256 merges (no new pair can
    * outrank the tier) and every batch fills to batchK.
    */
  private def batchSafeWf = {
    import spark.implicits._
    (0 until 256).map { i =>
      val x = new String(Character.toChars(0x4E00 + 2 * i))
      val y = new String(Character.toChars(0x4E00 + 2 * i + 1))
      (x + y + x + y + x + y, 5L)
    }.toDS()
  }

  test("batched path equals the greedy replica on a batch-safe fixture") {
    val wf = batchSafeWf
    val want = replica(wf.collect().toMap, 256)
    Seq("local", "distributed").foreach { tier =>
      val got = BpeTrain.trainBatched(wf, rounds = 256, batchK = 32, strategy = tier)
        .collect()
        .sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
      assert(got.length == 256, s"$tier: ${got.length} merges")
      assert(got.toSeq == want, s"$tier diverged from greedy replica")
    }
  }

  test("disjointPrefix stops at merged-string aliasing, not just shared symbols") {
    // applying ("a","bc") creates symbols whose STRING is "abc"; if an
    // "abc" symbol already exists, a same-batch candidate naming it
    // would see a changed count — the batch must stop there even
    // though the symbol sets {a,bc} and {abc,x} are disjoint
    val cands = Seq(("a", "bc", 10L), ("abc", "x", 9L), ("d", "e", 8L))
    assert(BpeTrain.disjointPrefix(cands, 3) == Seq(("a", "bc", 10L)))
    // without aliasing the same shape batches fully
    val clean = Seq(("a", "bc", 10L), ("ab_", "x", 9L), ("d", "e", 8L))
    assert(BpeTrain.disjointPrefix(clean, 3) == clean)
  }

  test("256 merges at batchK=32 run in O(rounds/k) jobs, not O(rounds)") {
    val sc = spark.sparkContext
    sc.setJobGroup("bpe-batch-demo", "bpe batched training demo")
    try BpeTrain.trainBatched(batchSafeWf, rounds = 256, batchK = 32,
      strategy = "distributed").collect()
    finally sc.clearJobGroup()
    Thread.sleep(500) // status store updates via the async listener bus
    val jobs = sc.statusTracker.getJobIdsForGroup("bpe-batch-demo").length
    // 8 batch rounds × (candidate TakeOrdered + rewrite checkpoint, a
    // few AQE stage jobs each) + setup. Strict greedy needs ≥2 jobs ×
    // 256 merges = 512+; the batched path must stay an order below.
    assert(jobs > 0, "job-group tracking returned nothing")
    assert(jobs <= 100, s"batched BPE ran $jobs jobs — batching is not amortizing")
  }

  test("trained merges compress the training words") {
    val wf = corpusWf
    val merges = replica(wf, 8).map { case (a, b, _) => (a, b) }
    val before = wf.map { case (w, f) => (w.length + 1).toLong * f }.sum
    val after = wf.map { case (w, f) => BpeTrain.segment(w, merges).length.toLong * f }.sum
    assert(after < before, s"after=$after before=$before")
    // 8 merges on a 31-word vocab must bite hard on total symbol count
    assert(after.toDouble / before < 0.9, s"ratio=${after.toDouble / before}")
  }

  test("q106's fixed-width replace chain is exact BPE apply") {
    // reference: symbol-list BPE apply — each merge rewrites ALL
    // left-to-right non-overlapping (a,b) adjacencies, in ladder order
    def ref(text: String, merges: Seq[(String, String)]): List[String] =
      merges.foldLeft(text.map(_.toString).toList) { case (syms, (a, b)) =>
        val out = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toList
      }
    def sym(s: String) = "|" + s.padTo(3, '_')
    val merges = Seq(
      "t" -> "h", "th" -> "e", "a" -> "a", "s" -> "t", "st" -> "h")
    // adjacency chains ("ththth"), repeats (odd/even runs), the
    // prefix-aliasing hazard that breaks delimiter-only encodings
    // ("sth": after t+h→th, the later s+t rule must NOT match the 't'
    // prefix inside the 'th' symbol), and ladder build-up ("the")
    val fixtures = Seq(
      "ththth", "aaaa", "aaa", "aaaaaa", "sth", "the then ", "xsthx", "tsth")
    val applied = merges.foldLeft("s") { case (e, (a, b)) =>
      s"replace($e, '${sym(a)}${sym(b)}', '${sym(a + b)}')"
    }
    fixtures.foreach { f =>
      val enc = f.map(c => sym(c.toString)).mkString
      val got = spark.sql(s"SELECT $applied FROM (SELECT '$enc' AS s)")
        .head().getString(0).split('|').filter(_.nonEmpty)
        .map(_.replace("_", "")).toList
      assert(got == ref(f, merges), s"'$f': $got != ${ref(f, merges)}")
    }
  }
}
