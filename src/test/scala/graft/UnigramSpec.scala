package graft

import graft.ops.UnigramTrain
import graft.ops.UnigramTrain.Config

/** ops.UnigramTrain (Kudo 2018 unigram-LM training): the trained
  * vocabulary equals a from-scratch EM replica on a fixture corpus,
  * both tiers produce the identical frame, training is deterministic
  * run-over-run, the trained pieces actually compress the training
  * words under Viterbi segmentation, and the batched EM rounds stay
  * within a job budget (the BpeSpec listener discipline).
  */
class UnigramSpec extends SparkSuite {

  private val dict: Seq[(String, Long)] = Seq(
    ("lowering", 20L), ("lower", 30L), ("lowest", 25L), ("newer", 40L),
    ("newest", 35L), ("wider", 15L), ("widest", 10L), ("low", 50L),
    ("new", 60L), ("wide", 20L), ("slower", 12L), ("slowest", 8L))

  private val cfg = Config(
    vocabSize = 12, seedSize = 64, maxPieceLen = 4, emRounds = 2, shrink = 0.5)

  private def toRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSeq

  // ---- from-scratch replica: plain-Scala EM with the documented
  // quantization, written independently of the op's internals (only
  // the public per-word kernel's CONTRACT is replicated, not called)
  private def replica(): Seq[(String, Long)] = {
    val quantum = 1e-6
    def cps(w: String) = w.toCharArray.map(_.toString) // fixture is BMP/ASCII
    // seed: substring counts
    val seed = scala.collection.mutable.HashMap.empty[String, Long]
    dict.foreach { case (w, f) =>
      val c = cps(w)
      for (i <- c.indices; j <- (i + 1) to math.min(i + cfg.maxPieceLen, c.length))
        seed.updateWith(c.slice(i, j).mkString)(o => Some(o.getOrElse(0L) + f))
    }
    val singles = seed.keySet.filter(_.length == 1).toSet
    def utf8Lt(a: String, b: String): Boolean = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    def rank(m: Iterable[(String, Long)]) =
      m.toSeq.sortWith((a, b) => if (a._2 != b._2) a._2 > b._2 else utf8Lt(a._1, b._1))
    var vocab: Map[String, Double] = {
      val multi = rank(seed.filter(_._1.length > 1)).take(cfg.seedSize).map(_._1)
      val keep = singles ++ multi
      val tot = keep.iterator.map(seed).sum
      keep.iterator.map(p =>
        p -> (StrictMath.log(seed(p).toDouble) - StrictMath.log(tot.toDouble))).toMap
    }
    // EM rounds with the op's shrink schedule
    val sched = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var m = vocab.keys.count(_.length > 1)
      while (m > cfg.vocabSize) {
        m = math.max(cfg.vocabSize, math.ceil(m * cfg.shrink).toInt)
        (0 until cfg.emRounds).foreach(_ => out += m)
      }
      (0 until cfg.emRounds).foreach(_ => out += cfg.vocabSize)
      out.toSeq
    }
    var last = Map.empty[String, Long]
    sched.foreach { keepMulti =>
      val acc = scala.collection.mutable.HashMap.empty[String, Long]
      dict.foreach { case (w, f) =>
        val c = cps(w); val n = c.length
        // forward-backward in log space, fixed order
        val edges = for {
          i <- 0 until n
          j <- (i + 1) to math.min(i + cfg.maxPieceLen, n)
          p = c.slice(i, j).mkString if vocab.contains(p)
        } yield (i, j, p, vocab(p))
        def lse(xs: Seq[Double]): Double =
          if (xs.isEmpty) Double.NegativeInfinity
          else {
            val m = xs.max
            if (m == Double.NegativeInfinity) m
            else m + StrictMath.log(xs.map(x => StrictMath.exp(x - m)).sum)
          }
        val al = Array.fill(n + 1)(Double.NegativeInfinity); al(0) = 0.0
        for (pos <- 1 to n)
          al(pos) = lse(edges.collect {
            case (i, j, _, lp) if j == pos && al(i) != Double.NegativeInfinity => al(i) + lp })
        val be = Array.fill(n + 1)(Double.NegativeInfinity); be(n) = 0.0
        for (pos <- n - 1 to 0 by -1)
          be(pos) = lse(edges.collect {
            case (i, j, _, lp) if i == pos && be(j) != Double.NegativeInfinity => lp + be(j) })
        val z = al(n)
        val perWord = scala.collection.mutable.LinkedHashMap.empty[String, Double]
        edges.foreach { case (i, j, p, lp) =>
          val post = StrictMath.exp(al(i) + lp + be(j) - z)
          if (post > 0.0) perWord.updateWith(p)(o => Some(o.getOrElse(0.0) + post))
        }
        perWord.foreach { case (p, e) =>
          val q = math.rint(f * e / quantum).toLong
          if (q > 0L) acc.updateWith(p)(o => Some(o.getOrElse(0L) + q))
        }
      }
      last = acc.toMap
      val multi = rank(vocab.keys.filter(_.length > 1)
        .map(p => (p, last.getOrElse(p, 0L))).filter(_._2 > 0L)).take(keepMulti)
      val kept = singles.map(p => (p, math.max(last.getOrElse(p, 0L), 1L))) ++ multi
      val tot = kept.iterator.map(_._2).sum
      vocab = kept.iterator.map { case (p, cq) =>
        p -> (StrictMath.log(cq.toDouble) - StrictMath.log(tot.toDouble)) }.toMap
    }
    rank(vocab.keys.map(p => (p, math.max(last.getOrElse(p, 0L), 1L))))
  }

  test("trained vocabulary equals the from-scratch EM replica") {
    import spark.implicits._
    val got = toRows(UnigramTrain.train(dict.toDS(), cfg, strategy = "local"))
    val want = replica()
    assert(got.map(r => (r._2, r._4)) === want,
      s"op: ${got.map(r => (r._2, r._4))}\nreplica: $want")
    // ranks are 1-based in replica order
    assert(got.map(_._1) === (1 to want.length))
  }

  test("local and distributed tiers produce the identical frame") {
    import spark.implicits._
    val l = toRows(UnigramTrain.train(dict.toDS(), cfg, strategy = "local"))
    val d = toRows(UnigramTrain.train(dict.toDS(), cfg, strategy = "distributed"))
    assert(l === d)
  }

  test("training is deterministic run-over-run") {
    import spark.implicits._
    val a = toRows(UnigramTrain.train(dict.toDS(), cfg))
    val b = toRows(UnigramTrain.train(dict.toDS(), cfg))
    assert(a === b)
  }

  test("trained pieces compress the training words under Viterbi") {
    import spark.implicits._
    val vocab = toRows(UnigramTrain.train(dict.toDS(), cfg))
      .map(r => r._2 -> r._3).toMap
    val (nPieces, nChars) = dict.map { case (w, f) =>
      val segs = UnigramTrain.segment(w, vocab, cfg.maxPieceLen)
      assert(segs.mkString === w, s"segmentation must reassemble $w: ${segs.toSeq}")
      (f * segs.length, f * w.length)
    }.reduce((x, y) => (x._1 + y._1, x._2 + y._2))
    // the whole point of training: far fewer pieces than characters
    assert(nPieces.toDouble / nChars < 0.55,
      s"compression ratio ${nPieces.toDouble / nChars} (pieces=$nPieces chars=$nChars)")
    // and multi-char pieces actually appear in segmentations
    assert(dict.exists { case (w, _) =>
      UnigramTrain.segment(w, vocab, cfg.maxPieceLen).exists(_.length > 1) })
  }

  test("EM rounds run in O(schedule) jobs, not O(pieces)") {
    import spark.implicits._
    val sc = spark.sparkContext
    sc.setJobGroup("unigram-demo", "unigram job-count demo")
    try UnigramTrain.train(dict.toDS(), cfg, strategy = "distributed")
    finally sc.clearJobGroup()
    Thread.sleep(500) // status store updates via the async listener bus
    val jobs = sc.statusTracker.getJobIdsForGroup("unigram-demo").length
    assert(jobs > 0, "job-group tracking returned nothing")
    // schedule here is ~3 prune plateaus x 2 rounds + seed + checkpoint
    // setup; with per-piece round-trips this would be hundreds
    assert(jobs <= 40, s"unigram EM ran $jobs jobs — rounds are not amortizing")
  }
}
