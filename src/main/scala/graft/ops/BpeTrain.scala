package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich, Haddow, Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the tokenizer-training pass of an LLM data pipeline, distributed.
  *
  * Classic BPE trains on the WORD-FREQUENCY dictionary, not the raw
  * corpus: a word contributes its adjacent-pair counts weighted by its
  * corpus frequency. That makes the scale shape the q96 posture — the
  * corpus-sized work is ONE tokenize+count aggregation (map-side
  * combined, text never shuffles past it); every merge round then runs
  * on the |vocab| frame: pair counting is an explode + one hash agg,
  * the winning pair is a 1-row TakeOrdered collect (k-bounded driver
  * contract), and the rewrite is a scan-parallel map. localCheckpoint
  * per round keeps the lineage linear across rounds, with every
  * superseded checkpoint unpersisted (the q45/q96 eager-iteration
  * discipline — thousands of real merge rounds must not accumulate
  * thousands of cached vocab copies).
  *
  * Determinism: pair counts are exact integer sums; the winner is
  * argmax by (count desc, left asc, right asc) with strings compared
  * as UTF-8 bytes in BOTH tiers (Spark's binary collation — Java's
  * UTF-16 compareTo disagrees on supplementary-plane code points); no
  * RNG anywhere. Rewrites apply the merge left-to-right (so "aaa"
  * under merge (a,a) becomes ["aa","a"], the published greedy
  * semantics), and words split into CODE-POINT symbols — a
  * surrogate-pair character is one symbol, never two lone surrogates.
  * Same corpus → bit-identical merge table, every run and every tier
  * (BpeSpec pins run-over-run and tier equality plus a local-replica
  * agreement).
  */
object BpeTrain {

  /** End-of-word marker (kept distinct from every real character). */
  val EndOfWord = "</w>"

  /** Code-point symbol split (surrogate-pair safe) + end marker. */
  def symbols(word: String): Array[String] =
    word.codePoints().toArray.map(cp => new String(Character.toChars(cp))) :+ EndOfWord

  /** Apply one merge rule left-to-right to a symbol sequence. */
  def applyMerge(syms: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Train `rounds` merges over a (word, freq) dictionary. Returns the
    * merge table (rank, left, right, merged, pair_count) in merge
    * order — rank 1 is the first (highest-count) merge.
    *
    * Two execution tiers (the [[PageRank]]/[[ConnectedComponents]]
    * `auto` pattern), bit-identical by construction — pair counts are
    * exact integer sums (order-free) and the argmax is the same total
    * order in both:
    *  - `local`: dictionary ≤ threshold rows → collect once, run the
    *    rounds on driver arrays (one job instead of 2·rounds);
    *  - `distributed`: per round one explode+agg, a 1-row TakeOrdered
    *    collect, and a scan-parallel rewrite — the path for web-scale
    *    vocabularies.
    */
  def train(
      wordFreq: Dataset[(String, Long)],
      rounds: Int,
      strategy: String = "auto",
      localThreshold: Long = 1000000L): DataFrame = strategy match {
    case "local" => trainLocal(wordFreq, rounds)
    case "distributed" => trainDistributed(wordFreq.localCheckpoint(), rounds)
    case "auto" =>
      // materialize the dictionary ONCE: the threshold probe is an
      // action, and without this the upstream corpus-sized word-count
      // aggregation would execute twice (the ConnectedComponents.auto
      // rationale)
      val wf = wordFreq.localCheckpoint()
      if (wf.count() <= localThreshold) {
        val r = trainLocal(wf, rounds)
        Checkpoints.release(wf)
        r
      } else trainDistributed(wf, rounds) // releases wf when done
    case other => throw new IllegalArgumentException(s"unknown strategy $other")
  }

  /** Driver tier: the greedy loop over a collected dictionary
    * (vocab-bounded by the caller's threshold).
    */
  def trainLocal(wordFreq: Dataset[(String, Long)], rounds: Int): DataFrame = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    var vocab = wordFreq.collect().map { case (w, f) => (symbols(w), f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    val ord = PageRank.utf8Order
    var r = 0
    var dry = false
    while (r < rounds && !dry) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) dry = true
      else {
        // argmax by (count desc, left asc, right asc) under UTF-8
        // byte order — the order the distributed tier's orderBy uses
        var best: ((String, String), Long) = null
        counts.foreach { kv =>
          if (best == null) best = kv
          else {
            val c = java.lang.Long.compare(kv._2, best._2)
            val byKey =
              if (c != 0) -c
              else {
                val l = ord.compare(kv._1._1, best._1._1)
                if (l != 0) l else ord.compare(kv._1._2, best._1._2)
              }
            if (byKey < 0) best = kv
          }
        }
        val ((a, b), c) = best
        merges += ((r + 1, a, b, a + b, c))
        vocab = vocab.map { case (syms, f) => (applyMerge(syms, a, b), f) }
        r += 1
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Distributed tier: vocab frame stays on executors; one agg + 1-row
    * TakeOrdered + rewrite per round. `wordFreq` must already be
    * materialized (every public entry localCheckpoints it); it is
    * released before the rounds start.
    */
  private def trainDistributed(wordFreq: Dataset[(String, Long)], rounds: Int): DataFrame = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    var vocab: Dataset[(Array[String], Long)] = wordFreq
      .map { case (w, f) => (symbols(w), f) }
      .localCheckpoint()
    Checkpoints.release(wordFreq)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var r = 0
    var dry = false
    while (r < rounds && !dry) {
      val winner = vocab.flatMap { case (syms, f) =>
        (0 until syms.length - 1).map(i => ((syms(i), syms(i + 1)), f))
      }
        .groupByKey(_._1)
        .mapValues(_._2)
        .reduceGroups(_ + _)
        .map { case ((a, b), c) => (a, b, c) }
        .orderBy(col("_3").desc, col("_1").asc, col("_2").asc)
        .limit(1)
        .collect()
      if (winner.isEmpty) dry = true
      else {
        val (a, b, c) = winner(0)
        merges += ((r + 1, a, b, a + b, c))
        val next = vocab
          .map { case (syms, f) => (applyMerge(syms, a, b), f) }
          .localCheckpoint()
        // release the superseded round's vocab blocks
        Checkpoints.release(vocab)
        vocab = next
        r += 1
      }
    }
    Checkpoints.release(vocab)
    merges.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Segment a word with a trained merge list (applied in rank order)
    * — the tokenizer-apply side, used by BpeSpec to check that trained
    * merges actually compress the training corpus.
    */
  def segment(word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms = symbols(word)
    merges.foreach { case (a, b) => syms = applyMerge(syms, a, b) }
    syms
  }
}
