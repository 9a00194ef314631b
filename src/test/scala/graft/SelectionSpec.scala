package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the data-selection operators (q92–q96) that go
  * beyond the DuckDB hash oracle: invariants the SQL mirror would
  * reproduce even if both sides were wrong the same way.
  */
class SelectionSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("q92 semdedup: greedy keep-lowest-representative invariants hold") {
    val rows = SparkEntry.queries("q92_semdedup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.length == spark.read.parquet(s"$sf/embeddings.parquet").count())
    // every vector carries a verdict; dropped ⇔ a lower-id cluster-mate
    // at sim >= τ exists
    rows.foreach { case (vid, _, msim, keep) =>
      assert(keep == (if (msim < 0.3) 1L else 0L), s"vec $vid verdict/msim disagree")
    }
    // the lowest vec_id of every cluster can have no lower-id mate
    rows.groupBy(_._2).foreach { case (cid, vs) =>
      val lowest = vs.minBy(_._1)
      assert(lowest._3 == -1.0 && lowest._4 == 1L,
        s"cluster $cid lowest id ${lowest._1} must be kept with no lower mate")
    }
    // τ at the p99 of within-cluster sims: some drops, never a wipeout
    val dropped = rows.count(_._4 == 0L)
    assert(dropped > 0 && dropped < rows.length / 2, s"dropped=$dropped")
  }

  test("q92 semdedup: kept set is exactly the greedy scan (local replica)") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def cid(e: Array[Float]): Long =
      (if (e(0) > 0) 1L else 0L) + (if (e(1) > 0) 2L else 0L) +
        (if (e(2) > 0) 4L else 0L) + (if (e(3) > 0) 8L else 0L)
    val expected = emb.toSeq.sortBy(_._1).map { case (vid, e) =>
      val mates = emb.filter { case (u, f) => u < vid && cid(f) == cid(e) }
      val msim = if (mates.isEmpty) -1.0 else mates.values.map(cos(_, e)).max
      vid -> (msim < 0.3)
    }.toMap
    val got = SparkEntry.queries("q92_semdedup")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(3) == 1L)).toMap
    assert(got == expected)
  }

  test("q93 dsir: en documents weigh above the pool mean, non-en below") {
    import spark.implicits._
    val lang = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    val w = SparkEntry.queries("q93_dsir_weight")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getLong(3)))
    assert(w.length == lang.size)
    w.foreach { case (_, avgR, sel) => assert(sel == (if (avgR > 1.0) 1L else 0L)) }
    val (en, rest) = w.partition(x => lang(x._1) == "en")
    val enMean = en.map(_._2).sum / en.length
    val restMean = rest.map(_._2).sum / rest.length
    // the target LM is trained ON the en slice — its docs must score
    // higher on average than the rest of the pool
    assert(enMean > restMean, s"enMean=$enMean restMean=$restMean")
  }

  test("q94 novelty: every bigram type is novel for exactly one document") {
    val rows = SparkEntry.queries("q94_ngram_novelty")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // novel counts partition the global type set: sum over docs of
    // n_novel = |distinct bigrams in corpus|
    import spark.implicits._
    val totalTypes = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(expr(
        """transform(sequence(1, size(filter(split(lower(text), '[^a-z]+'), x -> x <> ''))-1),
           i -> concat(element_at(filter(split(lower(text), '[^a-z]+'), x -> x <> ''), i), ' ',
                       element_at(filter(split(lower(text), '[^a-z]+'), x -> x <> ''), i+1)))""")).as("bg"))
      .distinct().count()
    assert(rows.map(_._4).sum == totalTypes)
    rows.foreach { case (d, nb, nt, nn) =>
      assert(nt <= nb && nn <= nt, s"doc $d: types=$nt bigrams=$nb novel=$nn")
    }
    // doc 0 (the corpus-order first) is all-novel by definition
    val d0 = rows.find(_._1 == rows.map(_._1).min).get
    assert(d0._3 == d0._4, s"first doc must be fully novel: $d0")
  }

  test("q95 bm25: scores positive, bounded by (k1+1)*sum(idf), tf-monotone") {
    val docs = SparkEntry.queries("q95_bm25")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(docs.nonEmpty)
    docs.foreach { case (d, dl, nq, score) =>
      assert(nq >= 1 && nq <= 3 && dl > 0, s"doc $d")
      assert(score > 0.0, s"doc $d score=$score")
    }
    // raw-ratio idf <= N/0.5 per term; tf part < k1+1 = 2.2 — loose cap
    val n = docs.length.toDouble
    val cap = 2.2 * 3 * ((n + 0.5) / 0.5)
    docs.foreach { case (d, _, _, s) => assert(s < cap, s"doc $d score=$s cap=$cap") }
  }

  test("q96 textrank: ranks sum to 1 and every node gets the base mass") {
    val pr = SparkEntry.queries("q96_textrank")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val n = pr.size
    assert(n > 10, s"vocab-sized graph expected, got $n nodes")
    // PageRank with dangling redistribution conserves probability mass
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, s"mass=${pr.values.sum}")
    pr.foreach { case (w, p) =>
      assert(p >= 0.15 / n - 1e-12, s"node $w below base mass: $p")
    }
    // the rank vector must not be uniform — the synthetic word graph is
    // NEAR-regular (uniform random vocab), so assert spread, not ratio
    assert(pr.values.max - pr.values.min > 1e-4,
      s"degenerate ranks: max=${pr.values.max} min=${pr.values.min}")
  }

  test("q109 classifier: exact ppm weight math on a planted two-token corpus") {
    import spark.implicits._
    // 'good' (bucket 57) only in en docs, 'bad' (bucket 35) only in de
    // docs — verified distinct mod 256. Hand math: w_good =
    // (5+1)·10⁶ div (5+2) = 857142, w_bad = (0+1)·10⁶ div (5+2) =
    // 142857, prior = (5+1)·10⁶ div (10+2) = 500000.
    val docs = Seq(
      (1L, "en", "good good good"), (2L, "en", "good good"),
      (3L, "de", "bad bad bad"), (4L, "de", "bad bad")).toDF("doc_id", "lang", "text")
    val got = graft.queries.Selection.qualityClassifier(docs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4))))
      .toMap
    assert(got(1L) == ((3L, 3L * 857142 - 3L * 500000, 1L)), s"got $got")
    assert(got(2L) == ((2L, 2L * 857142 - 2L * 500000, 1L)))
    assert(got(3L) == ((3L, 3L * 142857 - 3L * 500000, 0L)))
    assert(got(4L) == ((2L, 2L * 142857 - 2L * 500000, 0L)))
  }

  test("q109 classifier: separates the reference slice on the real corpus") {
    import spark.implicits._
    val sc = SparkEntry.queries("q109_quality_classifier")(spark, sf)
    val byLang = sc.join(
        spark.read.parquet(s"$sf/documents.parquet").select($"doc_id", $"lang"),
        "doc_id")
      .groupBy($"lang" === "en")
      .agg(avg($"score").as("ms"), avg($"sel").as("sr"))
      .collect().map(r => r.getBoolean(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    val (enScore, enRate) = byLang(true)
    val (otherScore, otherRate) = byLang(false)
    assert(enScore > otherScore,
      s"en mean score $enScore must exceed non-en $otherScore")
    assert(enRate > otherRate,
      s"en sel rate $enRate must exceed non-en $otherRate")
    // every scored doc appears exactly once with a verdict in {0,1}
    assert(sc.filter($"sel" =!= 0L && $"sel" =!= 1L).count() == 0L)
  }
}
