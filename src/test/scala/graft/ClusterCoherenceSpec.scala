package graft

/** q145_cluster_coherence (transitive-closure audit over q45's dedup
  * clusters): a planted CHAIN A~B~C — adjacent Jaccard ≈ 0.48, ends
  * at ≈ 0.23, below the 0.35 verify bar — must report exactly one
  * chained member (C survives no verified edge to the canonical A yet
  * q85 would delete it), while a planted exact TRIANGLE reports all
  * members direct; and the whole output must equal a first-principles
  * JVM replica (union-find labels + coherence algebra over the
  * engine's own verified pair stream), every double ==.
  */
class ClusterCoherenceSpec extends SparkSuite {

  /** Superset chain A ⊂ B ⊂ C (50/100/200 chars, seed 33 tuned so
    * LSH candidates exactly the adjacent pairs): shingle-set algebra
    * gives jac(A,B) = 46/96, jac(B,C) = 96/196, jac(A,C) = 46/196 —
    * the two adjacent edges verify at ≥ 0.35, the ends fail even if
    * candidated. Plus an exact triple (one text, three ids) and an
    * unrelated clean doc that appears in no pair.
    */
  private def fixture: Seq[(Long, String)] = {
    val r = new scala.util.Random(33)
    def seg(n: Int): String =
      (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    val a = seg(50)
    val b = a + seg(50)
    val c = b + seg(100)
    val triple = "the very same boilerplate page served from three mirrors " * 4
    Seq((10L, a), (11L, b), (12L, c),
      (20L, triple), (21L, triple), (22L, triple),
      (30L, "an unrelated clean document with entirely distinct words"))
  }

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("coh").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("chain reports one chained member; exact triangle reports none") {
    val dir = writeDocs(fixture)
    val got = SparkEntry.queries("q145_cluster_coherence")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got.keySet == Set(10L, 20L), s"clusters: ${got.keySet}")
    // chain {10,11,12}: edges (10,11) and (11,12) only — 12 is
    // reachable from the canonical only through 11
    val (nm, ne, minJ, maxJ, nd, nc) = got(10L)
    assert(nm == 3L && ne == 2L, s"chain shape: ${got(10L)}")
    assert(nd == 1L && nc == 1L, s"chain direct/chained: ${got(10L)}")
    assert(minJ == 46.0 / 96.0 && maxJ == 96.0 / 196.0,
      s"chain jacs: ${got(10L)}")
    // exact triple: all three pairwise edges at jac 1.0, no chaining
    assert(got(20L) == ((3L, 3L, 1.0, 1.0, 2L, 0L)), s"triangle: ${got(20L)}")
  }

  test("output ≡ JVM union-find + coherence replica on the engine's pair stream") {
    import spark.implicits._
    val dir = writeDocs(fixture)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pairs = graft.queries.Llm.minhashLshPairs(docs, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pairs.nonEmpty)
    // union-find labels (min-id representative, q45's convention)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val label = members.map(v => v -> find(v)).toMap
    val want = label.values.toSeq.distinct.sorted.map { cid =>
      val ms = members.filter(label(_) == cid)
      val es = pairs.filter(p => label(p._1) == cid)
      val directPartners = es.collect {
        case (a, b, _) if a == cid => b
        case (a, b, _) if b == cid => a
      }.distinct
      (cid, ms.size.toLong, es.size.toLong,
        es.map(_._3).min, es.map(_._3).max,
        directPartners.size.toLong,
        ms.size.toLong - 1L - directPartners.size.toLong)
    }.toSet
    val got = SparkEntry.queries("q145_cluster_coherence")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(got == want, s"got $got\nwant $want")
  }
}
