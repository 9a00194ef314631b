package graft

import org.apache.spark.sql.functions._

/** Multimodal.videoFrameHashes + Llm.setSimJoinSets (q199): REAL
  * animated-GIF transforms. A re-encode of the same frames pairs at
  * Jaccard 1, a frame REORDER pairs at 1 (sets are order-free by
  * design), a one-frame drop pairs exactly ON the 4/5 gate, a distinct
  * video stays out; stub blobs chunk deterministically; and the whole
  * mixed-route pair output equals a brute-force Jaccard replica.
  */
class VideoDupSpec extends SparkSuite {

  import TestScenes.{animatedGif, sceneImage}

  private def gif(seeds: Int*): Array[Byte] =
    animatedGif(seeds.map(sd => sceneImage(sd, 110, 60)))

  test("real GIF route: per-frame dHash count, re-encode stability") {
    import spark.implicits._
    val a = gif(1, 2, 3, 4, 5)
    val b = gif(1, 2, 3, 4, 5) // independent re-encode of the same rasters
    val rows = graft.ops.Multimodal.videoFrameHashes(
        Seq((1L, a, "image/gif"), (2L, b, "image/gif"),
          (3L, "definitely not a gif".getBytes("UTF-8"), "text/plain"))
          .toDF("doc_id", "media", "mime_hint"), chunkBytes = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

    val byDoc = rows.groupBy(_._1)
    assert(byDoc(1L).length == 5, "five frames, five hashes")
    assert(byDoc(1L).forall(_._4), "GIF frames take the real route")
    assert(!byDoc(3L).head._4, "text blob takes the stub route")
    val ha = byDoc(1L).sortBy(_._2).map(_._3)
    val hb = byDoc(2L).sortBy(_._2).map(_._3)
    assert(ha.sameElements(hb), "re-encoded rasters must hash identically per frame")
    assert(ha.distinct.length == 5, "distinct scenes produce distinct frame hashes")
    ha.foreach(h => assert(h >= 0L && h < (1L << 60)))
  }

  test("pair semantics: re-encode=1, reorder=1, one-frame-drop=0.8, distinct stays out") {
    import spark.implicits._
    val vids: Seq[(Long, Array[Byte], String)] = Seq(
      (1L, gif(1, 2, 3, 4, 5), "image/gif"),
      (2L, gif(1, 2, 3, 4, 5), "image/gif"),  // re-encode
      (3L, gif(5, 4, 3, 2, 1), "image/gif"),  // reorder (re-cut)
      (4L, gif(1, 2, 3, 4), "image/gif"),     // last frame dropped
      (5L, gif(6, 7, 8, 9, 10), "image/gif")) // distinct video
    val sets = graft.ops.Multimodal.videoFrameHashes(
        vids.toDF("doc_id", "media", "mime_hint"), chunkBytes = 64)
      .groupBy($"doc_id")
      .agg(array_distinct(collect_list($"fhash")).as("gs"))
    val got = graft.queries.Llm.setSimJoinSets(sets, 4, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap

    assert(got((1L, 2L)) == 1.0, s"re-encode: ${got.get((1L, 2L))}")
    assert(got((1L, 3L)) == 1.0, s"reorder: ${got.get((1L, 3L))}")
    assert(got((1L, 4L)) == 0.8, s"frame drop: ${got.get((1L, 4L))}")
    assert(!got.keySet.exists(k => k._1 == 5L || k._2 == 5L),
      "distinct video must not pair")
  }

  test("mixed real+stub pair output ≡ brute-force Jaccard replica") {
    import spark.implicits._
    val blobs: Seq[(Long, Array[Byte], String)] = Seq(
      (1L, gif(1, 2, 3, 4, 5), "image/gif"),
      (2L, gif(2, 3, 4, 5, 1), "image/gif"),
      (3L, gif(11, 12, 13), "image/gif")) ++
      (10L to 25L).map { i =>
        // stub "videos": ten 64-char blocks sliding by one — adjacent
        // docs share 9 of 11 union (jac ≈ 0.818, just ABOVE the 4/5
        // gate), two apart share 8 of 12 (0.667, below): both sides
        // of the threshold are exercised on the stub route
        val blocks = (0 to 9).map(b => f"block-${i + b}%04d".padTo(64, 'x'))
        (i, blocks.mkString.getBytes("UTF-8"), "video/fake")
      }
    val df = blobs.toDF("doc_id", "media", "mime_hint")
    val fh = graft.ops.Multimodal.videoFrameHashes(df, chunkBytes = 64)
      .localCheckpoint()
    val sets = fh.groupBy($"doc_id")
      .agg(array_distinct(collect_list($"fhash")).as("gs"))
    val got = graft.queries.Llm.setSimJoinSets(sets, 4, 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    val hs = fh.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (d, a) => d -> a.map(_._2).toSet }
    val brute = (for {
      (d1, s1) <- hs; (d2, s2) <- hs if d1 < d2
      inter = (s1 & s2).size
      if inter * 9 >= 4 * (s1.size + s2.size)
    } yield (d1, d2, inter.toLong, s1.size.toLong, s2.size.toLong)).toSet

    assert(got == brute, s"got ${got.size} pairs, brute ${brute.size}")
    assert(brute.nonEmpty, "the planted block sharing must produce pairs")
    info(s"${brute.size} video near-dup pairs, PPJoin core exact on LONG sets")
  }

  test("decoder totality: GIF-prefixed fuzz stubs to chunk hashes, never throws") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows: Seq[(Long, Array[Byte], String)] = (0 until 200).map { i =>
      val len = 6 + rng.nextInt(1024)
      val b = new Array[Byte](len)
      rng.nextBytes(b)
      if (i % 2 == 0) "GIF89a".getBytes("US-ASCII").copyToArray(b, 0)
      (i.toLong, b, "video/fuzz")
    }
    val out = graft.ops.Multimodal.videoFrameHashes(
        rows.toDF("doc_id", "media", "mime_hint"), chunkBytes = 64)
      .collect()
    assert(out.nonEmpty)
    // every blob produced its stub chunk count (a corrupt GIF must
    // fall through to the chunk path, not vanish or throw)
    val byDoc = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    rows.foreach { case (id, b, _) =>
      val want = math.max(b.length / 64, 1)
      // real-route GIFs (if the reader accepts a fuzz blob, which is
      // legal) report their true frame count instead
      if (!out.find(_.getLong(0) == id).get.getBoolean(3))
        assert(byDoc(id) == want, s"doc $id: ${byDoc(id)} vs $want")
    }
  }

  test("cross-set probe (q202 core) ≡ brute-force replica; batch-bounded") {
    import spark.implicits._
    def stub(i: Long, first: Long, nBlocks: Int): (Long, Array[Byte], String) =
      (i, (0 until nBlocks).map(b => f"blk-${first + b}%05d".padTo(64, 'x'))
        .mkString.getBytes("UTF-8"), "video/fake")
    // corpus: 12 videos over a shared block universe
    val corpus = (0L to 11L).map(i => stub(i, i * 3, 10))
    // batch: a tail-truncated clone of video 4 (9 of its 10 blocks →
    // jac 0.9), a half-overlap (below gate), and a fresh video
    val batch = Seq(
      stub(-1L, 12L, 9),   // video 4's blocks are 12..21; this is 12..20
      stub(-2L, 14L, 5),   // partial overlap with several — below 4/5
      stub(-3L, 500L, 8))  // disjoint
    def sets(rows: Seq[(Long, Array[Byte], String)]) =
      graft.ops.Multimodal.videoFrameHashes(
          rows.toDF("doc_id", "media", "mime_hint"), chunkBytes = 64)
        .groupBy($"doc_id")
        .agg(array_distinct(collect_list($"fhash")).as("gs"))
    val got = graft.queries.Llm.setSimProbe(sets(corpus), sets(batch), 4, 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    def hashSets(rows: Seq[(Long, Array[Byte], String)]) =
      graft.ops.Multimodal.videoFrameHashes(
          rows.toDF("doc_id", "media", "mime_hint"), chunkBytes = 64)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (d, a) => d -> a.map(_._2).toSet }
    val cs = hashSets(corpus); val bs = hashSets(batch)
    val brute = (for {
      (cd, s1) <- cs; (bd, s2) <- bs
      inter = (s1 & s2).size
      if inter * 9 >= 4 * (s1.size + s2.size)
    } yield (cd, bd, inter.toLong, s1.size.toLong, s2.size.toLong)).toSet

    assert(got == brute, s"got $got\nbrute $brute")
    assert(brute.exists(t => t._1 == 4L && t._2 == -1L),
      "the truncated clone must find its corpus original")
    assert(!brute.exists(t => t._2 == -3L), "the fresh video must match nothing")

    // duplicated state postings (a doc re-arriving across stream
    // batches writes its rows twice) must NOT double-count n_inter —
    // the probe dedups the batch-restricted stream
    val posts = sets(corpus).select($"doc_id",
      size($"gs").cast("long").as("n"), explode($"gs").as("g"))
    val gotDup = graft.queries.Llm.setSimProbePostings(
        posts.unionByName(posts), sets(batch), 4, 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(gotDup == brute, "duplicated postings changed the probe output")
  }
}
