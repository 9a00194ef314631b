package graft

import org.apache.spark.sql.functions._

/** q207 media split leakage: every reported row is a val/test blob
  * with a train-side q195 near-dup partner — the report is a pure
  * restriction of the q195 pair stream through the SAME split
  * expression q53 training uses, so the spec re-derives it from those
  * two building blocks and checks set equality.
  */
class MediaLeakSpec extends SparkSuite {

  test("report ≡ q195 pairs restricted to eval←train edges") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q207_media_split_leakage")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .toSet

    val pairs = SparkEntry.queries("q195_image_phash_dup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    import spark.implicits._
    val ids = (pairs.map(_._1) ++ pairs.map(_._2)).distinct.toSeq
    val splits = ids.toDF("id")
      .select($"id", graft.queries.TrainPrep.splitOf($"id").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val want = (pairs.flatMap { case (d1, d2, h) =>
      Seq((d1, d2, h), (d2, d1, h)) }
      .collect { case (d, p, h)
        if (splits(d) == "val" || splits(d) == "test") && splits(p) == "train" =>
        (d, splits(d), p, splits(p), h) }).toSet
    assert(got == want, s"got ${got.size} rows, want ${want.size}")
    got.foreach { case (_, s, _, ps, h) =>
      assert((s == "val" || s == "test") && ps == "train" && h <= 5)
    }
    info(s"${got.size} contaminated eval blobs on the sf0.001 planted corpus")
  }

  test("q210 curation leaves ZERO residual near-dup pairs among kept blobs") {
    val dir = "/root/testdata/sf0.001"
    val verdicts = SparkEntry.queries("q210_media_curation")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(5))).toMap
    val kept = verdicts.collect { case (d, (_, "kept")) => d }.toSet
    val pairs = SparkEntry.queries("q195_image_phash_dup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the construction claim: every pair is intra-cluster and each
    // cluster keeps exactly one member, so no kept-kept pair survives
    // — in particular no kept train↔eval pair (q207 post-curation = ∅)
    pairs.foreach { case (d1, d2) =>
      assert(!(kept(d1) && kept(d2)), s"kept near-dup pair survived: ($d1, $d2)")
    }
    // split-aware keep: a train-containing cluster keeps a TRAIN member
    // (content stays trainable), and evicted eval members say why
    val statuses = verdicts.values.map(_._2).toSet
    assert(statuses.contains("leak_evicted"),
      "planted corpus must exercise the eviction path")
    verdicts.foreach { case (_, (split, status)) =>
      if (status == "leak_evicted") assert(split == "val" || split == "test")
    }
    // every cluster with members keeps at least its canon: total kept +
    // dup + evicted = corpus
    assert(verdicts.nonEmpty && kept.nonEmpty)
  }
}
