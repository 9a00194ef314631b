package graft

/** q168_quality_dedup (quality-aware canonical selection): planted
  * clusters where the best-quality member is and is not the min-id
  * member — the `differs` flag must separate them, and filler docs
  * must form no clusters.
  */
class QualityDedupSpec extends SparkSuite {

  private def fixture: Seq[(Long, String)] = {
    val r = new scala.util.Random(13)
    def seg(n: Int): String =
      (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    val a = seg(220)
    val b = seg(220)
    // cluster A (10,11,12): identical 200-prefix; 11 carries stopword
    // mass BEYOND the prefix (same shingles, higher quality) → the
    // quality canonical is 11, the min-id canonical would be 10
    val clusterA = Seq(
      (10L, a), (11L, a + " the and of to in the of and the in"), (12L, a))
    // cluster B (20,21): min-id member 20 is ALSO the best
    val clusterB = Seq(
      (20L, b + " the and of to in"), (21L, b))
    val filler = (0 until 30).map(i => (100L + i, seg(220)))
    clusterA ++ clusterB ++ filler
  }

  test("quality canonical vs min-id canonical; differs flags exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qdedup").toString
    fixture.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q168_quality_dedup")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1).toSeq
    val byCluster = rows.map(t => t._1 -> t).toMap
    assert(rows.map(_._1).toSet == Set(10L, 20L),
      s"unexpected clusters: ${rows.map(_._1)}")
    val (_, nA, canonA, qA, diffA) = byCluster(10L)
    assert(nA == 3L && canonA == 11L && diffA == 1L,
      s"cluster A: n=$nA canon=$canonA differs=$diffA")
    // 11's quality: 10 stop hits × 10⁶ + length
    assert(qA == 10L * 1000000L + (220L + 35L), s"cluster A quality $qA")
    val (_, nB, canonB, _, diffB) = byCluster(20L)
    assert(nB == 2L && canonB == 20L && diffB == 0L,
      s"cluster B: n=$nB canon=$canonB differs=$diffB")
  }
}
