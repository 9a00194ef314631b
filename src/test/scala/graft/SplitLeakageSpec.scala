package graft

/** q192_split_leakage: plant a verified near-dup pair straddling
  * q53's content-addressed split (ids picked by replaying the split
  * hash in the JVM) and assert it surfaces with the right direction;
  * same-split near-dups must NOT appear.
  */
class SplitLeakageSpec extends SparkSuite {

  private def bucket(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id|split".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md.substring(0, 8), 16) % 100
  }

  test("straddling near-dup surfaces; same-split pair does not") {
    import spark.implicits._
    val trainIds = (0L to 400L).filter(bucket(_) < 80)
    val testIds = (0L to 400L).filter(bucket(_) >= 90)
    assert(trainIds.size >= 3 && testIds.nonEmpty, "split replay broken")
    val r = new scala.util.Random(3)
    def seg(n: Int) = (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    val shared = seg(220)
    val shared2 = seg(220)
    // leak pair: train anchor + test near-dup (same 220-char prefix)
    val tr = trainIds.head; val te = testIds.head
    // control pair: two TRAIN docs sharing a different prefix
    val tr2 = trainIds(1); val tr3 = trainIds(2)
    val filler = (0 until 30).map(i => (1000L + i * 7L, seg(220)))
    val docs = (Seq(
      (tr, shared), (te, shared + seg(30)),
      (tr2, shared2), (tr3, shared2 + seg(30))) ++ filler)
      .map { case (id, t) => (id, t, "en", "s") }
      .toDF("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("leak").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q192_split_leakage")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(got.contains((te, "test", tr, "train")),
      s"planted straddling near-dup not reported: ${got.toSeq}")
    // direction: the TRAIN member is never the leaked doc
    assert(got.forall(g => g._2 == "val" || g._2 == "test"))
    assert(got.forall(_._4 == "train"))
    // the train-train control pair is absent in either orientation:
    // neither member may appear as a LEAKED doc (appearing as a train
    // PARTNER of some other doc would be legitimate)
    assert(!got.exists(g => g._1 == tr2 || g._1 == tr3))
  }
}
