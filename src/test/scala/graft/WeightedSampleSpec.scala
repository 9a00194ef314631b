package graft

/** q164_weighted_sample (integer-ticket minwise weighted sampling):
  * the engine's bottom-100 must equal a JVM md5 replica EXACTLY
  * (keys, ranks, weights), and the weighting must actually tilt the
  * sample — on a fixture split evenly between w=1 and w=8 docs, the
  * w=8 half holds ~8/9 of the selections (asserted loosely at ≥ 70
  * of 100; binomial(100, 8/9) puts 70 far in the tail).
  */
class WeightedSampleSpec extends SparkSuite {

  private def md5Key(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  // 1000 docs with n_chars=50 (w=1), 1000 with n_chars=750 (w=8)
  private val fixture: Seq[(Long, Long)] =
    (0L until 1000L).map(i => (i, 50L)) ++
      (1000L until 2000L).map(i => (i, 750L))

  test("bottom-100 ≡ md5 replica; w=8 half dominates ~8:1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wsample").toString
    fixture.toDF("doc_id", "n_chars").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    val replica = fixture.map { case (id, nc) =>
      val w = 1L + math.min(nc / 100, 7L)
      val key = (1L to w).map(i => md5Key(s"$id#$i")).min
      (id, w, key)
    }.sortBy(_._3).take(100).zipWithIndex
      .map { case ((id, w, k), r) => (id, w, k, r + 1L) }

    val rows = SparkEntry.queries("q164_weighted_sample")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._4)
    assert(rows == replica, s"head got=${rows.take(3)} want=${replica.take(3)}")
    val heavy = rows.count(_._2 == 8L)
    assert(heavy >= 70, s"w=8 docs won only $heavy of 100 slots")
  }
}
