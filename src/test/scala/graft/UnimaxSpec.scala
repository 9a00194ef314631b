package graft

/** q139_unimax_plan (waterfill language-mixture allocation): exact
  * agreement with a JVM replica, plus the allocation's defining
  * invariants on planted supplies — allocations sum to the budget
  * (up to the one double division), no language exceeds its supply,
  * capped languages are exactly the scarce ones, and uncapped
  * languages share one equal water level.
  */
class UnimaxSpec extends SparkSuite {

  private def replica(counts: Map[String, Long]): Map[String, (Long, Long, Double)] = {
    val sorted = counts.toSeq.sortBy { case (l, c) => (c, l) }
    val n = sorted.size.toLong
    val b = sorted.map(_._2).sum / 5
    val pres = sorted.scanLeft(0L)(_ + _._2).tail // prefix incl. own
    val kstar = sorted.zipWithIndex.collectFirst {
      case ((_, c), i) if pres(i) - c + (n - i) * c >= b => (i + 1).toLong
    }
    val preK = kstar.map(k => pres(k.toInt - 1) - sorted(k.toInt - 1)._2)
    sorted.zipWithIndex.map { case ((l, c), i) =>
      val k = (i + 1).toLong
      val capped = kstar.forall(ks => k < ks)
      val alloc =
        if (capped) c.toDouble
        else (b - preK.get).toDouble / (n - kstar.get + 1L).toDouble
      l -> (c, if (capped) 1L else 0L, alloc)
    }.toMap
  }

  private def run(docs: Seq[(Long, String, String)]): Map[String, (Long, Long, Double)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("unimax").toString
    docs.toDF("doc_id", "text", "lang").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    SparkEntry.queries("q139_unimax_plan")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
  }

  test("engine ≡ replica; waterfill invariants hold on skewed supplies") {
    // token supplies: rare 4, small 40, medium 500, huge 4000 — the
    // budget (4544/5 = 908) caps the two scarce languages; medium and
    // huge split the rest at one water level t = (908-44)/2 = 432
    def words(n: Int, w: String) = Seq.fill(n)(w).mkString(" ")
    val docs = Seq(
      (0L, words(4, "ra"), "rare"),
      (1L, words(40, "sm"), "small"),
      (2L, words(500, "me"), "medium"),
      (3L, words(2000, "hu"), "huge"),
      (4L, words(2000, "hu"), "huge"))
    val got = run(docs)
    val want = replica(Map("rare" -> 4L, "small" -> 40L, "medium" -> 500L, "huge" -> 4000L))
    assert(got == want, s"got $got\nwant $want")
    // invariants: supplies respected, scarce capped, budget exhausted
    got.foreach { case (l, (c, _, a)) => assert(a <= c.toDouble + 1e-9, s"$l over supply") }
    assert(got("rare")._2 == 1L && got("small")._2 == 1L)
    assert(got("medium")._2 == 0L && got("huge")._2 == 0L)
    assert(got("medium")._3 == got("huge")._3, "uncapped languages share one level")
    val total = got.values.map(_._3).sum
    assert(math.abs(total - 908.0) < 1e-9, s"allocations must sum to B=908, got $total")
  }

  test("one dominant language: scarce ones capped, the giant takes the rest") {
    def words(n: Int, w: String) = Seq.fill(n)(w).mkString(" ")
    val docs = Seq(
      (0L, words(10, "aa"), "l1"),
      (1L, words(10, "bb"), "l2"),
      (2L, words(980, "cc"), "l3"))
    val got = run(docs)
    // B = 1000/5 = 200: l1, l2 capped at 10 each; l3 takes 180
    assert(got("l1")._3 == 10.0 && got("l2")._3 == 10.0)
    assert(math.abs(got("l3")._3 - 180.0) < 1e-9, s"got ${got("l3")._3}")
    assert(got == replica(Map("l1" -> 10L, "l2" -> 10L, "l3" -> 980L)))
  }
}
