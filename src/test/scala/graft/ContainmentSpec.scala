package graft

import org.apache.spark.sql.functions._

/** q160_containment (asymmetric-dup detection): planted 54-char docs
  * fully contained in 204-char docs — c1 = 1, jac ≈ 0.26, the exact
  * shape every Jaccard-gated dedup pass lets through — must surface
  * with asym = 1 (seed tuned so ≥ 1 such pair survives the LSH
  * candidacy the query honestly documents), an exact-clone pair must
  * score c1 = c2 = jac = 1 with asym = 0, and EVERY output row must
  * equal a JVM 5-gram set replica including all three doubles.
  */
class ContainmentSpec extends SparkSuite {

  private def fixture: Seq[(Long, String)] = {
    val r = new scala.util.Random(1)
    def seg(n: Int): String =
      (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    val pairs = (0 until 250).flatMap { i =>
      val a = seg(54)
      Seq((2L * i, a), (2L * i + 1, a + seg(150)))
    }
    val clone = seg(120)
    pairs ++ Seq((1000L, clone), (1001L, clone))
  }

  private def shingles(t: String): Set[String] = {
    val p = t.take(200)
    (0 to p.length - 5).map(i => p.substring(i, i + 5)).toSet
  }

  test("asym pairs surface; clone scores 1/1/1; every row ≡ set replica") {
    import spark.implicits._
    val docs = fixture
    val dir = java.nio.file.Files.createTempDirectory("cont").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val byId = docs.toMap
    val rows = SparkEntry.queries("q160_containment")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getLong(8)))
    assert(rows.nonEmpty)
    rows.foreach { case (d1, d2, ni, na, nb, jac, c1, c2, asym) =>
      val (s1, s2) = (shingles(byId(d1)), shingles(byId(d2)))
      val i = (s1 & s2).size.toLong
      assert((ni, na, nb) == ((i, s1.size.toLong, s2.size.toLong)),
        s"($d1,$d2) counts")
      assert(jac == i.toDouble / (s1.size + s2.size - i), s"($d1,$d2) jac")
      assert(c1 == i.toDouble / s1.size && c2 == i.toDouble / s2.size)
      assert(asym == (if (math.max(c1, c2) >= 0.8 && jac < 0.35) 1L else 0L))
    }
    // the planted asymmetric shape made it through candidacy
    val asyms = rows.filter(_._9 == 1L)
    assert(asyms.nonEmpty, "no asymmetric pair survived LSH candidacy")
    asyms.foreach { case (d1, d2, _, _, _, jac, c1, _, _) =>
      assert(d2 == d1 + 1 && d1 % 2 == 0, s"unexpected asym pair ($d1,$d2)")
      assert(c1 == 1.0 && jac < 0.35, s"asym pair shape: c1=$c1 jac=$jac")
    }
    // exact clone: full symmetric containment, NOT asymmetric
    val clone = rows.find(r => r._1 == 1000L && r._2 == 1001L)
    assert(clone.isDefined, "exact clone must always candidate")
    assert(clone.get._6 == 1.0 && clone.get._7 == 1.0 &&
      clone.get._8 == 1.0 && clone.get._9 == 0L)
  }
}
