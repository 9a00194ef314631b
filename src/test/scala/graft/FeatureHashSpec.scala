package graft

import java.security.MessageDigest

/** q134_feature_hash (hashing-trick document embeddings): bit-exact
  * agreement with a first-principles JVM replica — md5 60-bit token
  * hash, bucket = h mod 16, sign = bit 4, exact signed BIGINT counts,
  * l2 normalization as the only float step — plus the sparse-form
  * invariants (zero components absent, norm accumulated over the
  * emitted components only).
  */
class FeatureHashSpec extends SparkSuite {

  private def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  private def replica(
      docs: Seq[(Long, String)]): Map[(Long, Long), (Long, Double)] =
    docs.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      val counts = toks.foldLeft(Map.empty[Long, Long]) { (m, t) =>
        val h = h60(t)
        val i = h % 16
        val s = if (((h >> 4) & 1L) == 1L) 1L else -1L
        m.updated(i, m.getOrElse(i, 0L) + s)
      }.filter(_._2 != 0L)
      val n2 = counts.values.map(c => c * c).sum
      counts.map { case (i, c) =>
        (id, i) -> (c, c.toDouble / math.sqrt(n2.toDouble))
      }
    }.toMap

  private def fixture: Seq[(Long, String)] = {
    val r = new scala.util.Random(41)
    (0L until 25L).map { id =>
      val words = (0 until 15 + r.nextInt(20)).map(_ =>
        (0 until 3 + r.nextInt(5)).map(_ => ('a' + r.nextInt(26)).toChar).mkString)
      (id, words.mkString(" "))
    }
  }

  test("engine ≡ replica bit-for-bit (buckets, signed counts, normalized doubles)") {
    import spark.implicits._
    val docs = fixture
    val rows = {
      // drive the registered query on a parquet-backed fixture dir
      val dir = java.nio.file.Files.createTempDirectory("fh").toString
      docs.toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      graft.SparkEntry.queries("q134_feature_hash")(spark, dir).collect()
    }
    val gotMap = rows.map(r =>
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val want = replica(docs)
    assert(gotMap == want,
      s"diff: ${(gotMap.toSet diff want.toSet).take(3)} / ${(want.toSet diff gotMap.toSet).take(3)}")
    // sparse form: no zero components ever emitted
    assert(rows.forall(_.getLong(2) != 0L))
    // buckets stay in [0, 16)
    assert(rows.forall(r => r.getLong(1) >= 0L && r.getLong(1) < 16L))
  }
}
