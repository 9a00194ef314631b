package graft

import java.security.MessageDigest

/** graft.queries.Llm.lshCalibration (q132, LSH estimator calibration):
  * exact agreement with a first-principles JVM replica (shingles →
  * md5 minhashes → banding → candidate pairs → agreement levels) on a
  * planted-duplicate fixture, plus the structural invariants the
  * audit's interpretation rests on: agreement starts at one full band
  * (4/8), and the exact-duplicate plants surface at 8/8 with
  * pooled_jac = 1.
  */
class LshCalibrationSpec extends SparkSuite {

  /** The engine's 60-bit gram hash: first 15 hex chars of
    * md5("<j>|<g>") — the MinHashLongs/oracle convention.
    */
  private def h60(j: Int, g: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"$j|$g".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Full first-principles replica of the calibration table. */
  private def replica(
      docs: Seq[(Long, String)]): Map[Long, (Double, Long, Long, Long, Double, Long)] = {
    val sets = docs.flatMap { case (id, text) =>
      val p = text.take(200)
      if (p.length >= 5)
        Some(id -> (0 to p.length - 5).map(i => p.substring(i, i + 5)).toSet)
      else None
    }.toMap
    val sigs = sets.map { case (id, gs) =>
      id -> (1 to 8).map(j => gs.map(g => h60(j, g)).min).toVector
    }
    // banding: 2 bands x 4 components; capped buckets (2..64) expand
    val buckets = sigs.toSeq.flatMap { case (id, mh) =>
      Seq((0, mh.slice(0, 4)) -> id, (1, mh.slice(4, 8)) -> id)
    }.groupBy(_._1).values
    val cand = buckets.flatMap { b =>
      val ids = b.map(_._2).sorted
      if (ids.size >= 2 && ids.size <= 64)
        ids.combinations(2).map(p => (p(0), p(1)))
      else Iterator.empty
    }.toSet
    val per = cand.toSeq.map { case (d1, d2) =>
      val agree = (0 until 8).count(i => sigs(d1)(i) == sigs(d2)(i)).toLong
      val ni = (sets(d1) intersect sets(d2)).size.toLong
      val un = sets(d1).size + sets(d2).size - ni
      (agree, ni, un)
    }
    per.groupBy(_._1).map { case (agree, xs) =>
      val si = xs.map(_._2).sum
      val su = xs.map(_._3).sum
      agree -> (
        agree.toDouble / 8.0,
        xs.size.toLong,
        si, su,
        si.toDouble / su.toDouble,
        xs.count(x => x._2 * 20 >= x._3 * 7).toLong)
    }
  }

  /** 40 docs: 3 exact-duplicate prefix plants, 3 single-char
    * perturbations of plant #1, the rest independent random text.
    */
  private def fixture: Seq[(Long, String)] = {
    val r = new scala.util.Random(13)
    def words(n: Int): String =
      (0 until n).map(_ => (0 until 2 + r.nextInt(6))
        .map(_ => ('a' + r.nextInt(26)).toChar).mkString).mkString(" ")
    val base = words(40).take(200)
    val near = (0 until 3).map { i =>
      val pos = 50 + 40 * i
      base.substring(0, pos) + "q" + base.substring(pos + 1)
    }
    val plants = Seq(base, base, base) ++ near
    (0 until 40).map { i =>
      val text = if (i < plants.length) plants(i) + " " + words(30)
                 else words(45)
      (i.toLong, text)
    }
  }

  test("engine ≡ replica exactly (counts, BIGINT sums, both divisions)") {
    import spark.implicits._
    val docs = fixture
    val got = graft.queries.Llm.lshCalibration(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6)))
      .toMap
    val want = replica(docs)
    assert(got == want, s"got $got\nwant $want")
    assert(got.nonEmpty)
    // candidates collide on >= 1 full band: agreement never below 4
    assert(got.keySet.min >= 4L)
    // the exact-duplicate plants guarantee >= 3 pairs at 8/8 (the
    // perturbed plants may join them — full agreement only needs the
    // 8 minima to dodge the changed shingles)
    assert(got.contains(8L) && got(8L)._2 >= 3L)
    // some perturbed pair falls below full agreement, and the
    // calibration orders as the estimator promises on this fixture:
    // higher agreement -> higher pooled truth
    assert(got.keySet.exists(a => a >= 4L && a < 8L))
    assert(got(8L)._5 > got(got.keySet.min)._5)
  }
}
