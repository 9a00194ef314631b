package graft

/** q213 URL filter: the planted residues land where the rules say —
  * blocklisted mirror domains drop on sight, faceted crawler traps
  * drop on accumulated structural score, a single mild path hit
  * keeps, clean article URLs keep — and the evidence columns are
  * internally consistent (score ≡ its parts; drop ≡ its rule).
  */
class UrlFilterSpec extends SparkSuite {

  test("planted residues fall exactly as the rules dictate") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q213_url_filter")(spark, dir)
      .collect().map { r =>
        r.getLong(0) -> (r.getString(1), r.getLong(7), r.getLong(8),
          r.getLong(9), r.getLong(10))
      }.toMap // doc_id -> (url, bad_domain, path_hits, score, dropped)
    assert(rows.nonEmpty)
    rows.foreach { case (id, (url, badDomain, pathHits, score, dropped)) =>
      if (id % 13 == 0) { // blocklisted mirror domain: drop on sight
        assert(badDomain === 1L && dropped === 1L, s"$id $url")
      } else if (id % 11 == 0) { // ONE mild path hit: keeps (accumulative rule)
        assert(pathHits === 1L && badDomain === 0L, s"$id $url")
        assert(dropped === (if (score >= 3) 1L else 0L))
      } else if (id % 17 == 0) { // faceted crawler trap: deep + query + long
        assert(score >= 3L && dropped === 1L, s"$id $url score=$score")
      } else { // clean article URL
        assert(badDomain === 0L && pathHits === 0L && dropped === 0L, s"$id $url")
      }
    }
    // all three planted classes are present (non-vacuous at sf0.001)
    assert(rows.keys.exists(_ % 13 == 0))
    assert(rows.keys.exists(id => id % 17 == 0 && id % 13 != 0 && id % 11 != 0))
  }

  test("q214 robots precedence: longest match wins, allow wins ties, no-rule allows") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.col
    val langs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("q214_robots_eval")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(4), r.getLong(6))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, (pat, allowed)) =>
      if (id % 13 == 0) // whole-site disallow on the mirror domain
        assert((pat, allowed) === (("/", 0L)), s"$id")
      else if (id % 11 == 0) {
        // /casino family: /casino/en re-allows, but the LONGER
        // wildcard+anchor /casino/*4$ re-disallows paths ending in 4
        if (id % 10 == 4)
          assert((pat, allowed) === (("/casino/*4$", 0L)), s"$id")
        else if (langs(id) == "en")
          assert((pat, allowed) === (("/casino/en", 1L)), s"$id")
        else assert((pat, allowed) === (("/casino", 0L)), s"$id")
      } else if (id % 17 == 0)
        // trap subtree: the equal-length (9) allow/disallow wildcard
        // tie resolves to ALLOW per RFC 9309 §2.2.2
        assert((pat, allowed) === (("/a/b/*/h/", 1L)), s"$id")
      else // default allow — the longest (only) match is '/'
        assert((pat, allowed) === (("/", 1L)), s"$id")
    }
    // every precedence leg is non-vacuous on this corpus
    assert(rows.exists { case (_, (p, _)) => p == "/casino/en" })
    assert(rows.exists { case (_, (p, _)) => p == "/casino/*4$" })
    assert(rows.exists { case (_, (p, _)) => p == "/a/b/*/h/" })
  }

  test("evidence columns are internally consistent") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries("q213_url_filter")(spark, dir)
      .collect().foreach { r =>
        val (hasQ, tooLong, tooDeep) = (r.getLong(4), r.getLong(5), r.getLong(6))
        val (badDomain, pathHits, score, dropped) =
          (r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10))
        assert(score === pathHits + hasQ + tooLong + tooDeep)
        assert(dropped === (if (badDomain == 1L || score >= 3L) 1L else 0L))
      }
  }
}
