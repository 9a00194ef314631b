package graft

import org.apache.spark.sql.functions._

/** The q229–q232 crawl-maintenance family: the re-crawl estimator
  * lands exactly on hand-solved fetch histories and holds its clamp
  * invariants corpus-wide, trap mining flags the planted session-id
  * template and nothing else, mirror detection equals a JVM replica
  * over the real corpus (and never flags the syndication hub), and the
  * discovery frontier is disjoint from the crawled set with the
  * nofollow-only spam farm excluded.
  */
class MaintenanceSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q229 hand-solved docs: fast-churn and never-changed regimes") {
    import spark.implicits._
    // doc 30: n_f=2, gap=3, chg_k=1 → fps differ → X=1, span=3
    // doc 11: n_f=3, gap=5, chg_k=3 → versions 0,0,0 → X=0, span=10
    val docs = Seq((30L, "en", "src7"), (11L, "de", "src3"))
      .toDF("doc_id", "lang", "source")
    val out = graft.queries.Maintenance.recrawlSchedule(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    assert(out("https://src7.example.org/en/articles/30") ===
      ((2L, 1L, 3L, 333333L, 3L, 6L)))
    assert(out("https://src3.example.org/casino/de/11") ===
      ((3L, 0L, 10L, 0L, 30L, 40L)))
  }

  test("q229 corpus invariants: clamp bounds, exact ppm arithmetic, backoff") {
    val rows = SparkEntry.queries("q229_recrawl_rate")(spark, dir)
      .localCheckpoint()
    assert(rows.count() > 0)
    assert(rows.filter("next_gap_days < 1 OR next_gap_days > 30").count() === 0)
    assert(rows.filter("n_changes > n_fetches - 1").count() === 0)
    assert(rows.filter(
      "rate_ppm <> CAST(n_changes * 1000000 div span_days AS BIGINT)")
      .count() === 0)
    assert(rows.filter("n_changes = 0 AND next_gap_days <> 30").count() === 0)
    assert(rows.filter("next_fetch_day <> last_day + next_gap_days")
      .count() === 0)
    // both regimes genuinely present
    assert(rows.filter("n_changes = 0").count() > 0)
    assert(rows.filter("n_changes > 0").count() > 0)
    rows.unpersist()
  }

  test("q230 planted trap: the session-id template flags, articles do not") {
    val rows = SparkEntry.queries("q230_trap_templates")(spark, dir)
      .localCheckpoint()
    val trapT = "/a/b/c/d/e/f/g/h/N?session&ref&utm_campaign&sort&page"
    val traps = rows.filter(col("is_trap") === 1L).collect()
    assert(traps.nonEmpty, "the planted session-id trap must flag")
    assert(traps.forall(_.getString(1) === trapT),
      "only the session-id template may flag")
    // the trap's arithmetic: 3 URL variants per page, one content each
    traps.foreach { r =>
      assert(r.getLong(2) === 3 * r.getLong(3), s"3 variants per page: $r")
      assert(r.getLong(4) === 33L, s"content_pct must be 33: $r")
    }
    // article pages are 1:1 url:content
    val art = rows.filter("template LIKE '%/articles/N'").collect()
    assert(art.nonEmpty)
    assert(art.forall(r => r.getLong(4) === 100L && r.getLong(5) === 0L))
    // flag definition holds corpus-wide
    assert(rows.filter(
      "is_trap <> CAST(CASE WHEN n_urls >= 3 AND n_contents * 100" +
        " div n_urls <= 40 THEN 1 ELSE 0 END AS BIGINT)").count() === 0)
    rows.unpersist()
  }

  test("q231 ≡ JVM replica; syndication hub never flags; cap vacuous") {
    val rows = SparkEntry.queries("q231_mirror_hosts")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // JVM replica over the same parquet rows
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "source", "md5(text) AS fp",
        s"regexp_extract(${graft.queries.Mining.UrlSynthSql}," +
          " '^https?://([^/]+)', 1) AS host")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val hf: Seq[(String, String)] = (docs.toSeq.map { case (_, _, fp, h) => (h, fp) } ++
      docs.toSeq.collect { case (id, s, fp, _) if id % 3 == 0 =>
        (s"mirror-$s.example.net", fp) } ++
      docs.toSeq.collect { case (id, _, fp, _) if id % 7 == 0 =>
        ("syndication-hub.example.net", fp) }).distinct
    // replication cap (16 hosts per fp) must be vacuous on this corpus
    assert(hf.groupBy(_._2).values.map(_.size).max <= 16)
    val sz: Map[String, Long] =
      hf.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expected = hf.groupBy(_._2).values.toSeq
      .flatMap { hs =>
        val hosts = hs.map(_._1)
        for { a <- hosts; b <- hosts if a < b } yield (a, b)
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((h1, h2), shared) =>
        val (n1, n2) = (sz(h1), sz(h2))
        val pct = shared * 100 / math.min(n1, n2)
        (h1, h2) -> ((shared, n1, n2, pct, if (pct >= 80) 1L else 0L))
      }.toMap
    assert(rows === expected)
    // the syndication hub is real co-publication, never a mirror
    assert(rows.keys.filter(k =>
        k._1 == "syndication-hub.example.net" ||
          k._2 == "syndication-hub.example.net")
      .forall(k => rows(k)._5 === 0L))
    // at least one true mirror pair flags
    assert(rows.exists { case ((h1, _), v) =>
      h1.startsWith("mirror-") && v._5 == 1L })
  }

  test("q232 frontier: disjoint from crawled, spam farm excluded, mass positive") {
    val docs = graft.Sql.table(spark, dir, "documents")
    val links = graft.queries.Crawl.withOutlinks(docs).localCheckpoint()
    val crawled = links.select("src_url").distinct().collect()
      .map(_.getString(0)).toSet
    val cand = SparkEntry.queries("q232_discovery_frontier")(spark, dir)
      .localCheckpoint()
    val candUrls = cand.select("dst_url").collect().map(_.getString(0))
    assert(candUrls.nonEmpty)
    assert(candUrls.toSet.intersect(crawled).isEmpty,
      "a crawled page may never re-enter the frontier")
    // the spam farm is nofollow-only — discovery must not qualify it
    assert(!candUrls.exists(_.contains("spam-farm")),
      "nofollow-only targets may not enter the frontier")
    // hub pages are multiply-linked dangling targets: high in-link count
    val hubs = cand.filter("dst_url LIKE '%/hub/%'").collect()
    assert(hubs.nonEmpty)
    assert(hubs.forall(_.getLong(1) >= 1L))
    // every candidate received rank mass from at least one crawled page
    assert(cand.filter("mass_q <= 0").count() === 0)
    assert(cand.filter("n_links < 1 OR n_src_hosts < 1 OR n_anchors < 1")
      .count() === 0)
    links.unpersist(); cand.unpersist()
  }

  test("q233 refresh-due: flag algebra, all reasons present, schedule-consistent") {
    val due = SparkEntry.queries("q233_refresh_due")(spark, dir)
      .localCheckpoint()
    val sched = SparkEntry.queries("q229_recrawl_rate")(spark, dir)
      .select("url", "next_fetch_day")
    assert(due.count() > 0)
    // reason algebra is exactly the two flags
    assert(due.filter(
      "reason = 'scheduled' AND NOT (next_fetch_day <= 35 AND lastmod_day <= last_day)")
      .count() === 0)
    assert(due.filter(
      "reason = 'lastmod' AND NOT (next_fetch_day > 35 AND lastmod_day > last_day)")
      .count() === 0)
    assert(due.filter(
      "reason = 'both' AND NOT (next_fetch_day <= 35 AND lastmod_day > last_day)")
      .count() === 0)
    // every emitted row is genuinely due; the join is schedule-consistent
    assert(due.filter("next_fetch_day > 35 AND lastmod_day <= last_day")
      .count() === 0)
    assert(due.join(sched, Seq("url", "next_fetch_day"), "left_anti")
      .count() === 0)
    // all three attributions occur on the corpus (the audit is non-vacuous)
    val reasons = due.select("reason").distinct().collect()
      .map(_.getString(0)).toSet
    assert(reasons === Set("scheduled", "lastmod", "both"))
    due.unpersist()
  }

  test("q234 compliance audit: mirror 100% violating, counts ≡ q214 verdicts") {
    val audit = SparkEntry.queries("q234_compliance_audit")(spark, dir)
      .localCheckpoint()
    // the whole-site-disallowed mirror violates on every fetch event
    val mirror = audit.filter("domain = 'freestuff-mirror.biz'").collect()
    assert(mirror.length === 1)
    assert(mirror(0).getLong(3) === mirror(0).getLong(1),
      "every mirror fetch is a violation")
    assert(mirror(0).getLong(6) === 100L)
    assert(mirror(0).getString(5).nonEmpty)
    // flag/percent algebra and the empty-sample contract hold corpus-wide
    assert(audit.filter(
      "violation_pct <> CAST(n_violation_events * 100 div n_fetch_events AS BIGINT)")
      .count() === 0)
    assert(audit.filter(
      "(n_violation_urls = 0) <> (sample_violation = '')").count() === 0)
    // per-domain violating-URL counts equal q214's disallowed verdicts
    // (the fetch log revisits every URL, so the sets coincide)
    val fromVerdicts = SparkEntry.queries("q214_robots_eval")(spark, dir)
      .filter("allowed = 0")
      .groupBy("domain").agg(countDistinct("url").cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fromAudit = audit.collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(fromAudit.filter(_._2 > 0) === fromVerdicts)
    audit.unpersist()
  }

  test("q235 sitemap index: round-trip inverts, positions contiguous, lastmod = shard max") {
    val idx = SparkEntry.queries("q235_sitemap_index")(spark, dir)
      .localCheckpoint()
    val shards = SparkEntry.queries("q225_sitemap_roundtrip")(spark, dir)
      .localCheckpoint()
    // one index row per q225 shard, loc derived from (domain, shard)
    val expected = shards.groupBy("domain", "shard")
      .agg(max("lastmod").as("lm")).collect()
      .map(r => (r.getString(0), r.getLong(1) + 1,
        s"https://${r.getString(0)}/sitemap-${r.getLong(1)}.xml", r.getString(2)))
      .toSet
    val got = idx.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got === expected)
    // positions are contiguous 1..k per domain
    val bad = idx.groupBy("domain")
      .agg(count(lit(1)).as("n"), max("idx_pos").as("mx"), min("idx_pos").as("mn"))
      .filter("mx <> n OR mn <> 1").count()
    assert(bad === 0)
    idx.unpersist(); shards.unpersist()
  }

  test("q236 conditional savings: identity algebra, both regimes, casino-host sanity") {
    val sav = SparkEntry.queries("q236_conditional_savings")(spark, dir)
      .localCheckpoint()
    assert(sav.count() > 0)
    // revisits = fetches - distinct urls is implied by per-url LAG: the
    // first fetch of each url is the only non-revisit
    assert(sav.filter("n_not_modified > n_revisits OR n_revisits >= n_fetches")
      .count() === 0)
    assert(sav.filter(
      "saved_pct <> CAST(n_not_modified * 100 div n_fetches AS BIGINT)")
      .count() === 0)
    // the corpus genuinely contains both savable and unsavable mass:
    // chg_k=3 urls repeat fingerprints, chg_k=1 urls never do
    assert(sav.agg(sum("n_not_modified")).head().getLong(0) > 0)
    assert(sav.filter("n_not_modified < n_revisits").count() > 0)
    sav.unpersist()
  }
}
