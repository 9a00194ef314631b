package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scan-local HTML main-content extraction — the stage a real web
  * corpus runs FIRST: C4 (Raffel et al. 2020 §2.2) and RefinedWeb
  * (Penedo et al. 2023 §3.1, trafilatura) both start from markup, and
  * everything downstream here (q87 Gopher, q197 blocklist, the dedup
  * families) assumes clean text. This is a trafilatura-lite: strip
  * the dead regions (script/style/comments), break the markup into
  * candidate LINES at block-level tags, and keep the lines whose
  * text density says "content" — enough words, and words not
  * dominated by anchors (nav bars, link farms and footers are
  * link-dense and word-poor; article prose is the opposite; the
  * line-density family goes back to JusText, Pomikálek 2011).
  *
  * Deliberately REGEX-BASED, not a DOM parse: (a) the whole operator
  * is in-row — string functions and array HOFs only, no explode, no
  * shuffle, no UDF (same zero-exchange scan shape as q197, the
  * cheapest possible gate at 100 TB, and HTML pages are KB-sized so
  * per-row regex cost is bounded); (b) every step is replayable in
  * DuckDB (the q87/q197 oracle discipline) — RE2-compatible patterns
  * (no backreferences, no lookaround), global-replace semantics, and
  * a fixed entity-decode chain, so the DuckDB oracle hash-checks the
  * extraction end-to-end.
  *
  * Contract notes: entities are decoded AFTER tag stripping (a
  * decoded `&lt;div&gt;` must NOT become a strippable tag — escaped
  * markup in a page is content, not structure), with `&amp;` decoded
  * LAST (standard double-decode guard); word counts are taken on the
  * decoded, whitespace-collapsed line.
  */
object Html {

  /** Tags whose open OR close breaks a candidate line — the
    * block-level set plus `br`. Inline tags (`a`, `b`, `span`, …)
    * deliberately do NOT break lines: a paragraph with inline links
    * must stay ONE line so its link density is judged as a whole.
    */
  private val BlockTags =
    "p|div|li|ul|ol|h1|h2|h3|h4|h5|h6|br|tr|td|th|table|thead|tbody|" +
      "section|article|aside|nav|header|footer|main|blockquote|pre|form"

  private[graft] val ScriptRe = "(?is)<script[^>]*>.*?</script>"
  private[graft] val StyleRe = "(?is)<style[^>]*>.*?</style>"
  private[graft] val CommentRe = "(?s)<!--.*?-->"
  private[graft] val BlockRe = s"(?i)</?($BlockTags)[^>]*>"
  private[graft] val TagRe = "<[^>]*>"
  private[graft] val AnchorRe = "(?i)<a[ \\t>]"

  /** The per-line SQL fragment shared by the Spark HOF lambda and the
    * DuckDB oracle: tag-strip, entity-decode, whitespace-collapse.
    * `v` is the raw line expression. Plain string functions only —
    * identical text in, identical text out on both engines.
    */
  private def cleanLineSql(v: String): String =
    s"""trim(regexp_replace(replace(replace(replace(replace(replace(replace(
       |  regexp_replace($v, '$TagRe', ' ', 'g'),
       |  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
       |  '&nbsp;', ' '), '&amp;', '&'), '[ \\t]+', ' ', 'g'))""".stripMargin

  /** Spark needs the same fragment without the DuckDB-only 'g' flag
    * argument (Spark's regexp_replace is always global). */
  private def cleanLineSpark(v: String): String =
    s"""trim(regexp_replace(replace(replace(replace(replace(replace(replace(
       |  regexp_replace($v, '$TagRe', ' '),
       |  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
       |  '&nbsp;', ' '), '&amp;', '&'), '[ \\t]+', ' '))""".stripMargin

  /** Extract main content from `htmlCol`, appending: `title` (first
    * <title> payload, entity-decoded), `n_lines` (non-empty candidate
    * lines), `n_content` (lines kept), `content` (kept lines joined
    * by newline), `content_chars`. A line is kept when it has at
    * least `minWords` words AND at least `wordsPerLink` words per
    * anchor tag it carries (nav/footer/link-farm rejection).
    */
  def mainContent(df: DataFrame, htmlCol: String = "html",
      minWords: Int = 10, wordsPerLink: Int = 5): DataFrame = {
    require(minWords >= 1 && wordsPerLink >= 1,
      s"thresholds must be positive: minWords=$minWords wordsPerLink=$wordsPerLink")
    val dead = regexp_replace(
      regexp_replace(
        regexp_replace(col(htmlCol), ScriptRe, " "),
        StyleRe, " "),
      CommentRe, " ")
    val blocks = regexp_replace(dead, BlockRe, "\n")
    val df1 = df
      .withColumn("__blocks", blocks)
      // two-step transform so the word count is computed ONCE per line
      // (the kept-filter reads it twice; lambdas have no let-binding)
      .withColumn("__lines", expr(
        s"""transform(
           |  transform(split(__blocks, '\\n'), l -> named_struct(
           |    'links', size(regexp_extract_all(l, '$AnchorRe', 0)),
           |    'text', ${cleanLineSpark("l")})),
           |  s -> named_struct(
           |    'links', s.links, 'text', s.text,
           |    'words', size(filter(split(s.text, ' '), x -> x <> ''))))"""
          .stripMargin))
      .withColumn("__kept", expr(
        s"""filter(__lines, s ->
           |  s.words >= $minWords AND s.words >= $wordsPerLink * s.links)"""
          .stripMargin))
    df1
      .withColumn("title", expr(
        cleanLineSpark(s"regexp_extract(`$htmlCol`, '(?is)<title[^>]*>(.*?)</title>', 1)")))
      .withColumn("n_lines", expr(
        "CAST(size(filter(__lines, s -> s.text <> '')) AS BIGINT)"))
      .withColumn("n_content", expr("CAST(size(__kept) AS BIGINT)"))
      .withColumn("content", expr(
        "array_join(transform(__kept, s -> s.text), '\\n')"))
      .withColumn("content_chars", expr("CAST(length(content) AS BIGINT)"))
      .drop("__blocks", "__lines", "__kept")
  }

  /** DuckDB replay of [[mainContent]] as CTE SQL over a relation
    * `src` exposing `doc_id` and `html` — the oracle side of the
    * extraction contract, string-for-string the same pipeline.
    */
  def mainContentSqlCtes(minWords: Int = 10, wordsPerLink: Int = 5): String =
    s"""dead AS (
       |  SELECT doc_id, html,
       |    regexp_replace(regexp_replace(regexp_replace(html,
       |      '$ScriptRe', ' ', 'g'), '$StyleRe', ' ', 'g'),
       |      '$CommentRe', ' ', 'g') AS d
       |  FROM src),
       |lns AS (
       |  SELECT doc_id, html,
       |    list_transform(
       |      list_transform(
       |        regexp_split_to_array(
       |          regexp_replace(d, '$BlockRe', chr(10), 'g'), '\\n'),
       |        l -> struct_pack(
       |          links := len(regexp_extract_all(l, '$AnchorRe')),
       |          t := ${cleanLineSql("l")})),
       |      s -> struct_pack(
       |        links := s.links, t := s.t,
       |        words := len(list_filter(string_split(s.t, ' '), x -> x <> '')))) AS ls
       |  FROM dead),
       |kept AS (
       |  SELECT doc_id, html, ls,
       |    list_filter(ls, s ->
       |      s.words >= $minWords AND s.words >= $wordsPerLink * s.links) AS ks
       |  FROM lns),
       |extracted AS (
       |  SELECT doc_id,
       |    ${cleanLineSql(s"regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1)")} AS title,
       |    CAST(len(list_filter(ls, s -> s.t <> '')) AS BIGINT) AS n_lines,
       |    CAST(len(ks) AS BIGINT) AS n_content,
       |    array_to_string(list_transform(ks, s -> s.t), chr(10)) AS content,
       |    CAST(length(array_to_string(list_transform(ks, s -> s.t), chr(10))) AS BIGINT) AS content_chars
       |  FROM kept)""".stripMargin
}
