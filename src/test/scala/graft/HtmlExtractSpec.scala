package graft

/** ops.Html.mainContent on a hand-planted page: script/style/comment
  * payloads never leak, nav / link-farm / footer lines fail the
  * line-density gate, article prose survives (inline anchors intact),
  * entities decode exactly once, and the title comes back decoded.
  */
class HtmlExtractSpec extends SparkSuite {

  private val page =
    """<html><head><title>The &amp; Title</title>
      |<style>body { margin: 0; } .nav { color: red; }</style>
      |<script>var words = "ten words of script payload must never leak out";</script>
      |</head><body>
      |<div class="nav"><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></div>
      |<h1>Short headline</h1>
      |<div id="main">
      |<p>This opening paragraph carries more than ten words of real article prose for the extractor to keep.</p>
      |<p>The second paragraph also has enough words to stay even with a single <a href="/ref">inline reference</a> in it.</p>
      |<p>Tiny.</p>
      |</div>
      |<!-- a comment region with plenty of words that must never leak into the content -->
      |<ul><li><a href="/1">one</a></li><li><a href="/2">two</a></li></ul>
      |<div class="farm">more <a href="/x">than</a> ten <a href="/y">words</a> but <a href="/z">every</a> other <a href="/w">word</a> is <a href="/v">a</a> link <a href="/u">here</a> now</div>
      |<div class="footer">Copyright 2020 Example Corp &#169;</div>
      |</body></html>""".stripMargin

  test("main-content extraction keeps prose, drops boilerplate, decodes entities") {
    import spark.implicits._
    val out = graft.ops.Html.mainContent(
        Seq((1L, page)).toDF("doc_id", "html"))
      .collect().head
    assert(out.getAs[String]("title") === "The & Title")
    assert(out.getAs[Long]("n_content") === 2L,
      s"exactly the two prose paragraphs qualify: ${out.getAs[String]("content")}")
    val content = out.getAs[String]("content")
    val lines = content.split("\n")
    assert(lines(0).startsWith("This opening paragraph carries"))
    // inline anchor TEXT survives the strip; the tag does not
    assert(lines(1).contains("a single inline reference in it"))
    for (leak <- Seq("script payload", "margin", "Home", "headline",
        "comment region", "Copyright", "link here now", "Tiny"))
      assert(!content.contains(leak), s"boilerplate leaked: $leak")
    assert(out.getAs[Long]("content_chars") === content.length.toLong)
    assert(out.getAs[Long]("n_lines") > out.getAs[Long]("n_content"))
  }

  test("escaped markup is content, not structure; thresholds are caller-tunable") {
    import spark.implicits._
    // &lt;script&gt; decodes AFTER tag stripping — the decoded text
    // must survive as prose, not vanish as a tag
    val p = "<p>how to write an html &lt;script&gt; tag in seven more words here</p>"
    val out = graft.ops.Html.mainContent(
        Seq((1L, s"<html><body>$p</body></html>")).toDF("doc_id", "html"))
      .collect().head
    assert(out.getAs[String]("content").contains("an html <script> tag"))

    // a 4-word line passes at minWords = 3
    val loose = graft.ops.Html.mainContent(
        Seq((2L, "<p>four words right here</p>")).toDF("doc_id", "html"),
        minWords = 3)
      .collect().head
    assert(loose.getAs[Long]("n_content") === 1L)
  }
}
