package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  private def blocksOf(html: String): Seq[(String, Int, Int)] =
    Seq(html).toDF("h")
      .select(explode(graft.functions.html_blocks(col("h"))).as("b"))
      .select("b.text", "b.n_chars", "b.n_link_chars")
      .as[(String, Int, Int)].collect().toSeq

  test("html_blocks: block segmentation, link-char accounting, entity decode") {
    val html = "<html><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About us</a></nav>" +
      "<div><p>Real content &amp; more prose here.</p></div>" +
      "<p>Second paragraph with a <a href=\"x\">link</a> inside.</p>" +
      "<footer><a>Contact</a></footer></body></html>"
    val got = blocksOf(html)
    assert(got.map(_._1) == Seq(
      "Home About us",
      "Real content & more prose here.",
      "Second paragraph with a link inside.",
      "Contact"))
    // nav: all 13 chars count as link chars — the space between anchors
    // is emitted lazily once inside the second <a>, so boundary
    // whitespace attributes to the link (deterministic; density-neutral)
    val nav = got(0)
    assert(nav._2 == 13 && nav._3 == 13)
    // prose block: zero link chars
    assert(got(1)._3 == 0)
    // mixed block: "link" + its attributed boundary space
    assert(got(2)._3 == 5)
    assert(got(3) == ("Contact", 7, 7))
  }

  test("html_blocks: script/style content never joins a block; unterminated tag is literal") {
    assert(blocksOf("<p>a</p><script>var x = 1;</script><p>b</p>")
      .map(_._1) == Seq("a", "b"))
    assert(blocksOf("x <unclosed").map(_._1) == Seq("x <unclosed"))
    assert(blocksOf("").isEmpty)
  }

  test("extractMain keeps prose, drops nav/footer by density and shorts by length") {
    val docs = Seq((1L,
      "<body><nav><a>Home</a> <a>About</a> <a>Contact us now</a></nav>" +
        "<p>This paragraph is long enough to clear the floor and is prose.</p>" +
        "<p>tiny</p>" +
        "<p>Another sufficiently long content paragraph stays in the corpus.</p>" +
        "<footer><a>Terms of service</a> <a>Privacy policy page</a></footer></body>"))
      .toDF("doc_id", "html")
    val got = Boilerplate.extractMain(docs, "html").select("main_text")
      .as[String].head()
    assert(got ==
      "This paragraph is long enough to clear the floor and is prose.\n" +
        "Another sufficiently long content paragraph stays in the corpus.")
  }

  test("unquoted hrefs ending in '/' still open links (HTML5: no self-closing <a>)") {
    val got = blocksOf("<nav><a href=http://x.com/>Home</a> " +
      "<a href=http://x.com/about/>About this site</a></nav>")
    assert(got.head._1 == "Home About this site")
    assert(got.head._3 == got.head._2) // every char is link-attributed
    // a never-closed anchor poisons only ITS block (link depth is
    // block-scoped), so the next block stays prose
    val stuck = blocksOf("<p><a href=x>dangling</p><p>clean prose block</p>")
    assert(stuck.map(b => (b._1, b._3)) ==
      Seq(("dangling", 8), ("clean prose block", 0)))
  }

  test("nothing survives -> empty string; nested anchors bounded at zero") {
    val docs = Seq((1L, "<nav><a>a</a><a>b</a></nav>")).toDF("doc_id", "html")
    assert(Boilerplate.extractMain(docs, "html").select("main_text")
      .as[String].head() == "")
    // stray </a> must not drive linkDepth negative and poison later blocks
    val stray = blocksOf("</a><p>No links in this long enough paragraph.</p>")
    assert(stray.last._3 == 0)
  }
}
