package graft

import graft.html.HtmlStrip
import org.scalatest.funsuite.AnyFunSuite

class HtmlStripSpec extends AnyFunSuite {

  test("splits blocks at block tags and counts link words") {
    val html = "<div><p>quick brown fox</p><a href=\"#\">nav here</a></div>"
    val bs = HtmlStrip.blocks(html)
    assert(bs.map(_.text) == Vector("quick brown fox", "nav here"))
    assert(bs(0).linkWords == 0 && bs(0).words == 3)
    assert(bs(1).linkWords == 2 && bs(1).words == 2)
  }

  test("strip keeps content blocks, drops link-dense blocks") {
    val html = "<div><p>quick brown fox</p><a href=\"#\">nav here</a></div>"
    assert(HtmlStrip.strip(html) == "quick brown fox")
  }

  test("mixed block: a few link words inside prose are tolerated (<= 1/3)") {
    val html = "<p>one two three four five six <a href=\"#\">seven</a> eight nine</p>"
    assert(HtmlStrip.strip(html) == "one two three four five six seven eight nine")
  }

  test("script/style/comments are dropped wholesale") {
    val html = "<p>keep me</p><script>var x = 'no no no';</script>" +
      "<style>p { color: red }</style><!-- hidden words --><p>and me</p>"
    assert(HtmlStrip.mainContentBlocks(html) == Vector("keep me", "and me"))
  }

  test("reference template shape: cells kept, download link dropped") {
    // shape of /root/reference/html/html.go:25-52 (image variant)
    val html =
      """<html><head><style>table, th, td { border: 1px solid black; }</style></head>
        |<body>
        |Extract Table by Vegard Stikbakke. Go back <a href="https://example.com">home</a>.
        |<br /><br />
        |<a href="csv">Download CSV.</a>
        |<br /><br />
        |<table>
        |<tr><td>name</td><td>qty</td></tr>
        |<tr><td>apple</td><td>3</td></tr>
        |</table>
        |<br />
        |<img src="img">
        |</body></html>""".stripMargin
    val kept = HtmlStrip.mainContentBlocks(html)
    assert(kept == Vector(
      "Extract Table by Vegard Stikbakke. Go back home.",
      "name", "qty", "apple", "3"))
  }

  test("entities decode; malformed markup degrades to text") {
    assert(HtmlStrip.strip("<p>a &amp; b &lt;c&gt; &#65;</p>") == "a & b <c> A")
    assert(HtmlStrip.strip("just plain text, no tags") == "just plain text, no tags")
    assert(HtmlStrip.strip("<p>unclosed < dangling") == "unclosed < dangling")
    assert(HtmlStrip.strip("") == "")
  }

  test("self-closing anchors and unknown tags are inert") {
    assert(HtmlStrip.strip("<p>x <a/> y <span>z</span></p>") == "x y z")
  }
}
