package graft

import graft.functions.HtmlText
import org.scalatest.funsuite.AnyFunSuite

/** HTML visible-text extraction: hand-pinned tag/script/entity cases
  * independent of the fixture builder, plus the builder round-trip and
  * tag-soup totality.
  */
class HtmlTextSpec extends AnyFunSuite {

  private def text(html: String): String = HtmlText.extract(html).get.text
  private def title(html: String): String = HtmlText.extract(html).get.title

  test("strips tags, keeps body text, collapses whitespace") {
    val h = "<html><head></head><body> <div>alpha   beta</div>\n<span>gamma</span></body></html>"
    assert(text(h) == "alpha beta gamma")
  }

  test("script and style bodies vanish wholesale, even with '<' inside") {
    val h = "<body>a<script>if(x<2){alert('&amp;b')}</script>c<style>p>q{}</style>d</body>"
    assert(text(h) == "a c d")
  }

  test("comments vanish; head text never leaks; title captured separately") {
    val h = "<html><head><title>My Title</title>headjunk</head>" +
      "<body><!-- secret -->visible</body>"
    assert(text(h) == "visible")
    assert(title(h) == "My Title")
  }

  test("entities decode: named, decimal, hex; unknown stays literal") {
    val h = "<body>a&amp;b &lt;x&gt; &#65; &#x42; &nosuch; &amp</body>"
    assert(text(h) == "a&b <x> A B &nosuch; &amp")
  }

  test("uppercase tags and scripts are recognized") {
    val h = "<BODY>a<SCRIPT>junk</SCRIPT>b</BODY>"
    assert(text(h) == "a b")
  }

  test("unterminated structures degrade to best-effort, never throw") {
    assert(text("<body>ok<script>never closed") == "ok")
    assert(text("<body>ok<div unterminated") == "ok")
    assert(HtmlText.extract("<body>&#999999999999;x</body>").isDefined)
    assert(HtmlText.extract(null).isEmpty)
  }

  test("tag soup totality: random angle-bracket junk never throws") {
    val rnd = new scala.util.Random(7)
    val alphabet = "<>&;#ab /=\"'-!ptyle".toCharArray
    for (_ <- 0 until 2000) {
      val s = Array.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
      HtmlText.extract(s) // must not throw
    }
  }

  test("href extraction: quoted forms, body-only, missing-href anchors skipped") {
    val h = "<head><a href='http://head.only/x'></a></head>" +
      "<body><a href=\"http://a/1\">x</a> mid <a name='no-href'></a>" +
      "<A HREF='http://a/2'></A><a href=broken></a></body>"
    val e = HtmlText.extract(h).get
    assert(e.links == Seq("http://a/1", "http://a/2")) // head + unquoted skipped
    assert(e.text == "x mid")
  }

  test("syntheticHtml plants one anchor per paragraph, recoverable closed-form") {
    val doc = (1 to 25).map(i => s"w$i").mkString(" ")
    val e = HtmlText.extract(HtmlText.syntheticHtml(13L, doc)).get
    assert(e.links == Seq("https://site3.test/doc13/p0",
                          "https://site3.test/doc13/p1",
                          "https://site3.test/doc13/p2"))
    assert(HtmlText.extract(HtmlText.syntheticHtml(13L, "")).get.links.isEmpty)
  }

  test("syntheticHtml round-trips: extraction is the closed-form of the words") {
    val doc = "alpha beta  gamma <odd> & words " + (1 to 25).map(i => s"w$i").mkString(" ")
    val e = HtmlText.extract(HtmlText.syntheticHtml(42L, doc)).get
    val words = doc.split(" ").filter(_.nonEmpty)
    assert(e.title == "Doc 42")
    assert(e.text == (words ++ Seq("Tail", "&", "@", "<end>")).mkString(" "))
    assert(e.nParagraphs == (words.length + 9) / 10 + 1)
    // the empty document keeps only the tail paragraph
    val empty = HtmlText.extract(HtmlText.syntheticHtml(7L, "")).get
    assert(empty.text == "Tail & @ <end>" && empty.nParagraphs == 1)
  }
}
