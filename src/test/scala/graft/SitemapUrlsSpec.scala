package graft

import graft.functions.SitemapUrls
import org.scalatest.funsuite.AnyFunSuite

/** functions.SitemapUrls — the sitemaps.org protocol parser. Pins the
  * protocol behaviors by hand: urlset/sitemapindex field extraction,
  * the consumer-leniency rules for junk OPTIONAL fields (invalid
  * changefreq and out-of-range priority drop to the protocol defaults,
  * never refuse the document), hard refusals (malformed XML, foreign
  * root, missing required loc, over-limit entry counts), and totality
  * on junk.
  */
class SitemapUrlsSpec extends AnyFunSuite {

  private val ns = "xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\""

  test("urlset: loc required+trimmed, lastmod both W3C forms, defaults applied") {
    val sm = SitemapUrls.parse(
      s"""<urlset $ns>
         |<url><loc> https://a.test/1 </loc><lastmod>2025-01-02</lastmod>
         |  <changefreq>Daily</changefreq><priority>0.8</priority></url>
         |<url><loc>https://a.test/2</loc>
         |  <lastmod>2025-01-02T03:04:05+00:00</lastmod></url>
         |</urlset>""".stripMargin).get
    assert(!sm.isIndex && sm.entries.length == 2)
    val Seq(a, b) = sm.entries
    assert(a.loc == "https://a.test/1" && a.lastmod.contains("2025-01-02"))
    assert(a.changefreq == "daily" && a.priority == 0.8) // case-folded vocab
    assert(b.lastmod.contains("2025-01-02T03:04:05+00:00"))
    assert(b.changefreq == "" && b.priority == 0.5) // protocol defaults
  }

  test("junk OPTIONAL fields drop to defaults instead of refusing the document") {
    val sm = SitemapUrls.parse(
      s"""<urlset $ns><url><loc>https://a.test/x</loc>
         |<changefreq>sometimes</changefreq><priority>1.5</priority></url>
         |<url><loc>https://a.test/y</loc><priority>junk</priority></url>
         |</urlset>""".stripMargin).get
    assert(sm.entries(0).changefreq == "" && sm.entries(0).priority == 0.5)
    assert(sm.entries(1).priority == 0.5)
  }

  test("sitemapindex: child maps with optional lastmod, flagged as index") {
    val sm = SitemapUrls.parse(
      s"""<sitemapindex $ns>
         |<sitemap><loc>https://a.test/m1.xml</loc><lastmod>2025-02-03</lastmod></sitemap>
         |<sitemap><loc>https://a.test/m2.xml</loc></sitemap>
         |</sitemapindex>""".stripMargin).get
    assert(sm.isIndex && sm.entries.map(_.loc) ==
      Seq("https://a.test/m1.xml", "https://a.test/m2.xml"))
    assert(sm.entries(0).lastmod.contains("2025-02-03") && sm.entries(1).lastmod.isEmpty)
  }

  test("hard refusals: malformed XML, foreign root, missing loc, over-limit") {
    assert(SitemapUrls.parse("<urlset><url>").isEmpty)
    assert(SitemapUrls.parse("not xml at all").isEmpty)
    assert(SitemapUrls.parse(s"<feed $ns><url><loc>x</loc></url></feed>").isEmpty)
    assert(SitemapUrls.parse(s"<urlset $ns><url><priority>0.5</priority></url></urlset>").isEmpty)
    val over = new StringBuilder(s"<urlset $ns>")
    for (i <- 0 to SitemapUrls.MaxEntries) // one past the protocol cap
      over.append(s"<url><loc>u$i</loc></url>")
    over.append("</urlset>")
    assert(SitemapUrls.parse(over.toString).isEmpty,
      "the 50k protocol limit must refuse, not truncate")
  }

  test("total on junk: control bytes, huge attributes, deep nesting never throw") {
    SitemapUrls.parse("\u0000\u0001<urlset>")
    SitemapUrls.parse(s"<urlset $ns><url><loc>${"x" * 100000}</loc></url></urlset>")
    SitemapUrls.parse("<a><b><c><d>" * 100)
  }

  test("hardened parse: DOCTYPE refused outright, oversized input rejected before parsing") {
    // entity-expansion surface: a DOCTYPE (even a harmless internal
    // one) is refused — crawl XML is untrusted and the protocol needs
    // no DTD at all, so the parser never starts on one
    assert(SitemapUrls.parse(
      s"""<?xml version="1.0"?><!DOCTYPE urlset [<!ENTITY x "y">]>
         |<urlset $ns><url><loc>&x;</loc></url></urlset>""".stripMargin).isEmpty)
    assert(SitemapUrls.parse(
      s"""<!DOCTYPE urlset SYSTEM "http://example.invalid/x.dtd">
         |<urlset $ns><url><loc>u</loc></url></urlset>""".stripMargin).isEmpty)
    // the protocol's 50 MB bound, gated on char count BEFORE the
    // parser ever sees the input: a just-over-cap document is refused
    // even though its XML is well-formed
    val pad = "<!--" + "x" * SitemapUrls.MaxChars + "-->"
    assert(SitemapUrls.parse(s"<urlset $ns>$pad<url><loc>u</loc></url></urlset>").isEmpty)
    // ...and the bound is on BYTES, not chars: a multibyte document
    // under the char cap but over 50 MB of encoded UTF-8 is refused
    // (chars ≤ bytes, so a char gate alone under-enforces the
    // protocol bound — 'é' encodes to 2 bytes per char)
    val mbPad = "<!--" + "é" * (SitemapUrls.MaxBytes / 2) + "-->"
    assert(mbPad.length <= SitemapUrls.MaxChars)
    assert(SitemapUrls.parse(s"<urlset $ns>$mbPad<url><loc>u</loc></url></urlset>").isEmpty)
    // and an ordinary DOCTYPE-free document still parses
    assert(SitemapUrls.parse(s"<urlset $ns><url><loc>u</loc></url></urlset>").nonEmpty)
  }
}
