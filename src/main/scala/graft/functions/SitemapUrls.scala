package graft.functions

/** sitemaps.org protocol parser — the crawl front door's URL
  * DISCOVERY channel, completing the gate chain robots.txt decides
  * (functions.RobotsRules) and URL canonicalization keys
  * (functions.UrlCanonical). Structure per the public protocol
  * (sitemaps.org/protocol.html):
  *
  *   - a `<urlset>` document carries `<url>` entries: required
  *     `<loc>`, optional `<lastmod>` (W3C datetime — date-only or
  *     full timestamp), `<changefreq>` (closed vocabulary), and
  *     `<priority>` (0.0–1.0, protocol default 0.5);
  *   - a `<sitemapindex>` document carries `<sitemap>` entries
  *     (`<loc>` + optional `<lastmod>`) pointing at child sitemaps;
  *   - per the protocol's limits, a sitemap may carry at most 50,000
  *     entries; parse refuses beyond that rather than truncating.
  *
  * Parse is total: None on malformed XML, a root element that is
  * neither urlset nor sitemapindex, or a url entry missing `<loc>`.
  * Out-of-vocabulary changefreq and out-of-range priority are
  * DROPPED to the protocol defaults (the documented consumer
  * leniency — Google's parsers ignore invalid optional fields), not
  * refused: optional-field junk must not cost a site its crawl.
  * lastmod keeps its raw W3C string; interpretation is the caller's
  * (crawl schedulers compare lexicographically within one format).
  */
object SitemapUrls {

  final case class Entry(loc: String, lastmod: Option[String],
                         changefreq: String, priority: Double)

  final case class Sitemap(isIndex: Boolean, entries: Seq[Entry])

  private val ChangefreqVocab = Set(
    "always", "hourly", "daily", "weekly", "monthly", "yearly", "never")

  val MaxEntries = 50000

  /** The protocol's 50 MB uncompressed-sitemap bound. The cheap first
    * gate is the in-memory CHAR count — note the direction: chars ≤
    * UTF-8 bytes, so a char-count cap alone UNDER-enforces the byte
    * bound (a multibyte sitemap of ≤ 50M chars can encode to up to
    * ~200 MB of UTF-8). Memory is already bounded (the string is in
    * hand), but the protocol bound is on BYTES, so inputs past the
    * chars-can't-exceed-it floor (MaxBytes/3 — BMP chars encode to ≤ 3
    * bytes, and a 4-byte supplementary code point spends 2 chars)
    * additionally pay one exact encoded-length scan before parsing.
    */
  val MaxBytes = 50 * 1024 * 1024
  val MaxChars = 50 * 1024 * 1024

  /** Exact UTF-8 encoded length without materializing the bytes. */
  private def utf8Length(s: String): Long = {
    var n = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      n += (if (c < 0x80) 1 else if (c < 0x800) 2 else 3)
      i += 1
    }
    // a surrogate pair counted 3+3 above actually encodes to 4
    n - 2 * s.codePoints().filter(_ > 0xFFFF).count()
  }

  /** Explicitly hardened SAX parser for untrusted crawl XML: DOCTYPE
    * declarations are REFUSED outright (no entity expansion surface at
    * all, rather than relying on the JDK's secure-processing expansion
    * limits), and external general/parameter entities are disabled.
    * The FACTORY is cached per thread — SAXParserFactory.newInstance
    * does an SPI service lookup every call (measured 6× on the
    * crawl-frontier scale cell when created per document) and the
    * class is not thread-safe, so ThreadLocal gives each executor task
    * thread its own; the parser itself is per-call (cheap from a
    * configured factory, and parser instances are stateful).
    */
  private val secureFactory =
    new ThreadLocal[javax.xml.parsers.SAXParserFactory] {
      override def initialValue(): javax.xml.parsers.SAXParserFactory = {
        val f = javax.xml.parsers.SAXParserFactory.newInstance()
        f.setNamespaceAware(false)
        f.setXIncludeAware(false)
        f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
        f.setFeature("http://xml.org/sax/features/external-general-entities", false)
        f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
        f
      }
    }

  private def secureLoader() =
    scala.xml.XML.withSAXParser(secureFactory.get().newSAXParser())

  def parse(xml: String): Option[Sitemap] = {
    if (xml.length > MaxChars) return None
    if (xml.length > MaxBytes / 3 && utf8Length(xml) > MaxBytes) return None
    val root =
      try secureLoader().loadString(xml)
      catch { case scala.util.control.NonFatal(_) => return None }
    root.label match {
      case "urlset" =>
        val urls = root \ "url"
        if (urls.length > MaxEntries) return None
        val entries = urls.map { u =>
          val loc = (u \ "loc").text.trim
          if (loc.isEmpty) return None
          val lastmod = Some((u \ "lastmod").text.trim).filter(_.nonEmpty)
          val cf = (u \ "changefreq").text.trim.toLowerCase
          val prio = (u \ "priority").text.trim.toDoubleOption
            .filter(p => p >= 0.0 && p <= 1.0)
          Entry(loc, lastmod,
            if (ChangefreqVocab(cf)) cf else "",
            prio.getOrElse(0.5))
        }
        Some(Sitemap(isIndex = false, entries))
      case "sitemapindex" =>
        val maps = root \ "sitemap"
        if (maps.length > MaxEntries) return None
        val entries = maps.map { m =>
          val loc = (m \ "loc").text.trim
          if (loc.isEmpty) return None
          Entry(loc, Some((m \ "lastmod").text.trim).filter(_.nonEmpty), "", 0.5)
        }
        Some(Sitemap(isIndex = true, entries))
      case _ => None
    }
  }
}
