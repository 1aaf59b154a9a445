package graft.functions

/** Dependency-free HTML visible-text extraction — the boilerplate-
  * removal stage of a crawl pipeline (the job trafilatura/jusText do):
  * strip tags, drop <script>/<style> bodies and comments wholesale,
  * decode character entities, collapse whitespace. A crawl's HTML
  * must become clean text before any dedup/quality/tokenize stage
  * sees it.
  *
  * Single-pass character state machine, no regex backtracking — the
  * per-row cost is linear in the document, which is what survives a
  * 100 TB crawl. Totality: None only on null input; any malformed
  * tag soup degrades to best-effort text (browsers' error model),
  * never a throw.
  */
object HtmlText {

  final case class Extracted(title: String, text: String, nParagraphs: Int,
                             links: Seq[String])

  private val Entities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** Title, visible BODY text (whitespace-collapsed), and <p> count. */
  def extract(html: String): Option[Extracted] = {
    if (html == null) return None
    val n = html.length
    val lower = html.toLowerCase // once — close-tag scans stay O(n) total
    val text = new StringBuilder
    val title = new StringBuilder
    var i = 0
    var inBody = false
    var inTitle = false
    var nP = 0
    var pendingSpace = false
    val links = Seq.newBuilder[String]

    /** href value from a raw <a ...> tag body (quoted forms only). */
    def href(tagBody: String): Option[String] = {
      val lb = tagBody.toLowerCase
      val k = lb.indexOf("href")
      if (k < 0) return None
      val eq = tagBody.indexOf('=', k + 4)
      if (eq < 0) return None
      var v = eq + 1
      while (v < tagBody.length && tagBody.charAt(v) == ' ') v += 1
      if (v >= tagBody.length) return None
      val q = tagBody.charAt(v)
      if (q != '"' && q != '\'') return None
      val endQ = tagBody.indexOf(q, v + 1)
      if (endQ < 0) None else Some(tagBody.substring(v + 1, endQ))
    }

    def sb: StringBuilder = if (inTitle) title else text

    def emit(c: Char): Unit = {
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
        if (sb.nonEmpty) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
    }

    /** Case-insensitive match of `s` at position `at`. */
    def at(atPos: Int, s: String): Boolean =
      atPos + s.length <= n && html.regionMatches(true, atPos, s, 0, s.length)

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (at(i, "<!--")) { // comment: skip to -->
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
          if (sb.nonEmpty) pendingSpace = true // a dropped node still bounds words
        } else if (at(i, "<script")) {
          val e = lower.indexOf("</script", i)
          i = if (e < 0) n else html.indexOf('>', e) match {
            case -1 => n
            case x => x + 1
          }
          if (sb.nonEmpty) pendingSpace = true
        } else if (at(i, "<style")) {
          val e = lower.indexOf("</style", i)
          i = if (e < 0) n else html.indexOf('>', e) match {
            case -1 => n
            case x => x + 1
          }
          if (sb.nonEmpty) pendingSpace = true
        } else {
          val close = html.indexOf('>', i)
          if (close < 0) { i = n } // unterminated tag: drop the tail
          else {
            val body = html.substring(i + 1, close).trim.toLowerCase
            val name = body.takeWhile(ch => ch.isLetterOrDigit || ch == '/')
            name match {
              case "body" => inBody = true; pendingSpace = false
              case "/body" => inBody = false
              case "title" => inTitle = true; pendingSpace = false
              case "/title" => inTitle = false
              case "p" => if (inBody) nP += 1
              case "a" =>
                if (inBody) href(html.substring(i + 1, close)).foreach(links += _)
              case _ => ()
            }
            // any tag is a word boundary (block or not — collapsing
            // makes the distinction moot for our space-joined corpus)
            if (sb.nonEmpty) pendingSpace = true
            i = close + 1
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        val handled =
          if (semi > i && semi - i <= 8) {
            val name = html.substring(i + 1, semi)
            if (name.startsWith("#")) {
              val code =
                try {
                  if (name.length > 1 && (name.charAt(1) == 'x' || name.charAt(1) == 'X'))
                    Integer.parseInt(name.substring(2), 16)
                  else Integer.parseInt(name.substring(1))
                } catch { case _: NumberFormatException => -1 }
              if (code >= 0 && code <= 0x10ffff && (inBody || inTitle)) {
                new String(Character.toChars(code)).foreach(emit)
                true
              } else code >= 0 // valid ref outside body/title: just skip
            } else Entities.get(name.toLowerCase) match {
              case Some(rep) =>
                if (inBody || inTitle) rep.foreach(emit)
                true
              case None => false
            }
          } else false
        if (handled) i = semi + 1
        else { if (inBody || inTitle) emit(c); i += 1 }
      } else {
        if (inBody || inTitle) emit(c)
        i += 1
      }
    }
    Some(Extracted(title.result(), text.result(), nP, links.result()))
  }

  /** Fixture-side inverse: wrap a document's words into a full HTML
    * page — head with title/script/style junk that must be DROPPED, a
    * comment, body paragraphs of 10 words each (entity-escaped), and
    * an entity-bearing tail paragraph — such that extraction recovers
    * a closed-form function of (doc_id, words).
    */
  def syntheticHtml(docId: Long, text: String): String = {
    val esc = text.split(" ").filter(_.nonEmpty).map(w =>
      w.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;"))
    val paras = esc.grouped(10).zipWithIndex
      .map { case (g, pi) =>
        s"<p class='c${docId % 7}'>${g.mkString(" ")}</p>" +
          s"<a href=\"https://site${docId % 5}.test/doc$docId/p$pi\"></a>"
      }.mkString
    s"""<html><head><title>Doc $docId</title>
       |<script type="text/javascript">if(x<2){alert("&amp;")}</script>
       |<style>p>a{color:red}</style></head>
       |<body><!-- id $docId -->$paras
       |<p>Tail &amp; &#64; &lt;end&gt;</p></body></html>""".stripMargin
  }
}
