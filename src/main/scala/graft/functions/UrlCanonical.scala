package graft.functions

/** RFC 3986 URL normalization — the canonical form URL-level dedup
  * keys on (the d_url_dedup entry's regex sketch, done properly):
  *
  *   - §6.2.2.1 case: scheme and host lowercase; remaining
  *     percent-triplet hex digits UPPERCASE;
  *   - §6.2.2.2 percent-decoding of UNRESERVED characters only
  *     (ALPHA / DIGIT / '-' / '.' / '_' / '~') — reserved characters
  *     stay encoded because decoding them changes the URL;
  *   - §6.2.2.3 dot-segment removal on the path ("/a/./b/../c" →
  *     "/a/c") via the RFC's remove_dot_segments algorithm;
  *   - §6.2.3 scheme-based: drop an explicit default port (http :80,
  *     https :443) and give an authority-form URL with an empty path
  *     the path "/";
  *   - fragments are stripped (they never reach the origin — the
  *     crawl-identity convention).
  *
  * Totality: any string is accepted; None only when there is no
  * parseable `scheme://` head. Malformed percent escapes pass through
  * verbatim (the RFC's own leniency for consumers).
  */
object UrlCanonical {

  final case class Canon(url: String, host: String, port: Int, path: String,
                         hadFragment: Boolean)

  private def isUnreserved(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hex(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Decode unreserved percent-escapes, uppercase the rest (§6.2.2.1-2). */
  private[graft] def pctNormalize(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          hex(s.charAt(i + 1)) >= 0 && hex(s.charAt(i + 2)) >= 0) {
        val v = (hex(s.charAt(i + 1)) << 4) | hex(s.charAt(i + 2))
        if (isUnreserved(v.toChar)) out.append(v.toChar)
        else {
          out.append('%')
          out.append(Character.toUpperCase(s.charAt(i + 1)))
          out.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[graft] def removeDotSegments(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "/..") { in = "/"; if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "." || in == "..") in = ""
      else {
        val end = {
          val slash = in.indexOf('/', 1)
          if (slash < 0) in.length else slash
        }
        out += in.substring(0, end)
        in = in.substring(end)
      }
    }
    out.mkString
  }

  def canonicalize(raw: String): Option[Canon] = {
    val sep = raw.indexOf("://")
    if (sep <= 0) return None
    val scheme = raw.substring(0, sep)
    if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.') ||
        !scheme.head.isLetter) return None
    val schemeC = scheme.toLowerCase
    var rest = raw.substring(sep + 3)
    val hadFragment = {
      val h = rest.indexOf('#')
      if (h >= 0) { rest = rest.substring(0, h); true } else false
    }
    val (beforeQuery, query) = {
      val q = rest.indexOf('?')
      if (q >= 0) (rest.substring(0, q), rest.substring(q)) else (rest, "")
    }
    val pathStart = beforeQuery.indexOf('/')
    val (authority, rawPath) =
      if (pathStart >= 0) (beforeQuery.substring(0, pathStart), beforeQuery.substring(pathStart))
      else (beforeQuery, "")
    // userinfo percent-normalized like every other component (§6.2.2
    // applies URL-wide) but NOT case-folded (only scheme and host are);
    // host/port after the last '@'
    val at = authority.lastIndexOf('@')
    val userinfo = if (at >= 0) pctNormalize(authority.substring(0, at + 1)) else ""
    val hostPort = authority.substring(at + 1)
    val colon = hostPort.lastIndexOf(':')
    val (rawHost, rawPort) =
      if (colon >= 0 && hostPort.substring(colon + 1).forall(_.isDigit))
        (hostPort.substring(0, colon), hostPort.substring(colon + 1))
      else (hostPort, "")
    val host = pctNormalize(rawHost).toLowerCase
    val defaultPort = schemeC match { case "http" => 80; case "https" => 443; case _ => -1 }
    val givenPort = if (rawPort.nonEmpty) rawPort.toIntOption.getOrElse(-1) else defaultPort
    val portPart = if (givenPort == defaultPort || givenPort < 0) "" else s":$givenPort"
    val path = {
      val p = removeDotSegments(pctNormalize(rawPath))
      if (p.isEmpty) "/" else p
    }
    val queryC = pctNormalize(query)
    Some(Canon(s"$schemeC://$userinfo$host$portPart$path$queryC",
      host, if (givenPort < 0) -1 else givenPort, path, hadFragment))
  }
}
