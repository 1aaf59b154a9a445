package graft.sources

/** THE plain-JSON string escaper (quote, backslash, \n \r \t
  * shorthands, remaining control chars as \u00xx) — one definition for
  * every hand-assembled JSON document in the library (ClickHouse
  * JSONEachRow, Grafana provisioning, the analytics summary document).
  * [[ReportJson.goQuote]] stays separate deliberately: it reproduces
  * Go's encoder byte-for-byte (HTML-safe escapes, U+2028/9, surrogate
  * replacement), which these documents must NOT inherit.
  */
object JsonText {

  /** Escaped and quoted; a null input renders the JSON literal `null`
    * (unquoted), so callers can map collections without guarding.
    */
  def str(s: String): String =
    if (s == null) "null"
    else {
      val b = new StringBuilder(s.length + 2)
      b.append('"')
      s.foreach {
        case '"'  => b.append("\\\"")
        case '\\' => b.append("\\\\")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
        case c => b.append(c)
      }
      b.append('"')
      b.toString
    }
}
