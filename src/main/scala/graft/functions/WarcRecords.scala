package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

/** Dependency-free WARC 1.0 record handling — the crawl pipeline's
  * actual front door: web corpora arrive as WARC files (ISO 28500,
  * the Common Crawl container), each a concatenation of records
  * ("WARC/1.0" header block, CRLF-separated named headers,
  * Content-Length octets of payload, blank-line terminators). A
  * response record's payload is a full HTTP message whose body is the
  * page HTML that boilerplate removal then cleans.
  *
  * Parse walks records sequentially by declared Content-Length (never
  * by scanning for magic inside payloads — a payload may legally
  * contain "WARC/1.0"), skips non-response records (warcinfo,
  * request, metadata), and splits the HTTP payload at its first blank
  * line. Totality: malformed framing returns None for the whole blob
  * (a torn file should be retried/quarantined, not half-ingested).
  */
object WarcRecords {

  final case class Response(uri: String, status: Int, httpHeaders: String,
                            body: Array[Byte])

  /** All response records of one WARC blob; None on broken framing. */
  def parse(b: Array[Byte]): Option[Seq[Response]] =
    try parseImpl(b)
    catch { case scala.util.control.NonFatal(_) => None }

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int, until: Int): Int = {
    var i = from
    while (i + 3 < until) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  private def parseImpl(b: Array[Byte]): Option[Seq[Response]] = {
    val out = Seq.newBuilder[Response]
    var pos = 0
    var sawAny = false
    while (pos < b.length) {
      // record header block: "WARC/1.0\r\n" + headers + CRLFCRLF
      if (pos + 10 > b.length ||
          new String(b, pos, 8, UTF_8) != "WARC/1.0" ||
          b(pos + 8) != '\r' || b(pos + 9) != '\n') return None
      val hEnd = indexOfCrlfCrlf(b, pos + 10, b.length)
      if (hEnd < 0) return None
      val headers = new String(b, pos + 10, hEnd - pos - 10, UTF_8)
      var warcType = ""
      var uri = ""
      var clen = -1L
      headers.split("\r\n").foreach { line =>
        val k = line.indexOf(':')
        if (k > 0) {
          val name = line.substring(0, k).trim.toLowerCase
          val value = line.substring(k + 1).trim
          name match {
            case "warc-type" => warcType = value
            case "warc-target-uri" => uri = value
            case "content-length" =>
              clen = try value.toLong catch { case _: NumberFormatException => -1L }
            case _ => ()
          }
        }
      }
      if (clen < 0) return None
      val payloadStart = hEnd + 4
      val payloadEnd = payloadStart + clen
      // two CRLFs terminate every record (ISO 28500 §4)
      if (payloadEnd + 4 > b.length) return None
      if (b(payloadEnd.toInt) != '\r' || b(payloadEnd.toInt + 1) != '\n' ||
          b(payloadEnd.toInt + 2) != '\r' || b(payloadEnd.toInt + 3) != '\n')
        return None
      if (warcType.equalsIgnoreCase("response")) {
        // payload is an HTTP message: status line + headers, CRLFCRLF, body
        val hhEnd = indexOfCrlfCrlf(b, payloadStart.toInt, payloadEnd.toInt)
        if (hhEnd < 0) return None
        val http = new String(b, payloadStart.toInt, hhEnd - payloadStart.toInt, UTF_8)
        val statusLine = http.takeWhile(_ != '\r')
        val parts = statusLine.split(" ")
        if (parts.length < 2 || !parts(0).startsWith("HTTP/")) return None
        val status = try parts(1).toInt catch { case _: NumberFormatException => return None }
        val body = java.util.Arrays.copyOfRange(b, hhEnd + 4, payloadEnd.toInt)
        out += Response(uri, status, http, body)
      }
      sawAny = true
      pos = (payloadEnd + 4).toInt
    }
    if (!sawAny) None else Some(out.result())
  }

  /** Parse a `.warc.gz` blob — the form Common Crawl actually ships:
    * each record is its OWN gzip member (concatenated members), which
    * is what lets a cluster range-read single records out of a
    * petabyte archive. Members are inflated ONE BY ONE (not via
    * GZIPInputStream over the whole buffer, which silently treats a
    * garbled mid-archive member header as "trailing garbage" and ends
    * the stream — a silent partial ingest): every input byte must
    * belong to a structurally valid member whose CRC32 + ISIZE
    * trailer verifies, or the whole blob is None. Then the same
    * all-or-nothing record walk.
    */
  def parseGz(b: Array[Byte]): Option[Seq[Response]] =
    inflateMembers(b).flatMap(parse)

  /** Inflate a concatenation of gzip members (RFC 1952), all-or-
    * nothing: None unless the ENTIRE buffer is consumed as valid
    * members — header structure, reserved FLG bits, per-member CRC32
    * and ISIZE all checked. `Inflater.getBytesRead` locates each
    * member's trailer so a corrupt later member can never be
    * mistaken for trailing garbage.
    */
  private[graft] def inflateMembers(b: Array[Byte]): Option[Array[Byte]] = {
    if (b.length == 0) return None
    def u32le(at: Int): Long =
      (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
      ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    while (pos < b.length) {
      // member header (RFC 1952 §2.3): magic, CM=deflate, known FLG bits
      if (pos + 10 > b.length || (b(pos) & 0xff) != 0x1f ||
          (b(pos + 1) & 0xff) != 0x8b || (b(pos + 2) & 0xff) != 8) return None
      val flg = b(pos + 3) & 0xff
      if ((flg & 0xe0) != 0) return None // reserved bits must be zero
      var p = pos + 10
      if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
        if (p + 2 > b.length) return None
        p += 2 + ((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8))
        if (p > b.length) return None
      }
      if ((flg & 8) != 0) { // FNAME: NUL-terminated
        while (p < b.length && b(p) != 0) p += 1
        if (p >= b.length) return None
        p += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT: NUL-terminated
        while (p < b.length && b(p) != 0) p += 1
        if (p >= b.length) return None
        p += 1
      }
      if ((flg & 2) != 0) { p += 2; if (p > b.length) return None } // FHCRC
      // raw deflate stream; getBytesRead pins the trailer position
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(b, p, b.length - p)
        val crc = new java.util.zip.CRC32()
        val buf = new Array[Byte](65536)
        var size = 0L
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException => return None }
          if (n == 0 && !inf.finished()) return None // truncated member
          crc.update(buf, 0, n)
          out.write(buf, 0, n)
          size += n
        }
        val trailer = p + inf.getBytesRead.toInt
        if (trailer + 8 > b.length) return None
        if (u32le(trailer) != crc.getValue) return None
        if (u32le(trailer + 4) != (size & 0xffffffffL)) return None
        pos = trailer + 8
      } finally inf.end()
    }
    Some(out.toByteArray)
  }

  /** Detect plain vs gzip framing and parse accordingly. */
  def parseAny(b: Array[Byte]): Option[Seq[Response]] =
    if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b) parseGz(b)
    else parse(b)

  /** [[build]]'s `.warc.gz` twin: one gzip MEMBER per record (the
    * member boundary IS the record boundary — Common Crawl's layout).
    */
  def buildGz(pages: Seq[(Long, String)]): Array[Byte] = {
    val plain = build(pages)
    // re-walk the plain records to emit one member each — reuses the
    // single framing implementation rather than duplicating it
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    while (pos < plain.length) {
      val hEnd = indexOfCrlfCrlf(plain, pos, plain.length)
      val headers = new String(plain, pos, hEnd - pos, UTF_8)
      val clen = headers.split("\r\n").find(_.toLowerCase.startsWith("content-length"))
        .get.split(":")(1).trim.toInt
      val recEnd = hEnd + 4 + clen + 4
      // per-member stream closed via try/finally: close() ends the
      // Deflater's native buffer (finish() alone leaks it until GC)
      val mem = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(mem)
      try { gz.write(plain, pos, recEnd - pos); gz.finish() }
      finally gz.close()
      mem.writeTo(out)
      pos = recEnd
    }
    out.toByteArray
  }

  /** One WARC blob from (doc_id, html) pages: a warcinfo record then
    * one HTTP-response record per page, with the closed-form URI
    * scheme the oracle recomputes. Framing is byte-exact ISO 28500 —
    * [[parse]] and independent header checks in the spec both walk it.
    */
  def build(pages: Seq[(Long, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def record(headers: Seq[(String, String)], payload: Array[Byte]): Unit = {
      out.write("WARC/1.0\r\n".getBytes(UTF_8))
      (headers :+ ("Content-Length" -> payload.length.toString)).foreach {
        case (k, v) => out.write(s"$k: $v\r\n".getBytes(UTF_8))
      }
      out.write("\r\n".getBytes(UTF_8))
      out.write(payload)
      out.write("\r\n\r\n".getBytes(UTF_8))
    }
    record(
      Seq("WARC-Type" -> "warcinfo",
          "WARC-Date" -> "2026-01-01T00:00:00Z",
          "Content-Type" -> "application/warc-fields"),
      "software: graft-crawler/1.0\r\n".getBytes(UTF_8))
    pages.foreach { case (d, html) =>
      val body = html.getBytes(UTF_8)
      val http = (s"HTTP/1.1 200 OK\r\n" +
        s"Content-Type: text/html; charset=utf-8\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8)
      record(
        Seq("WARC-Type" -> "response",
            "WARC-Target-URI" -> s"https://site${d % 5}.test/doc$d",
            "WARC-Date" -> "2026-01-01T00:00:00Z",
            "WARC-Record-ID" -> s"<urn:uuid:doc-$d>",
            "Content-Type" -> "application/http;msgtype=response"),
        http ++ body)
    }
    out.toByteArray
  }
}
