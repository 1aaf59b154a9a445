package graft

import java.nio.charset.StandardCharsets.UTF_8
import graft.functions.WarcRecords
import org.scalatest.funsuite.AnyFunSuite

/** WARC framing: round-trips, an independent hand-walk of the bytes,
  * length-driven (not magic-scanning) record advance, skip rules, and
  * totality on torn files.
  */
class WarcRecordsSpec extends AnyFunSuite {

  test("build + parse round-trips pages with exact bodies") {
    val pages = Seq(1L -> "<body>one</body>", 7L -> "<body>seven &amp; more</body>")
    val rs = WarcRecords.parse(WarcRecords.build(pages)).get
    assert(rs.length == 2) // warcinfo skipped
    assert(rs.map(_.uri) == Seq("https://site1.test/doc1", "https://site2.test/doc7"))
    assert(rs.forall(_.status == 200))
    assert(new String(rs(1).body, UTF_8) == "<body>seven &amp; more</body>")
  }

  test("independent byte walk: framing fields are real ISO 28500") {
    val blob = WarcRecords.build(Seq(3L -> "<body>x</body>"))
    val s = new String(blob, UTF_8)
    assert(s.startsWith("WARC/1.0\r\n"))
    // find the response record and hand-verify its Content-Length
    val respAt = s.indexOf("WARC-Type: response")
    assert(respAt > 0)
    val recStart = s.lastIndexOf("WARC/1.0\r\n", respAt)
    val hEnd = s.indexOf("\r\n\r\n", recStart)
    val headers = s.substring(recStart, hEnd)
    val clen = headers.split("\r\n").find(_.startsWith("Content-Length:"))
      .get.split(":")(1).trim.toInt
    val payload = s.substring(hEnd + 4, hEnd + 4 + clen)
    assert(payload.startsWith("HTTP/1.1 200 OK\r\n"))
    assert(payload.endsWith("<body>x</body>"))
    assert(s.substring(hEnd + 4 + clen).startsWith("\r\n\r\n"))
    // the HTTP Content-Length matches the body bytes
    val httpClen = payload.split("\r\n").find(_.startsWith("Content-Length:"))
      .get.split(":")(1).trim.toInt
    assert(httpClen == "<body>x</body>".getBytes(UTF_8).length)
  }

  test("hand-authored Common-Crawl-shaped file: bytes the repo's writer never produced") {
    // Framed here BY HAND per ISO 28500 with the full header set a real
    // Common Crawl segment carries (warcinfo + request + response +
    // metadata records, urn:uuid record ids, digests, truncation of the
    // writer's minimal-header shape is deliberate) — an offline
    // stand-in for vendoring a crawl record verbatim (zero egress).
    // WarcRecords.build emits none of these headers and no
    // request/metadata records, so agreement here is parser-vs-spec,
    // not writer-vs-reader.
    def record(headers: Seq[(String, String)], payload: Array[Byte]): Array[Byte] = {
      val h = new StringBuilder("WARC/1.0\r\n")
      headers.foreach { case (k, v) => h.append(s"$k: $v\r\n") }
      h.append(s"Content-Length: ${payload.length}\r\n\r\n")
      h.toString.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
    }
    val body = "<!DOCTYPE html>\n<html><head><title>Example Domain</title></head>\n" +
      "<body><h1>Example Domain</h1><p>This domain is for use in examples.</p></body></html>"
    val httpResp = ("HTTP/1.1 200 OK\r\n" +
      "Date: Thu, 14 Mar 2024 09:26:32 GMT\r\n" +
      "Content-Type: text/html; charset=UTF-8\r\n" +
      s"Content-Length: ${body.getBytes(UTF_8).length}\r\n" +
      "X-Crawler-Transfer-Encoding: chunked\r\n\r\n" + body).getBytes(UTF_8)
    val blob =
      record(Seq(
        "WARC-Type" -> "warcinfo",
        "WARC-Date" -> "2024-03-14T09:26:32Z",
        "WARC-Filename" -> "CC-MAIN-20240314092632-20240314122632-00000.warc.gz",
        "WARC-Record-ID" -> "<urn:uuid:6f9482d0-8b3b-4f0a-93a1-0b16b6f2a001>",
        "Content-Type" -> "application/warc-fields"),
        ("software: Nutch 1.19 (modified)\r\nisPartOf: CC-MAIN-2024-10\r\n" +
          "operator: Common Crawl Admin (info@commoncrawl.org)\r\n" +
          "format: WARC File Format 1.1\r\n").getBytes(UTF_8)) ++
      record(Seq(
        "WARC-Type" -> "request",
        "WARC-Date" -> "2024-03-14T09:26:32Z",
        "WARC-Record-ID" -> "<urn:uuid:6f9482d0-8b3b-4f0a-93a1-0b16b6f2a002>",
        "WARC-Target-URI" -> "https://example.com/",
        "WARC-Warcinfo-ID" -> "<urn:uuid:6f9482d0-8b3b-4f0a-93a1-0b16b6f2a001>",
        "Content-Type" -> "application/http; msgtype=request"),
        ("GET / HTTP/1.1\r\nHost: example.com\r\nUser-Agent: CCBot/2.0\r\n" +
          "Accept: text/html\r\n\r\n").getBytes(UTF_8)) ++
      record(Seq(
        "WARC-Type" -> "response",
        "WARC-Date" -> "2024-03-14T09:26:32Z",
        "WARC-Record-ID" -> "<urn:uuid:6f9482d0-8b3b-4f0a-93a1-0b16b6f2a003>",
        "WARC-Concurrent-To" -> "<urn:uuid:6f9482d0-8b3b-4f0a-93a1-0b16b6f2a002>",
        "WARC-Target-URI" -> "https://example.com/",
        "WARC-Warcinfo-ID" -> "<urn:uuid:6f9482d0-8b3b-4f0a-93a1-0b16b6f2a001>",
        "WARC-IP-Address" -> "93.184.216.34",
        "WARC-Payload-Digest" -> "sha1:UZY6ND6CCHXETFVJD2MSS7ZENMWF7KQ2",
        "WARC-Block-Digest" -> "sha1:YQ5R7BPLGP3RMQUEHPXLNPBBSJW2ZMPQ",
        "WARC-Identified-Payload-Type" -> "text/html",
        "Content-Type" -> "application/http; msgtype=response"),
        httpResp) ++
      record(Seq(
        "WARC-Type" -> "metadata",
        "WARC-Date" -> "2024-03-14T09:26:32Z",
        "WARC-Record-ID" -> "<urn:uuid:6f9482d0-8b3b-4f0a-93a1-0b16b6f2a004>",
        "WARC-Concurrent-To" -> "<urn:uuid:6f9482d0-8b3b-4f0a-93a1-0b16b6f2a003>",
        "WARC-Target-URI" -> "https://example.com/",
        "Content-Type" -> "application/warc-fields"),
        "fetchTimeMs: 227\r\ncharset-detected: UTF-8\r\n".getBytes(UTF_8))

    val rs = WarcRecords.parse(blob).get
    assert(rs.length == 1, "exactly the response record survives")
    val r = rs.head
    assert(r.uri == "https://example.com/")
    assert(r.status == 200)
    assert(r.httpHeaders.contains("Content-Type: text/html; charset=UTF-8"))
    assert(new String(r.body, UTF_8) == body)
    // and the gz framing composes with the same hand bytes: wrap each
    // record as its own gzip member, Common Crawl's actual layout
    def gzMember(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(b); gz.close()
      bos.toByteArray
    }
    // re-split the blob into its four records by walking lengths by hand
    val lens = {
      var pos = 0; val cuts = Seq.newBuilder[Int]
      while (pos < blob.length) {
        val hEnd = new String(blob, pos, blob.length - pos, UTF_8).indexOf("\r\n\r\n") + pos
        val clen = new String(blob, pos, hEnd - pos, UTF_8).split("\r\n")
          .find(_.startsWith("Content-Length:")).get.split(":")(1).trim.toInt
        pos = hEnd + 4 + clen + 4
        cuts += pos
      }
      cuts.result()
    }
    val members = (0 +: lens).sliding(2).map { case Seq(a, b) =>
      gzMember(java.util.Arrays.copyOfRange(blob, a, b))
    }.reduce(_ ++ _)
    val gzRs = WarcRecords.parseGz(members).get
    assert(gzRs.length == 1 && gzRs.head.uri == "https://example.com/")
    assert(new String(gzRs.head.body, UTF_8) == body)
  }

  test("record advance is length-driven: payloads containing the magic don't resync") {
    val tricky = "<body>WARC/1.0 fake\r\n\r\nrecord inside text</body>"
    val rs = WarcRecords.parse(WarcRecords.build(Seq(9L -> tricky))).get
    assert(rs.length == 1)
    assert(new String(rs.head.body, UTF_8) == tricky)
  }

  test("non-response records are skipped, not misparsed") {
    val meta = ("WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 4\r\n\r\n" +
      "abcd\r\n\r\n").getBytes(UTF_8)
    val blob = meta ++ WarcRecords.build(Seq(2L -> "<body>y</body>"))
    val rs = WarcRecords.parse(blob).get
    assert(rs.length == 1 && rs.head.uri.endsWith("doc2"))
  }

  test("torn framing returns None, never a partial ingest") {
    val blob = WarcRecords.build(Seq(1L -> "<body>z</body>", 2L -> "<body>w</body>"))
    for (cut <- Seq(4, 40, blob.length / 2, blob.length - 2))
      assert(WarcRecords.parse(java.util.Arrays.copyOf(blob, cut)).isEmpty, s"cut=$cut")
    val badLen = new String(blob, UTF_8)
      .replaceFirst("Content-Length: [0-9]+", "Content-Length: nope").getBytes(UTF_8)
    assert(WarcRecords.parse(badLen).isEmpty)
    assert(WarcRecords.parse("not a warc".getBytes(UTF_8)).isEmpty)
    assert(WarcRecords.parse(Array.emptyByteArray).isEmpty)
  }

  test(".warc.gz: one gzip member per record, inflates to the same records") {
    val pages = Seq(1L -> "<body>one</body>", 2L -> "<body>two</body>")
    val gz = WarcRecords.buildGz(pages)
    // member count == record count (warcinfo + 2 responses): each
    // member opens with its own gzip magic
    var members = 0
    for (i <- 0 until gz.length - 1)
      if ((gz(i) & 0xff) == 0x1f && (gz(i + 1) & 0xff) == 0x8b) members += 1
    assert(members == 3)
    val rs = WarcRecords.parseAny(gz).get
    assert(rs.map(_.uri) == WarcRecords.parseAny(WarcRecords.build(pages)).get.map(_.uri))
    // a single member really is one standalone record: inflate just it
    val secondMember = {
      var idx = -1
      var count = 0
      var i = 1
      while (idx < 0 && i < gz.length - 1) {
        if ((gz(i) & 0xff) == 0x1f && (gz(i + 1) & 0xff) == 0x8b) {
          count += 1
          if (count == 1) idx = i // first member AFTER the warcinfo one
        }
        i += 1
      }
      java.util.Arrays.copyOfRange(gz, idx, gz.length)
    }
    assert(WarcRecords.parseGz(secondMember).get.nonEmpty)
    // corrupt gzip framing: None, not a throw
    val bad = gz.clone(); bad(10) = (bad(10) ^ 0x55).toByte
    WarcRecords.parseGz(bad) // totality
    assert(WarcRecords.parseGz("plain".getBytes(UTF_8)).isEmpty)
  }

  test(".warc.gz is all-or-nothing member-by-member: a torn LATER member reds the whole blob") {
    // GZIPInputStream treats a garbled mid-archive member header as
    // "trailing garbage" and silently ends the stream — which would
    // turn a torn .warc.gz into a PARTIAL ingest. The member walk must
    // refuse instead.
    val gz = WarcRecords.buildGz(Seq(1L -> "<body>one</body>", 2L -> "<body>two</body>"))
    // locate the second member's magic (first member after warcinfo)
    var idx = -1; var count = 0; var i = 1
    while (idx < 0 && i < gz.length - 1) {
      if ((gz(i) & 0xff) == 0x1f && (gz(i + 1) & 0xff) == 0x8b) {
        count += 1; if (count == 1) idx = i
      }
      i += 1
    }
    assert(idx > 0)
    val torn = gz.clone(); torn(idx) = 0x00 // garble member 2's magic
    assert(WarcRecords.parseGz(torn).isEmpty, "partial ingest slipped through")
    // truncated final trailer: also None
    assert(WarcRecords.parseGz(java.util.Arrays.copyOf(gz, gz.length - 3)).isEmpty)
    // trailing garbage after the last member: also None
    assert(WarcRecords.parseGz(gz ++ Array[Byte](1, 2, 3)).isEmpty)
    // corrupted CRC in the final trailer: also None
    val badCrc = gz.clone(); badCrc(gz.length - 8) = (badCrc(gz.length - 8) ^ 0x1).toByte
    assert(WarcRecords.parseGz(badCrc).isEmpty)
    // and the untouched blob still parses to all three records' pages
    assert(WarcRecords.parseGz(gz).get.length == 2)
  }

  test("st_warc_extract: the drop-dir stream lands on the batch rows exactly") {
    val s = SparkSpec.session
    val streamed = SparkEntry.queries("st_warc_extract")(s, "/root/testdata/sf0.001")
      .collect().map(_.toString).sorted.toSeq
    val batch = SparkEntry.queries("p_warc_extract")(s, "/root/testdata/sf0.001")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("p_warc_extract registry entry: the full chain lands on every page") {
    val s = SparkSpec.session
    val out = SparkEntry.queries("p_warc_extract")(s, "/root/testdata/sf0.001").collect()
    assert(out.length == 500)
    assert(out.forall(_.getInt(2) == 200))
    assert(out.forall(r => r.getString(3) == s"Doc ${r.getLong(0)}"))
  }
}
