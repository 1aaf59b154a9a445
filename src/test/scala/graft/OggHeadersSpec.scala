package graft

import graft.functions.OggHeaders
import org.scalatest.funsuite.AnyFunSuite

/** Ogg/Vorbis header walk: the page CRC pinned against an independent
  * bit-by-bit implementation, a hand-assembled identification page
  * parsed field-for-field, cross-page packet continuation, CRC and
  * structural refusals, and totality under truncation and flips.
  */
class OggHeadersSpec extends AnyFunSuite {

  /** Independent CRC: bit-at-a-time long division with the RFC 3533
    * polynomial, no table — the main implementation is table-driven.
    */
  private def crcBitwise(bytes: Array[Byte], crcAt: Int): Int = {
    var crc = 0
    for (i <- bytes.indices) {
      val v = if (i >= crcAt && i < crcAt + 4) 0 else bytes(i) & 0xff
      crc ^= v << 24
      for (_ <- 0 until 8)
        crc = if ((crc & 0x80000000) != 0) (crc << 1) ^ 0x04c11db7 else crc << 1
    }
    crc
  }

  private def u32leAt(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  test("page CRC matches an independent bit-by-bit computation on every synthetic page") {
    val b = OggHeaders.synthetic(77L, 2, 44100, 128000, "graft", nAudioPages = 3)
    // walk page boundaries by the lacing tables and re-derive each CRC
    var pos = 0
    var pages = 0
    while (pos < b.length) {
      val nSegs = b(pos + 26) & 0xff
      val payload = (0 until nSegs).map(s => b(pos + 27 + s) & 0xff).sum
      val page = java.util.Arrays.copyOfRange(b, pos, pos + 27 + nSegs + payload)
      assert(u32leAt(page, 22).toInt == crcBitwise(page, 22), s"page $pages CRC")
      pos += page.length
      pages += 1
    }
    assert(pages == 5)
  }

  test("parses the synthetic chain field-for-field across the parameter sweep") {
    for (d <- 0L until 40L) {
      val b = OggHeaders.synthetic(d, (d % 8).toInt + 1,
        Seq(8000, 22050, 44100, 48000)((d % 4).toInt),
        ((d % 32).toInt + 1) * 16000, s"graft${d % 7}", (d % 6).toInt)
      val o = OggHeaders.parse(b).get
      assert(o.serial == d && o.nPages == (d % 6).toInt + 2)
      assert(o.channels == (d % 8).toInt + 1)
      assert(o.sampleRate == Seq(8000, 22050, 44100, 48000)((d % 4).toInt))
      assert(o.nominalBitrate == ((d % 32).toInt + 1) * 16000)
      assert(o.lastGranule == (d % 6) * 1024L)
      assert(o.vendor == s"graft${d % 7}")
    }
  }

  test("a packet spanning two pages reassembles through 255-lacing and the continued flag") {
    // hand-build: BOS ident page, then a comment header whose vendor
    // pushes the packet over one 255-byte segment *and* across a page
    // boundary — page A ends with lace 255 (packet open), page B sets
    // the continued flag
    val ident = OggHeaders.synthetic(5L, 2, 48000, 96000, "", 0)
    // take just the first page (ident, BOS) from the synthetic chain
    val nSegs0 = ident(26) & 0xff
    val page0len = 27 + nSegs0 + (0 until nSegs0).map(s => ident(27 + s) & 0xff).sum
    val page0 = java.util.Arrays.copyOf(ident, page0len)
    val vendor = "v" * 400
    val comment = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(3); o.write("vorbis".getBytes("US-ASCII"), 0, 6)
      val vb = vendor.getBytes("UTF-8")
      def w32(v: Int): Unit = { o.write(v & 0xff); o.write((v >>> 8) & 0xff)
        o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff) }
      w32(vb.length); o.write(vb, 0, vb.length); w32(0); o.write(1)
      o.toByteArray
    }
    def rawPage(payload: Array[Byte], laces: Seq[Int], flags: Int, seq: Int): Array[Byte] = {
      val hdr = new Array[Byte](27 + laces.length)
      hdr(0) = 'O'; hdr(1) = 'g'; hdr(2) = 'g'; hdr(3) = 'S'
      hdr(5) = flags.toByte
      hdr(14) = 5 // serial 5 LE
      hdr(18) = seq.toByte
      hdr(26) = laces.length.toByte
      laces.zipWithIndex.foreach { case (l, i) => hdr(27 + i) = l.toByte }
      val whole = hdr ++ payload
      val crc = crcBitwise(whole, 22)
      for (i <- 0 until 4) whole(22 + i) = ((crc >>> (8 * i)) & 0xff).toByte
      whole
    }
    // comment packet is 416 bytes (1+6+4+400+4+1): page A carries 255
    // (lace 255, packet open), page B the remaining 161 (lace 161,
    // closes it) with CONTINUED|EOS
    assert(comment.length == 416)
    val pageA = rawPage(comment.take(255), Seq(255), flags = 0x00, seq = 1)
    val pageB = rawPage(comment.drop(255), Seq(161), flags = 0x01 | 0x04, seq = 2)
    val o = OggHeaders.parse(page0 ++ pageA ++ pageB).get
    assert(o.vendor == vendor && o.nPages == 3)
    // and WITHOUT the continued flag the same bytes must refuse
    val pageBNoCont = rawPage(comment.drop(255), Seq(161), flags = 0x04, seq = 2)
    assert(OggHeaders.parse(page0 ++ pageA ++ pageBNoCont).isEmpty)
  }

  test("refuses corrupted CRC, bad magic, wrong version, serial change, missing EOS") {
    val b = OggHeaders.synthetic(9L, 1, 22050, 64000, "v", 2)
    val flip = b.clone(); flip(b.length - 1) = (flip(b.length - 1) ^ 0x01).toByte
    assert(OggHeaders.parse(flip).isEmpty, "payload flip must break the page CRC")
    val mag = b.clone(); mag(0) = 'X'
    assert(OggHeaders.parse(mag).isEmpty)
    val ver = b.clone(); ver(4) = 1
    assert(OggHeaders.parse(ver).isEmpty)
    // second page serial byte changes mid-stream: find page 1 offset
    val nSegs0 = b(26) & 0xff
    val p1 = 27 + nSegs0 + (0 until nSegs0).map(s => b(27 + s) & 0xff).sum
    val ser = b.clone(); ser(p1 + 14) = (ser(p1 + 14) ^ 0x7f).toByte
    assert(OggHeaders.parse(ser).isEmpty, "mid-stream serial change (CRC re-broken anyway)")
    // truncating the EOS page off leaves an unterminated stream
    assert(OggHeaders.parse(java.util.Arrays.copyOf(b, p1)).isEmpty)
  }

  test("BOS must be set on page 0 and only there (RFC 3533 §6)") {
    val b = OggHeaders.synthetic(9L, 1, 22050, 64000, "v", 2)
    // page offsets + a flag rewrite with the CRC recomputed, so the
    // refusal is attributable to the BOS rule, not a checksum break
    def pageLen(at: Int): Int = {
      val n = b(at + 26) & 0xff
      27 + n + (0 until n).map(s => b(at + 27 + s) & 0xff).sum
    }
    def withFlags(at: Int, flags: Int): Array[Byte] = {
      val m = b.clone()
      m(at + 5) = flags.toByte
      var c = OggHeaders.pageCrc(m, at, pageLen(at), at + 22)
      for (i <- 0 until 4) { m(at + 22 + i) = (c & 0xff).toByte; c >>>= 8 }
      m
    }
    assert(OggHeaders.parse(b).nonEmpty)
    assert(OggHeaders.parse(withFlags(0, 0x00)).isEmpty, "first page without BOS")
    assert(OggHeaders.parse(withFlags(pageLen(0), 0x02)).isEmpty, "spurious mid-stream BOS")
  }

  test("total under truncation and single-byte flips") {
    val b = OggHeaders.synthetic(3L, 6, 48000, 256000, "graft3", 4)
    for (n <- 0 until b.length)
      OggHeaders.parse(java.util.Arrays.copyOf(b, n)) // must not throw
    for (i <- b.indices) {
      val m = b.clone(); m(i) = (m(i) ^ 0xff).toByte
      OggHeaders.parse(m) // must not throw
    }
  }
}
