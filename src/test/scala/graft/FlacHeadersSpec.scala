package graft

import graft.functions.FlacHeaders
import org.scalatest.funsuite.AnyFunSuite

/** FLAC metadata walk: a hand-assembled STREAMINFO parsed field-for-
  * field (bytes written from the RFC 9639 layout by hand, NOT through
  * the synthetic writer — the independent check), the chain walk over
  * VORBIS_COMMENT/PADDING, structural refusals, and totality under
  * truncation and byte flips.
  */
class FlacHeadersSpec extends AnyFunSuite {

  /** 44100 Hz / 2ch / 16-bit / 1,000,000 samples, hand-packed:
    * SR(20)=0x0AC44, ch-1(3)=001, bits-1(5)=01111, ts(36)=0xF4240
    * → bytes 0A C4 42 F0 00 0F 42 40.
    */
  private val handBuilt: Array[Byte] = {
    val md5 = Array.tabulate[Byte](16)(_.toByte)
    (Array[Byte]('f', 'L', 'a', 'C',
      0x80.toByte, 0x00, 0x00, 0x22, // last | STREAMINFO, len 34
      0x10, 0x00, 0x10, 0x00, // min/max block 4096
      0x00, 0x00, 0x00, 0x00, 0x00, 0x00, // min/max frame unknown
      0x0A, 0xC4.toByte, 0x42, 0xF0.toByte, 0x00, 0x0F, 0x42, 0x40)
      ++ md5)
  }

  test("parses a hand-assembled STREAMINFO field-for-field") {
    val f = FlacHeaders.parse(handBuilt).get
    assert(f.minBlock == 4096 && f.maxBlock == 4096)
    assert(f.sampleRate == 44100 && f.channels == 2 && f.bits == 16)
    assert(f.totalSamples == 1000000L && f.nBlocks == 1 && f.vendor == "")
    assert(f.md5Hex == "000102030405060708090a0b0c0d0e0f")
  }

  test("walks the full metadata chain: vorbis vendor + padding counted") {
    val b = FlacHeaders.synthetic(576, 4096, 48000, 8, 24, (1L << 36) - 1,
      Array.fill[Byte](16)(0xAB.toByte), vendor = Some("graft3"), paddingBytes = 16)
    val f = FlacHeaders.parse(b).get
    assert(f.minBlock == 576 && f.sampleRate == 48000 && f.channels == 8 && f.bits == 24)
    assert(f.totalSamples == (1L << 36) - 1) // the 36-bit ceiling survives packing
    assert(f.nBlocks == 3 && f.vendor == "graft3")
    assert(f.md5Hex == "ab" * 16)
  }

  test("synthetic round-trips across the fixture parameter sweep") {
    for (d <- 0L until 40L) {
      val b = FlacHeaders.synthetic(
        Seq(576, 1024, 4096)((d % 3).toInt), 4096,
        Seq(8000, 22050, 44100, 48000)((d % 4).toInt),
        (d % 8).toInt + 1, Seq(8, 16, 24)((d % 3).toInt), d * 100 + 4096,
        Array.fill[Byte](16)((d % 251).toByte),
        vendor = if (d % 3 == 0) Some(s"graft${d % 7}") else None,
        paddingBytes = if (d % 5 == 0) 16 else 0)
      val f = FlacHeaders.parse(b).get
      assert(f.sampleRate == Seq(8000, 22050, 44100, 48000)((d % 4).toInt))
      assert(f.channels == (d % 8).toInt + 1 && f.totalSamples == d * 100 + 4096)
      assert(f.nBlocks == 1 + (if (d % 3 == 0) 1 else 0) + (if (d % 5 == 0) 1 else 0))
      assert(f.vendor == (if (d % 3 == 0) s"graft${d % 7}" else ""))
    }
  }

  test("refuses bad magic, wrong-first-block, and zero sample rate") {
    val bad = handBuilt.clone(); bad(0) = 'g'
    assert(FlacHeaders.parse(bad).isEmpty)
    val wrongType = handBuilt.clone(); wrongType(4) = 0x84.toByte // first = VORBIS
    assert(FlacHeaders.parse(wrongType).isEmpty)
    val sr0 = handBuilt.clone()
    sr0(18) = 0; sr0(19) = 0; sr0(20) = (sr0(20) & 0x0f).toByte // SR(20 bits) := 0
    assert(FlacHeaders.parse(sr0).isEmpty)
  }

  test("total under truncation and single-byte flips") {
    val b = FlacHeaders.synthetic(1024, 4096, 22050, 2, 16, 12345L,
      Array.fill[Byte](16)(7), vendor = Some("v"), paddingBytes = 4)
    for (n <- 0 until b.length)
      FlacHeaders.parse(java.util.Arrays.copyOf(b, n)) // must not throw
    for (i <- b.indices) {
      val m = b.clone(); m(i) = (m(i) ^ 0xff).toByte
      FlacHeaders.parse(m) // must not throw (None or a differing parse both fine)
    }
    // a block whose declared length overruns the buffer is refused, not read
    val overrun = b.clone()
    overrun(7) = 0xff.toByte // STREAMINFO len 34 -> 255 > remaining
    assert(FlacHeaders.parse(overrun).isEmpty)
  }

  test("crafted vendor length near Int.MaxValue cannot wrap the bounds check") {
    // VORBIS_COMMENT whose u32le vendor length is 0x7FFFFFF0: Int
    // arithmetic `body + 4 + vlen + 4` wraps negative and would slip
    // past an Int `<=` check into an out-of-bounds String read — the
    // walk must compare in Long and ignore the vendor, not throw.
    val out = new java.io.ByteArrayOutputStream()
    out.write(handBuilt, 0, handBuilt.length)
    val bytes = out.toByteArray
    bytes(4) = 0x00 // STREAMINFO no longer last
    out.reset(); out.write(bytes, 0, bytes.length)
    out.write(0x84); out.write(0); out.write(0); out.write(12) // last | VORBIS, len 12
    // u32le vlen = 0x7FFFFFF0, then 8 arbitrary body bytes
    out.write(0xF0); out.write(0xFF); out.write(0xFF); out.write(0x7F)
    out.write(new Array[Byte](8), 0, 8)
    val f = FlacHeaders.parse(out.toByteArray)
    assert(f.nonEmpty && f.get.vendor == "" && f.get.nBlocks == 2)
  }
}
