package graft

import graft.functions.ExifMeta
import graft.functions.ExifMeta.Exif
import org.scalatest.funsuite.AnyFunSuite

/** EXIF APP1/TIFF parsing: round-trips through the fixture builder in
  * BOTH byte orders, plus hand-checks of the binary layout (so the
  * builder and parser can't share a compensating bug), absence, and
  * totality on malformed input.
  */
class ExifMetaSpec extends AnyFunSuite {

  private def jpeg(): Array[Byte] =
    graft.functions.JpegPixels.syntheticJpeg(16, 12, 7)

  private val sample = Exif("II", "Kodak", "DC210", 6,
    "2024:03:09 14:30:00", 400, 1, 30)

  test("round-trips little-endian (II)") {
    val got = ExifMeta.parse(ExifMeta.spliceApp1(jpeg(), ExifMeta.buildApp1(sample)))
    assert(got.contains(sample))
  }

  test("round-trips big-endian (MM)") {
    val e = sample.copy(byteOrder = "MM", orientation = 1, iso = 100)
    val got = ExifMeta.parse(ExifMeta.spliceApp1(jpeg(), ExifMeta.buildApp1(e)))
    assert(got.contains(e))
  }

  test("binary layout is real TIFF, not a private encoding") {
    // hand-verify the MM header bytes: APP1 marker, length, Exif magic,
    // byte order, the 42, and IFD0 at offset 8 — independent of parse()
    val app1 = ExifMeta.buildApp1(sample.copy(byteOrder = "MM"))
    assert((app1(0) & 0xff) == 0xff && (app1(1) & 0xff) == 0xe1)
    val len = ((app1(2) & 0xff) << 8) | (app1(3) & 0xff)
    assert(len == app1.length - 2)
    assert(new String(app1, 4, 4, "US-ASCII") == "Exif")
    assert(app1(8) == 0 && app1(9) == 0)
    val t = 10 // TIFF base
    assert(app1(t) == 'M' && app1(t + 1) == 'M')
    assert(((app1(t + 2) & 0xff) << 8 | (app1(t + 3) & 0xff)) == 42)
    assert((app1(t + 4) | app1(t + 5) | app1(t + 6)) == 0 && (app1(t + 7) & 0xff) == 8)
    // IFD0 carries 5 ascending-tag entries
    val n = ((app1(t + 8) & 0xff) << 8) | (app1(t + 9) & 0xff)
    assert(n == 5)
    val tags = (0 until n).map { i =>
      val e = t + 10 + 12 * i
      ((app1(e) & 0xff) << 8) | (app1(e + 1) & 0xff)
    }
    assert(tags == Seq(0x010f, 0x0110, 0x0112, 0x0132, 0x8769))
    assert(tags == tags.sorted)
  }

  test("a JPEG without APP1 yields None, and one with a non-Exif APP1 too") {
    assert(ExifMeta.parse(jpeg()).isEmpty)
    val xmp = Array[Byte](0xff.toByte, 0xe1.toByte, 0, 8, 'h', 't', 't', 'p', 0, 0)
    assert(ExifMeta.parse(ExifMeta.spliceApp1(jpeg(), xmp)).isEmpty)
  }

  test("truncation and corruption return None, never throw") {
    val full = ExifMeta.spliceApp1(jpeg(), ExifMeta.buildApp1(sample))
    for (cut <- Seq(1, 3, 8, 20, 40, full.length - jpeg().length))
      assert(ExifMeta.parse(java.util.Arrays.copyOf(full, cut)).isEmpty, s"cut=$cut")
    // flip every byte of the APP1 region one at a time: parse must stay
    // total (None or Some, never a throw)
    val app1End = 2 + (full.length - jpeg().length)
    for (i <- 2 until app1End) {
      val mut = full.clone()
      mut(i) = (mut(i) ^ 0xff).toByte
      ExifMeta.parse(mut) // must not throw
    }
  }

  test("orientation outside 1..8 is rejected as misparse protection") {
    val bad = ExifMeta.buildApp1(sample.copy(orientation = 9))
    assert(ExifMeta.parse(ExifMeta.spliceApp1(jpeg(), bad)).isEmpty)
  }

  test("m_exif_meta registry entry: all fields parse on every payload") {
    val s = SparkSpec.session
    val out = SparkEntry.queries("m_exif_meta")(s, "/root/testdata/sf0.001").collect()
    assert(out.length == 500)
    // none fell back to the sentinel row
    assert(out.forall(_.getString(1) != "none"))
    // both endiannesses and all 8 orientations are exercised
    assert(out.map(_.getString(1)).distinct.sorted.toSeq == Seq("II", "MM"))
    assert(out.map(_.getInt(4)).distinct.length == 8)
  }
}
