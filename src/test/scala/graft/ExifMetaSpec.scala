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

  test("a missing Orientation tag defaults to 1 (TIFF 6.0), not a refusal") {
    // real-world EXIF routinely omits Orientation; retag the fixture's
    // 0x0112 entry to an unknown id so the walk sees no orientation at
    // all — the parse must still succeed with the spec default.
    val app1 = ExifMeta.buildApp1(sample) // "II": tag bytes are LE
    var i = 0
    var patched = false
    while (i + 3 < app1.length && !patched) {
      if ((app1(i) & 0xff) == 0x12 && (app1(i + 1) & 0xff) == 0x01 &&
          (app1(i + 2) & 0xff) == 0x03 && (app1(i + 3) & 0xff) == 0x00) {
        app1(i) = 0xfe.toByte; app1(i + 1) = 0x00 // unknown tag -> skipped
        patched = true
      }
      i += 1
    }
    assert(patched, "fixture layout drifted: no II orientation entry found")
    val got = ExifMeta.parse(ExifMeta.spliceApp1(jpeg(), app1))
    assert(got.contains(sample.copy(orientation = 1)))
  }

  test("all 8 orientation transforms land every pixel where EXIF says") {
    // 2x3 single-channel raster: a b / c d / e f — hand-derived uprights
    val src = Array[Byte]('a', 'b', 'c', 'd', 'e', 'f')
    def run(o: Int) = ExifMeta.orient(src, 2, 3, 1, o).get
    def str(t: (Array[Byte], Int, Int)) = new String(t._1, "US-ASCII")
    assert(run(1) == ((src, 2, 3)))
    assert(str(run(2)) == "badcfe" && run(2)._2 == 2) // mirror H per row
    assert(str(run(3)) == "fedcba")                   // rotate 180
    assert(str(run(4)) == "efcdab")                   // mirror V
    assert(str(run(5)) == "acebdf" && run(5)._2 == 3 && run(5)._3 == 2) // transpose
    assert(str(run(6)) == "ecafdb" && run(6)._2 == 3) // rotate 90 CW
    assert(str(run(7)) == "fdbeca")                   // transverse
    assert(str(run(8)) == "bdface")                   // rotate 270 CW
    assert(ExifMeta.orient(src, 2, 3, 1, 0).isEmpty)
    assert(ExifMeta.orient(src, 2, 3, 1, 9).isEmpty)
    assert(ExifMeta.orient(src, 2, 2, 1, 3).isEmpty) // wrong dims
  }

  test("each orientation composed with its inverse is the identity") {
    val src = Array.tabulate[Byte](5 * 7 * 3)(i => (i * 31 + 7).toByte)
    val inverse = Map(1 -> 1, 2 -> 2, 3 -> 3, 4 -> 4, 5 -> 5, 6 -> 8, 7 -> 7, 8 -> 6)
    for ((o, inv) <- inverse) {
      val (mid, mw, mh) = ExifMeta.orient(src, 5, 7, 3, o).get
      val (back, bw, bh) = ExifMeta.orient(mid, mw, mh, 3, inv).get
      assert(bw == 5 && bh == 7)
      assert(java.util.Arrays.equals(back, src), s"o=$o")
    }
  }

  test("m_oriented_thumb registry entry: upright on every payload") {
    val s = SparkSpec.session
    val out = SparkEntry.queries("m_oriented_thumb")(s, "/root/testdata/sf0.001").collect()
    assert(out.length == 500)
    assert(out.forall(_.getInt(1) >= 1), "some payload hit the sentinel row")
    // dims swap exactly for the transposed family (5-8)
    out.foreach { r =>
      val d = r.getLong(0)
      val (w, h) = ((d % 16 + 9).toInt, (d % 12 + 9).toInt)
      if (r.getInt(1) >= 5) assert(r.getInt(2) == h && r.getInt(3) == w)
      else assert(r.getInt(2) == w && r.getInt(3) == h)
    }
  }

  test("st_exif_meta: the drop-dir stream lands on the batch rows exactly") {
    val s = SparkSpec.session
    val streamed = SparkEntry.queries("st_exif_meta")(s, "/root/testdata/sf0.001")
      .collect().map(_.toString).sorted.toSeq
    val batch = SparkEntry.queries("m_exif_meta")(s, "/root/testdata/sf0.001")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
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
