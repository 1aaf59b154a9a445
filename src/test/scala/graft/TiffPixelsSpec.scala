package graft

import graft.functions.TiffPixels
import org.scalatest.funsuite.AnyFunSuite

/** TIFF 6.0 baseline decode: a hand-assembled little-endian file parsed
  * field-for-field (bytes laid out from the spec by hand, NOT through
  * the synthetic writer — the independent check), the parameter sweep
  * over both byte orders and strip layouts, profile refusals, and
  * totality under truncation, flips, and crafted counts.
  */
class TiffPixelsSpec extends AnyFunSuite {

  /** 2×2 RGB, little-endian, ONE strip (so StripOffsets/ByteCounts are
    * INLINE LONGs per the 4-byte rule), BitsPerSample at offset.
    * Layout: header 8 | IFD 2 + 9*12 + 4 = 114 | bits 6 | pixels 12.
    */
  private val handBuilt: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    out.write('I'); out.write('I'); w16(42); w32(8)
    w16(9)
    def entry(tag: Int, tpe: Int, count: Int, pad2: Boolean)(v: => Unit): Unit = {
      w16(tag); w16(tpe); w32(count); v; if (pad2) w16(0)
    }
    entry(256, 3, 1, pad2 = true)(w16(2))   // ImageWidth 2
    entry(257, 3, 1, pad2 = true)(w16(2))   // ImageLength 2
    entry(258, 3, 3, pad2 = false)(w32(122)) // BitsPerSample -> offset
    entry(259, 3, 1, pad2 = true)(w16(1))   // Compression: none
    entry(262, 3, 1, pad2 = true)(w16(2))   // Photometric: RGB
    entry(273, 4, 1, pad2 = false)(w32(128)) // StripOffsets INLINE value
    entry(277, 3, 1, pad2 = true)(w16(3))   // SamplesPerPixel 3
    entry(278, 3, 1, pad2 = true)(w16(2))   // RowsPerStrip 2
    entry(279, 4, 1, pad2 = false)(w32(12)) // StripByteCounts INLINE value
    w32(0)                                   // no next IFD
    w16(8); w16(8); w16(8)                   // bits 8,8,8 at 122
    for (v <- Seq(10, 20, 30, 40, 50, 60, 70, 80, 90, 110, 120, 130)) out.write(v)
    out.toByteArray
  }

  test("parses a hand-assembled little-endian single-strip TIFF field-for-field") {
    val Some((w, h, mr, mg, mb)) = TiffPixels.decode(handBuilt): @unchecked
    assert(w == 2 && h == 2)
    assert(mr == 57.5 && mg == 67.5 && mb == 77.5)
  }

  test("synthetic round-trips across byte orders, strip layouts, and dims") {
    for (d <- 0 until 40) {
      val (w, h, seed) = (d % 16 + 4, d % 12 + 4, d % 997)
      val bytes = TiffPixels.syntheticTiff(w, h, seed, bigEndian = d % 2 == 1)
      val Some((dw, dh, mr, mg, mb)) = TiffPixels.decode(bytes): @unchecked
      val (er, eg, eb) = graft.functions.PngPixels.syntheticMeans(w, h, seed)
      assert(dw == w && dh == h, s"dims at d=$d")
      assert(mr == er && mg == eg && mb == eb, s"means at d=$d")
    }
  }

  test("big-endian header really is byte-swapped, not just accepted") {
    val be = TiffPixels.syntheticTiff(5, 4, 7, bigEndian = true)
    assert(be(0) == 'M' && be(1) == 'M' && (be(2) & 0xff) == 0 && (be(3) & 0xff) == 42)
    val le = TiffPixels.syntheticTiff(5, 4, 7, bigEndian = false)
    assert(le(0) == 'I' && le(1) == 'I' && (le(2) & 0xff) == 42 && (le(3) & 0xff) == 0)
    // same pixels either way
    assert(TiffPixels.decode(be) == TiffPixels.decode(le))
  }

  test("refuses everything outside the baseline-RGB profile") {
    val bad = handBuilt.clone(); bad(0) = 'X'
    assert(TiffPixels.decode(bad).isEmpty)
    val badMagic = handBuilt.clone(); badMagic(2) = 43
    assert(TiffPixels.decode(badMagic).isEmpty)
    // Compression = 5 (LZW): entry index 3 value field at 10+3*12+8 = 54
    val lzw = handBuilt.clone(); lzw(54) = 5
    assert(TiffPixels.decode(lzw).isEmpty)
    // Photometric = 1 (grayscale): entry index 4 value at 10+4*12+8 = 66
    val gray = handBuilt.clone(); gray(66) = 1
    assert(TiffPixels.decode(gray).isEmpty)
    // BitsPerSample 16,8,8 at offset 122
    val deep = handBuilt.clone(); deep(122) = 16
    assert(TiffPixels.decode(deep).isEmpty)
    // StripByteCounts disagreeing with rows*w*3: entry index 8 value at 10+8*12+8 = 114
    val shortStrip = handBuilt.clone(); shortStrip(114) = 11
    assert(TiffPixels.decode(shortStrip).isEmpty)
  }

  test("total under truncation and single-byte flips") {
    val b = TiffPixels.syntheticTiff(9, 7, 123, bigEndian = true)
    for (n <- 0 until b.length)
      TiffPixels.decode(java.util.Arrays.copyOf(b, n)) // must not throw
    for (i <- b.indices) {
      val m = b.clone(); m(i) = (m(i) ^ 0xff).toByte
      TiffPixels.decode(m) // None or a differing parse; never a throw
    }
  }

  test("thumbnail matches the formula-only gradient recomputation across the sweep") {
    for (d <- 0 until 20) {
      val (w, h, seed) = (d % 16 + 4, d % 12 + 4, d % 997)
      val b = TiffPixels.syntheticTiff(w, h, seed, bigEndian = d % 2 == 1)
      val Some((tw, th, mr, mg, mb, fnv)) = TiffPixels.thumbnail(b, 4, 4): @unchecked
      val (er, eg, eb, efnv) = graft.functions.PngPixels.syntheticThumb(w, h, seed, 4, 4)
      assert(tw == 4 && th == 4)
      assert(mr == er && mg == eg && mb == eb && fnv == efnv, s"d=$d")
    }
  }

  test("a crafted giant-dimension header refuses instead of allocating the raster") {
    // ImageWidth/ImageLength 65535x65535 declares a 12.9 GB raster: the
    // decoder must refuse BEFORE allocation (an OOM is a totality
    // violation too). Entry 0/1 value fields at 10+8 = 18 and 10+12+8 = 30.
    val giant = handBuilt.clone()
    giant(18) = 0xff.toByte; giant(19) = 0xff.toByte
    giant(30) = 0xff.toByte; giant(31) = 0xff.toByte
    assert(TiffPixels.decode(giant).isEmpty)
    assert(TiffPixels.thumbnail(giant, 4, 4).isEmpty)
  }

  test("crafted counts and offsets near the 32-bit edge cannot wrap the bounds checks") {
    // BitsPerSample count 0x40000001: count*size in Int would wrap to a
    // tiny positive number and pass a naive check
    val hugeCount = handBuilt.clone()
    // entry index 2 (tag 258) starts at 10+2*12 = 34; count field at +4, LE
    hugeCount(38) = 1; hugeCount(39) = 0; hugeCount(40) = 0; hugeCount(41) = 0x40
    assert(TiffPixels.decode(hugeCount).isEmpty)
    // strip offset 0xFFFFFFF0 with count 12: offset+count wraps in Int
    val farStrip = handBuilt.clone()
    // entry index 5 (tag 273) value field at 10+5*12+8 = 78, LE u32
    farStrip(78) = 0xf0.toByte; farStrip(79) = 0xff.toByte
    farStrip(80) = 0xff.toByte; farStrip(81) = 0xff.toByte
    assert(TiffPixels.decode(farStrip).isEmpty)
  }
}
