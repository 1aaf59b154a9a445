package graft

import graft.functions.WebpPixels
import org.scalatest.funsuite.AnyFunSuite

/** VP8L (lossless WebP) codec spec. No second WebP implementation
  * exists in the JDK or this container, so the fixtures are two-sided:
  * (a) HAND-BUILT bitstreams assembled bit-by-bit from the published
  * spec — independent of the encoder — pinning the literal path,
  * color-indexing, LZ77 backrefs (mapped and plain distances),
  * color-cache hits, and the code-length repeat/max-symbol machinery
  * to exact expected pixels; (b) encoder round-trips across all five
  * encoding variants (literals / subtract-green / all 14 predictor
  * modes / cross-color / meta-groups+cache) asserting bit-exact raster
  * recovery; (c) a totality sweep (truncations and bit flips never
  * throw) and the lossy-VP8 refusal boundary.
  */
class WebpPixelsSpec extends AnyFunSuite {

  /** Spec-side LSB-first bit packer — deliberately re-written here
    * (not shared with the encoder) so hand fixtures are independent.
    */
  private final class BW {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    private var cur = 0
    private var n = 0
    def b(v: Int, bits: Int): BW = {
      var i = 0
      while (i < bits) {
        cur |= ((v >> i) & 1) << n
        n += 1
        if (n == 8) { out += cur; cur = 0; n = 0 }
        i += 1
      }
      this
    }
    def bytes: Array[Byte] = {
      val all = if (n > 0) out :+ cur else out
      all.map(_.toByte).toArray
    }
  }

  private def riff(payload: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    def tag(t: String): Unit = t.foreach(c => o.write(c))
    def le32(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff); o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff) }
    val padded = payload.length + (payload.length & 1)
    tag("RIFF"); le32(4 + 8 + padded); tag("WEBP"); tag("VP8L"); le32(payload.length)
    o.write(payload, 0, payload.length)
    if ((payload.length & 1) == 1) o.write(0)
    o.toByteArray
  }

  /** Simple prefix code with one symbol (zero bits per use). */
  private def simple1(bw: BW, sym: Int): Unit =
    { bw.b(1, 1).b(0, 1); if (sym <= 1) bw.b(0, 1).b(sym, 1) else bw.b(1, 1).b(sym, 8) }

  /** Simple prefix code with two 8-bit symbols (canonical: the SMALLER
    * symbol VALUE gets code 0, regardless of emission order).
    */
  private def simple2(bw: BW, s0: Int, s1: Int): Unit =
    { bw.b(1, 1).b(1, 1).b(1, 1).b(s0, 8).b(s1, 8) }

  /** Normal-form green code with exactly two used symbols: literal 7
    * and `sym2` > 255 (a length symbol — simple codes cap symbols at
    * 255, so backref fixtures NEED the normal form). Deliberately
    * routes through the code-length machinery: repeat-zeros codes 17
    * and 18 and a max-symbol cap of 5 reads, so those decoder paths
    * are pinned by every backref fixture. Canonical: 7 → code 0,
    * sym2 → code 1.
    */
  private def normalGreen7And(bw: BW, sym2: Int): Unit = {
    require(sym2 > 157 && sym2 < 286) // zeros fit in one 138 + one ≤138 run
    bw.b(0, 1)    // not simple
    bw.b(0, 4)    // num_code_lengths = 4: ClOrder[0..3] = 17, 18, 0, 1
    bw.b(2, 3)    // len(cl 17) = 2
    bw.b(2, 3)    // len(cl 18) = 2
    bw.b(0, 3)    // len(cl 0)  = 0
    bw.b(1, 3)    // len(cl 1)  = 1  → canonical: 1→0, 17→10, 18→11
    bw.b(1, 1)    // use max-symbol cap
    bw.b(0, 3)    // length_nbits = 2
    bw.b(3, 2)    // max_symbol = 2 + 3 = 5 code-length reads
    // cl stream: 7 zeros, len-1 at symbol 7, zeros up to sym2, len-1
    bw.b(1, 1).b(0, 1)  // cl 17 (code 10 MSB-first)
    bw.b(4, 3)          //   repeat 3+4 = 7 zeros
    bw.b(0, 1)          // cl 1: symbol 7 gets length 1
    val zeros = sym2 - 8
    val first = 138
    bw.b(1, 1).b(1, 1)  // cl 18 (code 11)
    bw.b(first - 11, 7) //   repeat 138 zeros
    bw.b(1, 1).b(1, 1)  // cl 18
    bw.b(zeros - first - 11, 7) // the rest
    bw.b(0, 1)          // cl 1: sym2 gets length 1
  }

  private def vp8lHeader(bw: BW, w: Int, h: Int): Unit =
    bw.b(0x2f, 8).b(w - 1, 14).b(h - 1, 14).b(0, 1).b(0, 3)

  // A = (a255, r1, g7, b0), B = (a255, r2, g7, b0): one literal green +
  // two reds keeps every non-green code simple in the backref fixtures
  private val pixA = 0xff010700
  private val pixB = 0xff020700

  /** Emit row0 = A A A B (green code0 per pixel, red code0/code1). */
  private def emitRowAAAB(bw: BW): Unit = {
    bw.b(0, 1).b(0, 1) // A: green 7 → code 0, red 1 → code 0
    bw.b(0, 1).b(0, 1)
    bw.b(0, 1).b(0, 1)
    bw.b(0, 1).b(1, 1) // B: red 2 → code 1
  }

  test("hand-built 1x1 literal stream decodes to the exact pixel (pinned bytes)") {
    val bw = new BW
    vp8lHeader(bw, 1, 1)
    bw.b(0, 1).b(0, 1).b(0, 1) // no transforms, no cache, no meta
    simple1(bw, 20)  // green
    simple1(bw, 10)  // red
    simple1(bw, 30)  // blue
    simple1(bw, 255) // alpha
    simple1(bw, 0)   // distance
    val payload = bw.bytes
    // the same stream, hand-packed byte by byte from the spec — a
    // bit-packer bug above cannot hide behind itself
    assert(payload.toSeq == Seq(0x2f, 0x00, 0x00, 0x00, 0x00, 0x28, 0x45,
      0x15, 0xea, 0xd1, 0xff, 0x00).map(_.toByte))
    val Some((w, h, pix)) = WebpPixels.decodeRaster(riff(payload))
    assert(w == 1 && h == 1)
    assert(pix.toSeq == Seq(0xff0a141e))
  }

  test("hand-built color-indexing stream: 2-entry delta-coded palette, 8 packed pixels") {
    val pal0 = 0xffc86432 // a=255 r=200 g=100 b=50
    val pal1 = 0xffd25a3c // a=255 r=210 g=90  b=60
    val bw = new BW
    vp8lHeader(bw, 8, 1)
    bw.b(1, 1).b(3, 2) // transform: color indexing
    bw.b(1, 8)         // palette size - 1 = 1
    // palette image (2x1, level>0): pixel0 = pal0, pixel1 = the delta
    // (a+0, r+10, g-10=246, b+10)
    bw.b(0, 1) // no cache
    simple2(bw, 100, 246) // green: {100, 246}
    simple2(bw, 200, 10)  // red:   {200, 10}
    simple2(bw, 50, 10)   // blue:  {50, 10}
    simple2(bw, 255, 0)   // alpha: {255, 0}
    simple1(bw, 0)        // distance
    // pixel0 = pal0: green 100→0, red 200→1, blue 50→1, alpha 255→1
    bw.b(0, 1).b(1, 1).b(1, 1).b(1, 1)
    // pixel1 = delta: green 246→1, red 10→0, blue 10→0, alpha 0→0
    bw.b(1, 1).b(0, 1).b(0, 1).b(0, 1)
    bw.b(0, 1) // no more transforms
    // main image: packed width = 1 (8 px/byte at palette size 2)
    bw.b(0, 1).b(0, 1) // no cache, no meta
    simple1(bw, 170) // green byte 10101010 → indices 0,1,0,1,... LSB-first
    simple1(bw, 0); simple1(bw, 0); simple1(bw, 0); simple1(bw, 0)
    val Some((w, h, pix)) = WebpPixels.decodeRaster(riff(bw.bytes))
    assert(w == 8 && h == 1)
    assert(pix.toSeq == Seq(pal0, pal1, pal0, pal1, pal0, pal1, pal0, pal1))
  }

  test("hand-built LZ77 backref, mapped distance code 1 = (0,1): copies the row above") {
    val bw = new BW
    vp8lHeader(bw, 4, 2)
    bw.b(0, 1).b(0, 1).b(0, 1)
    normalGreen7And(bw, 259) // literal 7 + length symbol 259 (length 4)
    simple2(bw, 1, 2)        // red: {1, 2}
    simple1(bw, 0)           // blue
    simple1(bw, 255)         // alpha
    simple1(bw, 0)           // distance: dval 1 → map (0,1) → dist = w
    emitRowAAAB(bw)
    bw.b(1, 1)               // green code 1 = symbol 259 → length 4
    // distance code symbol: zero bits; no extra bits for dval 1
    val Some((w, h, pix)) = WebpPixels.decodeRaster(riff(bw.bytes))
    assert(w == 4 && h == 2)
    assert(pix.toSeq == Seq(pixA, pixA, pixA, pixB, pixA, pixA, pixA, pixB))
  }

  test("hand-built LZ77 backref, mapped distance code 2 = (1,0): a pixel run") {
    val bw = new BW
    vp8lHeader(bw, 4, 1)
    bw.b(0, 1).b(0, 1).b(0, 1)
    normalGreen7And(bw, 258) // literal 7 + length symbol 258 (length 3)
    simple1(bw, 1)           // red: only A
    simple1(bw, 0)           // blue
    simple1(bw, 255)         // alpha
    simple1(bw, 1)           // distance: dval 2 → map (1,0) → dist 1
    bw.b(0, 1)               // literal A (green code 0, red zero-bit)
    bw.b(1, 1)               // length symbol 258 → length 3, dist 1
    val Some((w, h, pix)) = WebpPixels.decodeRaster(riff(bw.bytes))
    assert(w == 4 && h == 1)
    assert(pix.toSeq == Seq(pixA, pixA, pixA, pixA))
  }

  test("hand-built LZ77 backref, plain distance (code > 120) with extra bits") {
    val bw = new BW
    vp8lHeader(bw, 4, 2)
    bw.b(0, 1).b(0, 1).b(0, 1)
    normalGreen7And(bw, 259)
    simple2(bw, 1, 2)
    simple1(bw, 0)
    simple1(bw, 255)
    simple1(bw, 13) // distance prefix 13: offset 96, 5 extra bits
    emitRowAAAB(bw)
    bw.b(1, 1)      // length 4
    bw.b(27, 5)     // dval = 96 + 27 + 1 = 124 → dist = 124 - 120 = 4
    val Some((w, h, pix)) = WebpPixels.decodeRaster(riff(bw.bytes))
    assert(w == 4 && h == 2)
    assert(pix.toSeq == Seq(pixA, pixA, pixA, pixB, pixA, pixA, pixA, pixB))
  }

  test("hand-built color-cache hit: second pixel served from the cache") {
    val cacheBits = 1
    val argbA = pixA
    val idx = (0x1e35a7bd * argbA) >>> (32 - cacheBits)
    val cacheSym = 256 + 24 + idx // green alphabet extends by cache size 2
    val bw = new BW
    vp8lHeader(bw, 2, 1)
    bw.b(0, 1)                  // no transforms
    bw.b(1, 1).b(cacheBits, 4)  // color cache, 2 entries
    bw.b(0, 1)                  // no meta
    normalGreen7And(bw, cacheSym)
    simple1(bw, 1)   // red
    simple1(bw, 0)   // blue
    simple1(bw, 255) // alpha
    simple1(bw, 0)   // distance
    bw.b(0, 1)       // literal A → inserted at cache(idx)
    bw.b(1, 1)       // cache reference → A again
    val Some((w, h, pix)) = WebpPixels.decodeRaster(riff(bw.bytes))
    assert(w == 2 && h == 1)
    assert(pix.toSeq == Seq(argbA, argbA))
  }

  test("encoder round-trip: all five variants recover the exact raster") {
    for {
      variant <- 0 until 5
      (w, h) <- Seq((1, 1), (1, 5), (5, 1), (4, 4), (19, 15), (16, 12))
    } {
      val seed = variant + 5 * 7 // any seed ≡ variant (mod 5)
      val bytes = WebpPixels.syntheticWebp(w, h, seed)
      val got = WebpPixels.decodeRaster(bytes)
      assert(got.isDefined, s"variant $variant ${w}x$h failed to decode")
      val Some((gw, gh, pix)) = got
      assert(gw == w && gh == h)
      val want = Array.tabulate(w * h) { pos =>
        val x = pos % w
        val y = pos / w
        0xff000000 | (((x * 3 + seed) % 256) << 16) |
          (((y * 5 + seed * 7) % 256) << 8) | ((x + y + seed * 13) % 256)
      }
      assert(pix.toSeq == want.toSeq, s"variant $variant ${w}x$h pixel mismatch")
    }
  }

  test("all 14 predictor modes survive round-trip (seed sweep over variant 2)") {
    // variant 2 assigns mode (bx+by+seed) % 14 per 4x4 block; a 19x15
    // image has 5x4 blocks, so the seed sweep covers every mode many
    // times over — decode failure or pixel drift pins the broken mode
    for (k <- 0 until 14) {
      val seed = 2 + 5 * k // ≡ 2 (mod 5)
      val bytes = WebpPixels.syntheticWebp(19, 15, seed)
      val Some((_, _, pix)) = WebpPixels.decodeRaster(bytes)
      val want = Array.tabulate(19 * 15) { pos =>
        val x = pos % 19
        val y = pos / 19
        0xff000000 | (((x * 3 + seed) % 256) << 16) |
          (((y * 5 + seed * 7) % 256) << 8) | ((x + y + seed * 13) % 256)
      }
      assert(pix.toSeq == want.toSeq, s"seed $seed")
    }
  }

  test("decode() means equal the closed-form gradient means") {
    for (seed <- 0 until 10) {
      val (w, h) = (seed % 16 + 4, seed % 12 + 4)
      val Some((gw, gh, mr, mg, mb)) =
        WebpPixels.decode(WebpPixels.syntheticWebp(w, h, seed))
      val (er, eg, eb) = WebpPixels.syntheticMeans(w, h, seed)
      assert(gw == w && gh == h)
      assert(mr == er && mg == eg && mb == eb, s"seed $seed")
    }
  }

  test("totality: every truncation of a valid stream returns None or decodes, never throws") {
    for (variant <- 0 until 5) {
      val bytes = WebpPixels.syntheticWebp(10, 8, variant)
      for (len <- 0 until bytes.length) {
        val t = java.util.Arrays.copyOf(bytes, len)
        WebpPixels.decode(t) // must not throw
      }
      // a truncated VP8L payload inside a size-consistent RIFF must be
      // detected (EOS reads), not silently decode zero-filled pixels
      val cut = java.util.Arrays.copyOf(bytes, bytes.length - 3)
      def le32(b: Array[Byte], i: Int, v: Int): Unit = {
        b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
        b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
      }
      le32(cut, 4, cut.length - 8)
      le32(cut, 16, cut.length - 20)
      assert(WebpPixels.decode(cut).isEmpty, s"variant $variant truncated payload")
    }
  }

  test("totality: single-bit flips never throw (decode to None or some raster)") {
    val bytes = WebpPixels.syntheticWebp(8, 6, 4)
    for (i <- bytes.indices; bit <- 0 until 8) {
      val m = bytes.clone()
      m(i) = (m(i) ^ (1 << bit)).toByte
      WebpPixels.decode(m) // must not throw
    }
  }

  test("lossy VP8 and non-WebP containers are refused, never misdecoded") {
    val o = new java.io.ByteArrayOutputStream()
    def tag(t: String): Unit = t.foreach(c => o.write(c))
    def le32(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff); o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff) }
    tag("RIFF"); le32(16); tag("WEBP"); tag("VP8 "); le32(4); o.write(Array[Byte](1, 2, 3, 4))
    assert(WebpPixels.decode(o.toByteArray).isEmpty)
    assert(WebpPixels.decode(Array.emptyByteArray).isEmpty)
    assert(WebpPixels.decode("RIFFxxxxWAVE".getBytes ++ new Array[Byte](32)).isEmpty)
    // VP8L signature byte corrupted
    val good = WebpPixels.syntheticWebp(4, 4, 0)
    good(20) = 0x2e
    assert(WebpPixels.decode(good).isEmpty)
  }
}
