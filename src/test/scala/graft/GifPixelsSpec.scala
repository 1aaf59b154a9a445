package graft

import graft.functions.GifPixels
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The second compressed-format image decode path: GIF LZW inflate +
  * palette mapping, checked per-pixel against the generator's index
  * formula, through the dictionary-building LZW path on a crafted
  * stream, end to end through the batched operator, and on malformed
  * payloads.
  */
class GifPixelsSpec extends SparkSpec {

  test("synthetic GIF decodes pixel-exact (clear/reset path, every pixel)") {
    val (w, h, seed) = (17, 11, 42)
    val bytes = GifPixels.syntheticGif(w, h, seed)
    val Some((dw, dh, raster)) = GifPixels.decodeRaster(bytes)
    assert((dw, dh) == (w, h))
    for (y <- 0 until h; x <- 0 until w) {
      val idx = (x * 7 + y * 13 + seed) % 64
      val p = (y * w + x) * 3
      assert((raster(p) & 0xff) == idx * 4 % 256, s"R at ($x,$y)")
      assert((raster(p + 1) & 0xff) == idx * 9 % 256, s"G at ($x,$y)")
      assert((raster(p + 2) & 0xff) == idx * 14 % 256, s"B at ($x,$y)")
    }
    val Some((_, _, mr, mg, mb)) = GifPixels.decode(bytes)
    assert((mr, mg, mb) == GifPixels.syntheticMeans(w, h, seed))
  }

  test("dictionary-building LZW streams decode (composite and KwKwK codes)") {
    // hand-build a 2×3 image over a 4-color table (minCode=2, clear=4,
    // end=5, first dict code=6) WITHOUT per-pixel clears:
    // codes: clear, 1, 1 (→ dict[6]=(1,1)), 6 (emits 1,1 → dict[7]=(1,1)... )
    // pixel stream: 1, 1, 1, 1, 0, 0  — codes: clear,1,6,1,0,0,end
    //   clear | 1 → [1]           prev=1
    //   6 (== dictSize, KwKwK): dict[6]=(1,1), emits 1,1   prev=6
    //   1 → [1], dict[7]=(6→first 1, appended 1)            prev=1
    //   0 → [0], dict[8]=(1,0)                              prev=0
    //   0 → [0], dict[9]=(0,0)                              prev=0
    val minCode = 2
    val width0 = 3
    val codes = Seq(4, 1, 6, 1, 0, 0, 5)
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var accBits = 0
    var widthNow = width0
    var dictSize = 6
    var prevSeen = false
    for (c <- codes) {
      acc |= c.toLong << accBits
      accBits += widthNow
      while (accBits >= 8) { bits.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8 }
      // mirror the decoder's width schedule exactly: the dictionary
      // grows only on the SECOND and later codes after a clear
      if (c == 4) { dictSize = 6; widthNow = width0; prevSeen = false }
      else if (c != 5) {
        if (prevSeen && dictSize < 4096) {
          dictSize += 1
          if (dictSize == (1 << widthNow) && widthNow < 12) widthNow += 1
        }
        prevSeen = true
      }
    }
    if (accBits > 0) bits.write((acc & 0xff).toInt)
    val payload = bits.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(2); out.write(0); out.write(3); out.write(0)
    out.write(0x80 | 1) // global table 4 entries
    out.write(0); out.write(0)
    for (i <- 0 until 4) { out.write(i * 10); out.write(i * 20); out.write(i * 30) }
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(2); out.write(0); out.write(3); out.write(0)
    out.write(0)
    out.write(minCode)
    out.write(payload.length)
    out.write(payload, 0, payload.length)
    out.write(0)
    out.write(0x3b)

    val Some((w, h, raster)) = GifPixels.decodeRaster(out.toByteArray)
    assert((w, h) == (2, 3))
    val indices = (0 until 6).map(i => (raster(3 * i) & 0xff) / 10)
    assert(indices == Seq(1, 1, 1, 1, 0, 0))
  }

  test("malformed payloads are rejected, never a wrong answer") {
    val good = GifPixels.syntheticGif(8, 6, 7)
    assert(GifPixels.decode("not a gif".getBytes("UTF-8")).isEmpty)
    assert(GifPixels.decode(Array.emptyByteArray).isEmpty)
    // truncated mid-LZW
    assert(GifPixels.decode(good.take(good.length - 20)).isEmpty)
    // header-only GIF (no image block) from the metadata generator
    assert(GifPixels.decode(
      graft.functions.ImageHeaders.syntheticHeader("gif", 8, 6)).isEmpty)
    // out-of-range palette index: corrupt a literal into a higher code
    // — decode must fail or differ, never silently agree
    val flipped = good.clone()
    flipped(good.length - 10) = (flipped(good.length - 10) ^ 0x3f).toByte
    assert(GifPixels.decode(flipped) != GifPixels.decode(good))
  }

  test("m_gif_pixels: every payload decodes and matches the formula means") {
    val rows = Multimodal.decodeGifPixels(Multimodal.gifTable(Tables(spark, sfDir)))
    assert(rows.count() == Tables(spark, sfDir).documents.count())
    assert(rows.filter(!col("pixels_ok")).count() == 0)
  }
}
