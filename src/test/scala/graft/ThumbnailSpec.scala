package graft

import graft.functions.ImageHeaders

/** The BMP thumbnail sampler against an independent recomputation on a
  * gradient image — solid colors can't catch a sampler that reads the
  * wrong positions; a gradient pins every sampled coordinate.
  */
class ThumbnailSpec extends SparkSpec {

  /** Complete 24bpp BMP whose pixel at storage position (x, y) is
    * (x*5 mod 256, y*7 mod 256, (x+y) mod 256) — built independently of
    * ImageHeaders.syntheticBmp.
    */
  private def gradientBmp(w: Int, h: Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val out = new Array[Byte](54 + rowBytes * h)
    def w16(i: Int, v: Int): Unit = { out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte }
    def w32(i: Int, v: Int): Unit = (0 until 4).foreach(j => out(i + j) = ((v >> (8 * j)) & 0xff).toByte)
    out(0) = 'B'; out(1) = 'M'
    w32(2, out.length); w32(10, 54); w32(14, 40)
    w32(18, w); w32(22, h); w16(26, 1); w16(28, 24); w32(30, 0)
    for (y <- 0 until h; x <- 0 until w) {
      val i = 54 + y * rowBytes + x * 3
      out(i) = ((x + y) % 256).toByte      // B
      out(i + 1) = (y * 7 % 256).toByte    // G
      out(i + 2) = (x * 5 % 256).toByte    // R
    }
    out
  }

  test("thumbnail samples exactly the nearest-neighbor grid positions") {
    val (w, h, tw, th) = (16, 12, 4, 3)
    val Some((gw, gh, mr, mg, mb, fnv)) =
      ImageHeaders.thumbnailBmp(gradientBmp(w, h), tw, th)
    assert((gw, gh) === ((tw, th)))

    // independent expectation straight from the gradient formula
    var (sr, sg, sb) = (0L, 0L, 0L)
    var expFnv = 0xcbf29ce484222325L
    def mix(v: Int): Unit = { expFnv ^= (v & 0xff); expFnv *= 0x100000001b3L }
    for (ty <- 0 until th; tx <- 0 until tw) {
      val sx = tx * w / tw
      val sy = ty * h / th
      val (pb, pg, pr) = ((sx + sy) % 256, sy * 7 % 256, sx * 5 % 256)
      sb += pb; sg += pg; sr += pr
      mix(pb); mix(pg); mix(pr)
    }
    val n = (tw * th).toDouble
    assert(fnv === expFnv)
    assert((mr, mg, mb) === ((sr / n, sg / n, sb / n)))
  }

  test("m_bmp_thumbnail cross-checks solid sources end to end") {
    val df = SparkEntry.queries("m_bmp_thumbnail")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(7)), "every solid thumbnail must match its declared color")
    // distinct fingerprints across distinct colors: the fnv carries
    // signal, not a constant
    assert(rows.map(_.getLong(6)).distinct.length > 1)
  }

  test("malformed or non-BMP payloads degrade to None, never throw") {
    assert(ImageHeaders.thumbnailBmp(Array[Byte](1, 2, 3), 4, 4).isEmpty)
    assert(ImageHeaders.thumbnailBmp(gradientBmp(4, 4), 0, 4).isEmpty)
    val truncated = gradientBmp(16, 12).take(60)
    assert(ImageHeaders.thumbnailBmp(truncated, 4, 4).isEmpty)
  }
}
