package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import graft.functions.JpegPixels
import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG decode against an independent implementation: the
  * JDK's ImageIO writer produces the fixtures (real libjpeg-style
  * baseline streams, 4:2:0 at default quality) and its reader is the
  * reference decode. Our IDCT and the JDK's differ in rounding, so
  * per-channel MEANS are compared within a small tolerance; dimensions
  * are exact.
  */
class JpegPixelsSpec extends AnyFunSuite {
  System.setProperty("java.awt.headless", "true")

  private def pattern(w: Int, h: Int, seed: Int, gray: Boolean): BufferedImage = {
    val img = new BufferedImage(w, h,
      if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 7 + seed) % 256
      val g = (y * 11 + seed * 3) % 256
      val b = (x + y + seed * 5) % 256
      img.setRGB(x, y, if (gray) (r << 16) | (r << 8) | r else (r << 16) | (g << 8) | b)
    }
    img
  }

  private def encode(img: BufferedImage, quality: Float): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), param)
    ios.flush(); writer.dispose()
    bos.toByteArray
  }

  /** Reference means from the JDK decode. Raw raster samples, NOT
    * getRGB: on TYPE_BYTE_GRAY getRGB converts linear gray → sRGB
    * (gamma), which is a color-management choice layered on top of the
    * JPEG samples — both decoders' raw samples are the comparable unit.
    */
  private def refMeans(b: Array[Byte]): (Int, Int, Double, Double, Double) = {
    val img = ImageIO.read(new ByteArrayInputStream(b))
    val raster = img.getRaster
    val ch = raster.getNumBands
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      if (ch == 1) {
        val v = raster.getSample(x, y, 0)
        sr += v; sg += v; sb += v
      } else {
        sr += raster.getSample(x, y, 0)
        sg += raster.getSample(x, y, 1)
        sb += raster.getSample(x, y, 2)
      }
    }
    val n = img.getWidth.toLong * img.getHeight
    (img.getWidth, img.getHeight, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  private def check(w: Int, h: Int, seed: Int, quality: Float, gray: Boolean,
                    tol: Double = 1.0): Unit = {
    val bytes = encode(pattern(w, h, seed, gray), quality)
    val got = JpegPixels.decode(bytes)
    assert(got.isDefined, s"decode failed for ${w}x$h q=$quality gray=$gray")
    val (gw, gh, gr, gg, gb) = got.get
    val (rw, rh, rr, rg, rb) = refMeans(bytes)
    assert(gw == rw && gh == rh)
    assert(math.abs(gr - rr) <= tol, s"R mean $gr vs $rr (${w}x$h q=$quality)")
    assert(math.abs(gg - rg) <= tol, s"G mean $gg vs $rg (${w}x$h q=$quality)")
    assert(math.abs(gb - rb) <= tol, s"B mean $gb vs $rb (${w}x$h q=$quality)")
  }

  test("RGB 4:2:0 across qualities matches the JDK decoder's means") {
    for (q <- Seq(0.5f, 0.75f, 0.9f, 1.0f)) check(64, 48, 3, q, gray = false)
  }

  test("odd (non-MCU-aligned) dimensions decode exactly as the JDK does") {
    check(17, 13, 7, 0.8f, gray = false)
    check(33, 31, 1, 0.8f, gray = false)
    check(8, 8, 9, 0.8f, gray = false)
    check(7, 5, 2, 0.8f, gray = false)
  }

  test("grayscale single-component decodes") {
    check(40, 25, 4, 0.8f, gray = true)
    check(64, 64, 8, 0.95f, gray = true)
  }

  test("larger image with high-frequency content") {
    check(200, 150, 6, 0.7f, gray = false)
  }

  test("raster-level agreement: every pixel within IDCT rounding slack") {
    // smooth gradient, no sawtooth wraps: a hard discontinuity makes
    // the 4:2:0 chroma-phase difference (our nearest upsample vs the
    // JDK's filtered one) legitimately large at the wrap columns
    val img = new BufferedImage(48, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 48)
      img.setRGB(x, y, ((x * 255 / 47) << 16) | ((y * 255 / 31) << 8) | ((x + y) * 255 / 78))
    val bytes = encode(img, 0.85f)
    val (w, h, ch, raster) = JpegPixels.decodeRaster(bytes).get
    assert(ch == 3)
    val ref = ImageIO.read(new ByteArrayInputStream(bytes))
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      worst = math.max(worst, math.abs(((rgb >> 16) & 0xff) - (raster(o) & 0xff)))
      worst = math.max(worst, math.abs(((rgb >> 8) & 0xff) - (raster(o + 1) & 0xff)))
      worst = math.max(worst, math.abs((rgb & 0xff) - (raster(o + 2) & 0xff)))
    }
    // different-but-conformant IDCTs: T.81 §A.3.3 accuracy class is
    // ±1 per sample; the chroma upsampler matches libjpeg's triangle
    // filter, so only IDCT rounding (±1 in Y and chroma, amplified
    // ≤2× through the color transform) remains
    assert(worst <= 3, s"worst per-pixel delta $worst")
  }

  test("m_jpeg_pixels: every payload decodes and agrees with the JDK decoder") {
    val rows = SparkSpec.session // shared session; this suite is otherwise sparkless
    val out = SparkEntry.queries("m_jpeg_pixels")(rows, "/root/testdata/sf0.001").collect()
    assert(out.length == 500)
    assert(out.forall(_.getBoolean(6)), "some pixels_ok=false")
    // decoded dimensions vary with doc_id (lcm(16,12) = 48 distinct
    // combos) — the decode is not a constant
    assert(out.map(r => (r.getInt(1), r.getInt(2))).distinct.length == 48)
  }

  test("m_jpeg_thumbnail: sampled grids agree with the JDK on every payload") {
    val s = SparkSpec.session
    val out = SparkEntry.queries("m_jpeg_thumbnail")(s, "/root/testdata/sf0.001").collect()
    assert(out.length == 500)
    assert(out.forall(_.getBoolean(7)), "some thumb_ok=false")
    // FNV varies across images — the sampler reads real positions
    assert(out.map(_.getLong(6)).distinct.length > 400)
  }

  private def encodeProgressive(img: BufferedImage, quality: Float): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), param)
    ios.flush(); writer.dispose()
    bos.toByteArray
  }

  test("progressive RGB matches the JDK decoder's means across qualities") {
    for (q <- Seq(0.5f, 0.75f, 0.9f)) {
      val bytes = encodeProgressive(pattern(64, 48, 3, gray = false), q)
      // the fixture really is multi-scan progressive
      assert(bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2))
      val got = JpegPixels.decode(bytes)
      assert(got.isDefined, s"progressive decode failed at q=$q")
      val (gw, gh, gr, gg, gb) = got.get
      val (rw, rh, rr, rg, rb) = refMeans(bytes)
      assert(gw == rw && gh == rh)
      assert(math.abs(gr - rr) <= 1.0, s"R mean $gr vs $rr (q=$q)")
      assert(math.abs(gg - rg) <= 1.0, s"G mean $gg vs $rg (q=$q)")
      assert(math.abs(gb - rb) <= 1.0, s"B mean $gb vs $rb (q=$q)")
    }
  }

  test("progressive odd dimensions and grayscale match the JDK means") {
    for ((w, h, gray) <- Seq((17, 13, false), (33, 31, false), (40, 25, true), (64, 64, true))) {
      val bytes = encodeProgressive(pattern(w, h, 5, gray), 0.8f)
      val got = JpegPixels.decode(bytes)
      assert(got.isDefined, s"progressive decode failed ${w}x$h gray=$gray")
      val (gw, gh, gr, gg, gb) = got.get
      val (rw, rh, rr, rg, rb) = refMeans(bytes)
      assert(gw == rw && gh == rh)
      assert(math.abs(gr - rr) <= 1.0 && math.abs(gg - rg) <= 1.0 && math.abs(gb - rb) <= 1.0,
        s"means ($gr,$gg,$gb) vs ($rr,$rg,$rb) ${w}x$h gray=$gray")
    }
  }

  test("progressive raster-level agreement within IDCT rounding slack") {
    val img = new BufferedImage(48, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 48)
      img.setRGB(x, y, ((x * 255 / 47) << 16) | ((y * 255 / 31) << 8) | ((x + y) * 255 / 78))
    val bytes = encodeProgressive(img, 0.85f)
    val (w, h, ch, raster) = JpegPixels.decodeRaster(bytes).get
    assert(ch == 3)
    val ref = ImageIO.read(new ByteArrayInputStream(bytes))
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      worst = math.max(worst, math.abs(((rgb >> 16) & 0xff) - (raster(o) & 0xff)))
      worst = math.max(worst, math.abs(((rgb >> 8) & 0xff) - (raster(o + 1) & 0xff)))
      worst = math.max(worst, math.abs((rgb & 0xff) - (raster(o + 2) & 0xff)))
    }
    assert(worst <= 3, s"worst per-pixel delta $worst")
  }

  test("truncated progressive streams return None, never throw") {
    val bytes = encodeProgressive(pattern(48, 48, 2, gray = false), 0.8f)
    // cut at several depths: inside the header, inside early scans,
    // and just before EOI — totality at every prefix length
    for (cut <- Seq(bytes.length / 8, bytes.length / 3, bytes.length / 2, bytes.length - 2))
      assert(JpegPixels.decode(java.util.Arrays.copyOf(bytes, cut)).isEmpty, s"cut=$cut")
  }

  /** Offset of the SOF0 segment payload (first byte after the length). */
  private def sofSeg(b: Array[Byte]): Int = {
    var pos = 2
    while (true) {
      val marker = b(pos + 1) & 0xff
      if (marker == 0xc0) return pos + 4
      pos += 2 + (((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff))
    }
    -1
  }

  test("65535x65535 SOF dims are refused, not wrapped through 32-bit math") {
    // width*height = 65535² overflows Int to -131071; the 64-bit guard
    // must reject before any plane allocation can throw
    val b = encode(pattern(32, 32, 3, gray = false), 0.8f)
    val seg = sofSeg(b)
    b(seg + 1) = 0xff.toByte; b(seg + 2) = 0xff.toByte // height = 65535
    b(seg + 3) = 0xff.toByte; b(seg + 4) = 0xff.toByte // width  = 65535
    assert(JpegPixels.decode(b).isEmpty)
  }

  test("gray scan ignores declared sampling factors (T.81 non-interleaved)") {
    // A 1-component scan's entropy data is identical no matter what h/v
    // the SOF declares, so patching 1x1 → 2x2 must decode to the SAME
    // raster, not a block-scrambled one. 64x64 (multiple of 16) is the
    // case where the scrambled decode would 'succeed' silently.
    val b = encode(pattern(64, 64, 8, gray = true), 0.9f)
    val ref = JpegPixels.decodeRaster(b).get
    val seg = sofSeg(b)
    assert((b(seg + 6 + 1) & 0xff) == 0x11, "JDK gray fixture is not 1x1")
    val patched = b.clone()
    patched(seg + 6 + 1) = 0x22.toByte // declare h=2, v=2
    val got = JpegPixels.decodeRaster(patched)
    assert(got.isDefined)
    assert(got.get._1 == ref._1 && got.get._2 == ref._2 && got.get._3 == ref._3)
    assert(java.util.Arrays.equals(got.get._4, ref._4),
      "declared-factor gray decode diverged from the 1x1 raster")
  }

  test("non-integer chroma upsample ratios are refused, not truncated") {
    // Patch a 4:2:0 stream so Y declares h=4,v=1 and Cb h=3,v=1:
    // hMax=4, 4 % 3 != 0 — the old integer division would treat Cb as
    // full-res and silently mis-color; the guard must return None
    val b = encode(pattern(64, 48, 3, gray = false), 0.8f)
    val seg = sofSeg(b)
    assert((b(seg + 5) & 0xff) == 3)
    b(seg + 6 + 1) = 0x41.toByte     // Y: h=4, v=1
    b(seg + 6 + 3 + 1) = 0x31.toByte // Cb: h=3, v=1
    assert(JpegPixels.decode(b).isEmpty)
  }

  test("broken inputs return None, never a wrong answer") {
    assert(JpegPixels.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(JpegPixels.decode(Array.fill[Byte](100)(0x55)).isEmpty)
    val ok = encode(pattern(32, 32, 1, gray = false), 0.8f)
    assert(JpegPixels.decode(ok.take(20)).isEmpty)    // truncated pre-scan
    val noSoi = ok.clone(); noSoi(1) = 0x00
    assert(JpegPixels.decode(noSoi).isEmpty)
  }
}
