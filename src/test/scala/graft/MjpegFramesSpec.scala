package graft

import graft.functions.{AviFrames, JpegPixels}
import org.scalatest.funsuite.AnyFunSuite

/** Motion-JPEG AVI decode (AviFrames.decodeMjpeg): compressed video
  * frame sampling built by composing the RIFF container walk with the
  * baseline-JPEG decoder, codec-gated on the MJPG fourcc — refuse,
  * never misdecode, for any other compressed codec.
  */
class MjpegFramesSpec extends AnyFunSuite {

  private def patch(b: Array[Byte], from: String, to: String): Array[Byte] = {
    // replace EVERY occurrence of a fourcc (strh and strf both carry it)
    val out = b.clone()
    var i = 0
    while (i + 4 <= out.length) {
      if ((0 until 4).forall(j => (out(i + j) & 0xff) == from.charAt(j))) {
        (0 until 4).foreach(j => out(i + j) = to.charAt(j).toByte)
        i += 4
      } else i += 1
    }
    out
  }

  test("decode: dims, frame count, every-2nd sampling, JDK parity") {
    val avi = AviFrames.syntheticMjpeg(16, 12, 5, 7)
    val Some((w, h, nf, ns, mr, mg, mb, ok)) = AviFrames.decodeMjpeg(avi, 2)
    assert((w, h, nf, ns) == (16, 12, 5, 3)) // frames 0,2,4
    assert(ok) // every sampled frame agreed with the JDK decoder
    assert(mr >= 0 && mr <= 255 && mg >= 0 && mg <= 255 && mb >= 0 && mb <= 255)
  }

  test("sampled means are the pixel-weighted average of per-frame JPEG decodes") {
    val avi = AviFrames.syntheticMjpeg(10, 10, 4, 3)
    val Some((_, _, _, _, mr, mg, mb, _)) = AviFrames.decodeMjpeg(avi, 2)
    // frames 0 and 2, decoded independently through the same JPEG path
    val frames = Seq(0, 2).map(f =>
      JpegPixels.decode(JpegPixels.syntheticJpeg(10, 10, 3 + f, 0.6f + ((3 + f) % 5) * 0.08f)).get)
    val n = frames.size
    assert(math.abs(mr - frames.map(_._3).sum / n) < 1e-9)
    assert(math.abs(mg - frames.map(_._4).sum / n) < 1e-9)
    assert(math.abs(mb - frames.map(_._5).sum / n) < 1e-9)
  }

  test("frameStep=1 decodes every frame; step larger than count samples frame 0") {
    val avi = AviFrames.syntheticMjpeg(9, 9, 3, 11)
    assert(AviFrames.decodeMjpeg(avi, 1).get._4 == 3)
    assert(AviFrames.decodeMjpeg(avi, 10).get._4 == 1)
  }

  test("refuse, never misdecode: non-MJPG codec on 00dc chunks") {
    val avi = AviFrames.syntheticMjpeg(12, 10, 2, 5)
    assert(AviFrames.decodeMjpeg(patch(avi, "MJPG", "XVID")) == None)
  }

  test("strf biCompression alone is enough to declare the codec") {
    val avi = AviFrames.syntheticMjpeg(12, 10, 2, 5)
    // blank only the strh handler: first MJPG occurrence follows 'vids'
    val idx = {
      def find(b: Array[Byte], s: String, from: Int): Int =
        (from until b.length - 3).find(i => (0 until 4).forall(j => (b(i + j) & 0xff) == s.charAt(j))).getOrElse(-1)
      find(avi, "MJPG", 0)
    }
    val patched = avi.clone()
    "NONE".zipWithIndex.foreach { case (c, j) => patched(idx + j) = c.toByte }
    assert(AviFrames.decodeMjpeg(patched).nonEmpty) // strf still says MJPG
  }

  test("totality: truncation, lying sizes, garbage frames all refuse") {
    val avi = AviFrames.syntheticMjpeg(10, 8, 3, 2)
    assert(AviFrames.decodeMjpeg(avi.take(avi.length - 5)) == None)
    assert(AviFrames.decodeMjpeg(avi.take(30)) == None)
    assert(AviFrames.decodeMjpeg(Array[Byte]()) == None)
    // corrupt one frame's entropy segment into garbage: either the
    // JPEG decoder refuses (None) or survives with damaged output —
    // but a SOI marker byte smashed must refuse
    val soi = (0 until avi.length - 1).find(i =>
      (avi(i) & 0xff) == 0xff && (avi(i + 1) & 0xff) == 0xd8).get
    val bad = avi.clone(); bad(soi) = 0x00
    assert(AviFrames.decodeMjpeg(bad) == None)
  }

  test("mixed uncompressed 00db frames in a declared-MJPG stream refuse") {
    val mj = AviFrames.syntheticMjpeg(10, 8, 2, 2)
    // splice a 00db tag over the first 00dc (payload stays JPEG bytes —
    // a DIB-size mismatch the decoder must not try to interpret)
    val idx = (0 until mj.length - 3).find(i =>
      mj(i) == '0'.toByte && mj(i + 1) == '0'.toByte &&
        mj(i + 2) == 'd'.toByte && mj(i + 3) == 'c'.toByte).get
    val bad = mj.clone(); bad(idx + 3) = 'b'.toByte
    assert(AviFrames.decodeMjpeg(bad) == None)
  }

  test("uncompressed decode path is untouched: 00db AVI still refuses here, decodes there") {
    val plain = AviFrames.synthetic(8, 6, 4, 10, 20, 30)
    assert(AviFrames.decodeMjpeg(plain) == None) // no MJPG stream declared
    assert(AviFrames.decode(plain, 2).nonEmpty)
  }
}
