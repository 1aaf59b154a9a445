package graft

import graft.functions.Mp3Frames
import org.scalatest.funsuite.AnyFunSuite

/** MP3 frame walk: hand-computed frame lengths, padding and ID3
  * handling, profile refusals, and totality on malformed bytes.
  */
class Mp3FramesSpec extends AnyFunSuite {

  test("round-trips a plain CBR stream with hand-checked frame length") {
    // 128 kbps @ 44100: floor(144000*128/44100) = 417 bytes/frame
    val b = Mp3Frames.synthetic(frames = 7, brIdx = 9, srIdx = 0,
      padded = false, id3Bytes = 0)
    assert(b.length == 7 * 417)
    val m = Mp3Frames.parse(b).get
    assert(m.nFrames == 7 && m.sampleRate == 44100 && m.bitrateKbps == 128)
    assert(!m.vbr && !m.hasId3)
    assert(m.durationMs == 7L * 1152 * 1000 / 44100)
  }

  test("honors the padding bit — ignoring it would desync") {
    val b = Mp3Frames.synthetic(frames = 5, brIdx = 9, srIdx = 0,
      padded = true, id3Bytes = 0)
    assert(b.length == 5 * 418)
    assert(Mp3Frames.parse(b).get.nFrames == 5)
  }

  test("skips an ID3v2 prefix via its syncsafe length") {
    val b = Mp3Frames.synthetic(frames = 3, brIdx = 1, srIdx = 2,
      padded = false, id3Bytes = 200)
    val m = Mp3Frames.parse(b).get
    assert(m.hasId3 && m.nFrames == 3 && m.sampleRate == 32000 && m.bitrateKbps == 32)
  }

  test("flags VBR when frame bitrates differ") {
    val a = Mp3Frames.synthetic(2, 9, 0, padded = false, id3Bytes = 0)
    val c = Mp3Frames.synthetic(2, 11, 0, padded = false, id3Bytes = 0)
    val m = Mp3Frames.parse(a ++ c).get
    assert(m.vbr && m.nFrames == 4 && m.bitrateKbps == 128) // first frame's
  }

  test("refuses other versions/layers and reserved codes") {
    val good = Mp3Frames.synthetic(2, 9, 0, padded = false, id3Bytes = 0)
    val mpeg2 = good.clone(); mpeg2(1) = 0xf3.toByte // version = MPEG-2
    assert(Mp3Frames.parse(mpeg2).isEmpty)
    val layer1 = good.clone(); layer1(1) = 0xff.toByte // layer I
    assert(Mp3Frames.parse(layer1).isEmpty)
    val free = good.clone(); free(2) = (free(2) & 0x0f).toByte // bitrate idx 0
    assert(Mp3Frames.parse(free).isEmpty)
    val badSr = good.clone(); badSr(2) = (badSr(2) | 0x0c).toByte // sr idx 3
    assert(Mp3Frames.parse(badSr).isEmpty)
  }

  test("truncation, desync, and trailing junk return None, never throw") {
    val b = Mp3Frames.synthetic(4, 9, 0, padded = false, id3Bytes = 32)
    for (cut <- Seq(2, 9, 12, 50, b.length - 1))
      assert(Mp3Frames.parse(java.util.Arrays.copyOf(b, cut)).isEmpty, s"cut=$cut")
    assert(Mp3Frames.parse(b ++ Array[Byte](1, 2, 3)).isEmpty)
    assert(Mp3Frames.parse(Array[Byte]()).isEmpty)
    for (i <- 0 until math.min(b.length, 600)) {
      val mut = b.clone()
      mut(i) = (mut(i) ^ 0xff).toByte
      Mp3Frames.parse(mut) // totality: must not throw
    }
  }

  test("ID3v2.4 text frames round-trip and compose with the frame walk") {
    val tags = Mp3Frames.Id3Tags("Song été", "The Artist", "An Album")
    val b = Mp3Frames.syntheticId3(tags, minBytes = 100) ++
      Mp3Frames.synthetic(4, 9, 0, padded = false, id3Bytes = 0)
    assert(Mp3Frames.parseId3Tags(b).contains(tags)) // ISO-8859-1 survives
    val m = Mp3Frames.parse(b).get
    assert(m.hasId3 && m.nFrames == 4)
  }

  test("ID3 tag parsing skips unknown frames and rejects malformed sizes") {
    val tag = Mp3Frames.syntheticId3(Mp3Frames.Id3Tags("T", "A", "L"))
    // splice an unknown frame (TXXX) ahead by rebuilding: parse must skip it
    assert(Mp3Frames.parseId3Tags(tag).contains(Mp3Frames.Id3Tags("T", "A", "L")))
    assert(Mp3Frames.parseId3Tags(Mp3Frames.synthetic(2, 9, 0, padded = false, id3Bytes = 0)).isEmpty)
    val bad = tag.clone(); bad(14) = 0x80.toByte // non-syncsafe frame size
    assert(Mp3Frames.parseId3Tags(bad).isEmpty)
    for (i <- 0 until tag.length) {
      val mut = tag.clone(); mut(i) = (mut(i) ^ 0xff).toByte
      Mp3Frames.parseId3Tags(mut) // totality
    }
  }

  test("ID3v2.3 and unknown majors are refused, not misdecoded") {
    // v2.3 frame sizes are plain 32-bit, NOT syncsafe: walking them
    // under v2.4 rules desyncs past size-255 frames and can return
    // WRONG text. The refuse-don't-misdecode contract demands None.
    val tag = Mp3Frames.syntheticId3(Mp3Frames.Id3Tags("T", "A", "L"))
    val v23 = tag.clone(); v23(3) = 3
    assert(Mp3Frames.parseId3Tags(v23).isEmpty)
    val v22 = tag.clone(); v22(3) = 2
    assert(Mp3Frames.parseId3Tags(v22).isEmpty)
    val badRev = tag.clone(); badRev(4) = 0xff.toByte // spec-forbidden
    assert(Mp3Frames.parseId3Tags(badRev).isEmpty)
  }

  test("ID3 footer and extended-header flags are honored, not desynced") {
    val base = Mp3Frames.syntheticId3(Mp3Frames.Id3Tags("T", "A", "L")) ++
      Mp3Frames.synthetic(2, 9, 0, padded = false, id3Bytes = 0)
    // footer flag: tag body is followed by a 10-byte "3DI" footer
    val withFooter = base.clone()
    withFooter(5) = 0x10.toByte
    val size = ((base(6) & 0x7f) << 21) | ((base(7) & 0x7f) << 14) |
               ((base(8) & 0x7f) << 7) | (base(9) & 0x7f)
    val footered = withFooter.take(10 + size) ++
      "3DI".getBytes("ISO-8859-1") ++ Array.fill[Byte](7)(0) ++ // 10-byte footer
      withFooter.drop(10 + size)
    assert(Mp3Frames.parse(footered).exists(_.nFrames == 2))
    // extended header: 6-byte minimal (size=6 syncsafe, 1 flag byte, 0 flags)
    val tag = Mp3Frames.syntheticId3(Mp3Frames.Id3Tags("T2", "A2", "L2"))
    val body = tag.drop(10)
    val ext = Array[Byte](0, 0, 0, 6, 1, 0)
    val newSize = body.length + ext.length
    val rebuilt = tag.take(10) ++ ext ++ body
    rebuilt(5) = 0x40.toByte
    rebuilt(6) = ((newSize >> 21) & 0x7f).toByte
    rebuilt(7) = ((newSize >> 14) & 0x7f).toByte
    rebuilt(8) = ((newSize >> 7) & 0x7f).toByte
    rebuilt(9) = (newSize & 0x7f).toByte
    assert(Mp3Frames.parseId3Tags(rebuilt)
      .contains(Mp3Frames.Id3Tags("T2", "A2", "L2")))
  }

  test("m_id3_tags registry entry: every tag extracts with its frame count") {
    val s = SparkSpec.session
    val out = SparkEntry.queries("m_id3_tags")(s, "/root/testdata/sf0.001").collect()
    assert(out.length == 500)
    assert(out.forall(_.getInt(4) > 0), "some stream failed")
    assert(out.map(_.getString(1)).distinct.length == 11)
    assert(out.map(_.getString(2)).distinct.length == 13)
  }

  test("m_mp3_headers registry entry: every payload walks clean") {
    val s = SparkSpec.session
    val out = SparkEntry.queries("m_mp3_headers")(s, "/root/testdata/sf0.001").collect()
    assert(out.length == 500)
    assert(out.forall(_.getInt(1) > 0), "some stream failed to walk")
    assert(out.map(_.getInt(2)).distinct.sorted.toSeq == Seq(32000, 44100, 48000))
    assert(out.map(_.getInt(3)).distinct.length == 14)
  }
}
