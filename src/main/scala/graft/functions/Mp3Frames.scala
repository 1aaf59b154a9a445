package graft.functions

/** Dependency-free MP3 (MPEG-1 Layer III) frame-header walk — the
  * compressed-audio twin of the image header decoders: a training
  * pipeline triaging a crawl's audio needs sample rate, bitrate,
  * frame count, and duration without decoding audio. Everything here
  * is from the public spec (ISO/IEC 11172-3 frame header layout).
  *
  * The walk honors the per-frame PADDING bit (frame length =
  * 144·bitrate/samplerate + padding) — ignoring it desyncs the walk
  * on padded streams, which is exactly what the driver's closed-form
  * gate would surface as a red row. An ID3v2 prefix is skipped via
  * its syncsafe length. Scope: MPEG-1 Layer III only; other
  * versions/layers, free-format or reserved bitrate/samplerate codes,
  * desyncs, and trailing junk return None rather than a guess — the
  * same refuse-don't-misdecode contract as the image decoders.
  */
object Mp3Frames {

  /** MPEG-1 Layer III bitrates (kbps) by header index 1..14. */
  val Bitrates: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample rates (Hz) by header index 0..2. */
  val SampleRates: Array[Int] = Array(44100, 48000, 32000)

  /** Samples per MPEG-1 Layer III frame. */
  val SamplesPerFrame = 1152

  final case class Mp3(nFrames: Int, sampleRate: Int, bitrateKbps: Int,
                       durationMs: Long, vbr: Boolean, hasId3: Boolean)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  /** Walk every frame; None on anything outside the supported profile
    * or structurally broken (desync, truncated frame, trailing junk).
    */
  def parse(b: Array[Byte]): Option[Mp3] =
    try parseImpl(b)
    catch { case scala.util.control.NonFatal(_) => None }

  private def parseImpl(b: Array[Byte]): Option[Mp3] = {
    var pos = 0
    var hasId3 = false
    // ID3v2: "ID3" ver(2) flags(1) syncsafe-size(4); size excludes the
    // 10-byte header but NOT the optional 10-byte footer (flag 0x10)
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = (u8(b, 6) << 21) | (u8(b, 7) << 14) | (u8(b, 8) << 7) | u8(b, 9)
      if ((u8(b, 6) | u8(b, 7) | u8(b, 8) | u8(b, 9)) >= 0x80) return None // non-syncsafe
      pos = 10 + size + (if ((u8(b, 5) & 0x10) != 0) 10 else 0)
      if (pos > b.length) return None
      hasId3 = true
    }
    var nFrames = 0
    var sampleRate = 0
    var bitrate0 = 0
    var vbr = false
    var samples = 0L
    while (pos < b.length) {
      if (pos + 4 > b.length) return None // truncated header
      if (u8(b, pos) != 0xff || (u8(b, pos + 1) & 0xe0) != 0xe0) return None // desync
      val h1 = u8(b, pos + 1)
      val h2 = u8(b, pos + 2)
      val version = (h1 >> 3) & 0x03
      val layer = (h1 >> 1) & 0x03
      if (version != 3 || layer != 1) return None // MPEG-1 Layer III only
      val brIdx = h2 >> 4
      val srIdx = (h2 >> 2) & 0x03
      val padding = (h2 >> 1) & 0x01
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None // free/reserved
      val kbps = Bitrates(brIdx)
      val sr = SampleRates(srIdx)
      if (sampleRate == 0) { sampleRate = sr; bitrate0 = kbps }
      else if (sr != sampleRate) return None // mixed rates: not one stream
      if (kbps != bitrate0) vbr = true
      val frameLen = 144000 * kbps / sr + padding
      if (frameLen < 4 || pos + frameLen > b.length) return None
      pos += frameLen
      nFrames += 1
      samples += SamplesPerFrame
    }
    if (nFrames == 0) return None
    Some(Mp3(nFrames, sampleRate, bitrate0, samples * 1000L / sampleRate,
             vbr, hasId3))
  }

  final case class Id3Tags(title: String, artist: String, album: String)

  /** ID3v2.4 text frames (TIT2/TPE1/TALB, ISO-8859-1 encoding byte 0)
    * from the tag block an MP3 stream opens with; None when the stream
    * has no ID3v2 tag or it is malformed. Unknown frames are skipped
    * by their declared length, zero-padding ends the walk (informal
    * padding is standard in real tags).
    */
  def parseId3Tags(b: Array[Byte]): Option[Id3Tags] =
    try parseId3Impl(b)
    catch { case scala.util.control.NonFatal(_) => None }

  private def parseId3Impl(b: Array[Byte]): Option[Id3Tags] = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return None
    // only v2.4 is in scope: v2.3 frame sizes are NOT syncsafe, so
    // walking them under v2.4 rules would desync past size-255 frames
    // and return WRONG tag text instead of None. Refuse other majors
    // (and the spec-forbidden 0xff in either version byte) up front.
    if (u8(b, 3) != 4 || u8(b, 4) == 0xff) return None
    if ((u8(b, 6) | u8(b, 7) | u8(b, 8) | u8(b, 9)) >= 0x80) return None
    val size = (u8(b, 6) << 21) | (u8(b, 7) << 14) | (u8(b, 8) << 7) | u8(b, 9)
    val end = 10 + size
    if (end > b.length) return None
    var title = ""
    var artist = ""
    var album = ""
    var pos = 10
    // v2.4 extended header (flag 0x40): skip via its own syncsafe size,
    // or the frame walk would misread its bytes as a frame header
    if ((u8(b, 5) & 0x40) != 0) {
      if (pos + 4 > end) return None
      val esz = (u8(b, pos) << 21) | (u8(b, pos + 1) << 14) |
                (u8(b, pos + 2) << 7) | u8(b, pos + 3)
      if ((u8(b, pos) | u8(b, pos + 1) | u8(b, pos + 2) | u8(b, pos + 3)) >= 0x80)
        return None
      pos += esz // size field includes the whole extended header
      if (pos > end) return None
    }
    while (pos + 10 <= end && u8(b, pos) != 0) { // zero byte = padding
      val id = new String(b, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val fsz = (u8(b, pos + 4) << 21) | (u8(b, pos + 5) << 14) |
                (u8(b, pos + 6) << 7) | u8(b, pos + 7)
      if ((u8(b, pos + 4) | u8(b, pos + 5) | u8(b, pos + 6) | u8(b, pos + 7)) >= 0x80)
        return None
      if (pos + 10 + fsz > end) return None
      if (fsz >= 1 && (id == "TIT2" || id == "TPE1" || id == "TALB")) {
        if (u8(b, pos + 10) != 0) return None // only ISO-8859-1 in scope
        val text = new String(b, pos + 11, fsz - 1,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        id match {
          case "TIT2" => title = text
          case "TPE1" => artist = text
          case _ => album = text
        }
      }
      pos += 10 + fsz
    }
    Some(Id3Tags(title, artist, album))
  }

  /** A real ID3v2.4 tag block carrying the three text frames, padded
    * to at least `minBytes` of frame+padding content.
    */
  def syntheticId3(tags: Id3Tags, minBytes: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def frame(id: String, text: String): Unit = {
      val payload = text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      out.write(id.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val fsz = payload.length + 1 // encoding byte
      out.write((fsz >> 21) & 0x7f); out.write((fsz >> 14) & 0x7f)
      out.write((fsz >> 7) & 0x7f); out.write(fsz & 0x7f)
      out.write(0); out.write(0) // flags
      out.write(0) // ISO-8859-1
      out.write(payload)
    }
    frame("TIT2", tags.title)
    frame("TPE1", tags.artist)
    frame("TALB", tags.album)
    while (out.size() < minBytes) out.write(0)
    val body = out.toByteArray
    val head = new java.io.ByteArrayOutputStream()
    head.write('I'); head.write('D'); head.write('3')
    head.write(4); head.write(0); head.write(0)
    head.write((body.length >> 21) & 0x7f); head.write((body.length >> 14) & 0x7f)
    head.write((body.length >> 7) & 0x7f); head.write(body.length & 0x7f)
    head.write(body)
    head.toByteArray
  }

  /** Deterministic CBR fixture: `frames` valid frames at the given
    * indices, optional ID3v2 prefix, every frame's padding bit =
    * `padded`. Payload bytes are the frame index — content-free but
    * structurally exact.
    */
  def synthetic(frames: Int, brIdx: Int, srIdx: Int, padded: Boolean,
                id3Bytes: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (id3Bytes > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0) // v2.4, no flags
      out.write((id3Bytes >> 21) & 0x7f); out.write((id3Bytes >> 14) & 0x7f)
      out.write((id3Bytes >> 7) & 0x7f); out.write(id3Bytes & 0x7f)
      var i = 0
      while (i < id3Bytes) { out.write(0); i += 1 }
    }
    val pad = if (padded) 1 else 0
    val frameLen = 144000 * Bitrates(brIdx) / SampleRates(srIdx) + pad
    var f = 0
    while (f < frames) {
      out.write(0xff)
      out.write(0xfb) // sync + MPEG-1 + Layer III + no CRC
      out.write((brIdx << 4) | (srIdx << 2) | (pad << 1))
      out.write(0x44) // joint stereo, no mode ext, not copyrighted, original
      var i = 4
      while (i < frameLen) { out.write(f & 0xff); i += 1 }
      f += 1
    }
    out.toByteArray
  }
}
