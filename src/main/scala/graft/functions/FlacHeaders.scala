package graft.functions

/** Minimal FLAC container walk — the lossless-audio member of the
  * multimodal triage suite (WAV/RIFF: [[WavAudio]], MP3: [[Mp3Frames]]).
  * Structure per the public FLAC format spec (RFC 9639 / xiph.org):
  * `fLaC` magic, then metadata blocks, each a 1-byte header
  * (last-block flag in bit 7, 7-bit type) plus a 24-bit big-endian
  * length. STREAMINFO (type 0, mandatory first, 34 bytes) packs
  * min/max block size (u16), min/max frame size (u24), then one
  * big-endian 64-bit word of sample rate (u20) | channels-1 (u3) |
  * bits-1 (u5) | total samples (u36), then the 16-byte MD5 of the
  * unencoded audio. VORBIS_COMMENT (type 4) is the one block whose
  * body is LITTLE-endian (it embeds the Vorbis comment spec):
  * u32le vendor length, vendor bytes, u32le comment count.
  *
  * Parse is total: any truncation, bad magic, undersized STREAMINFO,
  * or a first block of the wrong type returns None, never throws.
  */
object FlacHeaders {

  final case class FlacInfo(
      minBlock: Int,
      maxBlock: Int,
      sampleRate: Int,
      channels: Int,
      bits: Int,
      totalSamples: Long,
      nBlocks: Int,
      vendor: String, // empty when no VORBIS_COMMENT block
      md5Hex: String)

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def u24(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 16) | ((b(i + 1) & 0xff) << 8) | (b(i + 2) & 0xff)

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Walk the metadata chain; None on any structural violation. */
  def parse(bytes: Array[Byte]): Option[FlacInfo] = {
    if (bytes.length < 4 + 4 + 34) return None
    if (bytes(0) != 'f' || bytes(1) != 'L' || bytes(2) != 'a' || bytes(3) != 'C')
      return None
    // Long-space walk (the AudioFingerprint.pcmMono convention): for
    // inputs approaching 2 GiB, Int `body + len` can wrap negative and
    // defeat the bounds check — every guard here compares in Long, and
    // positions narrow to Int only after proving < bytes.length.
    var posL = 4L
    var first = true
    var info: Option[FlacInfo] = None
    var nBlocks = 0
    var vendor = ""
    var last = false
    while (!last) {
      if (posL + 4L > bytes.length) return None
      val pos = posL.toInt
      val hdr = bytes(pos) & 0xff
      last = (hdr & 0x80) != 0
      val tpe = hdr & 0x7f
      val len = u24(bytes, pos + 1)
      val bodyL = posL + 4L
      if (bodyL + len > bytes.length) return None
      val body = bodyL.toInt
      if (first) {
        // STREAMINFO is mandatory and mandatory-first (RFC 9639 §8.1)
        if (tpe != 0 || len < 34) return None
        var packed = 0L
        var j = 0
        while (j < 8) { packed = (packed << 8) | (bytes(body + 10 + j) & 0xffL); j += 1 }
        val sampleRate = (packed >>> 44).toInt
        val channels = ((packed >>> 41) & 0x7).toInt + 1
        val bits = ((packed >>> 36) & 0x1f).toInt + 1
        val totalSamples = packed & 0xfffffffffL
        if (sampleRate == 0) return None // forbidden for audio streams
        val md5 = new StringBuilder(32)
        var i = 0
        while (i < 16) {
          md5.append("%02x".format(bytes(body + 18 + i) & 0xff)); i += 1
        }
        info = Some(FlacInfo(u16(bytes, body), u16(bytes, body + 2),
          sampleRate, channels, bits, totalSamples, 0, "", md5.toString))
        first = false
      } else if (tpe == 4 && len >= 8) {
        // VORBIS_COMMENT: little-endian vendor-length framing. Compare
        // in Long BEFORE narrowing — a crafted vlen near Int.MaxValue
        // would wrap `body + 4 + vlen + 4` negative and slip past an
        // Int `<=` check into an out-of-bounds String read.
        val vlenL = u32le(bytes, body)
        if (vlenL + 8L <= len)
          vendor = new String(bytes, body + 4, vlenL.toInt, "UTF-8")
      }
      nBlocks += 1
      posL = bodyL + len
    }
    info.map(_.copy(nBlocks = nBlocks, vendor = vendor))
  }

  /** Valid FLAC metadata bytes (no audio frames — header triage only),
    * with an optional VORBIS_COMMENT and PADDING block after the
    * STREAMINFO. md5 is the caller's 16 raw bytes.
    */
  def synthetic(
      minBlock: Int,
      maxBlock: Int,
      sampleRate: Int,
      channels: Int,
      bits: Int,
      totalSamples: Long,
      md5: Array[Byte],
      vendor: Option[String] = None,
      paddingBytes: Int = 0): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20) &&
      channels >= 1 && channels <= 8 && bits >= 4 && bits <= 32 &&
      totalSamples >= 0 && totalSamples < (1L << 36) && md5.length == 16,
      "field out of FLAC STREAMINFO range")
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    def writeU16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def writeU24(v: Int): Unit = {
      out.write((v >>> 16) & 0xff); out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    val blocks = Seq(0) ++ vendor.map(_ => 4) ++
      (if (paddingBytes > 0) Seq(1) else Seq.empty)
    def header(tpe: Int, len: Int): Unit = {
      val lastFlag = if (tpe == blocks.last) 0x80 else 0
      out.write(lastFlag | tpe); writeU24(len)
    }
    header(0, 34)
    writeU16(minBlock); writeU16(maxBlock)
    writeU24(0); writeU24(0) // min/max frame size unknown (0 = not known)
    val packed = (sampleRate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bits - 1).toLong << 36) | totalSamples
    var i = 56
    while (i >= 0) { out.write(((packed >>> i) & 0xff).toInt); i -= 8 }
    out.write(md5, 0, 16)
    vendor.foreach { v =>
      val vb = v.getBytes("UTF-8")
      header(4, 4 + vb.length + 4)
      def writeU32le(x: Int): Unit = {
        out.write(x & 0xff); out.write((x >>> 8) & 0xff)
        out.write((x >>> 16) & 0xff); out.write((x >>> 24) & 0xff)
      }
      writeU32le(vb.length); out.write(vb, 0, vb.length); writeU32le(0)
    }
    if (paddingBytes > 0) {
      header(1, paddingBytes)
      out.write(new Array[Byte](paddingBytes), 0, paddingBytes)
    }
    out.toByteArray
  }
}
