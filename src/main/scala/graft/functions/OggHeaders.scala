package graft.functions

/** Ogg/Vorbis header triage — the streaming-audio container member of
  * the multimodal suite (WAV: [[WavAudio]], MP3: [[Mp3Frames]], FLAC:
  * [[FlacHeaders]]). Structure per the public specs: the Ogg page
  * framing of RFC 3533 (`OggS` capture pattern, version 0, a
  * header-type byte carrying continued/BOS/EOS flags, a 64-bit LE
  * granule position, 32-bit LE serial / sequence / CRC, then a lacing
  * table whose 255-valued entries continue a packet into the next
  * segment or page) and the Vorbis I identification + comment headers
  * (xiph.org): packet type 1 `vorbis` with u32le version 0, u8
  * channels, u32le sample rate and the three bitrate fields; packet
  * type 3 with the u32le-framed UTF-8 vendor string.
  *
  * Every page CRC is VERIFIED: Ogg's checksum is CRC-32 with
  * polynomial 0x04C11DB7, unreflected, zero init and zero final xor,
  * computed over the whole page with the CRC field zeroed. Parse is
  * total — truncation, a wrong capture pattern, a CRC mismatch, a
  * mid-stream serial change, a missing/spurious BOS flag, or a
  * malformed first packet return None, never throw; all offset math
  * runs in Long (the FlacHeaders convention).
  */
object OggHeaders {

  final case class OggInfo(
      serial: Long,
      nPages: Int,
      lastGranule: Long,
      channels: Int,
      sampleRate: Int,
      nominalBitrate: Int,
      durationMs: Long,
      vendor: String)

  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  /** Unreflected CRC-32/0x04C11DB7 over [from, from+len), with the four
    * bytes at crcAt treated as zero (the in-place page checksum rule).
    */
  private[graft] def pageCrc(b: Array[Byte], from: Int, len: Int, crcAt: Int): Int = {
    var crc = 0
    var i = from
    val end = from + len
    while (i < end) {
      val v = if (i >= crcAt && i < crcAt + 4) 0 else b(i) & 0xff
      crc = (crc << 8) ^ CrcTable(((crc >>> 24) ^ v) & 0xff)
      i += 1
    }
    crc
  }

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def i64le(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var j = 7
    while (j >= 0) { v = (v << 8) | (b(i + j) & 0xffL); j -= 1 }
    v
  }

  /** Walk the page chain, verify CRCs, assemble the header packets;
    * None on any structural violation.
    */
  def parse(bytes: Array[Byte]): Option[OggInfo] = {
    var posL = 0L
    var serial = -1L
    var nPages = 0
    var lastGranule = 0L
    var sawEos = false
    // cross-page packet assembly: lacing 255 continues, < 255 ends
    val pending = new java.io.ByteArrayOutputStream()
    var packets = List.empty[Array[Byte]]
    while (posL < bytes.length && !sawEos) {
      if (posL + 27L > bytes.length) return None
      val p = posL.toInt
      if (bytes(p) != 'O' || bytes(p + 1) != 'g' || bytes(p + 2) != 'g' || bytes(p + 3) != 'S')
        return None
      if (bytes(p + 4) != 0) return None // stream structure version
      val flags = bytes(p + 5) & 0xff
      // RFC 3533 §6: BOS (0x02) marks exactly the first page of a
      // logical stream — absent there, or present mid-stream, the
      // chain is structurally invalid
      if (nPages == 0 && (flags & 0x02) == 0) return None
      if (nPages > 0 && (flags & 0x02) != 0) return None
      val granule = i64le(bytes, p + 6)
      val pageSerial = u32le(bytes, p + 14)
      if (serial < 0) serial = pageSerial
      else if (serial != pageSerial) return None // multiplexing out of profile
      val nSegs = bytes(p + 26) & 0xff
      if (posL + 27L + nSegs > bytes.length) return None
      var payloadLen = 0L
      var s = 0
      while (s < nSegs) { payloadLen += bytes(p + 27 + s) & 0xff; s += 1 }
      if (posL + 27L + nSegs + payloadLen > bytes.length) return None
      if (pageCrc(bytes, p, (27 + nSegs + payloadLen).toInt, p + 22) != u32le(bytes, p + 22).toInt)
        return None
      if ((flags & 0x01) == 0 && pending.size() > 0) return None // lost continuation
      if ((flags & 0x01) != 0 && pending.size() == 0) return None // orphan continuation
      var off = p + 27 + nSegs
      s = 0
      while (s < nSegs) {
        val lace = bytes(p + 27 + s) & 0xff
        pending.write(bytes, off, lace)
        if (lace < 255) { packets ::= pending.toByteArray; pending.reset() }
        off += lace
        s += 1
      }
      nPages += 1
      lastGranule = granule
      sawEos = (flags & 0x04) != 0
      posL += 27L + nSegs + payloadLen
    }
    if (nPages == 0 || !sawEos || pending.size() > 0) return None
    val all = packets.reverse
    // identification header MUST be the very first packet (Vorbis I §4.2)
    val ident = all.headOption.getOrElse(return None)
    if (ident.length < 30 || ident(0) != 1 ||
        new String(ident, 1, 6, "US-ASCII") != "vorbis") return None
    if (u32le(ident, 7) != 0L) return None // vorbis_version
    val channels = ident(11) & 0xff
    val rate = u32le(ident, 12)
    val nominal = u32le(ident, 20).toInt
    if (channels == 0 || rate <= 0L || rate > 1000000L) return None
    val vendor = all.find(pk => pk.length >= 11 && pk(0) == 3 &&
        new String(pk, 1, 6, "US-ASCII") == "vorbis")
      .flatMap { pk =>
        val vlen = u32le(pk, 7)
        if (vlen + 11L <= pk.length) Some(new String(pk, 11, vlen.toInt, "UTF-8")) else None
      }.getOrElse("")
    Some(OggInfo(serial, nPages, lastGranule, channels, rate.toInt, nominal,
      lastGranule * 1000L / rate, vendor))
  }

  /** Valid Ogg/Vorbis metadata bytes (header pages + empty audio pages
    * — header triage only): a BOS page carrying the identification
    * header, a page carrying the comment header, then `nAudioPages`
    * dummy audio pages advancing the granule by `samplesPerPage`, EOS
    * on the final page. Every page gets a real CRC.
    */
  def synthetic(
      serial: Long,
      channels: Int,
      sampleRate: Int,
      nominalBitrate: Int,
      vendor: String,
      nAudioPages: Int,
      samplesPerPage: Int = 1024): Array[Byte] = {
    require(channels >= 1 && channels <= 255 && sampleRate > 0 && nAudioPages >= 0,
      "field out of Vorbis ident range")
    val ident = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(1); o.write("vorbis".getBytes("US-ASCII"), 0, 6)
      def w32(v: Int): Unit = { o.write(v & 0xff); o.write((v >>> 8) & 0xff)
        o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff) }
      w32(0); o.write(channels); w32(sampleRate)
      w32(0); w32(nominalBitrate); w32(0) // max / nominal / min bitrate
      o.write(0xb8) // blocksize_0 = 256, blocksize_1 = 2048
      o.write(1)    // framing bit
      o.toByteArray
    }
    val comment = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(3); o.write("vorbis".getBytes("US-ASCII"), 0, 6)
      val vb = vendor.getBytes("UTF-8")
      def w32(v: Int): Unit = { o.write(v & 0xff); o.write((v >>> 8) & 0xff)
        o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff) }
      w32(vb.length); o.write(vb, 0, vb.length); w32(0); o.write(1)
      o.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    var seq = 0
    def page(payload: Array[Byte], flags: Int, granule: Long): Unit = {
      require(payload.length < 255 * 255, "synthetic payload exceeds one page")
      val nSegs = payload.length / 255 + 1
      val hdr = new Array[Byte](27 + nSegs)
      hdr(0) = 'O'; hdr(1) = 'g'; hdr(2) = 'g'; hdr(3) = 'S'
      hdr(5) = flags.toByte
      var g = granule
      for (i <- 0 until 8) { hdr(6 + i) = (g & 0xff).toByte; g >>>= 8 }
      var sv = serial
      for (i <- 0 until 4) { hdr(14 + i) = (sv & 0xff).toByte; sv >>>= 8 }
      var q = seq
      for (i <- 0 until 4) { hdr(18 + i) = (q & 0xff).toByte; q >>>= 8 }
      hdr(26) = nSegs.toByte
      var rem = payload.length
      for (i <- 0 until nSegs) {
        hdr(27 + i) = math.min(rem, if (i == nSegs - 1) 254 else 255).toByte
        rem -= math.min(rem, 255)
      }
      val whole = hdr ++ payload
      val crc = pageCrc(whole, 0, whole.length, 22)
      var c = crc
      for (i <- 0 until 4) { whole(22 + i) = (c & 0xff).toByte; c >>>= 8 }
      out.write(whole, 0, whole.length)
      seq += 1
    }
    page(ident, 0x02, 0L)
    page(comment, if (nAudioPages == 0) 0x04 else 0x00, 0L)
    for (a <- 1 to nAudioPages)
      page(Array.fill[Byte]((serial % 40 + a).toInt.max(1))(0x00),
        if (a == nAudioPages) 0x04 else 0x00, a.toLong * samplesPerPage)
    out.toByteArray
  }
}
