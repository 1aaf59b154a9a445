package graft.functions

/** Pure-JVM decode of UNCOMPRESSED AVI video (RIFF container, '00db'
  * DIB frames): the one video format that needs no codec, so frame
  * sampling — the operation the multimodal pipeline exists for — runs
  * end to end on real container bytes. Walks the RIFF chunk list for
  * the `avih` main header (dimensions, declared frame count) and the
  * `movi` list's frame chunks; each frame is a BMP-style pixel array
  * (BGR, bottom-up rows padded to 4 bytes).
  *
  * Compressed AVI ('00dc' with an actual codec) and every other video
  * container keep their frame decode stubbed, as documented on
  * Multimodal.
  */
object AviFrames {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b.length >= i + 4 && (0 until 4).forall(j => (b(i + j) & 0xff) == s.charAt(j))

  /** Decode with frame SAMPLING: visit every `frameStep`-th '00db'
    * frame (starting at frame 0) and average its pixels. Returns
    * (width, height, n_frames, n_sampled, meanR, meanG, meanB) or None
    * unless the bytes are a well-formed uncompressed AVI whose frame
    * payloads match the declared dimensions.
    */
  def decode(b: Array[Byte], frameStep: Int = 1): Option[(Int, Int, Int, Int, Double, Double, Double)] = {
    if (frameStep < 1 || b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "AVI ")) return None
    var w, h = 0
    var nFrames, nSampled = 0
    var sr, sg, sb = 0L
    // ALL offset/size arithmetic in Long: declared chunk sizes are
    // attacker-controlled, and Int `off + 8 + size` wraps negative for
    // sizes near Int.MaxValue, silently defeating the bounds checks
    // (an AIOOBE here kills an executor task on one corrupt blob)
    var off = 12L
    while (off + 8 <= b.length) {
      val size = le32(b, (off + 4).toInt).toLong & 0xffffffffL
      if (off + 8 + size > b.length) return None
      if (tag(b, off.toInt, "LIST") && size >= 4) {
        if (tag(b, (off + 8).toInt, "hdrl")) {
          // first subchunk must be avih: dwWidth/dwHeight at offsets
          // 32/36 of its payload — every read bounded by the ACTUAL
          // enclosing LIST size, not just the avih's own declared size
          val a = off + 12
          if (a + 8 + 40 > off + 8 + size || !tag(b, a.toInt, "avih")) return None
          val avihSize = le32(b, (a + 4).toInt).toLong & 0xffffffffL
          if (avihSize < 40 || a + 8 + avihSize > off + 8 + size) return None
          w = le32(b, (a + 8 + 32).toInt)
          h = le32(b, (a + 8 + 36).toInt)
          // cap dims so rowBytes/frameBytes stay far from Int overflow
          if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return None
        } else if (tag(b, (off + 8).toInt, "movi")) {
          if (w == 0) return None // hdrl must precede movi
          val rowBytes = (w.toLong * 3 + 3) / 4 * 4
          val frameBytes = rowBytes * h
          var in = off + 12
          val end = off + 8 + size
          while (in + 8 <= end) {
            val fsz = le32(b, (in + 4).toInt).toLong & 0xffffffffL
            if (in + 8 + fsz > end) return None
            if (tag(b, in.toInt, "00db")) {
              if (fsz != frameBytes) return None
              if (nFrames % frameStep == 0) {
                var y = 0
                while (y < h) {
                  var x = 0
                  val row = in + 8 + y * rowBytes
                  while (x < w) {
                    val i = (row + x * 3).toInt
                    sb += u8(b, i); sg += u8(b, i + 1); sr += u8(b, i + 2)
                    x += 1
                  }
                  y += 1
                }
                nSampled += 1
              }
              nFrames += 1
            }
            in += 8 + fsz + (fsz & 1) // RIFF chunks pad to even sizes
          }
        }
      }
      off += 8 + size + (size & 1)
    }
    if (w == 0 || nSampled == 0) None
    else {
      val n = nSampled.toLong * w * h
      Some((w, h, nFrames, nSampled,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
    }
  }

  /** Complete uncompressed AVI: avih header + `nFrames` solid-color
    * '00db' DIB frames, frame i colored (r+i, g+i, b+i) mod 256 so a
    * sampling decode is distinguishable from a decode-everything.
    */
  def synthetic(w: Int, h: Int, nFrames: Int, r: Int, g: Int, bl: Int): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0)
    val rowBytes = (w * 3 + 3) / 4 * 4
    val frameBytes = rowBytes * h
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xff))
    def t(s: String): Unit = s.foreach(c => out.write(c.toInt))
    val avihSize = 56
    val hdrlSize = 4 + 8 + avihSize
    val moviSize = 4 + nFrames * (8 + frameBytes)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    t("RIFF"); w32(riffSize); t("AVI ")
    t("LIST"); w32(hdrlSize); t("hdrl")
    t("avih"); w32(avihSize)
    w32(33333); w32(0); w32(0); w32(0)   // usec/frame, maxbytes, padding, flags
    w32(nFrames); w32(0); w32(1); w32(0) // total frames, initial, streams, bufsize
    w32(w); w32(h)
    (0 until 4).foreach(_ => w32(0))     // reserved
    t("LIST"); w32(moviSize); t("movi")
    (0 until nFrames).foreach { f =>
      t("00db"); w32(frameBytes)
      val row = new Array[Byte](rowBytes)
      var x = 0
      while (x < w) {
        row(x * 3) = ((bl + f) % 256).toByte
        row(x * 3 + 1) = ((g + f) % 256).toByte
        row(x * 3 + 2) = ((r + f) % 256).toByte
        x += 1
      }
      (0 until h).foreach(_ => out.write(row, 0, rowBytes))
    }
    out.toByteArray
  }
}
