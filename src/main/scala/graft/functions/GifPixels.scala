package graft.functions

/** Dependency-free GIF PIXEL decode — the second compressed image
  * format after PNG ([[PngPixels]]). GIF's compression is LZW with
  * variable-width codes (GIF89a spec appendix F) over palette indices,
  * so a real decode needs no media library either: parse the logical
  * screen descriptor, read the color table, inflate the LZW stream of
  * the first image block, and map indices through the palette.
  *
  * Scope: non-interlaced first frame, global or local color table, any
  * min-code-size 2..8. Interlaced images and structurally broken
  * streams return None rather than a wrong answer (the PngPixels
  * posture). Extensions (GCE, comments, app blocks) are skipped.
  */
object GifPixels {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  /** Decode to (width, height, meanR, meanG, meanB) over the first
    * frame's pixels.
    */
  def decode(b: Array[Byte]): Option[(Int, Int, Double, Double, Double)] =
    decodeRaster(b).map { case (w, h, raster) =>
      var (sr, sg, sb) = (0L, 0L, 0L)
      var i = 0
      while (i < raster.length) {
        sr += raster(i) & 0xff; sg += raster(i + 1) & 0xff; sb += raster(i + 2) & 0xff
        i += 3
      }
      val n = w.toLong * h
      (w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
    }

  /** Decode the first image block to an RGB raster (rows top-down,
    * 3 bytes per pixel).
    */
  def decodeRaster(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 14) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val sw = le16(b, 6)
    val sh = le16(b, 8)
    if (sw <= 0 || sh <= 0 || sw > (1 << 14) || sh > (1 << 14)) return None
    val packed = u8(b, 10)
    var pos = 13
    var globalTable: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (pos + 3 * n > b.length) return None
      globalTable = java.util.Arrays.copyOfRange(b, pos, pos + 3 * n)
      pos += 3 * n
    }
    // walk blocks to the first image descriptor
    while (pos < b.length) {
      u8(b, pos) match {
        case 0x21 => // extension: label byte then sub-blocks
          pos += 2
          while (pos < b.length && u8(b, pos) != 0) pos += 1 + u8(b, pos)
          pos += 1
        case 0x2c =>
          if (pos + 10 > b.length) return None
          val w = le16(b, pos + 5)
          val h = le16(b, pos + 7)
          val ip = u8(b, pos + 9)
          if ((ip & 0x40) != 0) return None // interlaced: out of scope
          if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
          pos += 10
          var table = globalTable
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            if (pos + 3 * n > b.length) return None
            table = java.util.Arrays.copyOfRange(b, pos, pos + 3 * n)
            pos += 3 * n
          }
          if (table == null || pos >= b.length) return None
          val minCode = u8(b, pos)
          pos += 1
          if (minCode < 2 || minCode > 8) return None
          // concatenate the data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (pos < b.length && u8(b, pos) != 0) {
            val n = u8(b, pos)
            if (pos + 1 + n > b.length) return None
            data.write(b, pos + 1, n)
            pos += 1 + n
          }
          val idx = lzwDecode(data.toByteArray, minCode, w * h).getOrElse(return None)
          val nColors = table.length / 3
          val out = new Array[Byte](w * h * 3)
          var i = 0
          while (i < w * h) {
            val c = idx(i) & 0xff
            if (c >= nColors) return None
            out(3 * i) = table(3 * c)
            out(3 * i + 1) = table(3 * c + 1)
            out(3 * i + 2) = table(3 * c + 2)
            i += 1
          }
          return Some((w, h, out))
        case 0x3b => return None // trailer before any image
        case _ => return None
      }
    }
    None
  }

  /** GIF-variant LZW: variable code width starting at minCode+1,
    * LSB-first bit packing, clear/end codes, dictionary capped at 12
    * bits. Returns exactly `expected` indices or None.
    */
  private def lzwDecode(data: Array[Byte], minCode: Int, expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val end = clear + 1
    val out = new Array[Byte](expected)
    var produced = 0
    // dictionary as (prefix code, appended index); roots are implicit
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var dictSize = end + 1
    var width = minCode + 1
    var prev = -1
    var acc = 0L
    var accBits = 0
    var bytePos = 0
    val tail = new Array[Byte](4096)

    def emit(code: Int): Boolean = { // expand `code` into out; false on overflow
      var len = 0
      var c = code
      while (c >= clear) { // descend through the chain
        if (len >= 4096) return false
        tail(len) = append(c); len += 1
        c = prefix(c)
      }
      if (produced + len + 1 > expected) return false
      out(produced) = c.toByte
      produced += 1
      var k = len - 1
      while (k >= 0) { out(produced) = tail(k); produced += 1; k -= 1 }
      true
    }
    def firstIndexOf(code: Int): Byte = {
      var c = code
      while (c >= clear) c = prefix(c)
      c.toByte
    }

    while (produced < expected) {
      while (accBits < width) {
        if (bytePos >= data.length) return None
        acc |= (data(bytePos).toLong & 0xff) << accBits
        accBits += 8
        bytePos += 1
      }
      val code = (acc & ((1 << width) - 1)).toInt
      acc >>>= width
      accBits -= width
      if (code == clear) {
        dictSize = end + 1
        width = minCode + 1
        prev = -1
      } else if (code == end) {
        return if (produced == expected) Some(out) else None
      } else if (code < clear) {
        if (produced >= expected) return None
        out(produced) = code.toByte
        produced += 1
        if (prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev; append(dictSize) = code.toByte; dictSize += 1
          if (dictSize == (1 << width) && width < 12) width += 1
        }
        prev = code
      } else {
        // composite code: either known or the KwKwK self-reference
        if (code < dictSize) {
          if (!emit(code)) return None
          if (prev >= 0 && dictSize < 4096) {
            prefix(dictSize) = prev; append(dictSize) = firstIndexOf(code); dictSize += 1
            if (dictSize == (1 << width) && width < 12) width += 1
          }
        } else if (code == dictSize && prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev; append(dictSize) = firstIndexOf(prev); dictSize += 1
          if (!emit(code)) return None
          if (dictSize == (1 << width) && width < 12) width += 1
        } else return None
        prev = code
      }
    }
    Some(out)
  }

  /** A COMPLETE GIF89a whose pixel (x, y) carries palette index
    * (x·7 + y·13 + seed) % 64 over a 64-color palette with
    * palette[i] = (i·4 % 256, i·9 % 256, i·14 % 256) — a real LZW
    * stream (clear code before every literal keeps the encoder
    * trivially correct while exercising the decoder's clear/reset and
    * bit-unpacking paths on every pixel).
    */
  def syntheticGif(w: Int, h: Int, seed: Int): Array[Byte] = {
    require(w > 0 && h > 0)
    val minCode = 6 // 64-color palette
    val clear = 1 << minCode
    val width = minCode + 1
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0x80 | (minCode - 1)) // global table, 2^6 entries
    out.write(0); out.write(0)
    for (i <- 0 until 64) {
      out.write(i * 4 % 256); out.write(i * 9 % 256); out.write(i * 14 % 256)
    }
    out.write(0x2c) // image descriptor at (0,0), full screen
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0) // no local table, not interlaced
    out.write(minCode)
    // LZW payload: clear + literal per pixel, then end, LSB-first
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var accBits = 0
    def put(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += width
      while (accBits >= 8) { bits.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8 }
    }
    for (y <- 0 until h; x <- 0 until w) {
      put(clear)
      put((x * 7 + y * 13 + seed) % 64)
    }
    put(clear + 1) // end code
    if (accBits > 0) bits.write((acc & 0xff).toInt)
    val payload = bits.toByteArray
    var off = 0
    while (off < payload.length) { // ≤255-byte sub-blocks
      val n = math.min(255, payload.length - off)
      out.write(n)
      out.write(payload, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** The synthetic image's expected channel means from the index/palette
    * formulas alone — no codec in the loop.
    */
  def syntheticMeans(w: Int, h: Int, seed: Int): (Double, Double, Double) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (x * 7 + y * 13 + seed) % 64
      sr += i * 4 % 256; sg += i * 9 % 256; sb += i * 14 % 256
    }
    val n = w.toLong * h
    (sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }
}
