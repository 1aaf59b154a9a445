package graft.functions

/** Pure-byte image header parsing — (format, width, height) from the
  * magic numbers and size fields of the public PNG / GIF / BMP / JPEG
  * file formats. No media libraries: this is the REAL metadata half of
  * the multimodal decode path (pixel decode stays stubbed in this
  * container); it runs inside the batched partition-level extractor, so
  * swapping in a full decoder later changes nothing about the plumbing.
  */
object ImageHeaders {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Parse (format, width, height); None when the bytes are not a
    * recognized image header.
    */
  def parse(b: Array[Byte]): Option[(String, Int, Int)] =
    if (b.length >= 24 && PngSig.indices.forall(i => u8(b, i) == PngSig(i)))
      // PNG: 8-byte signature, IHDR length+type, then BE width/height
      Some(("png", be32(b, 16), be32(b, 20)))
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      // GIF87a/89a: LE logical-screen width/height at offsets 6/8
      Some(("gif", le16(b, 6), le16(b, 8)))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      // BMP: BITMAPINFOHEADER LE width at 18, height at 22 (negative =
      // top-down rows)
      Some(("bmp", le32(b, 18), math.abs(le32(b, 22))))
    else if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8)
      parseJpeg(b)
    else None

  /** JPEG: walk the marker segments to the first start-of-frame (SOFn,
    * excluding DHT/JPG/DAC), whose payload carries BE height then width.
    */
  private def parseJpeg(b: Array[Byte]): Option[(String, Int, Int)] = {
    var i = 2
    while (i + 9 < b.length && u8(b, i) == 0xff) {
      val marker = u8(b, i + 1)
      if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
        return Some(("jpeg", be16(b, i + 7), be16(b, i + 5)))
      else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
      else i += 2 + be16(b, i + 2)
    }
    None
  }

  /** Deterministic minimal-but-valid image headers for the synthetic
    * media table: the parser above must round-trip (format, w, h)
    * through real header bytes, not through a fake side channel.
    */
  def syntheticHeader(format: String, w: Int, h: Int): Array[Byte] = format match {
    case "png" =>
      val out = new java.io.ByteArrayOutputStream()
      PngSig.foreach(out.write)
      out.write(Array[Byte](0, 0, 0, 13)) // IHDR length
      out.write("IHDR".getBytes("US-ASCII"))
      out.write(Array[Byte](
        (w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
        (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte,
        8, 2, 0, 0, 0)) // bit depth, color type, compression, filter, interlace
      out.toByteArray
    case "gif" =>
      ("GIF89a".getBytes("US-ASCII") ++ Array[Byte](
        (w & 0xff).toByte, (w >> 8).toByte,
        (h & 0xff).toByte, (h >> 8).toByte, 0, 0, 0))
    case "bmp" =>
      val out = Array.fill[Byte](26)(0)
      out(0) = 'B'; out(1) = 'M'
      out(14) = 40 // BITMAPINFOHEADER size
      out(18) = (w & 0xff).toByte; out(19) = (w >> 8).toByte
      out(22) = (h & 0xff).toByte; out(23) = (h >> 8).toByte
      out
    case other => throw new IllegalArgumentException(s"no synthetic header for $other")
  }
}
