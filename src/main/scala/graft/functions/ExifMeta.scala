package graft.functions

/** Dependency-free EXIF metadata extraction — the image-metadata prong
  * of the multimodal pipeline (orientation for correct decode/resize,
  * capture time for dedup/provenance, camera fields for source
  * stratification). Everything here is from the public specs: JPEG
  * APP1 carriage (JEITA CP-3451 §4.7), TIFF 6.0 IFD structure, and the
  * EXIF tag registry.
  *
  * Parse walks the JPEG marker stream to the first APP1 segment whose
  * payload opens with "Exif\0\0", then reads the embedded TIFF: byte
  * order (II/MM — BOTH paths are exercised by the driver gate), IFD0's
  * Make / Model / Orientation / DateTime, and the Exif sub-IFD's
  * ExposureTime + ISO. Totality contract matches the other decoders:
  * any malformed, truncated, or absent structure → None, never a
  * throw, never a misparse.
  */
object ExifMeta {

  final case class Exif(byteOrder: String, make: String, model: String,
                        orientation: Int, dateTime: String,
                        iso: Int, expNum: Int, expDen: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  /** ASCII-type TIFF values are NUL-terminated. */
  private val NulStr: String = new String(Array(0.toChar))

  // ---------------------------------------------------------------- parse

  /** EXIF record from a JPEG byte stream; None when absent/malformed. */
  def parse(jpeg: Array[Byte]): Option[Exif] =
    try parseImpl(jpeg)
    catch { case scala.util.control.NonFatal(_) => None }

  private def parseImpl(b: Array[Byte]): Option[Exif] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var pos = 2
    // marker walk: APP1 must precede SOS; stop at SOS/EOI or any
    // structural break
    while (pos + 3 < b.length && u8(b, pos) == 0xff) {
      val marker = u8(b, pos + 1)
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) pos += 2
      else if (marker == 0xda || marker == 0xd9) return None // no APP1 seen
      else {
        val len = (u8(b, pos + 2) << 8) | u8(b, pos + 3)
        val seg = pos + 4
        if (len < 2 || seg + len - 2 > b.length) return None
        if (marker == 0xe1 && len - 2 >= 6 &&
            b(seg) == 'E' && b(seg + 1) == 'x' && b(seg + 2) == 'i' &&
            b(seg + 3) == 'f' && b(seg + 4) == 0 && b(seg + 5) == 0)
          return parseTiff(b, seg + 6, seg + len - 2)
        pos += 2 + len
      }
    }
    None
  }

  private def parseTiff(b: Array[Byte], base: Int, end: Int): Option[Exif] = {
    if (base + 8 > end) return None
    val big =
      if (b(base) == 'M' && b(base + 1) == 'M') true
      else if (b(base) == 'I' && b(base + 1) == 'I') false
      else return None
    def u16(i: Int): Int = {
      if (i < base || i + 2 > end) return -1
      if (big) (u8(b, i) << 8) | u8(b, i + 1) else (u8(b, i + 1) << 8) | u8(b, i)
    }
    def u32(i: Int): Long = {
      if (i < base || i + 4 > end) return -1L
      if (big)
        (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
      else
        (u8(b, i + 3).toLong << 24) | (u8(b, i + 2) << 16) | (u8(b, i + 1) << 8) | u8(b, i)
    }
    if (u16(base + 2) != 42) return None
    val ifd0 = u32(base + 4)
    if (ifd0 < 8 || base + ifd0 + 2 > end) return None

    var make = ""
    var model = ""
    var orientation = 0
    var sawOrientation = false // absent tag defaults to 1 (TIFF 6.0); a PRESENT out-of-range value is refused
    var dateTime = ""
    var iso = 0
    var expNum = 0
    var expDen = 0

    /** TIFF value slot: a value ≤ 4 bytes is left-justified IN the
      * entry's 4-byte field; larger values live at an offset from the
      * TIFF base.
      */
    def ascii(entry: Int, count: Long): String = {
      if (count <= 0 || count > 4096) return ""
      val at = if (count <= 4) entry + 8 else base + u32(entry + 8).toInt
      if (at < base || at + count > end) return ""
      val raw = new String(b, at, count.toInt, java.nio.charset.StandardCharsets.US_ASCII)
      raw.takeWhile(_ != 0.toChar)
    }

    def walkIfd(off: Long, isExifIfd: Boolean): Boolean = {
      val ifd = base + off.toInt
      val n = u16(ifd)
      if (n < 0 || n > 512 || ifd + 2 + 12 * n + 4 > end) return false
      var i = 0
      while (i < n) {
        val entry = ifd + 2 + 12 * i
        val tag = u16(entry)
        val typ = u16(entry + 2)
        val count = u32(entry + 4)
        if (tag < 0 || typ < 0 || count < 0) return false
        tag match {
          case 0x010f if typ == 2 && !isExifIfd => make = ascii(entry, count)
          case 0x0110 if typ == 2 && !isExifIfd => model = ascii(entry, count)
          case 0x0112 if typ == 3 && !isExifIfd =>
            orientation = u16(entry + 8); sawOrientation = true
          case 0x0132 if typ == 2 && !isExifIfd => dateTime = ascii(entry, count)
          case 0x8769 if typ == 4 && !isExifIfd =>
            val sub = u32(entry + 8)
            if (sub < 8 || !walkIfd(sub, isExifIfd = true)) return false
          case 0x8827 if typ == 3 && isExifIfd => iso = u16(entry + 8)
          case 0x829a if typ == 5 && count == 1 && isExifIfd =>
            val at = base + u32(entry + 8).toInt
            if (at < base || at + 8 > end) return false
            expNum = u32(at).toInt
            expDen = u32(at + 4).toInt
          case _ => () // unknown tags: skip, per TIFF reader rules
        }
        i += 1
      }
      true
    }
    if (!walkIfd(ifd0, isExifIfd = false)) return None
    // Orientation is OPTIONAL in real-world EXIF: absent means the
    // spec default 1 (top-left). Only a PRESENT tag with a value
    // outside 1..8 is a malformed stream worth refusing.
    if (!sawOrientation) orientation = 1
    if (orientation < 1 || orientation > 8) return None
    Some(Exif(if (big) "MM" else "II", make, model, orientation, dateTime,
              iso, expNum, expDen))
  }

  // ---------------------------------------------------------------- build

  /** Serialize an [[Exif]] record as a complete APP1 segment (marker +
    * length + "Exif\0\0" + TIFF stream in the record's byte order) —
    * the fixture-side inverse of [[parse]]; specs round-trip through
    * an independent hand-check of the layout.
    */
  def buildApp1(e: Exif): Array[Byte] = {
    val big = e.byteOrder == "MM"
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit =
      if (big) { w8(v >> 8); w8(v) } else { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit =
      if (big) { w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt); w8(v.toInt) }
      else { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }

    // TIFF stream laid out as: header(8) | IFD0 | data | ExifIFD | data
    val makeB = (e.make + NulStr).getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val modelB = (e.model + NulStr).getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val dtB = (e.dateTime + NulStr).getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val ifd0Entries = 5
    val ifd0Size = 2 + 12 * ifd0Entries + 4
    var dataOff = 8L + ifd0Size // heap for IFD0's long values
    val makeOff = { val o = dataOff; dataOff += makeB.length; o }
    val modelOff = { val o = dataOff; dataOff += modelB.length; o }
    val dtOff = { val o = dataOff; dataOff += dtB.length; o }
    val exifIfdOff = dataOff
    val exifEntries = 2
    val exifIfdSize = 2 + 12 * exifEntries + 4
    val expOff = exifIfdOff + exifIfdSize

    // header
    if (big) { w8('M'); w8('M') } else { w8('I'); w8('I') }
    w16(42)
    w32(8)
    // IFD0 — entries in ascending tag order, as TIFF requires
    w16(ifd0Entries)
    def entry(tag: Int, typ: Int, count: Long)(value: => Unit): Unit = {
      w16(tag); w16(typ); w32(count)
      val before = out.size()
      value
      while (out.size() < before + 4) w8(0) // pad the 4-byte value slot
    }
    def asciiEntry(tag: Int, bytes: Array[Byte], off: Long): Unit =
      entry(tag, 2, bytes.length) {
        if (bytes.length <= 4) bytes.foreach(x => w8(x & 0xff)) else w32(off)
      }
    asciiEntry(0x010f, makeB, makeOff)
    asciiEntry(0x0110, modelB, modelOff)
    entry(0x0112, 3, 1) { w16(e.orientation) }
    asciiEntry(0x0132, dtB, dtOff)
    entry(0x8769, 4, 1) { w32(exifIfdOff) }
    w32(0) // no IFD1
    // IFD0 string heap. A ≤4-byte string was inlined in its value slot;
    // its reserved heap bytes are zero-filled so the offsets computed
    // above stay valid for the values that follow.
    def heap(bytes: Array[Byte]): Unit =
      if (bytes.length > 4) out.write(bytes)
      else { var i = 0; while (i < bytes.length) { w8(0); i += 1 } }
    heap(makeB)
    heap(modelB)
    heap(dtB)
    // Exif sub-IFD
    w16(exifEntries)
    entry(0x829a, 5, 1) { w32(expOff) }
    entry(0x8827, 3, 1) { w16(e.iso) }
    w32(0)
    w32(e.expNum)
    w32(e.expDen)

    val tiff = out.toByteArray
    val payload = Array[Byte]('E', 'x', 'i', 'f', 0, 0) ++ tiff
    val seg = new Array[Byte](4 + payload.length)
    seg(0) = 0xff.toByte
    seg(1) = 0xe1.toByte
    val len = payload.length + 2
    seg(2) = (len >> 8).toByte
    seg(3) = len.toByte
    System.arraycopy(payload, 0, seg, 4, payload.length)
    seg
  }

  /** Normalize an interleaved raster to upright per its EXIF
    * orientation (1..8): the transform every image pipeline applies
    * before resize/embedding, since a quarter of phone photos store
    * rotated sensor data. Returns (raster, w, h) — dims swap for the
    * transposed family (5-8). Orientation semantics per EXIF 2.3
    * table 6: 1 identity, 2 mirror-H, 3 rotate 180, 4 mirror-V,
    * 5 transpose, 6 rotate 90 CW, 7 transverse, 8 rotate 270 CW.
    */
  def orient(raster: Array[Byte], w: Int, h: Int, ch: Int,
             orientation: Int): Option[(Array[Byte], Int, Int)] = {
    if (orientation < 1 || orientation > 8) return None
    if (raster.length != w * h * ch) return None
    if (orientation == 1) return Some((raster, w, h))
    val swap = orientation >= 5
    val ow = if (swap) h else w
    val oh = if (swap) w else h
    val out = new Array[Byte](raster.length)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val (sx, sy) = orientation match {
          case 2 => (w - 1 - x, y)
          case 3 => (w - 1 - x, h - 1 - y)
          case 4 => (x, h - 1 - y)
          case 5 => (y, x)
          case 6 => (y, h - 1 - x)
          case 7 => (w - 1 - y, h - 1 - x)
          case _ => (w - 1 - y, x) // 8
        }
        var c = 0
        while (c < ch) {
          out((y * ow + x) * ch + c) = raster((sy * w + sx) * ch + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Some((out, ow, oh))
  }

  /** Insert an APP1 segment right after SOI — how cameras and encoders
    * place EXIF in a JPEG stream.
    */
  def spliceApp1(jpeg: Array[Byte], app1: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](jpeg.length + app1.length)
    System.arraycopy(jpeg, 0, out, 0, 2)
    System.arraycopy(app1, 0, out, 2, app1.length)
    System.arraycopy(jpeg, 2, out, 2 + app1.length, jpeg.length - 2)
    out
  }
}
