package graft.functions

/** Dependency-free reader for the MaxMind DB binary format ("MMDB",
  * the public spec behind the .mmdb files the reference opens through
  * geoip2 — utils.go:42 `geoip2.Open(dbPath)` + `db.City(ip)`):
  * metadata section located from the end marker, binary search tree
  * walked bit-by-bit over the IP, and the data section's typed,
  * pointer-compressed records decoded to plain Scala values.
  *
  * [[lookupCity]] mirrors the exact field path the reference reads
  * (utils.go:58-68): country.names.en, city.names.en,
  * traits.is_anonymous_proxy / is_satellite_provider. Totality: a
  * malformed database fails at [[MaxMindDb.open]] or yields None per
  * lookup — never a throw (MaxMindDbSpec sweeps truncations).
  */
final class MaxMindDb private (
    b: Array[Byte], nodeCount: Int, recordBits: Int, val ipVersion: Int) {

  private val treeSize = nodeCount.toLong * recordBits * 2 / 8
  private val dataStart = treeSize + 16 // 16-byte zero separator

  // ------------------------------------------------------ tree walk

  /** Record `side` (0=left, 1=right) of `node`. -1 on corruption. */
  private def record(node: Int, side: Int): Int = {
    val base = node.toLong * recordBits * 2 / 8
    recordBits match {
      case 24 =>
        val o = (base + side * 3).toInt
        if (o + 3 > treeSize) return -1
        ((b(o) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o + 2) & 0xff)
      case 28 =>
        val o = base.toInt
        if (o + 7 > treeSize) return -1
        if (side == 0)
          (((b(o + 3) & 0xf0) >> 4) << 24) | ((b(o) & 0xff) << 16) |
            ((b(o + 1) & 0xff) << 8) | (b(o + 2) & 0xff)
        else
          ((b(o + 3) & 0x0f) << 24) | ((b(o + 4) & 0xff) << 16) |
            ((b(o + 5) & 0xff) << 8) | (b(o + 6) & 0xff)
      case 32 =>
        val o = (base + side * 4).toInt
        if (o + 4 > treeSize) return -1
        ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
          ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
      case _ => -1
    }
  }

  /** Walk the search tree over the address bits; Some(dataValue) on a
    * data record, None on not-found or corruption.
    */
  def lookupRaw(ip: String): Option[Any] = {
    val v4 = MaxMindDb.ipv4Bits(ip).getOrElse(return None)
    // an ip_version=6 tree (every real GeoLite2 file) stores IPv4 under
    // the ::/96 prefix — walk 96 zero bits before the 32 address bits,
    // or the search lands mid-tree and silently resolves nothing
    val bits =
      if (ipVersion == 6) Array.fill[Int](96)(0) ++ v4
      else v4
    var node = 0
    var i = 0
    while (i < bits.length) {
      if (node >= nodeCount) return None
      val r = record(node, bits(i))
      if (r < 0) return None
      if (r == nodeCount) return None // empty record: no data
      if (r > nodeCount) {
        // value - node_count - 16 = offset into the data section
        val off = dataStart + (r.toLong - nodeCount - 16)
        return decode(off, 0).map(_._1)
      }
      node = r
      i += 1
    }
    None
  }

  /** The reference's City() read path (utils.go:58-68). */
  def lookupCity(ip: String): Option[MaxMindDb.GeoResult] =
    lookupRaw(ip).collect { case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      def names(section: String): String = mm.get(section) match {
        case Some(s: Map[_, _]) =>
          s.asInstanceOf[Map[String, Any]].get("names") match {
            case Some(n: Map[_, _]) =>
              n.asInstanceOf[Map[String, Any]].getOrElse("en", "").toString
            case _ => ""
          }
        case _ => ""
      }
      val traits = mm.get("traits") match {
        case Some(t: Map[_, _]) => t.asInstanceOf[Map[String, Any]]
        case _ => Map.empty[String, Any]
      }
      def flag(k: String): Boolean = traits.get(k) match {
        case Some(v: Boolean) => v
        case _ => false
      }
      MaxMindDb.GeoResult(names("country"), names("city"),
        flag("is_anonymous_proxy"), flag("is_satellite_provider"))
    }

  // --------------------------------------------------- data decoding

  private def u8(o: Long): Int = b(o.toInt) & 0xff

  /** Decode one value at absolute offset `off`; returns (value, next
    * offset). None on corruption. Pointer chains are bounded.
    */
  private def decode(off: Long, depth: Int): Option[(Any, Long)] = {
    if (depth > 16 || off < dataStart || off >= b.length) return None
    val ctrl = u8(off)
    var t = ctrl >> 5
    var p = off + 1
    if (t == 1) { // pointer: bits 3-4 size, bits 0-2 value prefix
      val ss = (ctrl >> 3) & 0x3
      val prefix = ctrl & 0x7
      if (p + ss + 1 > b.length) return None
      val target = ss match {
        case 0 => (prefix << 8) | u8(p)
        case 1 => (((prefix << 16) | (u8(p) << 8) | u8(p + 1)) + 2048)
        case 2 => (((prefix << 24) | (u8(p) << 16) | (u8(p + 1) << 8) | u8(p + 2)) + 526336)
        case _ => (u8(p) << 24) | (u8(p + 1) << 16) | (u8(p + 2) << 8) | u8(p + 3)
      }
      val next = p + ss + 1
      return decode(dataStart + target, depth + 1).map { case (v, _) => (v, next) }
    }
    if (t == 0) { t = 7 + u8(p); p += 1 } // extended type
    var size = ctrl & 0x1f
    if (size == 29) { size = 29 + u8(p); p += 1 }
    else if (size == 30) { size = 285 + (u8(p) << 8) + u8(p + 1); p += 2 }
    else if (size == 31) { size = 65821 + (u8(p) << 16) + (u8(p + 1) << 8) + u8(p + 2); p += 3 }
    def fits(n: Long): Boolean = p + n <= b.length
    t match {
      case 2 => // utf8 string
        if (!fits(size)) None
        else Some((new String(b, p.toInt, size, "UTF-8"), p + size))
      case 3 => // double
        if (size != 8 || !fits(8)) None
        else {
          var bits = 0L
          (0 until 8).foreach(i => bits = (bits << 8) | u8(p + i))
          Some((java.lang.Double.longBitsToDouble(bits), p + 8))
        }
      case 4 => // raw bytes
        if (!fits(size)) None
        else Some((java.util.Arrays.copyOfRange(b, p.toInt, (p + size).toInt), p + size))
      case 5 | 6 | 9 => // uint16 / uint32 / uint64 (big-endian, minimal bytes)
        if (size > 8 || !fits(size)) None
        else {
          var v = 0L
          (0 until size).foreach(i => v = (v << 8) | u8(p + i))
          Some((v, p + size))
        }
      case 8 => // int32
        if (size > 4 || !fits(size)) None
        else {
          var v = 0
          (0 until size).foreach(i => v = (v << 8) | u8(p + i))
          Some((v, p + size))
        }
      case 10 => // uint128
        if (size > 16 || !fits(size)) None
        else Some((BigInt(1, java.util.Arrays.copyOfRange(b, p.toInt, (p + size).toInt)), p + size))
      case 7 => // map: size = number of key/value pairs
        var cur = p
        val m = Map.newBuilder[String, Any]
        var i = 0
        while (i < size) {
          val k = decode(cur, depth + 1).getOrElse(return None)
          if (!k._1.isInstanceOf[String]) return None
          val v = decode(k._2, depth + 1).getOrElse(return None)
          m += (k._1.asInstanceOf[String] -> v._1)
          cur = v._2
          i += 1
        }
        Some((m.result(), cur))
      case 11 => // array
        var cur = p
        val a = Seq.newBuilder[Any]
        var i = 0
        while (i < size) {
          val v = decode(cur, depth + 1).getOrElse(return None)
          a += v._1
          cur = v._2
          i += 1
        }
        Some((a.result(), cur))
      case 14 => Some((size == 1, p)) // boolean: size IS the value
      case 15 => // float
        if (size != 4 || !fits(4)) None
        else {
          var bits = 0
          (0 until 4).foreach(i => bits = (bits << 8) | u8(p + i))
          Some((java.lang.Float.intBitsToFloat(bits), p + 4))
        }
      case _ => None
    }
  }
}

object MaxMindDb {

  final case class GeoResult(
      country: String, city: String,
      isAnonymousProxy: Boolean, isSatelliteProvider: Boolean)

  private val Marker: Array[Byte] =
    Array(0xab.toByte, 0xcd.toByte, 0xef.toByte) ++ "MaxMind.com".getBytes("US-ASCII")

  /** Parse the metadata section and build a reader. Left(reason) on a
    * malformed database — callers choose to fail loudly or degrade.
    */
  def open(bytes: Array[Byte]): Either[String, MaxMindDb] = {
    try {
      val mi = lastIndexOf(bytes, Marker)
      if (mi < 0) return Left("no MaxMind.com metadata marker")
      val parsed = metaDecode(bytes, mi + Marker.length)
        .getOrElse(return Left("undecodable metadata map"))
      def uint(k: String): Option[Long] = parsed.get(k).collect { case v: Long => v }
      val nodeCount = uint("node_count").getOrElse(return Left("missing node_count"))
      val recordSize = uint("record_size").getOrElse(return Left("missing record_size"))
      val ipVersion = uint("ip_version").getOrElse(4L)
      if (!Set(24L, 28L, 32L).contains(recordSize))
        return Left(s"unsupported record_size $recordSize")
      if (nodeCount <= 0 || nodeCount > Int.MaxValue / 8)
        return Left(s"implausible node_count $nodeCount")
      val treeSize = nodeCount * recordSize * 2 / 8
      if (treeSize + 16 > bytes.length) return Left("tree exceeds file")
      Right(new MaxMindDb(bytes, nodeCount.toInt, recordSize.toInt, ipVersion.toInt))
    } catch { case scala.util.control.NonFatal(e) => Left(e.toString) }
  }

  /** Standalone metadata decoder (same grammar, no data-section base). */
  private def metaDecode(b: Array[Byte], start: Int): Option[Map[String, Any]] = {
    // reuse the instance decoder by faking a reader whose dataStart is 0
    // is unsafe (pointer math); metadata holds no pointers, so a tiny
    // local decoder suffices
    var pos = start.toLong
    def u8(o: Long): Int = b(o.toInt) & 0xff
    def one(): Option[Any] = {
      if (pos >= b.length) return None
      val ctrl = u8(pos); pos += 1
      var t = ctrl >> 5
      if (t == 1) return None // pointers are not legal in metadata
      if (t == 0) { t = 7 + u8(pos); pos += 1 }
      var size = ctrl & 0x1f
      if (size == 29) { size = 29 + u8(pos); pos += 1 }
      else if (size == 30) { size = 285 + (u8(pos) << 8) + u8(pos + 1); pos += 2 }
      else if (size == 31) { size = 65821 + (u8(pos) << 16) + (u8(pos + 1) << 8) + u8(pos + 2); pos += 3 }
      t match {
        case 2 =>
          if (pos + size > b.length) None
          else { val s = new String(b, pos.toInt, size, "UTF-8"); pos += size; Some(s) }
        case 5 | 6 | 9 =>
          if (size > 8 || pos + size > b.length) None
          else { var v = 0L; (0 until size).foreach(i => v = (v << 8) | u8(pos + i)); pos += size; Some(v) }
        case 7 =>
          val m = Map.newBuilder[String, Any]
          var i = 0
          while (i < size) {
            val k = one().getOrElse(return None)
            if (!k.isInstanceOf[String]) return None
            val v = one().getOrElse(return None)
            m += (k.asInstanceOf[String] -> v)
            i += 1
          }
          Some(m.result())
        case 11 =>
          val a = Seq.newBuilder[Any]
          var i = 0
          while (i < size) { a += one().getOrElse(return None); i += 1 }
          Some(a.result())
        case 14 => Some(size == 1)
        case _ => None
      }
    }
    one().collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }
  }

  private def lastIndexOf(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = hay.length - needle.length
    while (i >= 0) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i -= 1
    }
    -1
  }

  /** IPv4 dotted quad → 32 MSB-first bits; None on malformed input. */
  private[functions] def ipv4Bits(ip: String): Option[Array[Int]] = {
    val parts = ip.split("\\.", -1)
    if (parts.length != 4) return None
    val octets = new Array[Int](4)
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return None
      val v = p.toInt
      if (v > 255) return None
      octets(i) = v
      i += 1
    }
    Some(Array.tabulate(32)(k => (octets(k / 8) >> (7 - k % 8)) & 1))
  }
}
