package graft.sources

import scala.collection.mutable

/** MaxMind-DB fixture WRITER — the offline stand-in for shipping a real
  * GeoLite2-City.mmdb (no downloads in this environment), in the same
  * pattern as [[InMemoryImap]]: the production-side code
  * ([[graft.functions.MaxMindDb]]) speaks the real binary format, and
  * this builder exists so specs and the f_geoip_mmdb registry entry can
  * exercise it end-to-end on deterministic content. Emits a spec-true
  * v2.0 file: 24-bit search-tree records, the 16-byte data-section
  * separator, pointer-compressed strings (every repeated string after
  * its first occurrence is written as a pointer, so the reader's
  * pointer path is always on the wire), and the metadata map behind the
  * \xAB\xCD\xEFMaxMind.com marker.
  */
object MmdbFixture {

  final case class CityRecord(
      country: String, city: String,
      isAnonymousProxy: Boolean = false, isSatelliteProvider: Boolean = false)

  // --------------------------------------------------- data encoding

  /** `intern = false` for the metadata section, where pointers are
    * illegal — the data section interns every repeated string as a
    * pointer so the reader's pointer path is always exercised.
    */
  private final class DataWriter(intern: Boolean = true) {
    val out = new java.io.ByteArrayOutputStream()
    private val strings = mutable.Map.empty[String, Int] // string → offset

    private def ctrl(t: Int, size: Int): Unit = {
      require(size < 29 + 256, s"fixture values stay small, got size $size")
      val low5 = if (size < 29) size else 29
      if (t <= 7) out.write((t << 5) | low5)
      else { out.write(low5); out.write(t - 7) }
      if (size >= 29) out.write(size - 29)
    }

    def string(s: String): Unit = strings.get(s) match {
      case Some(off) if intern => pointer(off)
      case _ =>
        if (intern) strings(s) = out.size()
        val b = s.getBytes("UTF-8")
        ctrl(2, b.length)
        out.write(b, 0, b.length)
    }

    /** Pointer to a data-section offset, smallest encoding that fits. */
    private def pointer(off: Int): Unit = {
      if (off < (1 << 11)) {
        out.write((1 << 5) | (0 << 3) | (off >> 8)); out.write(off & 0xff)
      } else if (off - 2048 < (1 << 19)) {
        val v = off - 2048
        out.write((1 << 5) | (1 << 3) | (v >> 16))
        out.write((v >> 8) & 0xff); out.write(v & 0xff)
      } else {
        val v = off - 526336
        out.write((1 << 5) | (2 << 3) | (v >> 24))
        out.write((v >> 16) & 0xff); out.write((v >> 8) & 0xff); out.write(v & 0xff)
      }
    }

    def uint(t: Int, v: Long): Unit = {
      var n = 0
      var x = v
      while (x != 0) { n += 1; x >>>= 8 }
      ctrl(t, n)
      var i = n - 1
      while (i >= 0) { out.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
    }

    def bool(v: Boolean): Unit = ctrl(14, if (v) 1 else 0)

    def map(n: Int): Unit = ctrl(7, n)
    def array(n: Int): Unit = ctrl(11, n)

    /** A City-shaped record at the current offset; returns the offset. */
    def cityRecord(r: CityRecord): Int = {
      val off = out.size()
      map(3)
      string("country"); map(2)
      string("iso_code"); string(r.country)
      string("names"); map(1); string("en"); string(r.country)
      string("city"); map(1)
      string("names"); map(1); string("en"); string(r.city)
      string("traits"); map(2)
      string("is_anonymous_proxy"); bool(r.isAnonymousProxy)
      string("is_satellite_provider"); bool(r.isSatelliteProvider)
      off
    }
  }

  // ----------------------------------------------------- tree build

  private final class Node {
    var left: Either[Node, Int] = null  // null = empty record
    var right: Either[Node, Int] = null // Right(dataOffset) = leaf
  }

  /** Build a spec-true .mmdb from /8 networks (first octet → record) —
    * the same keying as GeoEnrichment.Fixture. Records are deduped by
    * content: two octets sharing a record share one data offset.
    */
  def build(entries: Seq[(Int, CityRecord)], ipVersion: Int = 4): Array[Byte] = {
    require(ipVersion == 4 || ipVersion == 6, s"ip_version $ipVersion")
    val dw = new DataWriter
    val recOffset = mutable.Map.empty[CityRecord, Int]
    val root = new Node
    var nodes = Vector(root)
    entries.foreach { case (octet, rec) =>
      require(octet >= 0 && octet <= 255, s"octet $octet")
      val off = recOffset.getOrElseUpdate(rec, dw.cityRecord(rec))
      var cur = root
      for (i <- 7 to 1 by -1) {
        val bit = (octet >> i) & 1
        val next = (if (bit == 0) cur.left else cur.right) match {
          case Left(n) => n
          case Right(_) => throw new IllegalArgumentException("overlapping /8")
          case null =>
            val n = new Node
            nodes :+= n
            if (bit == 0) cur.left = Left(n) else cur.right = Left(n)
            n
        }
        cur = next
      }
      if ((octet & 1) == 0) cur.left = Right(off) else cur.right = Right(off)
    }

    // an ip_version=6 tree (what every real GeoLite2 file ships) keys
    // IPv4 under ::/96: 96 zero-bit chain nodes precede the octet tree,
    // exercising MaxMindDb's IPv4-mapped walk against real layout
    if (ipVersion == 6) {
      val chain = Vector.fill(96)(new Node)
      chain.sliding(2).foreach {
        case Seq(a, b2) => a.left = Left(b2)
        case _ => ()
      }
      chain.last.left = Left(root)
      nodes = chain ++ nodes
    }
    val nodeCount = nodes.size
    val index = nodes.zipWithIndex.toMap
    val tree = new java.io.ByteArrayOutputStream()
    def rec24(v: Int): Unit = {
      tree.write((v >> 16) & 0xff); tree.write((v >> 8) & 0xff); tree.write(v & 0xff)
    }
    nodes.foreach { n =>
      Seq(n.left, n.right).foreach {
        case null => rec24(nodeCount) // empty record: not found
        case Left(child) => rec24(index(child))
        // record value = data offset + node_count + 16 (the separator)
        case Right(off) => rec24(off + nodeCount + 16)
      }
    }

    val meta = new DataWriter(intern = false)
    meta.map(9)
    meta.string("binary_format_major_version"); meta.uint(5, 2)
    meta.string("binary_format_minor_version"); meta.uint(5, 0)
    meta.string("build_epoch"); meta.uint(9, 1700000000L)
    meta.string("database_type"); meta.string("GeoLite2-City")
    meta.string("description"); meta.map(1)
    meta.string("en"); meta.string("graft deterministic geo fixture")
    meta.string("ip_version"); meta.uint(5, ipVersion.toLong)
    meta.string("languages"); meta.array(1); meta.string("en")
    meta.string("node_count"); meta.uint(6, nodeCount.toLong)
    meta.string("record_size"); meta.uint(5, 24)

    val out = new java.io.ByteArrayOutputStream()
    tree.writeTo(out)
    out.write(new Array[Byte](16)) // data section separator
    dw.out.writeTo(out)
    out.write(Array(0xab.toByte, 0xcd.toByte, 0xef.toByte), 0, 3)
    out.write("MaxMind.com".getBytes("US-ASCII"))
    meta.out.writeTo(out)
    out.toByteArray
  }

  /** The .mmdb twin of GeoEnrichment.Fixture: one /8 per fixture row,
    * city synthesized deterministically from the rDNS zone.
    */
  def fromGeoFixture(): Array[Byte] =
    build(graft.functions.GeoEnrichment.Fixture.map { case (octet, country, zone) =>
      octet -> CityRecord(country, s"$country-${zone.split("\\.")(0)}")
    })
}
