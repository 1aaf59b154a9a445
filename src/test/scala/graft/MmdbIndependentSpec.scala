package graft

import graft.functions.MaxMindDb
import org.scalatest.funsuite.AnyFunSuite

/** A SECOND MaxMind-DB encoder, written in this spec from the public
  * format spec (maxmind.github.io/MaxMind-DB, v2.0) with the OPPOSITE
  * structural choices to the production-side fixture writer
  * ([[graft.sources.MmdbFixture]]): 28-bit search-tree records (what
  * real GeoLite2 files use; the fixture emits 24-bit) plus a 32-bit
  * variant, ip_version=6 with IPv4 under ::/96, location doubles /
  * uint32 geoname_id / uint16 metro_code in the records (the fixture
  * emits only strings+bools), a >2 KiB string exercising the two-byte
  * size class, and an ss=1 (19-bit, +2048 bias) pointer — the classes
  * a tiny interned file never reaches.
  *
  * Purpose: the reader was previously exercised only against bytes the
  * repo's own writer produced — a self-consistent encode/decode pair
  * can agree on a wrong reading of the spec. This file's bytes are
  * authored independently (offline stand-in for vendoring MaxMind's
  * published test corpus, which zero egress prevents).
  */
class MmdbIndependentSpec extends AnyFunSuite {

  // ---- independent data-section encoder (no interning, explicit) ----

  private final class Enc {
    val out = new java.io.ByteArrayOutputStream()
    def off: Int = out.size()
    def ctrl(t: Int, size: Int): Unit = {
      require(t >= 1 && t <= 15)
      val low5 =
        if (size < 29) size
        else if (size < 285) 29
        else { require(size < 65821); 30 }
      if (t <= 7) out.write((t << 5) | low5) else { out.write(low5); out.write(t - 7) }
      if (low5 == 29) out.write(size - 29)
      else if (low5 == 30) { out.write((size - 285) >> 8); out.write((size - 285) & 0xff) }
    }
    def str(s: String): Unit = {
      val b = s.getBytes("UTF-8"); ctrl(2, b.length); out.write(b, 0, b.length)
    }
    def dbl(v: Double): Unit = {
      ctrl(3, 8)
      val bits = java.lang.Double.doubleToLongBits(v)
      (7 to 0 by -1).foreach(i => out.write(((bits >> (8 * i)) & 0xff).toInt))
    }
    def uint(t: Int, v: Long): Unit = {
      var n = 0; var x = v
      while (x != 0) { n += 1; x >>>= 8 }
      ctrl(t, n)
      (n - 1 to 0 by -1).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    }
    def bool(v: Boolean): Unit = ctrl(14, if (v) 1 else 0)
    def map(n: Int): Unit = ctrl(7, n)
    /** ss=1 pointer: 19-bit value biased by 2048 — a size class the
      * production fixture's small interned files never emit.
      */
    def pointer2048(target: Int): Unit = {
      require(target >= 2048)
      val v = target - 2048
      require(v < (1 << 19))
      out.write((1 << 5) | (1 << 3) | (v >> 16))
      out.write((v >> 8) & 0xff); out.write(v & 0xff)
    }
  }

  /** The authored database: two /8 networks under ::/96 with
    * GeoLite2-City-shaped records, at the given record size.
    */
  private def authored(recordSize: Int): Array[Byte] = {
    val d = new Enc
    // 2.2 KiB filler string FIRST, so later offsets exceed the ss=0
    // pointer range and the two-byte (low5=30) size class is on the wire
    d.str("x" * 2200)
    // record for 1.0.0.0/8 — full GeoLite2 City shape
    val recA = d.off
    assert(recA >= 2048)
    d.map(5)
    d.str("country"); d.map(3)
    d.str("geoname_id"); d.uint(6, 2077456L) // uint32
    d.str("iso_code"); d.str("UT")
    d.str("names"); d.map(1); d.str("en")
    val utopiaOff = d.off
    d.str("Utopia")
    d.str("city"); d.map(2)
    d.str("geoname_id"); d.uint(6, 49518L)
    d.str("names"); d.map(1); d.str("en"); d.str("Utopia City")
    d.str("location"); d.map(3)
    d.str("latitude"); d.dbl(-33.8678)
    d.str("longitude"); d.dbl(151.2073)
    d.str("metro_code"); d.uint(5, 633L) // uint16
    d.str("postal"); d.map(1); d.str("code"); d.str("4000")
    d.str("traits"); d.map(2)
    d.str("is_anonymous_proxy"); d.bool(false)
    d.str("is_satellite_provider"); d.bool(true)
    // record for 9.0.0.0/8 — its country name is an ss=1 POINTER to
    // the "Utopia" string inside record A
    val recB = d.off
    d.map(2)
    d.str("country"); d.map(1)
    d.str("names"); d.map(1); d.str("en"); d.pointer2048(utopiaOff)
    d.str("traits"); d.map(1)
    d.str("is_anonymous_proxy"); d.bool(true)

    // ---- search tree: ::/96 spine, then first-octet bits ----
    // networks: 1.0.0.0/8 (octet 00000001) -> recA, 9.0.0.0/8
    // (00001001) -> recB. Depth-104 paths share the 96-bit zero spine
    // and the first 4 octet bits (0000); they split at bit 101 (the
    // octet's bit 3). Node layout (node i's non-spine child = i+1):
    //   nodes 0..99: chain on the 0-side (96 spine zeros + octet 0000)
    //   node 100: 0 -> 101 (octet bit3=0 ... toward 1.x), 1 -> 102
    //   nodes 101,103,104: finish 001 for octet 1 -> leaf recA
    //   nodes 102,105,106: finish 001 for octet 9 -> leaf recB
    final case class N(var left: Long = -1L, var right: Long = -1L)
    val nodes = scala.collection.mutable.ArrayBuffer.fill(107)(N())
    val EMPTY = -1L // encoded as node_count (no data)
    def leaf(dataOff: Int, nodeCount: Int): Long = dataOff.toLong + nodeCount + 16
    for (i <- 0 until 100) nodes(i).left = (i + 1).toLong // spine + 0000
    nodes(100).left = 101L; nodes(100).right = 102L
    // octet 1 = 0000 0001: after shared 00000, remaining bits 001
    nodes(101).left = 103L
    nodes(103).left = 104L
    // octet 9 = 0000 1001: node 100's right consumed bit3=1; remaining 001
    nodes(102).left = 105L
    nodes(105).left = 106L
    val nodeCount = nodes.length
    nodes(104).right = leaf(recA, nodeCount)
    nodes(106).right = leaf(recB, nodeCount)

    val tree = new java.io.ByteArrayOutputStream()
    def rec(v: Long): Int = (if (v == EMPTY) nodeCount.toLong else v).toInt
    recordSize match {
      case 28 =>
        nodes.foreach { n =>
          val l = rec(n.left); val r = rec(n.right)
          tree.write((l >> 16) & 0xff); tree.write((l >> 8) & 0xff); tree.write(l & 0xff)
          tree.write((((l >> 24) & 0xf) << 4) | ((r >> 24) & 0xf))
          tree.write((r >> 16) & 0xff); tree.write((r >> 8) & 0xff); tree.write(r & 0xff)
        }
      case 32 =>
        nodes.foreach { n =>
          for (v <- Seq(rec(n.left), rec(n.right)))
            for (i <- 3 to 0 by -1) tree.write((v >> (8 * i)) & 0xff)
        }
      case other => fail(s"unsupported test record size $other")
    }

    // ---- metadata (realistic GeoLite2 field set) ----
    val m = new Enc
    m.map(9)
    m.str("binary_format_major_version"); m.uint(5, 2L)
    m.str("binary_format_minor_version"); m.ctrl(5, 0) // zero = empty uint
    m.str("build_epoch"); m.uint(9, 1712000000L) // uint64
    m.str("database_type"); m.str("GeoLite2-City")
    m.str("description"); m.map(1)
    m.str("en"); m.str("Independently authored spec fixture")
    m.str("ip_version"); m.uint(5, 6L)
    m.str("languages"); m.ctrl(11, 1); m.str("en")
    m.str("node_count"); m.uint(6, nodeCount.toLong)
    m.str("record_size"); m.uint(5, recordSize.toLong)

    val out = new java.io.ByteArrayOutputStream()
    out.write(tree.toByteArray)
    out.write(new Array[Byte](16)) // data-section separator
    out.write(d.out.toByteArray)
    out.write(Array(0xab.toByte, 0xcd.toByte, 0xef.toByte))
    out.write("MaxMind.com".getBytes("US-ASCII"))
    out.write(m.out.toByteArray)
    out.toByteArray
  }

  private def checkDb(bytes: Array[Byte]): Unit = {
    val db = MaxMindDb.open(bytes).fold(m => fail(s"did not open: $m"), identity)
    assert(db.ipVersion == 6)
    // the City() read path the reference takes
    val a = db.lookupCity("1.22.33.44").getOrElse(fail("1.0.0.0/8 missed"))
    // the City() path reads country.names.en (not iso_code), like the
    // reference's utils.go:58-68
    assert(a.country == "Utopia" && a.city == "Utopia City")
    assert(!a.isAnonymousProxy && a.isSatelliteProvider)
    // record B's country name arrives through the ss=1 pointer
    val raw = db.lookupRaw("9.1.2.3").getOrElse(fail("9.0.0.0/8 missed"))
      .asInstanceOf[Map[String, Any]]
    val bCountry = raw("country").asInstanceOf[Map[String, Any]]("names")
      .asInstanceOf[Map[String, Any]]("en")
    assert(bCountry == "Utopia", s"pointer-reached name was $bCountry")
    assert(db.lookupCity("9.1.2.3").get.isAnonymousProxy)
    // full-record field fidelity: doubles, uint32, uint16
    val rawA = db.lookupRaw("1.0.0.1").get.asInstanceOf[Map[String, Any]]
    val loc = rawA("location").asInstanceOf[Map[String, Any]]
    assert(loc("latitude") == -33.8678 && loc("longitude") == 151.2073)
    assert(loc("metro_code") == 633L)
    assert(rawA("country").asInstanceOf[Map[String, Any]]("geoname_id") == 2077456L)
    assert(rawA("postal").asInstanceOf[Map[String, Any]]("code") == "4000")
    // uncovered space misses cleanly: sibling octets and the gap between
    for (ip <- Seq("0.0.0.1", "2.0.0.1", "8.255.255.255", "10.0.0.0", "255.1.2.3"))
      assert(db.lookupCity(ip).isEmpty, ip)
  }

  test("28-bit records (the real GeoLite2 width): independent bytes decode correctly") {
    checkDb(authored(28))
  }

  test("32-bit records: independent bytes decode correctly") {
    checkDb(authored(32))
  }

  test("the authored file is immune to the fixture writer's choices: no 24-bit, no interning") {
    val bytes = authored(28)
    // node_count * 28 * 2 / 8 bytes of tree, then the 16-byte separator
    assert(bytes.slice(107 * 7, 107 * 7 + 16).forall(_ == 0))
    // repeated key strings appear MORE than once (no interning): the
    // reader's inline-string path, not the pointer path, carried them
    val needle = "names".getBytes("UTF-8")
    val occurrences = (0 to bytes.length - needle.length)
      .count(i => needle.indices.forall(j => bytes(i + j) == needle(j)))
    assert(occurrences >= 3, s"expected uninterned repeats, got $occurrences")
  }

  test("totality on the independent bytes: truncations and bit flips never throw") {
    val bytes = authored(28)
    for (len <- 0 until bytes.length by 13) {
      MaxMindDb.open(java.util.Arrays.copyOf(bytes, len)) match {
        case Right(d) => d.lookupCity("1.2.3.4"); d.lookupCity("9.9.9.9")
        case Left(_) => ()
      }
    }
    val rnd = new scala.util.Random(11)
    (0 until 300).foreach { _ =>
      val m = bytes.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      MaxMindDb.open(m).foreach { d => d.lookupCity("1.2.3.4"); d.lookupCity("9.1.2.3") }
    }
  }
}
