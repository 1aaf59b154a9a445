package graft.sources

import java.net.{DatagramPacket, DatagramSocket, InetAddress, SocketTimeoutException}

/** Reverse-DNS over the REAL DNS wire protocol — the twin of the
  * reference's GetReverseDNS (utils.go:74-118: build the PTR question
  * for the reverse address, try each nameserver in order, return the
  * first PTR answer with the trailing dot trimmed). Dependency-free
  * RFC 1035 encoding/decoding including name-compression pointers on
  * the parse side; queries go over UDP with a per-server timeout and
  * the reference's failover loop.
  */
object DnsPtr {

  final case class DnsConfig(
      nameservers: Seq[(String, Int)], timeoutMs: Int = 2000)

  /** "4.3.2.1.in-addr.arpa" for 1.2.3.4; nibble-reversed ip6.arpa for
    * IPv6 (dns.ReverseAddr's two forms). None on malformed input.
    */
  def reverseName(ip: String): Option[String] = {
    if (ip.contains(":")) reverseName6(ip)
    else {
      val parts = ip.split("\\.", -1)
      if (parts.length != 4) return None
      val octets = parts.map { p =>
        if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return None
        val v = p.toInt
        if (v > 255) return None
        v
      }
      Some(octets.reverse.mkString(".") + ".in-addr.arpa")
    }
  }

  private def reverseName6(ip: String): Option[String] =
    try {
      val addr = InetAddress.getByName(ip).getAddress
      if (addr.length != 16) None
      else Some(addr.reverseIterator
        .flatMap(b => Seq((b & 0xf).toHexString, ((b >> 4) & 0xf).toHexString))
        .mkString(".") + ".ip6.arpa")
    } catch { case scala.util.control.NonFatal(_) => None }

  private val TypePtr = 12
  private val ClassIn = 1

  /** RFC 1035 question packet: header with RD set, one PTR question. */
  def buildQuery(id: Int, qname: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    u16(id); u16(0x0100) // RD
    u16(1); u16(0); u16(0); u16(0)
    writeName(out, qname)
    u16(TypePtr); u16(ClassIn)
    out.toByteArray
  }

  private def writeName(out: java.io.ByteArrayOutputStream, name: String): Unit = {
    name.split("\\.").filter(_.nonEmpty).foreach { label =>
      val b = label.getBytes("US-ASCII")
      require(b.length < 64, s"label too long: $label")
      out.write(b.length)
      out.write(b, 0, b.length)
    }
    out.write(0)
  }

  /** Decode a (possibly compression-pointer-chained) name at `off`;
    * returns (dotted name without trailing dot, offset after the name
    * as laid out at `off`). None on malformed/looping input.
    */
  private[sources] def readName(b: Array[Byte], off: Int): Option[(String, Int)] = {
    val labels = Seq.newBuilder[String]
    var pos = off
    var end = -1 // offset after the name at the ORIGINAL location
    var jumps = 0
    while (true) {
      if (pos < 0 || pos >= b.length) return None
      val len = b(pos) & 0xff
      if ((len & 0xc0) == 0xc0) { // compression pointer
        if (pos + 1 >= b.length || jumps > 16) return None
        if (end < 0) end = pos + 2
        pos = ((len & 0x3f) << 8) | (b(pos + 1) & 0xff)
        jumps += 1
      } else if (len == 0) {
        return Some((labels.result().mkString("."), if (end < 0) pos + 1 else end))
      } else {
        if (len > 63 || pos + 1 + len > b.length) return None
        labels += new String(b, pos + 1, len, "US-ASCII")
        pos += 1 + len
      }
    }
    None // unreachable
  }

  /** Parse a response to `id`: checks QR + matching id + RCODE 0,
    * skips the question section, returns the first PTR answer's
    * target (trailing dot semantics handled by label join).
    */
  def parsePtrResponse(b: Array[Byte], id: Int): Option[String] = {
    if (b.length < 12) return None
    def u16(o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    if (u16(0) != id) return None
    val flags = u16(2)
    if ((flags & 0x8000) == 0) return None // not a response
    if ((flags & 0x000f) != 0) return None // RCODE: NXDOMAIN/SERVFAIL/...
    val qd = u16(4)
    val an = u16(6)
    var pos = 12
    var i = 0
    while (i < qd) { // skip questions
      val n = readName(b, pos).getOrElse(return None)
      pos = n._2 + 4 // qtype + qclass
      i += 1
    }
    i = 0
    while (i < an && pos < b.length) {
      val n = readName(b, pos).getOrElse(return None)
      pos = n._2
      if (pos + 10 > b.length) return None
      val rtype = u16(pos)
      val rdlen = u16(pos + 8)
      val rdata = pos + 10
      if (rdata + rdlen > b.length) return None
      if (rtype == TypePtr) {
        return readName(b, rdata).map(_._1).filter(_.nonEmpty)
      }
      pos = rdata + rdlen
      i += 1
    }
    None
  }

  /** The reference's lookup loop: each nameserver in order, first PTR
    * answer wins; None when every server fails, times out, or NXDOMAINs.
    */
  def lookup(ip: String, cfg: DnsConfig): Option[String] = {
    val qname = reverseName(ip).getOrElse(return None)
    val id = ((ip.hashCode & 0x7fffffff) % 0xfffe) + 1
    val query = buildQuery(id, qname)
    cfg.nameservers.foreach { case (host, port) =>
      var socket: DatagramSocket = null
      try {
        socket = new DatagramSocket()
        socket.setSoTimeout(cfg.timeoutMs)
        val addr = InetAddress.getByName(host)
        socket.send(new DatagramPacket(query, query.length, addr, port))
        val buf = new Array[Byte](4096)
        val resp = new DatagramPacket(buf, buf.length)
        socket.receive(resp)
        val parsed = parsePtrResponse(
          java.util.Arrays.copyOf(buf, resp.getLength), id)
        if (parsed.isDefined) return parsed
      } catch {
        case _: SocketTimeoutException => () // next server (reference loop)
        case scala.util.control.NonFatal(_) => ()
      } finally if (socket != null) socket.close()
    }
    None
  }
}
