package graft.sources

import java.net.{DatagramPacket, DatagramSocket, InetAddress}

/** In-process UDP DNS server answering PTR queries — the [[InMemoryImap]]
  * of the rDNS path: real RFC 1035 bytes on the wire so
  * [[DnsPtr.lookup]] is exercised protocol-true with no network. The
  * answer's NAME field is a compression pointer back to the question
  * (0xC00C, the shape every real resolver emits), so the client's
  * pointer-decoding path is always live.
  *
  * `resolve`: reverse name (e.g. "4.3.2.1.in-addr.arpa") → hostname;
  * None → NXDOMAIN. `mode` simulates broken servers for failover
  * tests: Silent (drop queries), ServFail (RCODE 2).
  */
final class InMemoryDns(
    resolve: String => Option[String],
    mode: InMemoryDns.Mode = InMemoryDns.Answer) extends AutoCloseable {

  private val socket = new DatagramSocket(0, InetAddress.getByName("127.0.0.1"))
  val port: Int = socket.getLocalPort
  @volatile private var running = true

  private val thread = new Thread(() => {
    val buf = new Array[Byte](4096)
    while (running) {
      try {
        val pkt = new DatagramPacket(buf, buf.length)
        socket.receive(pkt)
        if (mode != InMemoryDns.Silent) {
          val req = java.util.Arrays.copyOf(buf, pkt.getLength)
          answer(req).foreach { resp =>
            socket.send(new DatagramPacket(resp, resp.length,
              pkt.getAddress, pkt.getPort))
          }
        }
      } catch {
        case _: java.net.SocketException if !running => () // closed
        case scala.util.control.NonFatal(_) => ()
      }
    }
  }, s"in-memory-dns-$port")
  thread.setDaemon(true)
  thread.start()

  private def answer(req: Array[Byte]): Option[Array[Byte]] = {
    if (req.length < 12) return None
    val id = ((req(0) & 0xff) << 8) | (req(1) & 0xff)
    val (qname, qend) = DnsPtr.readName(req, 12).getOrElse(return None)
    if (qend + 4 > req.length) return None
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    val host = if (mode == InMemoryDns.ServFail) None else resolve(qname)
    val rcode = mode match {
      case InMemoryDns.ServFail => 2
      case _ if host.isEmpty => 3 // NXDOMAIN
      case _ => 0
    }
    u16(id)
    u16(0x8180 | rcode) // QR + RD + RA
    u16(1); u16(if (host.isDefined) 1 else 0); u16(0); u16(0)
    // echo the question bytes verbatim
    out.write(req, 12, qend + 4 - 12)
    host.foreach { h =>
      u16(0xc00c) // NAME: compression pointer to the question at offset 12
      u16(12); u16(1) // TYPE PTR, CLASS IN
      out.write(Array[Byte](0, 0, 1, 44), 0, 4) // TTL 300
      val name = new java.io.ByteArrayOutputStream()
      h.split("\\.").filter(_.nonEmpty).foreach { label =>
        val b = label.getBytes("US-ASCII")
        name.write(b.length); name.write(b, 0, b.length)
      }
      name.write(0)
      u16(name.size())
      name.writeTo(out)
    }
    Some(out.toByteArray)
  }

  override def close(): Unit = {
    running = false
    socket.close()
  }
}

object InMemoryDns {
  sealed trait Mode
  case object Answer extends Mode
  case object Silent extends Mode
  case object ServFail extends Mode

  /** The deterministic synthetic PTR zone shared with
    * [[graft.functions.GeoEnrichment]]: reverse name → the same
    * `host-a-b-c-d.<zone>` hostnames the broadcast-join enrichment
    * synthesizes, NXDOMAIN for first octets outside the fixture — so
    * wire-protocol rDNS and the join path are checkable against each
    * other and against one DuckDB formula.
    */
  def fixtureZone(qname: String): Option[String] = {
    val suffix = ".in-addr.arpa"
    if (!qname.endsWith(suffix)) return None
    val rev = qname.dropRight(suffix.length).split("\\.", -1)
    if (rev.length != 4 || rev.exists(p => p.isEmpty || !p.forall(_.isDigit))) return None
    val octets = rev.reverse.map(_.toInt)
    if (octets.exists(_ > 255)) return None
    graft.functions.GeoEnrichment.Fixture
      .collectFirst { case (o, _, zone) if o == octets(0) =>
        s"host-${octets.mkString("-")}.$zone"
      }
  }
}
