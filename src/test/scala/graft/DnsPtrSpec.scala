package graft

import graft.functions.GeoEnrichment
import graft.sources.{DnsPtr, InMemoryDns}
import org.scalatest.funsuite.AnyFunSuite

/** DNS PTR lookups over real RFC 1035 datagrams against the in-process
  * UDP server: reverse-name construction (both arpa forms), the
  * reference's nameserver failover loop, compression-pointer decoding
  * (every server answer carries one), NXDOMAIN/SERVFAIL/timeout
  * handling, and hand-built response bytes for the parser edges.
  */
class DnsPtrSpec extends AnyFunSuite {

  private def withServer[A](
      zone: String => Option[String],
      mode: InMemoryDns.Mode = InMemoryDns.Answer)(f: Int => A): A = {
    val s = new InMemoryDns(zone, mode)
    try f(s.port) finally s.close()
  }

  test("reverse names match dns.ReverseAddr's two forms") {
    assert(DnsPtr.reverseName("1.2.3.4").contains("4.3.2.1.in-addr.arpa"))
    assert(DnsPtr.reverseName("100.24.188.149").contains("149.188.24.100.in-addr.arpa"))
    assert(DnsPtr.reverseName("::1").contains(
      "1.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.ip6.arpa"))
    Seq("", "1.2.3", "256.1.1.1", "a.b.c.d").foreach(ip =>
      assert(DnsPtr.reverseName(ip).isEmpty, ip))
  }

  test("PTR round trip over the wire, fixture zone, trailing dot trimmed") {
    withServer(InMemoryDns.fixtureZone) { port =>
      val cfg = DnsPtr.DnsConfig(Seq(("127.0.0.1", port)))
      assert(DnsPtr.lookup("12.20.121.1", cfg)
        .contains("host-12-20-121-1.mail.telecom-us.com"))
      assert(DnsPtr.lookup("109.203.100.17", cfg)
        .contains("host-109-203-100-17.smtp.telecom-gb.co.uk"))
      // unmatched first octet → NXDOMAIN → None (reference returns error)
      assert(DnsPtr.lookup("234.1.2.3", cfg).isEmpty)
      assert(DnsPtr.lookup("not-an-ip", cfg).isEmpty)
    }
  }

  test("nameserver failover: silent then servfail then healthy (reference loop order)") {
    withServer(InMemoryDns.fixtureZone, InMemoryDns.Silent) { deadPort =>
      withServer(InMemoryDns.fixtureZone, InMemoryDns.ServFail) { sickPort =>
        withServer(InMemoryDns.fixtureZone) { goodPort =>
          val cfg = DnsPtr.DnsConfig(
            Seq(("127.0.0.1", deadPort), ("127.0.0.1", sickPort), ("127.0.0.1", goodPort)),
            timeoutMs = 300)
          assert(DnsPtr.lookup("12.20.121.5", cfg)
            .contains("host-12-20-121-5.mail.telecom-us.com"))
        }
      }
    }
  }

  test("all servers down → None after timeouts, no throw") {
    val cfg = DnsPtr.DnsConfig(Seq(("127.0.0.1", 1)), timeoutMs = 200)
    assert(DnsPtr.lookup("12.20.121.5", cfg).isEmpty)
  }

  test("hand-built response: double compression pointer chain decodes") {
    // NAME at 12 = "a.example.com"; answer PTR target uses a pointer
    // to a pointer: "mail." + ptr→(offset of "example.com" inside the
    // question name). Hand-packed to pin the jump-chain path.
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v >> 8); out.write(v & 0xff) }
    u16(0x1234); u16(0x8180); u16(1); u16(1); u16(0); u16(0)
    // question: 1'a' 7'example' 3'com' 0, type PTR class IN
    out.write(1); out.write('a')
    out.write(7); "example".foreach(c => out.write(c))
    out.write(3); "com".foreach(c => out.write(c))
    out.write(0)
    u16(12); u16(1)
    // answer: NAME = ptr to 12; PTR; IN; TTL; RDLENGTH; RDATA
    u16(0xc00c); u16(12); u16(1); u16(0); u16(300)
    val rdata = new java.io.ByteArrayOutputStream()
    rdata.write(4); "mail".foreach(c => rdata.write(c))
    rdata.write(0xc0); rdata.write(14) // ptr to "example.com" at offset 14
    u16(rdata.size())
    rdata.writeTo(out)
    assert(DnsPtr.parsePtrResponse(out.toByteArray, 0x1234)
      .contains("mail.example.com"))
  }

  test("parser rejects: wrong id, non-response, rcode != 0, truncation, pointer loops") {
    withServer(InMemoryDns.fixtureZone) { port =>
      // capture a real response by round-tripping manually
      val qname = DnsPtr.reverseName("12.20.121.9").get
      val query = DnsPtr.buildQuery(77, qname)
      val sock = new java.net.DatagramSocket()
      sock.setSoTimeout(2000)
      sock.send(new java.net.DatagramPacket(query, query.length,
        java.net.InetAddress.getByName("127.0.0.1"), port))
      val buf = new Array[Byte](4096)
      val pkt = new java.net.DatagramPacket(buf, buf.length)
      sock.receive(pkt)
      sock.close()
      val resp = java.util.Arrays.copyOf(buf, pkt.getLength)
      assert(DnsPtr.parsePtrResponse(resp, 77).isDefined)
      assert(DnsPtr.parsePtrResponse(resp, 78).isEmpty) // id mismatch
      for (len <- 0 until resp.length)
        DnsPtr.parsePtrResponse(java.util.Arrays.copyOf(resp, len), 77) // no throw
      // self-pointing compression pointer must not loop forever
      val loop = resp.clone()
      // overwrite answer NAME pointer (first 0xc0 after the question)
      val idx = loop.indexWhere(b => (b & 0xc0) == 0xc0)
      assert(idx > 0)
      loop(idx) = 0xc0.toByte
      loop(idx + 1) = idx.toByte // points at itself
      DnsPtr.parsePtrResponse(loop, 77) // returns (likely None), never hangs
    }
  }

  test("wire rDNS agrees with the broadcast-join enrichment formula on fixture octets") {
    withServer(InMemoryDns.fixtureZone) { port =>
      val cfg = DnsPtr.DnsConfig(Seq(("127.0.0.1", port)))
      GeoEnrichment.Fixture.take(6).foreach { case (octet, _, zone) =>
        val ip = s"$octet.7.8.9"
        assert(DnsPtr.lookup(ip, cfg).contains(s"host-$octet-7-8-9.$zone"))
      }
    }
  }
}
