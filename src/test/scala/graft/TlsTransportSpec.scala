package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.sources.{HttpConfig, HttpIntake, ImapConfig, ImapIntake, ImapSecurity, InMemoryImap, TlsSupport}

/** Transport-encryption coverage for the protocol twins — the posture
  * the reference configures with `imap.tls` (internal/imap/client.go:
  * 42-66 dials TLS) and deploys in front of its HTTP server. Every
  * test asserts what actually happened ON THE WIRE via the server's
  * `lastNegotiated` / the client's SSLSession — never just "no
  * exception".
  */
class TlsTransportSpec extends SparkSpec {

  private def reportEmail(n: Int): Array[Byte] =
    ImapIntake.wrapReportEmail(s"report$n.xml",
      s"""<?xml version="1.0"?><feedback><report_metadata><report_id>r$n</report_id></report_metadata></feedback>"""
        .getBytes("US-ASCII"))

  private val Seed = Seq(reportEmail(1), reportEmail(2))

  test("IMAPS: implicit TLS from byte 0, fetched bytes intact, session encrypted") {
    val server = new InMemoryImap("user", "pw", Seed, ImapSecurity.Imaps)
    try {
      val msgs = ImapIntake.pullMessages(
        ImapConfig("127.0.0.1", server.port, "user", "pw", archiveMailbox = "",
          security = ImapSecurity.Imaps))
      assert(msgs.size == 2)
      msgs.zip(Seed).foreach { case (m, s) =>
        assert(java.util.Arrays.equals(m.rfc822, s), s"message ${m.seq} bytes differ over TLS")
      }
      assert(server.lastNegotiated.startsWith("TLS"),
        s"server saw '${server.lastNegotiated}', expected a TLS protocol")
    } finally server.close()
  }

  test("STARTTLS: upgrade after the greeting, then the full mail flow encrypted") {
    // regression for the <init> NPE: command() runs during construction
    // for the STARTTLS upgrade, so every field it touches must be
    // initialized before the greeting block
    val server = new InMemoryImap("user", "pw", Seed, ImapSecurity.StartTls)
    try {
      val msgs = ImapIntake.pullMessages(
        ImapConfig("127.0.0.1", server.port, "user", "pw", archiveMailbox = "Archive",
          security = ImapSecurity.StartTls))
      assert(msgs.size == 2)
      assert(server.lastNegotiated.startsWith("TLS"),
        s"server saw '${server.lastNegotiated}', expected a TLS protocol post-upgrade")
      assert(server.inboxSize == 0)
      assert(server.archivedCount == 2)
    } finally server.close()
  }

  test("STARTTLS server refuses plaintext LOGIN (no silent password leak)") {
    val server = new InMemoryImap("user", "pw", Seed, ImapSecurity.StartTls)
    try {
      val e = intercept[IllegalArgumentException] {
        ImapIntake.pullMessages(
          ImapConfig("127.0.0.1", server.port, "user", "pw",
            security = ImapSecurity.Plaintext))
      }
      assert(e.getMessage.contains("LOGIN"), e.getMessage)
    } finally server.close()
  }

  test("STARTTLS client refuses a server that does not advertise the capability") {
    // config says encrypt, server can't: fail loudly, never downgrade
    val server = new InMemoryImap("user", "pw", Seed, ImapSecurity.Plaintext)
    try {
      val e = intercept[IllegalArgumentException] {
        ImapIntake.pullMessages(
          ImapConfig("127.0.0.1", server.port, "user", "pw",
            security = ImapSecurity.StartTls))
      }
      assert(e.getMessage.contains("STARTTLS"), e.getMessage)
    } finally server.close()
  }

  test("HTTPS: health + service document served over the pinned TLS identity") {
    val drop = java.nio.file.Files.createTempDirectory("graft-https-drop").toString
    val server = new HttpIntake(HttpConfig(tls = true), drop,
      summary = () => """{"doc":"summary"}""", extraMetrics = () => Nil)
    try {
      val client = HttpClient.newBuilder().sslContext(TlsSupport.clientContext).build()
      val health = client.send(
        HttpRequest.newBuilder(URI.create(s"https://127.0.0.1:${server.port}/health")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(health.statusCode() == 200)
      assert(health.body().contains("\"status\":\"healthy\""))
      // the response really came over TLS (SSLSession present), under
      // hostname verification against the cert's IP SAN
      assert(health.sslSession().isPresent)
      assert(health.sslSession().get.getProtocol.startsWith("TLS"))
    } finally server.close()
  }

  test("config-driven PEM cert/key: the server serves the FILE identity, not the generated fallback") {
    import java.security.cert.X509Certificate
    def pem(label: String, der: Array[Byte]): String =
      s"-----BEGIN $label-----\n" +
        java.util.Base64.getMimeEncoder(64, "\n".getBytes).encodeToString(der) +
        s"\n-----END $label-----\n"
    val dir = java.nio.file.Files.createTempDirectory("graft-pem")
    val (kp, cert) = TlsSupport.freshIdentity() // distinct from the per-JVM one
    val certPath = dir.resolve("server.crt")
    val keyPath = dir.resolve("server.key")
    // X.509 cert + PKCS#8 key, the PEM shapes the reference's
    // cert_file/key_file point at
    java.nio.file.Files.write(certPath, pem("CERTIFICATE", cert.getEncoded).getBytes("US-ASCII"))
    java.nio.file.Files.write(keyPath, pem("PRIVATE KEY", kp.getPrivate.getEncoded).getBytes("US-ASCII"))
    // through the YAML config surface, as a deployment would set it
    val yaml = dir.resolve("config.yaml")
    java.nio.file.Files.write(yaml,
      s"""http:
         |  enabled: true
         |  port: 0
         |  tls: true
         |  cert_file: $certPath
         |  key_file: $keyPath
         |""".stripMargin.getBytes("UTF-8"))
    val cfg = graft.sources.ConfigLoader.load(yaml.toString).http.toHttpConfig
    assert(cfg.tls && cfg.certFile == certPath.toString && cfg.keyFile == keyPath.toString)
    val drop = java.nio.file.Files.createTempDirectory("graft-pem-drop").toString
    val server = new HttpIntake(cfg, drop, summary = () => "{}", extraMetrics = () => Nil)
    try {
      // pin trust to the PEM cert alone; capture what the server presents
      val ks = java.security.KeyStore.getInstance("PKCS12")
      ks.load(null, null)
      ks.setCertificateEntry("pem", cert)
      val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
        javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(ks)
      val ctx = javax.net.ssl.SSLContext.getInstance("TLSv1.3")
      ctx.init(null, tmf.getTrustManagers, null)
      val client = HttpClient.newBuilder().sslContext(ctx).build()
      val health = client.send(
        HttpRequest.newBuilder(URI.create(s"https://127.0.0.1:${server.port}/health")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(health.statusCode() == 200)
      val served = health.sslSession().get.getPeerCertificates.head.asInstanceOf[X509Certificate]
      assert(served == cert, "server did not present the configured PEM identity")
      assert(served != TlsSupport.certificate, "served the generated fallback, not the files")
      // and a client pinned to the FALLBACK identity must now be rejected
      val fallbackClient = HttpClient.newBuilder().sslContext(TlsSupport.clientContext).build()
      intercept[java.io.IOException] {
        fallbackClient.send(
          HttpRequest.newBuilder(URI.create(s"https://127.0.0.1:${server.port}/health")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
      }
    } finally server.close()
    // misconfigurations fail at STARTUP, not at the first handshake:
    // half-configured pair, and a key that does not match the cert
    intercept[IllegalArgumentException] {
      new HttpIntake(cfg.copy(keyFile = ""), drop, () => "{}", () => Nil)
    }
    val (otherKp, _) = TlsSupport.freshIdentity()
    val wrongKey = dir.resolve("wrong.key")
    java.nio.file.Files.write(wrongKey,
      pem("PRIVATE KEY", otherKp.getPrivate.getEncoded).getBytes("US-ASCII"))
    // CONSTRUCTION alone must throw (the sign-verify pair probe in
    // serverContextFromPem) — no handshake in this intercept, so a
    // context that silently tolerated the mismatch fails this test
    val e = intercept[IllegalArgumentException] {
      new HttpIntake(cfg.copy(keyFile = wrongKey.toString), drop, () => "{}", () => Nil)
    }
    assert(e.getMessage.contains("does not match"))
    // CROSS-algorithm mismatch (EC key against the RSA cert) must yield
    // the SAME uniform message, not an opaque InvalidKeyException from
    // Signature.initVerify
    val ecKpg = java.security.KeyPairGenerator.getInstance("EC")
    ecKpg.initialize(256)
    val ecKey = dir.resolve("ec.key")
    java.nio.file.Files.write(ecKey,
      pem("PRIVATE KEY", ecKpg.generateKeyPair().getPrivate.getEncoded).getBytes("US-ASCII"))
    val eCross = intercept[IllegalArgumentException] {
      TlsSupport.serverContextFromPem(certPath.toString, ecKey.toString)
    }
    assert(eCross.getMessage.contains("does not match"))
  }

  test("client trust is pinned, not trust-all: a default-trust client is rejected") {
    val drop = java.nio.file.Files.createTempDirectory("graft-https-drop2").toString
    val server = new HttpIntake(HttpConfig(tls = true), drop,
      summary = () => "{}", extraMetrics = () => Nil)
    try {
      // the JDK default trust store does not contain the in-process
      // self-signed cert, so the handshake must fail — proving the
      // server presents OUR identity, not an anonymous/accepted-anything one
      val strangers = HttpClient.newHttpClient()
      intercept[java.io.IOException] {
        strangers.send(
          HttpRequest.newBuilder(URI.create(s"https://127.0.0.1:${server.port}/health")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
      }
    } finally server.close()
  }
}
