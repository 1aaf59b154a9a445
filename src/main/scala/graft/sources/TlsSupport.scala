package graft.sources

import java.math.BigInteger
import java.security.cert.{CertificateFactory, X509Certificate}
import java.security.{KeyPair, KeyPairGenerator, KeyStore, SecureRandom, Signature}

import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLServerSocket, SSLSocket, TrustManagerFactory}

/** Transport encryption for the protocol twins — the last fidelity
  * delta vs the reference, whose IMAP client dials TLS
  * (internal/imap/client.go:42-66, config `imap.tls`) and whose HTTP
  * server runs behind TLS termination in deployment.
  *
  * Offline posture: a self-signed certificate is generated in-process
  * and trust is PINNED — the client context trusts exactly the one
  * generated cert (never trust-all, which would test nothing). The
  * certificate itself is hand-encoded X.509 v3 DER (RFC 5280 §4.1):
  * version, serial, sha256WithRSAEncryption AlgorithmIdentifier,
  * CN=localhost issuer/subject, UTCTime validity, the keypair's SPKI,
  * and a SubjectAltName extension carrying DNS:localhost +
  * IP:127.0.0.1 so JDK hostname verification passes against loopback
  * without a custom verifier. The DER is then round-tripped through
  * the JDK's CertificateFactory and signature-verified against its
  * own public key — a malformed encoding fails loudly at class init,
  * not mid-handshake.
  */
object TlsSupport {

  // ---- minimal DER writer (RFC 5280 uses a small, fixed subset) ----

  private def derLen(n: Int): Array[Byte] =
    if (n < 0x80) Array(n.toByte)
    else {
      val raw = BigInteger.valueOf(n.toLong).toByteArray.dropWhile(_ == 0)
      (0x80 | raw.length).toByte +: raw
    }

  private def tlv(tag: Int, content: Array[Byte]): Array[Byte] =
    tag.toByte +: (derLen(content.length) ++ content)

  private def seq(parts: Array[Byte]*): Array[Byte] = tlv(0x30, parts.flatten.toArray)
  private def derSet(parts: Array[Byte]*): Array[Byte] = tlv(0x31, parts.flatten.toArray)
  private def derInt(v: BigInteger): Array[Byte] = tlv(0x02, v.toByteArray)
  private def utf8Str(s: String): Array[Byte] = tlv(0x0c, s.getBytes("UTF-8"))
  private def utcTime(s: String): Array[Byte] = tlv(0x17, s.getBytes("US-ASCII"))
  private def octetString(b: Array[Byte]): Array[Byte] = tlv(0x04, b)
  private def bitString(b: Array[Byte]): Array[Byte] = tlv(0x03, 0.toByte +: b)
  private def ctxCons(n: Int, content: Array[Byte]): Array[Byte] = tlv(0xa0 | n, content)
  private def ctxPrim(n: Int, content: Array[Byte]): Array[Byte] = tlv(0x80 | n, content)

  private def oid(dotted: String): Array[Byte] = {
    val arcs = dotted.split('.').map(_.toLong)
    val out = new java.io.ByteArrayOutputStream()
    def base128(v: Long): Unit = {
      val bytes = Iterator.iterate(v)(_ >>> 7).takeWhile(_ != 0).map(x => (x & 0x7f).toInt)
        .toSeq.reverse match { case Seq() => Seq(0) case s => s }
      bytes.init.foreach(b => out.write(b | 0x80))
      out.write(bytes.last)
    }
    base128(arcs(0) * 40 + arcs(1))
    arcs.drop(2).foreach(base128)
    tlv(0x06, out.toByteArray)
  }

  private val Sha256WithRsa = seq(oid("1.2.840.113549.1.1.11"), tlv(0x05, Array.empty)) // + NULL params
  private val CnLocalhost =
    seq(derSet(seq(oid("2.5.4.3"), utf8Str("localhost")))) // RDNSequence: CN=localhost

  /** Self-signed CN=localhost certificate DER for `pair`, valid
    * 2024-2049 (the UTCTime range), SAN = DNS:localhost + IP:127.0.0.1.
    */
  private[sources] def selfSignedDer(pair: KeyPair): Array[Byte] = {
    val serial = new BigInteger(63, new SecureRandom())
    val san = seq(
      oid("2.5.29.17"), // subjectAltName, non-critical (DEFAULT FALSE omitted)
      octetString(seq(
        ctxPrim(2, "localhost".getBytes("US-ASCII")), // dNSName (IA5)
        ctxPrim(7, Array[Byte](127, 0, 0, 1)))))      // iPAddress
    val tbs = seq(
      ctxCons(0, derInt(BigInteger.valueOf(2))), // version v3
      derInt(serial),
      Sha256WithRsa,
      CnLocalhost, // issuer = subject: self-signed
      seq(utcTime("240101000000Z"), utcTime("490101000000Z")),
      CnLocalhost,
      pair.getPublic.getEncoded, // SubjectPublicKeyInfo is already DER
      ctxCons(3, seq(san)))
    val sig = Signature.getInstance("SHA256withRSA")
    sig.initSign(pair.getPrivate)
    sig.update(tbs)
    seq(tbs, Sha256WithRsa, bitString(sig.sign()))
  }

  /** A fresh self-signed CN=localhost identity (keypair + verified
    * cert). The per-JVM [[keyPair]]/[[certificate]] is one of these;
    * the config-driven PEM specs mint ANOTHER and serve it, proving
    * the configured files — not the fallback — decide the identity.
    */
  def freshIdentity(): (KeyPair, X509Certificate) = {
    val kpg = KeyPairGenerator.getInstance("RSA")
    kpg.initialize(2048)
    val pair = kpg.generateKeyPair()
    val der = selfSignedDer(pair)
    val cert = CertificateFactory.getInstance("X.509")
      .generateCertificate(new java.io.ByteArrayInputStream(der))
      .asInstanceOf[X509Certificate]
    cert.verify(pair.getPublic) // throws if the hand-built DER lies
    cert.checkValidity()
    (pair, cert)
  }

  /** One keypair + certificate per JVM: generation costs ~0.2 s and the
    * twins only need a stable identity to pin.
    */
  lazy val (keyPair: KeyPair, certificate: X509Certificate) = freshIdentity()

  /** Server-side context: holds the private key, offers the cert. */
  lazy val serverContext: SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    ks.setKeyEntry("graft", keyPair.getPrivate, Array.empty[Char], Array(certificate))
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, Array.empty[Char])
    val ctx = SSLContext.getInstance("TLSv1.3")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** Client-side context: trusts EXACTLY the generated cert (pinned). */
  lazy val clientContext: SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    ks.setCertificateEntry("graft", certificate)
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = SSLContext.getInstance("TLSv1.3")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  // ---- config-driven PEM identity (http.cert_file / http.key_file) ----

  private def pemBlock(pem: String, label: String): Array[Byte] = {
    val begin = s"-----BEGIN $label-----"
    val end = s"-----END $label-----"
    val i = pem.indexOf(begin)
    val j = pem.indexOf(end)
    require(i >= 0 && j > i, s"no '$label' PEM block found")
    java.util.Base64.getMimeDecoder.decode(pem.substring(i + begin.length, j).trim)
  }

  /** First CERTIFICATE block of a PEM file as an X.509 certificate. */
  def certificateFromPem(path: String): X509Certificate = {
    val pem = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "US-ASCII")
    CertificateFactory.getInstance("X.509")
      .generateCertificate(new java.io.ByteArrayInputStream(
        pemBlock(pem, "CERTIFICATE")))
      .asInstanceOf[X509Certificate]
  }

  /** PRIVATE KEY (PKCS#8) block of a PEM file; RSA first, then EC —
    * the two key types the JDK's TLS stack serves.
    */
  def privateKeyFromPem(path: String): java.security.PrivateKey = {
    val pem = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "US-ASCII")
    val der = pemBlock(pem, "PRIVATE KEY")
    val spec = new java.security.spec.PKCS8EncodedKeySpec(der)
    try java.security.KeyFactory.getInstance("RSA").generatePrivate(spec)
    catch {
      case _: java.security.spec.InvalidKeySpecException =>
        java.security.KeyFactory.getInstance("EC").generatePrivate(spec)
    }
  }

  /** Server context from configured PEM files — what `http.tls` with
    * `cert_file`/`key_file` set serves instead of the generated
    * identity. The key must match the cert's public key: a config
    * pointing at a mismatched pair fails here at startup, not at the
    * first handshake.
    */
  def serverContextFromPem(certPath: String, keyPath: String): SSLContext = {
    val cert = certificateFromPem(certPath)
    val key = privateKeyFromPem(keyPath)
    // KeyStore.setKeyEntry does NOT check that the key matches the
    // cert's public key (a mismatch would otherwise surface only at the
    // first handshake) — prove the pair by sign-verifying a probe.
    val algo = key.getAlgorithm match {
      case "RSA" => "SHA256withRSA"
      case _     => "SHA256withECDSA"
    }
    // cross-algorithm pairs (EC key with an RSA cert or vice versa)
    // would make initVerify throw an opaque InvalidKeyException —
    // short-circuit them onto the same uniform mismatch message
    require(key.getAlgorithm == cert.getPublicKey.getAlgorithm,
      s"key_file $keyPath does not match the certificate in $certPath")
    val probe = "graft-tls-pair-probe".getBytes("US-ASCII")
    val signer = java.security.Signature.getInstance(algo)
    signer.initSign(key); signer.update(probe)
    val sig = signer.sign()
    val verifier = java.security.Signature.getInstance(algo)
    verifier.initVerify(cert.getPublicKey); verifier.update(probe)
    require(verifier.verify(sig),
      s"key_file $keyPath does not match the certificate in $certPath")
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    ks.setKeyEntry("graft", key, Array.empty[Char], Array(cert))
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, Array.empty[Char])
    val ctx = SSLContext.getInstance("TLSv1.3")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** TLS server socket on an ephemeral loopback port. */
  def serverSocket(ctx: SSLContext = serverContext): SSLServerSocket = {
    val s = ctx.getServerSocketFactory
      .createServerSocket(0, 8, java.net.InetAddress.getLoopbackAddress)
      .asInstanceOf[SSLServerSocket]
    s
  }

  /** Upgrade an established plaintext socket to TLS — the STARTTLS
    * flip, on whichever side `clientMode` says.
    */
  def upgrade(socket: java.net.Socket, ctx: SSLContext, clientMode: Boolean,
              host: String = "localhost"): SSLSocket = {
    val ssl = ctx.getSocketFactory
      .createSocket(socket, host, socket.getPort, true)
      .asInstanceOf[SSLSocket]
    ssl.setUseClientMode(clientMode)
    ssl.startHandshake()
    ssl
  }
}
