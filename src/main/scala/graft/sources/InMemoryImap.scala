package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.US_ASCII

import scala.collection.mutable

/** How an IMAP endpoint speaks TLS — mirrors the reference's
  * `imap.tls` config (internal/imap/client.go:42-66 dials a TLS
  * socket when set).
  *
  *  - [[ImapSecurity.Plaintext]]: bare TCP (the config-gated fallback).
  *  - [[ImapSecurity.Imaps]]: implicit TLS from byte 0 (RFC 8314 —
  *    what the reference's `tls: true` does, port 993 semantics).
  *  - [[ImapSecurity.StartTls]]: plaintext greeting, then the
  *    RFC 3501 §6.2.1 STARTTLS upgrade before LOGIN.
  */
sealed trait ImapSecurity
object ImapSecurity {
  case object Plaintext extends ImapSecurity
  case object Imaps extends ImapSecurity
  case object StartTls extends ImapSecurity
}

/** In-process IMAP4rev1 server speaking exactly the dialogue the intake
  * client issues — LOGIN, SELECT, FETCH (subject peek + RFC822 with
  * literals), STORE \Deleted, EXPUNGE, MOVE, LOGOUT — so the protocol
  * client round-trips REAL wire bytes offline (the posture of the fake
  * SMTP server in EmailOutputSpec, and of the reference's own
  * smtp_test.go). Lives in the main tree because the p_imap_intake
  * registry entry demonstrates the whole mail pipeline self-contained:
  * seed mailbox → protocol fetch → Spark parse — no network egress.
  *
  * `security` selects the transport: IMAPS accepts TLS from byte 0,
  * StartTls advertises the capability and upgrades in place on the
  * STARTTLS command (refusing LOGIN until the socket is encrypted —
  * RFC 3501's "a server MAY refuse LOGIN until STARTTLS" hardened to
  * MUST, since the whole point of the mode is never shipping the
  * password in the clear).
  *
  * Single-connection-at-a-time, loopback-only, ephemeral port.
  */
final class InMemoryImap(username: String, password: String,
                         seed: Seq[Array[Byte]],
                         security: ImapSecurity = ImapSecurity.Plaintext)
    extends AutoCloseable {

  private final class Msg(val bytes: Array[Byte], var deleted: Boolean = false)

  private val inbox = mutable.ArrayBuffer[Msg](seed.map(new Msg(_)): _*)
  private val archived = mutable.ArrayBuffer[Array[Byte]]()
  @volatile private var closed = false

  private val server: ServerSocket = security match {
    case ImapSecurity.Imaps => TlsSupport.serverSocket()
    case _                  => new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
  }
  def port: Int = server.getLocalPort

  /** Protocol of the last completed handshake ("TLSv1.3" / "plaintext")
    * — lets specs assert encryption actually happened on the wire.
    */
  @volatile var lastNegotiated: String = "none"

  /** Snapshot accessors for assertions. */
  def inboxSize: Int = inbox.synchronized(inbox.size)
  def archivedCount: Int = inbox.synchronized(archived.size)
  def archivedBytes: Seq[Array[Byte]] = inbox.synchronized(archived.toSeq)

  private val thread = new Thread(() => acceptLoop(), "in-memory-imap")
  thread.setDaemon(true)
  thread.start()

  private def acceptLoop(): Unit =
    while (!closed) {
      try {
        val s = server.accept()
        try handle(s)
        finally s.close()
      } catch { case _: Throwable if closed => () case _: Throwable => () }
    }

  private def subjectOf(bytes: Array[Byte]): String = {
    val text = new String(bytes, US_ASCII)
    val head = text.indexOf("\r\n\r\n") match {
      case -1 => text
      case i  => text.substring(0, i)
    }
    val unfolded = head.replaceAll("\r\n[ \t]", " ")
    unfolded.linesIterator.collectFirst {
      case l if l.toLowerCase.startsWith("subject:") => l.substring(8).trim
    }.getOrElse("")
  }

  private def handle(socket0: Socket): Unit = {
    var socket = socket0
    socket.setSoTimeout(30000)
    var in = new BufferedInputStream(socket.getInputStream)
    var out = new BufferedOutputStream(socket.getOutputStream)
    def w(s: String): Unit = out.write((s + "\r\n").getBytes(US_ASCII))
    def literal(prefix: String, payload: Array[Byte], suffix: String): Unit = {
      out.write((prefix + "{" + payload.length + "}\r\n").getBytes(US_ASCII))
      out.write(payload)
      out.write((suffix + "\r\n").getBytes(US_ASCII))
    }
    def readLine(): String = {
      val buf = new ByteArrayOutputStream()
      var prev = -1
      var c = in.read()
      while (c >= 0 && !(prev == '\r' && c == '\n')) { buf.write(c); prev = c; c = in.read() }
      if (c < 0) return null
      val b = buf.toByteArray
      new String(b, 0, math.max(0, b.length - 1), US_ASCII)
    }

    socket match {
      case ssl: javax.net.ssl.SSLSocket => // IMAPS: handshake precedes byte 0
        lastNegotiated = ssl.getSession.getProtocol
      case _ => lastNegotiated = "plaintext"
    }
    val cap =
      if (security == ImapSecurity.StartTls && !socket.isInstanceOf[javax.net.ssl.SSLSocket])
        "IMAP4rev1 STARTTLS MOVE"
      else "IMAP4rev1 MOVE"
    w(s"* OK [CAPABILITY $cap] in-memory IMAP ready")
    out.flush()
    var upgraded = socket.isInstanceOf[javax.net.ssl.SSLSocket]
    var loggedIn = false
    var selected = false
    var line = readLine()
    while (line != null) {
      val sp = line.indexOf(' ')
      if (sp <= 0) { w("* BAD malformed"); out.flush() }
      else {
        val tag = line.substring(0, sp)
        val rest = line.substring(sp + 1)
        val cmd = rest.takeWhile(_ != ' ').toUpperCase
        val args = rest.drop(cmd.length).trim

        def unq(s: String): String =
          if (s.startsWith("\"") && s.endsWith("\"") && s.length >= 2)
            s.substring(1, s.length - 1).replace("\\\"", "\"").replace("\\\\", "\\")
          else s

        cmd match {
          case "STARTTLS" if security == ImapSecurity.StartTls && !upgraded =>
            // RFC 3501 §6.2.1: OK first, THEN the handshake begins —
            // the client must not start TLS until the tagged response
            w(s"$tag OK Begin TLS negotiation now")
            out.flush()
            val ssl = TlsSupport.upgrade(socket, TlsSupport.serverContext, clientMode = false)
            socket = ssl
            in = new BufferedInputStream(ssl.getInputStream)
            out = new BufferedOutputStream(ssl.getOutputStream)
            upgraded = true
            lastNegotiated = ssl.getSession.getProtocol
          case "LOGIN" if security == ImapSecurity.StartTls && !upgraded =>
            // never accept a password in the clear when the endpoint
            // was configured for STARTTLS
            w(s"$tag NO [PRIVACYREQUIRED] STARTTLS required before LOGIN")
          case "LOGIN" =>
            // two quoted or atom args; split on the quote boundary
            val parts = """"((?:[^"\\]|\\.)*)"|(\S+)""".r
              .findAllMatchIn(args)
              .map(m => unq(m.matched))
              .toSeq
            if (parts.length == 2 && parts.head == username && parts(1) == password) {
              loggedIn = true
              w(s"$tag OK LOGIN completed")
            } else w(s"$tag NO LOGIN failed")
          case "SELECT" if loggedIn =>
            selected = true
            inbox.synchronized { w(s"* ${inbox.size} EXISTS") }
            w("* FLAGS (\\Deleted \\Seen)")
            w(s"$tag OK [READ-WRITE] SELECT completed")
          case "FETCH" if selected =>
            val seq = args.takeWhile(_.isDigit).toInt
            val item = args.drop(seq.toString.length).trim.toUpperCase
            inbox.synchronized {
              if (seq < 1 || seq > inbox.size) w(s"$tag NO no such message")
              else {
                val m = inbox(seq - 1)
                if (item.contains("HEADER.FIELDS (SUBJECT)")) {
                  val payload = (s"Subject: ${subjectOf(m.bytes)}\r\n\r\n").getBytes(US_ASCII)
                  literal(s"* $seq FETCH (BODY[HEADER.FIELDS (SUBJECT)] ", payload, ")")
                } else {
                  literal(s"* $seq FETCH (RFC822 ", m.bytes, ")")
                }
                w(s"$tag OK FETCH completed")
              }
            }
          case "STORE" if selected =>
            val seq = args.takeWhile(_.isDigit).toInt
            inbox.synchronized {
              if (seq < 1 || seq > inbox.size) w(s"$tag NO no such message")
              else if (args.toUpperCase.contains("+FLAGS") && args.contains("\\Deleted")) {
                inbox(seq - 1).deleted = true
                w(s"* $seq FETCH (FLAGS (\\Deleted))")
                w(s"$tag OK STORE completed")
              } else w(s"$tag NO unsupported STORE")
            }
          case "EXPUNGE" if selected =>
            inbox.synchronized {
              // RFC 3501: each EXPUNGE response renumbers what follows —
              // report positions one at a time, lowest first
              var i = 0
              while (i < inbox.size) {
                if (inbox(i).deleted) { inbox.remove(i); w(s"* ${i + 1} EXPUNGE") }
                else i += 1
              }
            }
            w(s"$tag OK EXPUNGE completed")
          case "MOVE" if selected =>
            val seq = args.takeWhile(_.isDigit).toInt
            inbox.synchronized {
              if (seq < 1 || seq > inbox.size) w(s"$tag NO no such message")
              else {
                archived += inbox.remove(seq - 1).bytes
                w(s"* $seq EXPUNGE")
                w(s"$tag OK MOVE completed")
              }
            }
          case "LOGOUT" =>
            w("* BYE in-memory IMAP closing")
            w(s"$tag OK LOGOUT completed")
            out.flush()
            return
          case _ =>
            w(s"$tag BAD unsupported or out-of-state command $cmd")
        }
        out.flush()
      }
      line = readLine()
    }
  }

  override def close(): Unit = {
    closed = true
    server.close()
  }
}
