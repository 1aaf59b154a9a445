package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.US_ASCII

import scala.collection.mutable

/** In-process IMAP4rev1 server speaking exactly the dialogue the intake
  * client issues — LOGIN, SELECT, FETCH (subject peek + RFC822 with
  * literals), STORE \Deleted, EXPUNGE, MOVE, LOGOUT — so the protocol
  * client round-trips REAL wire bytes offline (the posture of the fake
  * SMTP server in EmailOutputSpec, and of the reference's own
  * smtp_test.go). Lives in the main tree because the p_imap_intake
  * registry entry demonstrates the whole mail pipeline self-contained:
  * seed mailbox → protocol fetch → Spark parse — no network egress.
  *
  * Single-connection-at-a-time, loopback-only, ephemeral port.
  */
final class InMemoryImap(username: String, password: String,
                         seed: Seq[Array[Byte]]) extends AutoCloseable {

  private final class Msg(val bytes: Array[Byte], var deleted: Boolean = false)

  private val inbox = mutable.ArrayBuffer[Msg](seed.map(new Msg(_)): _*)
  private val archived = mutable.ArrayBuffer[Array[Byte]]()
  @volatile private var closed = false

  private val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort

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

  private def handle(socket: Socket): Unit = {
    socket.setSoTimeout(30000)
    val in = new BufferedInputStream(socket.getInputStream)
    val out = new BufferedOutputStream(socket.getOutputStream)
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

    w("* OK [CAPABILITY IMAP4rev1 MOVE] in-memory IMAP ready")
    out.flush()
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
