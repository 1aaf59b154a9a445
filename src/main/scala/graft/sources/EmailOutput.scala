package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** SMTP delivery settings — the reference's config.SMTPConfig consumed by
  * internal/smtp/smtp.go:16-28 (host, port, plain auth, from/to, optional
  * subject/message overrides; `enabled` gates the whole feature).
  */
final case class SmtpConfig(
    enabled: Boolean,
    host: String = "",
    port: Int = 25,
    username: String = "",
    password: String = "",
    from: String = "",
    to: Seq[String] = Nil,
    subject: String = "",
    message: String = "")

/** Email report output — the Spark twin of the reference's SMTP client
  * (/root/reference/internal/smtp/smtp.go:1-235). The reference formats
  * one multipart MIME message per report (text summary + base64 JSON
  * attachment, smtp.go:123-166) and ships it with net/smtp.SendMail.
  *
  * Split Spark-first: message FORMATTING is a distributed, codegen'd
  * projection (subject/body defaults of SendAggregateReport /
  * SendForensicReport / SendSMTPTLSReport, smtp.go:31-120; MIME assembly
  * and 76-column base64 chunking of smtp.go:123-166,189-235 as pure SQL
  * concat/base64/regexp_replace — no UDF); DELIVERY is transport at the
  * partition boundary — one SMTP connection per partition, or the file
  * twin writing the identical `.eml` bytes when no relay is configured
  * (same deployment-config gating as KafkaJsonIntake).
  *
  * Deliberate deltas from the reference, for determinism at scale: the
  * MIME boundary derives from the report id (smtp.go:140 stamps
  * time.Now().Unix(), which would make replays non-idempotent), the Date
  * header is a caller-supplied instant, and the JSON attachment is
  * compact `to_json` rather than MarshalIndent (same fields, no pretty
  * whitespace).
  */
object EmailOutput {

  private val Crlf = "\r\n"

  /** RFC 1123 Date header from a caller-supplied instant (UTC session). */
  private def dateHeader(sentAt: Timestamp): Column =
    concat(date_format(lit(sentAt), "EEE, dd MMM yyyy HH:mm:ss"), lit(" +0000"))

  /** 76-column MIME base64 of a string column (smtp.go:189-235's
    * encodeBase64: standard alphabet, CRLF line breaks, trailing break).
    * Spark's `base64` IS the RFC 2045 MIME encoder — 76-column chunks
    * separated by CRLF, no trailing break — so the only thing to add is
    * the single trailing break encodeBase64 emits. (An earlier regexp
    * re-chunk here double-broke every line: the encoder output already
    * carried the CRLFs.)
    */
  def base64Mime(payload: Column): Column =
    concat(base64(payload.cast("binary")), lit(Crlf))

  /** Assemble the full multipart message (smtp.go:128-166): headers,
    * 8bit text part, base64 JSON attachment, closing boundary. Pure SQL
    * concat — one codegen'd projection per report row.
    */
  def mimeMessage(cfg: SmtpConfig, sentAt: Timestamp, subject: Column,
                  body: Column, attachmentName: Column, attachmentJson: Column,
                  boundaryKey: Column): Column = {
    val boundary = concat(lit("boundary-"), abs(xxhash64(boundaryKey)))
    concat(
      lit(s"From: ${cfg.from}$Crlf"),
      lit(s"To: ${cfg.to.mkString(", ")}$Crlf"),
      lit("Subject: "), subject, lit(Crlf),
      lit("Date: "), dateHeader(sentAt), lit(Crlf),
      lit(s"MIME-Version: 1.0$Crlf"),
      lit("Content-Type: multipart/mixed; boundary="), boundary, lit(Crlf),
      lit(Crlf),
      lit("--"), boundary, lit(Crlf),
      lit(s"Content-Type: text/plain; charset=utf-8$Crlf"),
      lit(s"Content-Transfer-Encoding: 8bit$Crlf"),
      lit(Crlf),
      // bare-LF bodies normalized to CRLF — net/smtp's DotWriter applies
      // the same transform on the wire, and a CRLF-only message survives
      // line-oriented SMTP transport byte-identically
      regexp_replace(body, "\r?\n", Crlf), lit(Crlf + Crlf),
      lit("--"), boundary, lit(Crlf),
      lit(s"Content-Type: application/json$Crlf"),
      lit("Content-Disposition: attachment; filename="), attachmentName, lit(Crlf),
      lit(s"Content-Transfer-Encoding: base64$Crlf"),
      lit(Crlf),
      base64Mime(attachmentJson),
      lit("--"), boundary, lit(s"--$Crlf"))
  }

  private def emailFrame(cfg: SmtpConfig, sentAt: Timestamp, keyed: DataFrame,
                         defaultSubject: Column, defaultBody: Column,
                         attachmentName: String): DataFrame = {
    val subject =
      if (cfg.subject.nonEmpty) lit(cfg.subject) else defaultSubject
    val body =
      if (cfg.message.nonEmpty) lit(cfg.message) else defaultBody
    keyed.select(
        col("report_key"),
        subject.as("subject"),
        body.as("body"),
        lit(attachmentName).as("attachment_name"),
        col("attachment_json"))
      .withColumn("mime",
        mimeMessage(cfg, sentAt, col("subject"), col("body"),
          col("attachment_name"), col("attachment_json"), col("report_key")))
  }

  /** One email per aggregate report — subject/body defaults of
    * SendAggregateReport (smtp.go:31-59), attachment
    * `dmarc-aggregate.json`.
    */
  def aggregateEmails(reports: Dataset[AggregateReport], cfg: SmtpConfig,
                      sentAt: Timestamp): DataFrame = {
    val df = reports.toDF()
    emailFrame(cfg, sentAt,
      df.select(col("reportId").as("report_key"),
        col("domain"), col("reportId"), col("orgName"),
        col("beginDate"), col("endDate"),
        to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("attachment_json")),
      concat(lit("DMARC Aggregate Report - "), col("domain")),
      concat(
        lit("DMARC Aggregate Report for domain "), col("domain"),
        lit("\n\nReport ID: "), col("reportId"),
        lit("\nOrganization: "), col("orgName"),
        lit("\nDate Range: "), date_format(col("beginDate"), "yyyy-MM-dd"),
        lit(" to "), date_format(col("endDate"), "yyyy-MM-dd"),
        lit("\n\nReport data attached as JSON.")),
      "dmarc-aggregate.json")
  }

  /** One email per forensic report (SendForensicReport, smtp.go:61-90),
    * attachment `dmarc-forensic.json`.
    */
  def forensicEmails(reports: Dataset[ForensicReport], cfg: SmtpConfig,
                     sentAt: Timestamp): DataFrame = {
    val df = reports.toDF()
    emailFrame(cfg, sentAt,
      df.select(col("messageId").as("report_key"),
        col("reportedDomain"), col("subject").as("r_subject"),
        col("messageId"), col("source.ipAddress").as("srcIp"),
        col("authFailure"),
        to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("attachment_json")),
      concat(lit("DMARC Forensic Report - "), col("reportedDomain")),
      concat(
        lit("DMARC Forensic Report for domain "), col("reportedDomain"),
        lit("\n\nSubject: "), col("r_subject"),
        lit("\nMessage ID: "), col("messageId"),
        lit("\nSource IP: "), col("srcIp"),
        lit("\nAuth Failure: "), array_join(col("authFailure"), ", "),
        lit("\n\nReport data attached as JSON.")),
      "dmarc-forensic.json")
  }

  /** One email per SMTP TLS report (SendSMTPTLSReport, smtp.go:92-120),
    * attachment `smtp-tls.json`.
    */
  def tlsEmails(reports: Dataset[TlsReport], cfg: SmtpConfig,
                sentAt: Timestamp): DataFrame = {
    val df = reports.toDF()
    emailFrame(cfg, sentAt,
      df.select(col("reportId").as("report_key"),
        col("organizationName"), col("reportId"),
        col("beginDate"), col("endDate"),
        to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("attachment_json")),
      concat(lit("SMTP TLS Report - "), col("organizationName")),
      concat(
        lit("SMTP TLS Report from "), col("organizationName"),
        lit("\n\nReport ID: "), col("reportId"),
        lit("\nDate Range: "), date_format(col("beginDate"), "yyyy-MM-dd"),
        lit(" to "), date_format(col("endDate"), "yyyy-MM-dd"),
        lit("\n\nReport data attached as JSON.")),
      "smtp-tls.json")
  }

  /** Deliver formatted messages. Config-gated like KafkaJsonIntake:
    * enabled + host → live SMTP, one connection PER PARTITION (the
    * at-scale shape — executors deliver in parallel, no driver collect);
    * otherwise the file twin writes each message as `<report_key>.eml`
    * under `fileTwinDir` with byte-identical MIME content (the
    * directory-mode analogue of output.go's per-report files).
    */
  def deliver(messages: DataFrame, cfg: SmtpConfig, fileTwinDir: String): Unit =
    if (cfg.enabled && cfg.host.nonEmpty) send(messages, cfg)
    else writeEmlFiles(messages, fileTwinDir)

  /** Live SMTP delivery via [[SmtpClient]]. */
  def send(messages: DataFrame, cfg: SmtpConfig): Unit = {
    val (host, port, user, pass) = (cfg.host, cfg.port, cfg.username, cfg.password)
    val (from, to) = (cfg.from, cfg.to)
    messages.select(col("mime")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val client = new SmtpClient(host, port, user, pass)
          try it.foreach(r => client.send(from, to, r.getString(0)))
          finally client.close()
        }
    }
  }

  /** File twin: one `.eml` per message, written from the executors. The
    * filename carries a content hash beside the sanitized report key —
    * report ids are NOT unique across orgs (the sample corpus already
    * collides), and a key-only name would silently overwrite one report
    * with another.
    */
  def emlFileName(reportKey: String, mime: String): String = {
    val safe = reportKey.replaceAll("[^A-Za-z0-9._-]", "_")
    f"$safe-${mime.hashCode}%08x.eml"
  }

  def writeEmlFiles(messages: DataFrame, dir: String): Unit = {
    new java.io.File(dir).mkdirs()
    messages.select(col("report_key"), col("mime")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, emlFileName(r.getString(0), r.getString(1))),
            r.getString(1).getBytes("UTF-8"))
        }
    }
  }
}

/** Minimal plain-socket SMTP client — the transport half of
  * net/smtp.SendMail as used by smtp.go:168-186: EHLO, optional AUTH
  * PLAIN (PlainAuth, smtp.go:170-173), MAIL FROM / RCPT TO / DATA with
  * dot-stuffing, QUIT. No STARTTLS (the reference's SendMail also sends
  * plaintext unless the server forces TLS); one instance = one
  * connection, reused across messages in a partition.
  */
final class SmtpClient(host: String, port: Int, username: String, password: String) {
  private val socket = new java.net.Socket(host, port)
  private val in = new java.io.BufferedReader(
    new java.io.InputStreamReader(socket.getInputStream, "UTF-8"))
  private val out = new java.io.OutputStreamWriter(socket.getOutputStream, "UTF-8")

  expect(220)
  cmd(s"EHLO graft", 250)
  if (username.nonEmpty && password.nonEmpty) {
    // RFC 4616 PLAIN: empty authzid, NUL-separated authcid and password
    val token = java.util.Base64.getEncoder.encodeToString(
      ("\u0000" + username + "\u0000" + password).getBytes("UTF-8"))
    cmd(s"AUTH PLAIN $token", 235)
  }

  /** Read one (possibly multiline) reply; fail unless it carries `code`. */
  private def expect(code: Int): Unit = {
    var line = in.readLine()
    if (line == null) throw new java.io.IOException("SMTP: connection closed")
    while (line.length > 3 && line.charAt(3) == '-') line = in.readLine()
    if (!line.startsWith(code.toString))
      throw new java.io.IOException(s"SMTP: expected $code, got: $line")
  }

  private def cmd(c: String, code: Int): Unit = {
    out.write(c + "\r\n"); out.flush(); expect(code)
  }

  /** Transmit one message. Dot-stuffing per RFC 5321 §4.5.2 (net/smtp
    * applies the same transform through textproto's DotWriter).
    */
  def send(from: String, to: Seq[String], mime: String): Unit = {
    cmd(s"MAIL FROM:<$from>", 250)
    to.foreach(rcpt => cmd(s"RCPT TO:<$rcpt>", 250))
    cmd("DATA", 354)
    val stuffed = mime.linesWithSeparators
      .map(l => if (l.startsWith(".")) "." + l else l).mkString
    out.write(stuffed)
    if (!stuffed.endsWith("\r\n") && !stuffed.endsWith("\n")) out.write("\r\n")
    cmd(".", 250)
  }

  def close(): Unit = {
    try { out.write("QUIT\r\n"); out.flush() } catch { case _: Throwable => () }
    try socket.close() catch { case _: Throwable => () }
  }
}
