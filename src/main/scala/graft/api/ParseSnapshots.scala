package graft.api

/** Committed expected-parse snapshots of the reference sample corpus —
  * the oracle scheme q_tls_failure_breakdown introduced, generalized to
  * the parser registry entries: the Spark side parses the samples LIVE,
  * the DuckDB oracle evaluates these constants as VALUES, and
  * ParseSnapshotsSpec pins constants == live parse. The corpus is
  * SF-independent, so the snapshot holds at every scale factor; a parser
  * regression flips the gate red instead of hiding behind rows>0.
  *
  * Regenerate by running the matching registry query and pasting — these
  * are EXPECTED values, reviewed against the reference parser's own
  * semantics (parser.go:1059-1270 aggregate, parser.go forensic/TLS).
  */
object ParseSnapshots {

  private def esc(s: String) = s.replace("'", "''")

  /** p_aggregate_xml: (reportId, orgName, domain, p, sp, pct, n_records). */
  val AggregateXmlRows: Seq[(String, String, String, String, String, String, Int)] = Seq(
    ("20240125141224705995", "example.org", "example.com", "quarantine", "quarantine", "100", 1),
    ("3ceb5548498640beaeb47327e202b0b9", "addisonfoods.com", "example.com", "none", "none", "100", 1),
    ("8953b4d4a4ee4218b6ac0e2cb2667ee1", "usssa.com", "example.com", "none", "none", "100", 2),
    ("9391651994964116463", "acme.com", "example.com", "none", "none", "100", 1),
    ("aggr_report_2018_10_05_5bc7e9b4f3e8a", "ikea.com", "example.de", "none", "none", "100", 1),
    ("b043f0e264cf4ea995e93765242f6dfb", "example.net", "example.com", "none", "none", "100", 1),
    ("cfeafefe4129445e8c81018bd9177197", "Outlook.com", "example.com", "none", "none", "100", 1),
    ("example.com:1538463741", "", "example.com", "none", "reject", "100", 1),
    ("example.com:1538463741", "", "example.com", "none", "reject", "100", 1),
    ("example.com:1711897200", "", "example.com", "none", "reject", "100", 2286),
    ("sonexushealth.com:1530233361", "veeam.com", "example.com", "none", "none", "100", 1),
  )

  def aggregateXmlSqlValues: String =
    AggregateXmlRows.map { case (id, org, d, p, sp, pct, n) =>
      s"('${esc(id)}', '${esc(org)}', '${esc(d)}', '$p', '$sp', '$pct', $n)"
    }.mkString(", ")

  /** p_compressed: (reportId, domain, n_records) — the same report under
    * gz / zip / xml / base64 wrappers, hence 4 identical rows.
    */
  val CompressedRows: Seq[(String, String, Int)] = Seq(
    ("11038226378739404135", "example.com", 20),
    ("11038226378739404135", "example.com", 20),
    ("11038226378739404135", "example.com", 20),
    ("11038226378739404135", "example.com", 20),
  )

  def compressedSqlValues: String =
    CompressedRows.map { case (id, d, n) => s"('$id', '$d', $n)" }.mkString(", ")

  /** p_forensic_arf: (feedbackType, reportedDomain, deliveryResult,
    * source_ip, auth_failure).
    */
  val ForensicArfRows: Seq[(String, String, String, String, String)] = Seq(
    ("auth-failure", "cardinal.com", "delivered", "167.89.69.24", "dmarc"),
    ("auth-failure", "domain.de", "policy", "10.10.10.10", "dmarc"),
    ("auth-failure", "example.com", "delivered", "10.10.10.10", "dmarc"),
    ("auth-failure", "example.com", "delivered", "10.10.10.10", "dmarc"),
  )

  def forensicArfSqlValues: String =
    ForensicArfRows.map { case (ft, d, dr, ip, af) =>
      s"('$ft', '$d', '$dr', '$ip', '$af')"
    }.mkString(", ")

  /** p_smtp_tls_json: (organizationName, reportId, policy_domain,
    * policy_type, ok_sessions, fail_sessions, n_failures).
    */
  val SmtpTlsJsonRows: Seq[(String, String, String, String, Long, Long, Int)] = Seq(
    ("Example Inc.", "2024-01-09T00:00:00Z_example.com", "example.com", "sts", 0L, 3L, 2),
    ("Google Inc.", "2024-09-03T00:00:00Z_cardinalhealth.ca", "cardinalhealth.ca", "no-policy-found", 48L, 0L, 0),
    ("Company-X", "5065427c-23d3-47ca-b6e0-946ea0e8c4be", "company-y.example", "sts", 5326L, 303L, 3),
    ("Mail.ru", "b28254de-7b2e-be36-bb5c-4c3b92da8b25@mail.ru", "example.com", "sts", 0L, 1L, 2),
  )

  def smtpTlsJsonSqlValues: String =
    SmtpTlsJsonRows.map { case (org, id, pd, pt, ok, fail, nf) =>
      s"('${esc(org)}', '${esc(id)}', '$pd', '$pt', CAST($ok AS BIGINT), CAST($fail AS BIGINT), $nf)"
    }.mkString(", ")

  /** o_email_mime: (report_key, subject, attachment_name, mime_chars).
    * mime_chars pins the full MIME assembly (headers + CRLF-normalized
    * body + 76-col base64 attachment) to the exact character count.
    */
  val EmailMimeRows: Seq[(String, String, String, Int)] = Seq(
    ("20240125141224705995", "DMARC Aggregate Report - example.com", "dmarc-aggregate.json", 1956),
    ("3ceb5548498640beaeb47327e202b0b9", "DMARC Aggregate Report - example.com", "dmarc-aggregate.json", 1789),
    ("8953b4d4a4ee4218b6ac0e2cb2667ee1", "DMARC Aggregate Report - example.com", "dmarc-aggregate.json", 2074),
    ("9391651994964116463", "DMARC Aggregate Report - example.com", "dmarc-aggregate.json", 1824),
    ("aggr_report_2018_10_05_5bc7e9b4f3e8a", "DMARC Aggregate Report - example.de", "dmarc-aggregate.json", 1819),
    ("b043f0e264cf4ea995e93765242f6dfb", "DMARC Aggregate Report - example.com", "dmarc-aggregate.json", 1668),
    ("cfeafefe4129445e8c81018bd9177197", "DMARC Aggregate Report - example.com", "dmarc-aggregate.json", 1788),
    ("example.com:1538463741", "DMARC Aggregate Report - example.com", "dmarc-aggregate.json", 1587),
    ("example.com:1538463741", "DMARC Aggregate Report - example.com", "dmarc-aggregate.json", 1587),
    ("example.com:1711897200", "DMARC Aggregate Report - example.com", "dmarc-aggregate.json", 1042507),
    ("sonexushealth.com:1530233361", "DMARC Aggregate Report - example.com", "dmarc-aggregate.json", 1614),
  )

  def emailMimeSqlValues: String =
    EmailMimeRows.map { case (k, s, a, n) =>
      s"('${esc(k)}', '${esc(s)}', '$a', $n)"
    }.mkString(", ")
}
