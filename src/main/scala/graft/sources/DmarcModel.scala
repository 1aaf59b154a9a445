package graft.sources

import java.sql.Timestamp

/** Typed model of the three DMARC report families, mirroring the
  * reference's data model (/root/reference/internal/parser/types.go) and
  * the ClickHouse storage shape
  * (/root/reference/internal/storage/clickhouse/clickhouse.go:79-228).
  * Case classes are Encoder-friendly so reports travel as Datasets.
  */
final case class SourceInfo(
    ipAddress: String,
    country: String,
    reverseDns: String,
    baseDomain: String,
    name: String,
    sourceType: String,
)

final case class DkimAuth(domain: String, selector: String, result: String)
final case class SpfAuth(domain: String, scope: String, result: String)

final case class PolicyOverride(reasonType: Option[String], comment: Option[String])

final case class AggregateRecord(
    source: SourceInfo,
    count: Int,
    spfAligned: Boolean,
    dkimAligned: Boolean,
    dmarcAligned: Boolean,
    disposition: String,
    policyEvalDkim: String,
    policyEvalSpf: String,
    overrides: Seq[PolicyOverride],
    headerFrom: String,
    envelopeFrom: Option[String],
    envelopeTo: Option[String],
    dkim: Seq[DkimAuth],
    spf: Seq[SpfAuth],
)

final case class AggregateReport(
    xmlSchema: String,
    orgName: String,
    orgEmail: String,
    orgExtraContactInfo: Option[String],
    reportId: String,
    beginDate: Timestamp,
    endDate: Timestamp,
    errors: Seq[String],
    domain: String,
    adkim: String,
    aspf: String,
    p: String,
    sp: String,
    pct: String,
    fo: String,
    records: Seq[AggregateRecord],
)

/** Flattened per-record row — the `dmarc_aggregate_records` table shape
  * the reference's dashboards query (clickhouse.go:107-138).
  */
final case class AggregateRecordRow(
    report_id: String,
    org_name: String,
    source_ip_address: String,
    source_country: String,
    source_reverse_dns: String,
    source_base_domain: String,
    source_name: String,
    source_type: String,
    count: Int,
    spf_aligned: Boolean,
    dkim_aligned: Boolean,
    dmarc_aligned: Boolean,
    disposition: String,
    policy_override_reasons: Seq[String],
    policy_override_comments: Seq[String],
    envelope_from: Option[String],
    header_from: String,
    envelope_to: Option[String],
    dkim_domains: Seq[String],
    dkim_selectors: Seq[String],
    dkim_results: Seq[String],
    spf_domains: Seq[String],
    spf_scopes: Seq[String],
    spf_results: Seq[String],
    begin_date: Timestamp,
)

final case class ForensicReport(
    feedbackType: String,
    userAgent: Option[String],
    version: Option[String],
    originalEnvelopeId: Option[String],
    originalMailFrom: Option[String],
    originalRcptTo: Option[String],
    arrivalDate: Timestamp,
    subject: String,
    messageId: String,
    authenticationResults: String,
    dkimDomain: Option[String],
    source: SourceInfo,
    deliveryResult: String,
    authFailure: Seq[String],
    reportedDomain: String,
    authenticationMechanisms: Seq[String],
    sampleHeadersOnly: Boolean,
    sample: String,
)

final case class TlsFailureDetail(
    resultType: String,
    failedSessionCount: Long,
    sendingMtaIp: Option[String],
    receivingIp: Option[String],
    receivingMxHostname: Option[String],
    receivingMxHelo: Option[String],
    additionalInfoUri: Option[String],
    failureReasonCode: Option[String],
)

final case class TlsPolicy(
    policyDomain: String,
    policyType: String,
    policyStrings: Seq[String],
    mxHostPatterns: Seq[String],
    successfulSessionCount: Long,
    failedSessionCount: Long,
    failureDetails: Seq[TlsFailureDetail],
)

final case class TlsReport(
    organizationName: String,
    beginDate: Timestamp,
    endDate: Timestamp,
    contactInfo: String,
    reportId: String,
    policies: Seq[TlsPolicy],
)
