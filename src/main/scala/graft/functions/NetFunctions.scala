package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Enrichment functions mirroring /root/reference/internal/utils/utils.go,
  * built entirely from `org.apache.spark.sql.functions` built-ins so they
  * stay inside whole-stage codegen — no UDFs on the 100 TB hot path.
  */
object NetFunctions {

  /** utils.GetBaseDomain (utils.go:113-146): last two labels, with CDN
    * special cases taking three (akamaiedge.net, cloudfront.net,
    * fastly.com, herokuapp.com).
    */
  def baseDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".", element_at(parts, -3), element_at(parts, -2), element_at(parts, -1))
    when(host.isNull || host === "", host)
      .when(n < 2, host)
      .when(n >= 3 && element_at(parts, -2) === "akamaiedge", last3)
      .when(n >= 3 && last2.isin("cloudfront.net", "fastly.com", "herokuapp.com"), last3)
      .otherwise(last2)
  }

  /** The same function as a SQL fragment for the DuckDB oracle (1-based
    * negative indexing differs between engines, so spell it out).
    */
  def baseDomainSqlDuck(host: String): String =
    s"""CASE WHEN $host IS NULL OR $host = '' THEN $host
       |WHEN len(string_split($host,'.')) < 2 THEN $host
       |WHEN len(string_split($host,'.')) >= 3
       |     AND string_split($host,'.')[-2] = 'akamaiedge'
       |  THEN string_split($host,'.')[-3] || '.' || string_split($host,'.')[-2] || '.' || string_split($host,'.')[-1]
       |WHEN len(string_split($host,'.')) >= 3
       |     AND string_split($host,'.')[-2] || '.' || string_split($host,'.')[-1]
       |         IN ('cloudfront.net','fastly.com','herokuapp.com')
       |  THEN string_split($host,'.')[-3] || '.' || string_split($host,'.')[-2] || '.' || string_split($host,'.')[-1]
       |ELSE string_split($host,'.')[-2] || '.' || string_split($host,'.')[-1] END""".stripMargin

  private val Ipv4Octet = "(25[0-5]|2[0-4][0-9]|[01]?[0-9]?[0-9])"
  val Ipv4Regex: String = s"^$Ipv4Octet\\.$Ipv4Octet\\.$Ipv4Octet\\.$Ipv4Octet$$"

  /** utils.IsValidIPAddress for IPv4 (regex form portable to any engine);
    * IPv6 accepts the common hex-groups form.
    */
  def isValidIpv4(ip: Column): Column = ip.rlike(Ipv4Regex)

  def isValidIpv6(ip: Column): Column =
    ip.rlike("^([0-9a-fA-F]{0,4}:){2,7}[0-9a-fA-F]{0,4}$") && ip.contains(":")

  def isValidIp(ip: Column): Column = isValidIpv4(ip) || isValidIpv6(ip)

  /** utils.NormalizeHost: lowercase + strip trailing dot. */
  def normalizeHost(host: Column): Column =
    regexp_replace(lower(host), "\\.$", "")

  /** utils.NormalizeEmail / NormalizeDomain: lowercase + trim. */
  def normalizeEmail(email: Column): Column = lower(trim(email))
  def normalizeDomain(domain: Column): Column = lower(trim(domain))

  /** utils.SanitizeString: strip control chars except \t \n \r, trim. */
  def sanitizeString(s: Column): Column =
    trim(regexp_replace(s, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))

  /** utils.ParseTimestamp: epoch seconds → UTC timestamp. */
  def parseTimestamp(epochSeconds: Column): Column =
    timestamp_seconds(epochSeconds.cast("long"))
}
