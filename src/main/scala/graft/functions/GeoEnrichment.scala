package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic geo/rDNS enrichment replacing the reference's
  * network-backed lookups (parser.go:1272-1301: utils.GetGeoLocation +
  * utils.GetReverseDNS feeding Source.Country/ReverseDNS/BaseDomain/
  * Name). No network or GeoIP DB exists here, so the range lookup is a
  * broadcast fixture table keyed by the IPv4 first octet (a stand-in
  * for CIDR ranges — the join shape is identical for real MaxMind-style
  * range tables: broadcast the ranges, join on the prefix key).
  * Unmatched prefixes keep the reference's offline defaults
  * ("Unknown" country, empty rDNS).
  */
object GeoEnrichment {

  /** (first_octet, country, rdns_zone) — single source of truth; the
    * DuckDB oracle VALUES clause is generated from this same list so
    * the two engines can never drift.
    */
  val Fixture: Seq[(Int, String, String)] = Seq(
    (3, "US", "mail.telecom-us.com"), (13, "US", "edge.cloudfront.net"),
    (17, "FR", "mx.telecom-fr.fr"), (23, "GB", "smtp.telecom-gb.co.uk"),
    (31, "DE", "mail.telecom-de.de"), (47, "JP", "mx.telecom-jp.jp"),
    (59, "BR", "mail.telecom-br.br"), (71, "IN", "mx.telecom-in.in"),
    (83, "CN", "smtp.telecom-cn.cn"), (97, "AU", "mail.telecom-au.au"),
    (101, "CA", "mx.telecom-ca.ca"), (113, "NL", "mail.telecom-nl.nl"),
    (127, "SE", "mx.telecom-se.se"), (139, "SG", "smtp.telecom-sg.sg"),
    (151, "KR", "mail.telecom-kr.kr"), (167, "ZA", "mx.telecom-za.za"),
    // ranges covering the reference's sample-report source IPs
    // (12/72/100 ARIN-US, 109 RIPE-GB, 198 ARIN-CA, 199 ARIN-US;
    // 234 is reserved space and intentionally unmatched → "Unknown")
    // 10: the forensic samples' Source-IP (10.10.10.10) — a lab address
    // the deterministic fixture maps so the forensic geo path is testable
    (10, "US", "mail.intranet-lab.example"),
    (12, "US", "mail.telecom-us.com"), (72, "US", "edge.cloudfront.net"),
    (100, "US", "mail.telecom-us.com"), (109, "GB", "smtp.telecom-gb.co.uk"),
    (198, "CA", "mx.telecom-ca.ca"), (199, "US", "mail.telecom-us.com"),
  )

  def geoTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Fixture.toDF("octet1", "geo_country", "rdns_zone")
  }

  /** `geo(octet1, country, zone)` VALUES body for the DuckDB twin. */
  def sqlValues: String =
    Fixture.map { case (o, c, z) => s"($o, '$c', '$z')" }.mkString(", ")

  /** Enrich a frame carrying an IPv4 string column: adds (or replaces)
    * source_country, source_reverse_dns, source_base_domain,
    * source_name — the Source fields the reference fills online. The
    * fixture side broadcasts; the fact side never shuffles.
    */
  /** Enrich a forensic-report-shaped frame (nested `source` SourceInfo
    * struct) in place: the reference fills Source.Country/ReverseDNS/
    * BaseDomain/Name online for forensic reports exactly as for
    * aggregate records (parser.go:1272-1301); the offline parser emits
    * "Unknown"/empty. Rebuilds the struct so downstream consumers
    * (DmarcAnalytics.topForensicSources, the forensic Top Source
    * Countries panel) see real countries.
    */
  def enrichForensic(forensic: DataFrame): DataFrame =
    enrich(forensic.withColumn("__fip", col("source.ipAddress")), "__fip")
      .withColumn("source", struct(
        col("source.ipAddress").as("ipAddress"),
        col("source_country").as("country"),
        col("source_reverse_dns").as("reverseDns"),
        col("source_base_domain").as("baseDomain"),
        col("source_name").as("name"),
        col("source.sourceType").as("sourceType")))
      .drop("__fip", "source_country", "source_reverse_dns",
            "source_base_domain", "source_name")

  def enrich(df: DataFrame, ipCol: String): DataFrame = {
    // try_cast, not cast: a malformed or empty IP (a forensic report
    // with no Source-IP field, a corrupt record) must enrich to
    // Unknown, not throw CAST_INVALID_INPUT under ANSI and kill the
    // whole job — at 100 TB one bad row WILL exist
    val withKey = df.withColumn("__octet1",
      expr(s"try_cast(split(`$ipCol`, '\\\\.')[0] AS INT)"))
    val matched = withKey.join(broadcast(geoTable(df.sparkSession)),
      withKey("__octet1") === col("octet1"), "left")
    val rdns = when(col("rdns_zone").isNotNull,
        concat(lit("host-"), regexp_replace(col(ipCol), "\\.", "-"),
               lit("."), col("rdns_zone")))
      .otherwise(lit(""))
    matched
      .withColumn("source_country", coalesce(col("geo_country"), lit("Unknown")))
      .withColumn("source_reverse_dns", rdns)
      .withColumn("source_base_domain", NetFunctions.baseDomain(rdns))
      .withColumn("source_name", rdns)
      .drop("__octet1", "octet1", "geo_country", "rdns_zone")
  }
}
