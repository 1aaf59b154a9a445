package graft

import graft.sources.{DmarcReader, OutputWriters}
import java.nio.file.Files

class OutputWritersSpec extends SparkSpec {

  private val samples = "/root/reference/samples/aggregate"

  test("aggregate CSV layout matches output.go:265-273 header set") {
    val reports = DmarcReader.aggregateReports(spark, samples, "*.xml")
    val records = DmarcReader.aggregateRecords(spark, samples, "*.xml")
    val df = OutputWriters.aggregateCsvLayout(records, reports)
    val expected = Seq(
      "report_id", "org_name", "org_email", "begin_date", "end_date",
      "domain", "policy_adkim", "policy_aspf", "policy_p", "policy_sp", "policy_pct",
      "source_ip", "source_country", "source_reverse_dns", "count",
      "disposition", "dkim_result", "spf_result", "dmarc_aligned",
      "header_from", "envelope_from", "dkim_domain", "dkim_selector", "spf_domain")
    assert(df.columns.toSeq == expected)
    assert(df.count() > 0)
  }

  test("forensic CSV layout matches output.go:334-398 header set") {
    val forensic = DmarcReader.forensicReports(spark, "/root/reference/samples/forensic", "*.eml")
    val df = OutputWriters.forensicCsvLayout(forensic)
    assert(df.columns.toSeq == Seq(
      "feedback_type", "user_agent", "version", "original_envelope_id",
      "original_mail_from", "original_rcpt_to", "arrival_date", "subject",
      "message_id", "authentication_results", "dkim_domain", "source_ip",
      "source_country", "delivery_result", "auth_failure", "reported_domain"))
    assert(df.count() == 4)
  }

  test("tls CSV layout: one row per policy or per failure detail") {
    val tls = DmarcReader.tlsReports(spark, "/root/reference/samples/smtp_tls")
    val df = OutputWriters.tlsCsvLayout(tls)
    assert(df.columns.toSeq == Seq(
      "organization_name", "begin_date", "end_date", "contact_info", "report_id",
      "policy_domain", "policy_type", "successful_session_count", "failed_session_count",
      "failure_result_type", "failure_sending_mta_ip", "failure_receiving_ip"))
    import org.apache.spark.sql.functions._
    // policies without failures appear exactly once with empty failure cols
    val noFail = df.filter(col("failure_result_type") === "")
    val withFail = df.filter(col("failure_result_type") =!= "")
    assert(noFail.count() > 0 && withFail.count() > 0)
    // rfc8460 sample: 3 failure details -> 3 rows for that report
    assert(df.filter(col("report_id") === "5065427c-23d3-47ca-b6e0-946ea0e8c4be").count() == 3)
  }

  test("csv/json/directory writers round-trip") {
    val dir = Files.createTempDirectory("graft-out").toString
    val reports = DmarcReader.aggregateReports(spark, samples, "*.xml")
    val records = DmarcReader.aggregateRecords(spark, samples, "*.xml")
    val flat = OutputWriters.aggregateCsvLayout(records, reports)

    OutputWriters.writeCsv(flat, s"$dir/csv")
    val csvBack = spark.read.option("header", "true").csv(s"$dir/csv")
    assert(csvBack.count() == flat.count())

    OutputWriters.writeJson(flat, s"$dir/json")
    assert(spark.read.json(s"$dir/json").count() == flat.count())

    OutputWriters.writeDirectoryMode(records, s"$dir/dirmode")
    val back = spark.read.parquet(s"$dir/dirmode")
    assert(back.count() == records.count())
    // partition pruning works on the directory layout
    val pruned = back.filter(org.apache.spark.sql.functions.col("report_month") === "201809")
    assert(pruned.count() > 0 && pruned.count() < back.count())
  }
}
