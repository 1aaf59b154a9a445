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
