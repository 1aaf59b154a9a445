package graft

import graft.api.DmarcAnalytics
import graft.sources.{DmarcReader, OutputWriters}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The complete user story in one pass — what a parsedmarc-go deployment
  * does daily, on Spark: ingest raw report files → flatten to the record
  * table → persist month/org-partitioned parquet → run the dashboard
  * queries off the store with partition pruning.
  */
class EndToEndSpec extends SparkSpec {

  test("ingest -> partitioned store -> dashboard analytics round-trip") {
    val dir = Files.createTempDirectory("graft-e2e").toString
    val records = DmarcReader.aggregateRecords(spark, "/root/reference/samples/aggregate")

    // store (the ClickHouse-table equivalent)
    OutputWriters.writeDirectoryMode(records, s"$dir/records")
    val stored = spark.read.parquet(s"$dir/records")

    // dashboards off the store match dashboards off the in-flight data
    val fromStore = DmarcAnalytics.complianceRate(stored).collect().head.getDouble(0)
    val direct = DmarcAnalytics.complianceRate(records.toDF()).collect().head.getDouble(0)
    assert(fromStore == direct)

    val dailyStore = DmarcAnalytics.dailyVolume(stored)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val dailyDirect = DmarcAnalytics.dailyVolume(records.toDF())
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(dailyStore == dailyDirect && dailyStore.nonEmpty)

    // a month-windowed query only touches that month's partitions
    val oneMonth = stored.filter(col("report_month") === "201809")
    val scanned = oneMonth.queryExecution.executedPlan.toString
    assert(scanned.contains("PartitionFilters: [isnotnull(report_month"), scanned)
    assert(oneMonth.count() > 0)

    // top-sources off the store behaves identically
    val ts = DmarcAnalytics.topSources(stored, minMessages = 1, n = 10).count()
    val td = DmarcAnalytics.topSources(records.toDF(), minMessages = 1, n = 10).count()
    assert(ts == td)
  }
}
