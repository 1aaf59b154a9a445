package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Grafana dashboard provisioning — the twin of the reference's
  * grafana/clickhouse/{dashboard-dmarc-overview,dashboard-dmarc-forensic,
  * datasource}.json. The reference ships dashboards whose ClickHouse
  * panel queries DEFINE its analytics surface; this emits the same
  * dashboards — identical panel ids, types, titles and grid layout —
  * with each query re-expressed in Spark SQL over the same-named
  * tables, plus a Thrift-JDBC datasource in place of the ClickHouse
  * one. Every panel also names the registry entry (`graftQuery`) that
  * computes the same answer as a typed DataFrame, so the dashboard ↔
  * operator mapping in SURVEY §2 is machine-checkable
  * (GrafanaDashboardsSpec runs EVERY panel query against live views of
  * the parsed sample corpus).
  */
object GrafanaDashboards {

  final case class GridPos(h: Int, w: Int, x: Int, y: Int)

  /** One panel: reference-identical (id, type, title, grid), Spark-SQL
    * query text, and the registry entry computing the same panel.
    */
  final case class Panel(
      id: Int, panelType: String, title: String, grid: GridPos,
      sparkSql: String, graftQuery: String)

  final case class Dashboard(
      uid: String, title: String, tags: Seq[String], panels: Seq[Panel])

  private val Week = "current_timestamp() - INTERVAL 7 DAY"
  private val Month = "current_timestamp() - INTERVAL 30 DAY"
  private val ComplianceRate =
    "round(sum(CASE WHEN dmarc_aligned THEN count ELSE 0 END) * 100.0 / sum(count), 2)"

  /** dashboard-dmarc-overview.json: 8 panels over
    * dmarc_aggregate_records (reference queries at
    * grafana/clickhouse/dashboard-dmarc-overview.json targets).
    */
  val Overview: Dashboard = Dashboard(
    uid = "dmarc-spark-overview",
    title = "DMARC Reports Overview - Spark",
    tags = Seq("dmarc", "spark"),
    panels = Seq(
      Panel(1, "timeseries", "Daily Message Volume (Last 30 Days)", GridPos(8, 12, 0, 0),
        s"SELECT to_date(begin_date) AS date, sum(count) AS total_messages FROM dmarc_aggregate_records WHERE begin_date >= $Month GROUP BY date ORDER BY date",
        "q_daily_volume"),
      Panel(2, "stat", "Total Messages (7 Days)", GridPos(4, 6, 12, 0),
        s"SELECT sum(count) AS total FROM dmarc_aggregate_records WHERE begin_date >= $Week",
        "q_total_window"),
      Panel(3, "stat", "DMARC Compliance Rate (7 Days)", GridPos(4, 6, 18, 0),
        s"SELECT $ComplianceRate AS compliance_rate FROM dmarc_aggregate_records WHERE begin_date >= $Week",
        "q_compliance_rate"),
      Panel(4, "piechart", "DMARC Alignment Status", GridPos(8, 8, 0, 8),
        s"SELECT CASE WHEN dmarc_aligned THEN 'Pass' ELSE 'Fail' END AS status, sum(count) AS messages FROM dmarc_aggregate_records WHERE begin_date >= $Week GROUP BY status ORDER BY messages DESC",
        "q_pass_fail"),
      Panel(5, "piechart", "Policy Actions", GridPos(8, 8, 8, 8),
        s"SELECT disposition, sum(count) AS messages FROM dmarc_aggregate_records WHERE begin_date >= $Week GROUP BY disposition ORDER BY messages DESC",
        "q_disposition"),
      Panel(6, "piechart", "Top Source Countries", GridPos(8, 8, 16, 8),
        s"SELECT source_country, sum(count) AS messages FROM dmarc_aggregate_records WHERE begin_date >= $Week AND source_country != 'Unknown' GROUP BY source_country ORDER BY messages DESC LIMIT 10",
        "q_top_countries"),
      Panel(7, "table", "Top Reporting Organizations", GridPos(8, 24, 0, 16),
        s"SELECT org_name AS `Organization`, sum(count) AS `Messages`, $ComplianceRate AS `Compliance Rate` FROM dmarc_aggregate_records WHERE begin_date >= $Week GROUP BY org_name ORDER BY `Messages` DESC LIMIT 20",
        "q_org_compliance"),
      Panel(8, "table", "Top Source IPs (>100 messages)", GridPos(8, 24, 0, 24),
        s"SELECT source_ip_address AS `Source IP`, source_reverse_dns AS `Reverse DNS`, source_country AS `Country`, sum(count) AS `Messages`, $ComplianceRate AS `DMARC Pass Rate` FROM dmarc_aggregate_records WHERE begin_date >= $Week GROUP BY source_ip_address, source_reverse_dns, source_country HAVING sum(count) > 100 ORDER BY `Messages` DESC LIMIT 50",
        "q_top_sources_having"),
    ))

  /** dashboard-dmarc-forensic.json: 10 panels over
    * dmarc_forensic_reports.
    */
  val Forensic: Dashboard = Dashboard(
    uid = "dmarc-spark-forensic",
    title = "DMARC Forensic Reports - Spark",
    tags = Seq("dmarc", "forensic", "spark"),
    panels = Seq(
      Panel(1, "stat", "Total Forensic Reports (7 Days)", GridPos(4, 6, 0, 0),
        s"SELECT count(*) AS total FROM dmarc_forensic_reports WHERE arrival_date >= $Week",
        "q_count_today"),
      Panel(2, "stat", "Today's Forensic Reports", GridPos(4, 6, 6, 0),
        "SELECT count(*) AS total FROM dmarc_forensic_reports WHERE arrival_date >= current_date()",
        "q_count_today"),
      Panel(3, "stat", "Unique Reported Domains", GridPos(4, 6, 12, 0),
        s"SELECT count(DISTINCT reported_domain) AS unique_domains FROM dmarc_forensic_reports WHERE arrival_date >= $Week",
        "q_uniq_exact"),
      Panel(4, "stat", "Unique Source IPs", GridPos(4, 6, 18, 0),
        s"SELECT count(DISTINCT source_ip_address) AS unique_ips FROM dmarc_forensic_reports WHERE arrival_date >= $Week",
        "q_uniq_exact"),
      Panel(5, "timeseries", "Daily Forensic Reports (Last 30 Days)", GridPos(8, 24, 0, 4),
        s"SELECT to_date(arrival_date) AS date, count(*) AS reports FROM dmarc_forensic_reports WHERE arrival_date >= $Month GROUP BY date ORDER BY date",
        "q_timeseries_count"),
      Panel(6, "piechart", "Feedback Types", GridPos(8, 8, 0, 12),
        s"SELECT feedback_type, count(*) AS reports FROM dmarc_forensic_reports WHERE arrival_date >= $Week GROUP BY feedback_type ORDER BY reports DESC",
        "q_breakdown_feedback"),
      Panel(7, "piechart", "Delivery Results", GridPos(8, 8, 8, 12),
        s"SELECT delivery_result, count(*) AS reports FROM dmarc_forensic_reports WHERE arrival_date >= $Week GROUP BY delivery_result ORDER BY reports DESC",
        "q_breakdown_feedback"),
      Panel(8, "piechart", "Top Source Countries", GridPos(8, 8, 16, 12),
        s"SELECT source_country, count(*) AS reports FROM dmarc_forensic_reports WHERE arrival_date >= $Week AND source_country != 'Unknown' GROUP BY source_country ORDER BY reports DESC LIMIT 10",
        "q_top_countries_forensic"),
      Panel(9, "table", "Top Reported Domains", GridPos(8, 24, 0, 20),
        s"SELECT reported_domain AS `Reported Domain`, count(*) AS `Report Count`, count(DISTINCT source_ip_address) AS `Unique IPs`, sort_array(collect_set(auth_failure)) AS `Auth Failures` FROM dmarc_forensic_reports WHERE arrival_date >= $Week GROUP BY reported_domain ORDER BY `Report Count` DESC LIMIT 20",
        "q_group_array"),
      Panel(10, "table", "Top Source IPs", GridPos(8, 24, 0, 28),
        s"SELECT source_ip_address AS `Source IP`, source_reverse_dns AS `Reverse DNS`, source_country AS `Country`, count(*) AS `Report Count`, count(DISTINCT reported_domain) AS `Unique Domains`, max(arrival_date) AS `Last Seen` FROM dmarc_forensic_reports WHERE arrival_date >= $Week GROUP BY source_ip_address, source_reverse_dns, source_country ORDER BY `Report Count` DESC LIMIT 50",
        "q_last_seen"),
    ))

  /** Reference-table-named views over the parsed+enriched sample
    * corpus, so every panel query above is RUNNABLE Spark SQL — the
    * forensic view flattens the nested source struct and ";"-joins the
    * auth-failure array exactly as the reference table stores them.
    */
  def registerViews(spark: SparkSession, aggregateDir: String, forensicDir: String): Unit = {
    DmarcReader.enrichedRecords(spark, aggregateDir)
      .createOrReplaceTempView("dmarc_aggregate_records")
    DmarcReader.enrichedForensic(spark, forensicDir)
      .select(
        col("feedbackType").as("feedback_type"),
        col("deliveryResult").as("delivery_result"),
        col("reportedDomain").as("reported_domain"),
        col("arrivalDate").as("arrival_date"),
        col("source.ipAddress").as("source_ip_address"),
        col("source.country").as("source_country"),
        col("source.reverseDns").as("source_reverse_dns"),
        array_join(col("authFailure"), ";").as("auth_failure"))
      .createOrReplaceTempView("dmarc_forensic_reports")
  }

  // ------------------------------------------------------------- JSON

  private def q(s: String): String = JsonText.str(s)

  private def renderPanel(p: Panel): String =
    s"""    {
       |      "datasource": "Spark DMARC",
       |      "id": ${p.id},
       |      "type": ${q(p.panelType)},
       |      "title": ${q(p.title)},
       |      "gridPos": {"h": ${p.grid.h}, "w": ${p.grid.w}, "x": ${p.grid.x}, "y": ${p.grid.y}},
       |      "fieldConfig": {"defaults": {"color": {"mode": "palette-classic"}, "unit": "short"}, "overrides": []},
       |      "targets": [
       |        {
       |          "refId": "A",
       |          "queryText": ${q(p.sparkSql)},
       |          "graftQuery": ${q(p.graftQuery)}
       |        }
       |      ]
       |    }""".stripMargin

  def renderDashboard(d: Dashboard): String =
    s"""{
       |  "uid": ${q(d.uid)},
       |  "title": ${q(d.title)},
       |  "tags": [${d.tags.map(q).mkString(", ")}],
       |  "schemaVersion": 30,
       |  "version": 1,
       |  "editable": true,
       |  "timezone": "utc",
       |  "time": {"from": "now-7d", "to": "now"},
       |  "templating": {"list": [{"name": "time_range", "label": "Time Range (Days)", "hide": 0, "includeAll": false, "multi": false, "current": {"selected": false, "text": "7", "value": "7"}, "options": [{"selected": false, "text": "1", "value": "1"}, {"selected": true, "text": "7", "value": "7"}, {"selected": false, "text": "30", "value": "30"}]}]},
       |  "panels": [
       |${d.panels.map(renderPanel).mkString(",\n")}
       |  ]
       |}""".stripMargin

  /** Datasource provisioning twin: the reference points Grafana at
    * ClickHouse HTTP (localhost:8123); the Spark engine's equivalent
    * surface is the Thrift JDBC/ODBC server (HiveServer2 protocol,
    * default port 10000) — same key shape as datasource.json.
    */
  def renderDatasource(): String =
    """{
      |  "name": "Spark DMARC",
      |  "type": "grafana-spark-sql-datasource",
      |  "access": "proxy",
      |  "url": "jdbc:hive2://localhost:10000/dmarc",
      |  "database": "dmarc",
      |  "basicAuth": false,
      |  "basicAuthUser": "",
      |  "basicAuthPassword": "",
      |  "withCredentials": false,
      |  "isDefault": true,
      |  "jsonData": {
      |    "server": "localhost",
      |    "port": 10000,
      |    "username": "default",
      |    "defaultDatabase": "dmarc",
      |    "dialTimeout": "10s",
      |    "maxIdleConns": 10,
      |    "maxOpenConns": 10,
      |    "connMaxLifetime": "14400s"
      |  },
      |  "secureJsonData": {"password": ""}
      |}""".stripMargin

  /** Emit the three provisioning artifacts the reference ships. */
  def writeAll(outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(Paths.get(outDir, "dashboard-dmarc-overview.json"),
      renderDashboard(Overview) + "\n")
    Files.writeString(Paths.get(outDir, "dashboard-dmarc-forensic.json"),
      renderDashboard(Forensic) + "\n")
    Files.writeString(Paths.get(outDir, "datasource.json"),
      renderDatasource() + "\n")
  }
}
