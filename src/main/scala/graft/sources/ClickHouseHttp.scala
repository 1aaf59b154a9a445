package graft.sources

import java.net.{HttpURLConnection, URI, URLEncoder}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** ClickHouse output over the HTTP interface — the storage connector
  * twin of internal/storage/clickhouse/clickhouse.go. The reference
  * opens a native-protocol connection and batch-inserts the five DMARC
  * tables; this client speaks ClickHouse's OTHER first-class interface
  * (HTTP on :8123 — the one the reference's own Grafana datasource.json
  * uses): the same five CREATE TABLEs (ported from
  * clickhouse.go:79-228), then per-partition batched
  * `INSERT INTO t FORMAT JSONEachRow` POSTs from the executors — the
  * production Spark→ClickHouse write shape (each task streams its
  * partition in bounded chunks; nothing is collected to the driver) —
  * plus `SELECT ... FORMAT JSONEachRow` readback for verification.
  * DateTime travels as "yyyy-MM-dd HH:mm:ss" UTC, UInt8 booleans as
  * 0/1, Array(String) as JSON arrays — ClickHouse's documented
  * JSONEachRow forms.
  */
object ClickHouseHttp {

  /** The reference's five table DDLs (clickhouse.go:79-228), MergeTree
    * ORDER BY/PARTITION BY clauses included.
    */
  val CreateTableSql: Seq[String] = Seq(
    """CREATE TABLE IF NOT EXISTS dmarc_aggregate_reports (
      |  xml_schema String, org_name String, org_email String,
      |  org_extra_contact_info Nullable(String), report_id String,
      |  begin_date DateTime, end_date DateTime, errors Array(String),
      |  domain String, adkim String, aspf String, p String, sp String,
      |  pct String, fo String
      |) ENGINE = MergeTree()
      |ORDER BY (org_name, report_id, begin_date)
      |PARTITION BY toYYYYMM(begin_date)""".stripMargin,
    """CREATE TABLE IF NOT EXISTS dmarc_aggregate_records (
      |  report_id String, org_name String, source_ip_address String,
      |  source_country String, source_reverse_dns String,
      |  source_base_domain String, source_name String, source_type String,
      |  count UInt32, spf_aligned UInt8, dkim_aligned UInt8,
      |  dmarc_aligned UInt8, disposition String,
      |  policy_override_reasons Array(String),
      |  policy_override_comments Array(String),
      |  envelope_from Nullable(String), header_from String,
      |  envelope_to Nullable(String), dkim_domains Array(String),
      |  dkim_selectors Array(String), dkim_results Array(String),
      |  spf_domains Array(String), spf_scopes Array(String),
      |  spf_results Array(String), begin_date DateTime
      |) ENGINE = MergeTree()
      |ORDER BY (org_name, report_id, source_ip_address, begin_date)
      |PARTITION BY toYYYYMM(begin_date)""".stripMargin,
    """CREATE TABLE IF NOT EXISTS dmarc_forensic_reports (
      |  feedback_type String, user_agent String, version String,
      |  original_envelope_id String, original_mail_from String,
      |  original_rcpt_to String, arrival_date DateTime, subject String,
      |  message_id String, authentication_results String,
      |  dkim_domain String, source_ip String, source_country String,
      |  delivery_result String, auth_failure Array(String),
      |  reported_domain String
      |) ENGINE = MergeTree()
      |ORDER BY (arrival_date, source_ip)
      |PARTITION BY toYYYYMM(arrival_date)""".stripMargin,
    """CREATE TABLE IF NOT EXISTS dmarc_smtp_tls_reports (
      |  organization_name String, begin_date DateTime, end_date DateTime,
      |  contact_info String, report_id String, policy_domain String,
      |  policy_type String, policy_strings Array(String),
      |  mx_host_patterns Array(String), successful_session_count UInt64,
      |  failed_session_count UInt64
      |) ENGINE = MergeTree()
      |ORDER BY (begin_date, organization_name)
      |PARTITION BY toYYYYMM(begin_date)""".stripMargin,
    """CREATE TABLE IF NOT EXISTS dmarc_smtp_tls_failures (
      |  report_id String, policy_domain String, result_type String,
      |  failed_session_count UInt64, sending_mta_ip String,
      |  receiving_ip String, receiving_mx_hostname String,
      |  receiving_mx_helo String, additional_info_uri String,
      |  failure_reason_code String
      |) ENGINE = MergeTree()
      |ORDER BY (report_id, result_type)""".stripMargin,
  )

  /** POST a statement (DDL or query); returns the response body.
    * Throws on non-200 — storage errors must fail the job, not vanish.
    */
  def exec(baseUrl: String, sql: String): String =
    post(s"$baseUrl/", sql.getBytes("UTF-8"))

  def createTables(baseUrl: String): Unit = CreateTableSql.foreach(exec(baseUrl, _))

  /** Per-partition batched JSONEachRow insert — the distributed write
    * path. Each executor task serializes its rows and POSTs them in
    * `batchRows`-sized chunks; the `query` URL parameter carries the
    * INSERT statement, the body carries the data (ClickHouse HTTP
    * semantics).
    */
  def insertDataFrame(
      baseUrl: String, table: String, df: DataFrame, batchRows: Int = 500): Unit = {
    val schema = df.schema
    val url = s"$baseUrl/?query=" +
      URLEncoder.encode(s"INSERT INTO $table FORMAT JSONEachRow", "UTF-8")
    df.rdd.foreachPartition { it =>
      it.grouped(batchRows).foreach { chunk =>
        val body = chunk.map(r => rowJson(r, schema)).mkString("", "\n", "\n")
        post(url, body.getBytes("UTF-8"))
      }
    }
  }

  /** Readback: every row of `table` as parsed JSON objects. */
  def selectAll(baseUrl: String, table: String): Seq[JValue] =
    post(s"$baseUrl/", s"SELECT * FROM $table FORMAT JSONEachRow".getBytes("UTF-8"))
      .split("\n").iterator.map(_.trim).filter(_.nonEmpty)
      .map(JsonMethods.parse(_)).toVector

  def count(baseUrl: String, table: String): Long =
    post(s"$baseUrl/", s"SELECT count() FROM $table".getBytes("UTF-8")).trim.toLong

  // ------------------------------------------------------------ wire

  private def post(url: String, body: Array[Byte]): String = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(30000)
      conn.getOutputStream.write(body)
      val code = conn.getResponseCode
      val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val resp = if (stream == null) "" else new String(stream.readAllBytes(), "UTF-8")
      if (code != 200)
        throw new java.io.IOException(s"clickhouse http $code: ${resp.take(200)}")
      resp
    } finally conn.disconnect()
  }

  // ------------------------------------------------- serialization

  private val TsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)

  // the shared escaper renders a null element as the JSON literal null
  // (a null inside an Array(String) column must not NPE the task)
  private def jsonStr(s: String): String = JsonText.str(s)

  /** One Row → one JSONEachRow line, ClickHouse's documented text
    * forms per type (UInt8 booleans as 0/1, DateTime as UTC seconds
    * resolution, arrays as JSON arrays, Nullable as null).
    */
  private[sources] def rowJson(row: Row, schema: StructType): String =
    schema.fields.zipWithIndex.map { case (f, i) =>
      val v =
        if (row.isNullAt(i)) "null"
        else f.dataType match {
          case StringType => jsonStr(row.getString(i))
          case IntegerType => row.getInt(i).toString
          case LongType => row.getLong(i).toString
          case DoubleType => row.getDouble(i).toString
          case BooleanType => if (row.getBoolean(i)) "1" else "0"
          case TimestampType => jsonStr(TsFmt.format(row.getTimestamp(i).toInstant))
          case ArrayType(StringType, _) =>
            row.getSeq[String](i).map(jsonStr).mkString("[", ",", "]")
          case other =>
            throw new IllegalArgumentException(
              s"unsupported ClickHouse JSONEachRow type for ${f.name}: $other")
        }
      s"${jsonStr(f.name)}:$v"
    }.mkString("{", ",", "}")
}
