package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Output surface mirroring the reference's writers
  * (/root/reference/internal/output/output.go): JSON and CSV with the
  * same per-record field layout, plus directory mode (one partition tree
  * instead of one file per report — the Spark-native equivalent).
  * Kafka/SMTP delivery is transport, not computation; on Spark the same
  * DataFrames feed writeStream sinks.
  */
object OutputWriters {

  /** First auth result or "" — getDKIMDomain/getSPFDomain semantics
    * (output.go:497-524); try_element_at because empty is legitimate.
    */
  private def first1(c: org.apache.spark.sql.Column) =
    coalesce(try_element_at(c, lit(1)), lit(""))

  /** The aggregate CSV row layout of output.go:265-273 (first dkim/spf
    * auth result flattened, RFC 3339 dates, booleans as true/false).
    */
  def aggregateCsvLayout(records: Dataset[AggregateRecordRow], reports: Dataset[AggregateReport]): DataFrame = {
    val reps = reports.toDF().select(
      col("reportId").as("r_id"), col("orgEmail"),
      date_format(col("beginDate"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("r_begin"),
      date_format(col("endDate"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("r_end"),
      col("domain"), col("adkim").as("policy_adkim"), col("aspf").as("policy_aspf"),
      col("p").as("policy_p"), col("sp").as("policy_sp"), col("pct").as("policy_pct"))
    records.toDF()
      .join(reps, col("report_id") === col("r_id"))
      .select(
        col("report_id"), col("org_name"), col("orgEmail").as("org_email"),
        col("r_begin").as("begin_date"), col("r_end").as("end_date"), col("domain"),
        col("policy_adkim"), col("policy_aspf"), col("policy_p"),
        col("policy_sp"), col("policy_pct"),
        col("source_ip_address").as("source_ip"), col("source_country"),
        col("source_reverse_dns"), col("count"), col("disposition"),
        first1(col("dkim_results")).as("dkim_result"),
        first1(col("spf_results")).as("spf_result"),
        col("dmarc_aligned"), col("header_from"), col("envelope_from"),
        first1(col("dkim_domains")).as("dkim_domain"),
        first1(col("dkim_selectors")).as("dkim_selector"),
        first1(col("spf_domains")).as("spf_domain"))
  }

  /** File mode: single CSV with header (coalesced like the reference's
    * one-file output; on a cluster drop the coalesce).
    */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** JSON lines (the reference writes a JSON document per report; JSONL
    * is the distributed-friendly equivalent).
    */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Directory mode: reference writes one timestamped file per report
    * (output.go:867-905); the scalable analogue partitions by report
    * month + org so each report lands in its own directory subtree.
    */
  def writeDirectoryMode(records: Dataset[AggregateRecordRow], path: String): Unit =
    records.toDF()
      .withColumn("report_month", date_format(col("begin_date"), "yyyyMM"))
      .write.mode("overwrite")
      .partitionBy("report_month", "org_name")
      .parquet(path)
}
