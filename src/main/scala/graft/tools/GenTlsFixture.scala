package graft.tools

import graft.GraftSession
import graft.api.TlsAnalytics
import graft.sources.DmarcReader

/** Regenerates the committed TLS fixture parquet under fixtures/tls/ —
  * the flattened `tls_report_rows` / `tls_failure_rows` snapshots of the
  * reference's sample SMTP TLS reports. The DuckDB oracles for
  * q_tls_failure_breakdown / q_tls_session_success aggregate THIS
  * snapshot while the Spark side parses the samples live, so the
  * correctness gate hash-checks parser + flatten + aggregation end to
  * end. Re-run after any TlsReportParser behavior change:
  *
  *   sbt "runMain graft.tools.GenTlsFixture"
  */
object GenTlsFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("fixtures/tls")
    val spark = GraftSession.build("gen-tls-fixture")
    val reports = DmarcReader.tlsReports(spark, "/root/reference/samples/smtp_tls")
    TlsAnalytics.tlsReportRows(reports).coalesce(1)
      .write.mode("overwrite").parquet(s"$out/tls_report_rows")
    TlsAnalytics.tlsFailureRows(reports).coalesce(1)
      .write.mode("overwrite").parquet(s"$out/tls_failure_rows")
    spark.stop()
  }
}
