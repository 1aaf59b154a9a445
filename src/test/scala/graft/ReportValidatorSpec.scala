package graft

import graft.sources.{DmarcReader, ReportValidator}
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

class ReportValidatorSpec extends AnyFunSuite {

  private val samples = "/root/reference/samples"
  private def bytes(p: String) = Files.readAllBytes(Paths.get(p))

  test("valid sample report passes validation") {
    val r = ReportValidator.validateAggregate(
      bytes(s"$samples/aggregate/example.net!example.com!1529366400!1529452799.xml"))
    assert(r.valid, r.errors)
  }

  test("invalid XML fails with structural error") {
    val r = ReportValidator.validateAggregate(bytes(s"$samples/aggregate/invalid_xml.xml"))
    assert(!r.valid && r.errors.contains("Invalid XML format"))
  }

  test("missing fields produce the reference's error messages") {
    val xml =
      """<feedback><report_metadata><email>not-an-email</email>
        |<report_id>r</report_id>
        |<date_range><begin>100</begin><end>50</end></date_range></report_metadata>
        |<policy_published><domain>bad_domain</domain><p>bogus</p></policy_published>
        |</feedback>""".stripMargin
    val r = ReportValidator.validateAggregate(xml.getBytes)
    assert(!r.valid)
    assert(r.errors.contains("Missing organization name"))
    assert(r.errors.contains("Invalid domain format in policy published"))
    assert(r.errors.contains("Invalid DMARC policy value"))
    assert(r.errors.exists(_.contains("end date is before begin date")))
    assert(r.warnings.contains("Invalid email format"))
    assert(r.warnings.contains("No records found in report"))
  }

  test("report id and size rules") {
    assert(!ReportValidator.validateReportId("").valid)
    assert(!ReportValidator.validateReportId("a" * 300).valid)
    assert(!ReportValidator.validateReportId("bad<script>").valid)
    assert(ReportValidator.validateReportId("example.com:123").valid)
    assert(!ReportValidator.validateSize(0, 100).valid)
    assert(!ReportValidator.validateSize(200, 100).valid)
    assert(ReportValidator.validateSize(50, 100).valid)
  }

  test("email/domain/ip/policy helpers match validator.go semantics") {
    import ReportValidator._
    assert(isValidEmail("a.b+c@example.co"))
    assert(!isValidEmail("not-an-email"))
    assert(isValidDomain("mail.example.com") && !isValidDomain("bad_domain") && !isValidDomain(""))
    assert(isValidIpLiteral("192.168.1.1") && isValidIpLiteral("2001:db8::1"))
    assert(!isValidIpLiteral("notanip"))
    assert(isValidPolicy("none") && isValidPolicy("reject") && !isValidPolicy("p=none"))
  }
}

class ReportValidatorSparkSpec extends SparkSpec {
  test("distributed archive audit flags exactly the bad files") {
    val df = ReportValidator.validateDirectory(
      spark, "/root/reference/samples/aggregate", "*.xml").cache()
    val bad = df.filter(!org.apache.spark.sql.functions.col("valid"))
      .select("path").collect().map(_.getString(0)).toSet
    assert(bad.exists(_.contains("invalid_xml.xml")))
    assert(df.count() > bad.size) // most sample files are valid
  }
}
