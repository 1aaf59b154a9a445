package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** SURVEY_APPENDIX.md is the machine-generated registry table SURVEY §2
  * points at (scripts/gen_survey_appendix.py). A committed generated
  * artifact can silently rot; this suite reds the build when it does:
  * the row set must equal the LIVE registry, the headline count must
  * match, and every file:line anchor must still point at a QueryDef.
  */
class SurveyAppendixSpec extends AnyFunSuite {

  private lazy val lines =
    Files.readString(Paths.get("SURVEY_APPENDIX.md")).split("\n").toSeq
  private lazy val rows = lines.filter(l =>
    l.startsWith("| ") && !l.startsWith("| entry") && !l.startsWith("|---"))

  test("appendix rows are exactly the live registry") {
    val names = rows.map(_.split("\\|")(1).trim).toSet
    val live = SparkEntry.declaredNames.toSet
    assert(names == live,
      s"stale appendix - regenerate: missing=${(live -- names).toSeq.sorted.take(5)}, " +
        s"extra=${(names -- live).toSeq.sorted.take(5)}")
    assert(lines.exists(_.contains(s"**${live.size} entries")),
      "headline count drifted from the row set")
  }

  test("every file:line anchor still points at a QueryDef") {
    rows.foreach { r =>
      val loc = r.split("\\|")(2).trim
      val Array(f, l) = loc.split(":")
      val src = Files.readAllLines(Paths.get(f)).asScala
      assert(src(l.toInt - 1).contains("QueryDef("),
        s"$loc no longer anchors a QueryDef - regenerate the appendix")
    }
  }
}
