package graft

import graft.operators.EventAnalytics
import org.apache.spark.sql.functions._

/** Semantic checks for the funnel/retention operators on a hand-built
  * event log with known answers (the registry entries are additionally
  * DuckDB-oracled on testdata).
  */
class EventAnalyticsSpec extends SparkSpec {

  private def events(rows: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    // (user_id, seconds, event_type) → the events shape funnel() reads
    rows.toDF("user_id", "sec", "event_type")
      .select(col("user_id"),
              timestamp_seconds(col("sec")).as("ts"),
              col("event_type"))
  }

  test("funnel counts only ordered stage progressions") {
    val e = events(Seq(
      // user 1: full ordered funnel
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: purchase BEFORE click — reaches stage 2 only
      (2L, 10L, "view"), (2L, 30L, "click"), (2L, 20L, "purchase"),
      // user 3: click before any view — stage 1 only (view comes later)
      (3L, 50L, "view"), (3L, 40L, "click"),
      // user 4: never views — contributes nothing
      (4L, 10L, "click"), (4L, 20L, "purchase"),
      // user 5: simultaneous view+click — strict ordering rejects the tie
      (5L, 10L, "view"), (5L, 10L, "click"),
    ))
    val got = EventAnalytics.funnel(e).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("1_view" -> 4L, "2_click" -> 2L, "3_purchase" -> 1L))
  }

  test("retention windows are (signup_day, signup_day + 7]") {
    val day = 86400L
    val e = events(Seq(
      // user 1: signs up day 0, active day 3 → retained
      (1L, 0L, "signup"), (1L, 3 * day, "click"),
      // user 2: signs up day 0, next activity day 8 → NOT retained
      (2L, 0L, "signup"), (2L, 8 * day + 1, "click"),
      // user 3: signs up day 0, same-day activity only → NOT retained
      (3L, 0L, "signup"), (3L, 100L, "view"),
      // user 4: signs up day 1, active exactly day 8 (d+7, inclusive)
      (4L, day, "signup"), (4L, 8 * day, "purchase"),
      // user 5: activity BEFORE its signup never counts
      (5L, 2 * day, "view"), (5L, 3 * day, "signup"),
    ))
    val got = EventAnalytics.retention(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (0L, 3L, 1L, 0.3333), // users 1,2,3 — only user 1 retained
      (1L, 1L, 1L, 1.0),    // user 4 at the inclusive d+7 boundary
      (3L, 1L, 0L, 0.0),    // user 5: nothing after signup
    ))
  }

  test("funnel stage frames stay user-level (one row per user max)") {
    val e = events(Seq(
      (1L, 10L, "view"), (1L, 11L, "view"), (1L, 12L, "view"),
      (1L, 20L, "click"), (1L, 21L, "click"),
      (1L, 30L, "purchase"), (1L, 31L, "purchase"),
    ))
    val got = EventAnalytics.funnel(e).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // repeated events never inflate stage counts
    assert(got === Map("1_view" -> 1L, "2_click" -> 1L, "3_purchase" -> 1L))
  }
}
