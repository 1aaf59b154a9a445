package graft

import graft.operators.EventAnalytics
import org.apache.spark.sql.functions._

/** Gaps-and-islands semantics on a hand-built activity log (the
  * registry entry is additionally DuckDB-oracled on testdata).
  */
class IslandsSpec extends SparkSpec {

  private def events(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    // (user_id, day_number) → one event at noon of that day
    rows.toDF("user_id", "day_n")
      .select(col("user_id"),
              timestamp_seconds(col("day_n") * 86400L + 43200L).as("ts"),
              lit("click").as("event_type"))
  }

  test("islands split on calendar gaps and merge duplicate days") {
    val e = events(Seq(
      // user 1: days 1,2,3 then 5,6 → streaks of 3 and 2
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 5L), (1L, 6L),
      // user 2: one day, hit three times → a single 1-day streak
      (2L, 10L), (2L, 10L), (2L, 10L),
      // user 3: alternating days → three 1-day streaks
      (3L, 1L), (3L, 3L), (3L, 5L),
    ))
    val got = EventAnalytics.islands(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 5L, 2L, 3L),
      (2L, 1L, 1L, 1L),
      (3L, 3L, 3L, 1L),
    ))
  }

  test("testdata invariants: active days partition into streaks") {
    val rows = SparkEntry.queries("q_islands")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (active, streaks, maxStreak) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(maxStreak >= 1 && maxStreak <= active)
      assert(streaks >= 1 && streaks <= active)
      // streaks of at least maxStreak + (streaks-1) singletons can't
      // exceed the active-day total
      assert(maxStreak + (streaks - 1) <= active)
    }
    // totals reconcile with the distinct (user, day) relation
    val total = rows.map(_.getLong(1)).sum
    val expected = Tables(spark, sfDir).events
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    assert(total === expected)
  }
}
