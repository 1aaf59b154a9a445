package graft

import graft.api.Joins
import org.apache.spark.sql.functions._

/** Binned range join: correctness at bin boundaries and the plan shape
  * (hash equi-join on (key, bin), never a nested-loop inequality join).
  */
class RangeJoinSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, Long, Long)], id: String, ts: String) = {
    import spark.implicits._
    rows.toDF("user_id", id, ts)
  }

  test("pairs at and across bin boundaries are found exactly once") {
    val w = 100L
    // pairs: (1,2) Δ=100 (exactly width, adjacent bins), (2,3) Δ=1
    // across a bin boundary, (3,4) Δ=101 > width must NOT match
    val a = frame(Seq((1L, 1L, 0L), (1L, 2L, 100L), (1L, 3L, 199L), (1L, 4L, 300L)), "a_id", "a_us")
    val b = frame(Seq((1L, 1L, 0L), (1L, 2L, 100L), (1L, 3L, 199L), (1L, 4L, 300L)), "b_id", "b_us")
    val pairs = Joins.rangeJoin(a, b, "user_id", "a_us", "b_us", w)
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)), pairs)
  }

  test("negative timestamps: the shifted two-arm probe stays complete") {
    // the 2-arm scheme's proof rests on truncating DIV's jump spacing;
    // trunc and floor disagree around zero, so pin the behavior on
    // values straddling it
    val w = 100L
    val ts = Seq(-250L, -200L, -150L, -101L, -100L, -1L, 0L, 1L, 99L, 100L, 150L)
    val a = frame(ts.zipWithIndex.map { case (t, i) => (1L, i.toLong, t) }, "a_id", "a_us")
    val b = frame(ts.zipWithIndex.map { case (t, i) => (1L, i.toLong, t) }, "b_id", "b_us")
    val got = Joins.rangeJoin(a, b, "user_id", "a_us", "b_us", w)
      .select("a_us", "b_us").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val want = (for (x <- ts; y <- ts if math.abs(x - y) <= w) yield (x, y)).sorted
    assert(got == want)
  }

  test("timestamps near ±2^63 neither throw under ANSI nor lose pairs") {
    // the old LONG `rightTs − width` shift wrapped near Long.MinValue
    // (ANSI: threw); the decimal bin scheme must find exactly the
    // BigInt-predicate pairs at both extremes
    val w = 100L
    val M = Long.MinValue
    val X = Long.MaxValue
    val ts = Seq(M, M + 50L, M + 101L, -1L, 0L, X - 101L, X - 50L, X)
    val a = frame(ts.zipWithIndex.map { case (t, i) => (1L, i.toLong, t) }, "a_id", "a_us")
    val b = frame(ts.zipWithIndex.map { case (t, i) => (1L, i.toLong, t) }, "b_id", "b_us")
    val got = Joins.rangeJoin(a, b, "user_id", "a_us", "b_us", w)
      .select("a_us", "b_us").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val want = (for (x <- ts; y <- ts
                     if (BigInt(x) - BigInt(y)).abs <= w) yield (x, y)).sorted
    assert(got == want)
  }

  test("non-positive width is rejected loudly, not an empty result") {
    val a = frame(Seq((1L, 1L, 50L)), "a_id", "a_us")
    val b = frame(Seq((1L, 2L, 50L)), "b_id", "b_us")
    intercept[IllegalArgumentException] {
      Joins.rangeJoin(a, b, "user_id", "a_us", "b_us", 0L)
    }
  }

  test("keys never mix; duplicates never emitted") {
    val a = frame(Seq((1L, 1L, 50L), (2L, 2L, 50L)), "a_id", "a_us")
    val b = frame(Seq((1L, 3L, 60L), (2L, 4L, 60L)), "b_id", "b_us")
    val rows = Joins.rangeJoin(a, b, "user_id", "a_us", "b_us", 100L).collect()
    assert(rows.length == 2)
  }

  test("plan is a hash equi-join, not a nested-loop inequality join") {
    val e = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val a = e.select(col("user_id"), col("event_id").as("a_id"), col("ts_us").as("a_us"))
    val b = e.select(col("user_id"), col("event_id").as("b_id"), col("ts_us").as("b_us"))
    val p = Joins.rangeJoin(a, b, "user_id", "a_us", "b_us", 900000000L)
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }
}
