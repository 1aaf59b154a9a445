package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over the events table: conversion funnel
  * and cohort retention — the two ClickHouse dashboard staples
  * (windowFunnel / retention aggregate combinators) the reference's
  * Grafana surface implies but Spark has no built-in for.
  *
  * Both are expressed as staged conditional aggregations over user_id:
  * every stage is a groupBy or join on the SAME key, so one hash
  * partitioning on user_id carries the whole pipeline (Catalyst reuses
  * the exchange); the per-stage frames are user-level aggregates —
  * strictly smaller than the event relation — so no step widens the
  * data. Timestamps compare as BIGINT epoch-micros (Det rules: parquet
  * nanos reach Spark and DuckDB at different precisions).
  */
object EventAnalytics extends QueryModule {

  /** events projected to the funnel/retention input shape. */
  private def base(df: DataFrame): DataFrame =
    df.select(col("user_id"), col("event_type"),
              unix_micros(col("ts")).as("ts_us"))

  /** Per-user first time reaching each funnel stage: stage N is the
    * earliest `stageType` event STRICTLY AFTER the user's stage-N−1
    * time. `prev` is a user-level aggregate (one row per qualifying
    * user), so the join fans out only to that user's stage-type events
    * and collapses again in the same aggregation.
    */
  def nextStage(events: DataFrame, prev: DataFrame, stageType: String,
                prevCol: String, outCol: String): DataFrame =
    events.filter(col("event_type") === stageType)
      .join(prev.select(col("user_id"), col(prevCol)), "user_id")
      .filter(col("ts_us") > col(prevCol))
      .groupBy("user_id")
      .agg(min(col("ts_us")).as(outCol))

  /** view → click → purchase funnel: users reaching each ordered stage. */
  def funnel(events: DataFrame): DataFrame = {
    val e = base(events)
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts_us")).as("v_us"))
    val c = nextStage(e, v, "click", "v_us", "c_us")
    val p = nextStage(e, c, "purchase", "c_us", "p_us")
    def stage(df: DataFrame, label: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(label).as("stage"), col("n_users"))
    stage(v, "1_view")
      .unionAll(stage(c, "2_click"))
      .unionAll(stage(p, "3_purchase"))
      .orderBy("stage")
  }

  /** Signup-cohort 7-day retention: cohort = epoch-day of the user's
    * first signup event; retained = any event on days (d, d+7]. Day
    * arithmetic stays in BIGINT epoch-days — exact in both engines.
    */
  def retention(events: DataFrame, horizonDays: Int = 7): DataFrame = {
    val e = base(events).withColumn("day", expr("ts_us div 86400000000"))
    val cohorts = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    val retained = e.select(col("user_id"), col("day"))
      .join(cohorts, "user_id")
      .filter(col("day") > col("cohort_day") &&
        col("day") <= col("cohort_day") + horizonDays)
      .select("user_id", "cohort_day")
      .distinct()
    cohorts.groupBy("cohort_day").agg(count(lit(1)).as("n_users"))
      .join(retained.groupBy("cohort_day").agg(count(lit(1)).as("n_retained")),
            Seq("cohort_day"), "left")
      .select(col("cohort_day"),
              col("n_users"),
              coalesce(col("n_retained"), lit(0L)).as("n_retained"),
              round(coalesce(col("n_retained"), lit(0L)).cast("double") /
                col("n_users"), 4).as("retention_7d"))
      .orderBy("cohort_day")
  }

  /** Per-user consecutive-day streak summary (see q_islands). */
  def islands(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val du = events.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val streaks = du
      .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
      .groupBy("user_id", "anchor")
      .agg(count(lit(1)).as("len"))
    streaks.groupBy("user_id")
      .agg(sum(col("len")).as("n_active_days"),
           count(lit(1)).as("n_streaks"),
           max(col("len")).as("max_streak"))
      .orderBy("user_id")
  }

  override def entries: Seq[QueryDef] = Seq(
    QueryDef(
      "q_funnel",
      (s, dir) => funnel(Tables(s, dir).events),
      Some("""WITH e AS (SELECT user_id, event_type,
             |  EPOCH_US(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
             |v AS (SELECT user_id, MIN(ts_us) AS v_us FROM e
             |  WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, MIN(ts_us) AS c_us FROM e JOIN v USING (user_id)
             |  WHERE event_type = 'click' AND ts_us > v_us GROUP BY 1),
             |p AS (SELECT e.user_id, MIN(ts_us) AS p_us FROM e JOIN c USING (user_id)
             |  WHERE event_type = 'purchase' AND ts_us > c_us GROUP BY 1)
             |SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
             |UNION ALL SELECT '2_click', COUNT(*) FROM c
             |UNION ALL SELECT '3_purchase', COUNT(*) FROM p
             |ORDER BY stage""".stripMargin),
    ),
    QueryDef(
      "q_retention",
      (s, dir) => retention(Tables(s, dir).events),
      Some("""WITH e AS (SELECT user_id, event_type,
             |  EPOCH_US(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
             |s AS (SELECT user_id, MIN(day) AS cohort_day FROM e
             |  WHERE event_type = 'signup' GROUP BY 1),
             |r AS (SELECT DISTINCT e.user_id, cohort_day FROM e JOIN s USING (user_id)
             |  WHERE day > cohort_day AND day <= cohort_day + 7),
             |n AS (SELECT cohort_day, COUNT(*) AS n_users FROM s GROUP BY 1),
             |m AS (SELECT cohort_day, COUNT(*) AS n_retained FROM r GROUP BY 1)
             |SELECT n.cohort_day, n_users,
             |COALESCE(n_retained, 0) AS n_retained,
             |ROUND(CAST(COALESCE(n_retained, 0) AS DOUBLE) / n_users, 4) AS retention_7d
             |FROM n LEFT JOIN m USING (cohort_day) ORDER BY 1""".stripMargin),
    ),
    // event-sequence transition matrix (first-order Markov counts): per
    // user, each consecutive event-type pair via lag over the user's own
    // timeline, then a global pair count + within-source probability.
    // The window partitions on user_id (bounded by one user's events);
    // event_id breaks timestamp ties so both engines see one sequence.
    QueryDef(
      "q_transition_pairs",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
        val pairs = Tables(s, dir).events
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy("prev_type", "event_type")
          .agg(count(lit(1)).as("n"))
        val w2 = Window.partitionBy("prev_type")
        pairs
          .withColumn("p", round(col("n").cast("double") / sum(col("n")).over(w2), 4))
          .orderBy("prev_type", "event_type")
      },
      Some("""WITH e AS (SELECT user_id, event_type, event_id,
             |  EPOCH_US(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
             |l AS (SELECT user_id, event_type,
             |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
             |  FROM e),
             |c AS (SELECT prev_type, event_type, COUNT(*) AS n FROM l
             |  WHERE prev_type IS NOT NULL GROUP BY 1, 2)
             |SELECT prev_type, event_type, n,
             |ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type), 4) AS p
             |FROM c ORDER BY 1, 2""".stripMargin),
    ),
    // trailing-7-day distinct users per day — the sliding-window
    // distinct that defeats naive windowing (distinct doesn't decompose
    // over a sliding frame). At-scale shape: collapse events to the
    // (day, user) distinct relation FIRST (the only corpus-sized
    // shuffle), then explode each row into the ≤7 report days it
    // contributes to and count distinct per day — shuffle volume is
    // 7 × |daily-distinct|, never event volume, and no corpus-wide
    // window state. Report days span the FULL [min, max] calendar range
    // (one tiny min/max scan, a literal in the plan): a day with no
    // events of its own still reports its trailing window, and a day
    // with no trailing activity at all reports 0 — restricting to
    // event-bearing days would silently hole the series on sparse data.
    QueryDef(
      "q_rolling_distinct",
      (s, dir) => {
        val e = Tables(s, dir).events
        val du = e.select(to_date(col("ts")).as("d"), col("user_id")).distinct()
        val days = du.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
          .select(explode(expr("sequence(lo, hi)")).as("report_day"))
        val counts = du
          .select(explode(expr("sequence(d, date_add(d, 6))")).as("report_day"), col("user_id"))
          .groupBy("report_day")
          .agg(countDistinct(col("user_id")).as("u7"))
        days.join(counts, Seq("report_day"), "left")
          .select(col("report_day"), coalesce(col("u7"), lit(0L)).as("u7"))
          .orderBy("report_day")
      },
      Some("""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
             |days AS (SELECT unnest(generate_series(MIN(d), MAX(d), INTERVAL 1 DAY))::DATE
             |  AS report_day FROM du),
             |x AS (SELECT unnest(generate_series(d, d + 6, INTERVAL 1 DAY))::DATE AS report_day,
             |  user_id FROM du),
             |c AS (SELECT report_day, COUNT(DISTINCT user_id) AS u7 FROM x GROUP BY 1)
             |SELECT days.report_day, COALESCE(u7, 0) AS u7
             |FROM days LEFT JOIN c USING (report_day)
             |ORDER BY 1""".stripMargin),
    ),
    // DAU/WAU stickiness — the engagement-ratio panel composing the two
    // distinct-count shapes above: daily actives over trailing-7-day
    // actives per calendar day (gap days surface as 0, not missing
    // rows). Both inputs are (day, user)-level frames; the ratio is an
    // identical BIGINT→double division, emitted unrounded.
    QueryDef(
      "q_stickiness",
      (s, dir) => {
        val e = Tables(s, dir).events
        val du = e.select(to_date(col("ts")).as("d"), col("user_id")).distinct()
        val days = du.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
          .select(explode(expr("sequence(lo, hi)")).as("report_day"))
        val dau = du.groupBy(col("d").as("report_day"))
          .agg(countDistinct(col("user_id")).as("dau"))
        val wau = du
          .select(explode(expr("sequence(d, date_add(d, 6))")).as("report_day"), col("user_id"))
          .groupBy("report_day")
          .agg(countDistinct(col("user_id")).as("wau"))
        days.join(dau, Seq("report_day"), "left").join(wau, Seq("report_day"), "left")
          .select(col("report_day"),
            coalesce(col("dau"), lit(0L)).as("dau"),
            coalesce(col("wau"), lit(0L)).as("wau"),
            when(coalesce(col("wau"), lit(0L)) > 0,
              coalesce(col("dau"), lit(0L)).cast("double") / col("wau"))
              .otherwise(lit(0.0)).as("stickiness"))
          .orderBy("report_day")
      },
      Some("""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
             |days AS (SELECT unnest(generate_series(MIN(d), MAX(d), INTERVAL 1 DAY))::DATE
             |  AS report_day FROM du),
             |a AS (SELECT d AS report_day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY 1),
             |x AS (SELECT unnest(generate_series(d, d + 6, INTERVAL 1 DAY))::DATE AS report_day,
             |  user_id FROM du),
             |w AS (SELECT report_day, COUNT(DISTINCT user_id) AS wau FROM x GROUP BY 1)
             |SELECT days.report_day, COALESCE(dau, 0) AS dau, COALESCE(wau, 0) AS wau,
             |CASE WHEN COALESCE(wau, 0) > 0
             |  THEN CAST(COALESCE(dau, 0) AS DOUBLE)/wau ELSE 0.0 END AS stickiness
             |FROM days LEFT JOIN a USING (report_day) LEFT JOIN w USING (report_day)
             |ORDER BY 1""".stripMargin),
    ),
    // gaps-and-islands: per-user consecutive-day activity streaks via
    // the classic day − row_number anchor (consecutive days share one
    // anchor date). The corpus collapses to the (user, day) distinct
    // relation FIRST, so the window partitions on user_id over ≤31 rows
    // per user — per-partition state is calendar-bounded no matter how
    // many events a user has, and one hash partitioning on user_id
    // carries distinct → window → both groupBys.
    // robust outlier detection per event type: median + MAD (median
    // absolute deviation), flag |v − med| > 3·1.4826·MAD — the robust
    // z-score that a mean/stddev rule gets wrong under the very
    // outliers it hunts. MAD is two SEQUENTIAL order statistics, so the
    // event relation is scanned twice (median, then deviations); the
    // slim (type, value, med, adev) deviation frame is persisted so the
    // final flag pass reads the cache instead of a third scan. Both
    // per-type quantile frames broadcast back — events itself never
    // shuffles. At 100 TB the groupBy-percentile swaps to an approx
    // sketch cutoff, same shape.
    QueryDef(
      "q_mad_outliers",
      (s, dir) => {
        val e = Tables(s, dir).events.select(col("event_type"), col("value"))
        val med = e.groupBy("event_type")
          .agg(expr("percentile(value, 0.5)").as("med"))
        val dev = e.join(broadcast(med), Seq("event_type"))
          .withColumn("adev", abs(col("value") - col("med")))
          .persist()
        val mad = dev.groupBy("event_type")
          .agg(expr("percentile(adev, 0.5)").as("mad"))
        val out = dev.join(broadcast(mad), Seq("event_type"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("adev") > lit(3.0) * (lit(1.4826) * col("mad")), 1L)
              .otherwise(0L)).as("n_outliers"),
            round(max(col("med")), 4).as("med"),
            round(max(col("mad")), 4).as("mad"))
          .orderBy("event_type")
        Materialize(out, dev)
      },
      Some("""WITH med AS (SELECT event_type, QUANTILE_CONT(value, 0.5) med
             |  FROM events GROUP BY 1),
             |dev AS (SELECT e.event_type, value, med, ABS(value - med) adev
             |  FROM events e JOIN med USING (event_type)),
             |mad AS (SELECT event_type, QUANTILE_CONT(adev, 0.5) mad FROM dev GROUP BY 1)
             |SELECT d.event_type, COUNT(*) AS n,
             |CAST(SUM(CASE WHEN adev > 3.0*(1.4826*mad) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             |ROUND(MAX(med),4) AS med, ROUND(MAX(d.mad),4) AS mad
             |FROM (SELECT dev.*, mad.mad FROM dev JOIN mad USING (event_type)) d
             |GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
    // EWMA smoothing of the daily value series per event type — the
    // forecasting-panel shape (ClickHouse's exponentialMovingAverage
    // twin). Deterministic cross-engine because α = 0.5 keeps every
    // weight an exact power of two (s·0.5 and x·0.5 are exponent
    // shifts) and the fold runs SEQUENTIALLY in day order in both
    // engines (Spark aggregate over the day-sorted array ≡ DuckDB
    // list_reduce over list(v ORDER BY day), zero-seeded via prepend).
    // The collect_list state is the ~30-day daily series per type —
    // calendar-bounded, never event rows.
    QueryDef(
      "q_ewma_daily",
      (s, dir) => {
        val e = Tables(s, dir).events
        e.groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(Det.moneySum(col("value")).as("v"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            array_sort(collect_list(struct(col("day"), col("v"))))
              .getField("v").as("vs"))
          .select(col("event_type"), col("n_days"),
            expr("aggregate(vs, CAST(0 AS DOUBLE), (s, x) -> s * 0.5 + x * 0.5)")
              .as("ewma"))
          .orderBy("event_type")
      },
      Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))),2) AS DOUBLE) AS v
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type, COUNT(*) AS n_days,
             |list_reduce(list_prepend(CAST(0 AS DOUBLE), list(v ORDER BY day)), (s, x) -> s * 0.5 + x * 0.5) AS ewma
             |FROM d GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
    // trailing-7-day MEDIAN of the per-type daily series — the robust
    // smoothing twin of q_ewma_daily (a burst day shifts a mean but not
    // a median). The window partitions on event_type (hash-partitioned,
    // never a single-partition total order) over the already-aggregated
    // daily frame, so per-partition state is one tiny series. The frame
    // is pinned to exactly 7 rows (leading rows with shorter windows
    // are dropped via row_number): an odd count makes the median the
    // exact middle ELEMENT in both engines — no interpolation
    // arithmetic to drift a ulp cross-engine.
    QueryDef(
      "q_rolling_median",
      (s, dir) => {
        val e = Tables(s, dir).events
        val daily = e.groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(Det.moneySum(col("value")).as("v"))
        val w = Window.partitionBy("event_type").orderBy("day")
        daily.select(col("event_type"), col("day"), col("v"),
            expr("percentile(v, 0.5)").over(w.rowsBetween(-6, 0)).as("med7"),
            row_number().over(w).as("rn"))
          .filter(col("rn") >= 7).drop("rn")
          .orderBy("event_type", "day")
      },
      Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))),2) AS DOUBLE) AS v
             |  FROM events GROUP BY 1, 2),
             |m AS (SELECT event_type, day, v,
             |  MEDIAN(v) OVER (PARTITION BY event_type ORDER BY day
             |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7,
             |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn FROM d)
             |SELECT event_type, day, v, med7 FROM m WHERE rn >= 7
             |ORDER BY 1, 2""".stripMargin),
    ),
    // new-vs-returning users per day — the growth panel: first-touch
    // day per user (one aggregate), then each active (user, day) splits
    // into new/returning. Both frames are user-level (never event
    // rows); the join shares the user_id hash partitioning.
    QueryDef(
      "q_new_vs_returning",
      (s, dir) => {
        val e = Tables(s, dir).events
        val fs = e.groupBy("user_id").agg(min(to_date(col("ts"))).as("first_day"))
        val du = e.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        du.join(fs, "user_id")
          .groupBy("day")
          .agg(count(lit(1)).as("active_users"),
            sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("new_users"),
            sum(when(col("day") > col("first_day"), 1L).otherwise(0L)).as("returning_users"))
          .orderBy("day")
      },
      Some("""WITH fs AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
             |  FROM events GROUP BY 1),
             |du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
             |SELECT day, COUNT(*) AS active_users,
             |CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
             |CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT) AS returning_users
             |FROM du JOIN fs USING (user_id) GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
    // Gini concentration of per-user value — the inequality panel (how
    // concentrated is spend/engagement): the sort-based exact formula
    // G = 2·Σ(rank·v)/(n·Σv) − (n+1)/n over values ranked ascending
    // with a user_id tiebreak. rank·v products and both sums are exact
    // (BIGINT × DECIMAL), the final expression is one identical IEEE
    // chain — emitted UNROUNDED (rounding a derived double is the
    // cross-engine tie trap). The global rank runs over the per-USER
    // frame, corpus-collapsed first — same documented total-order
    // scope as q_ntile.
    QueryDef(
      "q_gini_value",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables(s, dir).events
        val u = e.groupBy("user_id")
          .agg(sum(col("value").cast(Det.Money)).as("v"))
        val r = u
          .withColumn("rk", row_number().over(Window.orderBy("v", "user_id")))
          .withColumn("n", count(lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .withColumn("tot", sum("v").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        r.agg(
          (lit(2.0) * sum(col("rk") * col("v")).cast("double") /
            (max("n") * max("tot").cast("double")) -
            (max("n").cast("double") + lit(1.0)) / max("n")).as("gini"),
          max("n").as("n_users"))
      },
      Some("""WITH u AS (SELECT user_id, SUM(CAST(value AS DECIMAL(18,2))) AS v
             |  FROM events GROUP BY 1),
             |r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, user_id) AS rk,
             |      COUNT(*) OVER () AS n, SUM(v) OVER () AS tot FROM u)
             |SELECT 2.0*CAST(SUM(rk*v) AS DOUBLE)/(MAX(n)*CAST(MAX(tot) AS DOUBLE))
             |  - (CAST(MAX(n) AS DOUBLE)+1.0)/MAX(n) AS gini,
             |MAX(n) AS n_users FROM r""".stripMargin),
    ),
    QueryDef(
      "q_islands",
      (s, dir) => islands(Tables(s, dir).events),
      Some("""WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |r AS (SELECT user_id, day,
             |  day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS anchor
             |  FROM du),
             |g AS (SELECT user_id, anchor, COUNT(*) AS len FROM r GROUP BY 1, 2)
             |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
             |COUNT(*) AS n_streaks, MAX(len) AS max_streak
             |FROM g GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
  )
}
