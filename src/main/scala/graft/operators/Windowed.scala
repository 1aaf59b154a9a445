package graft.operators

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / analytic functions + gap-based sessionization.
  *
  * Determinism: every window orders by a unique key tuple; cumulative
  * sums run over exact decimals; timestamps compared at micros (both
  * engines see identical BIGINT epoch-micros).
  *
  * Scale: each query shuffles once on the partition key (event_type /
  * user_id) and streams the window — no driver-side state. Sessionize is
  * the batch twin of streaming.EventsStreaming's state machine.
  */
object Windowed extends QueryModule {

  /** The lag/cumsum sessionization oracle — shared by q_sessionize and
    * its streaming twin st_sessionize (same fold semantics, same
    * projection), so the stream output is hash-gated against the exact
    * SQL the batch plan is.
    */
  private[graft] val SessionizeSql: String =
    """WITH base AS (
      |  SELECT user_id, event_id, EPOCH_US(CAST(ts AS TIMESTAMP)) AS ts_us, value
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 21600000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM (SELECT *, LAG(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM base)),
      |sessions AS (
      |  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
      |CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))),2) AS DOUBLE) AS total_value
      |FROM sessions GROUP BY 1,2 ORDER BY 1,2""".stripMargin
  import Det._

  override def entries: Seq[QueryDef] = Seq(
    QueryDef(
      "q_window_running_total",
      (s, dir) => {
        val e = Tables(s, dir).events
        val daily = e.groupBy(col("event_type"), col("ts").cast("date").as("date"))
          .agg(sum(col("value").cast(Money)).as("daily_dec"))
        val w = Window.partitionBy("event_type").orderBy("date")
        daily
          .withColumn("running_value", sum(col("daily_dec")).over(w).cast("double"))
          .select(col("event_type"), col("date"),
                  col("daily_dec").cast("double").as("daily_value"), col("running_value"))
          .orderBy("event_type", "date")
      },
      Some("""SELECT event_type, date,
             |CAST(daily_dec AS DOUBLE) AS daily_value,
             |CAST(SUM(daily_dec) OVER (PARTITION BY event_type ORDER BY date) AS DOUBLE) AS running_value
             |FROM (SELECT event_type, CAST(ts AS DATE) AS date,
             |      SUM(CAST(value AS DECIMAL(18,2))) AS daily_dec
             |      FROM events GROUP BY 1,2)
             |ORDER BY event_type, date""".stripMargin),
    ),
    QueryDef(
      "q_window_moving_avg",
      (s, dir) => {
        val e = Tables(s, dir).events
        val daily = e.groupBy(col("ts").cast("date").as("date"))
          .agg(count(lit(1)).as("n_events"))
        val w = Window.orderBy("date").rowsBetween(-6, 0)
        daily.withColumn("ma7", round(avg(col("n_events")).over(w), 4))
          .orderBy("date")
      },
      Some("""SELECT date, n_events,
             |ROUND(AVG(n_events) OVER (ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),4) AS ma7
             |FROM (SELECT CAST(ts AS DATE) AS date, COUNT(*) AS n_events
             |      FROM events GROUP BY 1)
             |ORDER BY date""".stripMargin),
    ),
    QueryDef(
      "q_window_topn_per_group",
      (s, dir) => {
        val t = Tables(s, dir)
        val joined = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
        val w = Window.partitionBy("c_mktsegment").orderBy(desc("o_totalprice"), asc("o_orderkey"))
        joined.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("c_mktsegment").as("segment"), col("o_orderkey"),
                  col("o_totalprice"), col("rn"))
          .orderBy("segment", "rn")
      },
      Some("""SELECT c_mktsegment AS segment, o_orderkey, o_totalprice, rn FROM (
             |  SELECT c_mktsegment, o_orderkey, o_totalprice,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
             |  FROM orders JOIN customer ON o_custkey = c_custkey)
             |WHERE rn <= 3 ORDER BY segment, rn""".stripMargin),
    ),
    QueryDef(
      "q_window_lag_delta",
      (s, dir) => {
        val e = Tables(s, dir).events
        val daily = e.groupBy(col("user_id"), col("ts").cast("date").as("date"))
          .agg(count(lit(1)).as("n_events"))
        val w = Window.partitionBy("user_id").orderBy("date")
        daily.withColumn("delta", col("n_events") - lag(col("n_events"), 1).over(w))
          .orderBy("user_id", "date")
      },
      Some("""SELECT user_id, date, n_events,
             |n_events - LAG(n_events, 1) OVER (PARTITION BY user_id ORDER BY date) AS delta
             |FROM (SELECT user_id, CAST(ts AS DATE) AS date, COUNT(*) AS n_events
             |      FROM events GROUP BY 1,2)
             |ORDER BY user_id, date""".stripMargin),
    ),
    // gap-based sessionization (6h inactivity closes a session)
    QueryDef(
      "q_sessionize",
      (s, dir) => {
        val e = Tables(s, dir).events
          .select(col("user_id"), col("event_id"),
                  unix_micros(col("ts")).as("ts_us"), col("value"))
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        val gapUs = 6L * 3600 * 1000000
        val flagged = e
          .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_sess")).over(
            Window.partitionBy("user_id").orderBy("ts_us", "event_id")
              .rowsBetween(Window.unboundedPreceding, 0)))
        flagged.groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
               min(col("ts_us")).as("start_us"),
               max(col("ts_us")).as("end_us"),
               moneySum(col("value")).as("total_value"))
          .orderBy("user_id", "session_id")
      },
      Some(SessionizeSql),
    ),
    // the BUILT-IN sessionizer: Spark's native session_window
    // aggregation beside the explicit lag/cumsum derivation above —
    // the "compose existing ops" preference made concrete (one hash
    // aggregation, merging session state map-side; no window function
    // pass at all, so it is also the cheaper plan). Boundary semantics
    // differ from q_sessionize by design and the oracle encodes it: a
    // session window is [start, last+gap), so an event arriving at
    // EXACTLY prev+gap starts a NEW session (>= split), where the
    // lag-based derivation keeps it (> split).
    QueryDef(
      "q_session_window",
      (s, dir) => {
        val gapUs = 6L * 3600 * 1000000
        Tables(s, dir).events
          .select(col("user_id"), col("ts"), col("value"))
          .groupBy(col("user_id"), session_window(col("ts"), "6 hours").as("sw"))
          .agg(count(lit(1)).as("n_events"),
               moneySum(col("value")).as("total_value"))
          .select(col("user_id"),
            unix_micros(col("sw.start")).as("start_us"),
            (unix_micros(col("sw.end")) - gapUs).as("end_us"),
            col("n_events"), col("total_value"))
          .orderBy("user_id", "start_us")
      },
      Some("""WITH base AS (
             |  SELECT user_id, EPOCH_US(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events),
             |flagged AS (
             |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us >= 21600000000 THEN 1 ELSE 0 END AS new_sess
             |  FROM (SELECT *, LAG(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev_us FROM base)),
             |sessions AS (
             |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM flagged)
             |SELECT user_id, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
             |CAST(COUNT(*) AS BIGINT) AS n_events,
             |CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
             |FROM sessions GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin),
    ),
    // session-duration analytics — the panel users run ON TOP of
    // sessionization: corpus-level session count, mean events and
    // duration (exact BIGINT sums → identical double divisions), and
    // exact duration percentiles (the proven percentile/QUANTILE_CONT
    // cross-engine pattern). Same per-user window derivation as
    // q_sessionize; the final rollup is one map-side-combinable
    // aggregate over the session-level frame.
    QueryDef(
      "q_session_stats",
      (s, dir) => {
        val e = Tables(s, dir).events
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        val gapUs = 6L * 3600 * 1000000
        val sess = e
          .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_sess")).over(
            Window.partitionBy("user_id").orderBy("ts_us", "event_id")
              .rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
               (max(col("ts_us")) - min(col("ts_us"))).as("dur_us"))
        sess.agg(
          count(lit(1)).as("n_sessions"),
          (sum(col("n_events")).cast("double") / count(lit(1))).as("avg_events"),
          (sum(col("dur_us")).cast("double") / count(lit(1)) / 1000000.0).as("avg_duration_s"),
          round(expr("percentile(dur_us, 0.5)"), 4).as("p50_dur_us"),
          round(expr("percentile(dur_us, 0.9)"), 4).as("p90_dur_us"))
      },
      Some("""WITH base AS (
             |  SELECT user_id, event_id, EPOCH_US(CAST(ts AS TIMESTAMP)) AS ts_us
             |  FROM events),
             |flagged AS (
             |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 21600000000 THEN 1 ELSE 0 END AS new_sess
             |  FROM (SELECT *, LAG(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM base)),
             |sessions AS (
             |  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM flagged),
             |sess AS (
             |  SELECT user_id, session_id, COUNT(*) AS n_events,
             |  MAX(ts_us) - MIN(ts_us) AS dur_us
             |  FROM sessions GROUP BY 1,2)
             |SELECT COUNT(*) AS n_sessions,
             |CAST(SUM(n_events) AS DOUBLE)/COUNT(*) AS avg_events,
             |CAST(SUM(dur_us) AS DOUBLE)/COUNT(*)/1000000.0 AS avg_duration_s,
             |ROUND(QUANTILE_CONT(dur_us, 0.5),4) AS p50_dur_us,
             |ROUND(QUANTILE_CONT(dur_us, 0.9),4) AS p90_dur_us
             |FROM sess""".stripMargin),
    ),
  )
}
