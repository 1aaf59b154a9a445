package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's Grafana/ClickHouse analytics surface, re-expressed
  * Spark-first over the driver testdata.
  *
  * Shapes mirror grafana/clickhouse/dashboard-dmarc-overview.json and
  * dashboard-dmarc-forensic.json panel queries (toDate bucketing, sumIf
  * rates, CASE buckets, HAVING top-N, uniq, groupArray(DISTINCT),
  * per-entity last-seen). Time windows use fixed cutoffs inside the
  * events table's [2024-01-01, 2024-01-31) span — the moving `now()`
  * of the dashboards has no place in a reproducible oracle.
  *
  * Scale notes: every query here is a groupBy over a low-cardinality key
  * → map-side partial aggregation, one shuffle, no join except against
  * broadcast dims. At 100 TB the date filters prune month partitions of
  * the record table (SURVEY §5).
  */
object DashboardAnalytics extends QueryModule {
  import Det._

  private val Cut7 = "2024-01-24 00:00:00"

  override def entries: Seq[QueryDef] = Seq(
    // overview p0: toDate(begin_date), sum(count) daily series
    QueryDef(
      "q_daily_volume",
      (s, dir) => {
        val e = Tables(s, dir).events
        e.groupBy(col("ts").cast("date").as("date"))
          .agg(count(lit(1)).as("n_events"),
               moneySum(col("value")).as("total_value"))
          .orderBy("date")
      },
      Some("""SELECT CAST(ts AS DATE) AS date, COUNT(*) AS n_events,
             |CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))),2) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
    // overview p1: sum(count) over trailing window
    QueryDef(
      "q_total_window",
      (s, dir) => {
        val e = Tables(s, dir).events
        e.filter(col("ts") >= lit(Cut7))
          .agg(count(lit(1)).as("n_events"),
               moneySum(col("value")).as("total_value"))
      },
      Some(s"""SELECT COUNT(*) AS n_events,
              |CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))),2) AS DOUBLE) AS total_value
              |FROM events WHERE ts >= TIMESTAMP '$Cut7'""".stripMargin),
    ),
    // overview p2: sumIf compliance rate
    QueryDef(
      "q_compliance_rate",
      (s, dir) => {
        val l = Tables(s, dir).lineitem
        l.agg(pct(when(col("l_returnflag") === "N", col("l_quantity")).otherwise(lit(0)),
                  col("l_quantity")).as("compliance_rate"))
      },
      Some("""SELECT ROUND(
             |CAST(SUM(CASE WHEN l_returnflag='N' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             |*100.0/CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE),2) AS compliance_rate
             |FROM lineitem""".stripMargin),
    ),
    // overview p3: CASE pass/fail buckets
    QueryDef(
      "q_pass_fail",
      (s, dir) => {
        val l = Tables(s, dir).lineitem
        l.groupBy(when(col("l_returnflag") === "R", lit("Fail")).otherwise(lit("Pass")).as("status"))
          .agg(count(lit(1)).as("n_items"), moneySum(col("l_quantity")).as("total_qty"))
          .orderBy("status")
      },
      Some("""SELECT CASE WHEN l_returnflag='R' THEN 'Fail' ELSE 'Pass' END AS status,
             |COUNT(*) AS n_items,
             |CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))),2) AS DOUBLE) AS total_qty
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
    // overview p4: disposition breakdown
    QueryDef(
      "q_disposition",
      (s, dir) => {
        val o = Tables(s, dir).orders
        o.groupBy(col("o_orderstatus").as("status"))
          .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("total_price"))
          .orderBy("status")
      },
      Some("""SELECT o_orderstatus AS status, COUNT(*) AS n_orders,
             |CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))),2) AS DOUBLE) AS total_price
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
    // overview p5: filtered top-10 groups (broadcast dim join)
    QueryDef(
      "q_top_groups",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(desc("n_customers"), asc("n_name"))
          .limit(10)
      },
      Some("""SELECT n_name, COUNT(*) AS n_customers
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY 1 ORDER BY n_customers DESC, n_name LIMIT 10""".stripMargin),
    ),
    // overview p6: per-org compliance table
    QueryDef(
      "q_org_compliance",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(
            count(lit(1)).as("n_orders"),
            moneySum(col("o_totalprice")).as("total_price"),
            round(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)) * 100.0 /
              count(lit(1)), 2).as("fulfilled_rate"),
          )
          .orderBy(desc("n_orders"), asc("segment"))
          .limit(20)
      },
      Some("""SELECT c_mktsegment AS segment, COUNT(*) AS n_orders,
             |CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))),2) AS DOUBLE) AS total_price,
             |ROUND(CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT)*100.0/COUNT(*),2) AS fulfilled_rate
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY n_orders DESC, segment LIMIT 20""".stripMargin),
    ),
    // overview p7: multi-key groupBy + HAVING + top-50
    QueryDef(
      "q_top_sources_having",
      (s, dir) => {
        val e = Tables(s, dir).events
        e.groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("total_value"))
          .filter(col("n_events") >= 10)
          .orderBy(desc("n_events"), asc("user_id"), asc("event_type"))
          .limit(50)
      },
      Some("""SELECT user_id, event_type, COUNT(*) AS n_events,
             |CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))),2) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1,2 HAVING COUNT(*) >= 10
             |ORDER BY n_events DESC, user_id, event_type LIMIT 50""".stripMargin),
    ),
    // forensic p1: point-in-time count
    QueryDef(
      "q_count_today",
      (s, dir) => {
        val e = Tables(s, dir).events
        e.filter(col("ts").cast("date") === lit("2024-01-15"))
          .agg(count(lit(1)).as("n_events"))
      },
      Some("""SELECT COUNT(*) AS n_events FROM events
             |WHERE CAST(ts AS DATE) = DATE '2024-01-15'""".stripMargin),
    ),
    // forensic p2/p3: exact distinct counts
    QueryDef(
      "q_uniq_exact",
      (s, dir) => {
        val e = Tables(s, dir).events
        e.filter(col("ts") >= lit(Cut7))
          .agg(countDistinct(col("user_id")).as("uniq_users"),
               countDistinct(col("event_type")).as("uniq_types"))
      },
      Some(s"""SELECT COUNT(DISTINCT user_id) AS uniq_users,
              |COUNT(DISTINCT event_type) AS uniq_types
              |FROM events WHERE ts >= TIMESTAMP '$Cut7'""".stripMargin),
    ),
    // forensic p2 variant: approximate distinct (HLL) — rows-only check;
    // DuckDB's approx_count_distinct uses a different sketch.
    QueryDef(
      "q_uniq_approx",
      (s, dir) => {
        val e = Tables(s, dir).events
        e.agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      },
      Some(graft.api.ParseSnapshots.sfPinnedSql("q_uniq_approx")),
    ),
    // forensic p4: daily count series for one class
    QueryDef(
      "q_timeseries_count",
      (s, dir) => {
        val e = Tables(s, dir).events
        e.filter(col("event_type") === "purchase")
          .groupBy(col("ts").cast("date").as("date"))
          .agg(count(lit(1)).as("n_purchases"))
          .orderBy("date")
      },
      Some("""SELECT CAST(ts AS DATE) AS date, COUNT(*) AS n_purchases
             |FROM events WHERE event_type = 'purchase'
             |GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
    // forensic p5/p6: breakdown by type
    QueryDef(
      "q_breakdown_feedback",
      (s, dir) => {
        val e = Tables(s, dir).events
        e.groupBy("event_type")
          .agg(count(lit(1)).as("n_events"))
          .orderBy(desc("n_events"), asc("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n_events FROM events
             |GROUP BY 1 ORDER BY n_events DESC, event_type""".stripMargin),
    ),
    // forensic p8: groupArray(DISTINCT ...) as sorted set
    QueryDef(
      "q_group_array",
      (s, dir) => {
        val e = Tables(s, dir).events
        // Joined-string projection of the set: the driver's pandas gate
        // cannot sort array cells, so serialize at the output boundary.
        e.groupBy("event_type")
          .agg(array_join(
                 transform(array_sort(collect_set((col("user_id") % 10).cast("int"))),
                           x => x.cast("string")), ",").as("user_buckets"),
               count(lit(1)).as("n_events"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT CAST(user_id % 10 AS INT))), ',') AS user_buckets,
             |COUNT(*) AS n_events
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
    // forensic p9: per-entity last-seen + distinct breadth, top-50
    QueryDef(
      "q_last_seen",
      (s, dir) => {
        val e = Tables(s, dir).events
        e.groupBy("user_id")
          .agg(unix_micros(max(col("ts"))).as("last_seen_us"),
               count(lit(1)).as("n_events"),
               countDistinct(col("event_type")).as("uniq_types"))
          .orderBy(desc("n_events"), asc("user_id"))
          .limit(50)
      },
      Some("""SELECT user_id, EPOCH_US(CAST(MAX(ts) AS TIMESTAMP)) AS last_seen_us,
             |COUNT(*) AS n_events, COUNT(DISTINCT event_type) AS uniq_types
             |FROM events GROUP BY 1 ORDER BY n_events DESC, user_id LIMIT 50""".stripMargin),
    ),
  )
}
