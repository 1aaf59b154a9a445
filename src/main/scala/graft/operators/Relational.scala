package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core: the query-engine parity layer (the reference rides on
  * ClickHouse SQL; this is the equivalent capability on Spark).
  *
  * Scale notes (SURVEY §5): dimension sides (region/nation/supplier/
  * customer) broadcast; the only shuffle joins are fact-fact on the join
  * key (orderkey), which co-partitions naturally. Filters sit directly on
  * scans so parquet pushdown + column pruning apply.
  */
object Relational extends QueryModule {
  import Det._

  /** sum(cast(expr as decimal(18,6))) rounded to 2 — for products of
    * doubles (price * (1-disc)): the IEEE product is identical in both
    * engines, decimal cast + sum make the aggregation order-free.
    */
  private def revSum(c: org.apache.spark.sql.Column) =
    round(sum(c.cast("decimal(18,6)")), 2).cast("double")

  private val revSql =
    "CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))),2) AS DOUBLE)"

  override def entries: Seq[QueryDef] = Seq(
    // TPC-H Q1 shape: wide multi-aggregate scan
    QueryDef(
      "q1_pricing_summary",
      (s, dir) => {
        val l = Tables(s, dir).lineitem
        // widen the filtered scan before the wide aggregate: the gate
        // file is one unsplittable row group, so the partial aggregation
        // (the query's whole cost) would run single-core; measured
        // 1.21 -> 0.66 s at sf0.1, no-op on a properly split table
        Par.widen(l.filter(col("l_shipdate") <= lit("1998-09-02")))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            moneySum(col("l_quantity")).as("sum_qty"),
            moneySum(col("l_extendedprice")).as("sum_base_price"),
            revSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
            revSum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
            round(sum(col("l_quantity").cast(Money)).cast("double") / count(lit(1)), 4).as("avg_qty"),
            round(sum(col("l_extendedprice").cast(Money)).cast("double") / count(lit(1)), 4).as("avg_price"),
            round(sum(col("l_discount").cast("decimal(18,4)")).cast("double") / count(lit(1)), 6).as("avg_disc"),
            count(lit(1)).as("count_order"),
          )
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))),2) AS DOUBLE) AS sum_qty,
             |CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))),2) AS DOUBLE) AS sum_base_price,
             |CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))),2) AS DOUBLE) AS sum_disc_price,
             |CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))),2) AS DOUBLE) AS sum_charge,
             |ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*),4) AS avg_qty,
             |ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*),4) AS avg_price,
             |ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*),6) AS avg_disc,
             |COUNT(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY 1,2 ORDER BY 1,2""".stripMargin),
    ),
    // TPC-H Q3 shape: 3-way join + top-N by revenue
    QueryDef(
      "q3_shipping_priority",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer.filter(col("c_mktsegment") === "BUILDING")
          .join(t.orders.filter(col("o_orderdate") < lit("1995-03-15")),
                col("c_custkey") === col("o_custkey"))
          .join(t.lineitem.filter(col("l_shipdate") > lit("1995-03-15")),
                col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("order_date"))
          .agg(revSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy(desc("revenue"), asc("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date, $revSql AS revenue
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |WHERE c_mktsegment = 'BUILDING'
              |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
              |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
              |GROUP BY 1,2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),
    ),
    // TPC-H Q5 shape: star join, broadcast dims
    QueryDef(
      "q5_local_supplier",
      (s, dir) => {
        val t = Tables(s, dir)
        val asiaNations = t.nation
          .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
                col("n_regionkey") === col("r_regionkey"))
        // broadcast only true dims (region/nation); customer/supplier/
        // orders scale with the data — their joins shuffle on their keys
        // (AQE may still broadcast small sides from runtime stats)
        t.lineitem
          .join(t.orders.filter(col("o_orderdate") >= lit("1996-01-01") &&
                                col("o_orderdate") < lit("1997-01-01")),
                col("l_orderkey") === col("o_orderkey"))
          .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
          .join(t.customer,
                col("o_custkey") === col("c_custkey") &&
                  col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(revSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy(desc("revenue"), asc("n_name"))
      },
      Some(s"""SELECT n_name, $revSql AS revenue
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
              |JOIN nation ON s_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA'
              |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
              |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin),
    ),
    // selective filter + narrow projection → parquet pushdown visible in explain
    QueryDef(
      "q_filter_pushdown",
      (s, dir) => {
        val l = Tables(s, dir).lineitem
        l.filter(col("l_shipdate") >= lit("1996-01-01") &&
                 col("l_shipdate") <= lit("1996-03-31") &&
                 col("l_quantity") >= 45)
          .agg(count(lit(1)).as("n_items"), moneySum(col("l_extendedprice")).as("total_price"))
      },
      Some("""SELECT COUNT(*) AS n_items,
             |CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))),2) AS DOUBLE) AS total_price
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate <= TIMESTAMP '1996-03-31 00:00:00'
             |  AND l_quantity >= 45""".stripMargin),
    ),
    // global sort + limit (TakeOrderedAndProject, no full sort)
    QueryDef(
      "q_sort_limit",
      (s, dir) => {
        val o = Tables(s, dir).orders
        o.select(col("o_orderkey"), col("o_totalprice"),
                 col("o_orderdate").cast("date").as("order_date"))
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS order_date
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
    ),
    // distinct (shuffle dedup)
    QueryDef(
      "q_distinct",
      (s, dir) => {
        val c = Tables(s, dir).customer
        c.select("c_nationkey", "c_mktsegment").distinct()
          .orderBy("c_nationkey", "c_mktsegment")
      },
      Some("""SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
             |ORDER BY 1, 2""".stripMargin),
    ),
    // ROLLUP grouping sets
    QueryDef(
      "q_rollup",
      (s, dir) => {
        val o = Tables(s, dir).orders
        o.rollup("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("total_price"))
          .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
                  coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
                  col("n_orders"), col("total_price"))
          .orderBy("status", "priority")
      },
      Some("""SELECT COALESCE(o_orderstatus,'ALL') AS status,
             |COALESCE(o_orderpriority,'ALL') AS priority,
             |COUNT(*) AS n_orders,
             |CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))),2) AS DOUBLE) AS total_price
             |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
             |ORDER BY 1, 2""".stripMargin),
    ),
    // pivot matrix (event_type × user bucket)
    QueryDef(
      "q_pivot",
      (s, dir) => {
        val e = Tables(s, dir).events
        val types = Seq("click", "error", "purchase", "signup", "view")
        e.groupBy((col("user_id") % 10).cast("int").as("bucket"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
          .na.fill(0L, types)
          .orderBy("bucket")
      },
      Some("""SELECT CAST(user_id % 10 AS INT) AS bucket,
             |CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             |CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
             |CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             |CAST(SUM(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             |CAST(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS view
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
    // exact interpolated quantiles
    QueryDef(
      "q_exact_quantiles",
      (s, dir) => {
        val l = Tables(s, dir).lineitem
        l.agg(
          round(expr("percentile(l_quantity, 0.25)"), 4).as("qty_p25"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("qty_p50"),
          round(expr("percentile(l_quantity, 0.75)"), 4).as("qty_p75"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("price_p50"),
        )
      },
      Some("""SELECT ROUND(QUANTILE_CONT(l_quantity, 0.25),4) AS qty_p25,
             |ROUND(QUANTILE_CONT(l_quantity, 0.5),4) AS qty_p50,
             |ROUND(QUANTILE_CONT(l_quantity, 0.75),4) AS qty_p75,
             |ROUND(QUANTILE_CONT(l_extendedprice, 0.5),4) AS price_p50
             |FROM lineitem""".stripMargin),
    ),
    // JSON field extraction (events.props)
    QueryDef(
      "q_json_extract",
      (s, dir) => {
        val e = Tables(s, dir).events
        val k = get_json_object(col("props"), "$.k").cast("bigint")
        e.select(col("event_type"), k.as("k"))
          .groupBy("event_type")
          .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
               sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_over_50"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |CAST(SUM(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |MAX(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS max_k,
             |CAST(SUM(CASE WHEN CAST(json_extract_string(props,'$.k') AS BIGINT) > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_over_50
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
    // as-of: latest prior signup for every purchase, one window pass
    // (Spark-first: no self-join; see SURVEY §2 q_asof_prior_event)
    QueryDef(
      "q_asof_prior_event",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables(s, dir).events.select("event_id", "user_id", "event_type", "ts")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        e.withColumn("prior_signup_us",
            unix_micros(max(when(col("event_type") === "signup", col("ts"))).over(w)))
          .filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "prior_signup_us")
          .orderBy("event_id")
      },
      Some("""SELECT e1.event_id, e1.user_id,
             |(SELECT EPOCH_US(CAST(MAX(e2.ts) AS TIMESTAMP)) FROM events e2
             |  WHERE e2.user_id = e1.user_id AND e2.event_type = 'signup'
             |    AND (CAST(e2.ts AS TIMESTAMP) < CAST(e1.ts AS TIMESTAMP)
             |         OR (CAST(e2.ts AS TIMESTAMP) = CAST(e1.ts AS TIMESTAMP)
             |             AND e2.event_id < e1.event_id))) AS prior_signup_us
             |FROM events e1 WHERE e1.event_type = 'purchase'
             |ORDER BY e1.event_id""".stripMargin),
    ),
    // forward as-of: each click's NEXT purchase by the same user
    // (time-to-convert) — the mirror of q_asof_prior_event, same
    // Spark-first shape: one window over the user_id hash partitioning
    // with a forward frame, never a self-join
    QueryDef(
      "q_asof_next_event",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables(s, dir).events.select("event_id", "user_id", "event_type", "ts")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(1, Window.unboundedFollowing)
        e.withColumn("next_purchase_us",
            unix_micros(min(when(col("event_type") === "purchase", col("ts"))).over(w)))
          .filter(col("event_type") === "click")
          .select("event_id", "user_id", "next_purchase_us")
          .orderBy("event_id")
      },
      Some("""SELECT e1.event_id, e1.user_id,
             |(SELECT EPOCH_US(CAST(MIN(e2.ts) AS TIMESTAMP)) FROM events e2
             |  WHERE e2.user_id = e1.user_id AND e2.event_type = 'purchase'
             |    AND (CAST(e2.ts AS TIMESTAMP) > CAST(e1.ts AS TIMESTAMP)
             |         OR (CAST(e2.ts AS TIMESTAMP) = CAST(e1.ts AS TIMESTAMP)
             |             AND e2.event_id > e1.event_id))) AS next_purchase_us
             |FROM events e1 WHERE e1.event_type = 'click'
             |ORDER BY e1.event_id""".stripMargin),
    ),
    // semi + anti join per nation
    QueryDef(
      "q_semi_anti_join",
      (s, dir) => {
        val t = Tables(s, dir)
        val withOrders = t.customer.join(t.orders, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy("c_nationkey").agg(count(lit(1)).as("with_orders"))
        val withoutOrders = t.customer.join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_nationkey").agg(count(lit(1)).as("without_orders"))
        withOrders.join(withoutOrders, Seq("c_nationkey"), "full_outer")
          .select(col("c_nationkey"),
                  coalesce(col("with_orders"), lit(0L)).as("with_orders"),
                  coalesce(col("without_orders"), lit(0L)).as("without_orders"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey,
             |CAST(SUM(CASE WHEN EXISTS(SELECT 1 FROM orders WHERE o_custkey = c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS with_orders,
             |CAST(SUM(CASE WHEN NOT EXISTS(SELECT 1 FROM orders WHERE o_custkey = c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS without_orders
             |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
  )
}
