package graft.operators

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second relational slice: set operations, correlated subqueries (via
  * the first-class spark.sql surface), the rank family, time bucketing
  * (ClickHouse toStartOfInterval), string functions, approx quantiles.
  */
object Relational2 extends QueryModule {
  import Det._

  override def entries: Seq[QueryDef] = Seq(
    // range (interval) join via api.Joins.rangeJoin: binned equi-join,
    // never a per-key nested-loop inequality join — pairs of events per
    // user within 15 minutes of each other
    QueryDef(
      "q_range_join",
      (s, dir) => {
        val e = Tables(s, dir).events
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
        val a = e.select(col("user_id"), col("event_id").as("a_id"), col("ts_us").as("a_us"))
        val b = e.select(col("user_id"), col("event_id").as("b_id"), col("ts_us").as("b_us"))
        graft.api.Joins.rangeJoin(a, b, "user_id", "a_us", "b_us", 900000000L)
          .filter(col("a_id") < col("b_id"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id, EPOCH_US(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
             |SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
             |FROM e a JOIN e b ON a.user_id = b.user_id AND a.event_id < b.event_id
             |  AND abs(a.ts_us - b.ts_us) <= 900000000
             |GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
    // KEYLESS band join — no equi-conjunct at all, the shape Catalyst
    // can only nested-loop. The plans.BandJoinBinning optimizer rule
    // (registered in GraftExtensions) rewrites it to a binned hash join
    // automatically; the declarative query stays the naive inequality.
    // PlanAuditSpec asserts the plan carries no BNLJ/cartesian.
    QueryDef(
      "q_band_join_auto",
      (s, dir) => {
        val e = Tables(s, dir).events
          .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
        val a = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("a_id"), col("us").as("a_us"))
        val b = e.filter(col("event_type") === "signup")
          .select(col("event_id").as("b_id"), col("us").as("b_us"))
        a.join(b, expr("abs(a_us - b_us) <= 900000000"))
          .agg(count(lit(1)).as("n_pairs"),
               min(abs(col("a_us") - col("b_us"))).as("min_gap_us"),
               max(abs(col("a_us") - col("b_us"))).as("max_gap_us"))
      },
      Some("""WITH e AS (SELECT event_id, event_type,
             |  EPOCH_US(CAST(ts AS TIMESTAMP)) AS us FROM events),
             |a AS (SELECT event_id AS a_id, us AS a_us FROM e WHERE event_type = 'purchase'),
             |b AS (SELECT event_id AS b_id, us AS b_us FROM e WHERE event_type = 'signup')
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             |MIN(abs(a_us - b_us)) AS min_gap_us,
             |MAX(abs(a_us - b_us)) AS max_gap_us
             |FROM a JOIN b ON abs(a_us - b_us) <= 900000000""".stripMargin),
    ),
    // INTERSECT / EXCEPT / UNION ALL
    QueryDef(
      "q_set_ops",
      (s, dir) => {
        val t = Tables(s, dir)
        val cust = t.customer.select(col("c_nationkey").cast("int").as("k"))
        val supp = t.supplier.select(col("s_nationkey").cast("int").as("k"))
        val both = cust.intersect(supp).withColumn("src", lit("both"))
        val custOnly = cust.except(supp).withColumn("src", lit("cust_only"))
        both.unionByName(custOnly)
          .select("src", "k")
          .orderBy("src", "k")
      },
      Some("""SELECT 'both' AS src, k FROM
             |  (SELECT CAST(c_nationkey AS INT) AS k FROM customer
             |   INTERSECT SELECT CAST(s_nationkey AS INT) FROM supplier)
             |UNION ALL
             |SELECT 'cust_only', k FROM
             |  (SELECT CAST(c_nationkey AS INT) AS k FROM customer
             |   EXCEPT SELECT CAST(s_nationkey AS INT) FROM supplier)
             |ORDER BY src, k""".stripMargin),
    ),
    // correlated scalar subquery through spark.sql (decimal-exact sums
    // keep the cross-engine comparison deterministic)
    QueryDef(
      "q_correlated_subquery",
      (s, dir) => {
        Tables(s, dir).customer.createOrReplaceTempView("customer")
        s.sql("""SELECT c_nationkey, COUNT(*) AS n_heavy
                |FROM customer c1
                |WHERE c_acctbal > (
                |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                |  FROM customer c2 WHERE c2.c_nationkey = c1.c_nationkey)
                |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
      },
      Some("""SELECT c_nationkey, COUNT(*) AS n_heavy
             |FROM customer c1
             |WHERE c_acctbal > (
             |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             |  FROM customer c2 WHERE c2.c_nationkey = c1.c_nationkey)
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
    ),
    // rank family (tie-stable across engines: ranks depend only on the
    // order-by value, rows identified by key)
    QueryDef(
      "q_window_ranks",
      (s, dir) => {
        val o = Tables(s, dir).orders
        val w = Window.partitionBy("o_orderpriority").orderBy(desc("o_totalprice"))
        o.select(col("o_orderpriority").as("priority"), col("o_orderkey"),
                 col("o_totalprice"),
                 rank().over(w).as("rnk"),
                 dense_rank().over(w).as("drnk"),
                 round(percent_rank().over(w), 6).as("prnk"))
          .filter(col("rnk") <= 5)
          .orderBy("priority", "rnk", "o_orderkey")
      },
      Some("""SELECT priority, o_orderkey, o_totalprice, rnk, drnk, prnk FROM (
             |  SELECT o_orderpriority AS priority, o_orderkey, o_totalprice,
             |  CAST(RANK() OVER w AS INT) AS rnk,
             |  CAST(DENSE_RANK() OVER w AS INT) AS drnk,
             |  ROUND(PERCENT_RANK() OVER w, 6) AS prnk
             |  FROM orders WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC))
             |WHERE rnk <= 5 ORDER BY priority, rnk, o_orderkey""".stripMargin),
    ),
    // ClickHouse toStartOfInterval(ts, 15 min) — engine-neutral epoch
    // floor math so bucket origins can't diverge
    QueryDef(
      "q_time_bucket_15m",
      (s, dir) => {
        val e = Tables(s, dir).events
        val bucket = (unix_micros(col("ts")) / 900000000L).cast("long") * 900000000L
        e.groupBy(bucket.as("bucket_us"))
          .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("total_value"))
          .filter(col("n_events") >= 3)
          .orderBy("bucket_us")
      },
      Some("""SELECT (EPOCH_US(CAST(ts AS TIMESTAMP)) // 900000000) * 900000000 AS bucket_us,
             |COUNT(*) AS n_events,
             |CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))),2) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1 HAVING COUNT(*) >= 3 ORDER BY 1""".stripMargin),
    ),
    // string function battery over part
    QueryDef(
      "q_string_funcs",
      (s, dir) => {
        val p = Tables(s, dir).part
        p.select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_upper"),
            regexp_extract(col("p_brand"), "#(\\d+)", 1).cast("int").as("brand_num"),
            substring(col("p_name"), 1, 8).as("name_prefix"),
            length(col("p_name")).cast("bigint").as("name_len"),
            replace(col("p_type"), lit(" "), lit("_")).as("type_snake"),
            concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, UPPER(p_brand) AS brand_upper,
             |CAST(regexp_extract(p_brand, '#(\d+)', 1) AS INT) AS brand_num,
             |substr(p_name, 1, 8) AS name_prefix,
             |CAST(length(p_name) AS BIGINT) AS name_len,
             |replace(p_type, ' ', '_') AS type_snake,
             |p_brand || '|' || p_type AS brand_type
             |FROM part ORDER BY p_partkey""".stripMargin),
    ),
    // approximate quantiles (t-digest-style sketch) — rows-only: DuckDB's
    // approx_quantile uses a different sketch. Scalar columns (not an
    // array) so the driver's pandas gate can sort the output row.
    QueryDef(
      "q_approx_quantiles",
      (s, dir) => {
        val l = Tables(s, dir).lineitem
        l.agg(expr("approx_percentile(l_extendedprice, 0.25, 1000)").as("price_p25"),
              expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("price_p50"),
              expr("approx_percentile(l_extendedprice, 0.75, 1000)").as("price_p75"),
              expr("approx_percentile(l_quantity, 0.5, 1000)").as("qty_median"))
      },
      Some(graft.api.ParseSnapshots.sfPinnedSql("q_approx_quantiles")),
    ),
  )
}
