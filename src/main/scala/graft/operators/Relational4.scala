package graft.operators

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth relational slice: explicit GROUPING SETS (the general form of
  * the ROLLUP/CUBE entries in Relational/Relational3 — ClickHouse's
  * GROUP BY ... WITH ROLLUP family, clickhouse.go's dashboards use the
  * flat slices) and ntile bucketing (equi-depth quantile assignment as a
  * window function, the per-row twin of q_quantiles_by_group).
  */
object Relational4 extends QueryModule {
  import Det._

  override def entries: Seq[QueryDef] = Seq(
    // GROUPING SETS ((a,b), (a), ()) — unlike CUBE it skips the (b)
    // slice: exactly the three aggregation levels a drill-down dashboard
    // materializes. One pass over the fact table; Spark expands to an
    // Expand node feeding a single hash aggregate (no N scans).
    QueryDef(
      "q_grouping_sets",
      (s, dir) => {
        val l = Tables(s, dir).lineitem
        l.groupingSets(
            Seq(Seq(col("l_returnflag"), col("l_linestatus")),
                Seq(col("l_returnflag")), Seq.empty),
            col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n_rows"),
               moneySum(col("l_extendedprice")).as("total_price"))
          .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
                  coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
                  col("n_rows"), col("total_price"))
          .orderBy("rf", "ls")
      },
      Some("""SELECT COALESCE(l_returnflag,'ALL') AS rf,
             |COALESCE(l_linestatus,'ALL') AS ls,
             |COUNT(*) AS n_rows,
             |CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))),2) AS DOUBLE) AS total_price
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
             |ORDER BY 1, 2""".stripMargin),
    ),
    // equi-depth quartiles per event_type: ntile over a TOTAL order
    // (value, event_id — the id tiebreak makes bucket assignment
    // deterministic across engines and partitionings), then per-bucket
    // count/min/max. The window shuffles once on event_type; the
    // follow-up aggregate reuses that partitioning.
    //
    // SCALE LIMIT (inherent to ntile, in any engine): exact equal-count
    // bucketing needs a per-group total order, so each of the 5
    // event_type groups sorts in ONE task. This entry is SQL-parity
    // coverage; the at-scale path for equi-depth bucketing is
    // percentile thresholds + a scan-side comparison
    // (q_quantiles_by_group / t_quality_filter), which trades the exact
    // ±1-row bucket balance for full parallelism.
    QueryDef(
      "q_ntile",
      (s, dir) => {
        val e = Tables(s, dir).events
        val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
        e.select(col("event_type"), col("value"),
            ntile(4).over(w).cast("bigint").as("quartile"))
          .groupBy("event_type", "quartile")
          .agg(count(lit(1)).as("n"),
               min(col("value")).as("min_v"), max(col("value")).as("max_v"))
          .orderBy("event_type", "quartile")
      },
      Some("""WITH q AS (SELECT event_type, value,
             |  ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS quartile
             |  FROM events)
             |SELECT event_type, quartile, COUNT(*) AS n,
             |MIN(value) AS min_v, MAX(value) AS max_v
             |FROM q GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    ),
    // arg-max/arg-min aggregates: the richest/poorest supplier per
    // nation in ONE aggregation pass (no self-join back to the group
    // max, no window). The ordering key folds the 2-decimal balance and
    // the unique suppkey into one BIGINT so both engines break balance
    // ties identically. The suppkey slot is 10^12 (balance cents ≤ 10^6
    // × 10^12 < 2^63), so the key stays collision-free up to a trillion
    // suppliers — a narrower slot would let a huge suppkey leak into
    // the balance ordering and silently crown the wrong supplier.
    QueryDef(
      "q_max_by",
      (s, dir) => {
        val sup = Tables(s, dir).supplier
        val key = expr("CAST(round(s_acctbal * 100) AS BIGINT) * 1000000000000 + s_suppkey")
        sup.groupBy("s_nationkey")
          .agg(max_by(col("s_name"), key).as("richest"),
               round(max(col("s_acctbal")), 2).as("max_bal"),
               min_by(col("s_name"), key).as("poorest"),
               round(min(col("s_acctbal")), 2).as("min_bal"))
          .orderBy("s_nationkey")
      },
      Some("""SELECT s_nationkey,
             |arg_max(s_name, CAST(round(s_acctbal * 100) AS BIGINT) * 1000000000000 + s_suppkey) AS richest,
             |round(MAX(s_acctbal), 2) AS max_bal,
             |arg_min(s_name, CAST(round(s_acctbal * 100) AS BIGINT) * 1000000000000 + s_suppkey) AS poorest,
             |round(MIN(s_acctbal), 2) AS min_bal
             |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
    // distribution-position window functions: percent_rank and
    // cume_dist per customer segment over account balances (with the
    // unique custkey tiebreak making both deterministic). One window
    // shuffle on the segment key; 4dp rounding keeps the ratio doubles
    // engine-identical. Same inherent per-group total-order limit as
    // q_ntile (5 segments → 5 sort tasks) — fine on a dimension table
    // like customer; for fact-scale inputs use the percentile-threshold
    // pattern instead.
    QueryDef(
      "q_percent_rank",
      (s, dir) => {
        val c = Tables(s, dir).customer
        val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
        c.select(col("c_mktsegment"), col("c_custkey"),
                 round(percent_rank().over(w), 4).as("pr"),
                 round(cume_dist().over(w), 4).as("cd"))
          .filter(col("c_custkey") % 10 === 0)
          .orderBy("c_mktsegment", "c_custkey")
      },
      Some("""WITH r AS (SELECT c_mktsegment, c_custkey,
             |  ROUND(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey), 4) AS pr,
             |  ROUND(cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey), 4) AS cd
             |  FROM customer)
             |SELECT c_mktsegment, c_custkey, pr, cd FROM r
             |WHERE c_custkey % 10 = 0 ORDER BY 1, 2""".stripMargin),
    ),
    // full-outer metric merge — the reporting join that combines two
    // independently aggregated series (daily clicks vs daily purchases)
    // without losing days present in only one: both sides aggregate
    // FIRST (day-level frames, not events), the outer join and coalesce
    // run over those small series, and the join key's hash partitioning
    // is shared by both groupBys.
    QueryDef(
      "q_outer_join_coalesce",
      (s, dir) => {
        val e = Tables(s, dir).events
        def daily(t: String, out: String) =
          e.filter(col("event_type") === t)
            .groupBy(to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as(out))
        daily("click", "n_clicks")
          .join(daily("purchase", "n_purchases"), Seq("day"), "full_outer")
          .select(col("day"),
                  coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
                  coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
                  round(coalesce(col("n_purchases"), lit(0L)).cast("double") /
                    greatest(coalesce(col("n_clicks"), lit(0L)), lit(1L)), 4).as("cvr"))
          .orderBy("day")
      },
      Some("""WITH c AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_clicks
             |  FROM events WHERE event_type = 'click' GROUP BY 1),
             |p AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_purchases
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
             |SELECT COALESCE(c.day, p.day) AS day,
             |COALESCE(n_clicks, 0) AS n_clicks,
             |COALESCE(n_purchases, 0) AS n_purchases,
             |ROUND(CAST(COALESCE(n_purchases, 0) AS DOUBLE)
             |  / GREATEST(COALESCE(n_clicks, 0), 1), 4) AS cvr
             |FROM c FULL OUTER JOIN p ON c.day = p.day
             |ORDER BY day""".stripMargin),
    ),
    // ratio-to-report: each nation's share of its region's supplier
    // balance. The share denominator is a window sum over the ALREADY
    // AGGREGATED per-nation frame (25 rows) — the window never sees the
    // fact table, so its state is dimension-sized; the only corpus
    // shuffle is the per-nation aggregation, and both dims broadcast.
    QueryDef(
      "q_pct_of_total",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = Window.partitionBy("r_name")
        t.supplier
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(moneySum(col("s_acctbal")).as("nation_bal"))
          .withColumn("region_share",
            round(col("nation_bal") / sum(col("nation_bal")).over(w), 4))
          .orderBy("r_name", "n_name")
      },
      Some("""WITH nb AS (SELECT r_name, n_name,
             |  CAST(ROUND(SUM(CAST(s_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS nation_bal
             |  FROM supplier
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  GROUP BY 1, 2)
             |SELECT r_name, n_name, nation_bal,
             |ROUND(nation_bal / SUM(nation_bal) OVER (PARTITION BY r_name), 4) AS region_share
             |FROM nb ORDER BY 1, 2""".stripMargin),
    ),
    // second-moment statistics (variance / stddev / correlation) from
    // exact decimal power sums: one map-side-combinable aggregation
    // collects (n, Σx, Σx², Σy, Σy², Σxy) per group — all exact
    // decimals, so partial-aggregation order can't drift them — and the
    // moments are derived in a projection whose double arithmetic is
    // TEXTUALLY identical to the oracle's (same operand order, same
    // parenthesisation → same IEEE result). This is how var/corr must be
    // computed at 100 TB anyway: built-in var_samp/corr stream in
    // arbitrary partition order and aren't bit-reproducible run-to-run.
    QueryDef(
      "q_stats_moments",
      (s, dir) => {
        val l = Tables(s, dir).lineitem
        val sums = l.groupBy(col("l_returnflag")).agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast(Money)).cast("double").as("sx"),
          sum(expr("CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))"))
            .cast("double").as("sx2"),
          sum(col("l_extendedprice").cast(Money)).cast("double").as("sy"),
          sum(expr("CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))"))
            .cast("double").as("sy2"),
          sum(expr("CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))"))
            .cast("double").as("sxy"))
        // ROUNDED on purpose — the one family where the no-round rule
        // inverts. The sums are decimal-exact, but casting the WIDE
        // squared-sum decimals (sy2/sxy, > 2^53 in scaled units) to
        // double rounds differently per engine by ~1 ulp, so the
        // unrounded derived doubles already disagree at digit 16
        // (observed at sf0.001). round() at 4–6dp re-synchronizes them;
        // a disagreement would now need a value within ~1e-16 relative
        // of a x.xxxx5 boundary — verified clean at all three SFs.
        sums.select(
            col("l_returnflag"), col("n"),
            expr("round(sx / CAST(n AS DOUBLE), 4)").as("mean_qty"),
            expr("round((sx2 - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1), 4)")
              .as("var_qty"),
            expr("round(sqrt((sy2 - sy * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)), 4)")
              .as("std_price"),
            expr("""round((CAST(n AS DOUBLE) * sxy - sx * sy) /
                   |sqrt((CAST(n AS DOUBLE) * sx2 - sx * sx) * (CAST(n AS DOUBLE) * sy2 - sy * sy)), 6)"""
                 .stripMargin).as("corr_qty_price"))
          .orderBy("l_returnflag")
      },
      Some("""WITH s AS (SELECT l_returnflag, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx2,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy2,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
             |  FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, n,
             |round(sx / CAST(n AS DOUBLE), 4) AS mean_qty,
             |round((sx2 - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1), 4) AS var_qty,
             |round(sqrt((sy2 - sy * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)), 4) AS std_price,
             |round((CAST(n AS DOUBLE) * sxy - sx * sy) /
             |sqrt((CAST(n AS DOUBLE) * sx2 - sx * sx) * (CAST(n AS DOUBLE) * sy2 - sy * sy)), 6) AS corr_qty_price
             |FROM s ORDER BY 1""".stripMargin),
    ),
    // UNPIVOT (melt): wide per-group measures → long (measure, value)
    // rows via the first-class Dataset.unpivot API (plans as a single
    // Expand over the aggregate — one scan, no union of selects).
    // Measure VALUES stay decimal-exact-cast-double (deterministic);
    // measure NAMES are the unpivoted column names in both engines.
    // Dataset.unpivot RETAINS null measure values while SQL UNPIVOT
    // drops them by default — INCLUDE NULLS on the oracle side pins
    // the retained-null semantics against future nullable measures.
    QueryDef(
      "q_unpivot",
      (s, dir) => {
        val l = Tables(s, dir).lineitem
        l.groupBy(col("l_returnflag")).agg(
            sum(col("l_quantity").cast(Money)).cast("double").as("sum_qty"),
            sum(col("l_extendedprice").cast(Money)).cast("double").as("sum_price"),
            sum(col("l_discount").cast(Money)).cast("double").as("sum_disc"))
          .unpivot(
            Array(col("l_returnflag")),
            Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
            "measure", "value")
          .orderBy("l_returnflag", "measure")
      },
      Some("""WITH s AS (SELECT l_returnflag,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
             |  FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, measure, value FROM s
             |UNPIVOT INCLUDE NULLS (value FOR measure IN (sum_qty, sum_price, sum_disc))
             |ORDER BY 1, 2""".stripMargin),
    ),
    // correlated LATERAL subquery with ORDER BY + LIMIT — top-2
    // customers per nation through the first-class spark.sql LATERAL
    // surface. Catalyst decorrelates the limit into a partitioned
    // window (rank ≤ 2 per nation), so the plan is one shuffle on the
    // correlation key — never a per-nation driver loop.
    QueryDef(
      "q_lateral_topn",
      (s, dir) => {
        val t = Tables(s, dir)
        t.nation.createOrReplaceTempView("nation")
        t.customer.createOrReplaceTempView("customer")
        // acctbal emitted as raw DOUBLE: a DECIMAL(18,2) output column
        // survives the value compare but trips the driver's
        // dtype-sensitive hash on the decimal conversion path, so both
        // engines ship the identical stored double instead.
        s.sql("""SELECT n.n_name, t.c_name, CAST(t.c_acctbal AS DOUBLE) AS acctbal
                |FROM nation n, LATERAL (
                |  SELECT c_name, c_acctbal FROM customer
                |  WHERE c_nationkey = n.n_nationkey
                |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
                |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin)
      },
      Some("""SELECT n.n_name, t.c_name, CAST(t.c_acctbal AS DOUBLE) AS acctbal
             |FROM nation n, LATERAL (
             |  SELECT c_name, c_acctbal FROM customer
             |  WHERE c_nationkey = n.n_nationkey
             |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
             |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin),
    ),
    // mergeable-sketch rollup — the warehouse pattern behind "distinct
    // users over an arbitrary date range without rescanning events":
    // per-day HLL sketches materialize once (map-side combinable), any
    // range distinct-count is then a UNION of the day sketches. Union of
    // sketches ≡ sketch of the union, so the merged estimate is exactly
    // the whole-table estimate (Relational4Spec pins that identity and
    // the error vs the exact count); no DuckDB twin → rows-only gate.
    QueryDef(
      "q_hll_rollup",
      (s, dir) => {
        val e = Tables(s, dir).events
        val daily = e.groupBy(to_date(col("ts")).as("day"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        daily.agg(
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"),
          count(lit(1)).as("n_days"))
      },
      Some(graft.api.ParseSnapshots.sfPinnedSql("q_hll_rollup")),
    ),
    // mergeable QUANTILE rollup — the quantile twin of q_hll_rollup:
    // per-day fixed-grid histograms (4096 bins over the declared
    // [0, 1024) metric domain, bin width 0.25) merge to any-range
    // quantiles by LOSSLESS vector addition — no rescan, no
    // re-sketching, deterministic (unlike KLL/t-digest there is no
    // randomness and no merge-order dependence), and estimate error is
    // bounded by the bin width in value space. The cumulative window
    // runs over the ≤4096-row merged histogram — sketch-sized, never
    // the event relation; the day-level sketch table is what a real
    // deployment materializes. Fully SQL-expressible → hash-oracled.
    QueryDef(
      "q_quantile_sketch_rollup",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import HistogramSketch.est
        val e = Tables(s, dir).events
        val sk = e.select(to_date(col("ts")).as("day"),
          HistogramSketch.bin(col("value")).as("bin"))
          .groupBy("day", "bin").agg(count(lit(1)).as("c"))
        val merged = sk.groupBy("bin").agg(sum("c").as("c"))
        val cum = merged
          .withColumn("cum", sum("c").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("n", sum("c").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        cum.agg(est(0.5).as("q50_est"), est(0.9).as("q90_est"),
          est(0.99).as("q99_est"), max(col("n")).as("n"))
      },
      Some("""WITH sk AS (SELECT CAST(ts AS DATE) AS day,
             |  CAST(LEAST(GREATEST(FLOOR(value / 1024.0 * 4096), 0), 4095) AS INT) AS bin,
             |  COUNT(*) AS c FROM events GROUP BY 1, 2),
             |m AS (SELECT bin, SUM(c) AS c FROM sk GROUP BY 1),
             |cum AS (SELECT bin, SUM(c) OVER (ORDER BY bin) AS cum, SUM(c) OVER () AS n FROM m)
             |SELECT
             |CAST(MIN(CASE WHEN CAST(cum AS DOUBLE) >= 0.5*CAST(n AS DOUBLE) THEN bin END) + 1 AS DOUBLE)*0.25 AS q50_est,
             |CAST(MIN(CASE WHEN CAST(cum AS DOUBLE) >= 0.9*CAST(n AS DOUBLE) THEN bin END) + 1 AS DOUBLE)*0.25 AS q90_est,
             |CAST(MIN(CASE WHEN CAST(cum AS DOUBLE) >= 0.99*CAST(n AS DOUBLE) THEN bin END) + 1 AS DOUBLE)*0.25 AS q99_est,
             |CAST(MAX(n) AS BIGINT) AS n
             |FROM cum""".stripMargin),
    ),
  )
}
