package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H suite completion: the remaining query SHAPES (Q2, Q4, Q6-Q22),
  * adapted to the driver testdata schema (no partsupp table; no
  * l_shipmode/l_commitdate/p_container/phone columns — the partsupp- and
  * comment-dependent queries substitute lineitem-derived equivalents that
  * preserve each query's plan shape: the same joins, the same correlation
  * structure, the same aggregation pattern).
  *
  * Together with q1/q3/q5 in [[Relational]] this gives the engine a full
  * 22-shape relational regression surface — the capability layer the
  * reference delegates to ClickHouse SQL
  * (/root/reference/grafana/clickhouse/dashboard-dmarc.json queries ride
  * on exactly these groupBy/join/having/subquery shapes).
  *
  * Scale notes (SURVEY §5): region/nation/supplier and every FILTERED
  * part subset broadcast; customer joins orders and orders joins lineitem
  * on their natural keys (hash shuffle, AQE-coalesced); scalar thresholds
  * (Q11/Q15/Q17/Q20/Q22) are computed as one-row frames and broadcast —
  * never a driver collect, never a recomputed subquery per row.
  *
  * Determinism (see [[Det]]): every float aggregate goes through exact
  * decimal sums; every ratio divides two identical-by-construction
  * doubles with arithmetic textually mirrored in the DuckDB oracle.
  */
object RelationalTpch extends QueryModule {
  import Det._

  /** Exact order-free revenue sum: sum(cast(e AS decimal(18,6))) → 2dp double. */
  private def revSum(c: Column) =
    round(sum(c.cast("decimal(18,6)")), 2).cast("double")

  private val revSql =
    "CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))),2) AS DOUBLE)"

  private def rev(t: Tables): Column =
    col("l_extendedprice") * (lit(1) - col("l_discount"))

  override def entries: Seq[QueryDef] = Seq(
    // ── Q2: min-cost supplier per part (partsupp-free adaptation: "cost"
    //    = min unit sale price from lineitem, candidates = EUROPE
    //    suppliers). Same shape: per-part correlated MIN + argmin join.
    QueryDef(
      "q2_min_cost_supplier",
      (s, dir) => {
        val t = Tables(s, dir)
        // EUROPE (r_regionkey=3) supplier dim — tiny, broadcasts
        val euSupp = t.supplier
          .join(broadcast(t.nation.filter(col("n_regionkey") === 3)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
        val unit = t.lineitem.select(
          col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") / col("l_quantity")).as("unit"))
          .join(broadcast(euSupp.select("s_suppkey")),
            col("l_suppkey") === col("s_suppkey"), "left_semi")
        val perPS = unit.groupBy("l_partkey", "l_suppkey").agg(min("unit").as("u"))
        val perP = perPS.groupBy(col("l_partkey").as("pk")).agg(min("u").as("mu"))
        // argmin with suppkey tiebreak: equality on identical-by-
        // construction doubles, then MIN(suppkey) among ties
        val chosen = perPS
          .join(perP, col("l_partkey") === col("pk") && col("u") === col("mu"))
          // unit_cost stays the RAW double: both engines compute the same
          // ext/qty IEEE division and min, so the bits match exactly —
          // rounding it (a binary double, not an exact decimal) at a
          // .xxxx5 boundary is where the engines would disagree
          .groupBy(col("l_partkey"))
          .agg(min("l_suppkey").as("suppkey"), min("u").as("unit_cost"))
        chosen
          .join(broadcast(t.part.filter(col("p_size") < 10 && col("p_type") === "STANDARD")),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(euSupp), col("suppkey") === col("s_suppkey"))
          .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost")
      },
      Some("""WITH eu AS (SELECT s_suppkey, s_name, n_name FROM supplier
             |  JOIN nation ON n_nationkey=s_nationkey WHERE n_regionkey=3),
             |ps AS (SELECT l_partkey, l_suppkey, MIN(l_extendedprice/l_quantity) u
             |  FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM eu) GROUP BY 1,2),
             |pm AS (SELECT l_partkey pk, MIN(u) mu FROM ps GROUP BY 1),
             |ch AS (SELECT ps.l_partkey, MIN(l_suppkey) suppkey, MIN(u) unit_cost
             |  FROM ps JOIN pm ON ps.l_partkey=pm.pk AND ps.u=pm.mu GROUP BY 1)
             |SELECT p_partkey, p_name, s_name, n_name, unit_cost
             |FROM ch JOIN part ON p_partkey=ch.l_partkey
             |JOIN eu ON s_suppkey=suppkey
             |WHERE p_size < 10 AND p_type='STANDARD'""".stripMargin),
    ),
    // ── Q4: order-priority checking — EXISTS semi join (late-delivery
    //    predicate stands in as returnflag='R', no l_commitdate here)
    QueryDef(
      "q4_order_priority",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders
          .filter(col("o_orderdate") >= lit("1997-01-01") &&
            col("o_orderdate") < lit("1997-04-01"))
          .join(t.lineitem.filter(col("l_returnflag") === "R").select("l_orderkey"),
            col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-04-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey=o_orderkey AND l_returnflag='R')
             |GROUP BY 1""".stripMargin),
    ),
    // ── Q6: forecasting revenue change — pure scan + filter + one agg
    //    (the pushdown showcase: no join at all)
    QueryDef(
      "q6_forecast_revenue",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .filter(col("l_shipdate") >= lit("1997-01-01") &&
            col("l_shipdate") < lit("1998-01-01") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(revSum(col("l_extendedprice") * col("l_discount")).as("revenue"))
      },
      Some("""SELECT CAST(ROUND(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(18,6))),2) AS DOUBLE) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin),
    ),
    // ── Q7: volume shipping between two regions (EUROPE suppliers →
    //    ASIA customers), grouped by nation pair × ship year
    QueryDef(
      "q7_volume_shipping",
      (s, dir) => {
        val t = Tables(s, dir)
        val suppN = t.supplier
          .join(broadcast(t.nation.filter(col("n_regionkey") === 3)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val custN = t.customer
          .join(broadcast(t.nation.filter(col("n_regionkey") === 2)),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        t.lineitem
          .filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1998-01-01"))
          .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(custN, col("o_custkey") === col("c_custkey"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("bigint").as("l_year"))
          .agg(revSum(rev(t)).as("revenue"))
      },
      Some(s"""SELECT supp_nation, cust_nation, l_year, $revSql AS revenue FROM (
              |  SELECT n1.n_name supp_nation, n2.n_name cust_nation,
              |         YEAR(l_shipdate) l_year, l_extendedprice, l_discount
              |  FROM lineitem
              |  JOIN supplier ON s_suppkey=l_suppkey
              |  JOIN orders ON o_orderkey=l_orderkey
              |  JOIN customer ON c_custkey=o_custkey
              |  JOIN nation n1 ON n1.n_nationkey=s_nationkey
              |  JOIN nation n2 ON n2.n_nationkey=c_nationkey
              |  WHERE n1.n_regionkey=3 AND n2.n_regionkey=2
              |    AND l_shipdate >= TIMESTAMP '1996-01-01'
              |    AND l_shipdate < TIMESTAMP '1998-01-01')
              |GROUP BY 1,2,3""".stripMargin),
    ),
    // ── Q8: national market share — NATION_7's slice of ECONOMY-part
    //    revenue sold to ASIA customers, by order year
    QueryDef(
      "q8_market_share",
      (s, dir) => {
        val t = Tables(s, dir)
        val suppN = t.supplier
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val asiaCust = t.customer
          .join(broadcast(t.nation.filter(col("n_regionkey") === 2)
            .select(col("n_nationkey").as("cnk"))),
            col("c_nationkey") === col("cnk"))
          .select("c_custkey")
        val vol = rev(t).cast("decimal(18,6)")
        t.lineitem
          .join(broadcast(t.part.filter(col("p_type") === "ECONOMY").select("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
          .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
          .agg(round(
            sum(when(col("supp_nation") === "NATION_7", rev(t)).otherwise(lit(0))
              .cast("decimal(18,6)")).cast("double") /
              sum(vol).cast("double"), 6).as("mkt_share"))
      },
      Some("""SELECT YEAR(o_orderdate) AS o_year,
             |ROUND(CAST(SUM(CAST(CASE WHEN n1.n_name='NATION_7'
             |        THEN l_extendedprice*(1-l_discount) ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
             |  / CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE),6) AS mkt_share
             |FROM lineitem
             |JOIN part ON p_partkey=l_partkey
             |JOIN supplier ON s_suppkey=l_suppkey
             |JOIN nation n1 ON n1.n_nationkey=s_nationkey
             |JOIN orders ON o_orderkey=l_orderkey
             |WHERE p_type='ECONOMY'
             |  AND o_custkey IN (SELECT c_custkey FROM customer
             |    JOIN nation n2 ON n2.n_nationkey=c_nationkey WHERE n2.n_regionkey=2)
             |GROUP BY 1""".stripMargin),
    ),
    // ── Q9: product-type profit (partsupp-free: profit = discounted
    //    revenue of '%widget%' parts) by supplier nation × order year
    QueryDef(
      "q9_product_profit",
      (s, dir) => {
        val t = Tables(s, dir)
        val suppN = t.supplier
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name"))
        t.lineitem
          .join(broadcast(t.part.filter(col("p_name").like("%widget%")).select("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("bigint").as("o_year"))
          .agg(revSum(rev(t)).as("sum_profit"))
      },
      Some(s"""SELECT n_name AS nation, YEAR(o_orderdate) AS o_year, $revSql AS sum_profit
              |FROM lineitem
              |JOIN part ON p_partkey=l_partkey
              |JOIN supplier ON s_suppkey=l_suppkey
              |JOIN nation ON n_nationkey=s_nationkey
              |JOIN orders ON o_orderkey=l_orderkey
              |WHERE p_name LIKE '%widget%'
              |GROUP BY 1,2""".stripMargin),
    ),
    // ── Q10: returned-item reporting — top 20 customers by refund-
    //    quarter revenue (deterministic custkey tiebreak on the limit)
    QueryDef(
      "q10_returned_items",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer
          .join(t.orders.filter(col("o_orderdate") >= lit("1997-01-01") &&
            col("o_orderdate") < lit("1997-04-01")),
            col("c_custkey") === col("o_custkey"))
          .join(t.lineitem.filter(col("l_returnflag") === "R"),
            col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "n_name")
          .agg(revSum(rev(t)).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, n_name, $revSql AS revenue
              |FROM customer
              |JOIN orders ON o_custkey=c_custkey
              |JOIN lineitem ON l_orderkey=o_orderkey
              |JOIN nation ON n_nationkey=c_nationkey
              |WHERE l_returnflag='R'
              |  AND o_orderdate >= TIMESTAMP '1997-01-01'
              |  AND o_orderdate < TIMESTAMP '1997-04-01'
              |GROUP BY 1,2,3
              |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
    ),
    // ── Q11: important stock (partsupp-free: per-part revenue share
    //    above 1.3× the mean part). Scalar threshold broadcast, not a
    //    per-row subquery.
    QueryDef(
      "q11_important_value",
      (s, dir) => {
        val t = Tables(s, dir)
        val pv = t.lineitem.groupBy(col("l_partkey").as("partkey"))
          .agg(sum(rev(t).cast("decimal(18,6)")).as("vd"))
        val scal = pv.agg(sum("vd").as("tot"), count(lit(1)).as("n"))
        pv.crossJoin(broadcast(scal))
          .filter(col("vd").cast("double") >
            lit(1.3) * (col("tot").cast("double") / col("n")))
          .select(col("partkey"), round(col("vd"), 2).cast("double").as("value"))
      },
      Some("""WITH pv AS (SELECT l_partkey partkey,
             |    SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) vd
             |  FROM lineitem GROUP BY 1),
             |sc AS (SELECT SUM(vd) tot, COUNT(*) n FROM pv)
             |SELECT partkey, CAST(ROUND(vd,2) AS DOUBLE) AS value FROM pv, sc
             |WHERE CAST(vd AS DOUBLE) > 1.3*(CAST(tot AS DOUBLE)/n)""".stripMargin),
    ),
    // ── Q12: shipping-mode priority classes (l_linestatus stands in for
    //    the absent l_shipmode) — conditional counts per class
    QueryDef(
      "q12_priority_class",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .filter(col("l_shipdate") >= lit("1997-01-01") &&
            col("l_shipdate") < lit("1998-01-01"))
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_linestatus")
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("low_line_count"))
      },
      Some("""SELECT l_linestatus,
             |CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON o_orderkey=l_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
             |GROUP BY 1""".stripMargin),
    ),
    // ── Q13: customer order-count distribution — the left-outer +
    //    double-aggregate shape (customers with zero orders kept)
    QueryDef(
      "q13_order_distribution",
      (s, dir) => {
        val t = Tables(s, dir)
        val o = t.orders.filter(col("o_orderpriority") =!= "5-LOW")
        t.customer
          .join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
      },
      Some("""SELECT c_count, COUNT(*) AS custdist FROM (
             |  SELECT c_custkey, COUNT(o_orderkey) c_count
             |  FROM customer LEFT JOIN orders
             |    ON o_custkey=c_custkey AND o_orderpriority <> '5-LOW'
             |  GROUP BY 1)
             |GROUP BY 1""".stripMargin),
    ),
    // ── Q14: promotion-effect revenue share in one month
    QueryDef(
      "q14_promo_revenue",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .filter(col("l_shipdate") >= lit("1997-03-01") &&
            col("l_shipdate") < lit("1997-04-01"))
          .join(broadcast(t.part.select("p_partkey", "p_type")),
            col("l_partkey") === col("p_partkey"))
          .agg(round(
            lit(100.0) *
              sum(when(col("p_type") === "PROMO", rev(t)).otherwise(lit(0))
                .cast("decimal(18,6)")).cast("double") /
              sum(rev(t).cast("decimal(18,6)")).cast("double"), 4)
            .as("promo_revenue"))
      },
      Some("""SELECT ROUND(100.0*CAST(SUM(CAST(CASE WHEN p_type='PROMO'
             |    THEN l_extendedprice*(1-l_discount) ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
             |  / CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE),4) AS promo_revenue
             |FROM lineitem JOIN part ON p_partkey=l_partkey
             |WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin),
    ),
    // ── Q15: top supplier — the "CREATE VIEW + max-of-view" shape: the
    //    quarter revenue frame reused for both the max scalar and the
    //    equality probe (exact decimals, so = is safe)
    QueryDef(
      "q15_top_supplier",
      (s, dir) => {
        val t = Tables(s, dir)
        val revs = t.lineitem
          .filter(col("l_shipdate") >= lit("1997-01-01") &&
            col("l_shipdate") < lit("1997-04-01"))
          .groupBy(col("l_suppkey"))
          .agg(sum(rev(t).cast("decimal(18,6)")).as("rev"))
        val mx = revs.agg(max("rev").as("mx"))
        revs.join(broadcast(mx), col("rev") === col("mx"))
          .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            round(col("rev"), 2).cast("double").as("total_revenue"))
      },
      Some("""WITH r AS (SELECT l_suppkey,
             |    SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) rev
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
             |  GROUP BY 1)
             |SELECT s_suppkey, s_name, CAST(ROUND(rev,2) AS DOUBLE) AS total_revenue
             |FROM r JOIN supplier ON s_suppkey=l_suppkey
             |WHERE rev = (SELECT MAX(rev) FROM r)""".stripMargin),
    ),
    // ── Q16: supplier count by part descriptor (partsupp-free: supplier
    //    relationships from lineitem), excluding one brand and negative-
    //    balance suppliers (the "complaints" anti join)
    QueryDef(
      "q16_supplier_cnt",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .join(broadcast(t.part.filter(col("p_size").isin(1, 5, 9, 13) &&
            col("p_brand") =!= "Brand#13")),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(t.supplier.filter(col("s_acctbal") < 0).select("s_suppkey")),
            col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      },
      Some("""SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem JOIN part ON p_partkey=l_partkey
             |WHERE p_size IN (1,5,9,13) AND p_brand <> 'Brand#13'
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY 1,2,3""".stripMargin),
    ),
    // ── Q17: small-quantity-order revenue — per-part average joined
    //    back (never a per-row correlated rescan)
    QueryDef(
      "q17_small_qty_revenue",
      (s, dir) => {
        val t = Tables(s, dir)
        val brandParts = broadcast(
          t.part.filter(col("p_brand") === "Brand#13").select("p_partkey"))
        val pa = t.lineitem
          .join(brandParts, col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy(col("l_partkey").as("pk"))
          .agg((sum(col("l_quantity").cast(Money)).cast("double") /
            count(lit(1))).as("avg_qty"))
        t.lineitem
          .join(brandParts, col("l_partkey") === col("p_partkey"), "left_semi")
          .join(pa, col("l_partkey") === col("pk"))
          .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
          .agg(round(sum(col("l_extendedprice").cast(Money)).cast("double") / 7.0, 2)
            .as("avg_yearly"))
      },
      Some("""WITH bp AS (SELECT p_partkey FROM part WHERE p_brand='Brand#13'),
             |pa AS (SELECT l_partkey pk,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) avg_qty
             |  FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM bp) GROUP BY 1)
             |SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/7.0,2) AS avg_yearly
             |FROM lineitem JOIN pa ON pk=l_partkey
             |WHERE l_quantity < 0.5*avg_qty""".stripMargin),
    ),
    // ── Q18: large-volume customers — HAVING on an order-level rollup,
    //    then rejoin the order/customer detail
    QueryDef(
      "q18_large_volume",
      (s, dir) => {
        val t = Tables(s, dir)
        val big = t.lineitem.groupBy(col("l_orderkey"))
          .agg(moneySum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 180)
        big
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate").cast("date").as("o_orderdate"),
            col("o_totalprice"), col("sum_qty"))
      },
      Some("""WITH s AS (SELECT l_orderkey,
             |    CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))),2) AS DOUBLE) sum_qty
             |  FROM lineitem GROUP BY 1)
             |SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
             |       o_totalprice, sum_qty
             |FROM s JOIN orders ON o_orderkey=l_orderkey
             |JOIN customer ON c_custkey=o_custkey
             |WHERE sum_qty > 180""".stripMargin),
    ),
    // ── Q19: disjunctive-predicate revenue (three brand/size/quantity
    //    conjunct groups OR-ed over the broadcast part join)
    QueryDef(
      "q19_disjunctive_rev",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .join(broadcast(t.part
            .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
            .select("p_partkey", "p_brand", "p_size")),
            col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 21)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
              col("l_quantity").between(10, 30)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
              col("l_quantity").between(20, 40)))
          .agg(revSum(rev(t)).as("revenue"))
      },
      Some(s"""SELECT $revSql AS revenue
              |FROM lineitem JOIN part ON p_partkey=l_partkey
              |WHERE (p_brand='Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
              |   OR (p_brand='Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
              |   OR (p_brand='Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""".stripMargin),
    ),
    // ── Q20: excess shippers (partsupp-free: suppliers whose 1997
    //    'blue%'-part shipped volume exceeds 1.5× the supplier mean) —
    //    scalar threshold broadcast like Q11
    QueryDef(
      "q20_excess_shippers",
      (s, dir) => {
        val t = Tables(s, dir)
        val sq = t.lineitem
          .filter(col("l_shipdate") >= lit("1997-01-01") &&
            col("l_shipdate") < lit("1998-01-01"))
          .join(broadcast(t.part.filter(col("p_name").like("blue%")).select("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"))
          .agg(sum(col("l_quantity").cast(Money)).as("qd"))
        val scal = sq.agg(sum("qd").as("tot"), count(lit(1)).as("n"))
        sq.crossJoin(broadcast(scal))
          .filter(col("qd").cast("double") >
            lit(1.5) * (col("tot").cast("double") / col("n")))
          .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"),
            round(col("qd"), 2).cast("double").as("qty"))
      },
      Some("""WITH sq AS (SELECT l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) qd
             |  FROM lineitem JOIN part ON p_partkey=l_partkey
             |  WHERE p_name LIKE 'blue%'
             |    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
             |  GROUP BY 1),
             |sc AS (SELECT SUM(qd) tot, COUNT(*) n FROM sq)
             |SELECT s_suppkey, s_name, n_name, CAST(ROUND(qd,2) AS DOUBLE) AS qty
             |FROM sq, sc
             |JOIN supplier ON s_suppkey=l_suppkey
             |JOIN nation ON n_nationkey=s_nationkey
             |WHERE CAST(qd AS DOUBLE) > 1.5*(CAST(tot AS DOUBLE)/n)""".stripMargin),
    ),
    // ── Q21: suppliers who kept orders waiting (no l_receiptdate: the
    //    sole-supplier-at-fault pattern keyed on returnflag='R') — the
    //    EXISTS/NOT-EXISTS pair collapsed into one two-level aggregate
    QueryDef(
      "q21_waiting_supplier",
      (s, dir) => {
        val t = Tables(s, dir)
        val os = t.lineitem
          .join(t.orders.filter(col("o_orderstatus") === "F").select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("hasr"))
        val perOrder = os.groupBy(col("l_orderkey").as("ok"))
          .agg(count(lit(1)).as("ns"), sum("hasr").as("nr"))
        os.join(perOrder, col("l_orderkey") === col("ok"))
          .filter(col("ns") > 1 && col("nr") === 1 && col("hasr") === 1)
          .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_suppkey", "s_name")
          .agg(count(lit(1)).as("numwait"))
      },
      Some("""WITH os AS (SELECT l_orderkey, l_suppkey,
             |    MAX(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END) hasr
             |  FROM lineitem JOIN orders ON o_orderkey=l_orderkey
             |  WHERE o_orderstatus='F' GROUP BY 1,2),
             |po AS (SELECT l_orderkey ok, COUNT(*) ns, SUM(hasr) nr FROM os GROUP BY 1)
             |SELECT s_suppkey, s_name, COUNT(*) AS numwait
             |FROM os JOIN po ON os.l_orderkey=po.ok
             |JOIN supplier ON s_suppkey=l_suppkey
             |WHERE ns>1 AND nr=1 AND hasr=1
             |GROUP BY 1,2""".stripMargin),
    ),
    // ── Q22: global sales opportunity — rich-but-inactive customers
    //    (scalar avg + anti join; c_nationkey stands in for the phone
    //    country code)
    QueryDef(
      "q22_inactive_customers",
      (s, dir) => {
        val t = Tables(s, dir)
        val avgPos = t.customer.filter(col("c_acctbal") > 0)
          .agg((sum(col("c_acctbal").cast(Money)).cast("double") /
            count(lit(1))).as("ab"))
        val recent = t.orders
          .filter(col("o_orderdate") >= lit("1999-01-01")).select("o_custkey")
        t.customer.crossJoin(broadcast(avgPos))
          .filter(col("c_acctbal") > col("ab"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey").as("cntry"))
          .agg(count(lit(1)).as("numcust"), moneySum(col("c_acctbal")).as("totacctbal"))
      },
      Some("""SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
             |CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))),2) AS DOUBLE) AS totacctbal
             |FROM customer
             |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)
             |                   FROM customer WHERE c_acctbal > 0)
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey=c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01')
             |GROUP BY 1""".stripMargin),
    ),
  )
}
