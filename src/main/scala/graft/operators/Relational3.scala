package graft.operators

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third relational slice: CUBE grouping, window value functions,
  * conditional-expression and date-function batteries.
  */
object Relational3 extends QueryModule {
  import Det._

  override def entries: Seq[QueryDef] = Seq(
    QueryDef(
      "q_cube",
      (s, dir) => {
        val o = Tables(s, dir).orders
        o.cube("o_orderstatus", "o_orderpriority")
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
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY 1, 2""".stripMargin),
    ),
    QueryDef(
      "q_window_values",
      (s, dir) => {
        val e = Tables(s, dir).events
        val daily = e.groupBy(col("user_id"), col("ts").cast("date").as("date"))
          .agg(count(lit(1)).as("n"))
        val wAll = Window.partitionBy("user_id").orderBy("date")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        daily.select(col("user_id"), col("date"), col("n"),
            first(col("n")).over(wAll).as("first_n"),
            last(col("n")).over(wAll).as("last_n"),
            nth_value(col("n"), 2).over(wAll).as("second_n"))
          .orderBy("user_id", "date")
      },
      Some("""SELECT user_id, date, n,
             |FIRST_VALUE(n) OVER w AS first_n,
             |LAST_VALUE(n) OVER w AS last_n,
             |NTH_VALUE(n, 2) OVER w AS second_n
             |FROM (SELECT user_id, CAST(ts AS DATE) AS date, COUNT(*) AS n
             |      FROM events GROUP BY 1, 2)
             |WINDOW w AS (PARTITION BY user_id ORDER BY date
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY user_id, date""".stripMargin),
    ),
    QueryDef(
      "q_conditional_expr",
      (s, dir) => {
        val p = Tables(s, dir).part
        p.select(col("p_partkey"),
            // BIGINT: DuckDB types GREATEST/LEAST as BIGINT where Spark
            // keeps INT — the result dtype is part of the gate contract
            greatest(col("p_size"), lit(25)).cast("bigint").as("g25"),
            least(col("p_size"), lit(25)).cast("bigint").as("l25"),
            nullif(col("p_size"), lit(25)).as("nz"),
            coalesce(nullif(col("p_size"), lit(25)), lit(-1)).as("co"),
            abs(col("p_size") - 25).as("dist25"),
            (col("p_size") % 7).as("mod7"),
            when(col("p_size") > 25, "big").when(col("p_size") > 10, "mid")
              .otherwise("small").as("bucket"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
             |GREATEST(p_size, 25) AS g25, LEAST(p_size, 25) AS l25,
             |NULLIF(p_size, 25) AS nz,
             |COALESCE(NULLIF(p_size, 25), -1) AS co,
             |ABS(p_size - 25) AS dist25,
             |p_size % 7 AS mod7,
             |CASE WHEN p_size > 25 THEN 'big' WHEN p_size > 10 THEN 'mid'
             |  ELSE 'small' END AS bucket
             |FROM part ORDER BY p_partkey""".stripMargin),
    ),
    QueryDef(
      "q_array_funcs",
      (s, dir) => {
        val p = Tables(s, dir).part
        val words = split(col("p_name"), " ")
        // Array results serialized with array_join so the driver's
        // pandas comparator can sort the output rows.
        p.select(col("p_partkey"),
            size(words).cast("bigint").as("n_words"),
            array_join(array_sort(array_distinct(words)), ",").as("sorted_words"),
            array_contains(words, "green").as("has_green"),
            array_join(slice(words, 1, 2), ",").as("first_two"),
            array_join(reverse(words), "-").as("rev_joined"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
             |CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
             |array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ',') AS sorted_words,
             |list_contains(string_split(p_name, ' '), 'green') AS has_green,
             |array_to_string(string_split(p_name, ' ')[1:2], ',') AS first_two,
             |array_to_string(list_reverse(string_split(p_name, ' ')), '-') AS rev_joined
             |FROM part ORDER BY p_partkey""".stripMargin),
    ),
    QueryDef(
      "q_quantiles_by_group",
      (s, dir) => {
        val l = Tables(s, dir).lineitem
        l.groupBy("l_returnflag")
          .agg(round(expr("percentile(l_quantity, 0.5)"), 4).as("qty_median"),
               round(expr("percentile(l_extendedprice, 0.9)"), 4).as("price_p90"),
               count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS qty_median,
             |ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS price_p90,
             |COUNT(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
    QueryDef(
      "q_histogram",
      (s, dir) => {
        val e = Tables(s, dir).events
        e.groupBy(floor(col("value") / 20).cast("int").as("bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy("bucket")
      },
      Some("""SELECT CAST(FLOOR(value / 20) AS INT) AS bucket, COUNT(*) AS n
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
    QueryDef(
      "q_date_funcs",
      (s, dir) => {
        val o = Tables(s, dir).orders
        val d = col("o_orderdate").cast("date")
        o.select(col("o_orderkey"),
            year(d).as("y"), quarter(d).as("q"), month(d).as("m"),
            dayofmonth(d).as("dom"),
            date_add(d, 30).as("plus30"),
            last_day(d).as("month_end"),
            datediff(lit("1998-01-01").cast("date"), d).cast("int").as("days_to_98"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS y,
             |CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS q,
             |CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS m,
             |CAST(day(CAST(o_orderdate AS DATE)) AS INT) AS dom,
             |CAST(o_orderdate AS DATE) + 30 AS plus30,
             |last_day(CAST(o_orderdate AS DATE)) AS month_end,
             |CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT) AS days_to_98
             |FROM orders ORDER BY o_orderkey""".stripMargin),
    ),
  )
}
