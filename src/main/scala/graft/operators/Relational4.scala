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
    QueryDef(
      "q_ntile",
      (s, dir) => {
        val e = Tables(s, dir).events
        val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
        e.select(col("event_type"), col("value"), ntile(4).over(w).as("quartile"))
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
  )
}
