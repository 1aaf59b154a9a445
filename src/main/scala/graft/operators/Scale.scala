package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale patterns made explicit as operators: salted two-stage
  * aggregation for skewed keys. events.event_type has 5 values across
  * the whole table — the worst-case skew shape: every row shuffles to 5
  * reducers no matter how many executors exist. Salting fans the partial
  * aggregation across `salt` buckets first, then combines the (at most
  * 5×salt) partials; with exact decimal sums the result is bit-identical
  * to the direct aggregation, which is what the DuckDB oracle checks.
  */
object Scale extends QueryModule {

  /** Two-stage salted aggregation: count + decimal sum per key. */
  def saltedSum(df: DataFrame, key: Column, value: Column, saltBuckets: Int): DataFrame = {
    val salt = pmod(crc32(col("event_id").cast("string")), lit(saltBuckets))
    df.groupBy(key.as("k"), salt.as("s"))
      .agg(count(lit(1)).as("pn"), sum(value.cast("decimal(18,2)")).as("pv"))
      .groupBy(col("k"))
      .agg(sum(col("pn")).as("n_events"),
           round(sum(col("pv")), 2).cast("double").as("total_value"))
  }

  override def entries: Seq[QueryDef] = Seq(
    QueryDef(
      "q_salted_agg",
      (s, dir) => {
        val e = Tables(s, dir).events
        saltedSum(e, col("event_type"), col("value"), 16)
          .withColumnRenamed("k", "event_type")
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n_events,
             |CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))),2) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
  )
}
