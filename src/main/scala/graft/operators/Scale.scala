package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale patterns made explicit as operators: salted two-stage
  * aggregation and salted replicated joins for skewed keys.
  * events.event_type has 5 values across the whole table — the
  * worst-case skew shape: every row shuffles to 5 reducers no matter
  * how many executors exist. Salting fans the work across `salt`
  * buckets first; with exact decimal sums the result is bit-identical
  * to the unsalted plan, which is what the DuckDB oracles check.
  */
object Scale extends QueryModule {

  /** Two-stage salted aggregation: count + decimal sum per key. `rowId`
    * seeds the deterministic salt (any column unique-ish per row).
    */
  def saltedSum(df: DataFrame, key: Column, value: Column, saltBuckets: Int,
                rowId: Column = col("event_id")): DataFrame = {
    val salt = pmod(crc32(rowId.cast("string")), lit(saltBuckets))
    df.groupBy(key.as("k"), salt.as("s"))
      .agg(count(lit(1)).as("pn"), sum(value.cast("decimal(18,2)")).as("pv"))
      .groupBy(col("k"))
      .agg(sum(col("pn")).as("n_events"),
           round(sum(col("pv")), 2).cast("double").as("total_value"))
  }

  /** Salted replicated join for a skewed fact ⋈ dim: every dim row is
    * replicated into all `saltBuckets` salt values and the fact side
    * derives a deterministic salt from its row id, so each hot join key
    * spreads over `saltBuckets` reducers instead of landing on one.
    * This is the MANUAL fallback for when AQE's runtime skew-join split
    * can't see the skew (it only splits post-shuffle partitions it has
    * sizes for); at 1000 executors an unsalted sort-merge join on a
    * 5-value key leaves 995 of them idle. The join is hinted off the
    * broadcast path — the pattern exists precisely for dims too big to
    * broadcast (the query's 5-row fixture stands in for one).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, factId: Column,
                 saltBuckets: Int): DataFrame = {
    val dimR = dim.withColumn("salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    val factS = fact.withColumn("salt",
      pmod(crc32(factId.cast("string")), lit(saltBuckets)).cast("int"))
    factS.join(dimR.hint("shuffle_hash"), Seq(key, "salt")).drop("salt")
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
    // salted replicated join, oracled against the plain (unsalted) join:
    // the salt must change WHERE rows meet, never WHICH rows meet
    QueryDef(
      "q_skew_join_salted",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir).events
        val dim = Seq(
          ("view", "browse"), ("click", "engage"), ("purchase", "convert"),
          ("signup", "acquire"), ("error", "ops"),
        ).toDF("event_type", "category")
        saltedJoin(e, dim, "event_type", col("event_id"), 16)
          .groupBy("category")
          .agg(count(lit(1)).as("n_events"),
               round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("total_value"))
          .orderBy("category")
      },
      Some("""WITH dim AS (SELECT * FROM (VALUES
             |  ('view','browse'), ('click','engage'), ('purchase','convert'),
             |  ('signup','acquire'), ('error','ops')) AS v(event_type, category))
             |SELECT category, COUNT(*) AS n_events,
             |CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))),2) AS DOUBLE) AS total_value
             |FROM events JOIN dim USING(event_type)
             |GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
  )
}
