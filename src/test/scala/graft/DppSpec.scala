package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Dynamic partition pruning: when a partitioned fact joins a filtered
  * dim, Spark must inject the dim's key set into the fact scan as a
  * runtime partition filter — at 100 TB this is the difference between
  * scanning 3 day-directories and scanning the table. The testdata
  * parquet is unpartitioned, so the spec materializes a day-partitioned
  * copy and proves both the plan shape and the answer.
  */
class DppSpec extends SparkSpec {

  test("fact scan is runtime-pruned by the dim filter (and the join is correct)") {
    val table = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val events = Tables(spark, sfDir).events
      .withColumn("day", date_format(col("ts"), "yyyyMMdd"))
    events.write.mode("overwrite").partitionBy("day").parquet(table)

    val fact = spark.read.parquet(table)
    // dim: one row per day with an attribute to filter on — only the
    // first 3 days survive the filter
    val firstDays = events.select(col("day")).distinct()
      .orderBy("day").limit(3)
      .collect().map(_.getString(0))
    val dim = events.select(col("day")).distinct()
      .withColumn("is_early", col("day").isin(firstDays.toIndexedSeq: _*))

    val joined = fact.join(dim.filter(col("is_early")), "day")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"no dynamic partition pruning in plan:\n$plan")

    val expected = events.filter(col("day").isin(firstDays.toIndexedSeq: _*)).count()
    assert(joined.count() === expected)

    val root = new Path(table)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(root, true)
  }
}
