package graft

import org.apache.spark.sql.functions._

/** Bucketing = the co-located join story for 100 TB: both fact tables
  * pre-hashed into the same bucket layout on the join key means the join
  * plans without any Exchange (shuffle) on either side.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join over tables bucketed on the key plans without a shuffle") {
    val t = Tables(spark, sfDir)
    // clean any leftover managed-table location from a prior crashed run
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    Seq("orders_b", "lineitem_b").foreach { n =>
      val loc = new java.io.File(s"spark-warehouse/$n")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }

    t.orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    t.lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    // force the merge-join path (tiny test data would broadcast, hiding
    // the property under test: bucket-co-located joins don't shuffle)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined =
      try {
        val j = spark.table("orders_b")
          .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        val plan = j.queryExecution.executedPlan.toString
        // neither join input may shuffle (bucket layout IS the hash
        // partitioning); the only Exchange allowed is the final groupBy's
        val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
        assert(!joinSection.contains("Exchange hashpartitioning"), plan)
        j
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    // and it returns the same result as the plain-parquet join
    val expected = t.orders.join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus").collect().toSeq
    assert(joined.orderBy("o_orderstatus").collect().toSeq == expected)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}
