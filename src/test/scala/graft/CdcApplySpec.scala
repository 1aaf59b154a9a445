package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.sources.Merge
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming CDC-apply loop across REAL micro-batch boundaries
  * (st_upsert_apply's gate run is one AvailableNow batch): corrections
  * split over several files, applied one file per trigger, must converge
  * to the batch answer — and re-delivering the whole feed must change
  * nothing (keyed upsert is idempotent).
  */
class CdcApplySpec extends SparkSpec {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(dir: String): Unit = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("multi-batch apply converges and re-delivery is a no-op") {
    val events = Tables(spark, sfDir).events
      .withColumn("day", date_format(col("ts"), "yyyyMMdd"))
    val table = tmp("graft-cdc-spec")
    events.write.mode("overwrite").partitionBy("day").parquet(table)

    val corrections = events
      .filter(pmod(col("event_id"), lit(20)) === 0)
      .withColumn("value", lit(7777.75))
    val feed = tmp("graft-cdc-feed")
    corrections.repartition(3).write.mode("overwrite").parquet(feed)

    val batches = new AtomicInteger(0)
    def applyFeed(): Unit = {
      val q = spark.readStream
        .schema(corrections.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            batches.incrementAndGet()
            Merge.upsertPartitioned(spark, table, batch, "event_id", "day")
            ()
          }
        }
        .trigger(Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), "cdc apply timed out")
    }

    applyFeed()
    assert(batches.get() >= 2, s"expected several micro-batches, got ${batches.get()}")

    def snapshot() = spark.read.parquet(table)
      .select("event_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).sorted.toSeq
    val converged = snapshot()
    // exactly the corrected keys carry the new value, everyone else kept theirs
    val nCorr = corrections.count()
    assert(converged.count(_._2 == 7777.75).toLong === nCorr)
    assert(spark.read.parquet(table).count() === events.count())

    // full re-delivery (fresh stream over the same feed): no-op
    applyFeed()
    assert(snapshot() === converged)

    rm(table); rm(feed)
  }
}
