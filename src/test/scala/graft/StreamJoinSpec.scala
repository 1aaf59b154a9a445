package graft

import graft.streaming.EventsStreaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join semantics: a click pairs with every
  * same-user view inside [click − 30 min, click], views buffered in
  * state pair with clicks from LATER micro-batches, and out-of-horizon
  * or cross-user pairs never emit.
  */
class StreamJoinSpec extends SparkSpec {

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("clicks attribute to in-horizon views across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("event_id", "user_id", "ts", "event_type")
    val name = s"attr_${System.nanoTime()}"
    val query = EventsStreaming.attributeClicks(df)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()

    // batch 1: views only — nothing can emit yet
    mem.addData((1L, 1L, t("2024-01-01 10:00:00"), "view"),
                (2L, 1L, t("2024-01-01 10:20:00"), "view"),
                (3L, 2L, t("2024-01-01 09:00:00"), "view"),
                (4L, 3L, t("2024-01-01 10:00:00"), "view"))
    query.processAllAvailable()
    assert(spark.table(name).isEmpty)

    // batch 2: clicks — user 1's click pairs with BOTH buffered views
    // (10:00 exactly at the 30-min bound, inclusive; 10:20 inside);
    // user 2's click is 90 min after its view (outside horizon); user
    // 4 clicks with no view at all; user 3's view pairs with nothing.
    mem.addData((5L, 1L, t("2024-01-01 10:30:00"), "click"),
                (6L, 2L, t("2024-01-01 10:30:00"), "click"),
                (7L, 4L, t("2024-01-01 10:30:00"), "click"))
    query.processAllAvailable()
    query.stop()

    val got = spark.table(name)
      .select("user_id", "view_id", "click_id", "lag_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === Set(
      (1L, 1L, 5L, 1800000000L), // inclusive 30-min boundary
      (1L, 2L, 5L, 600000000L),
    ))
  }

  test("st_click_attribution matches the batch interval join") {
    val stream = graft.operators.Streaming.entries
      .find(_.name == "st_click_attribution").get.fn(spark, sfDir)
    val e = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
              unix_micros(col("ts")).as("ts_us"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts_us").as("v_us"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts_us").as("c_us"))
    val batch = v.join(c, "user_id")
      .filter(col("v_us") <= col("c_us") && col("v_us") >= col("c_us") - 1800000000L)
      .select(col("user_id"), col("view_id"), col("click_id"),
              (col("c_us") - col("v_us")).as("lag_us"))
    assert(stream.count() > 0)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }
}
