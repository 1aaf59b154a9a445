package graft

import graft.operators.{Streaming, Windowed}
import graft.streaming.{EventsStreaming, RawEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming semantics: MemoryStream incremental delivery and
  * stream/batch parity for sessionization.
  */
class StreamingSpec extends SparkSpec {

  private def q(name: String) =
    Streaming.entries.find(_.name == name).get.fn

  test("st_sessionize matches the window-based batch q_sessionize") {
    val stream = q("st_sessionize")(spark, sfDir)
      .select("user_id", "n_events", "start_us", "end_us", "total_value")
      .orderBy("user_id", "start_us")
      .collect().toSeq
    val batch = Windowed.entries.find(_.name == "q_sessionize").get
      .fn(spark, sfDir)
      .select("user_id", "n_events", "start_us", "end_us", "total_value")
      .orderBy("user_id", "start_us")
      .collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch)
  }

  test("windowedAgg over MemoryStream aggregates incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val query = EventsStreaming.windowedAgg(df)
      .writeStream.format("memory").queryName("win_test")
      .outputMode("complete").start()

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData((1L, t("2024-01-01 10:05:00"), "click", 1.0),
                (2L, t("2024-01-01 10:55:00"), "click", 2.0),
                (3L, t("2024-01-01 11:05:00"), "view", 5.0))
    query.processAllAvailable()
    mem.addData((4L, t("2024-01-01 11:30:00"), "view", 7.0))
    query.processAllAvailable()

    val rows = spark.table("win_test")
      .select(col("window_start").cast("string"), col("event_type"),
              col("n_events"), col("total_value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    query.stop()
    assert(rows == Set(
      ("2024-01-01 10:00:00", "click", 2L, 3.0),
      ("2024-01-01 11:00:00", "view", 2L, 12.0)))
  }

  test("st_windowed_agg end-to-end totals match batch daily totals") {
    val streamTotal = q("st_windowed_agg")(spark, sfDir)
      .agg(sum("n_events")).collect().head.getLong(0)
    val batchTotal = Tables(spark, sfDir).events.count()
    assert(streamTotal == batchTotal)
  }
}
