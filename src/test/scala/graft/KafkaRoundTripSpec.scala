package graft

import graft.streaming.KafkaJsonIntake
import org.apache.spark.sql.functions._

/** Producer/consumer parity on the batch twins: the payload
  * `eventsToKafkaJson` emits must round-trip losslessly through
  * `parseEvents` (the same pair of transforms the live Kafka sink and
  * source wrap), and the config-gated file twin must write that exact
  * payload.
  */
class KafkaRoundTripSpec extends SparkSpec {

  private def events = Tables(spark, sfDir).events
    .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
            col("user_id"), col("event_type"), col("value"), col("props"))

  test("eventsToKafkaJson → parseEvents is lossless") {
    val payload = KafkaJsonIntake.eventsToKafkaJson(events)
    assert(payload.columns.toSeq == Seq("value"))
    val back = KafkaJsonIntake.parseEvents(payload)
    assert(back.filter(col("_corrupt")).count() == 0)
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val a = events.select(cols.head, cols.tail: _*).collect().map(_.toString).sorted
    val b = back.select(cols.head, cols.tail: _*).collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq && a.nonEmpty)
  }

  test("writeEvents file twin persists the exact kafka payload (streaming)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, java.sql.Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("kafka_files")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData((1L, t("2024-01-01 10:00:00"), 7L, "click", 1.5, "{}"))
    // no GRAFT_KAFKA_* in env → file twin
    val q = KafkaJsonIntake.writeEvents(df, s"$tmp/out", s"$tmp/ckpt", env = Map.empty)
    q.processAllAvailable(); q.stop()
    val lines = spark.read.text(s"$tmp/out")
    assert(lines.count() == 1)
    val back = KafkaJsonIntake.parseEvents(lines.withColumnRenamed("value", "value")
      .select(col("value")))
    val r = back.collect().head
    assert(!r.getAs[Boolean]("_corrupt"))
    assert(r.getAs[Long]("event_id") == 1L && r.getAs[Long]("user_id") == 7L)
    assert(r.getAs[Double]("value") == 1.5)
  }

  test("writeKafka wiring targets the kafka sink when config present") {
    // connector jars are not on this classpath; asserting the failure
    // mode IS the wiring check — the plan resolves the kafka format and
    // fails on the missing DataSource, not on our own code
    val tmp = java.nio.file.Files.createTempDirectory("kafka_sink")
    val ex = intercept[Exception] {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
        (Long, java.sql.Timestamp, Long, String, Double, String)]
      val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      KafkaJsonIntake.writeEvents(df, s"$tmp/out", s"$tmp/ckpt",
        env = Map("GRAFT_KAFKA_BOOTSTRAP" -> "broker:9092",
                  "GRAFT_KAFKA_TOPIC" -> "events"))
    }
    val msg = String.valueOf(ex.getMessage).toLowerCase
    assert(msg.contains("kafka"), msg)
  }
}
