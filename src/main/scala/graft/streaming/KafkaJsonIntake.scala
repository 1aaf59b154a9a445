package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-shaped JSON intake: the reference publishes reports/events to
  * Kafka (internal/kafka/kafka.go); the Spark-native consumer is
  * `readStream.format("kafka")` → this transform. Takes any DataFrame
  * with a `value` string column (exactly what the Kafka source emits,
  * batch or streaming) and returns typed event rows — so the same code
  * serves `spark.readStream` in production and plain DataFrames in
  * tests, with no Kafka broker needed for the latter.
  */
object KafkaJsonIntake {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** value JSON → typed columns; malformed payloads land in a
    * `_corrupt` flag instead of failing the stream.
    */
  def parseEvents(kafkaShaped: DataFrame): DataFrame =
    kafkaShaped
      .withColumn("j", from_json(col("value").cast("string"), eventSchema))
      .select(
        col("j.event_id").as("event_id"),
        timestamp_micros(col("j.ts_us")).as("ts"),
        col("j.user_id").as("user_id"),
        col("j.event_type").as("event_type"),
        col("j.value").as("value"),
        col("j.props").as("props"),
        // from_json in PERMISSIVE mode yields a null-fielded struct for
        // malformed payloads, not a null struct — flag on the required id
        (col("j").isNull || col("j.event_id").isNull).as("_corrupt"))
}
