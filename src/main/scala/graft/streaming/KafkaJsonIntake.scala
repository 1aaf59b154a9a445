package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Connection settings for the live Kafka intake (the reference's
  * consumer config, internal/kafka/kafka.go: brokers, topic, consumer
  * group; re-expressed as Structured Streaming source options).
  */
final case class KafkaConfig(
    bootstrapServers: String,
    topic: String,
    startingOffsets: String = "latest",
    maxOffsetsPerTrigger: Option[Long] = None)

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

  /** Live Kafka source (cluster deployment). Requires the
    * spark-sql-kafka-0-10 connector on the classpath — not shipped in
    * this container, so this path is compile-time wiring here and is
    * exercised through its batch-shaped twin (`parseEvents` on any
    * frame with a `value` column, which is exactly what the Kafka
    * source emits). `failOnDataLoss=false` mirrors the reference
    * consumer's log-and-continue posture (kafka.go error handling);
    * `maxOffsetsPerTrigger` bounds micro-batch size for backpressure.
    */
  def readKafkaStream(spark: SparkSession, cfg: KafkaConfig): DataFrame = {
    val reader = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("subscribe", cfg.topic)
      .option("startingOffsets", cfg.startingOffsets)
      .option("failOnDataLoss", "false")
    cfg.maxOffsetsPerTrigger
      .foldLeft(reader)((r, n) => r.option("maxOffsetsPerTrigger", n.toString))
      .load()
  }

  /** Typed event stream from live Kafka: parse + drop corrupt payloads.
    * Same schema as EventsStreaming.readEventStream, so everything
    * downstream (windowedAgg, sessionize) is source-agnostic.
    */
  def kafkaEvents(spark: SparkSession, cfg: KafkaConfig): DataFrame =
    parseEvents(readKafkaStream(spark, cfg))
      .filter(!col("_corrupt")).drop("_corrupt")

  /** Config-gated intake: with GRAFT_KAFKA_BOOTSTRAP + GRAFT_KAFKA_TOPIC
    * set, read the live topic; otherwise fall back to the file-source
    * twin (identical downstream plan — the choice is deployment config,
    * not code).
    */
  def events(spark: SparkSession, fileDir: String,
             env: Map[String, String] = sys.env): DataFrame =
    (env.get("GRAFT_KAFKA_BOOTSTRAP"), env.get("GRAFT_KAFKA_TOPIC")) match {
      case (Some(bs), Some(topic)) => kafkaEvents(spark, KafkaConfig(bs, topic))
      case _ => EventsStreaming.readEventStream(spark, fileDir)
    }

  // ---- producer side (the reference also PUBLISHES to Kafka:
  // internal/kafka/kafka.go's producer) --------------------------------

  /** Any frame → the Kafka message shape: every column folded into one
    * JSON `value` string. Works on batch and streaming frames — the
    * batch twin is what the round-trip spec exercises, no broker needed.
    */
  def toKafkaPayload(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))

  /** Typed event rows → exactly the value JSON `parseEvents` consumes
    * (eventSchema field names; timestamps back to epoch micros), so a
    * publish→consume cycle is lossless.
    */
  def eventsToKafkaJson(events: DataFrame): DataFrame =
    toKafkaPayload(events.select(
      col("event_id"), unix_micros(col("ts")).as("ts_us"), col("user_id"),
      col("event_type"), col("value"), col("props")))

  /** Live Kafka sink (cluster deployment) — the producer twin of
    * `readKafkaStream`, same compile-wiring scope (connector not on this
    * classpath). Exactly-once to the checkpoint's best ability:
    * writeStream tracks offsets; the broker side is at-least-once, as in
    * the reference producer.
    */
  def writeKafka(events: DataFrame, cfg: KafkaConfig,
                 checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    eventsToKafkaJson(events)
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("topic", cfg.topic)
      .option("checkpointLocation", checkpoint)
      .start()

  /** Config-gated output: with GRAFT_KAFKA_BOOTSTRAP + GRAFT_KAFKA_TOPIC
    * set, publish to the live topic; otherwise write the same payload
    * frame to a JSON-lines directory (the file twin — identical payload
    * bytes, deployment-config choice like `events`).
    */
  def writeEvents(events: DataFrame, fileDir: String, checkpoint: String,
                  env: Map[String, String] = sys.env): org.apache.spark.sql.streaming.StreamingQuery =
    (env.get("GRAFT_KAFKA_BOOTSTRAP"), env.get("GRAFT_KAFKA_TOPIC")) match {
      case (Some(bs), Some(topic)) =>
        writeKafka(events, KafkaConfig(bs, topic), checkpoint)
      case _ =>
        eventsToKafkaJson(events)
          .writeStream.format("text")
          .option("path", fileDir)
          .option("checkpointLocation", checkpoint)
          .start()
    }

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
