package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

final case class RawEvent(
    event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

final case class SessionOut(
    user_id: Long, session_id: Long, n_events: Long,
    start_us: Long, end_us: Long, total_value: Double)

/** The one open session for a user. `total_cents` keeps the money sum
  * exact (decimal(18,2) semantics, matching Det.moneySum) without
  * holding per-event data: state is O(1) per key, not O(events).
  */
final case class OpenSession(n_events: Long, start_us: Long, end_us: Long, total_cents: Long)

/** Streaming session state: the next session id to assign (so ids stay
  * monotonic per user across micro-batches — a closed-and-emitted session
  * is never re-numbered) plus at most one open session. ~4 longs per
  * user; watermark + event-time timeout evict the open session.
  */
final case class SessionState(next_id: Long, open: Option[OpenSession])

/** Structured Streaming pipelines over the events table — the Spark-first
  * equivalent of the reference's Kafka/IMAP/HTTP continuous intake
  * (internal/kafka/kafka.go, internal/imap/client.go): readStream →
  * watermark → windowed aggregation / stateful sessionization →
  * writeStream. The batch twins (q_daily_volume, q_sessionize) are
  * DuckDB-oracled; specs assert stream/batch parity.
  *
  * Scale: session state per user is a single open-session summary (4
  * longs) emitted on event-time timeout once the watermark passes the
  * session gap — executor memory holds open sessions only, never event
  * buffers.
  */
object EventsStreaming {

  /** File-based stream over the events parquet (stands in for Kafka — the
    * plan downstream is identical).
    *
    * The stream schema is DERIVED from the file, never hand-written: a
    * streaming read silently coerces the parquet physical type into
    * whatever schema it is handed (an INT64-micros column read as LongType
    * "succeeds" with raw micros — which a nanos→micros division then
    * compresses 1000×, collapsing all event time into ~1970). Reading the
    * footer schema and routing through the same [[graft.EventTime]]
    * normalization as `Tables.events` makes stream rows identical to batch
    * rows by construction, under every testdata generation.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val fileSchema = spark.read.parquet(s"$dir/events.parquet").schema
    graft.EventTime.normalizeTs(
      spark.readStream
        .schema(fileSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir),
      s"$dir/events.parquet")
  }

  /** Tumbling 1h windows per event type, 2h watermark. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n_events"), col("total_value"))

  /** Tumbling 1-day windowed second-moment stats per event type. The
    * state per (window, type) group is the power-sum triple (n, Σx, Σx²)
    * — exact decimals, so micro-batch arrival order can't drift the
    * result — and the mean/variance derivation happens in the output
    * projection. This is why the power-sum formulation (q_stats_moments)
    * matters for streaming: unlike a finished variance, power sums merge
    * incrementally, so the same aggregation runs batch or streaming with
    * identical results (the oracle checks this cross-engine).
    */
  def windowedMoments(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sx"),
           sum(expr("CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))"))
             .cast("double").as("sx2"))
      // NO round on the derived moments: the division chains are IEEE
      // ops on identical inputs, so the raw doubles are bit-identical in
      // both engines — but round()-at-4dp is NOT (Spark rounds the exact
      // binary expansion, DuckDB the scaled value; they disagree exactly
      // at display-tie boundaries like x.xxxx5, observed at sf0.001)
      .select(unix_micros(col("window.start")).as("window_us"), col("event_type"),
              col("n"),
              expr("sx / CAST(n AS DOUBLE)").as("mean_value"),
              expr("""CASE WHEN n > 1
                     |THEN (sx2 - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)
                     |ELSE CAST(NULL AS DOUBLE) END""".stripMargin).as("var_value"))

  /** Streaming-maintained quantile sketch: per-day fixed-grid histogram
    * bin counts (the q_quantile_sketch_rollup sketch table, maintained
    * incrementally). The state per (window, bin) group is ONE count —
    * histograms are the trivially-mergeable sketch, so micro-batch
    * arrival order can't change the result and the sketch is queryable
    * mid-stream at any time. Quantile DERIVATION stays a tiny batch
    * read over the sink (≤4096 rows per window), exactly as it would
    * against the materialized sketch table on a cluster.
    */
  def windowedHistogram(events: DataFrame,
                        bins: Int = graft.operators.HistogramSketch.Bins,
                        domain: Double = graft.operators.HistogramSketch.Domain): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 day"),
        graft.operators.HistogramSketch.bin(col("value"), bins, domain).as("bin"))
      .agg(count(lit(1)).as("c"))
      .select(unix_micros(col("window.start")).as("window_us"), col("bin"), col("c"))

  /** The static event-type weight dimension — stands in for the
    * reference's slowly-changing policy/rate tables. On a cluster this
    * is a small table re-read per micro-batch (or a broadcast refreshed
    * on change); here a literal frame keeps the gate deterministic.
    */
  def typeWeights(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("click", 1.0), ("view", 0.5), ("purchase", 5.0),
        ("signup", 2.0), ("error", 0.0)).toDF("event_type", "weight")
  }

  /** Stream-static enrichment: every arriving event joins the static
    * dimension with a BROADCAST hash join — stateless (no watermark, no
    * state store; the stream side never shuffles), the streaming twin of
    * every batch dim join in the registry. Unmatched types keep weight 0
    * rather than silently dropping (left join + coalesce).
    */
  def enrichWithWeights(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("event_type"), "left")
      .withColumn("weight", coalesce(col("weight"), lit(0.0)))
      // decimal-exact product (the money-column discipline of moneySum):
      // value at 2dp × weight at 1dp is an EXACT 3dp decimal, so the
      // double both engines cast to is the same bit pattern — a double
      // multiply + round(,4) was engine-divergent at display-tie values
      .select(col("event_id"), col("event_type"), col("user_id"),
              (col("value").cast("decimal(18,2)") * col("weight").cast("decimal(3,1)"))
                .cast("double").as("weighted_value"))

  /** The at-scale sink shape: append-mode windowed aggregation to a
    * parquet directory. Unlike the complete-mode memory-sink harness
    * entry, append mode lets the watermark evict finalized windows from
    * state and emits each window exactly once — nothing accumulates on
    * the driver. (On a cluster the path would be object storage and the
    * trigger a processing-time interval.)
    */
  def windowedAggToFiles(events: DataFrame, outPath: String, checkpoint: String,
                         trigger: Trigger = Trigger.AvailableNow()) =
    windowedAgg(events)
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .start()

  /** Idempotent micro-batch upsert: replace exactly the WINDOW
    * partitions this batch touches (dynamic partition overwrite), leave
    * every other partition alone. The partition key must satisfy two
    * constraints at once: (a) be a function of the DATA (never the
    * batch id) so replays rewrite the same partitions with the same
    * bytes, and (b) be at least as fine as the append granularity — the
    * watermark finalizes each (window, type) group exactly once, but
    * DIFFERENT windows of the same day can finalize in different
    * micro-batches, so partitioning by day would let a later batch
    * clobber the day's earlier windows. Partitioning by the window
    * start itself makes each partition's contents a pure function of
    * that window's events — the exactly-once sink contract on plain
    * parquet, no transactional table format required.
    */
  def overwriteWindowPartitions(batch: DataFrame, outPath: String): Unit =
    batch.withColumn("win", date_format(col("window_start"), "yyyy-MM-dd-HH"))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("win")
      .parquet(outPath)

  /** Append-mode windowed aggregation through the idempotent
    * partition-overwrite sink — the restart-safe variant of
    * `windowedAggToFiles` (which appends, and so duplicates finalized
    * windows if the stream is ever replayed from scratch).
    */
  def windowedAggIdempotent(events: DataFrame, outPath: String, checkpoint: String,
                            trigger: Trigger = Trigger.AvailableNow()) =
    windowedAgg(events)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        overwriteWindowPartitions(batch, outPath)
      }
      .trigger(trigger)
      .start()

  private def cents(v: Double): Long =
    (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong

  private def mkOut(userId: Long, id: Long, o: OpenSession): SessionOut =
    SessionOut(userId, id, o.n_events, o.start_us, o.end_us,
               BigDecimal(o.total_cents, 2).toDouble)

  /** Fold (ts_us, event_id, value) rows — MUST already be sorted by
    * (ts_us, event_id) — into gap-delimited sessions, continuing from an
    * optional open session. Returns (closed sessions in order, open
    * session). Gap semantics match the lag/cumsum batch oracle: a new
    * session starts when ts − previous ts > gap.
    */
  private def fold(open0: Option[OpenSession], sorted: IndexedSeq[(Long, Long, Double)],
                   gapUs: Long): (Vector[OpenSession], Option[OpenSession]) = {
    var closed = Vector.empty[OpenSession]
    var open = open0
    sorted.foreach { case (ts, _, v) =>
      open match {
        case Some(o) if ts - o.end_us > gapUs =>
          closed :+= o
          open = Some(OpenSession(1L, ts, ts, cents(v)))
        case Some(o) =>
          open = Some(OpenSession(o.n_events + 1, math.min(o.start_us, ts),
                                  math.max(o.end_us, ts), o.total_cents + cents(v)))
        case None =>
          open = Some(OpenSession(1L, ts, ts, cents(v)))
      }
    }
    (closed, open)
  }

  private def sortedBatch(it: Iterator[RawEvent]): Vector[(Long, Long, Double)] =
    it.map(e => (toMicros(e.ts), e.event_id, e.value)).toVector
      .sortBy(e => (e._1, e._2))

  /** Batch session assembly: all events for a key are present, so every
    * session closes — no state needed at all (plain flatMapGroups, one
    * shuffle on user_id). Matches the window-based q_sessionize oracle.
    */
  def sessionizeBatch(events: Dataset[RawEvent], gapUs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (userId, it) =>
      val (closed, open) = fold(None, sortedBatch(it), gapUs)
      (closed ++ open).zipWithIndex.map { case (o, i) => mkOut(userId, i + 1L, o) }
        .iterator
    }
  }

  /** How long (event time) the bare id counter of an idle user survives
    * after their last session closed. Within this horizon a returning
    * user's session ids stay monotonic; after it the state is REMOVED —
    * state size is bounded by ACTIVE keys, not by all-time user
    * cardinality. A user idle longer restarts numbering at 1, so
    * consumers needing forever-unique keys compose (user_id, start_us).
    */
  val DefaultGcIdleUs: Long = 7L * 24 * 3600 * 1000000L

  /** Streaming gap-based session assembly. Input MUST carry a watermark
    * on `ts` (delay ≥ the session gap, so any event admitted by the
    * watermark can still legally extend the open session). Per key the
    * state holds only the open-session summary; a closed session is
    * emitted exactly once — either when a new event arrives beyond the
    * gap, or when the event-time timeout fires (watermark passed
    * open.end + gap). After that timeout the state keeps just the
    * next_id counter so later sessions never reuse an id, with a GC
    * timeout re-armed at end + gcIdleUs: when THAT fires the key is
    * evicted entirely (state.remove) — idle users do not accumulate
    * state forever.
    */
  def sessionize(events: Dataset[RawEvent], gapUs: Long,
                 gcIdleUs: Long = DefaultGcIdleUs): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapUs / 1000
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[RawEvent], state: GroupState[SessionState]) =>
          val st = state.getOption.getOrElse(SessionState(1L, None))
          if (state.hasTimedOut) {
            st.open match {
              case Some(o) =>
                val out = Vector(mkOut(userId, st.next_id, o))
                state.update(SessionState(st.next_id + 1, None))
                // clamp to just past the watermark: the horizon may
                // already be in the past, and Spark rejects a timeout
                // timestamp at or before the current watermark
                state.setTimeoutTimestamp(
                  math.max(o.end_us / 1000 + gcIdleUs / 1000,
                           state.getCurrentWatermarkMs() + 1))
                out.iterator
              case None =>
                // GC: only the idle id counter remained; evict the key
                state.remove()
                Iterator.empty
            }
          } else {
            val (closed, open) = fold(st.open, sortedBatch(it), gapUs)
            val out = closed.zipWithIndex
              .map { case (o, i) => mkOut(userId, st.next_id + i, o) }
            state.update(SessionState(st.next_id + closed.size, open))
            open.foreach(o => state.setTimeoutTimestamp(o.end_us / 1000 + gapMs))
            out.iterator
          }
      }
  }

  /** Watermarked stream-stream interval join: every (view, click) pair of
    * the same user where the view happened within `horizon` at-or-before
    * the click — the attribution join (Flink interval join /
    * ClickHouse-dashboard "click after view" panels). Both sides carry
    * their OWN watermark and the join predicate is a pure event-time
    * range (timestamp comparisons only — wrapping the columns in
    * unix_micros would defeat Spark's state-cleanup analysis), so each
    * side's buffered state is bounded by watermark delay + horizon per
    * side, never the full stream history.
    */
  def attributeClicks(events: DataFrame, horizon: String = "30 minutes",
                      delay: String = "2 hours"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
              col("ts").as("view_ts"))
      .withWatermark("view_ts", delay)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
              col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    views.join(clicks,
        col("v_user_id") === col("user_id") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("view_id"), col("click_id"),
              (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
                .as("lag_us"))
  }

  /** java.sql.Timestamp → epoch micros (matches unix_micros). */
  def toMicros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000
}
