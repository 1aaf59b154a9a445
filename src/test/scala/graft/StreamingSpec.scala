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

  test("readEventStream emits rows identical to Tables.events (any ts contract)") {
    // the round-4 silent-corruption class: a hand-written stream schema
    // can coerce the parquet physical type and skew every event time.
    // Deriving the schema from the file makes this identity structural;
    // this asserts it stays that way.
    val out = java.nio.file.Files.createTempDirectory("graft_raw_parity")
    val q = EventsStreaming.readEventStream(spark, sfDir)
      .writeStream.format("memory").queryName("raw_parity")
      .option("checkpointLocation", s"$out/cp")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val key = Seq("event_id", "ts", "user_id", "event_type", "value")
    val stream = spark.table("raw_parity").select(key.map(col): _*)
      .collect().map(_.toString).sorted.toSeq
    val batch = Tables(spark, sfDir).events.select(key.map(col): _*)
      .collect().map(_.toString).sorted.toSeq
    assert(stream.nonEmpty)
    assert(stream === batch)
  }

  test("st_static_enrich matches the batch broadcast-dim join row for row") {
    val stream = q("st_static_enrich")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    val batch = EventsStreaming.enrichWithWeights(
        Tables(spark, sfDir).events, EventsStreaming.typeWeights(spark))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    assert(stream.nonEmpty)
    assert(stream === batch)
  }

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

  test("windowedMoments merges power sums exactly across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val query = EventsStreaming.windowedMoments(df)
      .writeStream.format("memory").queryName("mom_test")
      .outputMode("complete").start()

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // click samples 1,2,3,4 split across batches: mean 2.5, var_samp 5/3
    mem.addData((1L, t("2024-01-01 10:00:00"), "click", 1.0),
                (2L, t("2024-01-01 11:00:00"), "click", 2.0))
    query.processAllAvailable()
    mem.addData((3L, t("2024-01-01 12:00:00"), "click", 3.0),
                (4L, t("2024-01-01 13:00:00"), "click", 4.0),
                (5L, t("2024-01-01 14:00:00"), "view", 9.0))
    query.processAllAvailable()

    val rows = spark.table("mom_test")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3),
                           if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSet
    query.stop()
    assert(rows == Set(
      // unrounded moments (rounding a derived double is engine-divergent
      // at display-tie boundaries): var = (sx2 - sx²/n)/(n-1) bit-exact
      ("click", 4L, 2.5, Some((30.0 - 10.0 * 10.0 / 4.0) / 3.0)),
      // a single sample has no sample variance — null, not 0 or NaN
      ("view", 1L, 9.0, None)))
  }

  test("windowedHistogram merges bin counts exactly across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val query = EventsStreaming.windowedHistogram(df)
      .writeStream.format("memory").queryName("hist_test")
      .outputMode("complete").start()

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // values 0.1 and 0.3 share bin 0 ([0, 0.25) would be bin 0 for 0.1;
    // 0.3 lands in bin 1); 600.0 lands in bin floor(600/1024*4096)=2400
    mem.addData((1L, t("2024-01-01 10:00:00"), "click", 0.1))
    query.processAllAvailable()
    mem.addData((2L, t("2024-01-01 11:00:00"), "click", 0.3),
                (3L, t("2024-01-01 12:00:00"), "view", 600.0),
                (4L, t("2024-01-01 13:00:00"), "view", 0.1))
    query.processAllAvailable()

    val rows = spark.table("hist_test")
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    query.stop()
    // bin 0 merged across the two micro-batches: 0.1 (batch 1) + 0.1
    // (batch 2) = 2; the later value did not reset the earlier count
    assert(rows == Set((0, 2L), (1, 1L), (2400, 1L)))
  }

  test("streaming heavy hitters keeps the frequency floor across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val k = 4
    val query = graft.streaming.CorpusStreaming.heavyHitters(docs, k)
      .writeStream.format("memory").queryName("hh_test")
      .outputMode("complete").start()

    // "alpha" is heavy across BOTH batches but never dominant within
    // one — only correct cross-batch summary merging keeps it
    mem.addData((1L, "alpha beta gamma delta epsilon"),
                (2L, "alpha zeta eta theta iota"))
    query.processAllAvailable()
    mem.addData((3L, "alpha kappa lambda mu nu"),
                (4L, "alpha alpha xi omicron pi rho"))
    query.processAllAvailable()

    val reported = spark.table("hh_test")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    query.stop()
    val n = 21 // total tokens streamed
    val exact = Map("alpha" -> 5L)
    // floor guarantee: alpha (5 > 21/5) must be present; no overcount
    assert(reported.contains("alpha"), reported.toString)
    assert(reported("alpha") <= exact("alpha"))
    assert(reported.size <= k)
    assert(n / (k + 1) < 5)
  }

  test("streaming sessionize emits each session exactly once across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val gapUs = 10L * 60 * 1000000 // 10 minutes
    val mem = MemoryStream[RawEvent]
    val withWm = mem.toDS().withWatermark("ts", "10 minutes")
    val name = s"sess_test_${System.nanoTime()}"
    val query = EventsStreaming.sessionize(withWm, gapUs)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()

    // batch 1: user1 opens a 2-event session, user2 opens a 1-event session
    mem.addData(RawEvent(1L, t("2024-01-01 10:00:00"), 1L, "click", 1.0),
                RawEvent(2L, t("2024-01-01 10:05:00"), 1L, "click", 2.0),
                RawEvent(3L, t("2024-01-01 10:00:00"), 2L, "view", 5.0))
    query.processAllAvailable()
    // batch 2: user1's 11:00 event is past the gap → closes session 1;
    // watermark advances to 10:50
    mem.addData(RawEvent(4L, t("2024-01-01 11:00:00"), 1L, "click", 3.0))
    query.processAllAvailable()
    // batch 3: closes user1 session 2; user2's open session times out
    // (watermark 10:50 > 10:00 + gap)
    mem.addData(RawEvent(5L, t("2024-01-01 12:00:00"), 1L, "click", 4.0))
    query.processAllAvailable()
    // batch 4: advance watermark past 12:10 so user1's session 3 times out
    mem.addData(RawEvent(6L, t("2024-01-01 14:00:00"), 2L, "view", 6.0))
    query.processAllAvailable()

    val rows = spark.table(name)
      .select("user_id", "session_id", "n_events", "start_us", "end_us", "total_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    query.stop()
    def us(s: String) = EventsStreaming.toMicros(t(s))
    // every closed session appears exactly once, ids monotonic per user,
    // no re-emission or re-numbering across micro-batches
    assert(rows.size == rows.distinct.size)
    assert(rows.toSet == Set(
      (1L, 1L, 2L, us("2024-01-01 10:00:00"), us("2024-01-01 10:05:00"), 3.0),
      (1L, 2L, 1L, us("2024-01-01 11:00:00"), us("2024-01-01 11:00:00"), 3.0),
      (1L, 3L, 1L, us("2024-01-01 12:00:00"), us("2024-01-01 12:00:00"), 4.0),
      (2L, 1L, 1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:00:00"), 5.0)))
  }

  test("idle session state is evicted after the GC horizon (ids restart after eviction)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val gapUs = 10L * 60 * 1000000    // 10 min session gap
    val gcUs = 30L * 60 * 1000000     // 30 min idle-counter retention
    val mem = MemoryStream[RawEvent]
    val withWm = mem.toDS().withWatermark("ts", "10 minutes")
    val name = s"sess_gc_${System.nanoTime()}"
    val query = EventsStreaming.sessionize(withWm, gapUs, gcUs)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()

    // user2 opens a session; user1 exists only to drive the watermark
    mem.addData(RawEvent(1L, t("2024-01-01 10:00:00"), 2L, "view", 5.0),
                RawEvent(2L, t("2024-01-01 10:00:00"), 1L, "click", 1.0))
    query.processAllAvailable()
    // watermark → 10:50 > 10:10: user2's session times out and emits
    // (id 1); the bare counter re-arms its GC timeout for 10:30 (already
    // past → clamped just beyond the watermark)
    mem.addData(RawEvent(3L, t("2024-01-01 11:00:00"), 1L, "click", 1.0))
    query.processAllAvailable()
    // watermark → 11:50: the clamped GC timeout fires → user2 evicted
    mem.addData(RawEvent(4L, t("2024-01-01 12:00:00"), 1L, "click", 1.0))
    query.processAllAvailable()
    // user2 returns AFTER eviction: fresh state
    mem.addData(RawEvent(5L, t("2024-01-01 12:30:00"), 2L, "view", 7.0))
    query.processAllAvailable()
    // watermark → 13:50 > 12:40: the new session times out and emits —
    // with session_id 1 again, the observable proof the key was evicted
    mem.addData(RawEvent(6L, t("2024-01-01 14:00:00"), 1L, "click", 1.0))
    query.processAllAvailable()
    // flush user1's trailing sessions too, then read
    mem.addData(RawEvent(7L, t("2024-01-01 18:00:00"), 1L, "click", 1.0))
    query.processAllAvailable()

    val u2 = spark.table(name).filter(col("user_id") === 2L)
      .select("session_id", "n_events", "total_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    query.stop()
    assert(u2.sorted == Seq((1L, 1L, 5.0), (1L, 1L, 7.0)),
           s"expected id restart after GC eviction, got $u2")
  }

  test("windowedAggToFiles appends finalized windows exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val tmp = java.nio.file.Files.createTempDirectory("win_files").toString
    val query = EventsStreaming.windowedAggToFiles(
      df, s"$tmp/out", s"$tmp/ckpt",
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    mem.addData((1L, t("2024-01-01 10:05:00"), "click", 1.0),
                (2L, t("2024-01-01 10:55:00"), "click", 2.0))
    query.processAllAvailable()
    // advance the watermark past the [10:00, 11:00) window end + 2h delay
    mem.addData((3L, t("2024-01-01 13:30:00"), "view", 5.0))
    query.processAllAvailable()
    // one more batch so the finalized window flushes to the sink
    mem.addData((4L, t("2024-01-01 13:45:00"), "view", 7.0))
    query.processAllAvailable()
    query.stop()
    val out = spark.read.parquet(s"$tmp/out")
      .select(col("window_start").cast("string"), col("event_type"),
              col("n_events"), col("total_value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out.size == out.distinct.size)
    assert(out.contains(("2024-01-01 10:00:00", "click", 2L, 3.0)))
  }

  test("idempotent sink: full replay with a fresh checkpoint leaves the table identical") {
    // worst case after checkpoint loss: the WHOLE stream reprocesses.
    // With the append sink that doubles every row; with dynamic
    // partition overwrite each day partition is rewritten in place.
    val tmp = java.nio.file.Files.createTempDirectory("win_idem").toString
    def runOnce(ckpt: String): Unit = {
      val q = EventsStreaming.windowedAggIdempotent(
        EventsStreaming.readEventStream(spark, sfDir), s"$tmp/out", s"$tmp/$ckpt")
      q.awaitTermination(300000)
      q.stop()
    }
    runOnce("ckpt1")
    val first = spark.read.parquet(s"$tmp/out")
      .collect().map(_.toString).sorted.toSeq
    runOnce("ckpt2") // fresh checkpoint = full replay
    val second = spark.read.parquet(s"$tmp/out")
      .collect().map(_.toString).sorted.toSeq
    assert(first.nonEmpty)
    assert(second === first)
  }

  test("overwriteWindowPartitions replaces touched windows and keeps the rest") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("win_parts").toString
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    def frame(rows: (java.sql.Timestamp, String, Long, Double)*) =
      rows.toDF("window_start", "event_type", "n_events", "total_value")
    // batch 1 finalizes two windows — one per day
    EventsStreaming.overwriteWindowPartitions(
      frame((t("2024-01-01 10:00:00"), "click", 2L, 3.0),
            (t("2024-01-02 09:00:00"), "view", 1L, 5.0)), tmp)
    // batch 2 finalizes a LATER window of day 1 (the cross-batch case
    // that day-level partitioning would clobber) and replays the 10:00
    // window with corrected numbers
    EventsStreaming.overwriteWindowPartitions(
      frame((t("2024-01-01 11:00:00"), "click", 7L, 1.0),
            (t("2024-01-01 10:00:00"), "click", 4L, 6.0)), tmp)
    val out = spark.read.parquet(tmp)
      .select(col("win"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(out === Seq(("2024-01-01-10", 4L), ("2024-01-01-11", 7L),
                       ("2024-01-02-09", 1L)))
  }

  test("st_windowed_agg end-to-end totals match batch daily totals") {
    val streamTotal = q("st_windowed_agg")(spark, sfDir)
      .agg(sum("n_events")).collect().head.getLong(0)
    val batchTotal = Tables(spark, sfDir).events.count()
    assert(streamTotal == batchTotal)
  }
}
