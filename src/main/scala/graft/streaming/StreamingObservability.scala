package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, DoubleAdder}

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Live observability for the Structured Streaming intakes — the
  * streaming half of the reference's Prometheus surface
  * (internal/metrics/metrics.go exports processed/failed counters for
  * the batch daemon; a Spark deployment additionally needs per-QUERY
  * progress: rows/s in and out, batch latency, and state-store size,
  * which is where a misconfigured watermark shows first).
  *
  * A [[StreamingQueryListener]] is the engine's own push channel for
  * exactly this — every micro-batch delivers a progress event with the
  * engine-measured numbers, so nothing here samples or re-computes.
  * The listener folds each event into a gauge map that
  * [[graft.sources.HttpIntake]]'s `extraMetrics` hook scrapes on
  * /metrics, giving streams the same text exposition the batch
  * counters already use.
  *
  * Names follow the reference's `parsedmarc_` prefix with a `query`
  * label per stream:
  *  - parsedmarc_stream_batches_total        (counter: micro-batches run)
  *  - parsedmarc_stream_input_rows_total     (counter: rows ingested)
  *  - parsedmarc_stream_input_rows_per_second     (gauge: last batch)
  *  - parsedmarc_stream_processed_rows_per_second (gauge: last batch)
  *  - parsedmarc_stream_batch_duration_ms    (gauge: last triggerExecution)
  *  - parsedmarc_stream_state_rows           (gauge: Σ state operators)
  *  - parsedmarc_stream_state_bytes          (gauge: Σ state memory)
  *
  * Driver-side only and O(#queries) memory — the listener bus runs on
  * the driver, so at 1000 executors this costs nothing on the data
  * path.
  */
final class StreamingObservability extends StreamingQueryListener {

  private final class QueryStats {
    val batches = new AtomicLong()
    val inputRows = new DoubleAdder()
    @volatile var inputRowsPerSecond = 0.0
    @volatile var processedRowsPerSecond = 0.0
    @volatile var batchDurationMs = 0.0
    @volatile var stateRows = 0.0
    @volatile var stateBytes = 0.0
  }

  private val stats = new ConcurrentHashMap[String, QueryStats]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = {
    stats.computeIfAbsent(Option(e.name).getOrElse(e.id.toString), _ => new QueryStats)
    ()
  }

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val key = Option(p.name).getOrElse(p.id.toString)
    val s = stats.computeIfAbsent(key, _ => new QueryStats)
    s.batches.incrementAndGet()
    s.inputRows.add(p.numInputRows.toDouble)
    // rates are NaN on an empty/first batch — export 0, not NaN, so the
    // exposition stays parseable
    def num(d: Double): Double = if (d.isNaN || d.isInfinite) 0.0 else d
    s.inputRowsPerSecond = num(p.inputRowsPerSecond)
    s.processedRowsPerSecond = num(p.processedRowsPerSecond)
    s.batchDurationMs =
      Option(p.durationMs.get("triggerExecution")).map(_.doubleValue).getOrElse(0.0)
    val ops = p.stateOperators
    s.stateRows = ops.map(_.numRowsTotal.toDouble).sum
    s.stateBytes = ops.map(_.memoryUsedBytes.toDouble).sum
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  /** Gauge snapshot in HttpIntake `extraMetrics` shape: labeled metric
    * name → value. Sorted for a stable exposition order.
    */
  /** Prometheus exposition-format label escaping: inside a label value,
    * backslash, double-quote, and newline must be written as \\, \",
    * and \n — a stream named with any of them would otherwise corrupt
    * the whole /metrics page for every scraper.
    */
  private def escapeLabel(v: String): String =
    v.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case '\n' => "\\n"
      case c    => c.toString
    }

  def gauges: Seq[(String, Double)] = {
    val out = Seq.newBuilder[(String, Double)]
    stats.forEach { (name, s) =>
      def g(metric: String, v: Double): Unit =
        out += (s"""parsedmarc_stream_$metric{query="${escapeLabel(name)}"}""" -> v)
      g("batches_total", s.batches.get().toDouble)
      g("input_rows_total", s.inputRows.sum())
      g("input_rows_per_second", s.inputRowsPerSecond)
      g("processed_rows_per_second", s.processedRowsPerSecond)
      g("batch_duration_ms", s.batchDurationMs)
      g("state_rows", s.stateRows)
      g("state_bytes", s.stateBytes)
      ()
    }
    out.result().sortBy(_._1)
  }

  /** Total micro-batches seen for `query` (spec polling hook). */
  def batchesFor(query: String): Long =
    Option(stats.get(query)).map(_.batches.get()).getOrElse(0L)
}
