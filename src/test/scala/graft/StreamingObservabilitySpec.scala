package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.sources.{HttpConfig, HttpIntake}
import graft.streaming.StreamingObservability
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming observability: the engine's own progress events surface as
  * Prometheus gauges on the live /metrics endpoint — per-query rows/s,
  * batch latency, and state-store size, scraped DURING a running
  * stream, not reconstructed after the fact.
  */
class StreamingObservabilitySpec extends SparkSpec {

  test("listener folds progress into gauges; /metrics serves them mid-stream") {
    val obs = new StreamingObservability
    spark.streams.addListener(obs)
    val src = Files.createTempDirectory("graft-obs-src").toString
    val ckpt = Files.createTempDirectory("graft-obs-ckpt").toString
    try {
      Files.write(java.nio.file.Paths.get(src, "a.txt"),
        (1 to 200).map(i => s"user${i % 7}").mkString("\n").getBytes("UTF-8"))
      // a stateful aggregation so stateOperators is non-empty: the
      // state gauges are the ones a misconfigured watermark moves first
      val q = spark.readStream.format("text").load(src)
        .groupBy(col("value")).agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName("obs_stream")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .start()
      try {
        q.processAllAvailable()
        // the listener bus is async relative to processAllAvailable —
        // poll until the first batch's progress event lands
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (obs.batchesFor("obs_stream") < 1 && System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(obs.batchesFor("obs_stream") >= 1)

        val g = obs.gauges.toMap
        assert(g(s"""parsedmarc_stream_input_rows_total{query="obs_stream"}""") == 200.0)
        assert(g(s"""parsedmarc_stream_state_rows{query="obs_stream"}""") == 7.0)
        assert(g(s"""parsedmarc_stream_state_bytes{query="obs_stream"}""") > 0.0)
        assert(g(s"""parsedmarc_stream_batch_duration_ms{query="obs_stream"}""") > 0.0)

        // scrape over HTTP while the query is still running
        val drop = Files.createTempDirectory("graft-obs-drop").toString
        val server = new HttpIntake(HttpConfig(), drop,
          summary = () => "{}", extraMetrics = () => obs.gauges)
        try {
          val resp = HttpClient.newHttpClient().send(
            HttpRequest.newBuilder(
              URI.create(s"http://127.0.0.1:${server.port}/metrics")).GET().build(),
            HttpResponse.BodyHandlers.ofString())
          assert(resp.statusCode() == 200)
          val body = resp.body()
          assert(body.contains("# TYPE parsedmarc_stream_input_rows_total gauge"))
          assert(body.contains(
            s"""parsedmarc_stream_input_rows_total{query="obs_stream"} 200.0"""))
          assert(body.contains(s"""parsedmarc_stream_state_rows{query="obs_stream"} 7.0"""))
          // one TYPE line per family even with a labeled series
          assert("# TYPE parsedmarc_stream_state_rows gauge".r
            .findAllMatchIn(body).size == 1)

          // a second file arrives: the gauges MOVE on the next scrape
          Files.write(java.nio.file.Paths.get(src, "b.txt"),
            (1 to 100).map(i => s"user${i % 11}").mkString("\n").getBytes("UTF-8"))
          q.processAllAvailable()
          val d2 = System.nanoTime() + 120L * 1000 * 1000 * 1000
          while (obs.gauges.toMap.apply(
            s"""parsedmarc_stream_input_rows_total{query="obs_stream"}""") < 300.0 &&
            System.nanoTime() < d2) Thread.sleep(50)
          val resp2 = HttpClient.newHttpClient().send(
            HttpRequest.newBuilder(
              URI.create(s"http://127.0.0.1:${server.port}/metrics")).GET().build(),
            HttpResponse.BodyHandlers.ofString())
          assert(resp2.body().contains(
            s"""parsedmarc_stream_input_rows_total{query="obs_stream"} 300.0"""))
          assert(resp2.body().contains(
            s"""parsedmarc_stream_state_rows{query="obs_stream"} 11.0"""))
        } finally server.close()
      } finally q.stop()
    } finally spark.streams.removeListener(obs)
  }

  test("a hostile query name (quote, backslash, newline) keeps /metrics parseable") {
    val obs = new StreamingObservability
    spark.streams.addListener(obs)
    val src = Files.createTempDirectory("graft-obs-hostile-src").toString
    val ckpt = Files.createTempDirectory("graft-obs-hostile-ckpt").toString
    // every character the exposition format escapes inside label values
    val hostile = "obs\"quoted\\back\nline"
    try {
      Files.write(java.nio.file.Paths.get(src, "a.txt"),
        "one\ntwo\nthree".getBytes("UTF-8"))
      val q = spark.readStream.format("text").load(src)
        .writeStream.format("noop").queryName(hostile)
        .option("checkpointLocation", ckpt)
        .start()
      try {
        q.processAllAvailable()
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (obs.batchesFor(hostile) < 1 && System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(obs.batchesFor(hostile) >= 1)

        val drop = Files.createTempDirectory("graft-obs-hostile-drop").toString
        val server = new HttpIntake(HttpConfig(), drop,
          summary = () => "{}", extraMetrics = () => obs.gauges)
        try {
          val resp = HttpClient.newHttpClient().send(
            HttpRequest.newBuilder(
              URI.create(s"http://127.0.0.1:${server.port}/metrics")).GET().build(),
            HttpResponse.BodyHandlers.ofString())
          assert(resp.statusCode() == 200)
          val body = resp.body()
          // every series line for the stream gauges must match the
          // exposition grammar — one physical line, label value with
          // only escaped specials inside the quotes
          val series = "^parsedmarc_stream_[a-zA-Z0-9_]*\\{query=\"((?:[^\"\\\\\\n]|\\\\.)*)\"\\} [-+0-9.eE]+$".r
          val lines = body.split("\n", -1).filter(l =>
            l.startsWith("parsedmarc_stream_") && l.contains(hostile.takeWhile(_ != '"')))
          assert(lines.nonEmpty, s"no series lines for the hostile stream in:\n$body")
          lines.foreach { l =>
            assert(series.findFirstMatchIn(l).isDefined, s"unparseable exposition line: $l")
          }
          assert(body.contains(
            """query="obs\"quoted\\back\nline""""), "expected escaped label value")
        } finally server.close()
      } finally q.stop()
    } finally spark.streams.removeListener(obs)
  }
}
