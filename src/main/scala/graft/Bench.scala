package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: headline queries (SURVEY §6) at the driver-selected
  * scale factor, one JSON line to stdout.
  */
object Bench {

  /** Representative slice: wide-scan agg, join+topN, star join, time
    * bucketing, join+rate table, window sessionization, LSH dedup,
    * vector top-k, plus the two newest scale mechanisms — the
    * band-join optimizer rewrite and the salted replicated join — so a
    * regression in either shows up as seconds, not only in plan specs.
    */
  val Headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q_daily_volume", "q_org_compliance", "q_sessionize",
    "d_minhash_lsh", "d_minhash_lsh_fast", "s_cosine_topk",
    "q_band_join_auto", "q_skew_join_salted",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")
    val queries = SparkEntry.queries
    // JVM+Spark warmup on the smallest SF so steady-state throughput is
    // measured, not first-call codegen/classloading. Guarded per query:
    // one broken query must degrade that query's samples to the -1
    // sentinel below, not zero the whole bench artifact.
    Headline.foreach { n =>
      try queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // Median of 3 timed passes per query, passes INTERLEAVED round-robin
    // (pass 1 of every query, then pass 2, ...): back-to-back passes let
    // one sustained co-tenant load burst poison every sample of a single
    // query and survive the median (observed: one LSH variant recording
    // a phantom 5× while its neighbors measured clean). Interleaving
    // spreads each query's samples across the whole bench window, so a
    // burst degrades at most one sample per query.
    val Passes = 3
    val samples = Array.fill(Headline.size, Passes)(0.0)
    for (p <- 0 until Passes; (name, qi) <- Headline.zipWithIndex) {
      val t0 = System.nanoTime()
      // a failed query must NOT record its (tiny) elapsed-to-failure
      // time as a plausible sample — report the -1 sentinel instead
      samples(qi)(p) =
        try { queries(name)(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
    }
    val results = Headline.zipWithIndex.map { case (name, qi) =>
      val times = samples(qi).toSeq.sorted
      name -> (if (times.head < 0) -1.0 else times(Passes / 2))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Machine-load context: recorded r02/r03 totals swung 2-4× purely
    // with co-tenant load average, so the artifact carries the load at
    // measurement time to make a loaded run self-diagnosing.
    val loadAvg =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split("\\s+").take(3).mkString(",")
      catch { case _: Throwable => "" }
    val nCpu = Runtime.getRuntime.availableProcessors()
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","loadavg":"$loadAvg","cpus":$nCpu}"""
    spark.stop()
    // Driver-parseable channels, most robust first: a file in the repo
    // root, then bare stdout lines (raw via run/outputStrategy, printed
    // after spark.stop() so no executor log noise follows).
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_result.json"),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    println(s"GRAFT_BENCH_JSON $line")
  }
}
