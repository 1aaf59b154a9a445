package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stage-by-stage decomposition of the d_winnow_dedup wall time at a
  * given scale dir (SCALE.md's one superlinear cell: 27.2 s @10× →
  * 412 s @100× while pair output stays linear). Candidate culprits,
  * each timed in isolation:
  *
  *   1. `fp`        — the doc-local winnowing selection (mapPartitions,
  *                    ~n md5 digests per doc). Linear by construction.
  *   2. `cap`       — capBuckets' count-aggregate + broadcast anti-join.
  *   3. `pairs`     — the raw-gram self-join + per-pair count aggregate,
  *                    WITHOUT the gate orderBy. NOTE: the registry
  *                    lambda references the capped relation twice (both
  *                    join sides), and capBuckets references ITS input
  *                    twice (aggregate + anti-join) — unpersisted, the
  *                    selection subtree can evaluate up to 4×.
  *   4. `pairs_p`   — same, with the selection persisted once
  *                    (MEMORY_AND_DISK) before fan-out.
  *   5. `full`      — the registry entry verbatim (orderBy included).
  *   6. `full_p`    — persisted variant + orderBy.
  *
  * Usage: SPARK_DRIVER_MEM=16g sbt "runMain graft.WinnowProfile /tmp/graft_scale/x100"
  */
object WinnowProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x100")
    val spark = GraftSession.build("winnow-profile")
    val docs = Tables(spark, dir).documents

    def time(label: String)(f: => Long): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val rows = f
      println(f"GRAFT_WINNOW_PROFILE $label%-10s ${(System.nanoTime() - t0) / 1e9}%8.1f s  rows=$rows")
    }

    import graft.operators.Dedup
    time("fp") { Dedup.winnowFingerprints(docs).count() }
    time("cap") {
      Dedup.capBuckets(Dedup.winnowFingerprints(docs), Seq("gram"), Dedup.MaxBucket).count()
    }
    def joinAgg(capped: org.apache.spark.sql.DataFrame) =
      capped.select(col("gram"), col("doc_id").as("doc_a"))
        .join(capped.select(col("gram"), col("doc_id").as("doc_b")), "gram")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
    time("pairs") {
      joinAgg(Dedup.capBuckets(Dedup.winnowFingerprints(docs), Seq("gram"), Dedup.MaxBucket)).count()
    }
    time("pairs_p") {
      val fp = Dedup.winnowFingerprints(docs).persist(StorageLevel.MEMORY_AND_DISK)
      try joinAgg(Dedup.capBuckets(fp, Seq("gram"), Dedup.MaxBucket)).count()
      finally { fp.unpersist(); () }
    }
    time("full") {
      SparkEntry.queries("d_winnow_dedup")(spark, dir).count()
    }
    time("full_p") {
      val fp = Dedup.winnowFingerprints(docs).persist(StorageLevel.MEMORY_AND_DISK)
      try joinAgg(Dedup.capBuckets(fp, Seq("gram"), Dedup.MaxBucket))
        .orderBy("doc_a", "doc_b").count()
      finally { fp.unpersist(); () }
    }
    // does the unpersisted plan reuse the selection exchange, or
    // evaluate the mapPartitions subtree once per reference?
    val plan = joinAgg(Dedup.capBuckets(Dedup.winnowFingerprints(docs),
      Seq("gram"), Dedup.MaxBucket)).queryExecution.executedPlan.toString
    val scans = "MapPartitions".r.findAllIn(plan).length
    val reused = "ReusedExchange".r.findAllIn(plan).length
    println(s"GRAFT_WINNOW_PROFILE plan MapPartitions=$scans ReusedExchange=$reused")
    spark.stop()
  }
}
