package graft

import org.apache.spark.sql.functions._

/** Stage-by-stage decomposition of d_keep_best at a given scale dir —
  * the round-11 verdict's ask: its 1000× cell needs
  * SPARK_DRIVER_MEM=48g on the single local[32] JVM, and the footnote
  * must state the MEASURED holder of that memory (signature persist
  * vs cluster fixpoint), not class resemblance to the other LSH
  * stretch cells.
  *
  * Each stage is timed in isolation, and after each stage's action the
  * BlockManager's live RDD storage (memory + disk bytes) is read — in
  * local mode executor storage lives inside the one driver heap, so
  * these numbers ARE the heap pressure the 48g requirement covers.
  *
  *   1. `shingles`  — the persisted (doc_id, sh) shingle frame
  *                    (minhashLsh's first persist: raw 3-word shingle
  *                    arrays, the corpus-volume-sized intermediate).
  *   2. `bands`     — the persisted banded md5 signature table
  *                    (8 × (doc_id, tinyint, 32-char hex) per doc).
  *   3. `pairs`     — the full minhashLsh pipeline (candidates +
  *                    Jaccard verify + localCheckpoint of the pair
  *                    list; releases 1 and 2 on completion).
  *   4. `clusters`  — min-label propagation over the pair graph
  *                    (edges cache + per-iteration localCheckpoints).
  *   5. `keepbest`  — the registry entry verbatim (adds the quality
  *                    join + per-cluster argmax window).
  *
  * Round 16 added the TAIL decomposition (`tail` arg skips stages 1–5):
  * the r16 forced-window re-measurement showed the honest 1000× cell at
  * 1372–1782 s where the count() window had read 328.6 s, and the r12
  * profile's own `keepbest` stage was count-collapsed too (the audit's
  * `Window:1` loss: count pruned the keeper aggregates, so the Window,
  * the quality scan, and the text read never executed). Construction
  * (pair gen + cluster fixpoint) is EAGER (Materialize/localCheckpoint),
  * so the count-vs-forced delta lives entirely in the tail; these stages
  * time the tail variants on ONE constructed frame to attribute it:
  *
  *   6. `tail_count`  — entry tail under the old count() window.
  *   7. `tail_forced` — entry tail under the honest forced window.
  *   8. `quality`     — the qualityCol scan alone, forced.
  *   9. `tail_cheapq` — tail with quality := a trivial column, forced
  *                      (splits the delta into quality-scan vs
  *                      window/join/hash machinery).
  *
  * Usage: SPARK_DRIVER_MEM=48g sbt "runMain graft.KeepBestProfile /tmp/graft_scale/x1000 [tail]"
  */
object KeepBestProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x1000")
    val spark = GraftSession.build("keepbest-profile")
    val sc = spark.sparkContext
    val docs = Tables(spark, dir).documents

    def storage(): (Long, Long) = {
      val infos = sc.getRDDStorageInfo
      (infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
    }
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val (mem, disk) = storage()
      println(f"GRAFT_KEEPBEST_PROFILE $label%-9s ${(System.nanoTime() - t0) / 1e9}%8.1f s" +
        f"  rows=$rows%-12d cachedMem=${mem / 1e9}%6.2f GB cachedDisk=${disk / 1e9}%6.2f GB")
    }

    import graft.operators.Dedup
    val tailOnly = args.lift(1).contains("tail")
    // `lsh` mode: stages 1–2 only (shingle persist + banded md5
    // signatures) — splits a pair-generation slowdown into
    // scan/shingle/md5 cost vs candidate-join/verify cost without
    // paying for the full profile
    if (args.lift(1).contains("lsh")) {
      val sh = Dedup.shingles(docs).persist()
      time("shingles") { sh.count() }
      val bands = Dedup.bandedSignatures(sh)
      time("bands") { bands.count() }
      val bands64 = Dedup.bandedSignatures64(sh)
      time("bands64") { bands64.count() }
      spark.stop(); return
    }
    if (!tailOnly) {
      // stages 1+2 measure the persisted intermediates minhashLsh holds
      // SIMULTANEOUSLY while verifying candidates — built once here, kept
      // alive across both measurements exactly as the pipeline holds them
      val sh = Dedup.shingles(docs).persist()
      time("shingles") { sh.count() }
      val bands = Dedup.bandedSignatures(sh)
      time("bands") { bands.count() }
      bands.unpersist(false)
      sh.unpersist(false)
      spark.catalog.clearCache()
      // stage 3: the full pair pipeline (its own persists, released by
      // its Materialize on completion)
      var pairs: org.apache.spark.sql.DataFrame = null
      time("pairs") { pairs = Dedup.minhashLsh(docs); pairs.count() }
      time("clusters") { graft.api.DedupPipeline.clusters(pairs).count() }
      time("keepbest") { SparkEntry.queries("d_keep_best")(spark, dir).count() }
      spark.catalog.clearCache()
    }
    // tail decomposition: construction (pair gen + fixpoint) is eager
    // and checkpointed, so everything after `construct` times ONLY the
    // quality join + window + keeper aggregate + orderBy + window frame
    var cl: org.apache.spark.sql.DataFrame = null
    time("construct") {
      cl = graft.api.DedupPipeline.clusters(Dedup.minhashLsh(docs)); cl.count()
    }
    val quality = docs.select(col("doc_id"),
      graft.operators.TextAnalysis.qualityCol.as("quality"))
    def tail(q: org.apache.spark.sql.DataFrame) =
      Dedup.keepBest(cl, q).orderBy("cluster_id")
    time("tail_count") { tail(quality).count() }
    time("tail_forced") { ScaleDemo.forcedFrame(tail(quality)).head(); 1L }
    time("quality") { ScaleDemo.forcedFrame(quality).head(); 1L }
    val cheapq = docs.select(col("doc_id"),
      (col("doc_id") % 1000).cast("double").as("quality"))
    time("tail_cheapq") { ScaleDemo.forcedFrame(tail(cheapq)).head(); 1L }
    spark.stop()
  }
}
