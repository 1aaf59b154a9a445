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
  * Usage: SPARK_DRIVER_MEM=48g sbt "runMain graft.KeepBestProfile /tmp/graft_scale/x1000"
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
    spark.stop()
  }
}
