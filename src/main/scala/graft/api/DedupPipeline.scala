package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus deduplication: near-dup PAIRS (from MinHash/SimHash/
  * embedding similarity) → duplicate CLUSTERS → deduped corpus keeping
  * one representative per cluster.
  *
  * Clustering is min-label propagation over the pair graph — each
  * iteration is two hash-join/groupBy passes (no driver-side graph), and
  * iterations are bounded by the graph diameter, which for near-dup
  * clusters is tiny (dup groups are near-cliques). This is the standard
  * scalable connected-components shape for 100 TB dedup jobs.
  */
object DedupPipeline {

  /** pairs(doc_a, doc_b) → (doc_id, cluster_id) where cluster_id is the
    * smallest doc_id reachable through the pair graph. Docs not in any
    * pair are omitted (they are their own cluster).
    *
    * r16 small-graph fast path: the pair list every caller hands in is
    * an already-materialized near-dup pair frame that is tiny relative
    * to its corpus (pairs are the dedup family's REDUCTION; the house
    * pipelines checkpoint it before clustering). Under the 4M-edge
    * bound — the same explicit bounded-collect discipline as the
    * k-means centroid pull and the quality-model weight pull, ~64 MB
    * of longs against the 8 GiB driver — an exact driver union-find
    * computes the components in one collect instead of ~3 propagation
    * iterations × (join + aggregate + checkpoint + convergence scan)
    * distributed jobs. The result is the EXACT transitive closure
    * (identical to the recursive-CTE oracle; the iterative path is
    * equivalent only once converged). Past the bound, the distributed
    * min-label propagation below is the 100 TB path, unchanged.
    */
  def clusters(pairs: DataFrame, maxIters: Int = 10): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edgePairs = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)]
    // the count is a scan of the caller's materialized pair list — a
    // bounded-decision action, not a recompute
    if (edgePairs.count() <= 4L * 1000 * 1000) {
      val es = edgePairs.collect()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
        var c = x
        while (parent.getOrDefault(c, c) != c) {
          val n = parent.getOrDefault(c, c); parent.put(c, r); c = n
        }
        r
      }
      es.foreach { case (a, b) =>
        parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
        val (ra, rb) = (find(a), find(b))
        // union by MIN root so the representative is the smallest id
        if (ra != rb) { if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb) }
      }
      val out = parent.keySet().iterator()
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      while (out.hasNext) { val k = out.next(); rows += ((k, find(k))) }
      return rows.toSeq.toDF("doc_id", "cluster_id")
    }
    clustersDistributed(pairs, maxIters)
  }

  /** The distributed min-label propagation — the past-the-bound path. */
  private def clustersDistributed(pairs: DataFrame, maxIters: Int): DataFrame = {
    val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .distinct()
      .cache()
    // labels start as each node's smallest neighbor (or itself)
    var labels = edges.groupBy(col("a").as("doc_id"))
      .agg(least(min(col("b")), first(col("a"))).as("label"))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // propagate: my new label = min(my label, labels of my neighbors).
      // The convergence flag rides the SAME pass as a per-row `changed`
      // column (labels only ever decrease, so changed ⇔ new < old):
      // the old shape re-joined next against labels afterwards — one
      // extra join + job per iteration for a fact the propagation
      // already knows row-by-row. The flag column is dropped before
      // return, so the result frame is unchanged.
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("doc_id", "b"), "b")
        .groupBy(col("a").as("doc_id"))
        .agg(min(col("label")).as("n_label"))
      val next = labels.join(viaNeighbors, Seq("doc_id"), "left")
        .select(col("doc_id"),
                least(col("label"), coalesce(col("n_label"), col("label"))).as("label"),
                (coalesce(col("n_label"), col("label")) < col("label")).as("changed"))
        .localCheckpoint()
      // scan of the just-materialized checkpoint — no join, no recompute
      converged = next.filter(col("changed")).isEmpty
      labels = next.drop("changed")
      i += 1
    }
    labels.select(col("doc_id"), col("label").as("cluster_id"))
  }

  /** corpus + near-dup pairs → corpus with one representative (smallest
    * id) per duplicate cluster.
    */
  def dedup(corpus: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val cl = clusters(pairs)
    val losers = cl.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol))
    corpus.join(losers, Seq(idCol), "left_anti")
  }

  /** Quality-aware variant — the SemDeDup/FineWeb keep-best policy
    * (d_keep_best's keeper rule as a DEDUP step): from each near-dup
    * cluster keep the highest-`quality` member, doc_id breaking ties,
    * instead of the smallest id. `quality` is a (doc_id, quality)
    * frame (e.g. TextAnalysis.qualityCol over the same corpus). The
    * keeper window partitions by cluster — bounded groups, never a
    * corpus sort — so this composes over the xxhash64 production LSH
    * path (Dedup.minhashLsh64) at full speed; pair-set and keeper
    * parity with the md5 oracle path is pinned by DedupKeepBest64Spec.
    */
  def dedupKeepBest(corpus: DataFrame, pairs: DataFrame, quality: DataFrame,
                    idCol: String = "doc_id"): DataFrame =
    dedupKeepBestOn(corpus, clusters(pairs), quality, idCol)

  /** [[dedupKeepBest]] with the cluster frame precomputed — the entry
    * point for callers that reuse `cl` (e.g. to member-restrict the
    * quality scan, [[dedupKeepBestBy]]).
    */
  def dedupKeepBestOn(corpus: DataFrame, cl: DataFrame, quality: DataFrame,
                      idCol: String = "doc_id"): DataFrame = {
    // LEFT join + nulls-LAST ordering: a clustered doc missing a quality
    // row must still enter the per-cluster ranking (as the worst member,
    // never silently exempt from dedup) — an inner join would drop it
    // from the window and it could never lose to its duplicates
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("quality").desc_nulls_last, col(idCol))
    val losers = cl
      .withColumnRenamed("doc_id", idCol)
      .join(quality, Seq(idCol), "left")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") > 1)
      .select(col(idCol))
    corpus.join(losers, Seq(idCol), "left_anti")
  }

  /** Quality-aware dedup where the quality score is an EXPRESSION over
    * `source` rather than a precomputed frame: only near-dup cluster
    * MEMBERS ever enter the per-cluster ranking, so when the member-id
    * set fits the measured broadcast bound the expensive per-doc score
    * is computed for members only (a broadcast semi join BELOW the
    * score projection — handing a pre-projected frame to
    * [[dedupKeepBest]] cannot do this, because no optimizer rule defers
    * a projection through a later join). Past the bound it falls back
    * to the corpus-wide scan, which stays map-side. At 100 TB the
    * member slice is typically ~10% of the corpus, so this is ~10× less
    * quality compute on the dedup path.
    */
  def dedupKeepBestBy(corpus: DataFrame, pairs: DataFrame, source: DataFrame,
                      qualityExpr: org.apache.spark.sql.Column,
                      idCol: String = "doc_id"): DataFrame = {
    val cl = clusters(pairs)
    // cl is localCheckpointed by construction — the count is a bounded
    // broadcast decision (16M rows ≈ the 8 GiB-driver-safe hashed
    // relation, the Dedup.contaminatedPositions house bound), not a
    // recompute
    val restricted =
      if (cl.count() <= 16L * 1000 * 1000)
        source.join(broadcast(cl.select(col("doc_id").as(idCol))),
          Seq(idCol), "left_semi")
      else source
    dedupKeepBestOn(corpus, cl,
      restricted.select(col(idCol), qualityExpr.as("quality")), idCol)
  }
}
