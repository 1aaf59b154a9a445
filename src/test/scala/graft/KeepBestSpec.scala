package graft

import org.apache.spark.sql.Row

/** Quality-aware cluster keeper (d_keep_best): the SemDeDup/FineWeb
  * keep-best policy pinned on crafted clusters — the keeper is the
  * quality argmax, NOT the min id; ties fall to doc_id; and the gate
  * corpus keeper always dominates its cluster on (quality, -doc_id).
  */
class KeepBestSpec extends SparkSpec {

  private def run(cl: Seq[(Long, Long)], q: Seq[(Long, Double)]): Map[Long, Row] = {
    val s = spark
    import s.implicits._
    graft.operators.Dedup.keepBest(
      cl.toDF("doc_id", "cluster_id"), q.toDF("doc_id", "quality"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("the keeper is the quality argmax, not the smallest id") {
    val out = run(
      cl = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L),
      q = Seq(1L -> 0.2, 2L -> 0.9, 3L -> 0.5))
    val r = out(1L)
    assert(r.getLong(r.fieldIndex("keeper")) == 2L)
    assert(r.getDouble(r.fieldIndex("keeper_quality")) == 0.9)
    assert(r.getLong(r.fieldIndex("n_docs")) == 3L)
  }

  test("quality ties break to the smaller doc_id") {
    val out = run(
      cl = Seq(5L -> 5L, 9L -> 5L, 7L -> 5L),
      q = Seq(5L -> 0.4, 9L -> 0.8, 7L -> 0.8))
    assert(out(5L).getLong(out(5L).fieldIndex("keeper")) == 7L)
  }

  test("clusters are independent: each gets its own keeper") {
    val out = run(
      cl = Seq(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L),
      q = Seq(1L -> 0.1, 2L -> 0.2, 10L -> 0.9, 11L -> 0.3))
    assert(out(1L).getLong(out(1L).fieldIndex("keeper")) == 2L)
    assert(out(10L).getLong(out(10L).fieldIndex("keeper")) == 10L)
  }

  test("gate corpus: the keeper dominates its cluster on (quality, -doc_id) and differs from min-id somewhere") {
    val out = graft.SparkEntry.queries("d_keep_best")(spark, sfDir).collect()
    val clusters = graft.api.DedupPipeline.clusters(
      graft.operators.Dedup.minhashLsh(graft.Tables(spark, sfDir).documents))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val quality = graft.Tables(spark, sfDir).documents
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.operators.TextAnalysis.qualityCol.as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byCluster = clusters.groupBy(_._2)
    assert(out.nonEmpty && out.length == byCluster.size)
    out.foreach { r =>
      val cid = r.getLong(r.fieldIndex("cluster_id"))
      val keeper = r.getLong(r.fieldIndex("keeper"))
      val members = byCluster(cid).map(_._1)
      assert(members.contains(keeper), s"cluster $cid keeper not a member")
      val best = members.minBy(d => (-quality(d), d))
      assert(keeper == best, s"cluster $cid keeper $keeper vs argmax $best")
    }
    // the policy must actually DIFFER from min-id on this corpus —
    // otherwise the entry is indistinguishable from d_dedup_clusters
    assert(out.exists { r =>
      val cid = r.getLong(r.fieldIndex("cluster_id"))
      r.getLong(r.fieldIndex("keeper")) != byCluster(cid).map(_._1).min
    }, "keep-best never diverged from min-id: fixture degenerate")
  }
}
