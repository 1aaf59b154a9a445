package graft

import graft.api.DedupPipeline
import org.apache.spark.sql.functions._

class DedupPipelineSpec extends SparkSpec {

  test("clusters: chain and triangle collapse to smallest id") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val cl = DedupPipeline.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("dedup keeps one representative per near-dup cluster on the corpus") {
    val docs = Tables(spark, sfDir).documents
    val pairs = SparkEntry.queries("d_minhash_lsh")(spark, sfDir)
      .select("doc_a", "doc_b")
    val deduped = DedupPipeline.dedup(docs, pairs)
    val cl = DedupPipeline.clusters(pairs)
    val losers = cl.filter(col("doc_id") =!= col("cluster_id")).count()
    assert(deduped.count() == docs.count() - losers)
    assert(losers > 0) // the corpus genuinely contains near-dups
    // every cluster representative survives
    val reps = cl.select(col("cluster_id")).distinct().count()
    val survivingClustered = deduped.join(cl, "doc_id").count()
    assert(survivingClustered == reps)
  }
}
