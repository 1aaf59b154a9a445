package graft

import org.apache.spark.sql.functions._

/** End-to-end semantic dedup contract: the surviving corpus keeps
  * exactly one representative (the smallest vec_id) per near-dup
  * cluster, and never both sides of a detected pair.
  */
class SemanticDedupSpec extends SparkSpec {

  private lazy val corpus = Tables(spark, sfDir).embeddings
    .select(col("vec_id"), col("embedding"))

  private lazy val pairs = graft.api.SrpLsh.nearDupPairs(corpus, dim = 64, tau = 0.45)
    .select(col("a_id"), col("b_id"))
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private lazy val kept = SparkEntry.queries("d_semantic_dedup")(spark, sfDir)
    .collect().map(_.getLong(0)).toSet

  test("kept set is a subset of the corpus and nonempty") {
    val all = corpus.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty)
    assert(kept.subsetOf(all))
    assert(kept.size < all.size || pairs.isEmpty)
  }

  test("no detected near-dup pair survives with both sides kept") {
    assert(pairs.nonEmpty)
    val survivors = pairs.filter { case (a, b) => kept(a) && kept(b) }
    assert(survivors.isEmpty, s"both-kept pairs: ${survivors.take(5)}")
  }

  test("every dropped vector's cluster representative is kept") {
    val cl = graft.api.DedupPipeline.clusters(
        Tables(spark, sfDir).embeddings.sparkSession
          .createDataFrame(pairs.map(p => (p._1, p._2)))
          .toDF("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val all = corpus.select("vec_id").collect().map(_.getLong(0)).toSet
    val dropped = all -- kept
    assert(dropped.nonEmpty)
    dropped.foreach { d =>
      val rep = cl.getOrElse(d, d)
      assert(kept(rep), s"dropped $d has un-kept representative $rep")
    }
  }
}
