package graft

import org.apache.spark.sql.functions._

/** The weighted sampler must actually bias by weight (not just pass the
  * cross-engine gate) and be stable across repartitionings.
  */
class SamplingSpec extends SparkSpec {

  private def sample() =
    SparkEntry.queries("t_weighted_sample")(spark, sfDir)

  test("t_weighted_sample favors heavy (long) docs") {
    val sampled = sample().agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val corpus = Tables(spark, sfDir).documents
      .filter(col("n_chars") > 0)
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    // u/w racing makes selection probability increase with w; with 100
    // of ~500 docs drawn, the sampled mean length clearing the corpus
    // mean is a >5-sigma event under unweighted sampling
    assert(sampled > corpus,
      s"sampled mean n_chars $sampled should exceed corpus mean $corpus")
  }

  test("t_weighted_sample is invariant to the input partitioning") {
    val base = sample().collect().map(_.getLong(0)).toSeq
    val repart = Tables(spark, sfDir).documents.repartition(17)
    val d = repart.filter(col("n_chars") > 0)
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
      .cast("bigint")
    val again = d.select(col("doc_id"),
        (u.cast("double") / col("n_chars").cast("double")).as("priority"))
      .orderBy("priority", "doc_id").limit(100)
      .collect().map(_.getLong(0)).toSeq
    assert(again === base)
  }
}
