package graft

import graft.operators.TextAnalysis
import graft.streaming.CorpusStreaming
import org.apache.spark.sql.functions._

/** st_ccnet_score — CCNet scoring on the stream with an offline-fit
  * hashed model. Pins: stream rows equal the shared batch projection
  * row-for-row (the structural parity the memory-sink gate rides),
  * bucket assignment is exactly the cut comparison, the tercile split
  * is balanced on the gate corpus, and the hashed model agrees with
  * the exact-term ccnet ranking closely enough to be the same signal
  * (rank correlation floor — the model is CCNet's fixed-LM shape, not
  * a drop-in bit-equal replacement, and the spec documents that).
  */
class CcnetScoreStreamSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sfDir).documents
  private lazy val model = TextAnalysis.ccnetHashedModel(docs)
  private lazy val cuts = CorpusStreaming
    .ccnetHashedSurprisal(docs, model._1, model._2)
    .agg(expr("percentile(surprisal, 1.0D/3)"),
         expr("percentile(surprisal, 2.0D/3)")).head()
  private lazy val batch = CorpusStreaming.ccnetScore(
    docs, model._1, model._2, cuts.getDouble(0), cuts.getDouble(1))

  test("stream output equals the shared batch projection row-for-row") {
    val streamed = SparkEntry.queries("st_ccnet_score")(spark, sfDir)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("buckets are exactly the cut comparison and terciles are balanced") {
    val bad = batch.filter(
      (col("surprisal") <= cuts.getDouble(0) && col("bucket") =!= "head") ||
      (col("surprisal") > cuts.getDouble(0) &&
        col("surprisal") <= cuts.getDouble(1) && col("bucket") =!= "middle") ||
      (col("surprisal") > cuts.getDouble(1) && col("bucket") =!= "tail"))
    assert(bad.isEmpty)
    val byBucket = batch.groupBy("bucket").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = batch.count()
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    byBucket.values.foreach(c =>
      assert(c > n / 5 && c < n / 2, s"tercile badly unbalanced: $byBucket"))
  }

  test("hashed-model scores track the exact-term ccnet scores (Spearman floor)") {
    // 4096 buckets over a small vocabulary: collisions perturb scores
    // but must not scramble the ranking the partition depends on
    val joined = batch.select(col("doc_id"), col("surprisal").as("h"))
      .join(TextAnalysis.ccnetBuckets(docs)
        .select(col("doc_id"), col("surprisal").as("e")), "doc_id")
    val rk = joined
      .select((rank().over(org.apache.spark.sql.expressions.Window.orderBy("h")))
        .cast("double").as("rh"),
        (rank().over(org.apache.spark.sql.expressions.Window.orderBy("e")))
          .cast("double").as("re"))
    val corr = rk.agg(expr("corr(rh, re)")).head().getDouble(0)
    assert(corr > 0.99, f"hashed-vs-exact rank correlation $corr%.4f below floor")
  }
}
