package graft.api

import graft.operators.{Corpus, Dedup, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-call training-data preparation: the composition every LLM corpus
  * pipeline runs, wired from the engine's own stages —
  *
  *   hygiene (Corpus.clean) → exact dedup (content-hash groupBy) →
  *   MinHash-LSH near-dup dedup (xxhash64 production path + connected
  *   components, smallest id survives) → global quality-quantile filter →
  *   deterministic hash split (train/val/test) → context-window packing
  *   plan for the train split
  *
  * plus a per-stage row accounting so every document dropped is
  * attributable to exactly one stage (the property corpus audits need;
  * silent attrition is how training sets rot).
  *
  * Scale shape: each stage is the already-audited at-scale operator,
  * and each counted stage is persisted for the duration of the call so
  * the count action and the downstream stage read ONE materialization —
  * without that, every count replays the full lineage from the scan
  * (hygiene would run ~6×). All stage caches are released before
  * returning; the result frame is localCheckpointed so it survives the
  * release. The only driver-side values are the per-stage counts and
  * the ONE quality-threshold double (same two-pass shape as
  * t_quality_filter).
  */
object TrainingData {

  /** The prepared corpus, the near-dup pairs the dedup stage acted on
    * (exposed so audits/specs reason about the SAME pair set — re-running
    * LSH on the deduped corpus can surface pairs the oversized-bucket cap
    * suppressed in the original corpus), and per-stage row counts.
    */
  final case class Prepared(corpus: DataFrame, pairs: DataFrame,
                            stages: Seq[(String, Long)])

  /** Deterministic md5 percent bucket of the doc id — stable across
    * runs, engines, and repartitioning (same convention as
    * t_hash_split).
    */
  private def pctBucket = pmod(
    conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("bigint"),
    lit(100L))

  /** Run the full preparation over a (doc_id, text, ...) frame.
    *
    * @param qualityQuantile  drop docs below this corpus quality
    *                         quantile (0.25 = drop the worst quartile)
    * @param trainPct/valPct  hash-split percentages (rest = test)
    * @param binTokens        context-window size for the packing plan
    */
  def prepare(docs: DataFrame, qualityQuantile: Double = 0.25,
              trainPct: Int = 80, valPct: Int = 10,
              binTokens: Int = 2048): Prepared = {
    val stages = Seq.newBuilder[(String, Long)]
    stages += "raw" -> docs.count()

    val cleaned = Corpus.clean(docs).persist()
    try {
      stages += "cleaned" -> cleaned.count()

      // exact dedup: one content hash per group survives (smallest id —
      // deterministic, and consistent with the near-dup representative
      // rule below)
      val keepIds = cleaned.groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("doc_id")).select("doc_id")
      val exact = cleaned.join(keepIds, Seq("doc_id"), "left_semi").persist()
      try {
        stages += "exact_dedup" -> exact.count()

        // near-dup dedup on the production xxhash64 LSH path; cluster by
        // connected components, keep the smallest id per cluster. The
        // pair list is small and already materialized by minhashLsh64.
        val pairs = Dedup.minhashLsh64(exact.select(col("doc_id"), col("text")))
        val deduped = DedupPipeline.dedup(exact, pairs).persist()
        try {
          stages += "neardup_dedup" -> deduped.count()

          // global quality floor: the corpus-wide quantile reaches the
          // scan as ONE literal (no join, no broadcast relation); a
          // fully-cleaned-away corpus has no quantile — keep nothing to
          // filter instead of NPE-ing on the null aggregate
          val scored = deduped.withColumn("quality", TextAnalysis.qualityCol)
          val thrRow = scored.agg(expr(s"percentile(quality, $qualityQuantile)")).head()
          val thr = if (thrRow.isNullAt(0)) Double.NegativeInfinity
                    else thrRow.getDouble(0)
          val filtered = scored.filter(col("quality") >= lit(thr))
          stages += "quality_filter" -> filtered.count()

          // deterministic split + packing plan (train only): running
          // token total per hash bucket — 32 independent timelines,
          // never a corpus-wide cumulative sum
          val split = filtered.withColumn("split",
            when(pctBucket < trainPct, "train")
              .when(pctBucket < trainPct + valPct, "val")
              .otherwise("test"))
            .withColumn("n_tokens", expr("CAST(size(split(text, ' ')) AS BIGINT)"))
          val w = Window.partitionBy("bucket").orderBy("doc_id")
          val packed = split
            .withColumn("bucket", pmod(col("doc_id"), lit(32)))
            // only train tokens advance the bin timeline — val/test rows
            // in the same bucket must not inflate train bins
            .withColumn("train_tokens",
              when(col("split") === "train", col("n_tokens")).otherwise(0L))
            .withColumn("bin",
              when(col("split") === "train",
                concat_ws("_", col("bucket"),
                  ((sum("train_tokens").over(w) - col("n_tokens")) / binTokens)
                    .cast("bigint"))))
            .drop("bucket", "train_tokens")
          // one materialization for callers + counts, surviving the
          // stage-cache release below
          val out = packed.localCheckpoint()
          stages += "final" -> out.count()
          Prepared(out, pairs, stages.result())
        } finally deduped.unpersist(false)
      } finally exact.unpersist(false)
    } finally cleaned.unpersist(false)
  }
}
