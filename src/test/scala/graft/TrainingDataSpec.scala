package graft

import graft.api.TrainingData
import org.apache.spark.sql.functions._

class TrainingDataSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sfDir).documents
  private lazy val prepared = TrainingData.prepare(docs)

  test("stage accounting is monotone and attributes every drop") {
    val s = prepared.stages.toMap
    val order = Seq("raw", "cleaned", "exact_dedup", "neardup_dedup",
      "quality_filter", "final")
    assert(prepared.stages.map(_._1) == order)
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(s(a) >= s(b), s"$a=${s(a)} < $b=${s(b)}")
    }
    assert(s("final") == s("quality_filter"), "split/pack must drop nothing")
    assert(s("final") > 0)
  }

  test("no exact-duplicate text survives and output ids come from the input") {
    val out = prepared.corpus
    val n = out.count()
    assert(out.select(md5(col("text"))).distinct().count() == n)
    assert(out.join(docs, Seq("doc_id"), "left_anti").isEmpty)
  }

  test("near-duplicate representatives: no surviving LSH pair has both sides kept") {
    // assert against the SAME pair set prepare() acted on — re-running
    // LSH on the deduped corpus could surface pairs the oversized-bucket
    // cap suppressed in the original corpus (shrunken buckets fall back
    // under the cap), which prepare() by design never saw
    val ids = prepared.corpus.select("doc_id")
    assert(prepared.pairs
      .join(ids.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi")
      .join(ids.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
      .isEmpty)
    assert(prepared.pairs.count() > 0, "testdata must exercise the dedup stage")
  }

  test("quality floor holds: kept minimum >= the requested corpus quantile") {
    val kept = prepared.corpus.agg(min("quality"), max("quality")).head()
    assert(kept.getDouble(0) <= kept.getDouble(1))
    // the floor actually bit: the corpus spread below the kept minimum
    val dropped = prepared.stages.toMap
    assert(dropped("quality_filter") < dropped("neardup_dedup"))
  }

  test("splits are disjoint, exhaustive, and deterministically hashed") {
    val bySplit = prepared.corpus.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = bySplit.values.sum
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(total == prepared.stages.toMap.apply("final"))
    // 80/10/10 within generous tolerance at ~400 docs
    assert(bySplit("train").toDouble / total > 0.65)
    assert(bySplit("val").toDouble / total < 0.25)
    // re-run: identical assignment (pure hash of the id)
    val again = TrainingData.prepare(docs).corpus
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = prepared.corpus.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == first)
  }

  test("train bins respect the token budget up to one straddling doc") {
    val train = prepared.corpus.filter(col("split") === "train")
    assert(train.filter(col("bin").isNull).isEmpty)
    val maxDoc = train.agg(max("n_tokens")).head().getLong(0)
    val over = train.groupBy("bin").agg(sum("n_tokens").as("bin_tokens"))
      .filter(col("bin_tokens") > lit(2048L) + lit(maxDoc))
    assert(over.isEmpty)
    // val/test never get bins
    assert(prepared.corpus.filter(col("split") =!= "train" && col("bin").isNotNull).isEmpty)
  }
}
