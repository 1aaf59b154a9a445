package graft

import graft.operators.{Corpus, Dedup}
import org.apache.spark.sql.functions._

/** Corpus hygiene: dirty rows (null / empty / whitespace-soup text)
  * must be removed explicitly — and the dedup family must behave on the
  * cleaned frame, not silently drop documents mid-pipeline.
  */
class CorpusSpec extends SparkSpec {

  private def dirty = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "en"),
      (1L, null.asInstanceOf[String], "en"),
      (2L, "", "en"),
      (3L, "   ", "en"),
      (4L, "  spaced   out\ttabs\nand newlines  ", null.asInstanceOf[String]),
      (5L, "the quick brown fox jumps over the lazy dog", "en"),
    ).toDF("doc_id", "text", "lang")
  }

  test("clean drops null/empty, normalizes whitespace, coalesces lang") {
    val c = Corpus.clean(dirty)
    assert(c.count() == 3)
    val r4 = c.filter(col("doc_id") === 4L).collect().head
    assert(r4.getAs[String]("text") == "spaced out tabs and newlines")
    assert(r4.getAs[String]("lang") == "und")
    assert(Corpus.cleanStats(dirty) == (3L, 3L))
  }

  test("null text flows as unmatchable null shingles WITHOUT clean (the trap)") {
    // document the hazard clean exists for: doc 1's only shingle is
    // NULL — its minhashes are null, its band keys are null, and a null
    // band key never equi-joins, so the document is silently excluded
    // from dedup (no error, no row in any pair)
    val shingled = Dedup.shingles(dirty.select("doc_id", "text"))
    val exploded = shingled.select(col("doc_id"), explode(col("sh")).as("s"))
    val d1 = exploded.filter(col("doc_id") === 1L).collect()
    assert(d1.forall(_.isNullAt(1)), d1.mkString(","))
    val pairs = Dedup.minhashLsh(dirty.select("doc_id", "text")).collect()
    assert(!pairs.exists(r => r.getLong(0) == 1L || r.getLong(1) == 1L))
  }

  test("dedup family runs correctly on the cleaned frame") {
    val c = Corpus.clean(dirty).select("doc_id", "text")
    val pairs = Dedup.minhashLsh(c).collect()
    // docs 0 and 5 are exact dups → jaccard 1.0 pair survives
    assert(pairs.exists(r => r.getLong(0) == 0L && r.getLong(1) == 5L &&
                             r.getDouble(2) == 1.0))
    val grams = Dedup.charGrams(c)
    assert(grams.count() == 3)
  }
}
