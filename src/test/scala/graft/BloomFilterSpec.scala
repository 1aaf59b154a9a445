package graft

import graft.functions.BloomFilter
import org.apache.spark.sql.functions._

/** The Bloom prefilter's probabilistic contract: NO false negatives
  * (ever — prefilter + exact join must equal the exact semi join, which
  * is what keeps d_bloom_prefilter oracle-checkable), false positives
  * bounded by the (1 - e^(-kn/m))^k sizing formula, and a scan-side
  * plan (membership is a predicate, not a join).
  */
class BloomFilterSpec extends SparkSpec {

  test("zero false negatives: every inserted key passes mightContain") {
    import spark.implicits._
    val keys = (0 until 1000).map(i => s"key-$i").toDF("k")
    val bits = BloomFilter.build(keys, col("k"), numWords = 2048, k = 5)
    val admitted = keys.filter(BloomFilter.mightContain(bits, col("k"), k = 5)).count()
    assert(admitted === 1000L)
  }

  test("false-positive rate stays near the sizing formula") {
    import spark.implicits._
    // deliberately tiny filter: m = 256 bits, n = 100, k = 3
    // → theory (1 - e^(-kn/m))^k ≈ 0.33; xxhash64 is fixed-seed so the
    // measured rate is deterministic — the loose band guards the math,
    // not randomness
    val keys = (0 until 100).map(i => s"member-$i").toDF("k")
    val bits = BloomFilter.build(keys, col("k"), numWords = 4, k = 3)
    val nonMembers = (0 until 1000).map(i => s"other-$i").toDF("k")
    val fps = nonMembers.filter(BloomFilter.mightContain(bits, col("k"), k = 3)).count()
    assert(fps > 100L && fps < 600L, s"fp count $fps outside the expected ~330 band")
  }

  test("adequately sized filter admits (almost) no non-members") {
    import spark.implicits._
    // m/n = 131072/1000, k = 5 → theoretical FP ~ 7e-8; 10k probes
    // should see none
    val keys = (0 until 1000).map(i => s"member-$i").toDF("k")
    val bits = BloomFilter.build(keys, col("k"), numWords = 2048, k = 5)
    val nonMembers = (0 until 10000).map(i => s"other-$i").toDF("k")
    val fps = nonMembers.filter(BloomFilter.mightContain(bits, col("k"), k = 5)).count()
    assert(fps <= 2L, s"fp count $fps for a filter sized at m/n=131")
  }

  test("d_bloom_prefilter equals the exact semi join (no survivor lost)") {
    val result = SparkEntry.queries("d_bloom_prefilter")(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq
    val d = Tables(spark, sfDir).documents
    val fp = graft.functions.TextFp.bagOfWords(col("text"))
    val ref = d.filter(col("doc_id") % 10 < 3).select(fp.as("fp")).distinct()
    val exact = d.filter(col("doc_id") % 10 >= 3)
      .select(col("doc_id"), fp.as("fp"))
      .join(ref, Seq("fp"), "left_semi")
      .select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(result === exact)
    assert(result.nonEmpty)
  }

  test("membership test is a scan-side predicate: no shuffle, no join") {
    import spark.implicits._
    val keys = (0 until 100).map(i => s"m-$i").toDF("k")
    val bits = BloomFilter.build(keys, col("k"), numWords = 64, k = 5)
    val corpus = (0 until 1000).map(i => s"c-$i").toDF("k")
    val p = corpus.filter(BloomFilter.mightContain(bits, col("k"), k = 5))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
    // the full entry's only join is the broadcast verification join
    val entry = SparkEntry.queries("d_bloom_prefilter")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!entry.contains("SortMergeJoin"), entry)
  }
}
