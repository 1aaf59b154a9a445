package graft

import graft.operators.Dedup

/** The xxhash64 production LSH path against the oracled md5 path: the
  * verification criterion (exact Jaccard ≥ τ on shingle sets) is
  * identical, so on a corpus whose near-dups sit well above τ the two
  * hash samplings must surface the same verified pair set; the bucket
  * cap must hold identically.
  */
class DedupLsh64Spec extends SparkSpec {

  test("verified pair set matches the md5 path on the test corpus") {
    val docs = Tables(spark, sfDir).documents
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fast = pairs(Dedup.minhashLsh64(docs))
    val md5p = pairs(Dedup.minhashLsh(docs))
    assert(md5p.nonEmpty)
    assert(fast == md5p, s"fast-only: ${fast -- md5p}, md5-only: ${md5p -- fast}")
  }

  test("bucket cap keeps the xxhash64 path linear on a pathological corpus") {
    import spark.implicits._
    val words = (0 until 30).map(i => s"w$i").mkString(" ")
    val identical = (0 until 100).map(i => (i.toLong, words)).toDF("doc_id", "text")
    val uncapped = Dedup.minhashLsh64(identical, maxBucket = Int.MaxValue)
    assert(uncapped.count() == 4950L)
    assert(Dedup.minhashLsh64(identical).count() == 0L)
  }
}
