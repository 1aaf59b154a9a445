package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** LSH bucket-size cap: a degenerate corpus (many identical docs all
  * landing in the same (band, minhash) buckets) must not make candidate
  * generation quadratic. The cap drops oversized buckets — exact-dup
  * mass is d_dedup_exact's job — while genuine near-dup pairs still
  * collide in normal-sized buckets.
  */
class DedupLshSpec extends SparkSpec {

  private def corpus() = {
    import spark.implicits._
    val words = (0 until 30).map(i => s"w$i").mkString(" ")
    val identical = (0 until 1000).map(i => (i.toLong, words))
    val variant = (0 until 30).map(i => if (i == 15) "zz" else s"w$i").mkString(" ")
    // 2000/2001: a genuine near-dup pair with distinct shingle profiles
    val pair = Seq((2000L, words + " tail marker alpha"), (2001L, variant + " tail marker alpha"))
    (identical ++ pair).toDF("doc_id", "text")
  }

  test("bucket cap keeps candidate count linear on a pathological corpus") {
    val docs = corpus()
    val capped = Dedup.lshCandidates(Dedup.shingles(docs)).collect()
    // the 1000 identical docs share every bucket (size ≥ 1000 > cap) →
    // contribute zero candidates; only normal-sized buckets join
    assert(capped.length <= docs.count())
    assert(!capped.exists(r => r.getLong(0) < 1000 && r.getLong(1) < 1000))
  }

  test("genuine near-dup pairs survive the cap") {
    val docs = corpus()
    val result = Dedup.minhashLsh(docs).collect()
    assert(result.exists(r => r.getLong(0) == 2000L && r.getLong(1) == 2001L))
  }

  test("without the cap the degenerate bucket goes quadratic (control)") {
    import spark.implicits._
    val words = (0 until 30).map(i => s"w$i").mkString(" ")
    val identical = (0 until 100).map(i => (i.toLong, words)).toDF("doc_id", "text")
    val uncapped = Dedup.lshCandidates(Dedup.shingles(identical), maxBucket = Int.MaxValue)
    // 100 identical docs → C(100,2) = 4950 candidate pairs without a cap
    assert(uncapped.count() == 4950L)
    val cappedN = Dedup.lshCandidates(Dedup.shingles(identical)).count()
    assert(cappedN == 0L)
  }
}
