package graft

import graft.operators.Dedup

/** SimHash64 band-join bucket cap: the same degenerate-corpus guarantee
  * DedupLshSpec proves for MinHash-LSH — a corpus of mass-identical
  * simhashes (all four 16-bit bands equal across 1000 docs) must not
  * make the (band_i, band_v) self-join quadratic. Exact-dup mass is
  * d_dedup_exact's job; the cap drops those buckets while genuine
  * near-dup pairs still collide in normal-sized band buckets.
  */
class DedupSimhash64Spec extends SparkSpec {

  private def corpus() = {
    import spark.implicits._
    val words = (0 until 30).map(i => s"w$i").mkString(" ")
    val identical = (0 until 1000).map(i => (i.toLong, words))
    // 2000/2001: a genuine dup pair with vocabulary DISJOINT from the
    // mass corpus — its band buckets have size 2, far under the cap.
    // (A one-word variant would be flaky here: simhash over a ~30-item
    // shingle set flips many bits per changed shingle, so the pair must
    // share an exact band value deterministically.)
    val other = (0 until 30).map(i => s"v$i").mkString(" ")
    val pair = Seq((2000L, other), (2001L, other))
    (identical ++ pair).toDF("doc_id", "text")
  }

  test("bucket cap keeps simhash64 candidates linear on a pathological corpus") {
    val docs = corpus()
    val pairs = Dedup.simhash64Pairs(docs).collect()
    // 1000 identical docs share every band bucket (size ≥ 1000 > cap) →
    // zero pairs among them; C(1000,2) ≈ 500k would otherwise appear
    assert(pairs.length <= docs.count())
    assert(!pairs.exists(r => r.getLong(0) < 1000 && r.getLong(1) < 1000))
  }

  test("without the cap the degenerate band bucket goes quadratic (control)") {
    import spark.implicits._
    val words = (0 until 30).map(i => s"w$i").mkString(" ")
    val identical = (0 until 100).map(i => (i.toLong, words)).toDF("doc_id", "text")
    val uncapped = Dedup.simhash64Pairs(identical, maxBucket = Int.MaxValue)
    // 100 identical docs → identical simhash → C(100,2) pairs at hamming 0
    assert(uncapped.count() == 4950L)
    assert(Dedup.simhash64Pairs(identical).count() == 0L)
  }

  test("genuine near-dup pairs survive the cap") {
    val pairs = Dedup.simhash64Pairs(corpus()).collect()
    assert(pairs.exists(r => r.getLong(0) == 2000L && r.getLong(1) == 2001L))
  }

  test("char-4-gram projection is safe on sub-4-char and empty texts") {
    import spark.implicits._
    val docs = Seq((0L, ""), (1L, "a"), (2L, "ab"), (3L, "abc"), (4L, "abcd"), (5L, "abcde"))
      .toDF("doc_id", "text")
    val g = Dedup.charGrams(docs).collect().map(r =>
      r.getLong(0) -> r.getSeq[String](1)).toMap
    // short texts yield themselves as the single gram; no sequence error
    assert(g(0L) == Seq(""))
    assert(g(1L) == Seq("a"))
    assert(g(3L) == Seq("abc"))
    assert(g(4L) == Seq("abcd"))
    assert(g(5L) == Seq("abcd", "bcde"))
  }
}
