package graft

import org.apache.spark.sql.Row

/** CCNet head/middle/tail partition (t_ccnet_buckets): surprisal and
  * tercile cuts hand-computed on a crafted corpus, the low-surprisal =
  * head orientation pinned (the paper keeps the most-predictable
  * partition), and ordering/coverage invariants on the gate corpus.
  */
class CcnetBucketsSpec extends SparkSpec {

  private def run(texts: Seq[String]): Map[Long, Row] = {
    val s = spark
    import s.implicits._
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    graft.operators.TextAnalysis.ccnetBuckets(df)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  private def d(r: Row, f: String): Double = r.getDouble(r.fieldIndex(f))
  private def str(r: Row, f: String): String = r.getString(r.fieldIndex(f))

  test("surprisal, cuts, and buckets hand-computed on a three-doc corpus") {
    // freq: a=5, b=1, c..f=1 -> total 10
    // doc0 "a a a a": -log2(5/10) = 1.0
    // doc1 "a b": (1 + log2(10)) / 2 = 2.161 (4dp)
    // doc2 "c d e f": log2(10) = 3.3219
    val m = run(Seq("a a a a", "a b", "c d e f"))
    assert(d(m(0L), "surprisal") == 1.0)
    assert(d(m(1L), "surprisal") == 2.161)
    assert(d(m(2L), "surprisal") == 3.3219)
    // cuts at (n-1)p over sorted [1.0, 2.161, 3.3219]:
    // c1 at idx 2/3 -> 1.0 + (2/3)(1.161); c2 at idx 4/3 -> 2.161 + (1/3)(1.1609)
    assert(d(m(0L), "cut_head") == math.rint((1.0 + 2.0 / 3 * 1.161) * 1e4) / 1e4)
    assert(d(m(0L), "cut_tail") == math.rint((2.161 + 1.0 / 3 * (3.3219 - 2.161)) * 1e4) / 1e4)
    // LOW surprisal = head (the partition CCNet keeps), then middle, tail
    assert(str(m(0L), "bucket") == "head")
    assert(str(m(1L), "bucket") == "middle")
    assert(str(m(2L), "bucket") == "tail")
  }

  test("a document exactly at an order-statistic cut lands head, not middle") {
    // four docs, two identical: sorted surprisals [s, s, t, u] put the
    // 1/3 cut AT the duplicated order statistic (idx (n-1)/3 = 1.0,
    // fraction 0 -> cut == s exactly, no interpolation) — the <= must
    // include it in head in BOTH engines
    val m = run(Seq("a a a", "a a a", "a b", "c d"))
    val cut = d(m(0L), "cut_head")
    assert(d(m(0L), "surprisal") == cut && d(m(1L), "surprisal") == cut)
    assert(str(m(0L), "bucket") == "head" && str(m(1L), "bucket") == "head")
  }

  test("gate corpus: every bucket populated, ordering consistent, cuts global") {
    val out = graft.SparkEntry.queries("t_ccnet_buckets")(spark, sfDir).collect()
    val byBucket = out.groupBy(r => str(r, "bucket"))
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    val maxHead = byBucket("head").map(d(_, "surprisal")).max
    val minMiddle = byBucket("middle").map(d(_, "surprisal")).min
    val maxMiddle = byBucket("middle").map(d(_, "surprisal")).max
    val minTail = byBucket("tail").map(d(_, "surprisal")).min
    assert(maxHead <= minMiddle && maxMiddle <= minTail, "buckets must be ordered partitions")
    // cuts are corpus-global: one distinct value per column
    assert(out.map(d(_, "cut_head")).distinct.length == 1)
    assert(out.map(d(_, "cut_tail")).distinct.length == 1)
    // roughly tercile-sized (ties can shift boundaries)
    val n = out.length
    for (b <- Seq("head", "middle", "tail"))
      assert(math.abs(byBucket(b).length - n / 3) < n / 6, s"$b size ${byBucket(b).length} of $n")
  }
}
