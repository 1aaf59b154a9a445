package graft

/** Closed-form check of the bigram-LM scorer (t_bigram_surprisal):
  * the oracle gate covers cross-engine parity at SF; this pins the
  * smoothed-model math itself on a corpus small enough to hand-count.
  */
class BigramSurprisalSpec extends SparkSpec {

  private def score(texts: Seq[String]): Map[Long, (Long, Double, Double)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bg").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.operators.TextAnalysis.entries
      .find(_.name == "t_bigram_surprisal").get.fn(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val root = new org.apache.hadoop.fs.Path(dir)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(root, true)
    rows
  }

  test("smoothed bigram cross-entropy matches the hand-computed model") {
    // corpus: doc0 = "a b a b", doc1 = "a b"
    //   bigram counts: (a,b)=3, (b,a)=1; context counts: a=3, b=1; V=2
    //   add-0.5: p(b|a) = 3.5/4 = 0.875, p(a|b) = 1.5/2 = 0.75
    //   doc0 xent = (2·0.192645 + 0.415037)/3 = 0.2668 → ppl 2^0.2668 = 1.2031
    //   doc1 xent = 0.192645 → 0.1926 → ppl 1.1428
    val s = score(Seq("a b a b", "a b"))
    assert(s(0L) === ((3L, 0.2668, 1.2031)))
    assert(s(1L) === ((1L, 0.1926, 1.1428)))
  }

  test("single-token and empty documents produce no score row") {
    val s = score(Seq("lonely", "", "a b"))
    assert(s.keySet === Set(2L))
  }

  test("a document of common transitions scores lower perplexity than rare ones") {
    // "x y" repeated dominates the model; the doc wired from one-off
    // transitions must sit strictly above it
    val common = Seq.fill(20)("x y").mkString(" ")
    val rare = "p q r s t u v w"
    val s = score(Seq(common, rare))
    assert(s(0L)._3 < s(1L)._3, s"common ${s(0L)._3} vs rare ${s(1L)._3}")
  }
}
