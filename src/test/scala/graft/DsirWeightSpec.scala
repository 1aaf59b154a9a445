package graft

/** Semantic check of the DSIR importance-weight pass (t_dsir_weight):
  * the oracle gate covers cross-engine parity at SF; this pins the
  * model direction — documents drawn from the target distribution
  * weigh positive, documents alien to it weigh negative, identical
  * documents weigh identically. Tokens chosen with distinct md5
  * 3-hex-prefix buckets (2c1/987/05b/63b) so bucket collisions can't
  * blur the construction.
  */
class DsirWeightSpec extends SparkSpec {

  private def weights(docs: Seq[(String, String)]): Map[Long, Double] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    docs.zipWithIndex.map { case ((t, lang), i) =>
      (i.toLong, t, lang, "src0", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.operators.TextAnalysis.entries
      .find(_.name == "t_dsir_weight").get.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val root = new org.apache.hadoop.fs.Path(dir)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(root, true)
    rows
  }

  test("target-typical docs weigh positive, target-alien docs negative") {
    val w = weights(Seq(
      ("alpha beta alpha beta", "en"),
      ("alpha beta alpha beta", "en"),
      ("gamma delta gamma delta", "de"),
      ("gamma delta gamma delta", "de")))
    assert(w(0L) > 0, s"target-typical doc should weigh positive: ${w(0L)}")
    assert(w(2L) < 0, s"target-alien doc should weigh negative: ${w(2L)}")
    assert(w(0L) == w(1L) && w(2L) == w(3L), "identical docs must weigh identically")
    assert(w(0L) > w(2L))
  }

  test("gumbel-top-k resample overwhelmingly selects target-like docs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir-s").toString
    // 100 target-typical docs (ids 0-99) + 100 alien docs (ids 100-199);
    // the weight gap (~±10 bits) dwarfs the Gumbel noise (stddev ~1.3
    // nats), so the deterministic top-100 must be nearly all typical
    val docs = (0 until 100).map(i => (i.toLong, "alpha beta alpha beta", "en", "src0", 21L)) ++
      (0 until 100).map(i => (100L + i, "gamma delta gamma delta", "de", "src0", 23L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val picked = graft.operators.TextAnalysis.entries
      .find(_.name == "t_dsir_sample").get.fn(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val root = new org.apache.hadoop.fs.Path(dir)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(root, true)
    assert(picked.size == 100)
    val typical = picked.count(_ < 100L)
    assert(typical >= 80, s"expected the sample dominated by target-like docs, got $typical/100")
  }

  test("a mixed doc sits between pure-target and pure-alien") {
    val w = weights(Seq(
      ("alpha beta alpha beta", "en"),
      ("alpha beta gamma delta", "en"),
      ("gamma delta gamma delta", "de"),
      ("alpha beta alpha beta", "en")))
    assert(w(0L) > w(1L) && w(1L) > w(2L),
      s"expected monotone: ${w(0L)} > ${w(1L)} > ${w(2L)}")
  }
}
