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
