package graft

import org.apache.spark.sql.functions._

/** The two round-4 text-quality signals: character-distribution
  * entropy (closed-form cases — the oracle gate covers cross-engine
  * parity, this pins the math itself) and the Deflate compression
  * ratio (repetition separation + determinism; zlib is JVM-side so
  * there is no oracle twin).
  */
class TextSignalsSpec extends SparkSpec {

  private def entropyOf(texts: Seq[String]): Map[String, Double] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ent").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // reuse the real registry fn so the spec exercises the shipped plan
    val rows = graft.operators.TextAnalysis.entries
      .find(_.name == "t_char_entropy").get.fn(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(4)))
    val byId = rows.toMap
    val out = texts.zipWithIndex.map { case (t, i) => t -> byId(i.toLong) }.toMap
    val root = new org.apache.hadoop.fs.Path(dir)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(root, true)
    out
  }

  test("char entropy matches closed forms: constant 0, two-symbol 1, uniform-4 2") {
    val e = entropyOf(Seq("aaaaaaaa", "abababab", "abcdabcd", "aaab"))
    assert(e("aaaaaaaa") === 0.0)
    assert(e("abababab") === 1.0)
    assert(e("abcdabcd") === 2.0)
    // p = (3/4, 1/4): -(0.75*log2(0.75) + 0.25*log2(0.25)) ≈ 0.8113
    assert(e("aaab") === 0.8113)
  }

  test("compress ratio separates long-range repetition from varied text") {
    val repetitive = Seq.fill(50)("the same paragraph pasted again and again").mkString(" ")
    val varied = (0 until 50)
      .map(i => s"line $i salt ${(i * 2654435761L).toHexString} word${i % 7}")
      .mkString(" ")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cr").toString
    Seq((0L, repetitive, "en", "src0", repetitive.length.toLong),
        (1L, varied, "en", "src0", varied.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def run() = graft.operators.TextAnalysis.entries
      .find(_.name == "t_compress_ratio").get.fn(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val rows = run()
    val byId = rows.map(r => r._1 -> r).toMap
    // the repetitive doc compresses at least 3× harder than the varied one
    assert(byId(0L)._4 * 3 < byId(1L)._4,
      s"repetitive ${byId(0L)._4} vs varied ${byId(1L)._4}")
    // ratio is exactly n_deflate / n_raw
    rows.foreach { case (_, raw, defl, ratio) =>
      assert(ratio === defl.toDouble / raw)
    }
    // deterministic across runs (fixed level, fresh Deflater per batch)
    assert(run() === rows)
    val root = new org.apache.hadoop.fs.Path(dir)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(root, true)
  }

  test("t_chunk_overlap tiles every document: starts stride by 192, full coverage") {
    val rows = SparkEntry.queries("t_chunk_overlap")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables(spark, sfDir).documents
      .selectExpr("doc_id", "CAST(length(text) AS BIGINT) AS len")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty && rows.map(_._1).distinct.length == docs.size)
    rows.groupBy(_._1).foreach { case (docId, cs) =>
      val sorted = cs.sortBy(_._2)
      // chunk ids are 0..n-1, starts are id*192
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      sorted.foreach { case (_, id, start, chars) =>
        assert(start == id * 192)
        assert(chars > 0 && chars <= 256)
      }
      // the last chunk reaches the end of the document
      val (_, _, lastStart, lastChars) = sorted.last
      assert(lastStart + lastChars == docs(docId),
        s"doc $docId: ${lastStart + lastChars} != ${docs(docId)}")
      // consecutive chunks overlap by 64 chars (except a short tail)
      sorted.sliding(2).foreach {
        case Array((_, _, s1, c1), (_, _, s2, _)) => assert(s1 + c1 >= s2)
        case _ => ()
      }
    }
  }
}
