package graft

import org.apache.spark.sql.Row

/** Gopher/MassiveText filter rules (t_gopher_rules): every metric and
  * every rule flag hand-computed on crafted documents, including the
  * non-overlapping ellipsis count, the bullet/ellipsis LINE rules, and
  * the required-stopword floor — independent of the DuckDB oracle.
  */
class GopherRulesSpec extends SparkSpec {

  private def run(texts: Seq[String]): Map[Long, Row] = {
    val s = spark
    import s.implicits._
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    graft.operators.TextAnalysis.gopherRules(df)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("a well-formed 52-word document passes every rule") {
    val text = (Seq("the", "be", "to", "of", "and", "that", "have", "with")
      ++ Seq.fill(44)("word")).mkString(" ")
    val r = run(Seq(text))(0L)
    assert(r.getLong(r.fieldIndex("n_words")) == 52L)
    // word chars: the+be+to+of+and+that+have+with = 3+2+2+2+3+4+4+4 = 24, plus 44*4
    assert(r.getDouble(r.fieldIndex("mean_word_len")) ==
      math.round((24 + 44 * 4) / 52.0 * 10000) / 10000.0)
    assert(r.getLong(r.fieldIndex("stop_hits")) == 8L)
    for (f <- Seq("pass_words", "pass_mean_len", "pass_symbol", "pass_bullet",
                  "pass_ellipsis", "pass_alpha", "pass_stop", "pass"))
      assert(r.getBoolean(r.fieldIndex(f)), f)
  }

  test("word-count floor: a 10-word doc fails pass_words only for that rule") {
    val text = (Seq("the", "of") ++ Seq.fill(8)("word")).mkString(" ")
    val r = run(Seq(text))(0L)
    assert(!r.getBoolean(r.fieldIndex("pass_words")))
    assert(r.getBoolean(r.fieldIndex("pass_stop")))
    assert(!r.getBoolean(r.fieldIndex("pass")))
  }

  test("symbol ratio counts '#' chars and NON-OVERLAPPING '...' runs") {
    // 4 dots = ONE non-overlapping '...' occurrence (+1 leftover dot);
    // 2 hashes + 2 ellipses over 6 words = 4/6 > 0.1
    val r = run(Seq("a# b# c.... d... the of"))(0L)
    assert(r.getDouble(r.fieldIndex("symbol_ratio")) ==
      math.round(4 / 6.0 * 10000) / 10000.0)
    assert(!r.getBoolean(r.fieldIndex("pass_symbol")))
  }

  test("bullet and ellipsis-end line ratios count LINES, all three bullet forms") {
    val text = "- one\n* two\n• three\nplain line\nends..."
    val r = run(Seq(text))(0L)
    assert(r.getDouble(r.fieldIndex("bullet_ratio")) == 0.6) // 3 of 5 lines
    assert(r.getDouble(r.fieldIndex("ellipsis_ratio")) == 0.2) // 1 of 5 lines
    assert(r.getBoolean(r.fieldIndex("pass_bullet")))
    assert(r.getBoolean(r.fieldIndex("pass_ellipsis")))
    // all-bullet doc (ratio 1.0 > 0.9) and heavy-trailing-ellipsis doc fail
    val bad = run(Seq("- a\n- b", "x...\ny...\nz"))
    assert(!bad(0L).getBoolean(bad(0L).fieldIndex("pass_bullet")))
    assert(!bad(1L).getBoolean(bad(1L).fieldIndex("pass_ellipsis")))
  }

  test("alphabetic-word share and stopword floor") {
    // 2 alpha words of 7 => 0.2857 < 0.8; only 1 required stopword
    val r = run(Seq("1 2 3 44 55 the word"))(0L)
    assert(r.getDouble(r.fieldIndex("alpha_word_ratio")) ==
      math.round(2 / 7.0 * 10000) / 10000.0)
    assert(!r.getBoolean(r.fieldIndex("pass_alpha")))
    assert(r.getLong(r.fieldIndex("stop_hits")) == 1L)
    assert(!r.getBoolean(r.fieldIndex("pass_stop")))
    // 'a'/'in'/'is' are corpus stopwords but NOT on Gopher's required list
    val r2 = run(Seq("a in is it word"))(0L)
    assert(r2.getLong(r2.fieldIndex("stop_hits")) == 0L)
  }

  test("registry entry lands on the sf0.001 corpus with per-doc rows") {
    val df = SparkEntry.queries("t_gopher_rules")(spark, sfDir)
    val n = Tables(spark, sfDir).documents.count()
    assert(df.count() == n)
    // the synthetic corpus is single-line lowercase prose: bullets and
    // line-end ellipses are absent, stop hits present
    val agg = df.selectExpr("sum(CAST(pass_bullet AS INT))",
      "sum(CAST(pass_stop AS INT))", "count(1)").collect()(0)
    assert(agg.getLong(0) == n && agg.getLong(2) == n)
  }
}
