package graft

import org.apache.spark.sql.Row

/** C4 structural filter (t_c4_rules): every metric and rule flag
  * hand-computed on crafted documents — the kept-line conjunction
  * (terminal punctuation AND ≥5 words AND no "javascript"), the
  * sentence count over KEPT lines only, and the page-level
  * lorem-ipsum / curly-brace rules — independent of the DuckDB oracle.
  */
class C4RulesSpec extends SparkSpec {

  private def run(texts: Seq[String]): Map[Long, Row] = {
    val s = spark
    import s.implicits._
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    graft.operators.TextAnalysis.c4Rules(df)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  private def b(r: Row, f: String): Boolean = r.getBoolean(r.fieldIndex(f))
  private def l(r: Row, f: String): Long = r.getLong(r.fieldIndex(f))

  test("a clean three-sentence page passes every rule") {
    val text = Seq(
      "this is a fine first sentence.",
      "and here is another good one!",
      "is this the third proper sentence?").mkString("\n")
    val r = run(Seq(text))(0L)
    assert(l(r, "n_lines") == 3L)
    assert(l(r, "n_kept") == 3L)
    assert(l(r, "n_sentences") == 3L)
    assert(!b(r, "has_lorem") && !b(r, "has_brace"))
    for (f <- Seq("pass_sentences", "pass_lorem", "pass_brace", "pass"))
      assert(b(r, f), f)
  }

  test("line keep is the CONJUNCTION: punctuation, >=5 words, no javascript") {
    val text = Seq(
      "ends with no punctuation at all",  // dropped: no terminal punct
      "too few words here.",              // dropped: 4 words
      "this line mentions javascript somewhere bad.", // dropped: javascript
      "this perfectly ordinary line is kept.",        // kept
      "A line ending in a quote is kept too.\"",      // kept: closing quote
      "what about a kept question line?").mkString("\n") // kept
    val r = run(Seq(text))(0L)
    assert(l(r, "n_lines") == 6L)
    assert(l(r, "n_kept") == 3L)
    assert(r.getDouble(r.fieldIndex("kept_ratio")) == 0.5)
    // sentences in kept lines: one '.' each in the two period lines,
    // one '?' — the closing-quote line's quote char is NOT a sentence
    // mark, only its period counts
    assert(l(r, "n_sentences") == 3L)
    assert(b(r, "pass"))
  }

  test("the javascript rule is case-insensitive and drops only its line") {
    val text = Seq(
      "the JavaScript framework wars continue unabated.",
      "this other sentence survives entirely on merit.",
      "a second surviving sentence backs it up nicely.",
      "and a third one closes out the page.").mkString("\n")
    val r = run(Seq(text))(0L)
    assert(l(r, "n_kept") == 3L)
    assert(l(r, "n_sentences") == 3L)
    assert(b(r, "pass"))
  }

  test("sentence floor counts KEPT lines only: dropped lines' sentences are invisible") {
    // three sentences' worth of punctuation, but every line fails the
    // five-word floor, so n_sentences is 0 and the page fails
    val text = "one two three four.\nfive six seven eight!\nnine ten eleven twelve?"
    val r = run(Seq(text))(0L)
    assert(l(r, "n_kept") == 0L)
    assert(l(r, "n_sentences") == 0L)
    assert(!b(r, "pass_sentences") && !b(r, "pass"))
  }

  test("multi-mark lines count every terminal mark: '...' is three sentence marks") {
    // one kept line carrying an ellipsis plus the final period = 4
    // marks; the documented closed-form approximation counts each
    val text = "the pause draws out like this... then it simply ends."
    val r = run(Seq(text))(0L)
    assert(l(r, "n_kept") == 1L)
    assert(l(r, "n_sentences") == 4L)
    assert(b(r, "pass_sentences"))
  }

  test("lorem ipsum and curly braces are PAGE rules, independent of kept lines") {
    val good = Seq(
      "a first wholly reasonable sentence stands here.",
      "a second wholly reasonable sentence follows it.",
      "a third wholly reasonable sentence finishes.").mkString("\n")
    val r1 = run(Seq(good + "\nLorem Ipsum dolor sit amet"))(0L)
    assert(b(r1, "has_lorem") && !b(r1, "pass_lorem") && !b(r1, "pass"))
    assert(b(r1, "pass_sentences")) // structure is otherwise fine
    val r2 = run(Seq(good + "\nfunction f() { return 1; }"))(0L)
    assert(b(r2, "has_brace") && !b(r2, "pass_brace") && !b(r2, "pass"))
  }

  test("short document (<40 words): empty-slice lines survive as bare terminators — hand-pinned row") {
    // The r10 gate red: DuckDB's array_to_string([]) is NULL (so the
    // un-COALESCEd oracle dropped the line via concat_ws) while Spark's
    // array_join('') keeps it. This pins the REQUIRED cross-engine
    // behavior as a hand-computed row, independent of any recompute
    // that shares Spark's semantics. For doc_id=0 with a 10-word text:
    //   line0 = words 1-8 + '.'            -> kept (8 words, '.')
    //   line1 = words 9-10 + ' javascript' + '...' (0%7==0) -> dropped
    //   line2 = EMPTY slice (%5 trunc)  + '?' -> bare '?', dropped (<5 words)
    //   line3 = EMPTY slice + '' term        -> '' line, MUST still count
    //   line4 = EMPTY slice + '.'            -> bare '.', dropped
    // plus the %11 lorem and %13 brace markers: n_lines MUST be 7.
    val s = spark
    import s.implicits._
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq((0L, ten)).toDF("doc_id", "text")
    val page = graft.operators.TextAnalysis.c4PageTable(df).collect()(0).getString(1)
    assert(page ==
      "w1 w2 w3 w4 w5 w6 w7 w8.\nw9 w10 javascript...\n?\n\n.\nlorem ipsum\n{")
    val r = graft.operators.TextAnalysis.c4Rules(
      graft.operators.TextAnalysis.c4PageTable(df)).collect()(0)
    assert(l(r, "n_lines") == 7L)
    assert(l(r, "n_kept") == 1L)
    assert(r.getDouble(r.fieldIndex("kept_ratio")) == 0.1429)
    assert(l(r, "n_sentences") == 1L)
    assert(b(r, "has_lorem") && b(r, "has_brace"))
    assert(!b(r, "pass_sentences") && !b(r, "pass"))
    // and the oracle side must carry the COALESCE guard for the same
    // empty-slice lines — assert textually since DuckDB can't run here
    val sql = graft.operators.TextAnalysis.C4PageSqlExpr
    assert(sql.contains("coalesce(array_to_string("),
      "C4PageSqlExpr must COALESCE empty-list array_to_string (NULL in DuckDB)")
  }

  test("gate corpus: flags agree with an independent page-construction + rules recompute") {
    val out = graft.SparkEntry.queries("t_c4_rules")(spark, sfDir).collect()
    val docs = graft.Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == docs.size)
    // independent Scala re-implementation of c4PageTable's re-lining
    def page(id: Long, raw: String): String = {
      val w = raw.split(" ", -1)
      def slice(start: Int, len: Int) =
        w.slice(start - 1, math.min(start - 1 + len, w.length)).mkString(" ")
      def term(i: Int) = (((id + i) % 4).toInt: @unchecked) match {
        case 0 => "."; case 1 => "..."; case 2 => "?"; case 3 => ""
      }
      val lines = (0 until 5).map { i =>
        val body =
          if (i == 2 && id % 5 == 0) slice(8 * i + 1, 3) else slice(8 * i + 1, 8)
        val js = if (i == 1 && id % 7 == 0) " javascript" else ""
        body + js + term(i)
      }
      lines.mkString("\n") +
        (if (id % 11 == 0) "\nlorem ipsum" else "") +
        (if (id % 13 == 0) "\n{" else "")
    }
    // the constructed pages must exercise both branches of every rule
    val passes = out.count(r => b(r, "pass"))
    assert(passes > 0 && passes < out.length,
      s"degenerate pass distribution: $passes of ${out.length}")
    out.foreach { r =>
      val text = page(r.getLong(0), docs(r.getLong(0)))
      val lines = text.split("\n", -1)
      val kept = lines.filter { ln =>
        (ln.endsWith(".") || ln.endsWith("!") || ln.endsWith("?") || ln.endsWith("\"")) &&
          ln.split(" ", -1).length >= 5 &&
          !ln.toLowerCase.contains("javascript")
      }
      val sentences = kept.map(_.count(c => c == '.' || c == '!' || c == '?')).sum
      assert(l(r, "n_lines") == lines.length.toLong, s"doc ${r.getLong(0)} n_lines")
      assert(l(r, "n_kept") == kept.length.toLong, s"doc ${r.getLong(0)} n_kept")
      assert(l(r, "n_sentences") == sentences.toLong, s"doc ${r.getLong(0)} n_sentences")
      assert(b(r, "pass") ==
        (sentences >= 3 && !text.toLowerCase.contains("lorem ipsum") && !text.contains("{")),
        s"doc ${r.getLong(0)} pass")
    }
  }
}
