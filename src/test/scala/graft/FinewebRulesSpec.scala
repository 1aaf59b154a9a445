package graft

import org.apache.spark.sql.Row

/** FineWeb custom filter (t_fineweb_rules): every metric and rule flag
  * hand-computed on crafted documents — the punct-line floor (> 0.12),
  * the duplicated-line char cap (< 0.10, datatrove convention: count
  * occurrences AFTER the first), the short-line cap (< 0.67) — plus a
  * pinned short-document page-constructor row and an independent
  * Scala recompute over the gate corpus.
  */
class FinewebRulesSpec extends SparkSpec {

  private def run(texts: Seq[String]): Map[Long, Row] = {
    val s = spark
    import s.implicits._
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    graft.operators.TextAnalysis.finewebRules(df)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  private def b(r: Row, f: String): Boolean = r.getBoolean(r.fieldIndex(f))
  private def l(r: Row, f: String): Long = r.getLong(r.fieldIndex(f))
  private def d(r: Row, f: String): Double = r.getDouble(r.fieldIndex(f))

  test("a clean page passes all three rules — metrics hand-computed") {
    // 6 lines, 4 terminated, all >= 30 chars, all distinct
    val lines = Seq(
      "this first line runs long enough to pass the bar.",   // 50, punct
      "the second line also stretches well past thirty?",    // 49, punct
      "a third line without any terminal punctuation mark",   // 51
      "the fourth line closes with a proper full stop.",      // 47, punct
      "a fifth line that simply trails off into nothing",     // 49
      "and the sixth line asks its closing question mark?")   // 50, punct
    val r = run(Seq(lines.mkString("\n")))(0L)
    assert(l(r, "n_lines") == 6L)
    assert(d(r, "punct_ratio") == 0.6667)
    assert(d(r, "short_ratio") == 0.0)
    assert(l(r, "dup_chars") == 0L && d(r, "dup_char_ratio") == 0.0)
    for (f <- Seq("pass_punct", "pass_short", "pass_dup", "pass")) assert(b(r, f), f)
  }

  test("punct floor: a page of unterminated lines fails ONLY that rule") {
    val long = "this line is comfortably longer than thirty characters"
    val r = run(Seq(Seq(long + " a", long + " b", long + " c").mkString("\n")))(0L)
    assert(d(r, "punct_ratio") == 0.0 && !b(r, "pass_punct") && !b(r, "pass"))
    assert(b(r, "pass_short") && b(r, "pass_dup"))
  }

  test("duplicated-line chars: datatrove convention counts occurrences AFTER the first") {
    // "dup..." (40 chars) x3 and two distinct 40-char lines: dup_chars
    // = 2*40 over 5*40 total = 0.4 >= 0.1 -> fail dup only
    val dup = "duplicate line padded out to forty chars.."
    assert(dup.length == 42)
    val a = "a first distinct line padded to forty c..."
    val z = "z final distinct line padded to forty c..."
    assert(a.length == 42 && z.length == 42)
    val r = run(Seq(Seq(dup, a, dup, z, dup).mkString("\n")))(0L)
    assert(l(r, "dup_chars") == 84L) // 2 repeats x 42
    assert(l(r, "line_chars") == 210L)
    assert(d(r, "dup_char_ratio") == 0.4)
    assert(!b(r, "pass_dup") && !b(r, "pass"))
    assert(b(r, "pass_punct") && b(r, "pass_short"))
  }

  test("short-line cap: >= 0.67 short lines fails; a minority of short lines does not") {
    val long = "a line that is decisively longer than the thirty chars."
    val short = "tiny line."
    // 3 of 4 short = 0.75 -> fail
    val r1 = run(Seq(Seq(short, short + "!", long, short + "?").mkString("\n")))(0L)
    assert(d(r1, "short_ratio") == 0.75 && !b(r1, "pass_short") && !b(r1, "pass"))
    // 1 of 4 short = 0.25 -> pass (and distinct lines, all terminated)
    val r2 = run(Seq(Seq(long, long.dropRight(1) + "!", long.dropRight(1) + "?", short).mkString("\n")))(0L)
    assert(d(r2, "short_ratio") == 0.25 && b(r2, "pass_short") && b(r2, "pass"))
  }

  test("page constructor, short document: all three fail arms fire at doc_id 0 — hand-pinned") {
    // doc_id 0 hits every modulus: %10 (no terminators), %9 (all lines
    // two words), %3 (line 0 duplicated). Line i always slices from
    // word 6i+1, so with a 10-word text lines 2-5 are EMPTY slices and
    // must survive as '' lines (the r10 c4 cross-engine lesson,
    // COALESCEd in FwPageSqlExpr). Page: w1 w2 / w7 w8 / '' x4 / dup.
    val s = spark
    import s.implicits._
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq((0L, ten)).toDF("doc_id", "text")
    val page = graft.operators.TextAnalysis.fwPageTable(df).collect()(0).getString(1)
    assert(page == "w1 w2\nw7 w8\n\n\n\n\nw1 w2")
    val r = graft.operators.TextAnalysis.finewebRules(
      graft.operators.TextAnalysis.fwPageTable(df)).collect()(0)
    assert(l(r, "n_lines") == 7L)
    assert(d(r, "punct_ratio") == 0.0 && !b(r, "pass_punct"))
    assert(d(r, "short_ratio") == 1.0 && !b(r, "pass_short"))
    // sorted lines: '' x4 (dups contribute 0 chars), 'w1 w2' x2, 'w7 w8'
    assert(l(r, "dup_chars") == 5L && l(r, "line_chars") == 15L)
    assert(d(r, "dup_char_ratio") == 0.3333 && !b(r, "pass_dup"))
    assert(!b(r, "pass"))
    // oracle twin must carry the empty-slice COALESCE guard
    assert(graft.operators.TextAnalysis.FwPageSqlExpr
      .contains("coalesce(array_to_string("))
  }

  test("gate corpus: flags agree with an independent page-construction + rules recompute") {
    val out = graft.SparkEntry.queries("t_fineweb_rules")(spark, sfDir).collect()
    val docs = graft.Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == docs.size)
    def page(id: Long, raw: String): String = {
      val w = raw.split(" ", -1)
      def slice(start: Int, len: Int) =
        w.slice(start - 1, math.min(start - 1 + len, w.length)).mkString(" ")
      def term(i: Int): String =
        if (id % 10 == 0) ""
        else ((id + i) % 3).toInt match { case 0 => "."; case 1 => "?"; case _ => "" }
      def len(i: Int): Int =
        if (id % 9 == 0) 2 else if (i == 4 && id % 4 == 0) 2 else 6
      def line(i: Int) = slice(6 * i + 1, len(i)) + term(i)
      (0 until 6).map(line).mkString("\n") +
        (if (id % 3 == 0) "\n" + line(0) else "")
    }
    val passes = out.count(r => b(r, "pass"))
    assert(passes > 0 && passes < out.length,
      s"degenerate pass distribution: $passes of ${out.length}")
    out.foreach { r =>
      val lines = page(r.getLong(0), docs(r.getLong(0))).split("\n", -1)
      val nPunct = lines.count(ln => ln.nonEmpty && ".!?\"".contains(ln.last))
      val nShort = lines.count(_.length < 30)
      val dupChars = lines.sorted.sliding(2)
        .collect { case Array(a, c) if a == c => c.length.toLong }.sum
      val total = lines.map(_.length.toLong).sum
      assert(l(r, "n_lines") == lines.length.toLong, s"doc ${r.getLong(0)} n_lines")
      assert(b(r, "pass_punct") == (nPunct.toDouble / lines.length > 0.12), s"doc ${r.getLong(0)} punct")
      assert(b(r, "pass_short") == (nShort.toDouble / lines.length < 0.67), s"doc ${r.getLong(0)} short")
      assert(b(r, "pass_dup") == (dupChars.toDouble / math.max(total, 1L) < 0.1), s"doc ${r.getLong(0)} dup")
      assert(b(r, "pass") == (b(r, "pass_punct") && b(r, "pass_short") && b(r, "pass_dup")),
        s"doc ${r.getLong(0)} pass")
    }
  }
}
