package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** t_gopher_repetition — Gopher's A1.2 word-n-gram repetition battery.
  * Hand-computes the fractions on crafted documents, pins the
  * POSITION-MARKING semantics of the duplicate rules (overlapping
  * duplicate occurrences must not double-count — the fraction is
  * bounded by 1 where naive count×len is not), the deterministic
  * argmax tiebreak, and the threshold pass wiring.
  */
class GopherRepetitionSpec extends SparkSpec {

  import spark.implicits._

  private def score(texts: (Long, String)*) =
    TextAnalysis.gopherRepetition(texts.toSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("top-n-gram fractions hand-checked, ties break to the smallest gram") {
    val r = score((0L, "a b a b c"))(0L)
    assert(r.getLong(1) == 5 && r.getLong(2) == 5) // tokens, chars
    // top 2-gram "a b" occurs twice, 2 chars: 2*2/5
    assert(r.getDouble(r.fieldIndex("top2_frac")) == 0.8)
    // all 3-grams unique; smallest is "a b a" (3 chars): 1*3/5
    assert(r.getDouble(r.fieldIndex("top3_frac")) == 0.6)
    assert(r.getDouble(r.fieldIndex("dup5_frac")) == 0.0) // single 5-gram
  }

  test("duplicate rule marks POSITIONS: overlapping occurrences never double-count") {
    // "a"×7: the 5-gram occurs 3 times overlapping — marking covers all
    // 7 tokens exactly once (count×len would claim 15/7 > 1)
    val r7 = score((0L, "a a a a a a a"))(0L)
    assert(r7.getDouble(r7.fieldIndex("dup5_frac")) == 1.0)
    // two disjoint occurrences mark everything
    val r10 = score((1L, "x y z w v x y z w v"))(1L)
    assert(r10.getDouble(r10.fieldIndex("dup5_frac")) == 1.0)
    // ...but its 6-grams are all distinct
    assert(r10.getDouble(r10.fieldIndex("dup6_frac")) == 0.0)
    // partial coverage: dup 5-gram covers 10 of 11 tokens
    val r11 = score((2L, "x y z w v x y z w v q"))(2L)
    assert(r11.getDouble(r11.fieldIndex("dup5_frac")) == 0.9091)
  }

  test("pass wiring: thresholds on the rounded fraction, conjunction in `pass`") {
    val r = score((0L, "a b a b c"))(0L) // top2 0.8 > 0.20 -> fail
    assert(!r.getBoolean(r.fieldIndex("pass_top2")))
    assert(!r.getBoolean(r.fieldIndex("pass")))
    assert(r.getBoolean(r.fieldIndex("pass_dup5"))) // 0.0 <= 0.15
    // the gate corpus must exercise both pass outcomes
    val gate = TextAnalysis.gopherRepetition(Tables(spark, sfDir).documents)
    val n = gate.count()
    val p = gate.filter(col("pass")).count()
    assert(p > 0 && p < n, s"degenerate pass split: $p/$n")
  }
}
