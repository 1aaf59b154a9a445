package graft

import org.apache.spark.sql.functions._

/** t_wimbd_stats — the WIMBD-style corpus profile. Hand-computes every
  * output field on a crafted 4-doc corpus (known duplicate, known top
  * term, known length distribution) and pins the gate-corpus
  * invariants the profile exists to report.
  */
class WimbdStatsSpec extends SparkSpec {

  import spark.implicits._

  test("every field hand-checked on a crafted corpus") {
    val docs = Seq(
      (0L, "a a b"),     // 3 tokens
      (1L, "a a b"),     // exact duplicate of doc 0
      (2L, "b c"),       // 2 tokens
      (3L, "a d e f"))   // 4 tokens
      .toDF("doc_id", "text")
    // the SAME function the registry entry calls — no spec-side copy
    val r = graft.operators.TextAnalysis.wimbdStats(docs).head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 3)  // 4 docs, 1 exact dup
    assert(r.getLong(2) == 12)                       // 3+3+2+4 tokens
    assert(r.getDouble(3) == 3.0)                    // mean
    assert(r.getDouble(4) == 3.0)                    // p50 of 2,3,3,4
    assert(r.getDouble(5) == 3.7)                    // p90: 3 + 0.7*(4-3)
    assert(r.getLong(6) == 6)                        // vocab a b c d e f
    assert(r.getString(7) == "a" && r.getDouble(8) == 0.4167) // 5/12
  }

  test("gate-corpus invariants: counts consistent, share in (0,1], percentiles ordered") {
    val r = SparkEntry.queries("t_wimbd_stats")(spark, sfDir).head()
    assert(r.getLong(0) >= r.getLong(1), "distinct texts cannot exceed docs")
    assert(r.getLong(2) >= r.getLong(6), "tokens >= vocabulary")
    assert(r.getDouble(4) <= r.getDouble(5), "p50 <= p90")
    assert(r.getDouble(8) > 0.0 && r.getDouble(8) <= 1.0)
  }
}
