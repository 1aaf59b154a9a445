package graft

import org.apache.spark.sql.Row

/** MMR rerank (s_mmr_rerank): diversity-over-redundancy pinned on
  * crafted vectors — a duplicate of the best hit loses to an
  * orthogonal hit at diversity-leaning λ, negative similarities are
  * NOT clamped in the penalty (they help a candidate), ties break on
  * vec_id, and corpus-level invariants hold on the gate data.
  */
class MmrRerankSpec extends SparkSpec {

  private def frame(vecs: Seq[(Long, Array[Float])]) = {
    val s = spark
    import s.implicits._
    vecs.toDF("vec_id", "embedding")
  }

  private def unit(axis: Int): Array[Float] = {
    val a = new Array[Float](64); a(axis) = 1f; a
  }

  private def run(vecs: Seq[(Long, Array[Float])], k: Int, lambda: Double): Seq[Row] =
    graft.operators.Similarity
      .mmrRerank(frame(vecs), nQueries = 1, poolK = 8, k = k, lambda = lambda)
      .orderBy("q_id", "mmr_rank").collect().toSeq

  private def l(r: Row, f: String): Long = r.getLong(r.fieldIndex(f))
  private def d(r: Row, f: String): Double = r.getDouble(r.fieldIndex(f))

  test("a duplicate of the best hit loses rank 2 to an orthogonal hit at diversity-leaning lambda") {
    val diag = { val a = new Array[Float](64); a(0) = 1f; a(1) = 1f; a }
    val out = run(Seq(
      0L -> unit(0),  // the query
      1L -> unit(0),  // rel 1.0
      2L -> unit(0),  // exact duplicate of v1: rel 1.0, sim(v2,v1) = 1
      3L -> diag,     // rel ~0.707, sim to v1 ~0.707
      4L -> unit(1)), // rel 0, orthogonal to everything selected
      k = 3, lambda = 0.3)
    assert(out.map(r => l(r, "vec_id")) == Seq(1L, 4L, 3L))
    // rank-2 scores at lambda 0.3: dup v2 = 0.3*1 - 0.7*1 = -0.4;
    // diag v3 = 0.3*.707 - 0.7*.707 < 0; orthogonal v4 = 0 - 0 = 0 wins
    assert(d(out(1), "mmr_score") == 0.0 && l(out(1), "vec_id") == 4L)
  }

  test("at relevance-leaning lambda the duplicate DOES win rank 2 — lambda steers") {
    val out = run(Seq(
      0L -> unit(0), 1L -> unit(0), 2L -> unit(0), 4L -> unit(1)),
      k = 2, lambda = 0.7)
    // 0.7*1 - 0.3*1 = 0.4 beats the orthogonal 0.0
    assert(out.map(r => l(r, "vec_id")) == Seq(1L, 2L))
    assert(math.abs(d(out(1), "mmr_score") - 0.4) < 1e-12)
  }

  test("negative similarity to the selected set is a BONUS, not clamped to zero") {
    val anti = { val a = new Array[Float](64); a(0) = -0.5f; a(1) = 0.8660254f; a }
    val out = run(Seq(
      0L -> unit(0),
      1L -> unit(0), // rank 1
      2L -> anti,    // rel -0.5, sim to v1 = -0.5: mmr = 0.3*(-.5) - 0.7*(-.5) = +0.2
      3L -> unit(1)),// rel 0, sim 0: mmr = 0
      k = 2, lambda = 0.3)
    assert(out.map(r => l(r, "vec_id")) == Seq(1L, 2L),
      "the anti-correlated candidate's negative penalty must help it")
    assert(d(out(1), "mmr_score") > 0.15)
  }

  test("relevance ties at rank 1 break on vec_id ascending") {
    val out = run(Seq(0L -> unit(0), 7L -> unit(0), 3L -> unit(0)), k = 1, lambda = 0.7)
    assert(out.map(r => l(r, "vec_id")) == Seq(3L))
  }

  test("gate corpus invariants: rank 1 is the relevance argmax, its score is exactly 0.7*rel") {
    val out = graft.SparkEntry.queries("s_mmr_rerank")(spark, sfDir).collect()
    val byQ = out.groupBy(r => l(r, "q_id"))
    assert(byQ.size == 5)
    for ((_, rows) <- byQ) {
      val sorted = rows.sortBy(r => r.getInt(r.fieldIndex("mmr_rank")))
      assert(sorted.map(r => l(r, "vec_id")).distinct.length == sorted.length)
      assert(d(sorted.head, "rel") == sorted.map(d(_, "rel")).max)
      assert(d(sorted.head, "mmr_score") == 0.7 * d(sorted.head, "rel"))
      // scores decline down the ranking is NOT guaranteed by MMR, but
      // rank-1 relevance dominating each later pick's relevance is
      assert(sorted.tail.forall(r => d(r, "rel") <= d(sorted.head, "rel")))
    }
  }
}
