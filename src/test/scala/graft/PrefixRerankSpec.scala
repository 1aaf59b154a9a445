package graft

import org.apache.spark.sql.functions._

/** s_prefix_rerank_topk against an independent driver-side
  * recomputation: stage-1 candidates must be the true prefix-dot top-20,
  * stage-2 must be the exact full-width cosine rerank of exactly that
  * candidate set. (No recall floor on purpose — see the operator's
  * scaladoc: recall is a property of front-loaded embeddings, which the
  * synthetic testdata is not.)
  */
class PrefixRerankSpec extends SparkSpec {

  test("two-stage result equals a brute-force JVM recomputation") {
    val vecs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap
    def dot(a: Array[Float], b: Array[Float], n: Int): Double = {
      var s = 0.0; var i = 0
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b, 64) / (math.sqrt(dot(a, a, 64)) * math.sqrt(dot(b, b, 64)))
    val expected = vecs.keys.filter(_ < 10).toSeq.sorted.flatMap { q =>
      val qv = vecs(q)
      val cands = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, dot(qv, v, 16)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(20)
      cands.map { case (id, _) => (id, cos(qv, vecs(id))) }
        .sortBy { case (id, c) => (-c, id) }
        .take(5)
        .zipWithIndex
        .map { case ((id, c), i) => (q, id, c, i + 1) }
    }
    val got = SparkEntry.queries("s_prefix_rerank_topk")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(got === expected)
  }
}
