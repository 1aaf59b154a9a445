package graft

/** Recall floor for the REGISTRY IVF entries at their own production
  * configs (AnnIndexSpec measures recall at its own fixed config; this
  * guards the entries' k-scaling choices against silent quality
  * regressions — e.g. bucket sizing that drops boundary neighbors).
  */
class IvfEntryRecallSpec extends SparkSpec {

  test("s_ivf_topk entry recall vs brute force stays above the floor") {
    def pairs(name: String) = SparkEntry.queries(name)(spark, sfDir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs("s_cosine_topk")
    val ivf = pairs("s_ivf_topk")
    assert(brute.nonEmpty)
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.7, s"ivf top-k recall $recall < 0.7")
  }

  test("d_embedding_neardup_ivf keeps the coarse-bucket recall on the anchor pairs") {
    // the oracled bounded-probe operator is the exactness anchor: every
    // pair it finds among vec_id < 200 must also surface from the
    // IVF-bucketed corpus-scale variant (coarse buckets, nprobe=2)
    def pairs(name: String) = SparkEntry.queries(name)(spark, sfDir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val anchor = pairs("d_embedding_neardup")
    val ivf = pairs("d_embedding_neardup_ivf")
    assert(anchor.nonEmpty)
    val recall = ivf.intersect(anchor).size.toDouble / anchor.size
    assert(recall >= 0.6, s"near-dup ivf recall $recall < 0.6 on anchor pairs")
  }
}
