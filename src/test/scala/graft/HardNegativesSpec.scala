package graft

/** s_hard_negatives — cross-label top-k mining. Brute-force JVM
  * recomputation of the exact ranking (same sequential-fold cosine as
  * the native expression), plus the structural guarantees: no negative
  * shares its query's label, no self-pairs, ranks dense from 1.
  */
class HardNegativesSpec extends SparkSpec {

  private def rows = Tables(spark, sfDir).embeddings
    .collect()
    .map(r => (r.getAs[Long]("vec_id"),
      r.getAs[scala.collection.Seq[Float]]("embedding").toArray,
      r.getAs[Int]("label")))

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    def dot(x: Array[Float], y: Array[Float]) =
      (0 until x.length).foldLeft(0.0)((acc, i) => acc + x(i).toDouble * y(i).toDouble)
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  test("exact cross-label top-5 per query (brute-checked)") {
    val all = rows
    val expected = all.filter(_._1 < 10).flatMap { case (q, qv, ql) =>
      all.filter(c => c._1 != q && c._3 != ql)
        .map(c => (c._1, cos(qv, c._2)))
        .sortBy { case (v, s) => (-s, v) }
        .take(5).zipWithIndex
        .map { case ((v, s), i) => (q, v, i + 1, s) }
    }.toSet
    val got = SparkEntry.queries("s_hard_negatives")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3), r.getDouble(2))).toSet
    assert(got.nonEmpty)
    // ranking identity is exact; the score is the same sequential fold,
    // compared at 1e-12 to stay honest about engine-internal reordering
    assert(got.map(t => (t._1, t._2, t._3)) == expected.map(t => (t._1, t._2, t._3)))
    val expScore = expected.map(t => ((t._1, t._2), t._4)).toMap
    got.foreach { case (q, v, _, s) =>
      assert(math.abs(s - expScore((q, v))) < 1e-12, s"($q,$v)")
    }
  }

  test("no negative shares its query's label; no self-pairs; ranks dense") {
    val labels = rows.map(t => t._1 -> t._3).toMap
    val got = SparkEntry.queries("s_hard_negatives")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(got.nonEmpty)
    got.foreach { case (q, v, _) =>
      assert(q != v)
      assert(labels(q) != labels(v), s"query $q and negative $v share a label")
    }
    got.groupBy(_._1).foreach { case (q, hits) =>
      assert(hits.map(_._3).sorted.toSeq == (1 to hits.length), s"ranks not dense for $q")
    }
  }
}
