package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** s_kmeans_clusters — distributed Lloyd k-means with exact cross-engine
  * arithmetic. The load-bearing pin is full equality (assignments AND
  * 6dp distances) against an independent JVM recomputation that
  * replicates the fixed-point centroid mean (sum of FLOOR(x·2^62) as an
  * exact big integer) and the sequential-fold squared L2 — if the Spark
  * plan's summation order ever leaked into the result, this breaks.
  */
class KmeansClustersSpec extends SparkSpec {

  private val P62 = 4611686018427387904.0 // 2^62
  private val K = 8
  private val Iters = 3

  /** JVM reference: same seeds, same fixed-point means, same folds. */
  private def brute(vecs: Seq[(Long, Array[Float])]): Map[Long, (Int, Double)] = {
    def distSq(e: Array[Float], c: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < e.length) { val d = e(i).toDouble - c(i); acc += d * d; i += 1 }
      acc
    }
    var cents: Seq[(Int, Array[Double])] = vecs.sortBy(_._1).take(K)
      .map(_._2.map(_.toDouble)).zipWithIndex.map { case (c, i) => (i, c) }
    def assign(): Map[Long, (Int, Double)] = vecs.map { case (id, e) =>
      val best = cents.map { case (cid, c) => (distSq(e, c), cid) }.min
      id -> (best._2, best._1)
    }.toMap
    for (_ <- 1 until Iters) {
      val a = assign()
      cents = a.toSeq.map { case (id, (cid, _)) => (cid, id) }
        .groupBy(_._1).toSeq.sortBy(_._1).map { case (cid, members) =>
          val es = members.map(m => vecs.find(_._1 == m._2).get._2)
          val c = Array.tabulate(es.head.length) { d =>
            val sx = es.map(e => BigInt(math.floor(e(d).toDouble * P62).toLong)).sum
            sx.toDouble / es.length / P62
          }
          (cid, c)
        }
    }
    assign()
  }

  test("equals a brute-force JVM Lloyd recomputation (assignments + distances)") {
    val vecs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Float]](1).toArray)).toSeq
    val expected = brute(vecs)
    val got = Similarity.kmeansClusters(
        Tables(spark, sfDir).embeddings.select(col("vec_id"), col("embedding")))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2)))).toMap
    assert(got.keySet == vecs.map(_._1).toSet)
    for ((id, (cid, dist)) <- expected) {
      assert(got(id)._1 == cid, s"vec $id cluster: got ${got(id)._1}, expected $cid")
      assert(got(id)._2 ==
        BigDecimal.valueOf(dist).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"vec $id dist")
    }
  }

  test("partition structure: every vector once, ids in [0, k), non-degenerate") {
    val rows = Similarity.kmeansClusters(
        Tables(spark, sfDir).embeddings.select(col("vec_id"), col("embedding")))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.forall { case (_, c) => c >= 0 && c < K })
    // more than one cluster survives on the gate corpus
    assert(rows.map(_._2).distinct.length > 1)
  }

  test("cluster balance: exact md5-priority top-32 per cluster (brute-checked)") {
    def md5u(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.take(13), 16)
    }
    val assigned = SparkEntry.queries("s_kmeans_clusters")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val expected = assigned.groupBy(_._2).toSeq.flatMap { case (cid, members) =>
      members.map(_._1).sortBy(v => (md5u(v), v)).take(32)
        .zipWithIndex.map { case (v, i) => (v, cid, i + 1) }
    }.toSet
    val got = SparkEntry.queries("s_cluster_balance")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got.nonEmpty)
    assert(got == expected)
    got.groupBy(_._2).foreach { case (_, hits) => assert(hits.size <= 32) }
  }

  test("deterministic across runs") {
    def run() = Similarity.kmeansClusters(
        Tables(spark, sfDir).embeddings.select(col("vec_id"), col("embedding")))
      .collect().map(_.toString).sorted.toSeq
    assert(run() == run())
  }
}
