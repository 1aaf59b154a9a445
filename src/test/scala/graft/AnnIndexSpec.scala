package graft

import graft.api.AnnIndex
import org.apache.spark.sql.functions._

class AnnIndexSpec extends SparkSpec {

  private lazy val corpus =
    Tables(spark, sfDir).embeddings.select(col("vec_id"), col("embedding")).cache()

  test("kmeans produces k centroids of the right dimension and improves inertia") {
    def inertia(centroids: org.apache.spark.sql.DataFrame): Double =
      AnnIndex.assign(corpus, centroids).join(corpus, "vec_id")
        .join(broadcast(centroids), "cluster")
        .withColumn("d", expr(
          "aggregate(zip_with(embedding, centroid, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), CAST(0 AS DOUBLE), (s, v) -> s + v)"))
        .agg(sum("d")).collect().head.getDouble(0)

    val k0 = AnnIndex.kmeans(corpus, k = 8, iters = 0) // init = first 8 vectors
    val k3 = AnnIndex.kmeans(corpus, k = 8, iters = 3)
    val rows = k3.collect()
    assert(rows.length == 8)
    assert(rows.forall(_.getSeq[Float](1).length == 64))
    assert(inertia(k3) < inertia(k0))
  }

  test("every corpus vector lands in exactly one bucket") {
    val centroids = AnnIndex.kmeans(corpus, 8, 2)
    val assigned = AnnIndex.assign(corpus, centroids)
    assert(assigned.count() == corpus.count())
    assert(assigned.select("vec_id").distinct().count() == corpus.count())
  }

  test("ivf search recall against brute force is substantial at nprobe=3/8") {
    val centroids = AnnIndex.kmeans(corpus, 8, 3)
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val ivf = AnnIndex.search(corpus, centroids, queries, nprobe = 3, topK = 5)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SparkEntry.queries("s_cosine_topk")(spark, sfDir)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(ivf.size == 50)
    // random 64-dim embeddings have no cluster structure, the worst case
    // for IVF; still must beat the 3/8 random-bucket floor
    assert(recall >= 0.3, s"recall=$recall")
  }

  test("bucketed near-dup: candidates stay sub-quadratic, no false positives, recall measured") {
    val n = corpus.count()
    val tau = 0.4
    val centroids = AnnIndex.kmeans(corpus, 8, 3)
    val found = AnnIndex.nearDupPairs(corpus, centroids, tau, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exact verification: everything reported truly clears tau
    assert(found.forall(_._3 >= tau))
    // the brute-force truth set (small corpus; the thing we must not do at scale)
    val brute = corpus.as("a")
      .join(corpus.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", round(expr("cosine_similarity(a.embedding, b.embedding)"), 4))
      .filter(col("cos") >= tau)
      .select(col("a.vec_id"), col("b.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val foundPairs = found.map(t => (t._1, t._2)).toSet
    assert(foundPairs.subsetOf(brute))
    // candidate generation must examine far fewer than n² pairs
    val cand = AnnIndex.assignMulti(corpus, centroids, 2).as("a")
      .join(AnnIndex.assignMulti(corpus, centroids, 2).as("b"),
            col("a.cluster") === col("b.cluster") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id")).distinct().count()
    assert(cand < n * n / 4, s"candidates=$cand not sub-quadratic for n=$n")
    if (brute.nonEmpty) {
      val recall = (foundPairs & brute).size.toDouble / brute.size
      // random embeddings = worst case for bucketing; multi-probe must
      // still clear a non-trivial floor
      assert(recall >= 0.2, s"recall=$recall (found ${foundPairs.size} of ${brute.size})")
    }
  }
}
