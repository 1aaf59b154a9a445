package graft

import graft.api.PqIndex
import org.apache.spark.sql.functions._

class PqIndexSpec extends SparkSpec {

  private val (dim, m, ksub) = (64, 16, 16)

  private lazy val corpus =
    Tables(spark, sfDir).embeddings.select(col("vec_id"), col("embedding")).cache()
  private lazy val cb = PqIndex.codebooks(corpus, dim, m, ksub, iters = 3).cache()
  private lazy val codes = PqIndex.encode(corpus, cb, dim, m).cache()

  test("codebooks: one per subspace, centroids of subvector width, codes in range") {
    val rows = cb.collect()
    // empty clusters may die during Lloyd iterations but every subspace
    // must keep at least 2 live codes, and never more than ksub
    val bySub = rows.groupBy(_.getInt(0))
    assert(bySub.keySet == (0 until m).toSet)
    assert(bySub.values.forall(g => g.length >= 2 && g.length <= ksub))
    assert(rows.forall(_.getSeq[Float](2).length == dim / m))
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < ksub))
  }

  test("encode: every vector gets exactly m in-range codes") {
    val rows = codes.collect()
    assert(rows.length == corpus.count())
    assert(rows.forall(_.getSeq[Int](1).length == m))
    assert(rows.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < ksub)))
  }

  test("packCodes realizes the 32x compression as actual bytes, losslessly") {
    val packed = PqIndex.packCodes(codes, ksub).collect()
    // the REAL data property, not constants arithmetic: every stored
    // vector is m/2 literal bytes vs dim*4 bytes of float32 (= 32x)
    assert(packed.length == corpus.count())
    assert(packed.forall(_.getAs[Array[Byte]]("packed").length == m / 2))
    assert((m / 2) * 32 <= dim * 4)
    // lossless: unpacking the nibbles reproduces the codes exactly
    val byId = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    packed.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("packed")
      val nibbles = bytes.flatMap(b => Seq((b >> 4) & 0xf, b & 0xf)).toSeq
      assert(nibbles == byId(r.getLong(0)), s"vec ${r.getLong(0)}")
    }
  }

  test("encode is deterministic across runs") {
    val again = PqIndex.encode(corpus, cb, dim, m)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val first = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(again == first)
  }

  test("adc search recall vs exact L2 top-k clears the PQ floor") {
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val topK = 10
    val pq = PqIndex.adcSearch(codes, cb, queries, dim, m, topK)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("d", expr("sq_distance(embedding, q_vec)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(asc("d"), asc("vec_id"))))
      .filter(col("rn") <= topK)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq.size == 10 * topK)
    val recall = (pq & brute).size.toDouble / brute.size
    // random 64-dim embeddings are PQ's worst case (no subspace
    // structure to exploit); the floor proves ADC ranks far above
    // chance (random top-10 of 500 would land ~0.02)
    assert(recall >= 0.3, s"recall=$recall")
  }

  test("ivf-pq composition: pruned scoring still clears a recall floor") {
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val centroids = graft.api.AnnIndex.kmeans(corpus, k = 8, iters = 3)
    val topK = 10
    val got = PqIndex.ivfpqSearch(corpus, centroids, cb, queries, dim, m,
      nprobe = 3, topK = topK)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("d", expr("sq_distance(embedding, q_vec)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(asc("d"), asc("vec_id"))))
      .filter(col("rn") <= topK)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.size == 10 * topK)
    // two stacked approximations (IVF prune ~0.3+ floor alone, PQ rank
    // ~0.35+ alone on this structureless corpus) — the composition must
    // still beat the random floor (~0.02) by an order of magnitude
    val recall = (got & brute).size.toDouble / brute.size
    assert(recall >= 0.15, s"recall=$recall")
  }

  test("adc distances approximate true squared L2 (relative error bounded)") {
    val queries = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val approx = PqIndex.adcSearch(codes, cb, queries, dim, m, topK = 5)
      .join(corpus, "vec_id")
      .join(queries, "q_id")
      .withColumn("true_d", expr("sq_distance(embedding, q_vec)"))
      .select("adist", "true_d").collect()
    // quantization error shifts distances but must stay the same order
    // of magnitude — mean |adist - true_d| / true_d bounded
    val relErrs = approx.map(r => math.abs(r.getDouble(0) - r.getDouble(1)) / r.getDouble(1))
    assert(relErrs.nonEmpty)
    assert(relErrs.sum / relErrs.length <= 0.5,
      s"mean rel err ${relErrs.sum / relErrs.length}")
  }
}
