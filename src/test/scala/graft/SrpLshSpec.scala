package graft

import graft.api.SrpLsh
import org.apache.spark.sql.functions._

/** SRP-LSH: signature determinism, the angle-collision property, and
  * search recall vs the brute-force baseline.
  */
class SrpLshSpec extends SparkSpec {

  private def corpus = Tables(spark, sfDir).embeddings
    .select(col("vec_id"), col("embedding"))

  test("dot_product native expression registered and exact") {
    val r = spark.sql(
      """SELECT dot_product(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)),
        |                   array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 11.0)
  }

  test("signature build is a pure projection — no exchange, no explode") {
    val p = SrpLsh.signatures(corpus, "embedding", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Generate"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("wide signatures (nbits > 64) build valid per-band values") {
    // corpus-adaptive sizing can push nBands×bandBits past 64 bits; the
    // bands must come from direct per-band construction, never packed
    // through one long (wrapped shifts would alias hyperplanes)
    val wide = SrpLsh.bandedSignatures(corpus.limit(100), "embedding", 64,
      nbits = 120, bandBits = 15)
    val rows = wide.collect()
    assert(rows.map(_.getInt(1)).distinct.sorted.toSeq == (0 until 8))
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) < (1L << 15)))
    // distinct vectors disagree on at least one wide band
    val byVec = rows.groupBy(_.getLong(0)).view.mapValues(
      _.map(r => (r.getInt(1), r.getLong(2))).toSet).toMap
    val sigs = byVec.values.toSeq
    assert(sigs.distinct.size > 1)
    // and the one-long signature path refuses nbits it cannot hold
    intercept[IllegalArgumentException] {
      SrpLsh.signatures(corpus, "embedding", 64, 120)
    }
  }

  test("signatures are deterministic across runs") {
    def sig() = SrpLsh.signatures(corpus, "embedding", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = sig(); val b = sig()
    assert(a == b && a.nonEmpty)
    // buckets spread (not all vectors in one bucket)
    assert(a.values.toSet.size > 10)
  }

  test("identical vectors share every band; a vector collides with itself") {
    val doubled = corpus.limit(50)
      .union(corpus.limit(50).withColumn("vec_id", col("vec_id") + 100000))
    val bands = SrpLsh.bandedSignatures(doubled, "embedding", 64, 16, 4)
    val joined = bands.filter(col("vec_id") < 100000).as("a")
      .join(bands.filter(col("vec_id") >= 100000).as("b"),
            col("a.vec_id") + 100000 === col("b.vec_id") &&
              col("a.band_i") === col("b.band_i"))
      .filter(col("a.band_v") =!= col("b.band_v"))
    assert(joined.count() == 0)
  }

  test("near-dup pairs: anchor recall, no false positives, cap stays linear") {
    import spark.implicits._
    def pairSet(name: String) = SparkEntry.queries(name)(spark, sfDir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val anchor = pairSet("d_embedding_neardup")
    val srp = pairSet("d_embedding_neardup_srp")
    assert(anchor.nonEmpty)
    val recall = srp.intersect(anchor).size.toDouble / anchor.size
    assert(recall >= 0.5, s"srp near-dup recall $recall < 0.5 on anchor pairs")
    // every emitted pair really is >= tau (exact verification ran)
    val bad = SparkEntry.queries("d_embedding_neardup_srp")(spark, sfDir)
      .filter(col("cos") < 0.45).count()
    assert(bad == 0)
    // degenerate corpus: 500 copies of one vector -> capped to zero pairs
    val v = Seq.fill(64)(0.5f)
    val identical = (0 until 500).map(i => (i.toLong, v)).toDF("vec_id", "embedding")
    assert(graft.api.SrpLsh.nearDupPairs(identical, dim = 64, tau = 0.45).count() == 0L)
  }

  test("search recall vs brute force above the floor; ranks consistent") {
    def pairs(name: String) = SparkEntry.queries(name)(spark, sfDir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs("s_cosine_topk")
    val srp = pairs("s_srp_topk")
    assert(brute.nonEmpty)
    val recall = srp.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"srp top-k recall $recall < 0.5")
    // per-query ranks are 1..k without gaps
    val rn = SparkEntry.queries("s_srp_topk")(spark, sfDir)
      .groupBy("q_id").agg(count(lit(1)).as("n"), max("rn").as("mx"))
      .collect()
    assert(rn.forall(r => r.getLong(1) == r.getInt(2).toLong ||
                          r.getLong(1) == r.getLong(2)))
  }
}
