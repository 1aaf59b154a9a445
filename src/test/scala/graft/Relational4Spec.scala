package graft

import org.apache.spark.sql.functions._

/** Relational4 rows-only entries still carry correctness claims: the
  * HLL rollup's merge identity (union of day sketches ≡ one sketch of
  * everything) and its error vs the exact distinct count.
  */
class Relational4Spec extends SparkSpec {

  test("q_hll_rollup merged estimate equals the whole-table sketch estimate") {
    val merged = SparkEntry.queries("q_hll_rollup")(spark, sfDir)
      .collect().head.getLong(0)
    val direct = Tables(spark, sfDir).events
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .collect().head.getLong(0)
    assert(merged === direct)
  }

  test("q_hll_rollup estimate within 5% of the exact distinct user count") {
    val est = SparkEntry.queries("q_hll_rollup")(spark, sfDir)
      .collect().head.getLong(0)
    val exact = Tables(spark, sfDir).events
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(exact > 0)
    assert(math.abs(est - exact).toDouble / exact <= 0.05, s"$est vs $exact")
  }

  test("q_quantile_sketch_rollup estimates land within one bin width of exact quantiles") {
    import org.apache.spark.sql.functions._
    val row = SparkEntry.queries("q_quantile_sketch_rollup")(spark, sfDir)
      .collect().head
    val exact = Tables(spark, sfDir).events.agg(
      expr("percentile(value, 0.5)"), expr("percentile(value, 0.9)"),
      expr("percentile(value, 0.99)")).collect().head
    // the estimate is the upper edge of the crossing bin; the exact
    // interpolated quantile lies in (or at the edge of) that bin —
    // error bounded by the 0.25 bin width (plus the interpolation
    // epsilon at the boundary)
    Seq(0, 1, 2).foreach { i =>
      val err = math.abs(row.getDouble(i) - exact.getDouble(i))
      assert(err <= 0.5, s"probe $i: est=${row.getDouble(i)} exact=${exact.getDouble(i)}")
    }
    assert(row.getLong(3) == Tables(spark, sfDir).events.count())
  }

  test("q_max_by picks the same suppliers as a window-based recomputation") {
    import org.apache.spark.sql.expressions.Window
    val sup = Tables(spark, sfDir).supplier
    val key = expr("CAST(round(s_acctbal * 100) AS BIGINT) * 1000000000000 + s_suppkey")
    val w = Window.partitionBy("s_nationkey").orderBy(col("k").desc)
    val expectTop = sup.withColumn("k", key)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("s_nationkey"), col("s_name"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("q_max_by")(spark, sfDir)
      .select("s_nationkey", "richest")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got === expectTop)
  }
}
