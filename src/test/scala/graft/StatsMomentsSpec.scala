package graft

import org.apache.spark.sql.functions._

/** q_stats_moments computes variance/stddev/correlation from exact
  * decimal power sums (for cross-engine bit-reproducibility); this spec
  * pins those derivations against Spark's built-in streaming aggregates,
  * which are the textbook definitions.
  */
class StatsMomentsSpec extends SparkSpec {

  test("power-sum moments agree with built-in var_samp/stddev/corr") {
    val got = SparkEntry.queries("q_stats_moments")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val ref = Tables(spark, sfDir).lineitem
      .groupBy("l_returnflag")
      .agg(avg("l_quantity"), var_samp("l_quantity"),
           stddev_samp("l_extendedprice"),
           corr(col("l_quantity"), col("l_extendedprice")))
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet === ref.keySet)
    got.foreach { case (flag, (mean, varQty, stdPrice, corrQp)) =>
      val (rMean, rVar, rStd, rCorr) = ref(flag)
      assert(math.abs(mean - rMean) < 1e-3, s"mean($flag)")
      // the built-ins stream in partition order (fp drift), so compare
      // loosely relative to magnitude
      assert(math.abs(varQty - rVar) / rVar < 1e-6, s"var($flag)")
      assert(math.abs(stdPrice - rStd) / rStd < 1e-6, s"std($flag)")
      assert(math.abs(corrQp - rCorr) < 1e-4, s"corr($flag)")
    }
  }

  test("correlation stays in [-1, 1] and variance is non-negative") {
    SparkEntry.queries("q_stats_moments")(spark, sfDir).collect().foreach { r =>
      assert(r.getDouble(3) >= 0.0)
      assert(math.abs(r.getDouble(5)) <= 1.0)
    }
  }
}
