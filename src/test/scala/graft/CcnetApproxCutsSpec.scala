package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** The conf-selectable at-scale arm of t_ccnet_buckets
  * (spark.graft.ccnet.approxCuts): tercile cuts from a bounded
  * approx_percentile GK sketch instead of the exact `percentile`,
  * whose aggregation state buffers every per-doc surprisal. Pins that
  * the arm is actually selected by the conf, that the cut values agree
  * with the exact path within the sketch's rank-error bound on the
  * gate corpus, that bucket assignments move only within that bound,
  * and that the plan keeps the same 1-row-broadcast shape.
  */
class CcnetApproxCutsSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sfDir).documents

  private def withApprox[T](f: => T): T = {
    spark.conf.set("spark.graft.ccnet.approxCuts", "true")
    try f finally spark.conf.unset("spark.graft.ccnet.approxCuts")
  }

  test("cuts agree with the exact path within the sketch's rank-error bound") {
    val exact = TextAnalysis.ccnetBuckets(docs)
    val approx = withApprox(TextAnalysis.ccnetBuckets(docs))
    val n = exact.count()
    assert(n == approx.count(), "the arm must not change corpus coverage")
    // rank-error bound: the sketch's cut sits within n/accuracy ranks
    // of the exact tercile — translate to a VALUE bound by reading the
    // surprisal at the allowed rank offsets
    val eps = math.max(1L, n / TextAnalysis.CcnetSketchAccuracy)
    val sorted = exact.select("surprisal").orderBy("surprisal")
      .collect().map(_.getDouble(0))
    def rankWindow(p: Double): (Double, Double) = {
      val r = (p * (n - 1)).toLong
      (sorted(math.max(0, r - eps).toInt), sorted(math.min(n - 1, r + eps).toInt))
    }
    val (c1, c2) = {
      val row = approx.select("cut_head", "cut_tail").head()
      (row.getDouble(0), row.getDouble(1))
    }
    val (lo1, hi1) = rankWindow(1.0 / 3)
    val (lo2, hi2) = rankWindow(2.0 / 3)
    assert(c1 >= lo1 && c1 <= hi1, s"cut_head $c1 outside [$lo1, $hi1]")
    assert(c2 >= lo2 && c2 <= hi2, s"cut_tail $c2 outside [$lo2, $hi2]")
    // bucket assignments may differ only for docs whose surprisal lies
    // between the two paths' cut values — everything else is identical.
    // The carried cut columns are ROUNDED to 4dp (bucketing itself uses
    // the unrounded cuts), so the window gets the rounding granularity
    // as tolerance.
    val tol = 1e-4
    val moved = exact.select(col("doc_id"), col("surprisal"),
        col("bucket").as("b_exact"), col("cut_head").as("e1"), col("cut_tail").as("e2"))
      .join(approx.select(col("doc_id"), col("bucket").as("b_approx")), "doc_id")
      .filter(col("b_exact") =!= col("b_approx"))
      .filter(!(
        (col("surprisal") > least(col("e1"), lit(c1)) - tol &&
         col("surprisal") <= greatest(col("e1"), lit(c1)) + tol) ||
        (col("surprisal") > least(col("e2"), lit(c2)) - tol &&
         col("surprisal") <= greatest(col("e2"), lit(c2)) + tol)))
    assert(moved.isEmpty,
      "a bucket moved outside the cut disagreement window")
  }

  test("the conf actually selects the sketch aggregate and keeps the broadcast shape") {
    val exactPlan = TextAnalysis.ccnetBuckets(docs)
      .queryExecution.executedPlan.toString
    val approxPlan = withApprox(TextAnalysis.ccnetBuckets(docs))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("percentile(") && !exactPlan.contains("approx_percentile"))
    assert(approxPlan.contains("approx_percentile"))
    // same at-scale shape: the cuts reach the corpus as a broadcast
    // (BNLJ of a 1-row relation), in BOTH arms
    assert(approxPlan.contains("BroadcastNestedLoopJoin"))
  }
}
