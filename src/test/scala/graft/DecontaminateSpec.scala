package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Benchmark decontamination semantics on a hand-built corpus, plus the
  * plan property the operator exists for: the eval side broadcasts, the
  * corpus never shuffles into the join.
  */
class DecontaminateSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("flags exactly the docs sharing a shingle with the eval set") {
    val eval = docs(Seq(100L -> "a b c d"))
    val train = docs(Seq(
      1L -> "x a b c y", // shares shingle "a b c" → flagged, 1 gram
      2L -> "a b c d e", // shares "a b c" and "b c d" → 2 grams
      3L -> "p q r s",   // disjoint → clean
    ))
    val got = Dedup.decontaminate(train, eval).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(got.toSeq === Seq(1L -> 1L, 2L -> 2L))
  }

  test("short texts decontaminate on their whole-text shingle") {
    val eval = docs(Seq(100L -> "hi there"))
    val train = docs(Seq(1L -> "hi there", 2L -> "bye now"))
    val got = Dedup.decontaminate(train, eval).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(got.toSeq === Seq(1L -> 1L))
  }

  test("the eval-gram join is a broadcast, not a corpus shuffle") {
    val d = Tables(spark, sfDir).documents
    val plan = Dedup.decontaminate(
      d.filter(col("doc_id") % 97 =!= 0),
      d.filter(col("doc_id") % 97 === 0),
    ).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
           s"expected BroadcastHashJoin in:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
  }
}
