package graft

import graft.functions.HeavyHitters
import org.apache.spark.sql.functions._
import scala.util.Random

/** The Misra-Gries guarantees the t_heavy_hitters entry rides on:
  * exactness when capacity covers the vocabulary, the N/(k+1)
  * undercount bound and heavy-term presence on an adversarial corpus
  * that overflows capacity, and the partial-aggregate plan shape.
  */
class HeavyHittersSpec extends SparkSpec {

  private def summary(terms: Seq[String], k: Int): Map[String, Long] = {
    import spark.implicits._
    terms.toDF("term").repartition(8).as[String]
      .select(new HeavyHitters(k).toColumn.name("hh"))
      .collect().head.toMap
  }

  test("capacity >= vocabulary makes the sketch exact") {
    val terms = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(7)("c")
    val got = summary(Random.shuffle(terms), 16)
    assert(got === Map("a" -> 40L, "b" -> 25L, "c" -> 7L))
  }

  test("heavy terms survive capacity overflow with bounded undercount") {
    val k = 64
    // two heavy terms drowned in 6000 distinct singletons
    val terms = Seq.fill(2000)("hot1") ++ Seq.fill(1500)("hot2") ++
      (0 until 6000).map(i => s"rare$i")
    val n = terms.size.toLong
    val got = summary(new Random(7).shuffle(terms), k)
    assert(got.size <= k)
    for ((t, truth) <- Seq("hot1" -> 2000L, "hot2" -> 1500L)) {
      val est = got.getOrElse(t, 0L)
      assert(est > 0L, s"$t missing from summary")
      assert(est <= truth, s"$t overcounted: $est > $truth")
      assert(truth - est <= n / (k + 1),
             s"$t undercount ${truth - est} exceeds N/(k+1) = ${n / (k + 1)}")
    }
  }

  test("the sketch runs as a partial ObjectHashAggregate") {
    val plan = graft.operators.TextAnalysis.entries
      .find(_.name == "t_heavy_hitters").get.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no ObjectHashAggregate in:\n$plan")
  }

  test("t_heavy_hitters agrees with the exact t_top_terms on testdata") {
    // sf0.001 vocabulary fits in capacity 256 only if small — instead of
    // assuming, check the weaker always-true property: every reported
    // count is a lower bound on the exact count
    val exact = Tables(spark, sfDir).documents
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = graft.operators.TextAnalysis.entries
      .find(_.name == "t_heavy_hitters").get.fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.nonEmpty)
    got.foreach { case (t, est) =>
      assert(est <= exact.getOrElse(t, 0L), s"$t est $est exceeds exact")
    }
  }
}
