package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** s_knn_classify cross-checked against an independent window-based
  * recompute (row_number top-10 instead of the bounded-heap aggregate) —
  * the two paths must elect identical labels with identical vote counts.
  */
class KnnClassifySpec extends SparkSpec {

  test("heap-aggregate kNN vote matches the window-based recompute") {
    val got = SparkEntry.queries("s_knn_classify")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap

    val e = Tables(spark, sfDir).embeddings
    val labeled = e.filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding"), col("label"))
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("vec_id"))
    val ref = labeled.join(broadcast(queries))
      .withColumn("cos", expr("round(cosine_similarity(q_vec, embedding), 4)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .groupBy("q_id", "label").agg(count(lit(1)).as("votes"))
      .groupBy("q_id")
      .agg(max_by(col("label"), expr("votes * 1000 - label")).as("pred_label"),
           max(col("votes")).as("votes"))
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap

    assert(got.size === 10)
    assert(got === ref)
  }

  test("votes are bounded by k and labels come from the corpus domain") {
    val labels = Tables(spark, sfDir).embeddings
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    SparkEntry.queries("s_knn_classify")(spark, sfDir).collect().foreach { r =>
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 10L)
      assert(labels.contains(r.getInt(1)))
    }
  }
}
