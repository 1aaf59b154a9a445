package graft

import org.apache.spark.sql.functions._

/** Native sq_distance expression: SQL registration, parity with the
  * interpreted lambda fold it replaced, and codegen/interpreted
  * agreement.
  */
class SqDistanceSpec extends SparkSpec {

  test("registered and exact on known vectors") {
    val r = spark.sql(
      """SELECT sq_distance(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)),
        |                   array(CAST(4 AS FLOAT), CAST(6 AS FLOAT))) AS d,
        |sq_distance(array(CAST(1 AS FLOAT)), array(CAST(1 AS FLOAT), CAST(2 AS FLOAT))) AS mismatch
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 25.0)
    assert(r.isNullAt(1))
  }

  test("bit-identical to the aggregate(zip_with(...)) fold on real embeddings") {
    val e = Tables(spark, sfDir).embeddings.limit(200)
    val a = e.select(col("vec_id"), col("embedding"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("centroid"))
    val lambda =
      """aggregate(zip_with(embedding, centroid,
        |(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
        |CAST(0 AS DOUBLE), (s, v) -> s + v)""".stripMargin
    val rows = a.join(b, col("vec_id") < col("b_id") && col("b_id") < 5)
      .withColumn("native", expr("sq_distance(embedding, centroid)"))
      .withColumn("fold", expr(lambda))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(r.fieldIndex("native")) ==
                            r.getDouble(r.fieldIndex("fold"))))
  }

  test("interpreted and codegen paths agree") {
    def run(): Seq[Double] = Tables(spark, sfDir).embeddings.limit(50)
      .selectExpr("sq_distance(embedding, reverse(embedding)) AS d")
      .orderBy("d").collect().map(_.getDouble(0)).toSeq
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val gen = try run() finally spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run() finally spark.conf.unset("spark.sql.codegen.factoryMode")
    assert(gen == interp && gen.nonEmpty)
  }
}
