package graft

import org.apache.spark.sql.functions._

/** The native cosine_similarity expression: registration, values,
  * codegen, and bit-parity with the portable higher-order formulation.
  */
class CosineSimilaritySpec extends SparkSpec {

  test("registered via SparkSessionExtensions and callable from SQL") {
    val r = spark.sql(
      "SELECT cosine_similarity(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>), CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("orthogonal vectors score 0, opposite score -1") {
    val df = spark.sql(
      """SELECT
        |cosine_similarity(CAST(array(1.0,0.0) AS ARRAY<FLOAT>), CAST(array(0.0,2.0) AS ARRAY<FLOAT>)) AS o,
        |cosine_similarity(CAST(array(1.0,2.0) AS ARRAY<FLOAT>), CAST(array(-1.0,-2.0) AS ARRAY<FLOAT>)) AS n
        |""".stripMargin)
    val row = df.collect().head
    assert(math.abs(row.getDouble(0)) < 1e-12)
    assert(math.abs(row.getDouble(1) + 1.0) < 1e-12)
  }

  test("null on length mismatch and zero vector") {
    val row = spark.sql(
      """SELECT
        |cosine_similarity(CAST(array(1.0) AS ARRAY<FLOAT>), CAST(array(1.0,2.0) AS ARRAY<FLOAT>)) AS m,
        |cosine_similarity(CAST(array(0.0,0.0) AS ARRAY<FLOAT>), CAST(array(1.0,2.0) AS ARRAY<FLOAT>)) AS z
        |""".stripMargin).collect().head
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("bit-identical to the aggregate(zip_with(...)) left-fold on real embeddings") {
    val e = Tables(spark, sfDir).embeddings.limit(50)
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id"))
    def fold(u: String, v: String) =
      s"aggregate(zip_with($u, $v, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (s, t) -> s + t)"
    val cmp = pairs.withColumn("native", expr("cosine_similarity(a, b)"))
      .withColumn("hof",
        expr(s"${fold("a", "b")} / (sqrt(${fold("a", "a")}) * sqrt(${fold("b", "b")}))"))
      .filter(col("native") =!= col("hof")) // bitwise-equal doubles expected
    assert(cmp.count() == 0)
  }

  test("whole-stage codegen handles the expression (no fallback errors)") {
    // force the codegen path by disabling interpreted fallback
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val n = Tables(spark, sfDir).embeddings
        .selectExpr("cosine_similarity(embedding, embedding) AS c")
        .filter(col("c") > 0.999).count()
      assert(n == 500)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }
}
