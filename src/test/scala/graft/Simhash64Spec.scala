package graft

import org.apache.spark.sql.functions._

class Simhash64Spec extends SparkSpec {

  test("identical token sets hash identically; different sets differ") {
    val rows = spark.sql(
      """SELECT simhash64(array('a','b','c')) AS h1,
        |simhash64(array('a','b','c')) AS h2,
        |simhash64(array('x','y','z','w')) AS h3""".stripMargin).collect().head
    assert(rows.getLong(0) == rows.getLong(1))
    assert(rows.getLong(0) != rows.getLong(2))
  }

  test("near-identical documents land within small hamming distance") {
    val d = spark.sql(
      """SELECT bit_count(
        |  simhash64(split('the quick brown fox jumps over the lazy dog and runs far away home tonight', ' ')) ^
        |  simhash64(split('the quick brown fox jumps over the lazy dog and runs far away home today', ' '))
        |) AS dist""".stripMargin).collect().head.getInt(0)
    val far = spark.sql(
      """SELECT bit_count(
        |  simhash64(split('the quick brown fox jumps over the lazy dog and runs far away home tonight', ' ')) ^
        |  simhash64(split('completely different words about spark catalyst expressions and parquet files here', ' '))
        |) AS dist""".stripMargin).collect().head.getInt(0)
    assert(d < far, s"near=$d far=$far")
    assert(d <= 16)
  }

  test("exact near-dups from minhash agree with simhash64 buckets") {
    val docs = Tables(spark, sfDir).documents
      .selectExpr("doc_id", "simhash64(array_distinct(split(text, ' '))) AS h")
    // the oracled LSH pairs (jaccard >= 0.5) must sit close in hamming space
    val pairs = SparkEntry.queries("d_minhash_lsh")(spark, sfDir)
      .join(docs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("h", "ha"), "doc_a")
      .join(docs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("h", "hb"), "doc_b")
      .selectExpr("jaccard", "bit_count(ha ^ hb) AS dist")
      .collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getInt(1) <= 24), pairs.map(_.getInt(1)).mkString(","))
  }

  test("interpreted and codegen paths agree") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    def run(): Seq[Long] = Tables(spark, sfDir).documents.limit(50)
      .selectExpr("simhash64(split(text, ' ')) AS h").orderBy("h")
      .collect().map(_.getLong(0)).toSeq
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val gen = try run() finally spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run() finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    assert(gen == interp)
  }
}
