package graft

/** Every SparkEntry query runs at sf0.001 and yields a sane result.
  * (Value-level correctness is the driver's DuckDB oracle — mirrored
  * locally by scripts/check.py; this spec guards runnability, schema
  * stability, and non-degenerate output.)
  */
class QueriesSmokeSpec extends SparkSpec {

  // queries whose legit sf0.001 output can be empty
  private val mayBeEmpty = Set("d_ngram_jaccard", "d_embedding_neardup")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("query names are unique across modules (Map would silently drop dups)") {
    val names = SparkEntry.declaredNames
    assert(names.distinct.size == names.size,
      names.diff(names.distinct).mkString(","))
  }

  test("approximate sketches land near their exact counterparts") {
    import org.apache.spark.sql.functions._
    val e = Tables(spark, sfDir).events
    val approx = e.agg(approx_count_distinct(col("user_id"), 0.02)).collect().head.getLong(0)
    val exact = e.agg(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05, s"$approx vs $exact")

    val l = Tables(spark, sfDir).lineitem
    val ap = l.selectExpr("approx_percentile(l_extendedprice, 0.5, 1000)")
      .collect().head.getDouble(0)
    val ex = l.selectExpr("percentile(l_extendedprice, 0.5)").collect().head.getDouble(0)
    assert(math.abs(ap - ex) / ex <= 0.05, s"$ap vs $ex")
  }
}
