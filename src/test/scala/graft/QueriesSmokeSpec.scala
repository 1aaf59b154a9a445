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

  test("q_uniq_approx within HLL error bound of q_uniq_exact") {
    // the REGISTRY entries themselves, not re-derived aggregates: the
    // rows-only gate entry still carries a correctness claim — HLL at
    // rsd=0.02 must land within 5% (2.5 sigma) of the exact distinct
    val approx = SparkEntry.queries("q_uniq_approx")(spark, sfDir)
      .collect().head.getLong(0)
    val exact = SparkEntry.queries("q_uniq_exact")(spark, sfDir)
      .collect().head.getLong(0)
    assert(exact > 0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05, s"$approx vs $exact")
  }

  test("q_approx_quantiles within sketch bound of the exact quantiles") {
    import org.apache.spark.sql.functions._
    val ap = SparkEntry.queries("q_approx_quantiles")(spark, sfDir).collect().head
    val l = Tables(spark, sfDir).lineitem
    val ex = l.agg(
      expr("percentile(l_extendedprice, 0.25)"),
      expr("percentile(l_extendedprice, 0.5)"),
      expr("percentile(l_extendedprice, 0.75)"),
      expr("percentile(l_quantity, 0.5)")).collect().head
    // approx_percentile(accuracy=1000) guarantees rank error ≤ n/1000;
    // on these distributions that maps to well under 5% value error —
    // assert every output column of the gate entry, not just p50
    (0 until 4).foreach { i =>
      val a = ap.getDouble(i); val e = ex.getDouble(i)
      assert(math.abs(a - e) / e <= 0.05, s"col $i: $a vs $e")
    }
  }
}
