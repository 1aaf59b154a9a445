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
}
