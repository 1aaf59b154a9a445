package graft

import org.apache.spark.sql.functions._

/** The scale-artifact measurement guard (ScaleDemo.forcedFrame /
  * collapsedUnder): proves the round-14 defect class is now caught.
  *
  * Round 14 shipped d_decontaminate_scrub scale cells timed through
  * `df.count()` over a plan ending in a row-preserving LEFT JOIN onto a
  * per-doc_id aggregate — Spark's optimizer proves such a join
  * row-preserving under count(1) and ELIMINATES it together with its
  * whole upstream subtree (the gram explode and broadcast semi join
  * never executed; "0.5 s for 5M docs scrubbed" was parquet-metadata
  * speed). These tests reconstruct that exact plan shape and show the
  * OLD count()-only window trips the guard while the round-15 forced
  * window does not — i.e. the guard would have redded the void cells.
  */
class ScaleGuardSpec extends SparkSpec {

  /** The round-14 scrub shape: docs LEFT JOIN (explode → groupBy doc_id)
    * with the join output projected — row-preserving by construction,
    * exactly what count(1) lets the optimizer erase.
    */
  private def scrubShapedPlan() = {
    import spark.implicits._
    val docs = Seq((1L, "abcabcabc"), (2L, "xyzxyzxyz"))
      .toDF("doc_id", "text")
    val marked = docs
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, length(text) - 2), p -> substring(text, p, 3))"))
        .as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"))
    val spans = marked.groupBy("doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
    docs.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("ps").isNull, col("text"))
          .otherwise(concat_ws(",", col("ps"))).as("kept"))
  }

  test("the old count()-only window LOSES the join and its upstream (guard reds it)") {
    val df = scrubShapedPlan()
    val countWindow = df.agg(count(lit(1)))
    // the optimizer eliminates the row-preserving left join under
    // count(1) — the histogram drops the Join, the Generate (explode),
    // and the per-doc Aggregate
    val base = ScaleDemo.workHistogram(df.queryExecution.optimizedPlan)
    val got = ScaleDemo.workHistogram(countWindow.queryExecution.optimizedPlan)
    assert(base.getOrElse("Join", 0) === 1)
    assert(base.getOrElse("Generate", 0) === 1)
    assert(got.getOrElse("Join", 0) === 0,
      s"expected count() to collapse the join (got $got) — if Spark " +
        "stopped eliminating it, this spec documents history, not a bug")
    assert(got.getOrElse("Generate", 0) === 0)
    assert(ScaleDemo.collapsedUnder(df, countWindow),
      "the guard must flag the count()-only window as collapsed")
  }

  test("the forced window keeps every work node (guard passes it)") {
    val df = scrubShapedPlan()
    val forced = ScaleDemo.forcedFrame(df)
    assert(!ScaleDemo.collapsedUnder(df, forced),
      "hashing every output column must keep the join + explode alive")
    val got = ScaleDemo.workHistogram(forced.queryExecution.optimizedPlan)
    assert(got.getOrElse("Join", 0) === 1)
    assert(got.getOrElse("Generate", 0) === 1)
  }

  test("forced window counts rows identically to count() and forces columns") {
    val df = scrubShapedPlan()
    val row = ScaleDemo.forcedFrame(df).head()
    assert(row.getLong(0) === df.count())
    // the hash column is a real value, not null — the columns evaluated
    assert(!row.isNullAt(1))
  }

  test("map-typed output columns are hashable (stringified)") {
    import spark.implicits._
    val df = Seq((1L, Map("a" -> 1)), (2L, Map("b" -> 2))).toDF("id", "m")
    val row = ScaleDemo.forcedFrame(df).head()
    assert(row.getLong(0) === 2L)
  }

  test("projection-only plans carry no work nodes (the audit's other collapse class)") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "t")
      .select(col("id"), upper(col("t")).as("u"))
    assert(ScaleDemo.workHistogram(df.queryExecution.optimizedPlan).isEmpty)
  }
}
