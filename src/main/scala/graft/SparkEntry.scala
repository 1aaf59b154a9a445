package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All operator modules; each contributes (query, oracle) pairs. */
  private def modules: Seq[QueryModule] = Seq(
    DashboardAnalytics,
    EventAnalytics,
    Relational,
    Relational2,
    Relational3,
    Relational4,
    RelationalTpch,
    Windowed,
    TextAnalysis,
    Dedup,
    WebPipeline,
    Similarity,
    DmarcIngest,
    Enrichment,
    Streaming,
    Multimodal,
    Scale,
    Maintenance,
  )

  private lazy val all: Seq[QueryDef] = modules.flatMap(_.entries)

  /** Pre-dedup name list (the Maps below would silently drop collisions;
    * QueriesSmokeSpec asserts uniqueness against this).
    */
  def declaredNames: Seq[String] = all.map(_.name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
