package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory with the engine's standard configuration.
  *
  * Mirrors the deployment posture of the reference's ClickHouse backend
  * (/root/reference/internal/storage/clickhouse/clickhouse.go:79-228):
  * month-partitioned, sort-keyed fact tables. On Spark that translates to
  * AQE + partition-pruning-friendly reads; shuffle parallelism is sized by
  * env so the same binary works on local[32] and on a cluster.
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def build(appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      // events.parquet carries TIMESTAMP(NANOS) which Spark has no native
      // type for; read the raw int64 and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Lazy handles on the driver-generated test tables for one scale factor.
  * All operators take these as inputs; nothing reads paths directly.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  lazy val region: DataFrame     = table("region")
  lazy val nation: DataFrame     = table("nation")
  lazy val customer: DataFrame   = table("customer")
  lazy val supplier: DataFrame   = table("supplier")
  lazy val part: DataFrame       = table("part")
  lazy val orders: DataFrame     = table("orders")
  lazy val lineitem: DataFrame   = table("lineitem")
  /** events.ts is TIMESTAMP(NANOS) in parquet (read as raw long); convert
    * to a micros TimestampType column. ts is post-1970 so long division is
    * the same floor DuckDB applies when casting ns → us.
    */
  lazy val events: DataFrame = {
    val raw = table("events")
    import org.apache.spark.sql.functions._
    raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  lazy val documents: DataFrame  = table("documents")
  lazy val embeddings: DataFrame = table("embeddings")
}
