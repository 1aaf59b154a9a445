package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism balancing for CPU-heavy per-row stages (hashing, vector
  * arithmetic): a small corpus arriving as one parquet split would pin
  * the whole stage to a single core. Widen to cluster parallelism ONLY
  * when the scan is narrower than that — a 100 TB input already has
  * thousands of splits and must not pay a raw-data shuffle.
  *
  * Pass the downstream aggregation keys so the widening shuffle IS the
  * aggregation's partitioning: `widen(docs, col("doc_id"))` hash-
  * partitions the (tiny) raw rows once, and the heavy projection +
  * groupBy(doc_id) after it run with no further exchange — the
  * expensive derived rows (hashes, scores) never shuffle.
  */
object Par {
  def widen(df: DataFrame, keys: Column*): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= parallelism) df
    else if (keys.isEmpty) df.repartition(parallelism)
    else df.repartition(parallelism, keys: _*)
  }
}
