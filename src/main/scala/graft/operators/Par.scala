package graft.operators

import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LocalRelation}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
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

  private val SplitTargetBytes = 128L * 1024 * 1024

  /** Order-of-magnitude estimate of the scan parallelism from the
    * OPTIMIZED LOGICAL plan's leaf relations — file count and total
    * bytes over the default 128 MB split target. Deliberately not
    * `df.rdd.getNumPartitions`: converting to an RDD forces physical
    * planning of the pre-AQE plan on the driver once per call (a real
    * cost inside iterative loops). Unknown relation types (e.g. DSv2
    * connectors) are assumed already wide — at scale the safe failure
    * mode is skipping the repartition, never shuffling a huge input.
    */
  private def estimatedScanSplits(df: DataFrame): Long = {
    var splits = 0L
    var sawUnknown = false
    df.queryExecution.optimizedPlan.foreach {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            splits += math.max(fs.location.inputFiles.length.toLong,
                               fs.location.sizeInBytes / SplitTargetBytes + 1)
          case _ => sawUnknown = true
        }
      case _: LocalRelation => splits += 1
      // localCheckpoint leaves carry their EXACT partition count — the
      // one leaf class where "narrow" is knowable, not assumable. This
      // matters for pipelines that checkpoint every stage (prepareWeb):
      // a tiny gate-corpus stage frame inherits the ~3 AQE-coalesced
      // partitions of the first shuffle, and without this case every
      // downstream CPU-heavy widen call no-op'd on it. A checkpointed
      // 100 TB frame has thousands of partitions and still no-ops.
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        splits += lr.rdd.getNumPartitions
      // EVERY other leaf (InMemoryRelation from persist(), DSv2
      // relations, streaming relations, …) is unknown → assumed wide.
      // Counting them as zero would invert the fail-safe: a persisted
      // 100 TB frame would look narrow and get a full repartition.
      case _: LeafNode => sawUnknown = true
      case _ => ()
    }
    if (sawUnknown) Long.MaxValue else math.max(splits, 1L)
  }

  def widen(df: DataFrame, keys: Column*): DataFrame = {
    // streaming frames cannot (and need not) be re-width-balanced here;
    // micro-batch parallelism is the source's concern
    if (df.isStreaming) df
    else {
      val parallelism = df.sparkSession.sparkContext.defaultParallelism
      if (estimatedScanSplits(df) >= parallelism) df
      else if (keys.isEmpty) df.repartition(parallelism)
      else df.repartition(parallelism, keys: _*)
    }
  }
}
