package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE (upsert) into a partition-directory parquet table — the batch
  * twin of the streaming idempotent sink: continuous intake lands
  * corrected/re-delivered report batches, and the table must converge to
  * one row per key without rewriting 100 TB. ClickHouse gets this from
  * ReplacingMergeTree semantics (the reference's storage engine
  * deduplicates on the sort key during part merges); on plain parquet it
  * is an explicit bounded maintenance pass.
  *
  * Scale shape: ONLY the partitions the update batch touches are read,
  * merged, and swapped — cost is O(touched data + batch), never O(table).
  * The anti-join runs over just those partitions' rows against a
  * batch-sized relation (broadcast when small), and the rewrite reuses
  * the compaction swap discipline (write to a hidden tmp dir inside the
  * table, then per-partition rename — a metadata op on the same
  * filesystem). Spark's native dynamic partition overwrite expresses the
  * same thing when the target is a catalog table; the explicit swap
  * avoids the read-from-overwritten-path hazard of raw-path round trips.
  *
  * Contract (documented, standard for date-partitioned facts): a key's
  * partition value never changes across versions of the row — an update
  * that "moved" a key to another partition would strand the old copy in
  * a partition the batch may not touch. Batches must also carry at most
  * one row per key (enforced; "last write wins" inside one batch is not
  * well defined on an unordered relation).
  */
object Merge {

  /** One touched partition in an upsert report. */
  final case class UpsertReport(partition: String, rowsBefore: Long,
                                updated: Long, inserted: Long, rowsAfter: Long)

  /** Merge `updates` (keyed on `keyCol`, partitioned by `partCol`) into
    * the table at `tablePath`, replacing matched keys and appending new
    * ones; returns one report row per touched partition. Partition
    * values compare as strings (the directory encoding).
    */
  def upsertPartitioned(spark: SparkSession, tablePath: String, updates: DataFrame,
                        keyCol: String, partCol: String): Seq[UpsertReport] = {
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)

    val batch = updates.withColumn(partCol, col(partCol).cast("string")).persist()
    val dupKeys = batch.groupBy(col(keyCol)).count().filter(col("count") > 1).count()
    require(dupKeys == 0, s"update batch carries $dupKeys duplicated keys; one row per key")

    val parts = batch.select(col(partCol)).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    if (parts.isEmpty) { batch.unpersist(); return Seq.empty }
    val touchedDirs = parts.map(v => s"$tablePath/$partCol=$v")
    touchedDirs.filterNot(d => fs.exists(new Path(d))).foreach { d =>
      fs.mkdirs(new Path(d)) // insert-only partition: new directory
    }

    // read ONLY the touched partition directories; basePath keeps the
    // partition column (as string — no directory-value type inference)
    val old = spark.read
      .option("basePath", tablePath)
      .schema(spark.read.parquet(tablePath).schema)
      .parquet(touchedDirs: _*)
      .withColumn(partCol, col(partCol).cast("string"))
      .persist()

    val before = old.groupBy(col(partCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val updated = old.join(batch.select(col(keyCol)), Seq(keyCol), "left_semi")
      .groupBy(col(partCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchPer = batch.groupBy(col(partCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val merged = old.join(batch.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(batch.select(old.columns.toIndexedSeq.map(col): _*))

    val tmp = new Path(s"$tablePath/.merge-tmp")
    merged.write.mode("overwrite").partitionBy(partCol).parquet(tmp.toString)
    parts.foreach { v =>
      val src = new Path(s"$tmp/$partCol=$v")
      val dst = new Path(s"$tablePath/$partCol=$v")
      fs.delete(dst, true)
      fs.rename(src, dst)
    }
    fs.delete(tmp, true)
    old.unpersist()
    batch.unpersist()

    parts.map { v =>
      val b = before.getOrElse(v, 0L)
      val u = updated.getOrElse(v, 0L)
      val ins = batchPer.getOrElse(v, 0L) - u
      UpsertReport(s"$partCol=$v", b, u, ins, b + ins)
    }
  }
}
