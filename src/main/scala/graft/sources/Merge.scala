package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** MERGE (upsert) into a partition-directory parquet table — the batch
  * twin of the streaming idempotent sink: continuous intake lands
  * corrected/re-delivered report batches, and the table must converge to
  * one row per key without rewriting 100 TB. ClickHouse gets this from
  * ReplacingMergeTree semantics (the reference's storage engine
  * deduplicates on the sort key during part merges); on plain parquet it
  * is an explicit bounded maintenance pass.
  *
  * Scale shape: ONLY the partitions the update batch touches are read,
  * merged, and swapped — cost is O(touched data + batch), never O(table)
  * (schema comes from one touched partition, not a full-table listing).
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
  * well defined on an unordered relation). Partition values must be
  * non-null and directory-literal (no characters Spark's writer would
  * Hive-escape) — enforced loudly up front, because a silently escaped
  * directory name would desynchronize the swap paths from the write.
  *
  * Failure posture: every delete/rename in the swap is CHECKED. All tmp
  * outputs are verified present before the first destructive step, and a
  * failed rename aborts with the remaining data still in `.merge-tmp` —
  * never a silent success report over a lost partition.
  */
object Merge {

  /** One touched partition in an upsert report. */
  final case class UpsertReport(partition: String, rowsBefore: Long,
                                updated: Long, inserted: Long, rowsAfter: Long)

  /** Directory-literal partition values: nothing Spark's writer escapes. */
  private val SafePart = "^[0-9A-Za-z._-]+$".r

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

    val rawParts = batch.select(col(partCol)).distinct().collect().map(_.getString(0)).toSeq
    rawParts.foreach { v =>
      require(v != null && SafePart.pattern.matcher(v).matches(),
        s"partition value '$v' is null or needs directory escaping; " +
          "only [0-9A-Za-z._-]+ values are supported")
    }
    val parts = rawParts.sorted
    if (parts.isEmpty) { batch.unpersist(); return Seq.empty }
    val touchedDirs = parts.map(v => s"$tablePath/$partCol=$v")

    // data-file schema from ONE existing touched partition (no full-table
    // listing); an all-new-partitions batch derives it from the batch
    val existingDirs = touchedDirs.filter(d => fs.exists(new Path(d)))
    val fileSchema: StructType = existingDirs.iterator
      .flatMap(d => scala.util.Try(spark.read.parquet(d).schema).toOption)
      .nextOption()
      .getOrElse(StructType(batch.schema.fields.filterNot(_.name == partCol)))
    touchedDirs.filterNot(d => fs.exists(new Path(d))).foreach { d =>
      require(fs.mkdirs(new Path(d)), s"cannot create partition directory $d")
    }

    // read ONLY the touched partition directories; basePath keeps the
    // partition column (cast to string — no directory-value inference)
    val old = spark.read
      .option("basePath", tablePath)
      .schema(fileSchema)
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
    // verify EVERY tmp output exists before the first destructive step
    parts.foreach { v =>
      require(fs.exists(new Path(s"$tmp/$partCol=$v")),
        s"merge tmp output missing for $partCol=$v; table left untouched")
    }
    parts.foreach { v =>
      val src = new Path(s"$tmp/$partCol=$v")
      val dst = new Path(s"$tablePath/$partCol=$v")
      require(fs.delete(dst, true) || !fs.exists(dst),
        s"cannot clear $dst for swap; merged data remains in $tmp")
      require(fs.rename(src, dst),
        s"rename $src -> $dst failed; merged data remains in $tmp")
    }
    require(fs.delete(tmp, true) || !fs.exists(tmp), s"cannot remove $tmp")
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
