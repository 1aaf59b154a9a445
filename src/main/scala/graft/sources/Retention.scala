package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Partition-expiry retention for partition-directory parquet tables —
  * the third leg of table upkeep next to compaction and merge. A
  * continuously ingested fact table is paired in production with a
  * retention job that drops partitions past the horizon (ClickHouse
  * deployments run this as ALTER TABLE ... DROP PARTITION); on plain
  * parquet it is a directory delete per expired partition: O(expired
  * partitions) metadata work, no data is read or rewritten, and the
  * surviving partitions are untouched bytes.
  */
object Retention {

  /** Drop every `key=value` partition whose value sorts strictly below
    * `cutoff` (string directory-value order — yyyyMMdd-style values
    * compare correctly). Returns the dropped partitions' pre-delete
    * stats; re-running with the same cutoff drops nothing.
    */
  def dropPartitionsBefore(spark: SparkSession, tablePath: String,
                           cutoff: String): Seq[Compaction.PartitionStats] = {
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Compaction.partitionStats(spark, tablePath)
      .filter(_.partition.split("=", 2)(1) < cutoff)
      .map { p =>
        // checked like Merge/Compaction's swap renames: a silently
        // failed delete must not be reported as dropped.
        require(fs.delete(new Path(s"$tablePath/${p.partition}"), true),
          s"retention: failed to drop partition ${p.partition} under $tablePath")
        p
      }
  }
}
