package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction for partition-directory parquet tables — the
  * maintenance twin of the MergeTree-parity writers (OutputWriters
  * .writeTable) and the streaming sinks: continuous intake
  * (ReportFileIntake, EventsStreaming.windowedAggIdempotent) appends a
  * few small files per micro-batch, and a month partition that has
  * accumulated thousands of them reads orders of magnitude slower than
  * the same bytes in target-sized files (per-file open/footer cost,
  * task-per-file scheduling). ClickHouse runs this as background part
  * merges (the reference's storage engine merges parts continuously);
  * on plain parquet it is an explicit maintenance pass.
  *
  * Scale shape: each partition compacts independently (one job per
  * partition, no cross-partition shuffle), and the rewrite is
  * `repartitionByRange` on the table's ORDER BY key + in-file sort —
  * files stay disjoint in sort-key ranges, so parquet row-group min/max
  * skipping keeps working across the compacted files exactly as the
  * MergeTree-parity writer laid them out.
  *
  * Caveat (documented, inherent to plain parquet): the per-partition
  * swap is delete+rename, not atomic — run as the table's single
  * writer, the same discipline ClickHouse requires for manual part
  * surgery. A reader racing the swap can see the partition mid-swap; a
  * transactional table format is the upgrade path when readers can't be
  * fenced.
  */
object Compaction {

  /** One partition directory's current shape. */
  final case class PartitionStats(partition: String, files: Int, bytes: Long)

  /** One rewritten partition in a compaction report. */
  final case class CompactReport(partition: String, filesBefore: Int, filesAfter: Int)

  private def fileSystem(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Data files only — planner metadata (_SUCCESS, hidden files) is not
    * part of the partition's readable shape.
    */
  private def dataFiles(fs: FileSystem, dir: Path) =
    fs.listStatus(dir).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  /** File count + bytes per `key=value` partition directory. Hidden
    * directories (a crashed run's `.compact-*` / `.merge-tmp`) are not
    * partitions — without this guard a stale tmp dir would surface as a
    * phantom partition to retention and re-compaction.
    */
  def partitionStats(spark: SparkSession, tablePath: String): Seq[PartitionStats] = {
    val fs = fileSystem(spark, tablePath)
    fs.listStatus(new Path(tablePath)).toSeq
      .filter { st =>
        val n = st.getPath.getName
        st.isDirectory && n.contains("=") && !n.startsWith(".") && !n.startsWith("_")
      }
      .map { st =>
        val fls = dataFiles(fs, st.getPath)
        PartitionStats(st.getPath.getName, fls.length, fls.map(_.getLen).sum)
      }
      .sortBy(_.partition)
  }

  /** Rewrite every partition whose file count exceeds both `minFiles`
    * and its target-size file count (ceil(bytes / targetBytes)) into
    * exactly that many range-partitioned, internally sorted files.
    * Partitions already at or below target are left byte-identical.
    * Returns one report row per rewritten partition.
    */
  def compactTable(spark: SparkSession, tablePath: String, sortCols: Seq[String],
                   targetBytes: Long = 128L << 20, minFiles: Int = 4): Seq[CompactReport] = {
    require(sortCols.nonEmpty, "compaction needs the table's ORDER BY key")
    val fs = fileSystem(spark, tablePath)
    partitionStats(spark, tablePath).flatMap { p =>
      val want = math.max(1L, (p.bytes + targetBytes - 1) / targetBytes).toInt
      if (p.files <= want || p.files < minFiles) None
      else {
        val src = new Path(s"$tablePath/${p.partition}")
        // tmp lives INSIDE the table dir (same filesystem → rename is a
        // metadata op, never a copy) but starts with '.' so readers'
        // partition discovery never sees it
        val tmp = new Path(s"$tablePath/.compact-${p.partition}")
        spark.read.parquet(src.toString)
          .repartitionByRange(want, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
          .write.mode("overwrite").parquet(tmp.toString)
        fs.delete(src, true)
        fs.rename(tmp, src)
        Some(CompactReport(p.partition, p.files, dataFiles(fs, src).length))
      }
    }
  }
}
