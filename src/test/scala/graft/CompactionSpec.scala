package graft

import graft.sources.Compaction
import org.apache.spark.sql.functions._

/** Compaction must change the file layout and nothing else: same rows,
  * sorted inside files, untouched partitions byte-identical.
  */
class CompactionSpec extends SparkSpec {

  /** Day-partitioned fragmented table (many small partitions) in a fresh
    * temp dir; returns its path.
    */
  private def fragmented(filesPerPartition: Int): String = {
    val table = java.nio.file.Files.createTempDirectory("graft-compact-spec").toString
    Tables(spark, sfDir).events
      .withColumn("day", date_format(col("ts"), "yyyyMMdd"))
      .repartition(filesPerPartition)
      .write.mode("overwrite").partitionBy("day").parquet(table)
    table
  }

  test("compaction preserves the exact row multiset and sorts within files") {
    val table = fragmented(6)
    val before = spark.read.parquet(table)
      .select("event_id").collect().map(_.getLong(0)).sorted
    val stats = Compaction.partitionStats(spark, table)
    assert(stats.nonEmpty && stats.forall(_.files > 1))

    val reports = Compaction.compactTable(
      spark, table, sortCols = Seq("ts", "event_id"),
      targetBytes = 512L << 20, minFiles = 2)

    // every multi-file partition was rewritten down to its 1-file target
    assert(reports.map(_.partition).sorted ===
      stats.filter(_.files >= 2).map(_.partition).sorted)
    reports.foreach { r =>
      assert(r.filesAfter === 1)
      assert(r.filesBefore > r.filesAfter)
    }

    val after = spark.read.parquet(table)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(after === before)

    // rows inside a compacted file are sorted on the table's ORDER BY
    // key (read one partition dir directly — no shuffle on this path)
    val part = reports.head.partition
    val ts = spark.read.parquet(s"$table/$part")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    assert(ts === ts.sorted)
  }

  test("partitions below the minFiles threshold stay byte-identical") {
    val table = fragmented(3)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def layout(p: String) =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$table/$p"))
        .filter(_.isFile)
        .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
        .sortBy(_._1).toSeq

    val stats = Compaction.partitionStats(spark, table)
    val layouts = stats.map(p => p.partition -> layout(p.partition)).toMap

    // threshold above every partition's file count → nothing to do
    val reports = Compaction.compactTable(
      spark, table, sortCols = Seq("ts", "event_id"),
      targetBytes = 512L << 20, minFiles = 10)
    assert(reports.isEmpty)
    stats.foreach(p => assert(layout(p.partition) === layouts(p.partition)))
  }

  test("w_compact registry entry reports only rewritten partitions") {
    val rows = SparkEntry.queries("w_compact")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0).startsWith("month="))
      assert(r.getLong(1) > r.getLong(2))
      assert(r.getLong(2) >= 1L)
    }
  }
}
