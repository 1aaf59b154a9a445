package graft.operators

import graft.Tables
import graft.sources.Compaction
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Table-maintenance operators: the upkeep a continuously ingested
  * parquet table needs that queries don't express (ClickHouse does the
  * equivalent as background part merges).
  */
object Maintenance extends QueryModule {

  override def entries: Seq[QueryDef] = Seq(
    // small-file compaction, demonstrated end to end: fragment the
    // events table into a month-partitioned tree of deliberately tiny
    // files (8 writer tasks × every month — the shape a streaming sink
    // leaves behind), compact, and report per-partition file counts.
    // Rows-only: file layout has no DuckDB twin; CompactionSpec pins
    // row-set preservation, in-file sort order, and that below-threshold
    // partitions stay byte-identical.
    QueryDef(
      "w_compact",
      (s, dir) => {
        import s.implicits._
        val table = java.nio.file.Files.createTempDirectory("graft-compact").toString
        val events = Tables(s, dir).events
        events.withColumn("month", date_format(col("ts"), "yyyyMM"))
          .repartition(8)
          .write.mode("overwrite").partitionBy("month").parquet(table)
        val reports = Compaction.compactTable(
          s, table, sortCols = Seq("ts", "event_id"),
          targetBytes = 512L << 20, minFiles = 2)
        // integrity gate before discarding the rewrite: the compacted
        // table must still hold every row
        val after = s.read.parquet(table).count()
        val expected = events.count()
        require(after == expected, s"compaction dropped rows: $after != $expected")
        val out = reports
          .map(r => (r.partition, r.filesBefore.toLong, r.filesAfter.toLong))
          .toDF("partition", "files_before", "files_after")
          .orderBy("partition")
        val root = new Path(table)
        root.getFileSystem(s.sparkContext.hadoopConfiguration).delete(root, true)
        out
      },
      None,
    ),
  )
}
