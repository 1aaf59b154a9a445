package graft

import graft.sources.{Compaction, Retention}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Retention must drop exactly the expired partitions, leave survivors
  * byte-identical, and be idempotent.
  */
class RetentionSpec extends SparkSpec {

  test("drops strictly-before-cutoff partitions only, survivors untouched, idempotent") {
    val table = java.nio.file.Files.createTempDirectory("graft-retain-spec").toString
    Tables(spark, sfDir).events
      .withColumn("day", date_format(col("ts"), "yyyyMMdd"))
      .write.mode("overwrite").partitionBy("day").parquet(table)

    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def sig(part: String) = fs.listStatus(new Path(s"$table/$part")).toSeq
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      .map(f => (f.getPath.getName, f.getLen, f.getModificationTime)).sortBy(_._1)

    val before = Compaction.partitionStats(spark, table)
    val days = before.map(_.partition).sorted
    assert(days.size > 10, "spec needs more than 10 day partitions")
    val cutoff = days.takeRight(10).head.split("=", 2)(1)
    val keptSigs = days.filter(_.split("=", 2)(1) >= cutoff).map(d => d -> sig(d)).toMap

    val dropped = Retention.dropPartitionsBefore(spark, table, cutoff)
    assert(dropped.map(_.partition).sorted === days.filter(_.split("=", 2)(1) < cutoff))

    val after = Compaction.partitionStats(spark, table)
    assert(after.map(_.partition).sorted === keptSigs.keys.toSeq.sorted)
    keptSigs.foreach { case (d, s0) => assert(sig(d) === s0, s"$d was touched") }

    // surviving rows are exactly the in-horizon events
    val expect = Tables(spark, sfDir).events
      .filter(date_format(col("ts"), "yyyyMMdd") >= cutoff).count()
    assert(spark.read.parquet(table).count() === expect)

    // second run: nothing left to drop
    assert(Retention.dropPartitionsBefore(spark, table, cutoff).isEmpty)

    val root = new Path(table)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(root, true)
  }
}
