package graft

import graft.sources.Merge
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Upsert must converge the table to one row per key, apply exactly the
  * batch's changes, and leave every untouched partition byte-identical
  * (the O(touched) claim, checked at the file level).
  */
class UpsertSpec extends SparkSpec {

  private def snapshot(): String = {
    val table = java.nio.file.Files.createTempDirectory("graft-upsert-spec").toString
    Tables(spark, sfDir).events
      .withColumn("day", date_format(col("ts"), "yyyyMMdd"))
      .write.mode("overwrite").partitionBy("day").parquet(table)
    table
  }

  private def fileSig(table: String): Map[String, Seq[(String, Long, Long)]] = {
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(table)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("day="))
      .map { st =>
        st.getPath.getName -> fs.listStatus(st.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
          .map(f => (f.getPath.getName, f.getLen, f.getModificationTime))
          .sortBy(_._1)
      }.toMap
  }

  test("upsert applies updates and inserts to touched partitions only") {
    val table = snapshot()
    val before = fileSig(table)
    val events = spark.read.parquet(table)
    val days = events.select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    val (d0, d1) = (days.head, days.last)
    assert(d0 != d1, "spec needs at least two day partitions")

    // corrections on day d0, fresh keys into d0 and d1
    val corr = events.filter(col("day").cast("string") === d0 && pmod(col("event_id"), lit(10)) === 0)
      .withColumn("value", lit(9999.25))
    val ins = events.filter(col("day").cast("string").isin(d0, d1) && pmod(col("event_id"), lit(10)) === 1)
      .withColumn("event_id", col("event_id") + 5000000L)
    assert(ins.filter(col("day").cast("string") === d1).count() > 0,
      "spec needs inserts landing on the second touched day")
    val nCorr = corr.count()
    val nIns = ins.count()
    assert(nCorr > 0 && nIns > 0)
    val total0 = events.count()

    val reports = Merge.upsertPartitioned(
      spark, table, corr.unionByName(ins), "event_id", "day")

    // report accounting matches what we sent
    assert(reports.map(_.partition).sorted === Seq(s"day=$d0", s"day=$d1"))
    assert(reports.map(_.updated).sum === nCorr)
    assert(reports.map(_.inserted).sum === nIns)
    reports.foreach(r => assert(r.rowsAfter === r.rowsBefore + r.inserted))

    val after = spark.read.parquet(table)
    // convergence: still one row per key, total grew by exactly the inserts
    assert(after.count() === total0 + nIns)
    assert(after.groupBy("event_id").count().filter(col("count") > 1).count() === 0)
    // updated keys carry the new value; untouched rows kept theirs
    val updatedVals = after.filter(col("day").cast("string") === d0 && pmod(col("event_id"), lit(10)) === 0
        && col("event_id") < 5000000L)
      .select("value").distinct().collect().map(_.getDouble(0))
    assert(updatedVals === Array(9999.25))
    assert(after.filter(col("value") === 9999.25).count() === nCorr)
    // inserted keys present, in the right partitions
    assert(after.filter(col("event_id") >= 5000000L).count() === nIns)

    // untouched partitions byte-identical (same files, sizes, mtimes)
    val sig = fileSig(table)
    days.filterNot(Set(d0, d1)).foreach { d =>
      assert(sig(s"day=$d") === before(s"day=$d"), s"day=$d was rewritten")
    }
    // touched partitions were rewritten
    assert(sig(s"day=$d0") !== before(s"day=$d0"))

    val root = new Path(table)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(root, true)
  }

  test("a batch carrying duplicate keys is rejected before any write") {
    val table = snapshot()
    val before = fileSig(table)
    val events = spark.read.parquet(table)
    val dup = events.limit(1).unionByName(events.limit(1))
    intercept[IllegalArgumentException] {
      Merge.upsertPartitioned(spark, table, dup, "event_id", "day")
    }
    assert(fileSig(table) === before) // nothing moved
    val root = new Path(table)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(root, true)
  }
}
