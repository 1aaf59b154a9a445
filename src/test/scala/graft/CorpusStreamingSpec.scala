package graft

import graft.streaming.CorpusStreaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming exact dedup: duplicates are dropped ACROSS micro-batches
  * while their hash is inside the watermark window, and the admitted set
  * matches the batch d_dedup_exact distinct count.
  */
class CorpusStreamingSpec extends SparkSpec {

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("cross-micro-batch duplicates are dropped within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val name = s"corpus_dedup_${System.nanoTime()}"
    val query = CorpusStreaming.dedupExact(df)
      .select("doc_id", "text_hash")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()

    mem.addData((1L, t("2024-01-01 10:00:00"), "alpha"),
                (2L, t("2024-01-01 10:01:00"), "beta"),
                (3L, t("2024-01-01 10:02:00"), "alpha")) // dup inside batch
    query.processAllAvailable()
    mem.addData((4L, t("2024-01-01 10:10:00"), "alpha"), // dup across batches
                (5L, t("2024-01-01 10:11:00"), "gamma"))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table(name).collect()
    // one row per distinct text; the alpha copy admitted is the batch-1
    // one (ids 3 and 4 dropped)
    assert(rows.length === 3)
    assert(rows.map(_.getLong(0)).toSet.intersect(Set(3L, 4L)).isEmpty)
  }

  test("st_dedup_exact registry entry matches the batch distinct count") {
    val stream = graft.operators.Streaming.entries
      .find(_.name == "st_dedup_exact").get.fn(spark, sfDir)
    val batch = Tables(spark, sfDir).documents
      .select(md5(col("text")).as("h")).distinct()
    assert(stream.count() === batch.count())
  }
}
