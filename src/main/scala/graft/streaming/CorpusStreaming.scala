package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming corpus intake: the dedup family's exact-hash stage as a
  * continuous pipeline. A training-data ingest that receives documents
  * continuously (crawl drops, upload feeds) wants the FIRST copy of each
  * text admitted and later copies dropped at the door — the streaming
  * twin of d_dedup_exact.
  *
  * State shape: `dropDuplicatesWithinWatermark` keeps one (text_hash)
  * key in state only until the watermark passes its event time + delay,
  * so state is bounded by the hash cardinality of one watermark window —
  * never the all-time corpus. (All-time exact dedup at rest remains the
  * batch d_dedup_exact over the stored table; the stream guard exists to
  * keep redelivery bursts and crawl echoes out of the hot path.)
  */
object CorpusStreaming {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-based stream over the documents parquet (stands in for the
    * continuous feed; the plan downstream is identical).
    */
  def readDocumentStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** Admit only the first-within-watermark copy of each text. Input must
    * carry an event-time column `ts`; the watermark delay is how long a
    * duplicate can arrive late and still be dropped.
    */
  def dedupExact(docs: DataFrame, delay: String = "1 hour"): DataFrame =
    docs.withColumn("text_hash", md5(col("text")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("text_hash")
}
