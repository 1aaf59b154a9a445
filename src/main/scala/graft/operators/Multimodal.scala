package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs as a batched partition-level transform (the JVM
  * equivalent of `mapInPandas` — iterate a partition in fixed-size
  * batches, produce one output row per input row).
  *
  * The decode step is a STUB — no image/audio libraries exist in this
  * container — replaced by a deterministic byte-statistics extractor so
  * the Spark-side contract (schema, batching, partitioning, row
  * alignment) is real and tested. Swap `decodeBatch` for a real decoder
  * (JNI/ONNX/etc.) without touching the plumbing.
  */
object Multimodal extends QueryModule {

  val BatchSize = 64

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("mean_byte", DoubleType),
    StructField("distinct_bytes", IntegerType),
  ))

  /** Synthesize a media table from documents: payload = UTF-8 bytes of
    * the text (deterministic fake image), metadata derived from doc_id.
    */
  def mediaTable(t: Tables): DataFrame =
    t.documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("webp")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (col("doc_id") % 640 + 32).cast("int").as("width"),
        (col("doc_id") % 480 + 32).cast("int").as("height"),
      ).as("meta"))

  /** STUB decode: deterministic byte statistics standing in for pixel
    * decode. Real implementation would decode `payload` per `format`.
    */
  private def decodeBatch(rows: Seq[Row]): Seq[Row] =
    rows.map { r =>
      val docId = r.getLong(0)
      val payload = r.getAs[Array[Byte]](1)
      val meta = r.getStruct(2)
      val mean =
        if (payload.isEmpty) 0.0
        else payload.iterator.map(b => (b & 0xff).toDouble).sum / payload.length
      Row(docId, meta.getString(0), meta.getInt(1), meta.getInt(2),
          payload.length.toLong,
          math.rint(mean * 10000) / 10000,
          payload.iterator.map(b => b & 0xff).toSet.size)
    }

  /** Partition-level batched extraction: groups the partition iterator
    * into BatchSize chunks (the mapInPandas batch shape) and runs the
    * decoder per chunk — bounded memory per task regardless of partition
    * size.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("payload"), col("meta")).rdd
      .mapPartitions(_.grouped(BatchSize).flatMap(decodeBatch))
    spark.createDataFrame(rdd, featureSchema)
  }

  override def entries: Seq[QueryDef] = Seq(
    QueryDef(
      "m_multimodal_meta",
      (s, dir) =>
        extractFeatures(mediaTable(Tables(s, dir))).orderBy("doc_id"),
      None,
    ),
  )
}
