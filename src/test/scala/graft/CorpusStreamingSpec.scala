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

  test("st_bloom_guard admits no stored duplicate and drops only an FP trickle") {
    val admitted = graft.operators.Streaming.entries
      .find(_.name == "st_bloom_guard").get.fn(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val d = Tables(spark, sfDir).documents
    val fp = graft.functions.TextFp.bagOfWords(col("text"))
    val hist = d.filter(col("doc_id") % 10 < 3).select(fp.as("fp")).distinct()
    val exactNew = d.filter(col("doc_id") % 10 >= 3)
      .select(col("doc_id"), fp.as("fp"))
      .join(hist, Seq("fp"), "left_anti")
      .select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // no false negatives in the filter ⇒ every stored fingerprint is
    // rejected ⇒ admitted is a subset of the exact anti join
    assert(admitted.subsetOf(exactNew))
    // and the genuinely-new docs lost to false positives are a trickle
    // bounded by the sizing formula (m/n ≈ 873 here ⇒ ~0 expected)
    assert((exactNew -- admitted).size <= 2, s"dropped ${(exactNew -- admitted).size}")
    assert(admitted.nonEmpty)
  }

  test("streaming SRP bucketize matches the batch banded signatures row for row") {
    // the signature is a pure function of the vector, so the streaming
    // projection and the batch call must agree EXACTLY — this is the
    // property that makes the index incrementally maintainable
    val streamed = graft.operators.Streaming.entries
      .find(_.name == "st_srp_bucketize").get.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val batch = graft.api.SrpLsh.bandedSignatures(
        Tables(spark, sfDir).embeddings.select("vec_id", "embedding"),
        "embedding", dim = 64, nbits = 16, bandBits = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming minhash bucketize matches the batch banded signatures row for row") {
    // same property for the TEXT index: the per-row lambda path
    // (stateless streaming projection) and the batch explode+groupBy
    // path must produce identical (doc_id, j, mh) rows — seeds, band
    // grouping, and hash argument types are pinned to each other
    val streamed = graft.operators.Streaming.entries
      .find(_.name == "st_minhash_bucketize").get.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val docs = Tables(spark, sfDir).documents
    val batch = graft.operators.Dedup.bandedSignatures64(
        graft.operators.Dedup.shingles(docs))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming winnow fingerprints match the batch selection row for row") {
    val streamed = graft.operators.Streaming.entries
      .find(_.name == "st_winnow_bucketize").get.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val batch = graft.operators.Dedup
      .winnowFingerprints(Tables(spark, sfDir).documents)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming DSIR scores match the batch t_dsir_weight row for row") {
    val streamed = graft.operators.Streaming.entries
      .find(_.name == "st_dsir_score").get.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val batch = SparkEntry.queries("t_dsir_weight")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming quality-model scores match the batch t_quality_model row for row") {
    // offline-fit weights as plan literals, per-row distinct-bucket
    // margin — must reproduce the batch trainer+scorer's (doc_id,
    // label, score) exactly (round(6) bridges summation order)
    val streamed = graft.operators.Streaming.entries
      .find(_.name == "st_quality_model").get.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2))).sorted.toSeq
    val batch = SparkEntry.queries("t_quality_model")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2))).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming k-means assignment matches the batch s_kmeans_clusters row for row") {
    // offline-fit centroids as plan literals, per-row argmin fold —
    // must reproduce the batch crossJoin+min-struct assignment exactly
    // (identical literal doubles, identical sequential folds,
    // first-minimum fold == smaller-cid tie-break)
    val streamed = graft.operators.Streaming.entries
      .find(_.name == "st_kmeans_assign").get.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sorted.toSeq
    val batch = SparkEntry.queries("s_kmeans_clusters")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming decontamination scrub matches the batch helper row for row") {
    // the typed hash-set kernel must reproduce the batch declarative
    // scrub (broadcast semi join + doc-local aggregate fold) exactly,
    // character for character — including eval docs arriving in the
    // stream, which self-scrub to empty
    import org.apache.spark.sql.functions.col
    val streamed = graft.operators.Streaming.entries
      .find(_.name == "st_decontaminate_scrub").get.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val d = Tables(spark, sfDir).documents
    val batch = graft.operators.Dedup
      .decontaminateScrub(d.select(col("doc_id"), col("text")),
        d.filter(col("doc_id") % 97 === 0))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(streamed.nonEmpty)
    // eval docs long enough to have grams (all their positions are in
    // the set by construction) must self-scrub to empty
    val evalIds = d.filter(col("doc_id") % 97 === 0)
      .filter(org.apache.spark.sql.functions.length(col("text")) >= 40)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(evalIds.nonEmpty)
    streamed.filter(t => evalIds(t._1)).foreach { case (_, text, _) =>
      assert(text.isEmpty, "an eval doc in the stream must self-scrub to empty")
    }
    assert(streamed === batch)
  }

  test("streaming decontamination drop matches the batch anti join row for row") {
    // the short-circuiting hash-set probe must keep EXACTLY the docs
    // the batch pipe keeps (contaminatedPositions → DISTINCT doc_id →
    // anti join) — the arm-symmetry contract: a doc the batch
    // decontam_keep stage would drop must never ride the stream pipe
    import org.apache.spark.sql.functions.col
    val streamed = graft.operators.Streaming.entries
      .find(_.name == "st_decontaminate_drop").get.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val d = Tables(spark, sfDir).documents
    val ev = d.filter(col("doc_id") % 97 === 0)
    val batch = d.select(col("doc_id"), col("text"))
      .join(graft.operators.Dedup
          .contaminatedPositions(d.select(col("doc_id"), col("text")), ev)
          .select("doc_id").distinct(),
        Seq("doc_id"), "left_anti")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(streamed.nonEmpty)
    // eval docs long enough to carry grams drop themselves; the drop
    // is non-idle on the gate corpus
    val evalIds = ev.filter(org.apache.spark.sql.functions.length(col("text")) >= 40)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(evalIds.nonEmpty)
    val streamedIds = streamed.map(_._1).toSet
    assert(evalIds.forall(!streamedIds.contains(_)),
      "an eval doc in the stream must drop itself")
    assert(streamed === batch)
  }

  test("streaming chunk fan-out matches the batch t_chunk_overlap row for row") {
    val streamed = graft.operators.Streaming.entries
      .find(_.name == "st_chunk_overlap").get.fn(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val batch = SparkEntry.queries("t_chunk_overlap")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }
}
