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

  /** File-based stream over the documents parquet (stands in for the
    * continuous feed; the plan downstream is identical). Schema is
    * DERIVED from the parquet footer, never hand-written — the same
    * drift-proofing as EventsStreaming.readEventStream: a hand-coded
    * schema silently coerces regenerated testdata.
    */
  def readDocumentStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(s"$dir/documents.parquet").schema)
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

  /** File-based stream over the embeddings parquet (stands in for a
    * continuous vector feed — e.g. freshly embedded crawl documents).
    * Footer-derived schema, like [[readDocumentStream]].
    */
  def readEmbeddingStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(s"$dir/embeddings.parquet").schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)

  /** All-time ingest guard: drop arriving documents whose bag-of-words
    * fingerprint already exists in the STORED corpus, using a Bloom
    * filter built (batch, functions.BloomFilter.build) over the
    * historical fingerprints. Complements `dedupExact`: the stateful
    * within-watermark dedup catches redelivery bursts with state
    * bounded by one window, while this guard covers ALL history with
    * FIXED memory (the bit array) and ZERO state store — a stateless
    * codegen'd filter. The cost is a bounded false-positive rate: a
    * trickle of genuinely-new docs is dropped (size m/n for the
    * tolerance; false negatives are impossible, so no duplicate ever
    * slips through the guard).
    */
  def bloomGuard(docs: DataFrame, bits: Array[Long], k: Int): DataFrame = {
    val fp = graft.functions.TextFp.bagOfWords(col("text"))
    docs.withColumn("fp", fp)
      .filter(!graft.functions.BloomFilter.mightContain(bits, col("fp"), k))
  }

  /** Incremental ANN-index maintenance: assign each arriving vector its
    * SRP band values. The SRP signature is a PURE FUNCTION of the vector
    * (fixed seeded hyperplanes — api.SrpLsh), so this is a STATELESS
    * streaming projection: no aggregation, no watermark, no state store.
    * New vectors bucket incrementally without touching old ones — the
    * property that makes SRP (unlike kmeans IVF, whose centroids drift
    * as data arrives) the index of choice for a continuously-ingesting
    * corpus. Sink the output to the bucketed index table in append mode.
    */
  /** Streaming Misra-Gries heavy hitters: the k-counter summary IS the
    * streaming state (one bounded map regardless of vocabulary size or
    * stream length — the sketch property that makes all-time top terms
    * feasible on an unbounded stream, where an exact count's state
    * grows with the dictionary). The typed aggregator's partial/merge
    * path is the same mergeable-summaries math the batch entry uses, so
    * micro-batch boundaries can't break the frequency-floor guarantee
    * (every term above n/(k+1) is present; counts never overcount).
    */
  def heavyHitters(docs: DataFrame, k: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "").as[String]
      .groupByKey(_ => 0)
      .agg(new graft.functions.HeavyHitters(k).toColumn.name("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e._1").as("term"), col("e._2").as("est_count"))
  }

  def srpBucketize(vecs: DataFrame, dim: Int, nbits: Int, bandBits: Int): DataFrame =
    graft.api.SrpLsh.bandedSignatures(vecs, "embedding", dim, nbits, bandBits)

  /** Incremental TEXT-LSH index maintenance — the minhash twin of
    * [[srpBucketize]]: each arriving document gets its 8 xxhash64 band
    * keys as a stateless projection (per-row array lambdas, no
    * explode+groupBy aggregation, so no state store and no watermark).
    * Appending (doc_id, j, mh) to the stored band table keeps the batch
    * dedup's candidate join incremental: a new doc's near-duplicates
    * are exactly the stored rows sharing any (j, mh) key, found by
    * lookup instead of a corpus rescan. Row-for-row parity with the
    * batch signature path (Dedup.bandedSignatures64) is pinned by
    * CorpusStreamingSpec.
    */
  def minhashBucketize(docs: DataFrame): DataFrame =
    graft.operators.Dedup.bandedSignaturesRowwise(docs)

  /** Streaming document chunking — arriving documents fan out into
    * their 256/192 sliding-window chunks as a stateless projection
    * (the LITERAL batch t_chunk_overlap plan: shared code, so parity
    * is structural). Feeding a RAG index or a packing stage from a
    * crawl stream is this projection plus a sink; no state store, no
    * watermark, per-doc fan-out stays row-local.
    */
  def chunkOverlap(docs: DataFrame): DataFrame =
    graft.operators.TextAnalysis.chunkOverlap(docs)

  /** Incremental EXACT-SUBSTRING index maintenance — the winnowing
    * twin of [[minhashBucketize]]: each arriving document emits its
    * selected (doc_id, gram) winnowing fingerprints as a stateless
    * projection (a per-partition loop, no explode+groupBy, no state
    * store, no watermark). Appending to the stored fingerprint table
    * keeps d_winnow_dedup's candidate join incremental: a new doc's
    * exact-substring matches (any shared run ≥ 23 chars) are exactly
    * the stored rows sharing a gram — lookup, not corpus rescan.
    * Shares the batch selection code, so stream rows equal batch rows
    * by construction; CorpusStreamingSpec pins the parity.
    */
  def winnowBucketize(docs: DataFrame): DataFrame =
    graft.operators.Dedup.winnowFingerprints(docs)

  /** Streaming DSIR scoring — fit OFFLINE, score ON THE STREAM (the
    * deployment split the DSIR paper assumes: the hashed-ngram models
    * come from a finished target/raw snapshot, then every newly crawled
    * document gets its importance weight on arrival). `lrByBucket` is
    * the fitted 4096-slot per-token log-ratio table
    * (TextAnalysis.dsirModelLogRatios); it rides the plan as an
    * array<double> LITERAL, so scoring is a stateless per-row fold —
    * no join, no aggregation state, no watermark, and each document's
    * weight is complete the moment the row is, which is what lets the
    * sink route/drop documents inline. Emits the batch t_dsir_weight
    * frame (doc_id, n_tokens, logw_bits); zero-token docs are dropped
    * exactly as the batch explode drops them.
    */
  def dsirScore(docs: DataFrame, lrByBucket: Array[Double]): DataFrame =
    docs.select(col("doc_id"), col("text"),
        typedlit(lrByBucket.toSeq).as("lr_tab"))
      .selectExpr("doc_id", "lr_tab",
        "filter(split(text, ' '), t -> t <> '') AS toks")
      .selectExpr("doc_id", "CAST(size(toks) AS BIGINT) AS n_tokens",
        """round(aggregate(toks, CAST(0.0 AS DOUBLE), (acc, t) ->
          |  acc + element_at(lr_tab,
          |    CAST(conv(substring(md5(t), 1, 3), 16, 10) AS INT) + 1)),
          |4) AS logw_bits""".stripMargin)
      .filter(col("n_tokens") > 0)

  /** Streaming CCNet scoring — the dsirScore deployment split applied
    * to CCNet's quality partition (Wenzek et al. 2020 score with a
    * FIXED offline LM — a bounded model by construction, which is what
    * makes the streaming arm honest): the hashed-bucket token counts +
    * total (TextAnalysis.ccnetHashedModel) and the two tercile cuts
    * (fit offline over the same scored snapshot) ride the plan as
    * LITERALS, so every arriving document scores and buckets
    * statelessly — no join, no aggregation state, no watermark. Emits
    * (doc_id, n_tokens, surprisal, cut_head, cut_tail, bucket), the
    * t_ccnet_buckets frame shape on the hashed model; zero-token docs
    * drop as in dsirScore. The same projection serves BATCH cut
    * fitting (it is plain DataFrame ops), so stream rows equal batch
    * rows by construction.
    */
  def ccnetHashedSurprisal(docs: DataFrame, counts: Array[Long], total: Long): DataFrame =
    docs.select(col("doc_id"), col("text"),
        typedlit(counts.toSeq).as("cnt_tab"))
      .selectExpr("doc_id", "cnt_tab",
        "filter(split(text, ' '), t -> t <> '') AS toks")
      .selectExpr("doc_id", "CAST(size(toks) AS BIGINT) AS n_tokens",
        s"""round(aggregate(toks, CAST(0.0 AS DOUBLE), (acc, t) ->
           |  acc + -log2(CAST(element_at(cnt_tab,
           |    CAST(conv(substring(md5(t), 1, 3), 16, 10) AS INT) + 1) AS DOUBLE)
           |    / CAST(${total}L AS DOUBLE)))
           |  / size(toks), 4) AS surprisal""".stripMargin)
      .filter(col("n_tokens") > 0)

  /** Streaming model-quality scoring — the dsirScore/ccnetScore
    * deployment split applied to t_quality_model (the FineWeb-Edu
    * pattern trains its classifier ONCE on an annotated snapshot and
    * scores the crawl with it): the fitted weight table
    * (TextAnalysis.qualityModelWeights — 4096 hashed-bucket slots +
    * bias + capped-length) rides the plan as an array<double> literal
    * plus two scalar literals, so every arriving document scores AND
    * weak-labels statelessly — no join, no aggregation state, no
    * watermark. Emits the batch t_quality_model frame (doc_id, label,
    * score).
    *
    * Arithmetic parity with the batch scorer: the per-row margin sums
    * w_b · (c_b / nt) over the doc's DISTINCT buckets — the identical
    * per-bucket products the batch (doc, bucket)-row aggregate sums,
    * so the two sides differ only in double summation ORDER, which
    * the round(6) score contract absorbs (the same bridge every
    * hashed-model stream twin carries). A zero-token doc scores
    * sigmoid(w_bias) exactly as in batch (its only feature row is the
    * bias slot). The label threads through the REAL gopherRules
    * battery (carry column), not a re-implementation.
    */
  def qualityModelScore(docs: DataFrame, w: Map[String, Double]): DataFrame = {
    val wtab = Array.tabulate(4096)(i => w.getOrElse(f"$i%03x", 0.0))
    val wBias = w.getOrElse("bias", 0.0)
    val wLen = w.getOrElse("len", 0.0)
    val scored = docs.select(col("doc_id"), col("text"),
        typedlit(wtab.toSeq).as("w_tab"))
      .selectExpr("doc_id", "text", "w_tab",
        "filter(split(text, ' '), t -> t <> '') AS toks")
      .selectExpr("doc_id", "text",
        "CAST(size(toks) AS BIGINT) AS nt", "w_tab",
        "transform(toks, t -> CAST(conv(substring(md5(t), 1, 3), 16, 10) AS INT)) AS bks")
      .selectExpr("doc_id", "text",
        s"""round(1.0 / (1.0 + exp(-(
           |  aggregate(array_distinct(bks), CAST(0.0 AS DOUBLE), (acc, b) ->
           |    acc + element_at(w_tab, b + 1) *
           |      (CAST(size(filter(bks, x -> x = b)) AS DOUBLE) / CAST(nt AS DOUBLE)))
           |  + CAST($wBias AS DOUBLE)
           |  + CASE WHEN nt > 0
           |         THEN CAST($wLen AS DOUBLE) * (CAST(LEAST(nt, 200L) AS DOUBLE) / 200.0)
           |         ELSE CAST(0.0 AS DOUBLE) END))), 6) AS score""".stripMargin)
    graft.operators.TextAnalysis.gopherRules(scored, carry = Seq("score"))
      .select(col("doc_id"),
        graft.operators.TextAnalysis.gopherWeakPassCond.as("label"),
        col("score"))
  }

  def ccnetScore(docs: DataFrame, counts: Array[Long], total: Long,
                 cutHead: Double, cutTail: Double): DataFrame =
    ccnetHashedSurprisal(docs, counts, total)
      .select(col("doc_id"), col("n_tokens"), col("surprisal"),
        round(lit(cutHead), 4).as("cut_head"),
        round(lit(cutTail), 4).as("cut_tail"),
        when(col("surprisal") <= cutHead, "head")
          .when(col("surprisal") <= cutTail, "middle")
          .otherwise("tail").as("bucket"))

  /** Streaming k-means ASSIGNMENT — the cluster-index maintenance
    * twin of srpBucketize for Lloyd-clustered corpora: the centroids
    * fit OFFLINE (Similarity.kmeansCentroids — batch, exact
    * fixed-point means) and ride the plan as literal arrays; every
    * arriving vector computes its nearest centroid in one per-row
    * fold — no join, no aggregation, no state store, no watermark.
    * Appending (vec_id, cluster) keeps SemDeDup-style cluster state
    * incremental as the corpus ingests.
    *
    * Arithmetic parity with the batch assign: the per-centroid
    * distance is the IDENTICAL zip_with sequential fold over the
    * identical literal doubles, and array_min over (dist, cid)
    * structs IS the batch min-struct aggregate's comparison — ties
    * resolve to the smaller cid on both sides. CorpusStreamingSpec
    * pins row-for-row stream==batch equality.
    */
  def kmeansAssign(vecs: DataFrame, cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val cc = cents.sortBy(_._1)
    // each distance is computed ONCE (Catalyst does no CSE inside HOF
    // lambdas — a CASE-based running-min fold would evaluate the
    // 64-dim fold twice per centroid); array_min over (dist, cid)
    // structs is the LITERAL batch min-struct semantics, ties to the
    // smaller cid
    vecs.select(col("vec_id"), col("embedding"),
        typedlit(cc.map(_._2)).as("cents_t"),
        typedlit(cc.map(_._1)).as("cids_t"))
      .selectExpr("vec_id",
        """array_min(zip_with(cents_t, cids_t, (ct, ci) ->
          |  named_struct('d', aggregate(zip_with(embedding, ct,
          |      (a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)),
          |      CAST(0.0 AS DOUBLE), (acc, x) -> acc + x),
          |    'c', ci))) AS best""".stripMargin)
      .select(col("vec_id"), col("best.c").as("cluster"),
        round(col("best.d"), 6).as("dist"))
  }

  /** Streaming decontamination SCRUB — the guard in front of the
    * training pipe: every arriving document loses each span whose
    * stride-1 `gramLen`-char gram appears in the (offline, batch-built)
    * eval/benchmark gram set, so leaked eval material is excised
    * WHOLESALE before a doc ever reaches storage. Stateless per row —
    * no join, no aggregation, no watermark: the eval set rides as a
    * broadcast (bounded by the eval corpus, which is tiny by nature —
    * the same boundedness claim d_decontaminate's broadcast makes;
    * ~1 MB at the gate) and each doc mark-merge-cuts its own spans in
    * one per-partition loop. A typed kernel, not an expression: the
    * only expression-level alternative probes a 10³–10⁴-element
    * array literal per position (array_contains is a linear scan —
    * O(len·|eval|·L) per doc); the hash-set probe is O(len·L). Emits
    * the batch decontaminateScrub frame (doc_id, text, n_removed);
    * row-for-row batch parity is CorpusStreamingSpec's pin, and an
    * eval doc arriving IN the stream self-scrubs to empty (every one
    * of its positions is marked by construction).
    */
  def decontaminateScrub(docs: DataFrame, evalGrams: Set[String],
                         gramLen: Int = 40): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val L = gramLen
    val bc = spark.sparkContext.broadcast(evalGrams)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val set = bc.value
        it.map { case (id, t) =>
          // CODE-POINT windows and counts, not UTF-16 units: the eval
          // gram set and the batch twin both use SQL substring/length
          // semantics (code points), so a supplementary character
          // upstream of a leaked span must not shift the window and
          // n_removed must count what the batch counts. cpOff(i) is
          // the UTF-16 offset of code point i.
          val nCp = t.codePointCount(0, t.length)
          val cpOff = new Array[Int](nCp + 1)
          var o = 0
          var ci = 0
          while (ci < nCp) {
            cpOff(ci) = o
            o += Character.charCount(t.codePointAt(o))
            ci += 1
          }
          cpOff(nCp) = t.length
          val sb = new StringBuilder
          var e = 0    // cut end, code points
          var kept = 0 // kept code points
          var p = 0
          val last = nCp - L
          while (p <= last) {
            if (set.contains(t.substring(cpOff(p), cpOff(p + L)))) {
              if (p >= e) {
                sb.append(t.substring(cpOff(e), cpOff(p)))
                kept += p - e
              }
              e = math.max(e, p + L)
            }
            p += 1
          }
          val tailStart = math.min(e, nCp)
          sb.append(t.substring(cpOff(tailStart), t.length))
          kept += nCp - tailStart
          (id, sb.toString, (nCp - kept).toLong)
        }
      }
      .toDF("doc_id", "text", "n_removed")
  }

  /** Streaming decontamination DROP — the flag-and-drop twin of
    * [[decontaminateScrub]], giving the stream pipe the same guard
    * prepareWeb's `decontam_keep` arm gives the batch pipe: an
    * arriving document DROPS ENTIRELY if ANY of its stride-1
    * `gramLen`-char grams appears in the (offline, batch-built)
    * eval/benchmark gram set — the GPT-3 appendix C / PaLM §6.1
    * filter at exact-substring strength. Stateless per row (broadcast
    * hash-set probe, no state store, no watermark), and the probe
    * SHORT-CIRCUITS on the first marked gram, so a leaked doc costs
    * less than the scrub's full marking pass and a clean doc the same
    * O(len·L). Emits surviving (doc_id, text) rows — row-identical to
    * the batch anti join (Dedup.contaminatedPositions reduced to
    * DISTINCT doc_ids, dropped); an eval doc arriving IN the stream
    * drops itself (every one of its grams is in the set).
    */
  def decontaminateDrop(docs: DataFrame, evalGrams: Set[String],
                        gramLen: Int = 40): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val L = gramLen
    val bc = spark.sparkContext.broadcast(evalGrams)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val set = bc.value
        it.filterNot { case (_, t) =>
          // CODE-POINT windows, not UTF-16 units — the eval gram set
          // and the batch twin use SQL substring/length semantics
          // (decontaminateScrub's convention; cpOff(i) is the UTF-16
          // offset of code point i)
          val nCp = t.codePointCount(0, t.length)
          val cpOff = new Array[Int](nCp + 1)
          var o = 0
          var ci = 0
          while (ci < nCp) {
            cpOff(ci) = o
            o += Character.charCount(t.codePointAt(o))
            ci += 1
          }
          cpOff(nCp) = t.length
          var leaked = false
          var p = 0
          val last = nCp - L
          while (!leaked && p <= last) {
            leaked = set.contains(t.substring(cpOff(p), cpOff(p + L)))
            p += 1
          }
          leaked
        }
      }
      .toDF("doc_id", "text")
  }
}
