package graft

import org.apache.spark.sql.functions._

/** Pins the winnowing properties d_winnow_dedup is built on
  * (Schleimer/Wilkerson/Aiken, SIGMOD'03): the detection GUARANTEE
  * (any shared substring of length >= k + w - 1 yields a shared
  * selected fingerprint, at ANY alignment in either document), the
  * no-false-positive direction (every reported pair shares an exact
  * k-gram by construction of the raw-gram join key), and the
  * selection DENSITY (~2/(w+1) of gram positions on random-like
  * text). The oracle gate covers cross-engine parity at SF; this
  * pins the algorithm itself.
  */
class DedupWinnowSpec extends SparkSpec {

  private val K = 16
  private val W = 8

  /** Deterministic pseudo-random text with no repeated 16-gram. */
  private def noise(seed: Long, n: Int): String = {
    val sb = new StringBuilder
    var x = seed * 6364136223846793005L + 1442695040888963407L
    while (sb.length < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      sb.append(('a' + ((x >>> 33) % 26)).toChar)
    }
    sb.toString
  }

  private def pairsOf(texts: Seq[String]): Set[(Long, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-wn").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.operators.Dedup.entries
      .find(_.name == "d_winnow_dedup").get.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val root = new org.apache.hadoop.fs.Path(dir)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(root, true)
    rows
  }

  test("guarantee: a shared 23-char substring is detected at any alignment pair") {
    val shared = "exactly twentythree chs"  // k + w - 1 = 23 chars
    assert(shared.length == K + W - 1)
    // plant the same substring at a different offset in each doc,
    // embedded in mutually-disjoint noise
    val docs = Seq(
      noise(1, 40) + shared + noise(2, 40),
      noise(3, 7) + shared + noise(4, 73),
      noise(5, 80))
    assert(pairsOf(docs) === Set((0L, 1L)))
  }

  test("no pair without a shared 16-gram") {
    assert(pairsOf(Seq(noise(10, 200), noise(11, 200), noise(12, 200))).isEmpty)
  }

  test("below-guarantee overlap may be missed; at-guarantee overlap never is") {
    // 100 random trials would be flaky by design for the short side;
    // instead pin the boundary: a shared K+W-1 substring is always
    // caught even when everything else differs
    val shared = noise(99, K + W - 1)
    val docs = Seq(shared + noise(20, 60), noise(21, 60) + shared)
    assert(pairsOf(docs) === Set((0L, 1L)))
  }

  test("selection density on random text is near 2/(w+1), and never above 2x it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-wnd").toString
    val t = noise(42, 4000)
    Seq((0L, t, "en", "src0", t.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val nSel = graft.operators.Dedup
      .winnowFingerprints(spark.read.parquet(s"$dir/documents.parquet"), K, W)
      .count().toDouble
    val root = new org.apache.hadoop.fs.Path(dir)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(root, true)
    val positions = (4000 - K + 1).toDouble
    val expected = 2.0 / (W + 1)  // ≈ 0.222
    val density = nSel / positions
    assert(density > expected / 2 && density < expected * 2,
      s"density $density vs expected ~$expected")
  }
}
