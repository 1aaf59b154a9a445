package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** d_substring_dedup — ExactSubstr duplicated-span removal (Lee et al.
  * 2021). The load-bearing pin is full equality against an independent
  * JVM brute-force recomputation (count every stride-1 gram, mark,
  * merge, cut) on a corpus exercising every edge: cross-doc mints,
  * within-doc self-repeats, sub-L docs, fully-duplicated docs, and
  * multi-island documents whose kept segments must reassemble in order.
  */
class SubstringDedupSpec extends SparkSpec {

  import spark.implicits._

  private val L = 40

  /** Reference implementation: O(corpus²) memory-local, no Spark. */
  private def brute(docs: Seq[(Long, String)]): Map[Long, (String, Long)] = {
    val counts = scala.collection.mutable.Map[String, Int]()
    for ((_, t) <- docs; i <- 0 to t.length - L)
      counts.updateWith(t.substring(i, i + L))(c => Some(c.getOrElse(0) + 1))
    docs.map { case (id, t) =>
      val marked = (0 to t.length - L).filter(i => counts(t.substring(i, i + L)) >= 2)
      val sb = new StringBuilder
      var e = 0
      for (p <- marked) {
        if (p >= e) sb.append(t.substring(e, p))
        e = math.max(e, p + L)
      }
      sb.append(t.substring(math.min(e, t.length)))
      (id, (sb.toString, (t.length - sb.length).toLong))
    }.toMap
  }

  /** Unique-vocabulary doc text (cross-doc gram collisions impossible
    * unless minted below).
    */
  private def body(i: Int, words: Int): String =
    (1 to words).map(j => s"d${i}w$j").mkString(" ")

  private def corpus: Seq[(Long, String)] = {
    val originals = (0 until 20).map(i => (i.toLong, body(i, 40)))
    // embedded 160-char prefix copies of every 4th doc, unique tails
    val mints = (0 until 20 by 4).map { i =>
      (100L + i, originals(i)._2.take(160) + s" UNIQ_$i")
    }
    val selfRepeat = Seq((200L, ("repeatme " * 30).trim)) // self-dup, wiped
    val short = Seq((201L, "tiny doc under forty chars")) // no grams
    val exact = Seq((202L, body(21, 40)), (203L, body(21, 40))) // full dup pair
    originals ++ mints ++ selfRepeat ++ short ++ exact
  }

  test("equals a brute-force JVM recomputation on every edge case") {
    val expected = brute(corpus)
    val got = Dedup.substringDedup(corpus.toDF("doc_id", "text"), L)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    assert(got.keySet == expected.keySet)
    for ((id, exp) <- expected)
      assert(got(id) == exp, s"doc $id: got ${got(id)}, expected $exp")
  }

  test("both copies of a minted span lose it; unique content survives") {
    val out = Dedup.substringDedup(corpus.toDF("doc_id", "text"), L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .map(t => t._1 -> (t._2, t._3)).toMap
    // the original keeps its post-prefix tail, loses the shared prefix
    val (origText, origRemoved) = out(0L)
    assert(origRemoved > 0 && !origText.contains("d0w1 ") && origText.nonEmpty)
    // the mint keeps only (a suffix reaching) its unique tail
    val (mintText, mintRemoved) = out(100L)
    assert(mintText.endsWith(" UNIQ_0") && mintRemoved > 0)
    // a doc that is nothing but self-repeats leaves an empty residual
    assert(out(200L)._1.isEmpty && out(200L)._2 == ("repeatme " * 30).trim.length)
    // sub-L and unique docs pass through untouched
    assert(out(201L) == (("tiny doc under forty chars", 0L)))
    assert(out(1L) == ((body(1, 40), 0L)))
    // an exact-duplicate pair is wiped on BOTH sides
    assert(out(202L)._1.isEmpty && out(203L)._1.isEmpty)
  }

  test("decontaminateScrub cuts only eval-leaked spans (brute-checked)") {
    val evalText = body(90, 50)
    val train = Seq(
      (1L, body(70, 40)),                                   // clean
      (2L, body(71, 6) + " " + evalText.substring(0, 80) +
        " " + body(72, 6)),                                 // embedded leak
      (3L, "short"))                                        // sub-L
    // brute reference: mark a position iff its gram appears in the
    // eval set, merge, cut
    val evalGrams = (0 to evalText.length - L)
      .map(i => evalText.substring(i, i + L)).toSet
    val expected = train.map { case (id, t) =>
      val marked = (0 to t.length - L).filter(i => evalGrams(t.substring(i, i + L)))
      val sb = new StringBuilder
      var e = 0
      for (p <- marked) {
        if (p >= e) sb.append(t.substring(e, p))
        e = math.max(e, p + L)
      }
      sb.append(t.substring(math.min(e, t.length)))
      (id, (sb.toString, (t.length - sb.length).toLong))
    }.toMap
    val got = Dedup.decontaminateScrub(
        train.toDF("doc_id", "text"),
        Seq((900L, evalText)).toDF("doc_id", "text"), L)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    assert(got == expected)
    // the leak host loses eval content but keeps both its connectors
    assert(got(2L)._2 > 0)
    assert(got(2L)._1.contains("d71w1") && got(2L)._1.contains("d72w1"))
    assert(!got(2L)._1.contains("d90w1 "))
    // clean and sub-L docs untouched; eval docs are not in the output
    assert(got(1L) == ((body(70, 40), 0L)) && got(3L) == (("short", 0L)))
    assert(!got.contains(900L))
  }

  test("stream scrub kernel windows by CODE POINTS (astral-char batch parity)") {
    // é/你 are multi-byte in UTF-8 and 𝄞 is a SURROGATE PAIR in UTF-16:
    // the typed kernel must window, cut, and count in code points
    // (SQL substring/length semantics) or a supplementary character
    // upstream of a leaked span shifts every window and the leak
    // survives the stream while the batch scrub excises it
    val e = "a𝄞bé你c" * 20 // 120 code points, 140 UTF-16 units
    val trainDf = Seq((1L, e + " " + body(96, 15)), (2L, body(97, 15)))
      .toDF("doc_id", "text")
    val evalDf = Seq((900L, e)).toDF("doc_id", "text")
    val batch = Dedup.decontaminateScrub(trainDf, evalDf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val evalGrams = evalDf
      .filter(length(col("text")) >= 40)
      .select(explode(expr(Dedup.strideGramArrayExpr(40))).as("g"))
      .distinct().as[String].collect().toSet
    val stream = graft.streaming.CorpusStreaming.decontaminateScrub(trainDf, evalGrams)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(batch.exists(_._3 > 0), "fixture must actually scrub")
    assert(stream == batch)
  }

  test("multi-island doc reassembles kept segments in order") {
    // one doc embeds TWO separated spans of another doc, so its marked
    // positions form two islands with a kept gap between them
    val a = body(50, 60)
    val hostText = body(51, 10) + " " + a.substring(0, 60) + " " +
      body(52, 10) + " " + a.substring(120, 180) + " " + body(53, 10)
    val docs = Seq((1L, a), (2L, hostText))
    val expected = brute(docs)
    val got = Dedup.substringDedup(docs.toDF("doc_id", "text"), L)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    assert(got == expected)
    // the host keeps all three of its own unique connector segments
    val kept = got(2L)._1
    Seq("d51w1", "d52w1", "d53w1").foreach(w => assert(kept.contains(w)))
    assert(kept.indexOf("d51w1") < kept.indexOf("d52w1") &&
      kept.indexOf("d52w1") < kept.indexOf("d53w1"))
  }
}
