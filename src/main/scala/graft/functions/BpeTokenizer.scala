package graft.functions

import scala.collection.mutable

/** Byte-pair-encoding tokenizer: the train + apply pair a large-scale
  * training-data pipeline runs over its corpus (the reference's
  * analytics stop at token COUNTING — utils.go has no tokenizer — so
  * this is part of the LLM-pipeline surface, not a port).
  *
  * The scale architecture is the standard one every production BPE
  * trainer uses (Sennrich's original, HuggingFace tokenizers,
  * sentencepiece in word mode): the corpus collapses to a WORD
  * HISTOGRAM first — distinct pre-tokens with counts, bounded
  * (~10⁷ rows at 100 TB, ≪ corpus) — and the merge loop runs over
  * that table, weighting every pair by word frequency. On Spark the
  * histogram is one map-side-combined groupBy; the merge loop is
  * driver-side over the bounded table; applying the learned merges is
  * a broadcast of the rank table + an embarrassingly-parallel map.
  *
  * Determinism contract (everything here is hash-gated): merges break
  * count ties on lexicographically smallest (left, right); training
  * input is capped to the `maxWords` most frequent words (ties on the
  * word string) with merges stopping below `minPairCount`.
  */
object BpeTokenizer {

  final case class Merge(rank: Int, left: String, right: String, pairCount: Long) {
    def merged: String = left + right
  }

  /** Classical BPE over a word histogram: repeatedly merge the
    * most-frequent adjacent symbol pair (weighted by word counts).
    * Symbols start as single code points.
    */
  def learn(wordCounts: Seq[(String, Long)], numMerges: Int,
            minPairCount: Long = 2L): Seq[Merge] = {
    // each distinct word: its current symbol sequence + frequency
    val words: Array[(mutable.ArrayBuffer[String], Long)] = wordCounts.iterator
      .filter(_._1.nonEmpty)
      .map { case (w, c) =>
        val syms = mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          syms += new String(Character.toChars(cp))
          i += Character.charCount(cp)
        }
        (syms, c)
      }
      .toArray

    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var continueLoop = true
    while (rank < numMerges && continueLoop) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) continueLoop = false
      else {
        // deterministic argmax: count desc, then (left, right) asc
        val best = pairCounts.iterator.reduceLeft { (a, b) =>
          if (b._2 > a._2 ||
              (b._2 == a._2 &&
                (b._1._1 < a._1._1 ||
                  (b._1._1 == a._1._1 && b._1._2 < a._1._2)))) b else a
        }
        if (best._2 < minPairCount) continueLoop = false
        else {
          val (l, r) = best._1
          val joined = l + r
          words.foreach { case (syms, _) =>
            var i = 0
            while (i + 1 < syms.length) {
              if (syms(i) == l && syms(i + 1) == r) {
                syms(i) = joined
                syms.remove(i + 1)
                // a new merge may immediately chain with the previous
                // symbol; step back so `aaa` under merge (a,a) yields
                // the same greedy left-to-right result as re-scanning
                if (i > 0) i -= 1
              } else i += 1
            }
          }
          merges += Merge(rank, l, r, best._2)
          rank += 1
        }
      }
    }
    merges.result()
  }

  /** Apply learned merges to one pre-token: repeatedly merge the
    * LOWEST-RANK pair present (the canonical BPE encode loop — rank
    * order, not left-to-right order).
    */
  def encode(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val syms = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      syms += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j + 1 < syms.length) {
        ranks.get((syms(j), syms(j + 1))).foreach { rk =>
          if (rk < bestRank) { bestRank = rk; bestAt = j }
        }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        // merge EVERY occurrence of the chosen pair this round (same
        // result as one-at-a-time since the pair's rank stays minimal)
        val (l, r) = (syms(bestAt), syms(bestAt + 1))
        var k = 0
        while (k + 1 < syms.length) {
          if (syms(k) == l && syms(k + 1) == r) {
            syms(k) = l + r
            syms.remove(k + 1)
          } else k += 1
        }
      }
    }
    syms.toSeq
  }

  /** Rank lookup for [[encode]] from [[learn]]'s output. */
  def rankTable(merges: Seq[Merge]): Map[(String, String), Int] =
    merges.map(m => (m.left, m.right) -> m.rank).toMap
}
