package graft

import graft.functions.BpeTokenizer
import graft.functions.BpeTokenizer.Merge
import org.scalatest.funsuite.AnyFunSuite

/** BPE train + encode (functions.BpeTokenizer): the Sennrich textbook
  * corpus's merge sequence pinned by hand under the documented
  * deterministic tie-breaks (count desc, then lexicographically
  * smallest pair), plus the canonical rank-order encode loop.
  */
class BpeTokenizerSpec extends AnyFunSuite {

  private val corpus = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("textbook corpus: the full merge sequence, hand-computed") {
    val merges = BpeTokenizer.learn(corpus, numMerges = 100)
    assert(merges == Seq(
      Merge(0, "e", "s", 9),
      Merge(1, "es", "t", 9),
      Merge(2, "l", "o", 7),
      Merge(3, "lo", "w", 7),
      Merge(4, "e", "w", 6),
      Merge(5, "ew", "est", 6),
      Merge(6, "n", "ewest", 6),
      Merge(7, "d", "est", 3),
      Merge(8, "i", "dest", 3),
      Merge(9, "w", "idest", 3),
      Merge(10, "e", "r", 2),
      Merge(11, "low", "er", 2),
    )) // then no pair ever recurs and training stops on minPairCount
  }

  test("numMerges truncates; minPairCount floors") {
    assert(BpeTokenizer.learn(corpus, numMerges = 3).map(_.merged)
      == Seq("es", "est", "lo"))
    // with floor 7 only the count>=7 merges survive
    assert(BpeTokenizer.learn(corpus, numMerges = 100, minPairCount = 7).map(_.merged)
      == Seq("es", "est", "lo", "low"))
  }

  test("encode: rank order, not left-to-right — 'lowest' -> low + est") {
    val ranks = BpeTokenizer.rankTable(BpeTokenizer.learn(corpus, 100))
    assert(BpeTokenizer.encode("lowest", ranks) == Seq("low", "est"))
    assert(BpeTokenizer.encode("newest", ranks) == Seq("newest"))
    assert(BpeTokenizer.encode("lower", ranks) == Seq("lower"))
    assert(BpeTokenizer.encode("wider", ranks) == Seq("w", "i", "d", "er"))
    // unseen symbols stay single code points
    assert(BpeTokenizer.encode("xyz", ranks) == Seq("x", "y", "z"))
    assert(BpeTokenizer.encode("", ranks) == Seq.empty)
  }

  test("overlapping pairs merge greedily left-to-right within a round") {
    val merges = BpeTokenizer.learn(Seq("aaaa" -> 3L), numMerges = 10)
    // round 0: (a,a) count 9 (3 overlapping pairs x3) -> [aa, aa]
    assert(merges.head == Merge(0, "a", "a", 9))
    assert(merges(1) == Merge(1, "aa", "aa", 3))
    val ranks = BpeTokenizer.rankTable(merges)
    assert(BpeTokenizer.encode("aaaa", ranks) == Seq("aaaa"))
    assert(BpeTokenizer.encode("aaa", ranks) == Seq("aa", "a"))
  }

  test("surrogate pairs stay whole symbols") {
    val merges = BpeTokenizer.learn(Seq("𝄞𝄞" -> 5L), numMerges = 5)
    assert(merges == Seq(Merge(0, "𝄞", "𝄞", 5))) // never split mid-surrogate
    val ranks = BpeTokenizer.rankTable(merges)
    assert(BpeTokenizer.encode("𝄞𝄞", ranks) == Seq("𝄞𝄞"))
    assert(BpeTokenizer.encode("𝄞", ranks) == Seq("𝄞"))
  }

  test("determinism: identical input yields identical merges across runs") {
    val a = BpeTokenizer.learn(corpus, 100)
    val b = BpeTokenizer.learn(corpus.reverse, 100) // input order irrelevant
    assert(a == b)
  }
}
