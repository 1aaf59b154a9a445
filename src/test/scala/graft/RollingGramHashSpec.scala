package graft

import graft.plans.RollingGramHash
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** plans.RollingGramHash — the native stride-1 gram-hash kernel behind
  * d_substring_dedup's prefilter. Pins: (1) the rolling update equals a
  * direct per-window polynomial recomputation at every position, (2)
  * equal grams hash equal / the prefilter can have no false negatives,
  * (3) code-point window semantics align with SQL substring on
  * multibyte input, (4) the SQL-registered function agrees with the
  * JVM kernel through codegen.
  */
class RollingGramHashSpec extends SparkSpec {

  private val B = 0x100000001b3L

  /** Direct (non-rolling) reference: h = Σ cp_j · B^(L−1−j) mod 2^64. */
  private def direct(s: String, L: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    (0 to cps.length - L).map { p =>
      var h = 0L
      for (j <- 0 until L) h = h * B + cps(p + j)
      h
    }
  }

  private def kernel(s: String, L: Int): Seq[Long] =
    RollingGramHash.compute(UTF8String.fromString(s), L).toLongArray().toSeq

  test("rolling update equals direct recomputation at every position") {
    val rnd = new scala.util.Random(7)
    for (len <- Seq(1, 5, 39, 40, 41, 200); trial <- 1 to 5) {
      val s = (1 to len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      for (l <- Seq(3, 40)) assert(kernel(s, l) == direct(s, l), s"len=$len L=$l")
    }
  }

  test("equal grams hash equal (no false negatives by construction)") {
    val a = "the quick brown fox jumps over the lazy dog repeatedly and then some"
    val b = "PREFIX then " + a.substring(4, 44) + " SUFFIX"
    val ha = kernel(a, 40)
    val hb = kernel(b, 40)
    assert(hb.contains(ha(4)), "the shared 40-gram must hash identically in both docs")
  }

  test("code-point windows align with SQL substring on multibyte input") {
    // é (2 UTF-8 bytes), 你 (3 bytes), 𝄞 (4 bytes, surrogate pair in UTF-16)
    val s = "abcé你𝄞" * 12
    val l = 7
    val ks = kernel(s, l)
    // SQL-substring the same positions and recompute directly: equality
    // proves the kernel's windows are code-point windows, not byte or
    // UTF-16 windows
    val spark2 = spark
    import spark2.implicits._
    val fromSql = Seq(s).toDF("text")
      .select(expr(s"transform(sequence(1, length(text) - ${l - 1}), p -> substring(text, p, $l))"))
      .head().getAs[scala.collection.Seq[String]](0)
    assert(ks == fromSql.map(g => direct(g, l).head))
  }

  test("SQL function agrees with the JVM kernel (codegen path)") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((1L, "hello world, this is a rolling hash test string"),
      (2L, "short"), (3L, "x" * 40)).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), expr("rolling_gram_hash(text, 40)").as("h"))
      .collect().map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Long]](1).toSeq)).toMap
    assert(got(1L) == kernel("hello world, this is a rolling hash test string", 40))
    assert(got(2L).isEmpty)
    assert(got(3L) == kernel("x" * 40, 40) && got(3L).length == 1)
  }
}
