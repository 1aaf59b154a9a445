package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Bloom filter for cross-corpus membership prefiltering —
  * the at-scale shape of "drop every candidate document whose key occurs
  * in a reference set" (benchmark decontamination, blocklist dedup,
  * already-ingested guards; the reference's mark-seen semantics,
  * internal/imap/client.go, is the same idea at mailbox scale).
  *
  * Why not a plain semi join: at 100 TB the candidate corpus side of a
  * `left_semi` shuffles on the join key. A Bloom filter built over the
  * (much smaller) reference side collapses that to a PROJECTION on the
  * corpus side: the bit array travels to executors as a literal inside a
  * codegen'd predicate, survivors (true members + a bounded
  * false-positive trickle) are the only rows that reach the exact
  * verification join. False negatives are impossible, so
  * prefilter + exact join ≡ exact semi join — which keeps the whole
  * pipeline DuckDB-oracle-checkable. This mirrors what AQE's runtime
  * bloom-filter join injection does for equi-joins, but as an explicit,
  * reusable operator the pipeline can apply across jobs (build once,
  * reuse for every ingest batch).
  *
  * Probe positions are k independent `xxhash64(probe_seed, key)` values
  * mod the bit count — Column-expressible on the test side and plain
  * Scala on the build side, with identical results because BOTH sides
  * evaluate the same Spark expression (`probePositions`); no
  * reimplementation drift.
  */
object BloomFilter {

  /** Bit-set union aggregator: input = this row's k probe positions,
    * buffer = the bit array as longs. Partial aggregation makes the
    * build a map-side-combined pass — the driver receives one merged
    * numWords-long array per partition, never row-level data.
    */
  class BitsAgg(numWords: Int) extends Aggregator[Seq[Int], Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](numWords)

    override def reduce(b: Array[Long], probes: Seq[Int]): Array[Long] = {
      probes.foreach { idx => b(idx >>> 6) |= (1L << (idx & 63)) }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** The k probe positions of `key` in an m = numWords*64 bit filter,
    * as an array<int> Column. Shared by build and test sides.
    */
  def probePositions(key: Column, numWords: Int, k: Int): Column = {
    val m = numWords.toLong * 64L
    array((0 until k).map(i => pmod(xxhash64(lit(i), key), lit(m)).cast("int")): _*)
  }

  /** Build the bit array over the reference side's key column. One
    * distributed aggregation; the returned array is small (numWords*8
    * bytes — size for the expected insert count, not the corpus).
    */
  def build(ref: DataFrame, key: Column, numWords: Int, k: Int): Array[Long] = {
    val spark = ref.sparkSession
    import spark.implicits._
    ref.select(probePositions(key, numWords, k).as("probes"))
      .as[Seq[Int]]
      .select(new BitsAgg(numWords).toColumn)
      .head()
  }

  /** Membership-test predicate: true iff every probe bit of `key` is
    * set. Pure codegen'd builtins (xxhash64 / element_at / shiftright)
    * over a literal bit array — applying it to a 100 TB corpus is a
    * scan-side filter, no shuffle, no UDF. Guaranteed true for every
    * key that went into `build`; false positives bounded by
    * (1 - e^(-k·n/m))^k.
    */
  def mightContain(bits: Array[Long], key: Column, k: Int): Column = {
    val words = typedlit(bits.toSeq)
    val probes = probePositions(key, bits.length, k)
    (0 until k).map { i =>
      val idx = element_at(probes, i + 1)
      val word = element_at(words, call_function("shiftright", idx, lit(6)) + 1)
      call_function("shiftright", word, idx.bitwiseAND(lit(63)))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
