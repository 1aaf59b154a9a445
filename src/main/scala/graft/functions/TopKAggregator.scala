package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k Aggregator: keeps only the k largest (count, key) pairs
  * per group on the map side, so a corpus-wide "top terms" never sorts
  * or shuffles the full term frequency table — each partition ships at
  * most k entries. Deterministic tiebreak: higher count first, then
  * lexicographically smaller key.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]] {

  private def ord: Ordering[(String, Long)] =
    Ordering.by[(String, Long), (Long, String)] { case (key, n) => (-n, key) }

  override def zero: Seq[(String, Long)] = Seq.empty

  private def trim(s: Seq[(String, Long)]): Seq[(String, Long)] =
    s.sorted(ord).take(k)

  override def reduce(buf: Seq[(String, Long)], in: (String, Long)): Seq[(String, Long)] =
    trim(buf :+ in)

  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
    trim(a ++ b)

  override def finish(r: Seq[(String, Long)]): Seq[(String, Long)] = trim(r)

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
