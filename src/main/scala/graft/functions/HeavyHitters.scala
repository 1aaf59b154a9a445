package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries heavy-hitters summary of capacity k.
  *
  * The exact corpus top-terms query (t_top_terms) must shuffle the FULL
  * term dictionary to count it; at 100 TB that dictionary is itself a
  * large relation. This sketch replaces it with a partial aggregate:
  * each map partition maintains ≤ k counters, the exchange carries one
  * k-entry summary per partition, and summaries merge by pointwise sum
  * followed by the mergeable-summaries trim (subtract the (k+1)-th
  * largest count, drop non-positive counters — Agarwal et al.,
  * "Mergeable Summaries", PODS 2012). The guarantee survives arbitrary
  * merge trees: every reported count is a LOWER bound on the true
  * count, undercounting by at most N/(k+1) for N total tokens, so any
  * term with true frequency above N/(k+1) is guaranteed to be present.
  *
  * Counter updates use the classic decrement step (a new term with all
  * k counters occupied costs every counter one "vote"), which is what
  * bounds memory at k entries regardless of vocabulary size.
  */
class HeavyHitters(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], term: String): Map[String, Long] =
    buf.get(term) match {
      case Some(c) => buf.updated(term, c + 1)
      case None if buf.size < k => buf.updated(term, 1L)
      case None =>
        buf.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse).apply(k)
      sum.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}
