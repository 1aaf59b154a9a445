package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The canonical bag-of-words document fingerprint: md5 of the
  * space-joined, sorted, distinct whitespace tokens of `text`.
  *
  * ONE definition on purpose: the Bloom-guard pipelines
  * (Dedup.d_bloom_prefilter, Streaming.st_bloom_guard,
  * CorpusStreaming.bloomGuard) build the filter over stored
  * fingerprints and test arriving ones — their "no false negatives"
  * contract holds only while both sides compute the byte-identical
  * expression, so every caller must use this helper rather than inline
  * a copy that can drift (separator, tokenizer, normalization).
  */
object TextFp {

  /** Fingerprint of `textCol`'s bag of words, as a Column. */
  def bagOfWords(textCol: Column): Column =
    md5(array_join(array_sort(array_distinct(split(textCol, " "))), " "))

  /** DuckDB twin of `bagOfWords` over a column reference, for oracles. */
  def bagOfWordsSqlDuck(textExpr: String): String =
    s"md5(array_to_string(list_sort(list_distinct(string_split($textExpr, ' '))), ' '))"
}
