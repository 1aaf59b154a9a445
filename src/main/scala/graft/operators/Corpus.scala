package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus hygiene — the mandatory first stage of a real training-data
  * pipeline. The operator family assumes non-null text (a null
  * propagates to null shingle arrays, which explode() then silently
  * drops — the document vanishes from dedup without a trace); `clean`
  * makes that contract explicit and auditable instead of implicit and
  * silent.
  */
object Corpus {

  /** Normalize a (doc_id, text, ...) frame: drop null/whitespace-only
    * text, trim, collapse runs of whitespace to single spaces (token
    * and shingle definitions assume single-space separation), coalesce
    * a null lang to "und" (BCP 47 undetermined) when present.
    */
  def clean(docs: DataFrame): DataFrame = {
    val trimmed = docs
      .filter(col("text").isNotNull)
      .withColumn("text", regexp_replace(trim(col("text")), "\\s+", " "))
      .filter(col("text") =!= "")
    if (trimmed.columns.contains("lang"))
      trimmed.withColumn("lang", coalesce(col("lang"), lit("und")))
    else trimmed
  }

  /** (kept, dropped) counts for ingest auditing — how much of the raw
    * corpus the hygiene stage removed.
    */
  def cleanStats(docs: DataFrame): (Long, Long) = {
    val total = docs.count()
    val kept = clean(docs).count()
    (kept, total - kept)
  }
}
