package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Chunk-level dedup semantics: earliest doc keeps a shared chunk, later
  * docs lose it, fully-duplicated docs vanish, chunk order inside a doc
  * is preserved on reassembly.
  */
class LineDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("shared chunk survives only in the earliest doc") {
    // chunkTokens=2: doc 1 = [a b][c d], doc 2 = [a b][x y]
    val out = Dedup.lineDedup(docs(1L -> "a b c d", 2L -> "a b x y"), chunkTokens = 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(1L) === "a b c d")
    assert(out(2L) === "x y")
  }

  test("a fully-duplicated doc vanishes") {
    val out = Dedup.lineDedup(docs(1L -> "a b c d", 2L -> "a b c d"), chunkTokens = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, "a b c d", 2L)))
  }

  test("within-doc repeated chunk is kept once, at its first position") {
    val out = Dedup.lineDedup(docs(1L -> "a b z z a b"), chunkTokens = 2)
      .collect().map(r => (r.getString(1), r.getLong(2))).head
    assert(out === ("a b z z", 2L))
  }

  test("reassembly preserves chunk order and the short tail chunk") {
    // 5 tokens at chunkTokens=2 → chunks [a b][c d][e]
    val out = Dedup.lineDedup(docs(1L -> "a b c d e"), chunkTokens = 2)
      .collect().head
    assert(out.getString(1) === "a b c d e")
    assert(out.getLong(2) === 3L)
  }

  test("registry entry runs on the corpus and never grows it") {
    val d = Tables(spark, sfDir).documents
    val out = SparkEntry.queries("d_line_dedup")(spark, sfDir)
    assert(out.count() <= d.count())
    // total surviving chunks < total chunks iff any cross-doc duplicate
    // exists; at minimum nothing is duplicated INTO existence
    val totalChunks = d.select(
      sum(expr("(size(split(text, ' ')) - 1) div 10 + 1"))).collect().head.getLong(0)
    val keptChunks = out.agg(sum("n_chunks")).collect().head.getLong(0)
    assert(keptChunks <= totalChunks)
    assert(keptChunks > 0)
  }
}
