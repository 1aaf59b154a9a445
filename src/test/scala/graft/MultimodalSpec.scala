package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media table carries binary payload + typed metadata") {
    val df = Multimodal.mediaTable(Tables(spark, sfDir))
    val schema = df.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    assert(df.count() == 500)
  }

  test("feature extraction aligns one output row per input, deterministic") {
    val t = Tables(spark, sfDir)
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(t))
    val rows = feats.orderBy("doc_id").collect()
    assert(rows.length == 500)
    // n_bytes equals payload length (= text UTF-8 length)
    val expected = t.documents.selectExpr("doc_id", "CAST(length(text) AS BIGINT) AS n")
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(rows.map(_.getLong(4)).sameElements(expected))
    // stable across runs
    val again = Multimodal.extractFeatures(Multimodal.mediaTable(t))
      .orderBy("doc_id").collect()
    assert(rows.sameElements(again))
  }

  test("batching covers partitions larger and smaller than BatchSize") {
    val t = Tables(spark, sfDir)
    val one = Multimodal.extractFeatures(Multimodal.mediaTable(t).repartition(1))
    val many = Multimodal.extractFeatures(Multimodal.mediaTable(t).repartition(97))
    assert(one.count() == 500 && many.count() == 500)
  }
}
