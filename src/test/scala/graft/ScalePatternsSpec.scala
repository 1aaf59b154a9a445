package graft

import graft.functions.TopKAggregator
import graft.operators.Scale
import graft.streaming.KafkaJsonIntake
import org.apache.spark.sql.functions._

class ScalePatternsSpec extends SparkSpec {

  test("salted aggregation is bit-identical to direct aggregation") {
    val e = Tables(spark, sfDir).events
    val salted = Scale.saltedSum(e, col("event_type"), col("value"), 16)
      .withColumnRenamed("k", "event_type").orderBy("event_type").collect().toSeq
    val direct = e.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("total_value"))
      .orderBy("event_type").collect().toSeq
    assert(salted == direct && salted.nonEmpty)
  }

  test("typed TopK aggregator matches groupBy-count-sort-limit") {
    import spark.implicits._
    // distributed per-term count (map-side combined), then the typed
    // aggregator keeps only k entries per partition instead of a global
    // sort over every distinct term
    val counted = Tables(spark, sfDir).documents
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
    val topK = counted
      .groupByKey(_ => 0) // corpus-wide
      .agg(new TopKAggregator(10).toColumn)
      .collect().head._2
    val expected = Tables(spark, sfDir).documents
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("term")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(topK == expected)
  }

  test("TopK aggregator reduces counted pairs correctly across merges") {
    import spark.implicits._
    val pairs = Seq(("a", 5L), ("b", 3L), ("a", 2L), ("c", 9L), ("b", 1L))
      .toDS().repartition(3)
    // pre-counted pairs: aggregator keeps largest entries, so feed totals
    val totals = pairs.groupByKey(_._1).mapGroups((k, it) => (k, it.map(_._2).sum))
    val top2 = totals.groupByKey(_ => 0).agg(new TopKAggregator(2).toColumn)
      .collect().head._2
    assert(top2 == Seq(("c", 9L), ("a", 7L)))
  }

  test("kafka-json intake round-trips events and flags corrupt payloads") {
    import spark.implicits._
    val e = Tables(spark, sfDir).events
    val asJson = e.select(to_json(struct(
      col("event_id"), unix_micros(col("ts")).as("ts_us"), col("user_id"),
      col("event_type"), col("value"), col("props"))).as("value"))
    val back = KafkaJsonIntake.parseEvents(asJson)
    assert(back.filter(col("_corrupt")).count() == 0)
    val a = back.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy("event_id").collect().toSeq
    val b = e.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy("event_id").collect().toSeq
    assert(a == b)

    val corrupt = KafkaJsonIntake.parseEvents(Seq("not json at all").toDF("value"))
    assert(corrupt.filter(col("_corrupt")).count() == 1)
  }

  test("config-gated intake falls back to the file twin without Kafka env") {
    val df = KafkaJsonIntake.events(spark, sfDir, env = Map.empty)
    assert(df.isStreaming)
    assert(df.schema.fieldNames.toSet ==
      Set("event_id", "ts", "user_id", "event_type", "value", "props"))
  }

  test("kafka intake schema matches the file-twin schema (source-agnostic downstream)") {
    import spark.implicits._
    val kafkaShaped = KafkaJsonIntake.parseEvents(
      Seq("""{"event_id":1,"ts_us":0,"user_id":1,"event_type":"x","value":1.0,"props":"{}"}""")
        .toDF("value")).drop("_corrupt")
    val fileTwin = graft.streaming.EventsStreaming.readEventStream(spark, sfDir)
    assert(kafkaShaped.schema == fileTwin.schema)
  }
}
