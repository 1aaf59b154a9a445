package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events.ts contract adapter: every supported testdata generation
  * must normalize to the same TimestampType instants, and an unsupported
  * generation must fail with ONE actionable message (not 80 downstream
  * analysis exceptions, which is what the round-4 drift produced).
  */
class EventTimeSpec extends SparkSpec {

  test("testdata contract probe: events.ts dtype is a supported generation") {
    val dt = spark.read.parquet(s"$sfDir/events.parquet")
      .schema.find(_.name == "ts").map(_.dataType)
    assert(dt.exists(EventTime.isSupported),
      s"$sfDir/events.parquet ts dtype ${dt.map(_.sql)} not in: ${EventTime.supported}")
  }

  test("Tables.events normalizes ts to TimestampType with sane range") {
    val ev = Tables(spark, sfDir).events
    assert(ev.schema("ts").dataType == TimestampType)
    // the generated corpus spans weeks in 2024-ish time; a contract bug
    // (the round-4 silent arm) collapses everything into ~1970
    val r = ev.agg(min(year(col("ts"))), max(year(col("ts")))).collect()(0)
    assert(r.getInt(0) >= 2000 && r.getInt(1) <= 2100, r.toString)
  }

  test("nanos-as-long generation converts with micros floor division") {
    import spark.implicits._
    val df = Seq(1704067200123456789L, 999L).toDF("ts")
    val out = EventTime.normalizeTs(df, "synthetic")
    assert(out.schema("ts").dataType == TimestampType)
    val micros = out.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
    assert(micros.toSeq == Seq(0L, 1704067200123456L))
  }

  test("TIMESTAMP_NTZ generation reinterprets as UTC instant, micros exact") {
    import spark.implicits._
    val base = Seq(1704067200123456L, 42L).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(base.schema("ts").dataType == TimestampNTZType)
    val out = EventTime.normalizeTs(base, "synthetic")
    assert(out.schema("ts").dataType == TimestampType)
    val micros = out.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
    assert(micros.toSeq == Seq(42L, 1704067200123456L))
  }

  test("TimestampType generation passes through unchanged") {
    import spark.implicits._
    val base = Seq(7L).toDF("us").select(timestamp_micros(col("us")).as("ts"))
    val out = EventTime.normalizeTs(base, "synthetic")
    assert(out.select(unix_micros(col("ts"))).collect()(0).getLong(0) == 7L)
  }

  test("an unknown generation fails loudly, naming file and dtype") {
    import spark.implicits._
    val df = Seq("2024-01-01").toDF("ts")
    val e = intercept[IllegalStateException] {
      EventTime.normalizeTs(df, "/some/events.parquet")
    }
    assert(e.getMessage.contains("/some/events.parquet"))
    assert(e.getMessage.contains("STRING"))
    assert(e.getMessage.contains(EventTime.supported))
  }
}
