package graft

import graft.api.Joins
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {

  test("asofJoin attaches the latest prior right row per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "l1"), (1L, 200L, "l2"), (1L, 50L, "l0"),
      (2L, 500L, "l3")).toDF("k", "lts", "lval")
    val right = Seq(
      (1L, 90L, "r90"), (1L, 150L, "r150"), (1L, 200L, "r200"),
      (3L, 10L, "r-other")).toDF("k", "rts", "rval")
    val out = Joins.asofJoin(left, right, "k", "lts", "rts")
      .select(col("k"), col("lts"), col("asof.rval").as("m"))
      .orderBy("k", "lts").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 50L, null),       // no right row at or before 50
      (1L, 100L, "r90"),
      (1L, 200L, "r200"),    // equal timestamps match (rts <= lts)
      (2L, 500L, null)))     // key with no right rows at all
  }

  test("asofJoin matches the oracled window formulation on real events") {
    import spark.implicits._
    val e = Tables(spark, sfDir).events
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("p_us"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id"), unix_micros(col("ts")).as("s_us"))
    val viaAsof = Joins.asofJoin(purchases, signups, "user_id", "p_us", "s_us")
      .select(col("event_id"), col("asof.s_us").as("prior"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    // reference computation: max prior signup via join+agg
    val viaJoin = purchases.as("p")
      .join(signups.as("s"),
        col("p.user_id") === col("s.user_id") && col("s.s_us") <= col("p.p_us"), "left")
      .groupBy(col("p.event_id")).agg(max(col("s.s_us")).as("prior"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(viaAsof.nonEmpty && viaAsof == viaJoin)
  }
}
