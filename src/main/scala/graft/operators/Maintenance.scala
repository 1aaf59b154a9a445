package graft.operators

import graft.Tables
import graft.functions.ZOrder
import graft.sources.{Compaction, Merge, Retention}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Table-maintenance operators: the upkeep a continuously ingested
  * parquet table needs that queries don't express (ClickHouse does the
  * equivalent as background part merges and multi-column ORDER BY keys
  * on its parts — clickhouse.go:79-228).
  */
object Maintenance extends QueryModule {
  import Det._

  /** Daily rollup of an events slice — the materialized view
    * w_rollup_refresh maintains. Each day's row is computed from that
    * day's rows alone, so a day can be refreshed independently.
    */
  private def dailyAgg(events: org.apache.spark.sql.DataFrame) =
    events.groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("total_value"))

  /** events projected to the two layout dimensions z-ordering interleaves:
    * the low 16 bits of user_id and of the epoch-day of ts. Both lanes are
    * non-negative and < 2^16 by construction.
    */
  private def zDims(events: org.apache.spark.sql.DataFrame) =
    events.select(
      col("event_id"),
      col("user_id").bitwiseAND(lit(65535L)).as("u16"),
      // FLOOR division via pmod-subtraction, exact in integer space:
      // plain `/`+cast truncates toward zero and Spark's `div` does too,
      // but the DuckDB oracle's `//` floors — they'd disagree on any
      // pre-1970 timestamp. (x - pmod(x, d)) is an exact multiple of d
      // within double's 2^53, so the division is exact for either sign.
      ((unix_micros(col("ts")) - pmod(unix_micros(col("ts")), lit(86400000000L)))
        / 86400000000L).cast("long")
        .bitwiseAND(lit(65535L)).as("d16"))

  private val u16Sql = "(user_id & 65535)"
  private val d16Sql = "((EPOCH_US(CAST(ts AS TIMESTAMP)) // 86400000000) & 65535)"

  override def entries: Seq[QueryDef] = Seq(
    // data-quality audit panel: the constraint checks a continuously
    // ingested fact table runs before publishing a partition (the
    // Deequ/dbt-test staples) — null keys, domain ranges, duplicate
    // primary keys, referential orphans — as ONE registry entry whose
    // row-level checks ride a single scan (conditional sums), with the
    // key/referential checks as two anti-join counts and one
    // group-having count. Every check is a plain aggregate: at 100 TB
    // each is one map-side-combined pass, and the orphan checks shuffle
    // only keys.
    QueryDef(
      "q_dq_checks",
      (s, dir) => {
        val t = Tables(s, dir)
        val l = t.lineitem
        val rowChecks = l.agg(
            sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("null_shipdate"),
            sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("nonpositive_quantity"),
            sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L).otherwise(0L)).as("discount_out_of_range"),
            sum(when(col("l_tax") < 0, 1L).otherwise(0L)).as("negative_tax"))
          .selectExpr(
            """stack(4,
              |  'null_shipdate', null_shipdate,
              |  'nonpositive_quantity', nonpositive_quantity,
              |  'discount_out_of_range', discount_out_of_range,
              |  'negative_tax', negative_tax) AS (check_name, n_viol)""".stripMargin)
        val dupKey = l.groupBy("l_orderkey", "l_linenumber")
          .agg(count(lit(1)).as("n")).filter(col("n") > 1)
          .agg(count(lit(1)).as("n_viol"))
          .select(lit("duplicate_line_key").as("check_name"), col("n_viol"))
        val orphanLine = l.join(t.orders, col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n_viol"))
          .select(lit("orphan_lineitem").as("check_name"), col("n_viol"))
        val orphanOrder = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("n_viol"))
          .select(lit("orphan_order").as("check_name"), col("n_viol"))
        rowChecks.unionByName(dupKey).unionByName(orphanLine).unionByName(orphanOrder)
          .orderBy("check_name")
      },
      Some("""SELECT 'null_shipdate' AS check_name, COUNT(*) FILTER (WHERE l_shipdate IS NULL) AS n_viol FROM lineitem
             |UNION ALL
             |SELECT 'nonpositive_quantity', COUNT(*) FILTER (WHERE l_quantity <= 0) FROM lineitem
             |UNION ALL
             |SELECT 'discount_out_of_range', COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) FROM lineitem
             |UNION ALL
             |SELECT 'negative_tax', COUNT(*) FILTER (WHERE l_tax < 0) FROM lineitem
             |UNION ALL
             |SELECT 'duplicate_line_key', COUNT(*) FROM (
             |  SELECT l_orderkey, l_linenumber FROM lineitem
             |  GROUP BY 1, 2 HAVING COUNT(*) > 1)
             |UNION ALL
             |SELECT 'orphan_lineitem', COUNT(*) FROM lineitem
             |  ANTI JOIN orders ON l_orderkey = o_orderkey
             |UNION ALL
             |SELECT 'orphan_order', COUNT(*) FROM orders
             |  ANTI JOIN customer ON o_custkey = c_custkey
             |ORDER BY 1""".stripMargin),
    ),
    // ANALYZE TABLE twin: per-column optimizer statistics (row count,
    // null count, exact NDV, min/max) for the CBO-feeding maintenance
    // pass every warehouse schedules. One scan computes all row-level
    // stats as conditional aggregates; NDVs are per-column exact
    // distinct aggregates (count_distinct partial-aggregates map-side).
    // min/max stringify only the string/int/date columns — double
    // min/max is deliberately excluded from the string surface (double
    // → VARCHAR formatting is not cross-engine stable).
    QueryDef(
      "q_table_stats",
      (s, dir) => {
        // r16: widened (keyless, q1's pattern) — the multi-countDistinct
        // plans as an Expand that multiplies every row 5× BEFORE the
        // first exchange, all single-core on the unsplittable gate file;
        // column pruning still reaches the scan through the repartition
        val l = Par.widen(Tables(s, dir).lineitem)
        def nulls(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L))
        // ONE aggregate over one scan (the multi-countDistinct plans as
        // a single Expand-fed hash aggregate, not four jobs)
        l.agg(
            count(lit(1)).as("n_rows"),
            nulls("l_orderkey").as("nu_ok"), countDistinct(col("l_orderkey")).as("nd_ok"),
            min(col("l_orderkey")).cast("string").as("mn_ok"),
            max(col("l_orderkey")).cast("string").as("mx_ok"),
            nulls("l_linenumber").as("nu_ln"), countDistinct(col("l_linenumber")).as("nd_ln"),
            min(col("l_linenumber")).cast("string").as("mn_ln"),
            max(col("l_linenumber")).cast("string").as("mx_ln"),
            nulls("l_returnflag").as("nu_rf"), countDistinct(col("l_returnflag")).as("nd_rf"),
            min(col("l_returnflag")).cast("string").as("mn_rf"),
            max(col("l_returnflag")).cast("string").as("mx_rf"),
            nulls("l_shipdate").as("nu_sd"), countDistinct(col("l_shipdate")).as("nd_sd"),
            min(col("l_shipdate")).cast("date").cast("string").as("mn_sd"),
            max(col("l_shipdate")).cast("date").cast("string").as("mx_sd"))
          .selectExpr(
            """stack(4,
              |  'l_orderkey',   n_rows, nu_ok, nd_ok, mn_ok, mx_ok,
              |  'l_linenumber', n_rows, nu_ln, nd_ln, mn_ln, mx_ln,
              |  'l_returnflag', n_rows, nu_rf, nd_rf, mn_rf, mx_rf,
              |  'l_shipdate',   n_rows, nu_sd, nd_sd, mn_sd, mx_sd)
              |AS (column_name, n_rows, n_nulls, n_distinct, min_str, max_str)""".stripMargin)
          .orderBy("column_name")
      },
      Some("""SELECT 'l_orderkey' AS column_name, COUNT(*) AS n_rows,
             |  COUNT(*) FILTER (WHERE l_orderkey IS NULL) AS n_nulls,
             |  COUNT(DISTINCT l_orderkey) AS n_distinct,
             |  CAST(MIN(l_orderkey) AS VARCHAR) AS min_str,
             |  CAST(MAX(l_orderkey) AS VARCHAR) AS max_str FROM lineitem
             |UNION ALL
             |SELECT 'l_linenumber', COUNT(*),
             |  COUNT(*) FILTER (WHERE l_linenumber IS NULL),
             |  COUNT(DISTINCT l_linenumber),
             |  CAST(MIN(l_linenumber) AS VARCHAR), CAST(MAX(l_linenumber) AS VARCHAR) FROM lineitem
             |UNION ALL
             |SELECT 'l_returnflag', COUNT(*),
             |  COUNT(*) FILTER (WHERE l_returnflag IS NULL),
             |  COUNT(DISTINCT l_returnflag),
             |  CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR) FROM lineitem
             |UNION ALL
             |SELECT 'l_shipdate', COUNT(*),
             |  COUNT(*) FILTER (WHERE l_shipdate IS NULL),
             |  COUNT(DISTINCT l_shipdate),
             |  CAST(CAST(MIN(l_shipdate) AS DATE) AS VARCHAR),
             |  CAST(CAST(MAX(l_shipdate) AS DATE) AS VARCHAR) FROM lineitem
             |ORDER BY 1""".stripMargin),
    ),
    // Z-order (Morton) code per row: the sort key a multi-dimensional
    // layout rewrite clusters by. Fully oracled — the DuckDB twin
    // unrolls the SAME shift-or-mask ladder (one Steps list feeds both
    // engines), so the gate pins every bit of the curve. Pure
    // projection: no shuffle, whole-stage codegen over bit ops.
    QueryDef(
      "q_zorder_code",
      (s, dir) => {
        val d = zDims(Tables(s, dir).events)
        d.select(col("event_id"), col("u16"), col("d16"),
            ZOrder.morton16(col("u16"), col("d16")).as("z"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, $u16Sql AS u16, $d16Sql AS d16,
              |${ZOrder.mortonSql(u16Sql, d16Sql)} AS z
              |FROM events ORDER BY event_id""".stripMargin),
    ),
    // Z-order layout rewrite, demonstrated end to end: range-partition
    // the events table by its morton code (so each output file covers a
    // small rectangle of (user, day) space), write, and report the
    // layout INVARIANTS the rewrite must establish: every row kept, 16
    // files, global dimension bounds intact, and per-file z-ranges
    // disjoint (what makes footer-stat pruning work on EITHER
    // dimension). Invariants rather than per-file rectangles because
    // RangePartitioner's sampled boundaries are seeded by the RDD id,
    // which varies with session execution order — the rectangles are
    // run-dependent, the invariants are not, so this entry is fully
    // DuckDB-oracled while the write path keeps the scale-true
    // sampled-range shape. ZOrderSpec still pins the curve bit-for-bit
    // against a JVM reference and proves the pruning claim against a
    // linear layout.
    QueryDef(
      "w_zorder",
      (s, dir) => {
        val coded = zDims(Tables(s, dir).events)
          .withColumn("z", ZOrder.morton16(col("u16"), col("d16")))
        val table = java.nio.file.Files.createTempDirectory("graft-zorder").toString
        coded.repartitionByRange(16, col("z"))
          .sortWithinPartitions("z")
          .write.mode("overwrite").parquet(table)
        // per-file stats (16 rows — bounded) → layout invariants
        val stats = s.read.parquet(table)
          .groupBy(input_file_name().as("file"))
          .agg(min("z").as("min_z"), max("z").as("max_z"),
               min("u16").as("min_u"), max("u16").as("max_u"),
               min("d16").as("min_d"), max("d16").as("max_d"),
               count(lit(1)).as("n_rows"))
          .collect()
        val root = new Path(table)
        root.getFileSystem(s.sparkContext.hadoopConfiguration).delete(root, true)
        val byZ = stats.sortBy(_.getAs[Long]("min_z"))
        val disjoint = byZ.iterator.zip(byZ.iterator.drop(1)).forall {
          case (a, b) => a.getAs[Long]("max_z") <= b.getAs[Long]("min_z")
        }
        import s.implicits._
        Seq((
          stats.map(_.getAs[Long]("n_rows")).sum,
          stats.length.toLong,
          stats.map(_.getAs[Long]("min_u")).min,
          stats.map(_.getAs[Long]("max_u")).max,
          stats.map(_.getAs[Long]("min_d")).min,
          stats.map(_.getAs[Long]("max_d")).max,
          disjoint,
        )).toDF("total_rows", "n_files", "min_u", "max_u", "min_d", "max_d",
                "z_ranges_disjoint")
      },
      Some(s"""SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
              |CAST(16 AS BIGINT) AS n_files,
              |CAST(MIN($u16Sql) AS BIGINT) AS min_u,
              |CAST(MAX($u16Sql) AS BIGINT) AS max_u,
              |CAST(MIN($d16Sql) AS BIGINT) AS min_d,
              |CAST(MAX($d16Sql) AS BIGINT) AS max_d,
              |TRUE AS z_ranges_disjoint
              |FROM events""".stripMargin),
    ),
    // small-file compaction, demonstrated end to end: fragment the
    // events table into a month-partitioned tree of deliberately tiny
    // files (8 writer tasks × every month — the shape a streaming sink
    // leaves behind), compact, and report per-partition file counts.
    // Rows-only: file layout has no DuckDB twin; CompactionSpec pins
    // row-set preservation, in-file sort order, and that below-threshold
    // partitions stay byte-identical.
    QueryDef(
      "w_compact",
      (s, dir) => {
        import s.implicits._
        val table = java.nio.file.Files.createTempDirectory("graft-compact").toString
        val events = Tables(s, dir).events
        events.withColumn("month", date_format(col("ts"), "yyyyMM"))
          .repartition(8)
          .write.mode("overwrite").partitionBy("month").parquet(table)
        val reports = Compaction.compactTable(
          s, table, sortCols = Seq("ts", "event_id"),
          targetBytes = 512L << 20, minFiles = 2)
        // integrity gate before discarding the rewrite: the compacted
        // table must still hold every row
        val after = s.read.parquet(table).count()
        val expected = events.count()
        require(after == expected, s"compaction dropped rows: $after != $expected")
        val out = reports
          .map(r => (r.partition, r.filesBefore.toLong, r.filesAfter.toLong))
          .toDF("partition", "files_before", "files_after")
          .orderBy("partition")
        val root = new Path(table)
        root.getFileSystem(s.sparkContext.hadoopConfiguration).delete(root, true)
        out
      },
      // ORACLED: the accounting frame is closed-form — repartition(8)
      // round-robins every month's (thousands of) rows across all 8
      // writer tasks, so files_before is exactly 8, and the 512 MB
      // target collapses each small partition to want=1 file. The gate
      // hash-checks the whole fragment→compact→report loop against that
      // form; CompactionSpec still pins row preservation and in-file
      // order on the bytes themselves.
      Some("""SELECT 'month=' || strftime(CAST(ts AS DATE), '%Y%m') AS partition,
             |CAST(8 AS BIGINT) AS files_before, CAST(1 AS BIGINT) AS files_after
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
    // keyed MERGE into a day-partitioned snapshot, demonstrated end to
    // end: replay a corrected batch (5% of the newest day re-valued)
    // plus fresh rows landing on that day, then report per-partition
    // before/updated/inserted/after accounting. Only the touched days
    // are read or rewritten — the ReplacingMergeTree convergence
    // discipline as an O(touched) maintenance pass. Rows-only: file
    // layout has no DuckDB twin; UpsertSpec pins value replacement,
    // key uniqueness, and untouched-partition byte-identity.
    QueryDef(
      "w_upsert",
      (s, dir) => {
        import s.implicits._
        val table = java.nio.file.Files.createTempDirectory("graft-upsert").toString
        val events = Tables(s, dir).events
          .withColumn("day", date_format(col("ts"), "yyyyMMdd"))
        events.write.mode("overwrite").partitionBy("day").parquet(table)

        val maxDay = events.agg(max("day")).collect()(0).getString(0)
        val corrections = events
          .filter(col("day") === maxDay && pmod(col("event_id"), lit(20)) === 0)
          .withColumn("value", col("value") + 1000.0)
        val inserts = events
          .filter(col("day") === maxDay && pmod(col("event_id"), lit(100)) === 1)
          .withColumn("event_id", col("event_id") + 10000000L)
        val reports = Merge.upsertPartitioned(
          s, table, corrections.unionByName(inserts), "event_id", "day")

        val out = reports
          .map(r => (r.partition, r.rowsBefore, r.updated, r.inserted, r.rowsAfter))
          .toDF("partition", "rows_before", "updated", "inserted", "rows_after")
          .orderBy("partition")
        val root = new Path(table)
        root.getFileSystem(s.sparkContext.hadoopConfiguration).delete(root, true)
        out
      },
      // ORACLED: the touched-partition accounting recomputes in SQL —
      // the one touched day is MAX(day), updated = the correction keys
      // present there (event_id % 20 = 0), inserted = the fresh keys
      // (% 100 = 1, shifted past the id range so nothing collides), and
      // rows_after = before + inserted. The gate hash-checks the merge's
      // bookkeeping; UpsertSpec pins the value replacement on the bytes.
      Some("""WITH e AS (SELECT event_id, strftime(CAST(ts AS DATE), '%Y%m%d') AS day FROM events),
             |t AS (SELECT * FROM e WHERE day = (SELECT MAX(day) FROM e))
             |SELECT 'day=' || day AS partition,
             |COUNT(*) AS rows_before,
             |COUNT(*) FILTER (WHERE event_id % 20 = 0) AS updated,
             |COUNT(*) FILTER (WHERE event_id % 100 = 1) AS inserted,
             |COUNT(*) + COUNT(*) FILTER (WHERE event_id % 100 = 1) AS rows_after
             |FROM t GROUP BY day ORDER BY 1""".stripMargin),
    ),
    // incremental MATERIALIZED-VIEW refresh, fully oracled: a daily
    // rollup table is built from a stale snapshot (everything before
    // noon of the newest day), late data "arrives", and the refresh
    // recomputes ONLY the days the new batch touches — one partition's
    // aggregation + a keyed merge of those rows — never the whole view.
    // The DuckDB oracle is the full recompute (plain GROUP BY over all
    // events): the gate hash-checks that stale-state + per-day refresh
    // CONVERGES to exactly the from-scratch answer, which is the whole
    // correctness claim of incremental view maintenance. At 100 TB the
    // refresh cost is O(touched days), not O(table).
    QueryDef(
      "w_rollup_refresh",
      (s, dir) => {
        import s.implicits._
        val table = java.nio.file.Files.createTempDirectory("graft-mv").toString
        val e = Tables(s, dir).events
          .withColumn("day", date_format(col("ts"), "yyyyMMdd"))
        val maxDay = e.agg(max("day")).collect()(0).getString(0)
        val cutoff = expr(s"to_timestamp('$maxDay', 'yyyyMMdd') + INTERVAL 12 HOURS")
        // stale view: built before the newest day finished
        dailyAgg(e.filter(col("ts") < cutoff))
          .write.mode("overwrite").partitionBy("day").parquet(table)
        // late data lands; refresh recomputes exactly the touched days
        val touched = e.filter(col("ts") >= cutoff).select("day").distinct()
        val refreshed = dailyAgg(e.join(broadcast(touched), "day"))
        Merge.upsertPartitioned(s, table, refreshed, "day", "day")
        // harness-only collect: the refreshed VIEW is a daily rollup,
        // O(days) rows by construction (30 here, ~36k for a century) —
        // bounded driver traffic regardless of fact-table scale; the
        // refresh itself above never leaves the executors
        val rows = s.read.parquet(table)
          .select(col("day").cast("string"), col("n_events"), col("total_value"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        val root = new Path(table)
        root.getFileSystem(s.sparkContext.hadoopConfiguration).delete(root, true)
        rows.toSeq.toDF("day", "n_events", "total_value").orderBy("day")
      },
      Some("""SELECT strftime(CAST(ts AS DATE), '%Y%m%d') AS day,
             |COUNT(*) AS n_events,
             |CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))),2) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
    // partition-expiry retention, demonstrated end to end: day-partition
    // the events table, expire everything before the newest 10 days
    // (ALTER TABLE ... DROP PARTITION semantics on plain parquet — a
    // directory delete per expired partition, nothing read or
    // rewritten), and report what was dropped plus a `kept` marker row
    // per surviving partition. The Spark-side claim that matters at
    // 100 TB: retention cost is O(expired partitions) metadata work.
    // Rows-only: file layout has no DuckDB twin; RetentionSpec pins the
    // drop boundary, survivor byte-identity, and idempotence.
    QueryDef(
      "w_retention",
      (s, dir) => {
        import s.implicits._
        val table = java.nio.file.Files.createTempDirectory("graft-retain").toString
        val events = Tables(s, dir).events
          .withColumn("day", date_format(col("ts"), "yyyyMMdd"))
        // one file per day partition (each day's rows land in exactly one
        // shuffle task) — file counts become a function of the DATA, so
        // the accounting frame below is closed-form for the oracle
        events.repartition(col("day"))
          .write.mode("overwrite").partitionBy("day").parquet(table)
        val days = Compaction.partitionStats(s, table).map(_.partition.split("=", 2)(1)).sorted
        val cutoff = days.takeRight(10).head
        val dropped = Retention.dropPartitionsBefore(s, table, cutoff)
        val kept = Compaction.partitionStats(s, table)
        val out = (dropped.map(p => (p.partition, "dropped", p.files.toLong)) ++
            kept.map(p => (p.partition, "kept", p.files.toLong)))
          .toDF("partition", "status", "files")
          .orderBy("partition")
        val root = new Path(table)
        root.getFileSystem(s.sparkContext.hadoopConfiguration).delete(root, true)
        out
      },
      // ORACLED: the drop boundary is pure SQL — cutoff is the 10th-
      // newest distinct day (everything older is dropped, the newest 10
      // kept; a table under 10 days old keeps everything), and the
      // single-file-per-day write makes `files` identically 1. The gate
      // hash-checks the boundary arithmetic; RetentionSpec pins survivor
      // byte-identity and idempotence on the bytes.
      Some("""WITH d AS (SELECT DISTINCT strftime(CAST(ts AS DATE), '%Y%m%d') AS day FROM events),
             |c AS (SELECT coalesce(
             |  (SELECT day FROM d ORDER BY day DESC OFFSET 9 LIMIT 1),
             |  (SELECT MIN(day) FROM d)) AS cutoff)
             |SELECT 'day=' || day AS partition,
             |CASE WHEN day < cutoff THEN 'dropped' ELSE 'kept' END AS status,
             |CAST(1 AS BIGINT) AS files
             |FROM d, c ORDER BY 1""".stripMargin),
    ),
  )
}
