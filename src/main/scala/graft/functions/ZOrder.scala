package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve codes for multi-dimensional data layout.
  *
  * A table sorted by ONE column prunes file scans only for predicates on
  * that column; sorting by the interleaved bits of TWO columns keeps each
  * written file inside a small rectangle of (a, b) space, so parquet
  * min/max footer stats prune scans for predicates on EITHER column —
  * the layout trick ClickHouse approximates with multi-column ORDER BY
  * keys (/root/reference/internal/storage/clickhouse/clickhouse.go:79-228
  * sorts parts by (date, org, domain)) and that lakehouse engines expose
  * as OPTIMIZE ... ZORDER BY. At 100 TB this is the difference between a
  * full scan and touching a handful of files for a point-ish query on a
  * second dimension.
  *
  * The bit-spread uses the classic shift-or-mask ladder; both the Column
  * implementation and the SQL twin (for the DuckDB oracle) derive from
  * the SAME `Steps` list so the two engines cannot silently diverge.
  * Everything stays in non-negative BIGINT space: inputs are masked to
  * 16 bits, codes occupy 32 bits.
  */
object ZOrder {

  /** (shift, mask) ladder spreading the low 16 bits of x so one zero bit
    * separates each payload bit: x16 -> x0x0...x0 (32 bits).
    */
  private val Steps: Seq[(Int, Long)] = Seq(
    (8, 0x00FF00FFL),
    (4, 0x0F0F0F0FL),
    (2, 0x33333333L),
    (1, 0x55555555L),
  )

  /** Spread the low 16 bits of `x` across 32 bits (gap bit between each). */
  def spread16(x: Column): Column =
    Steps.foldLeft(x.cast("bigint").bitwiseAND(lit(0xFFFFL))) {
      case (acc, (s, m)) => acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  /** Z-order code interleaving the low 16 bits of `a` (even bit lanes)
    * and `b` (odd bit lanes); result in [0, 2^32).
    */
  def morton16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Reference JVM implementation (specs compare the Column expression
    * against this bit-by-bit).
    */
  def morton16Ref(a: Long, b: Long): Long = {
    def spread(x0: Long): Long =
      Steps.foldLeft(x0 & 0xFFFFL) { case (x, (s, m)) => (x | (x << s)) & m }
    spread(a) | (spread(b) << 1)
  }

  /** DuckDB-dialect SQL of spread16 over expression text `e` — the same
    * ladder unrolled textually (16 copies of the base expression; DuckDB
    * folds them).
    */
  def spreadSql(e: String): String =
    Steps.foldLeft(s"($e & 65535)") {
      case (cur, (s, m)) => s"(($cur | ($cur << $s)) & $m)"
    }

  /** DuckDB-dialect SQL of morton16 over expression texts `a`, `b`. */
  def mortonSql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"
}
