package graft.operators

import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One named query: the Spark implementation plus (when SQL-expressible)
  * the ANSI-SQL oracle DuckDB runs over the same parquet tables.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

trait QueryModule {
  def entries: Seq[QueryDef]
}

/** Determinism helpers shared by all modules.
  *
  * The driver hash-compares Spark output against DuckDB output, so every
  * floating aggregate must be bit-identical across engines:
  *   - money/quantity sums go through DECIMAL(18,2) (exact, order-free),
  *     then round+cast back to double for a schema both engines agree on;
  *   - ratios divide two exact sums as doubles (IEEE ops on identical
  *     inputs are identical), then round;
  *   - output timestamps are epoch-micros BIGINT or DATE, never raw
  *     timestamps (parquet TIMESTAMP(NANOS) reaches the two engines at
  *     different precisions).
  */
object Det {
  val Money: DecimalType = DecimalType(18, 2)

  /** Exact order-independent sum of a 2-decimal double column, as double. */
  def moneySum(c: Column): Column =
    round(sum(c.cast(Money)), 2).cast("double")

  /** Deterministic ratio (pct) of two exact decimal sums. */
  def pct(num: Column, den: Column, scale: Int = 2): Column =
    round(sum(num.cast(Money)).cast("double") * 100.0 /
      sum(den.cast(Money)).cast("double"), scale)
}
