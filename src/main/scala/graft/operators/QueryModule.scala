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
/** Fixed-grid histogram quantile sketch — ONE definition of the bin
  * function and the quantile estimator shared by the batch rollup
  * (q_quantile_sketch_rollup), the streaming maintenance path
  * (EventsStreaming.windowedHistogram), and st_quantile_sketch's
  * derivation, so the three can't silently desynchronize. The SQL
  * oracles textually mirror these constants.
  */
object HistogramSketch {
  val Bins = 4096
  val Domain = 1024.0
  /** Bin width in value units — the quantile estimate's error bound. */
  val Width: Double = Domain / Bins

  import org.apache.spark.sql.functions._

  /** Clamped fixed-grid bin index of a value column. */
  def bin(value: Column, bins: Int = Bins, domain: Double = Domain): Column =
    least(greatest(floor(value / domain * bins), lit(0.0)),
      lit((bins - 1).toDouble)).cast("int")

  /** Quantile-p estimate over a frame carrying (bin, cum, n): the upper
    * edge of the bin where the cumulative count crosses p·n.
    */
  def est(p: Double): Column =
    ((min(when(col("cum").cast("double") >= lit(p) * col("n").cast("double"),
      col("bin"))) + 1).cast("double") * lit(Width))
}

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
