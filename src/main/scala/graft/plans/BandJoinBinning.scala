package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite an inner join whose condition carries a band
  * predicate `abs(x - y) <= w` (BIGINT sides from opposite inputs, w a
  * positive literal) but NO equi-conjunct into a binned equi-join.
  *
  * Without an equality Spark can only run such a join as a
  * BroadcastNestedLoopJoin — O(|L|·|R|) comparisons regardless of how
  * narrow the band is, the classic scale cliff of event-correlation
  * queries (`/root/reference` exposes interval predicates through its
  * SQL surface; at 100 TB a nested loop over two event sets is not
  * runnable). The rewrite is the standard binning scheme the composed
  * `api.Joins.rangeJoin` applies by hand, lifted into Catalyst so ANY
  * band join — spark.sql text, DataFrame expr, a BI tool's generated
  * SQL — gets the hash plan automatically:
  *
  *   L ⋈ R on abs(x−y) ≤ w
  *     →  explode(L, bin ∈ {x div w − 1, x div w, x div w + 1})
  *        ⋈ R on binL = (y div w)  AND abs(x−y) ≤ w
  *
  * Every |x−y| ≤ w pair lands in adjacent-or-equal width-w bins (for
  * truncating division the jump points are spaced w apart, so a
  * length-w interval crosses at most one), hence probing the three
  * neighbor bins loses nothing; the original band predicate stays in
  * the join condition and drops the false candidates. Cost becomes
  * 3·|L| + |R| shuffled rows hash-joined on the bin key — AQE-sizable,
  * skew-splittable — with per-bin occupancy bounding the compare count.
  *
  * The rule fires only when no equi-conjunct spans the inputs (if one
  * exists, Spark already hash-joins on it and the band is a cheap
  * post-filter) — which also makes the rewrite idempotent under the
  * fixed-point optimizer batch, since the output join carries the bin
  * equality. Self-joins arrive with deduplicated attribute ids (the
  * analyzer re-aliases), so side attribution via `references` is exact.
  */
object BandJoinBinning extends Rule[LogicalPlan] with PredicateHelper {

  private case class Band(lExpr: Expression, rExpr: Expression, width: Long)

  /** abs(x − y) ≤ w (or <) with x, y deterministic BIGINT expressions
    * resolving to opposite join inputs.
    */
  private def matchBand(conjunct: Expression, left: LogicalPlan,
                        right: LogicalPlan): Option[Band] = {
    def sides(x: Expression, y: Expression, w: Long): Option[Band] = {
      if (w <= 0 || x.dataType != LongType || y.dataType != LongType ||
          !x.deterministic || !y.deterministic) None
      else if (x.references.nonEmpty && x.references.subsetOf(left.outputSet) &&
               y.references.nonEmpty && y.references.subsetOf(right.outputSet))
        Some(Band(x, y, w))
      else if (x.references.nonEmpty && x.references.subsetOf(right.outputSet) &&
               y.references.nonEmpty && y.references.subsetOf(left.outputSet))
        Some(Band(y, x, w))
      else None
    }
    conjunct match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(w: Long, LongType)) =>
        sides(x, y, w)
      case LessThan(Abs(Subtract(x, y, _), _), Literal(w: Long, LongType)) =>
        sides(x, y, w) // |d| < w ⟹ |d| ≤ w: same ±1-bin coverage
      case GreaterThanOrEqual(Literal(w: Long, LongType), Abs(Subtract(x, y, _), _)) =>
        sides(x, y, w)
      case _ => None
    }
  }

  private def isEquiAcross(conjunct: Expression, left: LogicalPlan,
                           right: LogicalPlan): Boolean = {
    def spans(x: Expression, y: Expression): Boolean =
      (x.references.subsetOf(left.outputSet) && y.references.subsetOf(right.outputSet) ||
        x.references.subsetOf(right.outputSet) && y.references.subsetOf(left.outputSet)) &&
        x.references.nonEmpty && y.references.nonEmpty
    conjunct match {
      case EqualTo(x, y)       => spans(x, y)
      case EqualNullSafe(x, y) => spans(x, y)
      case _                   => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val band =
        if (conjuncts.exists(isEquiAcross(_, left, right))) None
        else conjuncts.iterator.flatMap(matchBand(_, left, right)).nextOption()
      band match {
        case None => j
        case Some(b) =>
          val w = Literal(b.width, LongType)
          def binOf(e: Expression): Expression = new IntegralDivide(e, w)
          val one = Literal(1L, LongType)
          val probeBins = CreateArray(Seq(
            Subtract(binOf(b.lExpr), one), binOf(b.lExpr), Add(binOf(b.lExpr), one)))
          val gen = Explode(probeBins)
          val binL = AttributeReference("_graft_band_bin",
            LongType, nullable = gen.elementSchema.head.nullable)()
          val probed = Generate(gen, unrequiredChildIndex = Nil, outer = false,
            qualifier = None, generatorOutput = Seq(binL), child = left)
          val binR = Alias(binOf(b.rExpr), "_graft_band_bin_r")()
          val build = Project(right.output :+ binR, right)
          val newCond = (EqualTo(binL, binR.toAttribute) +: conjuncts).reduce(And)
          // project back to the original output: bin columns are internal
          Project(j.output, Join(probed, build, Inner, Some(newCond), hint))
      }
  }
}
