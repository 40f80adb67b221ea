package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst optimizer rule: rewrites an inner join whose condition is a
  * pure range predicate — `p >= lo AND p <= hi` with `p` from one side
  * and `lo`/`hi` from the other — into the bin-bucketed equi-join of
  * [[graft.operators.RangeJoin]]. Without this, Spark has no equi-key
  * and plans BroadcastNestedLoopJoin: every range-join query silently
  * degenerates to |L|·|R| comparisons.
  *
  * Shape produced (exact result preserved — the bin is a necessary
  * condition, and the original predicate re-filters above the join):
  *
  *   Project(origOutput,
  *     Filter(p >= lo && p <= hi,
  *       Join(Project(left, _graft_bin = floorDiv(p, W)),
  *            Generate(explode(sequence(floorDiv(lo,W), floorDiv(hi,W))), right),
  *            Inner, _graft_bin = _graft_bin_r)))
  *
  * Opt-in: set `spark.graft.rangeJoin.binWidth` to a positive long
  * (≈ the typical interval width). Guards: exactly the two range
  * conjuncts (nothing else — so a re-pushed filter can never re-match),
  * integral types only, deterministic expressions, point side = left.
  * Floor division is exact long arithmetic (mod-subtract + integral
  * div), correct for negatives and beyond 2^53.
  *
  * Install per-cluster via `graft.GraftExtensions`
  * (spark.sql.extensions) or per-session via
  * `spark.experimental.extraOptimizations ++= Seq(RangeJoinRule)`.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(ConfKey, "0").toLong
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint) =>
        rewrite(l, r, cond, hint, w).getOrElse(j)
    }
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** Exact floor(x / w) in long arithmetic, wrap-safe over the full
    * long domain: truncating `div` corrected by the remainder sign
    * (the former mod-subtract form underflowed for x near
    * Long.MinValue with ANSI off, silently mis-binning).
    */
  private def bin(x: Expression, w: Long): Expression = {
    val wl = Literal(w, LongType)
    val xl = if (x.dataType == LongType) x else Cast(x, LongType)
    val q = IntegralDivide(xl, wl)
    If(LessThan(Remainder(xl, wl), Literal(0L, LongType)),
      Subtract(q, Literal(1L, LongType)), q)
  }

  private def rewrite(l: LogicalPlan, r: LogicalPlan, cond: Expression,
      hint: JoinHint, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.size != 2) return None

    // (point from left, bound from right, isLowerBound)
    def classify(c: Expression): Option[(Expression, Expression, Boolean)] = {
      def leftOnly(e: Expression) =
        e.references.nonEmpty && e.references.subsetOf(l.outputSet)
      def rightOnly(e: Expression) =
        e.references.nonEmpty && e.references.subsetOf(r.outputSet)
      c match {
        case GreaterThanOrEqual(a, b) if leftOnly(a) && rightOnly(b) => Some((a, b, true))
        case LessThanOrEqual(a, b) if leftOnly(a) && rightOnly(b) => Some((a, b, false))
        case GreaterThanOrEqual(a, b) if rightOnly(a) && leftOnly(b) => Some((b, a, false))
        case LessThanOrEqual(a, b) if rightOnly(a) && leftOnly(b) => Some((b, a, true))
        case _ => None
      }
    }

    (classify(conjuncts(0)), classify(conjuncts(1))) match {
      case (Some((p1, lo, true)), Some((p2, hi, false))) => build(l, r, cond, hint, w, p1, p2, lo, hi)
      case (Some((p1, hi, false)), Some((p2, lo, true))) => build(l, r, cond, hint, w, p1, p2, lo, hi)
      case _ => None
    }
  }

  private def build(l: LogicalPlan, r: LogicalPlan, cond: Expression,
      hint: JoinHint, w: Long, p1: Expression, p2: Expression,
      lo: Expression, hi: Expression): Option[LogicalPlan] = {
    if (!p1.semanticEquals(p2)) return None
    if (!Seq(p1, lo, hi).forall(e => integral(e) && e.deterministic)) return None

    val binL = Alias(bin(p1, w), "_graft_bin")()
    val leftB = Project(l.output :+ binL, l)
    val genOut = AttributeReference("_graft_bin_r", LongType, nullable = false)()
    // Sequence is TimeZoneAwareExpression: without an explicit zone it
    // reports unresolved and fails post-optimizer plan validation.
    val seq = new Sequence(bin(lo, w), bin(hi, w), None)
      .withTimeZone(conf.sessionLocalTimeZone)
    val rightB = Generate(
      Explode(seq),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(genOut), child = r)
    val joined = Join(leftB, rightB, Inner,
      Some(EqualTo(binL.toAttribute, genOut)), hint)
    Some(Project(l.output ++ r.output, Filter(cond, joined)))
  }
}
