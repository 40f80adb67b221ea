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
  * (≈ the typical interval width), or to `auto` to estimate it at
  * planning time as median(hi−lo)+1 over a bounded sample of the
  * interval side (manual value = override; unset = rule off). The
  * rewrite is exact for ANY width, so a bad estimate only costs
  * performance. Guards: exactly the two range
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

  /** Rows sampled from the interval side when the conf is `auto`. */
  private val SampleRows = 10000

  /** Re-entrancy guard: the auto-width sample query runs through the
    * optimizer too — without this it could recurse into the rule.
    */
  private val estimating: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (estimating.get()) return plan
    val confVal = conf.getConfString(ConfKey, "0").trim
    val manual = scala.util.Try(confVal.toLong).toOption
    if (confVal != "auto" && manual.forall(_ <= 0)) plan
    else plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint) =>
        rewrite(l, r, cond, hint, confVal).getOrElse(j)
    }
  }

  /** `auto` width: median (hi − lo) + 1 over a bounded sample of the
    * interval side, executed as its own tiny query (the guard above
    * keeps the optimizer from re-entering). Estimation cost is one
    * LIMIT-10000 scan at planning time; the rewrite stays EXACT for
    * any width, so a bad estimate only costs performance, never rows.
    */
  private def estimateBinWidth(r: LogicalPlan, lo: Expression, hi: Expression): Option[Long] = {
    org.apache.spark.sql.SparkSession.getActiveSession.flatMap { spark =>
      estimating.set(true)
      try {
        def asLong(e: Expression) = if (e.dataType == LongType) e else Cast(e, LongType)
        val w = Alias(Subtract(asLong(hi), asLong(lo)), "_graft_w")()
        val plan = Limit(Literal(SampleRows), Project(Seq(w), r))
        val qe = new org.apache.spark.sql.execution.QueryExecution(
          spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
        val widths = qe.executedPlan.executeCollect()
          .filter(!_.isNullAt(0)).map(_.getLong(0)).sorted
        if (widths.isEmpty) None
        else Some(math.max(1L, widths(widths.length / 2) + 1))
      } catch {
        case scala.util.control.NonFatal(_) => None
      } finally estimating.set(false)
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
      hint: JoinHint, confVal: String): Option[LogicalPlan] = {
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
      case (Some((p1, lo, true)), Some((p2, hi, false))) => build(l, r, cond, hint, confVal, p1, p2, lo, hi)
      case (Some((p1, hi, false)), Some((p2, lo, true))) => build(l, r, cond, hint, confVal, p1, p2, lo, hi)
      case _ => None
    }
  }

  private def build(l: LogicalPlan, r: LogicalPlan, cond: Expression,
      hint: JoinHint, confVal: String, p1: Expression, p2: Expression,
      lo: Expression, hi: Expression): Option[LogicalPlan] = {
    if (!p1.semanticEquals(p2)) return None
    if (!Seq(p1, lo, hi).forall(e => integral(e) && e.deterministic)) return None
    // width AFTER all structural guards, so `auto` never samples for a
    // join the rule would not rewrite anyway
    val w = (if (confVal == "auto") estimateBinWidth(r, lo, hi)
             else scala.util.Try(confVal.toLong).toOption.filter(_ > 0)) match {
      case Some(v) => v
      case None => return None
    }

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
