package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

import graft.functions.GraftMode

/**
 * Optimizer rule: rewrite a `graft_mode(x)` aggregate into the two-phase
 * compositional form
 *
 * {{{
 *   Aggregate(keys, graft_mode(x))
 *     ⇒ Aggregate(keys, max_by(x, (cnt, x)))          // strings: min_by(x, (−cnt, x))
 *         ← Aggregate(keys :+ x, count(1) AS cnt)
 * }}}
 *
 * Why: [[GraftMode]] holds a value→count map per group. At 100 TB a
 * high-cardinality column can push a single group's map past executor
 * memory. The two-phase form's state is O(1) per reducer key in BOTH
 * shuffles — unconditionally scalable — at the cost of a second
 * exchange. Opt-in per workload: `spark.graft.mode.twoPhase=true`
 * (the map form wins below memory limits). Usable via
 * `spark.experimental.extraOptimizations` or injected cluster-wide by
 * [[graft.functions.GraftExtensions]].
 *
 * Semantics preserved exactly:
 *  - NULL inputs: the pick ordering is NULL for NULL values and
 *    max_by/min_by skip NULL orderings → nulls ignored, all-NULL
 *    group → NULL, identical to the reference (mode/native.rs:111-131).
 *  - ties: greatest value wins; smallest for strings (bytes.rs:125-134)
 *    via min_by over (−cnt, value).
 *
 * Fires only on the safe shape: attribute-only grouping keys and a
 * single bare (non-DISTINCT, unfiltered) mode aggregate, so every
 * surviving exprId is reproduced for the parent plan.
 */
object RewriteModeToTwoPhase extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.mode.twoPhase", "false").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg: Aggregate if rewritable(agg) => rewrite(agg)
    }
  }

  private def modeAliases(agg: Aggregate): Seq[(Alias, GraftMode)] =
    agg.aggregateExpressions.collect {
      case a @ Alias(AggregateExpression(m: GraftMode, _, false, None, _), _) => (a, m)
    }

  private def rewritable(agg: Aggregate): Boolean = {
    val groupAttrs = agg.groupingExpressions.forall(_.isInstanceOf[Attribute])
    val modes = modeAliases(agg)
    val allAggs = agg.aggregateExpressions
      .flatMap(_.collect { case ae: AggregateExpression => ae })
    // exactly one aggregate, it is the mode; all other outputs are
    // grouping attributes passed through unchanged
    groupAttrs && modes.size == 1 && allAggs.size == 1 &&
      agg.aggregateExpressions.forall {
        case _: Attribute => true
        case Alias(AggregateExpression(_: GraftMode, _, _, _, _), _) => true
        case _ => false
      }
  }

  private def rewrite(agg: Aggregate): Aggregate = {
    val (alias, mode) = modeAliases(agg).head
    val keys = agg.groupingExpressions.map(_.asInstanceOf[Attribute])
    val x = mode.child

    // phase 1: count per (keys, x)
    val xAlias = Alias(x, "__mode_value")()
    val cntAlias = Alias(
      AggregateExpression(Count(Seq(Literal(1))), Complete, isDistinct = false),
      "__mode_cnt")()
    val phase1 = Aggregate(
      (keys :+ xAlias).asInstanceOf[Seq[Expression]],
      (keys :+ xAlias :+ cntAlias).asInstanceOf[Seq[NamedExpression]],
      agg.child)
    val xRef = xAlias.toAttribute
    val cntRef = cntAlias.toAttribute

    // phase 2: pick the winner; NULL ordering for NULL values → skipped
    def nullWhenXNull(ordering: Expression): Expression =
      If(IsNull(xRef), Literal.create(null, ordering.dataType), ordering)
    val pickAgg =
      if (x.dataType.isInstanceOf[StringType]) {
        MinBy(xRef, nullWhenXNull(CreateStruct(Seq(UnaryMinus(cntRef), xRef))))
      } else {
        MaxBy(xRef, nullWhenXNull(CreateStruct(Seq(cntRef, xRef))))
      }
    val pick = AggregateExpression(pickAgg, Complete, isDistinct = false)

    val outputs = agg.aggregateExpressions.map {
      case a: Attribute => a
      case a @ Alias(AggregateExpression(_: GraftMode, _, _, _, _), _) =>
        Alias(pick, a.name)(a.exprId, a.qualifier)
      case other => other
    }
    Aggregate(keys.asInstanceOf[Seq[Expression]], outputs, phase1)
  }
}
