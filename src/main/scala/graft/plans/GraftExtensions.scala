package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Literal, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom optimizer rule (SURVEY.md §7.4 stretch demo): fold
  * `round(round(x, p), p)` → `round(x, p)`.
  *
  * The engine's determinism contract (`Fin.r4` on every aggregated
  * double, SURVEY.md §2.10) makes this pattern occur naturally when a
  * rounded column is re-rounded by a downstream consumer — e.g.
  * q_text_quality's `round(uniq_ratio * ..., 4)` over an already-rounded
  * ratio. Rounding to the same scale twice is a no-op on the second
  * application, so the inner expression's value is identical.
  *
  * Deliberately tiny (SURVEY.md §4: every required rewrite is already a
  * Catalyst built-in; the engine leans on Catalyst). It exists to
  * exercise the Rule[LogicalPlan] + SparkSessionExtensions surface.
  */
object FoldNestedRound extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Round(inner @ Round(_, Literal(p1, _), _), Literal(p2, _), _)
          if p1 == p2 =>
        inner
    }
}

/** Register with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => FoldNestedRound)
}
