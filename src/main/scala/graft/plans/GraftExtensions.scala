package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Add, Literal, Round}
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
  /** Exactly +0.0 (not -0.0): the wrap we fold through must be the
    * identity-or-normalize form Fin.r4 emits. */
  private def isPosZero(v: Any): Boolean = v match {
    case d: java.lang.Double => java.lang.Double.doubleToRawLongBits(d) == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Round(inner @ Round(_, Literal(p1, _), _), Literal(p2, _), _)
          if p1 == p2 =>
        inner
      // Fin.r4 now emits round(x,4) + 0.0 (negative-zero normalization),
      // so nested r4 shows up as round(round(x,4)+0.0, 4): the outer
      // round is a no-op on an already-rounded same-scale value — keep
      // the inner Add (it preserves the +0.0 normalization).
      case Round(add @ Add(Round(_, Literal(p1, _), _), Literal(z, _), _),
                 Literal(p2, _), _) if p1 == p2 && isPosZero(z) =>
        add
    }
}

/** Register with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => FoldNestedRound)
}
