package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.DeAccent

/** Optimizer rule: `deaccent` is idempotent (ScalaCheck-verified in
  * AccentProps), so nested applications collapse to one. Pipelines
  * compose normalization steps freely — e.g. `normalizeUsername` over an
  * already-deaccented column — and this rewrite removes the redundant
  * NFKD pass before codegen instead of relying on callers to notice.
  *
  * Injected via [[graft.GraftExtensions]] (`injectOptimizerRule`); the
  * rewrite is a plain bottom-up expression transform, safe at any point
  * in the optimizer run.
  */
case class CollapseDeAccent(unused: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DeAccent(inner @ DeAccent(_)) => inner
    }
}
