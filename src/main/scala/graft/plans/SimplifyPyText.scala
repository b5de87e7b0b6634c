package graft.plans

import org.apache.spark.sql.catalyst.expressions.Lower
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{PyCapitalize, PyTitle}

/** Optimizer rule: drop a redundant `lower()` under graft's Python-string
  * expressions. Both `capitalize` and `title` lowercase every non-initial
  * cased character themselves, so `py_capitalize(lower(x)) == py_capitalize(x)`
  * and `py_title(lower(x)) == py_title(x)` — one less string allocation per
  * row in the normalization hot path (the reference composes
  * `strip().lower().capitalize()`, so this pattern is the common case).
  * Registered via GraftExtensions (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`.
  */
object SimplifyPyText extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case PyCapitalize(Lower(c)) => PyCapitalize(c)
    case PyTitle(Lower(c)) => PyTitle(c)
  }
}
