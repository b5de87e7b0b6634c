package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{PyCapitalize, PyTitle}

/** Optimizer rule: collapse nested applications of graft's Python-string
  * expressions — both `capitalize` and `title` are idempotent (their output
  * is a fixed point: head/word-initial chars are titlecased, every other
  * cased char is lowercased per code point), so the inner application is
  * dead work.
  *
  * Note a tempting stronger rewrite — dropping a `lower()` UNDER these
  * expressions — is NOT sound: `lower()` is context-sensitive (e.g. Greek
  * final sigma: "AΣ".lower() == "aς") while the expressions lowercase per
  * code point exactly like CPython's `str.capitalize`/`str.title`
  * (`"AΣ".capitalize() == "Aσ"`), so `capitalize(lower(x)) != capitalize(x)`
  * for such inputs. Only provably semantics-preserving rewrites belong here.
  * Registered via GraftExtensions (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`.
  */
object SimplifyPyText extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case PyCapitalize(inner @ PyCapitalize(_)) => inner
    case PyTitle(inner @ PyTitle(_)) => inner
  }
}
