package graft.functions

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY §4 "custom Catalyst work"): collapse chains
  * of idempotent normalization expressions —
  * `strip_accents(strip_accents(x))` ≡ `strip_accents(x)`, likewise
  * normalize_ws and normalize_safra (idempotence is proven by the
  * ScalaCheck property suite). Chains arise naturally when layered
  * pipelines each defensively normalize their inputs; the rule deletes
  * the redundant per-row work. Injected via [[GraftExtensions]].
  */
object CollapseIdempotentNormalization extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case StripAccents(inner @ StripAccents(_)) => inner
      case NormalizeWs(inner @ NormalizeWs(_)) => inner
      case NormalizeSafra(inner @ NormalizeSafra(_)) => inner
      case TitleCasePt(inner @ TitleCasePt(_)) => inner
    }
}
