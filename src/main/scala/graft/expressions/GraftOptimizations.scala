package graft.expressions

import org.apache.spark.sql.catalyst.expressions.Sqrt
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Domain-algebra optimizer rule for graft's native expressions — the
  * rewrites Catalyst cannot know because they rest on semantics of OUR
  * functions, injected via `injectOptimizerRule` (the Rule half of
  * SparkSessionExtensions, next to GraftExtensions' injectFunction
  * half):
  *
  *  1. Idempotence: `nfc_normalize(nfc_normalize(x))` →
  *     `nfc_normalize(x)`. NFC is a projection (normalizing twice is a
  *     no-op), but composed cleaning pipelines produce exactly this
  *     shape when two stages each defensively normalize — without the
  *     rule every row pays the ICU walk twice.
  *
  *  2. Strength reduction: `sqrt(vec_dot(x, x))` → `vec_norm(x)`. The
  *     naive self-cosine spelling traverses the float array twice
  *     (once per vec_dot argument stream at codegen level) and boxes
  *     through Sqrt; vec_norm is the fused single-pass form. Guarded
  *     by semantic equality of the two vec_dot children, so
  *     `sqrt(vec_dot(x, y))` is untouched.
  *
  * Both rewrites preserve results bit-for-bit (NFC idempotence is a
  * Unicode guarantee; vec_norm computes sqrt over the identical
  * float-summation order vec_dot uses), so they are safe under the
  * repo's hash-exactness doctrine — ExpressionsSpec pins value
  * equality and the rewritten plan shape.
  */
object GraftOptimizations extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NfcNormalize(inner @ NfcNormalize(_)) => inner
      case Sqrt(VecDot(a, b)) if a.semanticEquals(b) => VecNorm(a)
    }
}
