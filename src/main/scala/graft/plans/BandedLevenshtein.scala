package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bound-aware Levenshtein banding.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|·|b|) dynamic program
  * per row and only then compares — but Spark's 3-arg `levenshtein(a, b, k)`
  * early-exits outside the ±k diagonal band (O(k·|a|) work, returning -1
  * past the bound). The two spell the same predicate:
  *
  *   lev(a, b) <= k   ⟺   lev(a, b, k) >= 0          (k >= 0)
  *   lev(a, b) <  k   ⟺   lev(a, b, k-1) >= 0        (k >= 1)
  *
  * including null semantics (null inputs propagate null through both
  * forms). Users naturally write the naive form in SQL; this rule rewrites
  * it to the banded form wherever the comparison bound is a non-negative
  * integer literal — the dedup blocking join (`Dedup.editDistPairs`, which
  * hand-writes the 3-arg form) becomes something a plain-SQL user gets for
  * free. At a 40-char prefix and k=8 the band does ~1/3 of the DP cells;
  * the win grows linearly with string length.
  *
  * This is the engine's `Rule[LogicalPlan]` tier (SURVEY §4 growth path):
  * value-preserving expression rewrites belong in the optimizer, not in
  * every call site. Injected cluster-wide via
  * `spark.sql.extensions=graft.functions.GraftExtensions` or per-session
  * through [[graft.util.Sessions.tune]] (`experimental.extraOptimizations`).
  */
object BandedLevenshteinRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // lev(a,b) <= k  ⇒  lev(a,b,k) >= 0
    case LessThanOrEqual(Levenshtein(l, r, None), lit @ Literal(k: Int, IntegerType)) if k >= 0 =>
      GreaterThanOrEqual(Levenshtein(l, r, Some(lit)), Literal(0))
    case GreaterThanOrEqual(lit @ Literal(k: Int, IntegerType), Levenshtein(l, r, None)) if k >= 0 =>
      GreaterThanOrEqual(Levenshtein(l, r, Some(lit)), Literal(0))
    // lev(a,b) < k  ⇒  lev(a,b,k-1) >= 0
    case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType)) if k >= 1 =>
      GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k - 1))), Literal(0))
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None)) if k >= 1 =>
      GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k - 1))), Literal(0))
  }
}
