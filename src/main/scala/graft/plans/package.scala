package graft

/** Custom logical/physical plan nodes — intentionally empty.
  *
  * SURVEY.md §4 audited every behavior the reference relies on against
  * stock Catalyst: predicate pushdown, column pruning, broadcast choice,
  * window/aggregate execution, correlated-subquery rewrites and constant
  * folding are all covered by built-in rules, and the reference implements
  * zero optimizations of its own (SQL Server did its planning). The only
  * operator semantics Spark's built-ins could not express efficiently were
  * scalar vector kernels — implemented as `Expression`s with `doGenCode`
  * in [[graft.functions]], the lightest extension point, not as plans.
  *
  * If a future round needs whole-operator semantics (e.g. a native as-of
  * join), the growth path is: custom `LogicalPlan` + `Rule[LogicalPlan]` +
  * `SparkStrategy` + `SparkPlan` registered through the existing
  * [[graft.functions.GraftExtensions]] injection point.
  */
package object plans
