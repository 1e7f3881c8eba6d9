package graft.plans

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: strip forced broadcast HINTS off relations too large to
  * broadcast safely, handing the decision back to AQE.
  *
  * A `broadcast()` hint — unlike AQE's own runtime choice — does not
  * degrade: Spark honors it regardless of statistics, and at cluster scale
  * an over-hinted side hits the 8 GB broadcast ceiling (or the driver's
  * memory) and kills the query. The failure mode is insidious because the
  * hint is usually RIGHT when written (the table is small at dev scale)
  * and only becomes fatal when data grows 100×. This rule makes the hint
  * safe to write: a hinted side whose estimated size exceeds
  * `spark.graft.broadcastGuard.maxBytes` (default 512 MB — far above any
  * sane dimension, far below the ceiling) loses its strategy hint, AQE
  * broadcasts it anyway if runtime stats allow, and otherwise degrades to
  * a shuffled join instead of dying. Genuinely small dims keep their hints
  * untouched, and a stripped hint logs a warning so the regression is
  * visible, not silent.
  *
  * Runs in the user-rule batch (after `EliminateResolvedHint` has folded
  * `ResolvedHint` nodes into each `Join`'s `JoinHint`), so it matches the
  * hint where it actually lives by optimization time. Value-preserving by
  * construction — hints never change results, only physical strategy.
  * Injected cluster-wide via `spark.sql.extensions=graft.functions.
  * GraftExtensions` or per-session through [[graft.util.Sessions.tune]].
  */
object BroadcastGuardRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.broadcastGuard.maxBytes"
  private val DefaultMaxBytes: Long = 512L * 1024 * 1024

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val limit = BigInt(conf.getConfString(ConfKey, DefaultMaxBytes.toString).toLong)
    plan.transform {
      case j @ Join(l, r, _, _, hint)
          if oversized(hint.leftHint, l, limit) || oversized(hint.rightHint, r, limit) =>
        j.copy(hint = JoinHint(
          strip(hint.leftHint, l, limit, "left"),
          strip(hint.rightHint, r, limit, "right")))
    }
  }

  private def isBroadcast(h: Option[HintInfo]): Boolean =
    h.exists(_.strategy.contains(BROADCAST))

  private def oversized(h: Option[HintInfo], side: LogicalPlan, limit: BigInt): Boolean =
    isBroadcast(h) && side.stats.sizeInBytes > limit

  private def strip(h: Option[HintInfo], side: LogicalPlan, limit: BigInt,
                    which: String): Option[HintInfo] =
    if (oversized(h, side, limit)) {
      logWarning(s"broadcast guard: dropping BROADCAST hint on $which join side " +
        s"(estimated ${side.stats.sizeInBytes} bytes > guard $limit); " +
        "AQE now owns the join strategy")
      h.map(_.copy(strategy = None))
    } else h
}
