package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global top-k WITH a dense 1..k rank column — without ranking the whole
  * frame through one reducer.
  *
  * The naive spelling, `row_number().over(Window.orderBy(order)).filter(rk
  * <= k)`, plans as `Exchange SinglePartition → Sort → Window`: the ENTIRE
  * scored frame funnels through one task before the filter drops all but k
  * rows — at 100 TB the rank leg IS the job (the r13-verdict scale-killer
  * class; the final-top-k twin of the pattern [[PrefixSum]] exists to kill
  * for cumulative sums).
  *
  * `orderBy(order).limit(k)` instead plans as `TakeOrderedAndProject`: each
  * partition ships only its local top-k, the driver merges k rows. The rank
  * column is then a window over the RESULTING k-row frame — a bounded
  * SinglePartition window, the whitelisted shape. Equivalence is exact
  * under a total order (callers must include a unique tiebreak column):
  * rank ≤ k ⟺ membership in the ordered k-prefix, and row_number over the
  * prefix reproduces the global rank values 1..k.
  */
object Ranked {

  /** `df` restricted to its global top-`k` under `order` (a TOTAL order —
    * include a unique tiebreak), with `rankCol` = the global 1-based rank.
    */
  def topkRanked(df: DataFrame, k: Int, rankCol: String,
                 order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)
      .withColumn(rankCol, row_number().over(Window.orderBy(order: _*)))
}
