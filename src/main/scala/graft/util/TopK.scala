package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe per-group top-k: the library form of the two-phase pattern
  * (used by Text.sampleWeighted, reusable anywhere a "k best rows per
  * group" is needed over low-cardinality groups).
  *
  * A single `Window.partitionBy(group)` sorts the ENTIRE input on as many
  * reducers as there are groups — with 5 groups, a 100 TB scan funnels
  * through 5 tasks. Phase 1 instead takes the top-k of every (group,
  * physical-partition) slice — thousands of independent window partitions —
  * and phase 2 merges only the ≤ k·numPartitions survivors per group.
  * Correct for any partitioning: a global top-k row is by definition in the
  * top-k of whatever partition holds it.
  */
object TopK {

  /** Rows ranked 1..k per group by `order` (strongest first). Adds column
    * `rn` (1-based rank). The caller's `order` must be a TOTAL order within
    * each group (include a unique tiebreaker) or ranks are nondeterministic.
    */
  def perGroup(df: DataFrame, groupCols: Seq[Column], order: Seq[Column],
               k: Int): DataFrame = {
    val local = Window.partitionBy(groupCols :+ col("_tk_pid"): _*).orderBy(order: _*)
    val global = Window.partitionBy(groupCols: _*).orderBy(order: _*)
    df.withColumn("_tk_pid", spark_partition_id())
      .withColumn("_tk_lrn", row_number().over(local))
      .filter(col("_tk_lrn") <= k)
      .withColumn("rn", row_number().over(global))
      .filter(col("rn") <= k)
      .drop("_tk_pid", "_tk_lrn")
  }
}
