package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exclusive prefix sum over a global ordering — WITHOUT the
  * single-reducer global window (`Window.orderBy(key)` with no partition
  * funnels the whole table through one task; at 100 TB that is the job).
  *
  * Classic two-phase scan:
  *  1. range-partition by the order key, cumulative-sum locally within each
  *     partition (parallel windows, one per partition);
  *  2. per-partition totals — ONE ROW PER PARTITION, thousands at most —
  *     get their own exclusive prefix via a window over that tiny frame,
  *     and broadcast-join back as each partition's starting offset.
  *
  * The result is independent of where the range boundaries land (offset +
  * local prefix ≡ global prefix for any contiguous split of the order), so
  * sampling-based range partitioning cannot perturb values.
  */
object PrefixSum {

  /** Adds `outCol` = Σ value over all rows strictly before the row in
    * `orderCol` order (exclusive prefix; first row gets 0). `orderCol`
    * must be unique for the ordering to be total.
    */
  def exclusive(df: DataFrame, orderCol: String, value: Column,
                outCol: String, numParts: Int = 32): DataFrame =
    exclusiveCols(df, Seq(col(orderCol)), value, outCol, numParts)

  /** Multi-column generalization: the order is the lexicographic composite
    * of `orderCols` (which together must be unique). Same two-phase scan —
    * range-partition on the composite, local window, per-partition offsets
    * broadcast back.
    */
  def exclusiveCols(df: DataFrame, orderCols: Seq[Column], value: Column,
                    outCol: String, numParts: Int = 32): DataFrame =
    exclusiveColsTotal(df, orderCols, value, outCol, null, numParts)

  /** [[exclusiveCols]] that ALSO attaches the grand total Σvalue as
    * `totalCol` (skipped when null) — free: the per-partition offsets frame
    * already sums every partition's total, so callers that need both the
    * prefix AND the total (exact NTILE's rank + N) avoid a second scan of
    * the input.
    */
  def exclusiveColsTotal(df: DataFrame, orderCols: Seq[Column], value: Column,
                         outCol: String, totalCol: String,
                         numParts: Int = 32): DataFrame = {
    val withVal = df.withColumn("_psv", value)
    val parted = withVal.repartitionByRange(numParts, orderCols: _*)
      .withColumn("_pid", spark_partition_id())
    val localW = Window.partitionBy(col("_pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("_local_cum", sum(col("_psv")).over(localW))
    // one row per partition: the tiny frame where global windows are fine
    val offsets0 = local.groupBy(col("_pid"))
      .agg(sum(col("_psv")).as("_part_total"))
      .withColumn("_offset",
        coalesce(sum(col("_part_total")).over(
          Window.orderBy(col("_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val offsets =
      if (totalCol == null) offsets0.select(col("_pid"), col("_offset"))
      else offsets0
        .withColumn(totalCol, sum(col("_part_total")).over(
          Window.orderBy(col("_pid")).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("_pid"), col("_offset"), col(totalCol))
    local.join(broadcast(offsets), "_pid")
      .withColumn(outCol, col("_offset") + col("_local_cum") - col("_psv"))
      .drop("_pid", "_psv", "_local_cum", "_offset")
  }

  /** Exclusive prefix MAX over a global ordering — the running-max scan
    * (skyline/cummax), same two-phase shape as [[exclusiveCols]]: local
    * running max within each range partition, per-partition maxima (one
    * row each) prefixed on the tiny frame, broadcast back. The first row
    * in global order gets NULL (max over the empty prefix), matching the
    * single-window `max().over(rowsBetween(unboundedPreceding, -1))`
    * semantics row for row; `greatest` skips the NULL sides.
    */
  def exclusiveMax(df: DataFrame, orderCols: Seq[Column], value: Column,
                   outCol: String, numParts: Int = 32): DataFrame = {
    val withVal = df.withColumn("_pmv", value)
    val parted = withVal.repartitionByRange(numParts, orderCols: _*)
      .withColumn("_pid", spark_partition_id())
    val localW = Window.partitionBy(col("_pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("_local_max", max(col("_pmv")).over(localW))
    val offsets = local.groupBy(col("_pid"))
      .agg(max(col("_pmv")).as("_part_max"))
      .withColumn("_offset_max", max(col("_part_max")).over(
        Window.orderBy(col("_pid")).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("_pid"), col("_offset_max"))
    local.join(broadcast(offsets), "_pid")
      .withColumn(outCol, greatest(col("_local_max"), col("_offset_max")))
      .drop("_pid", "_pmv", "_local_max", "_offset_max")
  }
}
