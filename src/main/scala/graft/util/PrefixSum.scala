package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exclusive prefix sum over a global ordering — WITHOUT the
  * single-reducer global window (`Window.orderBy(key)` with no partition
  * funnels the whole table through one task; at 100 TB that is the job).
  *
  * Classic two-phase scan:
  *  1. bucket rows into contiguous key ranges, cumulative-sum locally
  *     within each bucket (parallel windows, one per bucket);
  *  2. per-bucket totals — ONE ROW PER BUCKET, thousands at most — get
  *     their own exclusive prefix via a window over that tiny frame, and
  *     broadcast-join back as each bucket's starting offset.
  *
  * The bucket id is a PURE FUNCTION of the leading order key (linear
  * min/max bucketing), NOT `spark_partition_id()` over a sampled
  * `repartitionByRange`. That distinction is load-bearing: the offsets
  * branch and the main branch are separate executions of the bucketing
  * subtree, and RangePartitioner's reservoir sample is seeded by RDD id,
  * so two executions can place range boundaries differently — offsets
  * then describe partitions the main branch doesn't have, silently
  * corrupting every boundary row. (Observed at the 10× robustness sweep:
  * 31/32 boundary rows wrong, moving between runs; invisible at small SF
  * where the sample covers the whole input.) A deterministic expression
  * cannot disagree with itself, whatever the physical planning does.
  *
  * Balance: linear bucketing is equi-WIDTH in the key, not equi-depth —
  * dense/uniform keys (ids, ranks, prices) spread evenly; heavy value
  * skew degrades balance but never correctness (offset + local prefix ≡
  * global prefix for ANY contiguous split of the order). The leading
  * order key must be numeric (castable to double).
  */
object PrefixSum {

  /** Leading sort key as a bare column + descending flag. Accepts a bare
    * Column (treated ascending) or one wrapped by `.asc`/`.desc`.
    */
  private def leadKey(c: Column): (Column, Boolean) =
    GraftSqlBridge.sortOrder(c).getOrElse((c, false))

  /** Adds `_pid` = deterministic contiguous bucket of the leading order
    * key: floor(P · (k − min)/(max − min)) clamped to [0, P), mirrored
    * for descending orders. Nulls/NaN land in the bucket matching
    * Spark's default sort placement (asc: nulls first, NaN last; desc:
    * nulls last, NaN first). Same-key rows always share a bucket, so
    * buckets are contiguous ranges of the global order.
    */
  private def withPid(df: DataFrame, orderCols: Seq[Column],
                      numParts: Int): DataFrame = {
    val (k0, desc) = leadKey(orderCols.head)
    // Resolve the key's type (driver-side analysis, no job) to pick its
    // numeric image: dates/timestamps go through their epoch integers —
    // both are order-preserving, which is all bucketing needs.
    val k = df.select(k0.as("_ps_k")).schema.head.dataType match {
      case org.apache.spark.sql.types.DateType      => unix_date(k0).cast("double")
      case org.apache.spark.sql.types.TimestampType => unix_micros(k0).cast("double")
      case _                                        => k0.cast("double")
    }
    val stats = df.agg(min(k).as("_ps_kmin"), max(k).as("_ps_kmax"))
    val span = col("_ps_kmax") - col("_ps_kmin")
    val frac = if (desc) (col("_ps_kmax") - k) / span else (k - col("_ps_kmin")) / span
    val pid =
      when(k.isNull, lit(if (desc) numParts - 1 else 0))
        .when(isnan(k), lit(if (desc) 0 else numParts - 1))
        .when(span <= 0.0, lit(0))
        .otherwise(least(lit(numParts - 1), floor(frac * numParts).cast("int")))
    df.crossJoin(broadcast(stats))
      .withColumn("_pid", pid.cast("int"))
      .drop("_ps_kmin", "_ps_kmax")
  }

  /** Adds `outCol` = Σ value over all rows strictly before the row in
    * `orderCol` order (exclusive prefix; first row gets 0). `orderCol`
    * must be unique for the ordering to be total.
    */
  def exclusive(df: DataFrame, orderCol: String, value: Column,
                outCol: String, numParts: Int = 32): DataFrame =
    exclusiveCols(df, Seq(col(orderCol)), value, outCol, numParts)

  /** Multi-column generalization: the order is the lexicographic composite
    * of `orderCols` (which together must be unique). Same two-phase scan —
    * deterministic leading-key buckets, local window, per-bucket offsets
    * broadcast back.
    */
  def exclusiveCols(df: DataFrame, orderCols: Seq[Column], value: Column,
                    outCol: String, numParts: Int = 32): DataFrame =
    exclusiveColsMulti(df, orderCols, Seq(outCol -> value),
                       Map.empty, numParts)

  /** [[exclusiveCols]] that ALSO attaches the grand total Σvalue as
    * `totalCol` (skipped when null) — free: the per-bucket offsets frame
    * already sums every bucket's total, so callers that need both the
    * prefix AND the total (exact NTILE's rank + N) avoid a second scan of
    * the input.
    */
  def exclusiveColsTotal(df: DataFrame, orderCols: Seq[Column], value: Column,
                         outCol: String, totalCol: String,
                         numParts: Int = 32): DataFrame =
    exclusiveColsMulti(df, orderCols, Seq(outCol -> value),
      if (totalCol == null) Map.empty else Map(outCol -> totalCol), numParts)

  /** N exclusive prefixes over ONE shared two-phase scan — one bucketing
    * pass, one local window, one per-bucket offsets frame — instead of N
    * chained [[exclusiveCols]] calls each paying the full machinery
    * (bucket-stats broadcast + local-window shuffle + offsets aggregate;
    * measured 2× the wall for q_pr_curve's rank + running-positive pair).
    * `values` maps output column name → value expression; `totals`
    * optionally attaches a value's grand total under the given name
    * (free from the offsets frame, the [[exclusiveColsTotal]] rationale).
    */
  def exclusiveColsMulti(df: DataFrame, orderCols: Seq[Column],
                         values: Seq[(String, Column)],
                         totals: Map[String, String] = Map.empty,
                         numParts: Int = 32): DataFrame = {
    val slots = values.zipWithIndex.map { case ((out, v), i) =>
      (out, v, s"_psv$i")
    }
    val withVal = slots.foldLeft(df) { case (d, (_, v, tmp)) =>
      d.withColumn(tmp, v)
    }
    val parted = withPid(withVal, orderCols, numParts)
    val localW = Window.partitionBy(col("_pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = slots.foldLeft(parted) { case (d, (_, _, tmp)) =>
      d.withColumn(s"_lc$tmp", sum(col(tmp)).over(localW))
    }
    // one row per bucket: the tiny frame where global windows are fine
    val partAggs = slots.map { case (_, _, tmp) =>
      sum(col(tmp)).as(s"_pt$tmp")
    }
    val offBase = parted.groupBy(col("_pid"))
      .agg(partAggs.head, partAggs.tail: _*)
    val wPrev = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = slots.foldLeft(offBase) { case (d, (out, _, tmp)) =>
      val withOff = d.withColumn(s"_off$tmp",
        coalesce(sum(col(s"_pt$tmp")).over(wPrev), lit(0L)))
      totals.get(out).fold(withOff)(tc =>
        withOff.withColumn(tc, sum(col(s"_pt$tmp")).over(wAll)))
    }.drop(slots.map { case (_, _, tmp) => s"_pt$tmp" }: _*)
    val joined = local.join(broadcast(offsets), "_pid")
    slots.foldLeft(joined) { case (d, (out, _, tmp)) =>
      d.withColumn(out, col(s"_off$tmp") + col(s"_lc$tmp") - col(tmp))
        .drop(tmp, s"_lc$tmp", s"_off$tmp")
    }.drop("_pid")
  }

  /** Exclusive prefix MAX over a global ordering — the running-max scan
    * (skyline/cummax), same two-phase shape as [[exclusiveCols]]: local
    * running max within each bucket, per-bucket maxima (one row each)
    * prefixed on the tiny frame, broadcast back. The first row in global
    * order gets NULL (max over the empty prefix), matching the
    * single-window `max().over(rowsBetween(unboundedPreceding, -1))`
    * semantics row for row; `greatest` skips the NULL sides.
    */
  def exclusiveMax(df: DataFrame, orderCols: Seq[Column], value: Column,
                   outCol: String, numParts: Int = 32): DataFrame = {
    val withVal = df.withColumn("_pmv", value)
    val parted = withPid(withVal, orderCols, numParts)
    val localW = Window.partitionBy(col("_pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("_local_max", max(col("_pmv")).over(localW))
    val offsets = parted.groupBy(col("_pid"))
      .agg(max(col("_pmv")).as("_part_max"))
      .withColumn("_offset_max", max(col("_part_max")).over(
        Window.orderBy(col("_pid")).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("_pid"), col("_offset_max"))
    local.join(broadcast(offsets), "_pid")
      .withColumn(outCol, greatest(col("_local_max"), col("_offset_max")))
      .drop("_pid", "_pmv", "_local_max", "_offset_max")
  }
}
