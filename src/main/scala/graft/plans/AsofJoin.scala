package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join — the engine's custom-operator tier (c):
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`, injected via
  * [[graft.functions.GraftExtensions]] / `experimental.extraStrategies`.
  *
  * Semantics: LEFT AS-OF BACKWARD — every left row picks the single right
  * row with equal keys and the greatest `rightTime <= leftTime`, or nulls
  * when none exists (DuckDB `ASOF LEFT JOIN`, pandas `merge_asof`). The
  * compositional form ([[graft.operators.TimeJoins.asofJoin]]: union both
  * sides, one timeline window per key) answers the same query but
  * materializes the tagged union and a last(ignoreNulls) window state; this
  * operator is the shape a native engine gives it — both children
  * hash-clustered on the keys and sorted (keys, time), then ONE streaming
  * merge pass per partition with O(1) state (the current candidate row).
  * Per-partition cost is a single synchronized scan of both sorted runs:
  * no buffered window frames, no union materialization, and the sort is
  * reusable downstream (outputOrdering = the left child's).
  *
  * Scale contract: distribution requirements are the same as a sort-merge
  * join's, so EnsureRequirements co-partitions the children (one shuffle
  * each at most — zero when the child already satisfies it, e.g. bucketed
  * snapshots) and AQE still re-plans partition counts. The right side must
  * be unique per (keys, time) — equal-time duplicates have no defined
  * winner in any as-of dialect; [[graft.operators.TimeJoins.asofJoinNative]]
  * dedups before joining, matching the oracle's GROUP BY.
  *
  * Time columns must be non-null LongType (epoch-µs per the engine's
  * events contract, Tables.events); key types are unrestricted (compared
  * through Catalyst's natural row ordering). Note the ordering-based
  * comparison gives NULL-SAFE key semantics (`<=>`): a null left key
  * matches a null right key, unlike an SQL equi-join's ON — filter or
  * dedup null keys upstream when plain equi semantics are required (the
  * registered queries' keys are non-null by construction).
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    toleranceUs: Option[Long] = None) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching non-empty equi-key lists")
  require(toleranceUs.forall(_ >= 0L), "tolerance must be non-negative")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] to [[AsofJoinExec]]; every other node falls
  * through to Spark's built-in strategies.
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, tol) =>
      AsofJoinExec(lk, rk, lt, rt, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical streaming-merge as-of join. See [[AsofJoinPlan]] for the
  * operator contract; this node holds the partition-local algorithm:
  *
  * Both inputs arrive hash-clustered on the equi-keys and sorted by
  * (keys…, time) — declared through `requiredChildDistribution` /
  * `requiredChildOrdering`, so EnsureRequirements inserts the exchanges
  * and sorts exactly where needed and nowhere else. Per partition, the
  * right iterator advances monotonically: rows with smaller keys are
  * skipped, rows with equal keys and time <= the current left time
  * overwrite the candidate (sorted order ⇒ the last overwrite is the
  * as-of match), and the first row beyond stops the advance — each side
  * is read exactly once regardless of row counts, the definition of
  * merge-join linearity. Candidate rows are copied (shuffle/sort
  * iterators reuse row buffers); everything else stays zero-copy.
  */
case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    toleranceUs: Option[Long],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // the merge preserves the left run: partitioning and ordering survive,
  // so a downstream op needing them reuses this exchange/sort for free
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val (lOut, rOut) = (left.output, right.output)
    val (lk, rk, lt, rt) = (leftKeys, rightKeys, leftTime, rightTime)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeEval = BindReferences.bindReference(lt, lOut)
      val rTimeEval = BindReferences.bindReference(rt, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      // O(1) merge state: the row under the right cursor (NOT copied — only
      // read before the cursor moves) and the best candidate so far (copied:
      // it must outlive cursor advancement over reused row buffers).
      val tol = toleranceUs.getOrElse(Long.MaxValue)
      var rCurrent: InternalRow = if (rIter.hasNext) rIter.next() else null
      var candidate: InternalRow = null
      var candidateKey: UnsafeRow = null
      var candidateTime = 0L

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeV = lTimeEval.eval(lRow).asInstanceOf[Long]
        var advancing = rCurrent != null
        while (advancing) {
          val rKey = rKeyProj(rCurrent)
          val cmp = keyOrd.compare(rKey, lKey)
          if (cmp < 0) { // right run is behind every remaining left key: skip
            rCurrent = if (rIter.hasNext) rIter.next() else null
            advancing = rCurrent != null
          } else if (cmp == 0 &&
                     rTimeEval.eval(rCurrent).asInstanceOf[Long] <= lTimeV) {
            candidate = rCurrent.copy() // sorted ⇒ each overwrite is later
            candidateKey = rKey.copy()
            candidateTime = rTimeEval.eval(rCurrent).asInstanceOf[Long]
            rCurrent = if (rIter.hasNext) rIter.next() else null
            advancing = rCurrent != null
          } else advancing = false // right run is ahead: stop for this left row
        }
        // tolerance checks only at emission: the candidate is already the
        // LATEST right time <= lTime, so if it's out of band no other row
        // can be in band (anything else is even earlier)
        val matched = candidate != null &&
          keyOrd.compare(candidateKey, lKey) == 0 && lTimeV - candidateTime <= tol
        resultProj(joined(lRow, if (matched) candidate else nullRight))
      }
    }
  }
}
