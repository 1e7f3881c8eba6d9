package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Temporal join operators beyond the reference surface (SURVEY §2.2 notes
  * the reference has none): the as-of join every warehouse eventually
  * needs ("state as of event time").
  */
object TimeJoins {

  /** As-of join: for every purchase event, the user's latest signup at or
    * before the purchase time.
    *
    * Spark-first formulation — NOT a range self-join: union both sides
    * with a tag, sort each user's timeline once, and carry the most recent
    * signup forward with last(ignoreNulls) over an unbounded-preceding
    * frame. One shuffle on user_id, linear scan per user — the plan shape
    * of merge-asof, which survives any corpus size (a range-condition join
    * would rescan signups per purchase).
    *
    * Tie rule (pinned for the oracle): a signup at exactly the purchase
    * timestamp matches (<=), so signups sort before purchases at equal
    * ts_us; multiple signups at one (user, ts_us) dedup to the highest
    * event_id first — DuckDB's ASOF JOIN picks an arbitrary row among
    * exact-tie candidates, so both engines must see a unique one.
    */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
    val signups = Quality.dedupLatest(
        ev.filter(col("event_type") === "signup"), Seq("user_id", "ts_us"), Seq("event_id"))
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .withColumn("tag", lit(0))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .withColumn("tag", lit(1))
    val timeline = signups.unionByName(purchases)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("tag").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordered(
      timeline
        .withColumn("last_signup",
          last(when(col("tag") === 0, struct(col("ts_us"), col("event_id"))),
               ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id").as("purchase_id"), col("user_id"),
                col("ts_us").as("purchase_ts_us"),
                col("last_signup.ts_us").as("signup_ts_us"),
                col("last_signup.event_id").as("signup_id")),
      "purchase_id")
  }

  /** The same as-of query through the engine's CUSTOM PHYSICAL OPERATOR
    * ([[graft.plans.AsofJoinExec]]): children clustered on user_id, sorted
    * (user_id, ts_us), one streaming merge pass with O(1) state per
    * partition — no tagged union, no window frames. Registered against the
    * IDENTICAL oracle as [[asofJoin]], so the driver's hash gate proves
    * the custom operator row-for-row exact; the plan-shape spec proves it
    * actually executes (AsofJoinExec present, window/union absent).
    */
  def asofJoinNative(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
    // right side unique per (key, time) — the as-of contract (see
    // AsofJoinPlan scaladoc); same max-event_id tie rule as the oracle
    val signups = Quality.dedupLatest(
        ev.filter(col("event_type") === "signup"), Seq("user_id", "ts_us"), Seq("event_id"))
      .select(col("user_id").as("s_user_id"), col("ts_us").as("signup_ts_us"),
              col("event_id").as("signup_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
              col("ts_us").as("purchase_ts_us"))
    val lPlan = purchases.queryExecution.analyzed
    val rPlan = signups.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).get
    val joined = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      graft.plans.AsofJoinPlan(lPlan, rPlan,
        Seq(attr(lPlan, "user_id")), Seq(attr(rPlan, "s_user_id")),
        attr(lPlan, "purchase_ts_us"), attr(rPlan, "signup_ts_us")))
    ordered(
      joined.select(col("purchase_id"), col("user_id"),
                    col("purchase_ts_us"), col("signup_ts_us"), col("signup_id")),
      "purchase_id")
  }

  /** Tolerance-bounded as-of (pandas merge_asof `tolerance`): a signup
    * older than `tolUs` before the purchase does NOT count — the row keeps
    * its left side and nulls the match. Same custom operator, one more
    * pushed-down parameter; the emission-time check is sound because the
    * candidate is already the LATEST in-window right row (anything else is
    * older still). Oracle spells the identical semantics as ASOF LEFT JOIN
    * + CASE, so the gate proves the parameterized operator too.
    */
  def asofJoinTolerance(spark: SparkSession, sfDir: String,
                        tolUs: Long = 604800000000L /* 7 days */): DataFrame = {
    val ev = events(spark, sfDir)
    val signups = Quality.dedupLatest(
        ev.filter(col("event_type") === "signup"), Seq("user_id", "ts_us"), Seq("event_id"))
      .select(col("user_id").as("s_user_id"), col("ts_us").as("signup_ts_us"),
              col("event_id").as("signup_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
              col("ts_us").as("purchase_ts_us"))
    val lPlan = purchases.queryExecution.analyzed
    val rPlan = signups.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).get
    val joined = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      graft.plans.AsofJoinPlan(lPlan, rPlan,
        Seq(attr(lPlan, "user_id")), Seq(attr(rPlan, "s_user_id")),
        attr(lPlan, "purchase_ts_us"), attr(rPlan, "signup_ts_us"),
        toleranceUs = Some(tolUs)))
    ordered(
      joined.select(col("purchase_id"), col("user_id"),
                    col("purchase_ts_us"), col("signup_ts_us"), col("signup_id")),
      "purchase_id")
  }
}
