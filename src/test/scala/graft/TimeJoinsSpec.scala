package graft

import org.apache.spark.sql.functions._
import graft.operators.{RangeJoins, Text, TimeJoins}

/** Invariants for the temporal-join and sampling operators (their exact
  * values are oracle-checked by graft.Verify; these pin the semantics).
  */
class TimeJoinsSpec extends SparkSpec {

  test("asof: matched signup is never after the purchase, and is the latest") {
    val r = TimeJoins.asofJoin(spark, Sf)
    // no future signups matched
    assert(r.filter(col("signup_ts_us") > col("purchase_ts_us")).isEmpty)
    // one output row per purchase event, exactly
    val purchases = graft.util.Tables.events(spark, Sf)
      .filter(col("event_type") === "purchase").count()
    assert(r.count() === purchases)
    // the chosen signup is maximal: no other signup fits strictly between
    val signups = graft.util.Tables.events(spark, Sf)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_us").as("s_ts"))
    val better = r.join(signups, "user_id")
      .filter(col("s_ts") <= col("purchase_ts_us") &&
              (col("signup_ts_us").isNull || col("s_ts") > col("signup_ts_us")))
    assert(better.isEmpty)
  }

  test("banded range join finds exactly the brute-force pair set") {
    val banded = RangeJoins.rangeBandJoin(spark, Sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.util.Tables.events(spark, Sf).select(col("event_id"), col("ts_us"))
    val a = ev.select(col("event_id").as("id_a"), col("ts_us").as("ts_a"))
    val b = ev.select(col("event_id").as("id_b"), col("ts_us").as("ts_b"))
    val brute = a.crossJoin(b)
      .filter(col("id_a") < col("id_b") && abs(col("ts_a") - col("ts_b")) <= 1000000L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === brute, s"banding must lose/add nothing: ${banded.size} vs ${brute.size}")
  }

  test("weighted sample: k per group, favors longer docs on average") {
    val s = Text.sampleWeighted(spark, Sf, 3)
    val perLang = s.groupBy("lang").count().collect()
    assert(perLang.forall(_.getLong(1) === 3L))
    // expectation check: mean sampled length above corpus mean (weights work)
    val sampledMean = s.agg(avg("n_chars")).head().getDouble(0)
    val corpusMean = graft.util.Tables.t(spark, Sf, "documents")
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampledMean > corpusMean * 0.9,
      s"weighted sample mean $sampledMean vs corpus $corpusMean")
    // deterministic across invocations
    assert(s.collect().toSeq === Text.sampleWeighted(spark, Sf, 3).collect().toSeq)
  }
}
