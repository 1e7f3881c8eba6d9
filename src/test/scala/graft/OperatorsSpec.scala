package graft

import org.apache.spark.sql.functions._

/** Per-operator sanity over the sf0.001 testdata — invariants that don't
  * need the DuckDB oracle (which covers exact values via graft.Verify).
  */
class OperatorsSpec extends SparkSpec {

  test("agg_group: partial+final aggregate produces all flag/status groups") {
    val r = SparkEntry.queries("q_agg_group")(spark, Sf).collect()
    assert(r.length === 6) // 3 returnflags × 2 linestatus
    assert(r.map(_.getAs[Long]("count_order")).sum > 0)
  }

  test("watermark scalar + coalesce default") {
    val wm = SparkEntry.queries("q_watermark_max")(spark, Sf).head()
    assert(!wm.isNullAt(0))
    val cd = SparkEntry.queries("q_coalesce_default")(spark, Sf).head()
    assert(cd.getDate(0).toString === "2000-01-01") // empty watermark → default
  }

  test("dedup_rownum emits exactly one row per (user, event_type)") {
    val df = SparkEntry.queries("q_dedup_rownum")(spark, Sf)
    assert(df.groupBy("user_id", "event_type").count().filter(col("count") > 1).isEmpty)
  }

  test("outlier capping keeps values within 3 sigma or replaces with mean") {
    val ev = graft.util.Tables.events(spark, Sf)
    val stats = ev.groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_samp("value").as("sigma"))
    val joined = SparkEntry.queries("q_outlier_zscore")(spark, Sf)
      .join(ev.select(col("event_id"), col("value")), "event_id")
      .join(broadcast(stats), "event_type")
    val bad = joined.filter(
      abs(col("value_capped") - col("mu")) / col("sigma") > 3.0 + 1e-9 &&
      col("value_capped") =!= col("value"))
    assert(bad.isEmpty)
  }

  test("merge upsert: restated rows take source values, history survives") {
    val r = SparkEntry.queries("q_merge_upsert")(spark, Sf)
    // every key at most once (MERGE cardinality invariant)
    assert(r.groupBy("o_orderkey").count().filter(col("count") > 1).isEmpty)
    // updated rows carry the restatement marker status
    assert(r.filter(col("o_orderstatus") === "R").count() > 0)
  }

  test("cdc diff classifies insert/update/delete; deletes carry NULL price") {
    val r = SparkEntry.queries("q_cdc_changes")(spark, Sf)
    val kinds = r.select("change_type").distinct().collect().map(_.getString(0)).toSet
    // full-outer snapshot diff (SQL Server CDC captures deletes too): all
    // three classes must appear in this data, and nothing else
    assert(kinds == Set("insert", "update", "delete"))
    assert(r.filter(col("change_type") === "delete" && col("new_price").isNotNull).isEmpty)
    assert(r.filter(col("change_type") =!= "delete" && col("new_price").isNull).isEmpty)
  }

  test("scd2: per-key validity intervals chain without overlap") {
    val r = SparkEntry.queries("q_scd2_versions")(spark, Sf)
    // exactly one open (current) interval per user
    val open = r.filter(col("valid_to_us").isNull).groupBy("user_id").count()
    assert(open.filter(col("count") =!= 1).isEmpty)
    // each interval ends exactly where the next begins (lead semantics)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("valid_from_us")
    val chained = r.withColumn("next_from", lead("valid_from_us", 1).over(w))
      .filter(col("valid_to_us").isNotNull && col("valid_to_us") =!= col("next_from"))
    assert(chained.isEmpty)
  }

  test("session gaps: no intra-session gap exceeds 30 minutes") {
    val gapUs = 30L * 60 * 1000 * 1000
    val ev = graft.util.Tables.events(spark, Sf)
    import org.apache.spark.sql.expressions.Window
    val sess = SparkEntry.queries("q_session_gaps")(spark, Sf)
    // session bounds are consistent
    assert(sess.filter(col("session_end_us") < col("session_start_us")).isEmpty)
    // sessions of one user never overlap in time
    val w = Window.partitionBy("user_id").orderBy("session_id")
    val overlap = sess.withColumn("prev_end", lag("session_end_us", 1).over(w))
      .filter(col("prev_end").isNotNull && col("session_start_us") <= col("prev_end"))
    assert(overlap.isEmpty)
    // consecutive sessions are separated by MORE than the gap
    val tight = sess.withColumn("prev_end", lag("session_end_us", 1).over(w))
      .filter(col("prev_end").isNotNull && col("session_start_us") - col("prev_end") <= gapUs)
    assert(tight.isEmpty)
  }

  test("sketch aggregates stay within declared error of exact results") {
    val li = graft.util.Tables.t(spark, Sf, "lineitem")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("exact_orders"))
    val joined = SparkEntry.queries("q_approx_sketches")(spark, Sf)
      .join(exact, "l_returnflag")
    // HLL++ with rsd=0.02: allow 5x slack at this small cardinality
    val bad = joined.filter(
      abs(col("approx_orders") - col("exact_orders")) >
        col("exact_orders") * 0.10)
    assert(bad.isEmpty, bad.collect().mkString(","))
    // quantile sketch: p50 within the observed min/max and below p99
    val bounds = joined.filter(col("p50_price") > col("p99_price"))
    assert(bounds.isEmpty)
  }

  test("date dim covers the full range with correct weekend flags") {
    val r = SparkEntry.queries("q_date_dim_generate")(spark, Sf)
    assert(r.count() === 1096) // 2000 (leap) + 2001 + 2002
    assert(r.filter(col("is_weekend") && col("dow_iso") < 6).isEmpty)
  }

  test("date dim is range-parameterized (README '2000 to current year' shape)") {
    val r = graft.operators.Warehouse.dateDim(spark, "2024-01-01", "2024-12-31")
    assert(r.count() === 366) // leap year
    assert(r.filter(col("d") === lit("2024-02-29").cast("date")).count() === 1)
  }
}
