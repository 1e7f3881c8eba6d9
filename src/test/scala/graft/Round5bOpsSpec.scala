package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Invariants for the second round-5 operator batch (exact values are under
  * the DuckDB oracle via graft.Verify; these pin the semantic and PLAN
  * properties the hash gate can't see).
  */
class Round5bOpsSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("star join: dims ride broadcast joins; only the fact-fact join shuffles") {
    val df = SparkEntry.queries("q_star_join")(spark, Sf)
    val r = df.collect()
    assert(r.length === 5, "ASIA has 5 nations")
    assert(r.forall(_.getAs[Double]("revenue") > 0.0))
    // customer carries no broadcast HINT (it scales with SF), so the dim
    // broadcast is AQE's runtime choice — assert on the FINAL adaptive
    // plan, not the static estimate (which conservatively plans SMJ)
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), "dim joins must broadcast")
    val shuffled = "(SortMergeJoin|ShuffledHashJoin)".r.findAllIn(p).length
    assert(shuffled <= 1, s"only the fact-fact join may shuffle:\n$p")
  }

  test("late-arriving dim: no fact key is dropped, inferred exactly the missing ones") {
    val r = SparkEntry.queries("q_late_arriving")(spark, Sf).collect()
    val factKeys = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0)).toSet
    val outKeys = r.map(_.getAs[Long]("c_custkey")).toSet
    assert(factKeys.subsetOf(outKeys), "every fact key must resolve in the dim")
    val inferred = r.filter(_.getAs[Int]("is_inferred") == 1)
    assert(inferred.nonEmpty, "the %10 carve-out must produce inferred members")
    inferred.foreach { row =>
      assert(row.getAs[Long]("c_custkey") % 10 === 0L)
      assert(row.getAs[String]("c_name").startsWith("UNKNOWN#"))
      assert(row.getAs[Int]("c_nationkey") === -1)
      assert(factKeys.contains(row.getAs[Long]("c_custkey")),
        "inferred members may only come from observed fact keys")
    }
  }

  test("surrogate keys: dense 1..n bijection in natural-key order") {
    val r = SparkEntry.queries("q_surrogate_key")(spark, Sf).collect()
    val n = r.length.toLong
    assert(r.map(_.getAs[Long]("sk")).sorted.toSeq === (1L to n).toSeq)
    val byNatural = r.sortBy(_.getAs[Long]("c_custkey")).map(_.getAs[Long]("sk")).toSeq
    assert(byNatural === (1L to n).toSeq, "sk order must follow natural-key order")
  }

  test("percentile_disc: returns actual group members at the ⌈p·n⌉ rank") {
    val r = SparkEntry.queries("q_percentile_disc")(spark, Sf).collect()
    val vals = graft.util.Tables.t(spark, Sf, "customer")
      .select(col("c_nationkey"), col("c_acctbal")).collect()
      .groupBy(_.getInt(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(r.nonEmpty)
    r.foreach { row =>
      val g = vals(row.getAs[Int]("c_nationkey"))
      val (p50, p90) = (row.getAs[Double]("p50_disc"), row.getAs[Double]("p90_disc"))
      // r4-rounded members: check against the rounded sorted list
      def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
      val rounded = g.map(r4)
      assert(rounded.contains(p50) && rounded.contains(p90),
        "discrete percentile must be an actual group value")
      assert(rounded(math.ceil(g.length * 0.5).toInt - 1) === p50)
      assert(rounded(math.ceil(g.length * 0.9).toInt - 1) === p90)
      assert(p50 <= p90)
    }
  }

  test("winsorize: row count preserved, values clamped into the per-type band") {
    val r = SparkEntry.queries("q_winsorize")(spark, Sf).collect()
    val total = graft.util.Tables.t(spark, Sf, "events").count()
    assert(r.length.toLong === total, "winsorization must never drop rows")
    r.groupBy(_.getAs[String]("event_type")).values.foreach { g =>
      val w = g.map(_.getAs[Double]("value_w"))
      val raw = g.map(_.getAs[Double]("value"))
      assert(w.min >= raw.min && w.max <= raw.max)
      // clamping moves at most ~10% of rows (p05/p95 band), never the bulk
      val moved = g.count(x => x.getAs[Double]("value_w") != x.getAs[Double]("value"))
      assert(moved <= math.ceil(g.length * 0.11), s"clamped $moved of ${g.length}")
    }
  }

  test("collocations: PMI from exact counts, thresholded, no empty tokens") {
    val r = SparkEntry.queries("q_collocations")(spark, Sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("c_xy") >= 5L)
      assert(row.getAs[String]("w1").nonEmpty && row.getAs[String]("w2").nonEmpty)
    }
    // shuffled-word near-dup corpus: frequent pairs recur, so some PMI > 0
    assert(r.exists(_.getAs[Double]("pmi") > 0.0))
  }

  test("media_chunk: windows tile the duration with the stride, ends clamped") {
    val r = SparkEntry.queries("q_media_chunk")(spark, Sf).collect()
    assert(r.nonEmpty)
    r.groupBy(_.getAs[Long]("doc_id")).values.foreach { g =>
      val d = g.head.getAs[Long]("duration_ms")
      val sorted = g.sortBy(_.getAs[Long]("chunk_idx"))
      sorted.zipWithIndex.foreach { case (row, i) =>
        assert(row.getAs[Long]("chunk_idx") === i.toLong)
        assert(row.getAs[Long]("chunk_start") === i.toLong * 25000L)
        assert(row.getAs[Long]("chunk_end") ===
          math.min(row.getAs[Long]("chunk_start") + 30000L, d))
        assert(row.getAs[Long]("chunk_start") < d, "no chunk starts past the end")
      }
      assert(sorted.last.getAs[Long]("chunk_end") === d, "tiling must reach the end")
    }
  }

  test("seasonal_anomaly: flagged rows really deviate >2 sigma from their season") {
    val ev = graft.util.Tables.events(spark, Sf)
      .select(col("event_id"), col("event_type"),
              (expr("ts_us div 3600000000L") % 24L).as("hour"), col("value"))
      .collect()
    val bySeason = ev.groupBy(r => (r.getAs[String]("event_type"), r.getAs[Long]("hour")))
    val flagged = SparkEntry.queries("q_seasonal_anomaly")(spark, Sf).collect()
    assert(flagged.nonEmpty)
    flagged.foreach { row =>
      val g = bySeason((row.getAs[String]("event_type"), row.getAs[Long]("hour")))
        .map(_.getAs[Double]("value"))
      val mu = g.sum / g.length
      val sigma = math.sqrt(g.map(v => (v - mu) * (v - mu)).sum / (g.length - 1))
      val v = row.getAs[Double]("value")
      // r4-rounded output vs naive double recompute: generous tolerance
      assert(math.abs(v - mu) > 1.9 * sigma,
        s"flagged value $v is not anomalous for mu=$mu sigma=$sigma")
    }
  }

  test("gap fill: spine is gapless per user, filled days carry the last observed value") {
    val r = SparkEntry.queries("q_gap_fill_locf")(spark, Sf).collect()
    assert(r.nonEmpty)
    r.groupBy(_.getAs[Long]("user_id")).values.foreach { g =>
      val days = g.map(_.getAs[Long]("day")).sorted
      assert(days.last - days.head + 1 === days.length.toLong, "no missing days")
      assert(g.head.getAs[Int]("is_filled") === 0 ||
             g.minBy(_.getAs[Long]("day")).getAs[Int]("is_filled") === 0,
        "spine starts on an observed day")
      val sorted = g.sortBy(_.getAs[Long]("day"))
      sorted.sliding(2).foreach {
        case Array(prev, cur) if cur.getAs[Int]("is_filled") == 1 =>
          assert(cur.getAs[Double]("v_filled") === prev.getAs[Double]("v_filled"),
            "filled day must carry the previous day's value")
        case _ => ()
      }
      assert(!sorted.exists(_.isNullAt(sorted.head.fieldIndex("v_filled"))))
    }
  }
}
