package graft

import org.apache.spark.sql.functions._
import graft.operators.{Insights, Windows}

/** Round-8e additions: event-path trigrams, the Kaplan–Meier survival
  * curve, and the cohort LTV matrix. Differentials against sequential
  * driver folds on the collected sf0.001 inputs plus the structural
  * invariants (KM monotonicity, LTV cumulativity) the oracle can't state.
  */
class Round8eOpsSpec extends SparkSpec {

  test("eventTrigrams: matches a per-user sliding-window fold; shares sum to 1") {
    val out = Windows.eventTrigrams(spark, Sf).collect()
      .map(r => (r.getAs[String]("e1"), r.getAs[String]("e2"), r.getAs[String]("e3")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("share"))).toMap
    val ev = graft.util.Tables.events(spark, Sf)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"),
                 r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val expected = ev.groupBy(_._1).values.flatMap { rs =>
      rs.sortBy(r => (r._2, r._3)).map(_._4).sliding(3).filter(_.length == 3)
        .map(s => (s(0), s(1), s(2)))
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out.view.mapValues(_._1).toMap === expected)
    val total = expected.values.sum.toDouble
    expected.foreach { case (k, n) =>
      assert(out(k)._2 === math.floor(n / total * 10000.0 + 0.5) / 10000.0)
    }
  }

  test("survivalKm: matches a sequential KM fold; curve is monotone non-increasing from 1") {
    val out = Insights.survivalKm(spark, Sf, censorDays = 90).collect()
      .sortBy(_.getAs[Long]("duration_days"))
    val pc = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate").cast("date")).as("f"),
           max(col("o_orderdate").cast("date")).as("l"))
      .collect()
      .map(r => (r.getAs[java.sql.Date]("f").toLocalDate,
                 r.getAs[java.sql.Date]("l").toLocalDate))
    val hz = pc.map(_._2).max
    val durs = pc.map { case (f, l) =>
      (java.time.temporal.ChronoUnit.DAYS.between(f, l),
       java.time.temporal.ChronoUnit.DAYS.between(l, hz) > 90) }
    val byT = durs.groupBy(_._1).map { case (t, v) =>
      t -> (v.count(_._2).toLong, v.size.toLong) }.toSeq.sortBy(_._1)
    var atRisk = durs.size.toLong; var s = 1.0
    val folded = byT.flatMap { case (t, (d, c)) =>
      val row = if (d > 0) {
        s = s * (atRisk - d).toDouble / atRisk
        Some((t, atRisk, d, s))
      } else None
      atRisk -= c
      row
    }
    assert(out.length === folded.length)
    out.zip(folded).foreach { case (r, (t, n, d, sv)) =>
      assert(r.getAs[Long]("duration_days") === t)
      assert(r.getAs[Long]("n_risk") === n)
      assert(r.getAs[Long]("deaths") === d)
      assert(math.abs(r.getAs[Double]("survival") - sv) < 1e-3,
        s"survival at $t: ${r.getAs[Double]("survival")} vs $sv")
    }
    // KM invariants: starts below 1, monotone non-increasing, within [0,1]
    val curve = out.map(_.getAs[Double]("survival"))
    assert(curve.head < 1.0 && curve.head > 0.0)
    curve.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-9); case _ => }
    assert(curve.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("cohortLtv: matches a per-cohort fold; per-head LTV is cumulative and non-decreasing") {
    val out = Insights.cohortLtv(spark, Sf).collect()
    val o = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_custkey"),
              (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("mi"),
              graft.util.Tables.money(col("o_totalprice")).as("v"))
      .collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Int]("mi"),
                 BigDecimal(r.getAs[java.math.BigDecimal]("v"))))
    val first = o.groupBy(_._1).map { case (ck, v) => ck -> v.map(_._2).min }
    val cells = o.groupBy(r => (first(r._1).toLong, (r._2 - first(r._1)).toLong))
      .map { case (k, v) => k -> v.map(_._3).sum }
    val sizes = first.values.groupBy(_.toLong).map { case (c, v) => c -> v.size.toLong }
    assert(out.map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("age"))).toSet ===
      cells.keySet)
    out.groupBy(_.getAs[Long]("cohort")).foreach { case (c, rs) =>
      val seq = rs.sortBy(_.getAs[Long]("age"))
      var run = BigDecimal(0)
      seq.foreach { r =>
        val k = (c, r.getAs[Long]("age"))
        run += cells(k)
        assert(r.getAs[Long]("n_customers") === sizes(c))
        assert(math.abs(r.getAs[Double]("revenue") - cells(k).toDouble) < 1e-6)
        assert(math.abs(r.getAs[Double]("cum_revenue") - run.toDouble) < 1e-6)
        assert(math.abs(r.getAs[Double]("ltv_per_customer") -
          math.floor(run.toDouble / sizes(c) * 10000.0 + 0.5) / 10000.0) < 1e-9)
      }
      // LTV per head never decreases with age (revenue is non-negative)
      val ltv = seq.map(_.getAs[Double]("ltv_per_customer"))
      ltv.sliding(2).foreach { case Array(a, b) => assert(b >= a - 1e-9); case _ => }
    }
  }
}
