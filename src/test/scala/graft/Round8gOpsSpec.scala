package graft

import org.apache.spark.sql.functions._
import graft.operators.{Insights, Text, Windows}

/** Round-8g additions: funnel conversion-time distribution, emerging
  * terms, and time-decay multi-touch attribution. Driver-fold
  * differentials plus the conservation laws the oracle can't state.
  */
class Round8gOpsSpec extends SparkSpec {

  test("funnelTime: converted population and lag quartiles match a per-user fold") {
    val row = Windows.funnelTime(spark, Sf).collect().head
    val ev = graft.util.Tables.events(spark, Sf)
      .select(col("user_id"), col("event_type"), col("ts_us")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
                 r.getAs[Long]("ts_us")))
    val byUser = ev.groupBy(_._1)
    val signups = byUser.flatMap { case (u, rs) =>
      val s = rs.filter(_._2 == "signup").map(_._3)
      if (s.isEmpty) None else Some(u -> s.min)
    }
    val lags = signups.flatMap { case (u, t0) =>
      val p = byUser(u).filter(r => r._2 == "purchase" && r._3 > t0).map(_._3)
      if (p.isEmpty) None else Some((p.min - t0).toDouble)
    }.toSeq.sorted
    assert(row.getAs[Long]("n_signup") === signups.size.toLong)
    assert(row.getAs[Long]("n_converted") === lags.size.toLong)
    def q(p: Double): Double = {
      val h = (lags.size - 1) * p; val k = math.floor(h).toInt
      (lags(k) + (h - k) * (lags(math.min(k + 1, lags.size - 1)) - lags(k))) / 6.0e7
    }
    for ((c, p) <- Seq("p25_minutes" -> 0.25, "p50_minutes" -> 0.5,
                       "p75_minutes" -> 0.75, "p90_minutes" -> 0.9))
      assert(math.abs(row.getAs[Double](c) - q(p)) < 1e-2, s"$c")
    assert(math.abs(row.getAs[Double]("conv_rate") -
      lags.size.toDouble / signups.size) < 1e-3)
  }

  test("emergingTerms: ranks by smoothed growth over the median-id split, fold agrees") {
    val out = Text.emergingTerms(spark, Sf, 50).collect()
    val docs = graft.util.Tables.t(spark, Sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val ids = docs.map(_._1.toDouble).sorted
    val h = (ids.length - 1) * 0.5
    val mid = ids(h.toInt) + (h - h.toInt) *
      (ids(math.min(h.toInt + 1, ids.length - 1)) - ids(h.toInt))
    val counts = docs.flatMap { case (id, text) =>
      text.split(" ").filter(_.nonEmpty).map(t => (t, id <= mid)) }
      .groupBy(_._1).map { case (t, v) =>
        t -> (v.count(_._2).toLong, v.count(!_._2).toLong) }
    val expected = counts.toSeq
      .map { case (t, (e, l)) => (t, e, l, (l + 1).toDouble / (e + 1).toDouble) }
      .sortBy { case (t, _, _, g) => (-g, t) }.take(50)
    val got = out.map(r => (r.getAs[String]("term"), r.getAs[Long]("early_n"),
                            r.getAs[Long]("late_n"), r.getAs[Double]("growth")))
    assert(got.map(_._1).toSeq === expected.map(_._1))
    got.zip(expected).foreach { case ((t, e, l, g), (_, ee, le, ge)) =>
      assert(e === ee && l === le, s"term $t counts")
      assert(g === math.floor(ge * 10000.0 + 0.5) / 10000.0, s"term $t growth")
    }
  }

  test("attributionTimeDecay: credited revenue conserves each attributable conversion exactly") {
    val out = Insights.attributionTimeDecay(spark, Sf, 7).collect()
    val ev = graft.util.Tables.events(spark, Sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
              col("value"), col("ts_us")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
                 r.getAs[String]("event_type"), r.getAs[Double]("value"),
                 r.getAs[Long]("ts_us")))
    val band = 7L * 86400000000L
    val byUser = ev.groupBy(_._1)
    // conversions with >=1 in-window touch: their cent value is credited once
    val attributable = byUser.values.flatMap { rs =>
      val touches = rs.filter(_._3 != "purchase")
      rs.filter(_._3 == "purchase").filter { c =>
        touches.exists(t => t._5 < c._5 && c._5 - t._5 <= band) }
    }.toSeq
    val expectedTotal = attributable
      .map(c => math.floor(c._4 * 100.0 + 0.5) / 100.0).sum
    val credited = out.map(_.getAs[Double]("credited_revenue")).sum
    assert(math.abs(credited - expectedTotal) < 0.05,
      s"conservation: credited $credited vs $expectedTotal")
    // channel fold: exponential weights, share-normalized
    val perChannel = scala.collection.mutable.Map[String, Double]().withDefaultValue(0.0)
    attributable.foreach { c =>
      val touches = byUser(c._1).filter(t =>
        t._3 != "purchase" && t._5 < c._5 && c._5 - t._5 <= band)
      val ws = touches.map(t => t._3 -> math.exp((t._5 - c._5).toDouble / 86400000000.0))
      val byCh = ws.groupBy(_._1).map { case (ch, v) =>
        ch -> v.map(w => BigDecimal(w._2).setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum }
      val tot = byCh.values.sum
      val vc = math.floor(c._4 * 100.0 + 0.5) / 100.0
      byCh.foreach { case (ch, w) =>
        perChannel(ch) += (w.toDouble / tot.toDouble) * vc }
    }
    out.foreach { r =>
      val ch = r.getAs[String]("channel")
      assert(math.abs(r.getAs[Double]("credited_revenue") - perChannel(ch)) < 0.02,
        s"channel $ch")
    }
  }
}
