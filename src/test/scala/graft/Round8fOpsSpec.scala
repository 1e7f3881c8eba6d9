package graft

import org.apache.spark.sql.functions._
import graft.operators.{Insights, Relational, Text}

/** Round-8f additions: Bollinger bands, drawdown, seasonal/trend strength,
  * the lang-ID confusion matrix, and the distributed interpolated
  * percentile. Differentials against sequential driver folds plus the
  * structural invariants the oracle can't state.
  */
class Round8fOpsSpec extends SparkSpec {

  private def dailyRevenueCents: Seq[(java.time.LocalDate, Long)] =
    graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg((sum(graft.util.Tables.money(col("o_totalprice"))) * 100)
        .cast("long").as("rc"))
      .collect()
      .map(r => (r.getAs[java.sql.Date]("d").toLocalDate, r.getAs[Long]("rc")))
      .sortBy(_._1.toEpochDay)

  test("bollingerBands: matches a sliding-window fold; bands bracket the mid") {
    val out = Insights.bollingerBands(spark, Sf, 20, 2.0).collect()
      .map(r => r.getAs[java.sql.Date]("d").toLocalDate -> r).toMap
    val daily = dailyRevenueCents
    assert(out.size === daily.size - 19)
    daily.sliding(20).foreach { win =>
      val (d, rc) = win.last
      val s = win.map(_._2).sum
      val ss = win.map(w => BigInt(w._2) * BigInt(w._2)).sum
      val mean = s.toDouble / 20.0 / 100.0
      val sd = math.sqrt((ss.toDouble - s.toDouble * s.toDouble / 20.0) / 20.0) / 100.0
      val r = out(d)
      assert(math.abs(r.getAs[Double]("mid") - mean) < 1e-3, s"$d mid")
      assert(math.abs(r.getAs[Double]("upper") - (mean + 2 * sd)) < 1e-3, s"$d upper")
      assert(math.abs(r.getAs[Double]("lower") - (mean - 2 * sd)) < 1e-3, s"$d lower")
      assert(r.getAs[Boolean]("breakout") ===
        (rc / 100.0 > mean + 2 * sd || rc / 100.0 < mean - 2 * sd), s"$d breakout")
      assert(r.getAs[Double]("lower") <= r.getAs[Double]("mid") &&
        r.getAs[Double]("mid") <= r.getAs[Double]("upper"))
    }
  }

  test("drawdown: peak is the running max and drawdown its relative gap, zero at new peaks") {
    val out = Insights.drawdown(spark, Sf).collect()
      .map(r => r.getAs[java.sql.Date]("d").toLocalDate -> r).toMap
    var peak = 0L
    dailyRevenueCents.foreach { case (d, rc) =>
      peak = math.max(peak, rc)
      val r = out(d)
      assert(math.abs(r.getAs[Double]("peak") - peak / 100.0) < 1e-3, s"$d peak")
      val dd = (peak - rc).toDouble / peak.toDouble
      assert(math.abs(r.getAs[Double]("drawdown") - dd) < 1e-3, s"$d dd")
      if (rc == peak) assert(r.getAs[Double]("drawdown") === 0.0)
      assert(r.getAs[Double]("drawdown") >= 0.0 && r.getAs[Double]("drawdown") < 1.0)
    }
  }

  test("seasonalStrength: in [0,1], consistent with variances of the decompose components") {
    val row = Insights.seasonalStrength(spark, Sf).collect().head
    val fs = row.getAs[Double]("f_seasonal"); val ft = row.getAs[Double]("f_trend")
    assert(fs >= 0.0 && fs <= 1.0); assert(ft >= 0.0 && ft <= 1.0)
    val comp = Insights.seasonalDecompose(spark, Sf)
      .filter(col("resid").isNotNull).collect()
      .map(r => (r.getAs[Double]("trend"), r.getAs[Double]("seasonal"),
                 r.getAs[Double]("resid")))
    assert(row.getAs[Long]("n_months") === comp.length.toLong)
    def popVar(xs: Seq[Double]): Double = {
      val n = xs.length.toDouble; val m = xs.sum / n
      xs.map(x => (x - m) * (x - m)).sum / n
    }
    val vr = popVar(comp.map(_._3).toSeq)
    val fsExp = math.max(0.0, 1.0 - vr / popVar(comp.map(c => c._2 + c._3).toSeq))
    val ftExp = math.max(0.0, 1.0 - vr / popVar(comp.map(c => c._1 + c._3).toSeq))
    assert(math.abs(fs - fsExp) < 1e-3, s"f_seasonal $fs vs $fsExp")
    assert(math.abs(ft - ftExp) < 1e-3, s"f_trend $ft vs $ftExp")
  }

  test("langIdConfusion: cells partition the corpus and agree with langId row-for-row") {
    val out = Text.langIdConfusion(spark, Sf).collect()
    val preds = Text.langId(spark, Sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("lang_pred")))
    val expected = preds.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out.map(r => (r.getAs[String]("lang"), r.getAs[String]("lang_pred")) ->
      r.getAs[Long]("n")).toMap === expected)
    assert(out.map(_.getAs[Long]("n")).sum === preds.length.toLong)
    // shares sum to 1 within each declared language
    out.groupBy(_.getAs[String]("lang")).values.foreach { rs =>
      assert(math.abs(rs.map(_.getAs[Double]("share")).sum - 1.0) < 1e-3)
    }
  }

  test("percentileContDistributed: matches the textbook h=(n-1)p interpolation on sorted values") {
    val out = Relational.percentileContDistributed(spark, Sf).collect()
      .map(r => r.getAs[Double]("p") -> r).toMap
    val vals = graft.util.Tables.t(spark, Sf, "orders")
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("v"))
      .collect().map(_.getAs[Long]("v")).sorted
    for (p <- Seq(0.25, 0.5, 0.75, 0.9)) {
      val h = (vals.length - 1).toDouble * p
      val k = math.floor(h).toInt
      val lo = vals(k) / 100.0
      val hi = vals(math.min(k + 1, vals.length - 1)) / 100.0
      val exp = lo + (h - math.floor(h)) * (hi - lo)
      val r = out(p)
      assert(r.getAs[Long]("n") === vals.length.toLong)
      assert(math.abs(r.getAs[Double]("value") - exp) < 1e-3, s"p=$p")
    }
    // interpolated percentiles are monotone in p
    val series = Seq(0.25, 0.5, 0.75, 0.9).map(out(_).getAs[Double]("value"))
    series.sliding(2).foreach { case Seq(a, b) => assert(b >= a); case _ => }
  }
}
