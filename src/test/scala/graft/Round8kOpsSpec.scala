package graft

import org.apache.spark.sql.functions._
import graft.operators.Insights

/** Round-8k additions: seasonal Mann–Kendall, the Grubbs outlier
  * statistic, and the Hurst exponent. Driver folds plus the cross-query
  * and range laws the oracle can't state.
  */
class Round8kOpsSpec extends SparkSpec {

  private def dailyCents: Seq[(java.time.LocalDate, Long)] =
    graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg((sum(graft.util.Tables.money(col("o_totalprice"))) * 100)
        .cast("long").as("rc"))
      .collect()
      .map(r => (r.getAs[java.sql.Date]("d").toLocalDate, r.getAs[Long]("rc")))
      .sortBy(_._1.toEpochDay)

  test("seasonalMk: total row sums the per-season statistics; per-season S matches a fold") {
    val out = Insights.seasonalMk(spark, Sf).collect()
      .map(r => r.getAs[Int]("moy") ->
        (r.getAs[Long]("n_years"), r.getAs[Long]("s"), r.getAs[Long]("var18"))).toMap
    assert(out.keySet === (0 to 12).toSet)
    val seasons = (1 to 12).map(out)
    assert(out(0)._1 === seasons.map(_._1).sum)
    assert(out(0)._2 === seasons.map(_._2).sum)
    assert(out(0)._3 === seasons.map(_._3).sum)
    // per-season fold on the monthly frame
    val monthly = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(month(col("o_orderdate")).as("moy"), year(col("o_orderdate")).as("yr"))
      .agg(sum(graft.util.Tables.money(col("o_totalprice"))).as("v"))
      .collect()
      .map(r => (r.getAs[Int]("moy"), r.getAs[Int]("yr"),
                 BigDecimal(r.getAs[java.math.BigDecimal]("v"))))
    monthly.groupBy(_._1).foreach { case (moy, rs) =>
      val pts = rs.sortBy(_._2)
      val s = (for { i <- pts.indices; j <- i + 1 until pts.length }
        yield (pts(j)._3 compare pts(i)._3).sign.toLong).sum
      assert(out(moy)._1 === pts.length.toLong, s"moy $moy years")
      assert(out(moy)._2 === s, s"moy $moy S")
    }
  }

  test("grubbs: names the day with the largest absolute deviation, statistic matches a fold") {
    val row = Insights.grubbs(spark, Sf).collect().head
    val xs = dailyCents
    val n = xs.length.toDouble
    val mean = xs.map(_._2).sum / n
    val sd = math.sqrt(xs.map(x => (x._2 - mean) * (x._2 - mean)).sum / (n - 1.0))
    val worst = xs.maxBy(x => (math.abs(x._2 - mean), -x._1.toEpochDay))
    assert(row.getAs[Long]("n_days") === xs.length.toLong)
    assert(row.getAs[java.sql.Date]("outlier_day").toLocalDate === worst._1)
    assert(math.abs(row.getAs[Double]("g") -
      math.abs(worst._2 - mean) / sd) < 1e-3)
    assert(math.abs(row.getAs[Double]("mean_rev") - mean / 100.0) < 1e-2)
    assert(math.abs(row.getAs[Double]("sd_rev") - sd / 100.0) < 1e-2)
    assert(row.getAs[Double]("g") > 0.0)
  }

  test("hurst: matches a sequential R/S fold and stays in the meaningful (0,1) band") {
    val out = Insights.hurstExponent(spark, Sf, Seq(8, 16, 32, 64)).collect()
      .map(r => r.getAs[Int]("block_n") -> r).toMap
    val xs = dailyCents.map(_._2.toDouble)
    val folded = Seq(8, 16, 32, 64).map { bn =>
      val rss = xs.grouped(bn).filter(_.length == bn).map { blk =>
        val m = blk.sum / bn
        val cum = blk.scanLeft(0.0)(_ + _).tail.zipWithIndex
          .map { case (c, k) => c - (k + 1) * m }
        val s = math.sqrt(blk.map(x => (x - m) * (x - m)).sum / bn)
        (cum.max - cum.min) / s
      }.toSeq
      bn -> (rss.size.toLong, rss.sum / rss.size)
    }.toMap
    folded.foreach { case (bn, (nb, mrs)) =>
      assert(out(bn).getAs[Long]("n_blocks") === nb, s"bn=$bn blocks")
      assert(math.abs(out(bn).getAs[Double]("mean_rs") - mrs) < 1e-2, s"bn=$bn R/S")
    }
    val lx = folded.keys.toSeq.sorted.map(b => math.log(b.toDouble))
    val ly = folded.keys.toSeq.sorted.map(b => math.log(folded(b)._2))
    val np = lx.length.toDouble
    val slope = (np * lx.zip(ly).map { case (a, b) => a * b }.sum - lx.sum * ly.sum) /
      (np * lx.map(a => a * a).sum - lx.sum * lx.sum)
    val h = out(8).getAs[Double]("hurst")
    assert(math.abs(h - slope) < 1e-3)
    assert(out.values.map(_.getAs[Double]("hurst")).toSet.size === 1,
      "hurst must be one number repeated per row")
    assert(h > 0.0 && h < 1.0, s"hurst out of the meaningful band: $h")
  }
}
