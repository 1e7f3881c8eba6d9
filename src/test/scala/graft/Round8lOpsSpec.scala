package graft

import org.apache.spark.sql.functions._
import graft.operators.Insights

/** Round-8l additions: Kruskal–Wallis H, Jarque–Bera, the Wald–Wolfowitz
  * runs test, and the Brown–Forsythe Levene test. Driver folds plus the
  * cross-query consistency laws the oracle can't state.
  */
class Round8lOpsSpec extends SparkSpec {

  private def orderCents: Seq[(Long, String)] =
    graft.util.Tables.t(spark, Sf, "orders")
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("v"),
              col("o_orderpriority").as("grp"))
      .collect().map(r => (r.getAs[Long]("v"), r.getAs[String]("grp")))

  private def dailyCents: Seq[(java.time.LocalDate, Long)] =
    graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg((sum(graft.util.Tables.money(col("o_totalprice"))) * 100)
        .cast("long").as("rc"))
      .collect()
      .map(r => (r.getAs[java.sql.Date]("d").toLocalDate, r.getAs[Long]("rc")))
      .sortBy(_._1.toEpochDay)

  test("kruskalWallis: mean ranks and H match a driver fold with tie-averaged ranks") {
    val out = Insights.kruskalWallis(spark, Sf).collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r).toMap
    val xs = orderCents
    val n = xs.length
    // tie-averaged ranks on the driver
    val rankOf = xs.map(_._1).sorted.zipWithIndex
      .groupBy(_._1).map { case (v, ps) =>
        v -> ps.map(_._2 + 1).sum.toDouble / ps.length }
    val groups = xs.groupBy(_._2)
    var rsum = 0.0
    groups.foreach { case (g, vs) =>
      val meanRank = vs.map(x => rankOf(x._1)).sum / vs.length
      assert(out(g).getAs[Long]("n") === vs.length.toLong, s"n of $g")
      assert(math.abs(out(g).getAs[Double]("mean_rank") - meanRank) < 1e-3,
             s"mean rank of $g")
      val rj = vs.map(x => rankOf(x._1)).sum
      rsum += rj * rj / vs.length
    }
    val h = 12.0 / (n.toDouble * (n + 1)) * rsum - 3.0 * (n + 1)
    val all = out("ALL")
    assert(all.getAs[Long]("n") === n.toLong)
    assert(math.abs(all.getAs[Double]("h") - h) < 1e-3)
    // tie correction can only GROW |H| (divisor in (0,1]) and both are finite
    assert(math.abs(all.getAs[Double]("h_tie")) >= math.abs(all.getAs[Double]("h")) - 1e-9)
    // group rows carry no decision statistic
    groups.keys.foreach(g => assert(out(g).isNullAt(out(g).fieldIndex("h"))))
  }

  test("jarqueBera: moments match the naive driver fold about the true mean") {
    val row = Insights.jarqueBera(spark, Sf).collect().head
    val xs = dailyCents.map(_._2.toDouble)
    val n = xs.length
    val mean = xs.sum / n
    val m2 = xs.map(x => math.pow(x - mean, 2)).sum / n
    val m3 = xs.map(x => math.pow(x - mean, 3)).sum / n
    val m4 = xs.map(x => math.pow(x - mean, 4)).sum / n
    val skew = m3 / (m2 * math.sqrt(m2))
    val kx = m4 / (m2 * m2) - 3.0
    val jb = n / 6.0 * (skew * skew + kx * kx / 4.0)
    assert(row.getAs[Long]("n_days") === n.toLong)
    assert(math.abs(row.getAs[Double]("skewness") - skew) < 1e-3)
    assert(math.abs(row.getAs[Double]("kurtosis_excess") - kx) < 1e-3)
    assert(math.abs(row.getAs[Double]("jb") - jb) < math.max(1e-3, jb * 1e-6))
  }

  test("runsTest: run count, sign counts and z match a sequential driver fold") {
    val row = Insights.runsTest(spark, Sf).collect().head
    val xs = dailyCents
    val sortedVals = xs.map(_._2).sorted
    val med = sortedVals((xs.length + 1) / 2 - 1) // rank ceil(n/2), 1-based
    val signs = xs.filter(_._2 != med).map(x => x._2 > med)
    val runs = 1 + signs.sliding(2).count { case Seq(a, b) => a != b }
    val n1 = signs.count(identity).toDouble
    val n2 = signs.count(!_).toDouble
    val nn = n1 + n2
    val mu = 2.0 * n1 * n2 / nn + 1.0
    val sg = math.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - nn) /
                       (nn * nn * (nn - 1.0)))
    assert(row.getAs[Long]("n_above") === n1.toLong)
    assert(row.getAs[Long]("n_below") === n2.toLong)
    assert(row.getAs[Long]("runs") === runs.toLong)
    assert(math.abs(row.getAs[Double]("z") - (runs - mu) / sg) < 1e-3)
  }

  test("levene: per-group medians/deviations and F match a driver ANOVA on |q - med|") {
    val out = Insights.leveneBrownForsythe(spark, Sf).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val qs = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_returnflag").as("grp"), col("l_quantity").cast("long").as("q"))
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("q")))
    val groups = qs.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2) }
    val zs = groups.map { case (g, vs) =>
      val sorted = vs.sorted
      val med = sorted((vs.length + 1) / 2 - 1)
      assert(out(g).getAs[Long]("median_qty") === med, s"median of $g")
      val z = vs.map(v => math.abs(v - med).toDouble)
      assert(math.abs(out(g).getAs[Double]("mean_absdev") - z.sum / z.length) < 1e-3,
             s"mean absdev of $g")
      g -> z
    }
    val k = zs.size
    val n = zs.values.map(_.length).sum
    val grand = zs.values.flatten.sum / n
    val ssb = zs.values.map(z => z.length * math.pow(z.sum / z.length - grand, 2)).sum
    val ssw = zs.values.map(z => { val m = z.sum / z.length
      z.map(v => (v - m) * (v - m)).sum }).sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(out("ALL").getAs[Double]("f") - f) < math.max(1e-3, f * 1e-6))
  }

  test("runsTest median and levene medians agree with the rank-based discrete-median law") {
    // the discrete median is a member of the data and at least half the
    // mass sits at or below it — the law both operators' medians satisfy
    val xs = dailyCents.map(_._2)
    val sorted = xs.sorted
    val med = sorted((xs.length + 1) / 2 - 1)
    assert(xs.contains(med))
    assert(xs.count(_ <= med) * 2 >= xs.length)
  }
}
