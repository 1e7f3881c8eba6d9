package graft

import org.apache.spark.sql.functions._
import graft.operators.Insights

/** Round-8o additions: the Dickey–Fuller unit-root regression,
  * historical VaR/expected-shortfall, and the Friedman blocked rank
  * test. Sequential driver folds plus the tail/rank laws the oracle
  * can't state.
  */
class Round8oOpsSpec extends SparkSpec {

  private def dailyCents: Seq[(java.time.LocalDate, Long)] =
    graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg((sum(graft.util.Tables.money(col("o_totalprice"))) * 100)
        .cast("long").as("rc"))
      .collect()
      .map(r => (r.getAs[java.sql.Date]("d").toLocalDate, r.getAs[Long]("rc")))
      .sortBy(_._1.toEpochDay)

  test("adfTest: gamma, se and t match a driver OLS of diffs on lagged levels") {
    val row = Insights.adfTest(spark, Sf).collect().head
    val xs = dailyCents.map(_._2.toDouble)
    val pairs = xs.sliding(2).map { case Seq(a, b) => (a, b - a) }.toSeq
    val n = pairs.length.toDouble
    val mx = pairs.map(_._1).sum / n
    val my = pairs.map(_._2).sum / n
    val sxx = pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum
    val sxy = pairs.map(p => (p._1 - mx) * (p._2 - my)).sum
    val syy = pairs.map(p => (p._2 - my) * (p._2 - my)).sum
    val g = sxy / sxx
    val se = math.sqrt((syy - g * sxy) / (n - 2.0) / sxx)
    assert(row.getAs[Long]("n_pairs") === pairs.length.toLong)
    assert(math.abs(row.getAs[Double]("gamma") - g) < 1e-3)
    assert(math.abs(row.getAs[Double]("se") - se) < 1e-3)
    assert(math.abs(row.getAs[Double]("t_stat") - g / se) < 2e-3)
    // a stationary-by-construction synthetic day series is mean-reverting:
    // gamma must sit in (-2, 0] for ANY series that isn't explosive
    assert(row.getAs[Double]("gamma") <= 0.0 + 1e-4)
    assert(row.getAs[Double]("gamma") > -2.0)
  }

  test("varEs: tail quantile and shortfall match a sorted driver fold; ES <= VaR") {
    val row = Insights.varEs(spark, Sf).collect().head
    val xs = dailyCents.map(_._2.toDouble)
    val rets = xs.sliding(2).map { case Seq(a, b) => math.log(b / a) }.toSeq
    val k = math.ceil(rets.length * 0.05).toLong
    val sorted = rets.sorted
    val var5 = sorted(k.toInt - 1)
    val es5 = sorted.take(k.toInt).sum / k
    assert(row.getAs[Long]("n_returns") === rets.length.toLong)
    assert(row.getAs[Long]("n_tail") === k)
    assert(math.abs(row.getAs[Double]("var_5") - var5) < 1e-3)
    assert(math.abs(row.getAs[Double]("es_5") - es5) < 1e-3)
    // the coherent-tail law: the tail mean can't beat its own cutoff
    assert(row.getAs[Double]("es_5") <= row.getAs[Double]("var_5") + 1e-9)
  }

  test("friedman: per-treatment mean ranks and chi2 match a driver fold over complete blocks") {
    val out = Insights.friedman(spark, Sf).collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r).toMap
    val monthly = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("blk"),
               col("o_orderpriority").as("trt"))
      .agg(sum(graft.util.Tables.money(col("o_totalprice"))).as("v"))
      .collect()
      .map(r => (r.getAs[Int]("blk"), r.getAs[String]("trt"),
                 BigDecimal(r.getAs[java.math.BigDecimal]("v"))))
    val k = monthly.map(_._2).distinct.length
    val complete = monthly.groupBy(_._1).filter(_._2.length == k)
    val rsums = scala.collection.mutable.Map.empty[String, Double]
    complete.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      rows.foreach { r =>
        val below = rows.count(_._3 < r._3)
        val ties = rows.count(_._3 == r._3)
        val mid = below + (ties + 1) / 2.0
        rsums(r._2) = rsums.getOrElse(r._2, 0.0) + mid
      }
      assert(sorted.map(_._3).distinct.length <= k)
    }
    val n = complete.size.toDouble
    rsums.foreach { case (t, rj) =>
      assert(out(t).getAs[Long]("n_blocks") === n.toLong, s"blocks of $t")
      assert(math.abs(out(t).getAs[Double]("mean_rank") - rj / n) < 1e-3,
             s"mean rank of $t")
    }
    val chi2 = 12.0 / (n * k * (k + 1)) * rsums.values.map(r => r * r).sum -
               3.0 * n * (k + 1)
    assert(math.abs(out("ALL").getAs[Double]("chi2_f") - chi2) <
           math.max(1e-3, chi2.abs * 1e-6))
    // mean ranks of a complete blocked design average to (k+1)/2
    val grand = rsums.values.sum / (n * k)
    assert(math.abs(grand - (k + 1) / 2.0) < 1e-9)
  }
}
