package graft

import org.apache.spark.sql.functions._
import graft.operators.{Insights, Windows}

/** Round-8h additions: binary-segmentation changepoint, ABC–XYZ matrix,
  * log-log price elasticity, and the stream disorder rate. Driver-fold
  * differentials plus structural invariants.
  */
class Round8hOpsSpec extends SparkSpec {

  private def dailyCents: Seq[Long] =
    graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg((sum(graft.util.Tables.money(col("o_totalprice"))) * 100)
        .cast("long").as("rc"))
      .orderBy("d").collect().map(_.getAs[Long]("rc")).toSeq

  test("changepoint: the split minimizes total SSE over all candidate splits") {
    val row = Insights.changepoint(spark, Sf).collect().head
    val xs = dailyCents.map(_.toDouble)
    def sse(v: Seq[Double]): Double = {
      val m = v.sum / v.length; v.map(x => (x - m) * (x - m)).sum
    }
    val costs = (1 until xs.length).map(k => k -> (sse(xs.take(k)) + sse(xs.drop(k))))
    val (bestK, bestCost) = costs.minBy(_._2)
    assert(row.getAs[Long]("n_left") === bestK.toLong)
    assert(row.getAs[Long]("n_right") === (xs.length - bestK).toLong)
    val total = sse(xs)
    assert(math.abs(row.getAs[Double]("improvement_ratio") -
      (total - bestCost) / total) < 1e-3)
    assert(math.abs(row.getAs[Double]("mean_left") -
      xs.take(bestK).sum / bestK / 100.0) < 1e-2)
    assert(math.abs(row.getAs[Double]("mean_right") -
      xs.drop(bestK).sum / (xs.length - bestK) / 100.0) < 1e-2)
    assert(row.getAs[Double]("improvement_ratio") >= 0.0 &&
      row.getAs[Double]("improvement_ratio") <= 1.0)
  }

  test("abcXyz: cells partition the part universe and agree with the component queries") {
    val out = Insights.abcXyz(spark, Sf).collect()
    val abc = Insights.abcClassification(spark, Sf).collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[String]("abc_class"), r.getAs[Double]("revenue"))).toMap
    val monthly = graft.util.Tables.t(spark, Sf, "lineitem")
      .groupBy(col("l_partkey").as("pk"),
               date_trunc("month", col("l_shipdate")).cast("date").as("m"))
      .agg((sum(graft.util.Tables.money(col("l_quantity"))) * 100)
        .cast("long").as("qc"))
      .collect().map(r => (r.getAs[Long]("pk"), r.getAs[Long]("qc")))
    val xyz = monthly.groupBy(_._1).map { case (pk, rs) =>
      val v = rs.map(_._2.toDouble)
      val cls = if (v.length < 2) "Z" else {
        val m = v.sum / v.length
        val sd = math.sqrt(v.map(x => (x - m) * (x - m)).sum / (v.length - 1))
        val cv = sd / m
        if (cv < 0.5) "X" else if (cv < 1.0) "Y" else "Z"
      }
      pk -> cls
    }
    val expected = abc.keys.toSeq.map(pk => (abc(pk)._1, xyz(pk)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out.map(r => (r.getAs[String]("abc_class"), r.getAs[String]("xyz_class")) ->
      r.getAs[Long]("n_parts")).toMap === expected)
    assert(out.map(_.getAs[Long]("n_parts")).sum === abc.size.toLong)
  }

  test("priceElasticity: matches a per-brand ln-ln OLS fold") {
    val out = Insights.priceElasticity(spark, Sf).collect()
      .map(r => r.getAs[String]("p_brand") ->
        (r.getAs[Long]("n"), r.getAs[Double]("elasticity"))).toMap
    val li = graft.util.Tables.t(spark, Sf, "lineitem")
      .join(graft.util.Tables.t(spark, Sf, "part"),
            col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_extendedprice"), col("l_quantity"))
      .collect()
      .map(r => (r.getAs[String]("p_brand"),
                 math.floor(r.getAs[Double]("l_extendedprice") /
                   r.getAs[Double]("l_quantity") * 100.0 + 0.5) / 100.0,
                 math.floor(r.getAs[Double]("l_quantity") * 100.0 + 0.5) / 100.0))
    li.groupBy(_._1).foreach { case (b, rs) =>
      val xs = rs.map(r => math.log(r._2)); val ys = rs.map(r => math.log(r._3))
      val n = rs.length.toDouble
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (a, c) => a * c }.sum
      val sxx = xs.map(a => a * a).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(out(b)._1 === rs.length.toLong)
      assert(math.abs(out(b)._2 - slope) < 1e-3, s"brand $b")
    }
  }

  test("disorderRate: matches a per-customer adjacent-inversion fold; stream is genuinely disordered") {
    val row = Windows.disorderRate(spark, Sf).collect().head
    val ords = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
              col("o_orderdate").cast("date").as("d")).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"),
                 r.getAs[java.sql.Date]("d").toLocalDate))
    val lates = ords.groupBy(_._1).values.flatMap { rs =>
      rs.sortBy(_._2).map(_._3).toSeq.sliding(2).filter(_.length == 2)
        .map(p => if (p(1).isBefore(p(0)))
          Some(java.time.temporal.ChronoUnit.DAYS.between(p(1), p(0))) else None)
    }.toSeq
    assert(row.getAs[Long]("n_pairs") === lates.size.toLong)
    val inv = lates.flatten
    assert(inv.nonEmpty, "the order stream must actually be disordered")
    assert(row.getAs[Long]("n_inversions") === inv.size.toLong)
    assert(row.getAs[Long]("max_late_days") === inv.max)
    assert(math.abs(row.getAs[Double]("disorder_rate") -
      inv.size.toDouble / lates.size) < 1e-3)
    // p99 lateness sits between median and max of the inversion population
    val sorted = inv.sorted
    assert(row.getAs[Double]("p99_late_days") >= sorted(sorted.length / 2).toDouble)
    assert(row.getAs[Double]("p99_late_days") <= sorted.last.toDouble)
  }
}
