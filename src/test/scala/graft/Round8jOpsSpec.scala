package graft

import org.apache.spark.sql.functions._
import graft.operators.{Insights, Relational, Text}

/** Round-8j additions: Wilson return-rate intervals, lead-time SLAs, the
  * basket-size histogram, and the exact-Jaccard dedup threshold curve.
  * Driver folds plus the interval/monotonicity laws the oracle can't
  * state.
  */
class Round8jOpsSpec extends SparkSpec {

  test("returnRateCi: Wilson interval contains the rate, stays in [0,1], matches a fold") {
    val out = Insights.returnRateCi(spark, Sf).collect()
    val li = graft.util.Tables.t(spark, Sf, "lineitem")
      .join(graft.util.Tables.t(spark, Sf, "part"),
            col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_returnflag")).collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[String]("l_returnflag")))
    val byBrand = li.groupBy(_._1).map { case (b, v) =>
      b -> (v.size.toLong, v.count(_._2 == "R").toLong) }
    out.foreach { r =>
      val b = r.getAs[String]("p_brand")
      val (n, k) = byBrand(b)
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("returns") === k)
      val p = k.toDouble / n
      val z = 1.96; val denom = 1.0 + z * z / n
      val center = (p + z * z / (2.0 * n)) / denom
      val half = z * math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n)) / denom
      assert(math.abs(r.getAs[Double]("wilson_lo") - (center - half)) < 1e-3)
      assert(math.abs(r.getAs[Double]("wilson_hi") - (center + half)) < 1e-3)
      // interval law: lo <= rate <= hi, both in [0,1]
      assert(r.getAs[Double]("wilson_lo") <= r.getAs[Double]("return_rate") + 1e-9)
      assert(r.getAs[Double]("return_rate") <= r.getAs[Double]("wilson_hi") + 1e-9)
      assert(r.getAs[Double]("wilson_lo") >= 0.0 && r.getAs[Double]("wilson_hi") <= 1.0)
    }
  }

  test("leadtimePercentiles: per-nation lag stats match a fold; p50 <= p90 <= max") {
    val out = Insights.leadtimePercentiles(spark, Sf).collect()
      .map(r => r.getAs[String]("n_name") -> r).toMap
    val lags = graft.util.Tables.t(spark, Sf, "lineitem")
      .join(graft.util.Tables.t(spark, Sf, "orders"),
            col("l_orderkey") === col("o_orderkey"))
      .join(graft.util.Tables.t(spark, Sf, "supplier"),
            col("l_suppkey") === col("s_suppkey"))
      .join(graft.util.Tables.t(spark, Sf, "nation"),
            col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
              datediff(col("l_shipdate").cast("date"),
                       col("o_orderdate").cast("date")).cast("long").as("lag"))
      .collect().map(r => (r.getAs[String]("n_name"), r.getAs[Long]("lag")))
    lags.groupBy(_._1).foreach { case (nn, v) =>
      val xs = v.map(_._2.toDouble).sorted
      val r = out(nn)
      assert(r.getAs[Long]("n_lines") === xs.length.toLong)
      assert(math.abs(r.getAs[Double]("mean_days") - xs.sum / xs.length) < 1e-3)
      assert(r.getAs[Long]("max_days") === v.map(_._2).max)
      assert(r.getAs[Double]("p50_days") <= r.getAs[Double]("p90_days"))
      assert(r.getAs[Double]("p90_days") <= r.getAs[Long]("max_days").toDouble)
    }
  }

  test("basketSizeHist: histogram covers every order exactly once, shares sum to 1") {
    val out = Relational.basketSizeHist(spark, Sf).collect()
    val sizes = graft.util.Tables.t(spark, Sf, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n")).collect()
      .map(_.getAs[Long]("n"))
    val expected = sizes.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out.map(r => r.getAs[Long]("n_lines") -> r.getAs[Long]("n_orders")).toMap
      === expected)
    assert(out.map(_.getAs[Long]("n_orders")).sum === sizes.length.toLong)
    assert(math.abs(out.map(_.getAs[Double]("share")).sum - 1.0) < 1e-2)
  }

  test("dedupThresholdCurve: monotone non-increasing in the threshold, consistent with exact pairs") {
    val out = Text.dedupThresholdCurve(spark, Sf, Seq(50, 60, 70, 80, 90)).collect()
      .sortBy(_.getAs[Int]("threshold_pct"))
    // monotone: a higher bar can only shrink the pair set and the doc set
    val np = out.map(_.getAs[Long]("n_pairs"))
    np.sliding(2).foreach { case Array(a, b) => assert(b <= a); case _ => }
    val nd = out.map(_.getAs[Long]("n_droppable"))
    nd.sliding(2).foreach { case Array(a, b) => assert(b <= a); case _ => }
    out.foreach(r => assert(r.getAs[Long]("n_droppable") <= r.getAs[Long]("n_pairs")))
    // exact-pair fold at one threshold (80%): brute-force set Jaccard
    val docs = graft.util.Tables.t(spark, Sf, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
                 r.getAs[Long]("n_chars") / 200,
                 r.getAs[String]("text").split(" ").filter(_.nonEmpty)
                   .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet))
    val byBlock = docs.groupBy(d => (d._2, d._3))
    val expected80 = byBlock.values.flatMap { ds =>
      for {
        i <- ds.indices; j <- i + 1 until ds.length
        (a, b) = if (ds(i)._1 < ds(j)._1) (ds(i), ds(j)) else (ds(j), ds(i))
        inter = (a._4 intersect b._4).size
        if inter > 0 && inter * 100 >= 80 * (a._4.size + b._4.size - inter)
      } yield (a._1, b._1)
    }.toSet
    val row80 = out.find(_.getAs[Int]("threshold_pct") == 80)
    assert(row80.map(_.getAs[Long]("n_pairs")).getOrElse(0L) === expected80.size.toLong)
  }
}
