package graft

import org.apache.spark.sql.functions._
import graft.operators.{Insights, Text, Windows}

/** Round-8d additions: synchronous label propagation, classical additive
  * seasonal decomposition, monthly churn, the exact distributed weighted
  * median, and tokenizer fertility. Each test is a differential against a
  * sequential driver fold on the collected (sf0.001-small) inputs or a
  * structural invariant the DuckDB oracle cannot express.
  */
class Round8dOpsSpec extends SparkSpec {

  private def brandEdgesLocal(minSup: Int): Set[(String, String)] = {
    val b = graft.util.Tables.t(spark, Sf, "lineitem")
      .join(graft.util.Tables.t(spark, Sf, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("br")).distinct()
      .collect().map(r => (r.getAs[Long]("ok"), r.getAs[String]("br")))
    b.groupBy(_._1).values.flatMap { rs =>
      val ps = rs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= minSup).keySet.toSet
  }

  test("labelProp: matches a sequential synchronous-LPA fold round for round") {
    val out = Insights.labelProp(spark, Sf, minSup = 5, rounds = 3).collect()
      .map(r => r.getAs[String]("brand") -> r.getAs[String]("community")).toMap
    val edges = brandEdgesLocal(5)
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var labels: Map[String, String] = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      labels = nbrs.map { case (v, ns) =>
        val counts = ns.groupBy(labels).map { case (l, xs) => l -> xs.size }
        val mc = counts.values.max
        v -> counts.filter(_._2 == mc).keys.min
      }
    }
    assert(out === labels)
    // communities actually merged something (the op is not the identity)
    assert(out.values.toSet.size < out.size)
  }

  test("seasonalDecompose: components sum back to the series; trend null exactly at the edges") {
    val out = Insights.seasonalDecompose(spark, Sf).collect()
      .sortBy(_.getAs[java.sql.Date]("m").getTime)
    val n = out.length
    out.zipWithIndex.foreach { case (r, i) =>
      val trend = Option(r.getAs[java.lang.Double]("trend"))
      // centered-12 MA defined iff both off-by-one 12-windows are full
      assert(trend.isDefined === (i >= 6 && i <= n - 7),
        s"trend definedness wrong at index $i")
      if (trend.isDefined) {
        val sum = trend.get + r.getAs[Double]("seasonal") + r.getAs[Double]("resid")
        assert(math.abs(sum - r.getAs[Double]("revenue")) < 2e-3,
          s"components don't sum at ${r.getAs[java.sql.Date]("m")}")
      }
    }
    // the seasonal index repeats with a 12-month period
    val byMoy = out.filter(_.getAs[java.lang.Double]("seasonal") != null)
      .groupBy(_.getAs[java.sql.Date]("m").toLocalDate.getMonthValue)
    byMoy.values.foreach { rs =>
      assert(rs.map(_.getAs[Double]("seasonal")).distinct.length === 1)
    }
    // indices are centered: they sum to ~0 over one period
    val oneEach = byMoy.values.map(_.head.getAs[Double]("seasonal")).sum
    assert(math.abs(oneEach) < 1e-2)
  }

  test("churnMonthly: matches a per-month set fold; last month excluded") {
    val out = Windows.churnMonthly(spark, Sf).collect()
      .map(r => r.getAs[java.sql.Date]("m").toLocalDate ->
        (r.getAs[Long]("active"), r.getAs[Long]("churned"))).toMap
    val cm = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_custkey").as("ck"),
              date_trunc("month", col("o_orderdate")).cast("date").as("m"))
      .distinct().collect()
      .map(r => (r.getAs[java.sql.Date]("m").toLocalDate, r.getAs[Long]("ck")))
    val byM = cm.groupBy(_._1).map { case (m, v) => m -> v.map(_._2).toSet }
    val maxM = byM.keys.max
    assert(!out.contains(maxM), "last month must be excluded")
    assert(out.keySet === byM.keySet - maxM)
    out.foreach { case (m, (active, churned)) =>
      val cur = byM(m); val nxt = byM.getOrElse(m.plusMonths(1), Set.empty[Long])
      assert(active === cur.size.toLong, s"$m active")
      assert(churned === (cur -- nxt).size.toLong, s"$m churned")
    }
  }

  test("weightedMedian: exact weight-mass selection vs a sequential fold") {
    val out = Insights.weightedMedian(spark, Sf).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("total_weight"), r.getAs[Double]("weighted_median"))).toMap
    val li = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .collect()
      .map(r => (r.getAs[String]("l_returnflag"),
                 math.floor(r.getAs[Double]("l_extendedprice") * 100.0 + 0.5).toLong,
                 math.floor(r.getAs[Double]("l_quantity") * 100.0 + 0.5).toLong))
    li.groupBy(_._1).foreach { case (g, rs) =>
      val byV = rs.groupBy(_._2).map { case (v, xs) => v -> xs.map(_._3).sum }
        .toSeq.sortBy(_._1)
      val tw = byV.map(_._2).sum
      var cum = 0L
      val med = byV.collectFirst {
        case (v, w) if { cum += w; 2 * cum >= tw } => v
      }.get
      assert(out(g)._1 === tw, s"group $g total weight")
      assert(out(g)._2 ===
        math.floor((med.toDouble / 100.0) * 10000.0 + 0.5) / 10000.0,
        s"group $g median")
      // selection property: strictly below the median sits < half the mass
      val below = byV.takeWhile(_._1 < med).map(_._2).sum
      assert(2 * below < tw)
    }
  }

  test("tokenizerFertility: matches a per-lang fold of byte and token counts") {
    val out = Text.tokenizerFertility(spark, Sf).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val docs = graft.util.Tables.t(spark, Sf, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("text")))
    val re = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]".r
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val bytes = ds.map(_._2.getBytes("UTF-8").length.toLong).sum
      val ws = ds.map(d => d._2.split(" ", -1).length.toLong).sum
      val bpe = ds.map(d => re.findAllIn(d._2).size.toLong).sum
      val r = out(lang)
      assert(r.getAs[Long]("n_docs") === ds.length.toLong)
      assert(r.getAs[Long]("total_bytes") === bytes, s"$lang bytes")
      assert(r.getAs[Long]("ws_tokens") === ws, s"$lang ws")
      assert(r.getAs[Long]("bpe_tokens") === bpe, s"$lang bpe")
      assert(math.abs(r.getAs[Double]("fertility") - bpe.toDouble / ws) < 1e-3)
      assert(math.abs(r.getAs[Double]("bytes_per_token") - bytes.toDouble / bpe) < 1e-3)
    }
  }
}
