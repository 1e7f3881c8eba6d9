package graft

import org.apache.spark.sql.functions._
import graft.operators.{Insights, Text, Warehouse}

/** Round-8c additions: the Kimball fact-grain completions (SCD3, periodic
  * snapshot, accumulating snapshot), the robust-stat pair (Welch's t,
  * Theil–Sen), Adamic–Adar link prediction, and the corpus-distribution
  * diagnostics (Jensen–Shannon source drift, Zipf slope). Each test is a
  * differential against a sequential driver fold on the collected
  * (sf0.001-small) inputs or a structural invariant the DuckDB oracle
  * cannot express.
  */
class Round8cOpsSpec extends SparkSpec {

  test("scd3CurrentPrior: matches a per-user sequential fold of the signup stream") {
    val out = Warehouse.scd3CurrentPrior(spark, Sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (Option(r.getAs[java.lang.Long]("cur_cents")).map(_.toLong),
         Option(r.getAs[java.lang.Long]("prior_cents")).map(_.toLong),
         r.getAs[Long]("changed_at_us"), r.getAs[Long]("n_versions"))).toMap
    val ev = graft.util.Tables.events(spark, Sf)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id"), col("ts_us"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
                 r.getAs[Long]("ts_us"), r.getAs[Double]("value")))
    val byUser = ev.groupBy(_._1)
    assert(out.keySet === byUser.keySet)
    byUser.foreach { case (u, rows) =>
      val sorted = rows.sortBy(r => (-r._3, -r._2)) // ts desc, event_id desc
      def cents(v: Double): Long = math.floor(v * 100.0 + 0.5).toLong
      val (cur, prior, at, n) = out(u)
      assert(cur === Some(cents(sorted.head._4)), s"user $u current")
      assert(prior === sorted.lift(1).map(r => cents(r._4)), s"user $u prior")
      assert(at === sorted.head._3, s"user $u changed_at")
      assert(n === rows.size.toLong, s"user $u n_versions")
    }
  }

  test("periodicSnapshot: dense supplier x month grid whose balance is the running qty sum") {
    val out = Warehouse.periodicSnapshot(spark, Sf).collect()
    val nSup = graft.util.Tables.t(spark, Sf, "supplier").count()
    val months = out.map(_.getAs[java.sql.Date]("m")).distinct.length
    assert(out.length.toLong === nSup * months, "grid must be dense: |suppliers| x |months|")
    // per-supplier: balance == prefix sum of qty_shipped, ending at the total
    out.groupBy(_.getAs[Long]("s_suppkey")).foreach { case (sk, rs) =>
      val seq = rs.sortBy(_.getAs[java.sql.Date]("m").getTime)
      var run = BigDecimal(0)
      seq.foreach { r =>
        run += BigDecimal(r.getAs[Double]("qty_shipped"))
        assert(math.abs(r.getAs[Double]("balance") - run.toDouble) < 1e-6,
          s"supplier $sk balance drifts at ${r.getAs[java.sql.Date]("m")}")
      }
    }
    // months with zero movement still snapshot (the dense-calendar contract)
    assert(out.exists(_.getAs[Double]("qty_shipped") == 0.0))
  }

  test("accumulatingSnapshot: milestones match a per-order fold and lags are exact day diffs") {
    val out = Warehouse.accumulatingSnapshot(spark, Sf).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r).toMap
    val li = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("d"))
      .collect().map(r => (r.getAs[Long]("l_orderkey"), r.getAs[java.sql.Date]("d")))
      .groupBy(_._1)
    assert(out.keySet === li.keySet)
    li.foreach { case (ok, rs) =>
      val ds = rs.map(_._2.toLocalDate)
      val r = out(ok)
      assert(r.getAs[java.sql.Date]("first_ship").toLocalDate === ds.min)
      assert(r.getAs[java.sql.Date]("last_ship").toLocalDate === ds.max)
      assert(r.getAs[Long]("n_lines") === rs.size.toLong)
      assert(r.getAs[Long]("ship_span_days") ===
        java.time.temporal.ChronoUnit.DAYS.between(ds.min, ds.max))
      assert(r.getAs[Long]("days_to_first_ship") ===
        java.time.temporal.ChronoUnit.DAYS.between(
          r.getAs[java.sql.Date]("placed").toLocalDate, ds.min))
    }
  }

  test("welchT: matches a sequential Welch fold and cohensD's arm means") {
    val row = Insights.welchT(spark, Sf).collect().head
    val vals = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(r => (r.getAs[String]("o_orderpriority") == "1-URGENT",
                 BigDecimal(r.getAs[Double]("o_totalprice")).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
    val a = vals.filter(_._1).map(_._2); val b = vals.filterNot(_._1).map(_._2)
    def meanVar(xs: Array[Double]): (Double, Double) = {
      val n = xs.length.toDouble; val m = xs.sum / n
      (m, xs.map(x => (x - m) * (x - m)).sum / (n - 1.0))
    }
    val (ma, va) = meanVar(a); val (mb, vb) = meanVar(b)
    val sea = va / a.length; val seb = vb / b.length
    val tExp = (ma - mb) / math.sqrt(sea + seb)
    val dfExp = math.pow(sea + seb, 2) /
      (sea * sea / (a.length - 1.0) + seb * seb / (b.length - 1.0))
    assert(row.getAs[Long]("n_a") === a.length.toLong)
    assert(row.getAs[Long]("n_b") === b.length.toLong)
    assert(math.abs(row.getAs[Double]("t") - tExp) < 1e-3)
    assert(math.abs(row.getAs[Double]("df") - dfExp) < 1e-1)
    assert(math.abs(row.getAs[Double]("mean_a") - ma) < 1e-3)
    assert(math.abs(row.getAs[Double]("mean_b") - mb) < 1e-3)
  }

  test("theilSen: exact lower median of the pairwise monthly slopes") {
    val out = Insights.theilSen(spark, Sf).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("sen_slope"))).toMap
    val monthly = graft.util.Tables.t(spark, Sf, "lineitem")
      .groupBy(col("l_returnflag").as("g"),
               (year(col("l_shipdate")) * 12 + month(col("l_shipdate"))).as("mi"))
      .agg(sum(graft.util.Tables.money(col("l_quantity"))).as("v"))
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Int]("mi"),
                 r.getAs[java.math.BigDecimal]("v")))
      .groupBy(_._1)
    monthly.foreach { case (g, rs) =>
      val pts = rs.map(r => (r._2, r._3)).sortBy(_._1)
      val slopes = for {
        i <- pts.indices; j <- pts.indices if pts(i)._1 < pts(j)._1
      } yield ((pts(j)._2.subtract(pts(i)._2)).doubleValue /
                 (pts(j)._1 - pts(i)._1).toDouble, pts(i)._1, pts(j)._1)
      val sorted = slopes.sortBy(s => (s._1, s._2, s._3))
      val k = sorted.length
      val med = sorted((k + 1) / 2 - 1)._1 // lower median, 1-based ceil(k/2)
      assert(out(g)._1 === k.toLong, s"group $g pair count")
      assert(out(g)._2 === math.floor(med * 10000.0 + 0.5) / 10000.0, s"group $g median")
    }
  }

  test("adamicAdar: brute-force neighborhood fold agrees; no predicted pair is an edge") {
    val out = Insights.adamicAdar(spark, Sf, minSup = 2).collect()
    val items = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
    val pairCounts = items.groupBy(_._1).values.flatMap { rs =>
      val ps = rs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size }
    val edges = pairCounts.filter(_._2 >= 2).keySet
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val expected = (for {
      (x, nx) <- nbrs.toSeq; (y, ny) <- nbrs if x < y && !edges((x, y))
      common = nx intersect ny if common.nonEmpty
    } yield {
      val aa = common.toSeq.sorted
        .map(v => BigDecimal(1.0 / math.log(nbrs(v).size.toDouble))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum
      (x, y) -> (common.size.toLong, math.floor(aa.toDouble * 10000.0 + 0.5) / 10000.0)
    }).toMap
    val got = out.map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b")) ->
      (r.getAs[Long]("n_common"), r.getAs[Double]("aa_score"))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, (nc, aa)) =>
      assert(got(k)._1 === nc, s"pair $k n_common")
      assert(math.abs(got(k)._2 - aa) < 2e-4, s"pair $k score: ${got(k)._2} vs $aa")
    }
  }

  test("jsDivergence: bounded by ln 2, zero for a source identical to the blend, fold agrees") {
    val out = Text.jsDivergence(spark, Sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("js_nats"))).toMap
    out.values.foreach { case (_, js) =>
      assert(js >= 0.0 && js <= math.log(2.0) + 1e-9, s"JS out of bounds: $js")
    }
    // sequential fold over driver-side counts
    val toks = graft.util.Tables.t(spark, Sf, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("t")))
    val bySrc = toks.groupBy(_._1).map { case (s, v) =>
      s -> v.groupBy(_._2).map { case (t, w) => t -> w.size.toLong } }
    val global = toks.groupBy(_._2).map { case (t, v) => t -> v.size.toLong }
    val ng = global.values.sum.toDouble
    bySrc.foreach { case (s, cnt) =>
      val ns = cnt.values.sum.toDouble
      var sp = BigDecimal(0); var sq = BigDecimal(0)
      global.foreach { case (t, cg) =>
        val p = cnt.getOrElse(t, 0L) / ns; val q = cg / ng; val m = (p + q) / 2.0
        if (p > 0) sp += BigDecimal(p * math.log(p / m)).setScale(8, BigDecimal.RoundingMode.HALF_UP)
        sq += BigDecimal(q * math.log(q / m)).setScale(8, BigDecimal.RoundingMode.HALF_UP)
      }
      val js = 0.5 * (sp.toDouble + sq.toDouble)
      assert(out(s)._1 === cnt.values.sum)
      assert(math.abs(out(s)._2 - js) < 1e-3, s"source $s: ${out(s)._2} vs $js")
    }
  }

  test("zipfSlope: matches a sequential OLS fold over the exact rank assignment") {
    val row = Text.zipfSlope(spark, Sf).collect().head
    val freq = graft.util.Tables.t(spark, Sf, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").collect().map(_.getAs[String]("t"))
      .groupBy(identity).map { case (t, v) => (t, v.size.toLong) }.toSeq
    val ranked = freq.sortBy { case (t, c) => (-c, t) }.zipWithIndex
      .map { case ((_, c), i) => (i + 1.0, c.toDouble) }
    val n = ranked.length.toDouble
    val xs = ranked.map(r => math.log(r._1)); val ys = ranked.map(r => math.log(r._2))
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(row.getAs[Long]("n_terms") === ranked.length.toLong)
    assert(math.abs(row.getAs[Double]("zipf_slope") - slope) < 1e-3)
    assert(math.abs(row.getAs[Double]("intercept") - (sy - slope * sx) / n) < 1e-3)
    // natural-ish corpus: decreasing rank-frequency curve -> negative slope
    assert(row.getAs[Double]("zipf_slope") < 0.0)
  }
}
