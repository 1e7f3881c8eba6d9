package graft

import org.apache.spark.sql.functions._
import graft.operators.{Insights, Text, Windows}

/** Round-8b additions: corpus n-gram novelty, graph-structure diagnostics
  * (per-node clustering coefficient, log2 degree distribution), time-series
  * statistics (autocorrelation, Mann–Kendall trend), concentration (HHI),
  * rank-biserial effect size, and the time-weighted average. Each test is a
  * differential against either a sequential driver fold on the collected
  * (sf0.001-small) inputs or a structural invariant the DuckDB oracle
  * cannot express (cross-query consistency).
  */
class Round8bOpsSpec extends SparkSpec {

  test("ngramNovelty: novel counts partition the distinct-shingle space, doc 0 is fully novel") {
    val out = Text.ngramNovelty(spark, Sf).collect()
    val byDoc = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_shingles"), r.getAs[Long]("novel"))).toMap
    // the lowest doc_id present can only contain first occurrences
    val first = byDoc.keys.min
    assert(byDoc(first)._1 === byDoc(first)._2)
    // every shingle has exactly one first occurrence: sum(novel) == |distinct shingles|
    val totalDistinct = Text.shingleRows(
      graft.util.Tables.t(spark, Sf, "documents"))
      .select(col("s")).distinct().count()
    assert(byDoc.values.map(_._2).sum === totalDistinct)
    // novelty is a fraction of the doc's shingles
    assert(byDoc.values.forall { case (n, nov) => nov >= 0 && nov <= n })
  }

  test("clusteringCoeff: node triangle counts sum to 3x the triangle census, lcc in [0,1]") {
    val lcc = Insights.clusteringCoeff(spark, Sf, minSup = 5).collect()
    val tri = Insights.triangles(spark, Sf, minSup = 5).count()
    // each triangle contributes one closed wedge at each of its 3 corners
    assert(lcc.map(_.getAs[Long]("n_tri")).sum === 3 * tri)
    lcc.foreach { r =>
      val v = r.getAs[Double]("lcc")
      assert(v >= 0.0 && v <= 1.0, s"lcc out of range for ${r.getAs[String]("brand")}: $v")
      if (r.getAs[Long]("deg") < 2) assert(v === 0.0)
    }
  }

  test("degreeDist: buckets are the exact bit-length bins and node counts cover the graph") {
    val dist = Insights.degreeDist(spark, Sf).collect()
    dist.foreach { r =>
      val b = r.getAs[Int]("bucket")
      val lo = 1L << b; val hi = (1L << (b + 1)) - 1
      assert(r.getAs[Long]("min_deg") >= lo && r.getAs[Long]("max_deg") <= hi,
        s"bucket $b range [${r.getAs[Long]("min_deg")}, ${r.getAs[Long]("max_deg")}] outside [$lo, $hi]")
    }
    // bucket histogram covers every node with >= 1 co-purchase neighbor
    val items = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nNodes = items.as("a")
      .join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey")).distinct().count()
    assert(dist.map(_.getAs[Long]("n_nodes")).sum === nNodes)
  }

  test("autocorr: matches a sequential Pearson fold over the daily series") {
    val out = Insights.autocorr(spark, Sf, maxLag = 3).collect()
      .map(r => r.getAs[Int]("lag") -> (r.getAs[Long]("n_pairs"), r.getAs[Double]("acf"))).toMap
    val daily = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(graft.util.Tables.money(col("o_totalprice"))).as("rev"))
      .orderBy(col("d"))
      .collect().map(_.getAs[java.math.BigDecimal]("rev").doubleValue())
    for (lag <- 1 to 3) {
      val xs = daily.dropRight(lag); val ys = daily.drop(lag)
      val n = xs.length.toDouble
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum; val syy = ys.map(a => a * a).sum
      val r = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      assert(out(lag)._1 === xs.length.toLong)
      assert(math.abs(out(lag)._2 - r) < 1e-3,
        s"lag $lag: got ${out(lag)._2}, sequential $r")
    }
  }

  test("mkTrend: S, var18 and z match the sequential pairwise fold") {
    val out = Insights.mkTrend(spark, Sf).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("n_periods"), r.getAs[Long]("s"), r.getAs[Long]("var18"),
         r.getAs[Double]("z"))).toMap
    val monthly = graft.util.Tables.t(spark, Sf, "lineitem")
      .groupBy(col("l_returnflag").as("g"),
               date_trunc("month", col("l_shipdate")).cast("date").as("m"))
      .agg(sum(graft.util.Tables.money(col("l_quantity"))).as("v"))
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[java.sql.Date]("m").toString,
                 r.getAs[java.math.BigDecimal]("v")))
      .groupBy(_._1)
    monthly.foreach { case (g, rows0) =>
      val series = rows0.sortBy(_._2).map(_._3)
      var s = 0L
      for (i <- series.indices; j <- i + 1 until series.length) {
        val c = series(j).compareTo(series(i))
        s += (if (c > 0) 1 else if (c < 0) -1 else 0)
      }
      val n = series.length.toLong
      val tsum = series.groupBy(identity).values
        .map(g0 => { val t = g0.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val var18 = n * (n - 1) * (2 * n + 5) - tsum
      val z =
        if (s > 0) (s - 1.0) / math.sqrt(var18 / 18.0)
        else if (s < 0) (s + 1.0) / math.sqrt(var18 / 18.0)
        else 0.0
      val (gn, gs, gv, gz) = out(g)
      assert(gn === n); assert(gs === s); assert(gv === var18)
      assert(math.abs(gz - z) < 1e-3)
    }
  }

  test("hhi: matches the sequential share fold and hits 10000/k on equal shares") {
    val out = Insights.hhi(spark, Sf).collect()
      .map(r => r.getAs[String]("n_name") ->
        (r.getAs[Long]("n_suppliers"), r.getAs[Double]("hhi"))).toMap
    val revs = graft.util.Tables.t(spark, Sf, "lineitem")
      .join(graft.util.Tables.t(spark, Sf, "supplier"),
            col("l_suppkey") === col("s_suppkey"))
      .join(graft.util.Tables.t(spark, Sf, "nation"),
            col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("s_suppkey"))
      .agg(sum(graft.util.Tables.money(col("l_extendedprice"))).as("rev"))
      .collect()
      .map(r => (r.getAs[String]("n_name"),
                 r.getAs[java.math.BigDecimal]("rev").doubleValue()))
      .groupBy(_._1)
    revs.foreach { case (nat, rows0) =>
      val xs = rows0.map(_._2)
      val total = xs.sum
      val hhi = 10000.0 * xs.map(x => x * x).sum / (total * total)
      val (k, got) = out(nat)
      assert(k === xs.size.toLong)
      assert(math.abs(got - hhi) < 1e-2, s"$nat: got $got, sequential $hhi")
      // sanity bound: k equal shares give exactly 10000/k, any skew raises it
      assert(got >= 10000.0 / k - 1e-6 && got <= 10000.0 + 1e-6)
    }
  }

  test("rankBiserial: consistent with mannWhitney's exact doubled-U and bounded by 1") {
    val mw = Insights.mannWhitney(spark, Sf).collect().head
    val rb = Insights.rankBiserial(spark, Sf).collect().head
    assert(rb.getAs[Long]("n_a") === mw.getAs[Long]("n_a"))
    assert(rb.getAs[Long]("u2_a") === mw.getAs[Long]("u2_a"))
    val expect = 1.0 - mw.getAs[Long]("u2_a").toDouble /
      (mw.getAs[Long]("n_a").toDouble * mw.getAs[Long]("n_b").toDouble)
    assert(math.abs(rb.getAs[Double]("r_rb") - expect) < 1e-3)
    assert(math.abs(rb.getAs[Double]("r_rb")) <= 1.0)
  }

  test("kendallTau: matches the sequential concordance fold") {
    val out = Insights.kendallTau(spark, Sf).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("s"), r.getAs[Long]("n1"), r.getAs[Long]("n2"),
         r.getAs[Double]("tau_b"))).toMap
    val monthly = graft.util.Tables.t(spark, Sf, "lineitem")
      .groupBy(col("l_returnflag").as("g"),
               date_trunc("month", col("l_shipdate")).cast("date").as("m"))
      .agg(sum(graft.util.Tables.money(col("l_quantity"))).as("x"),
           sum(graft.util.Tables.money(col("l_extendedprice"))).as("y"))
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[java.sql.Date]("m").toString,
                 r.getAs[java.math.BigDecimal]("x"), r.getAs[java.math.BigDecimal]("y")))
      .groupBy(_._1)
    monthly.foreach { case (g, rows0) =>
      val series = rows0.sortBy(_._2).map(r => (r._3, r._4))
      var s = 0L
      for (i <- series.indices; j <- i + 1 until series.length) {
        val cx = series(j)._1.compareTo(series(i)._1).sign
        val cy = series(j)._2.compareTo(series(i)._2).sign
        s += cx * cy
      }
      val n = series.length.toLong
      val n1 = series.groupBy(_._1).values.map(v => v.size.toLong * (v.size - 1) / 2).sum
      val n2 = series.groupBy(_._2).values.map(v => v.size.toLong * (v.size - 1) / 2).sum
      val n0 = n * (n - 1) / 2
      val tau = s.toDouble / math.sqrt((n0 - n1).toDouble * (n0 - n2).toDouble)
      val (gs, gn1, gn2, gt) = out(g)
      assert(gs === s); assert(gn1 === n1); assert(gn2 === n2)
      assert(math.abs(gt - tau) < 1e-3, s"$g: got $gt, sequential $tau")
      assert(math.abs(gt) <= 1.0)
    }
  }

  test("cramersV: consistent with chi2Independence's total, bounded by [0,1]") {
    val v = Insights.cramersV(spark, Sf).collect().head
    val chi2FromCells = Insights.chi2Independence(spark, Sf)
      .select(col("chi2_total")).distinct().collect().head.getAs[Double](0)
    // cramersV r4-rounds its own chi2; the per-cell query r4-rounds the
    // same double — identical up to the shared rounding grid
    assert(math.abs(v.getAs[Double]("chi2") - chi2FromCells) < 2e-4)
    val cv = v.getAs[Double]("cramers_v")
    assert(cv >= 0.0 && cv <= 1.0)
    val n = v.getAs[Long]("n")
    val r = v.getAs[Long]("n_rows_dim"); val c = v.getAs[Long]("n_cols_dim")
    val expect = math.sqrt(chi2FromCells / (n.toDouble * math.min(r - 1, c - 1)))
    assert(math.abs(cv - expect) < 1e-3)
  }

  test("anovaF: matches the sequential sums-of-squares fold") {
    val out = Insights.anovaF(spark, Sf).collect().head
    val vals = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity")).collect()
      .map(r => (r.getAs[String](0), math.floor(r.getAs[Double](1) * 100.0 + 0.5) / 100.0))
      .groupBy(_._1)
    val k = vals.size; val n = vals.values.map(_.size).sum
    val grand = vals.values.flatten.map(_._2).sum
    val sqn = vals.values.map { g => val s = g.map(_._2).sum; s * s / g.size }.sum
    val ssq = vals.values.flatten.map(v => v._2 * v._2).sum
    val ssb = sqn - grand * grand / n
    val ssw = ssq - sqn
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(out.getAs[Long]("k") === k.toLong)
    assert(out.getAs[Long]("n") === n.toLong)
    assert(math.abs(out.getAs[Double]("f") - f) < 1e-2,
      s"got ${out.getAs[Double]("f")}, sequential $f")
  }

  test("cohensD: matches the sequential two-arm fold") {
    val out = Insights.cohensD(spark, Sf).collect().head
    val arms = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(r => (r.getAs[String](0) == "1-URGENT",
                 math.floor(r.getAs[Double](1) * 100.0 + 0.5) / 100.0))
      .groupBy(_._1)
    val a = arms(true).map(_._2); val b = arms(false).map(_._2)
    def meanVar(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1))
    }
    val (ma, va) = meanVar(a.toSeq); val (mb, vb) = meanVar(b.toSeq)
    val sp = math.sqrt(((a.size - 1) * va + (b.size - 1) * vb) / (a.size + b.size - 2))
    val d = (ma - mb) / sp
    assert(out.getAs[Long]("n_a") === a.size.toLong)
    assert(math.abs(out.getAs[Double]("mean_diff") - (ma - mb)) < 1e-2)
    assert(math.abs(out.getAs[Double]("cohens_d") - d) < 1e-3,
      s"got ${out.getAs[Double]("cohens_d")}, sequential $d")
  }

  test("gopherRules: flags match a sequential string fold, keep is their conjunction") {
    val out = Text.gopherRules(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = graft.util.Tables.t(spark, Sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    assert(out.size === docs.length)
    docs.foreach { case (id, text) =>
      val words = text.split(" ", -1)
      val mwl = (text.length - (words.length - 1)).toDouble / words.length
      val alpha = words.count(_.exists(_.isLetter))
      val stops = Seq("the", "a", "of", "and", "to", "with").count(words.contains)
      val r = out(id)
      assert(r.getAs[Long]("n_words") === words.length.toLong)
      assert(math.abs(r.getAs[Double]("mean_word_len") - mwl) < 1e-3)
      assert(r.getAs[Long]("n_alpha_words") === alpha.toLong)
      assert(r.getAs[Long]("n_stopwords") === stops.toLong)
      val flags = Seq(
        words.length >= 20 && words.length <= 1000,
        mwl >= 3.0 && mwl <= 10.0,
        alpha * 5 >= words.length * 4,
        stops >= 2)
      assert(r.getAs[Boolean]("r_word_count") === flags(0))
      assert(r.getAs[Boolean]("r_mean_word_len") === flags(1))
      assert(r.getAs[Boolean]("r_alpha_ratio") === flags(2))
      assert(r.getAs[Boolean]("r_stopwords") === flags(3))
      assert(r.getAs[Boolean]("keep") === flags.forall(identity))
    }
  }

  test("heapsLaw: curve is monotone, per-doc novelty agrees, endpoint is the vocabulary size") {
    val curve = Text.heapsLaw(spark, Sf).collect()
    val novelty = Text.ngramNovelty(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("novel")).toMap
    var prev = 0L
    curve.foreach { r =>
      assert(r.getAs[Long]("novel") === novelty(r.getAs[Long]("doc_id")))
      val c = r.getAs[Long]("cum_vocab")
      assert(c === prev + r.getAs[Long]("novel"))
      prev = c
    }
    val vocab = Text.shingleRows(graft.util.Tables.t(spark, Sf, "documents"))
      .select(col("s")).distinct().count()
    assert(prev === vocab)
  }

  test("dupClusterHist: sizes partition the corpus and match the CC assignment") {
    val hist = graft.operators.Dedup.dupClusterHist(spark, Sf).collect()
    val nDocs = graft.util.Tables.t(spark, Sf, "documents").count()
    assert(hist.map(r => r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters")).sum === nDocs)
    // recompute from the assignment directly
    val sizes = graft.operators.Dedup.dedupComponentsEditdist(spark, Sf)
      .collect().groupBy(_.getAs[Long]("component_id")).values
      .map(_.length.toLong).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = hist.map(r => r.getAs[Long]("cluster_size") -> r.getAs[Long]("n_clusters")).toMap
    assert(got === sizes)
  }

  test("assortativity: matches the sequential degree-correlation fold") {
    val out = Insights.assortativity(spark, Sf).collect().head
    val items = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = items.as("a")
      .join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val xs = edges.map(e => deg(e._1)); val ys = edges.map(e => deg(e._2))
    val n = edges.length.toDouble
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum; val syy = ys.map(a => a * a).sum
    val r = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(out.getAs[Long]("n_edges") === edges.length.toLong)
    assert(math.abs(out.getAs[Double]("assortativity") - r) < 1e-3,
      s"got ${out.getAs[Double]("assortativity")}, sequential $r")
  }

  test("burstiness: matches the sequential dispersion fold, B in (-1, 1)") {
    val out = Insights.burstiness(spark, Sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("n_events"),
         r.getAs[Double]("fano"), r.getAs[Double]("burstiness"))).toMap
    val daily = graft.util.Tables.events(spark, Sf)
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .collect().map(r => (r.getAs[String](0), r.getAs[Long](1)))
      .groupBy(_._1).view
      .mapValues(_.groupBy(_._2).values.map(_.size.toDouble).toSeq).toMap
    daily.foreach { case (et, cs) =>
      val n = cs.size.toDouble
      val mean = cs.sum / n
      val variance = cs.map(c => (c - mean) * (c - mean)).sum / (n - 1)
      val sigma = math.sqrt(variance)
      val (gn, ge, gf, gb) = out(et)
      assert(gn === cs.size.toLong)
      assert(ge === cs.map(_.toLong).sum)
      assert(math.abs(gf - variance / mean) < 1e-2)
      assert(math.abs(gb - (sigma - mean) / (sigma + mean)) < 1e-3)
      assert(gb > -1.0 && gb < 1.0)
    }
  }

  test("newVsReturning: day totals balance and new users cover each user once") {
    val out = Windows.newVsReturning(spark, Sf).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("active_users") ===
        r.getAs[Long]("new_users") + r.getAs[Long]("returning_users"))
    }
    // every user is new exactly once
    val nUsers = graft.util.Tables.events(spark, Sf)
      .select(col("user_id")).distinct().count()
    assert(out.map(_.getAs[Long]("new_users")).sum === nUsers)
    // the first day of the window has no returning users
    val first = out.minBy(_.getAs[Long]("day"))
    assert(first.getAs[Long]("returning_users") === 0L)
  }

  test("timeWeightedAvg: matches the sequential interval fold per user") {
    val out = Windows.timeWeightedAvg(spark, Sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_intervals"), r.getAs[Long]("total_us"),
         r.getAs[Double]("twa"))).toMap
    val evs = graft.util.Tables.events(spark, Sf)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"),
                 r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      .groupBy(_._1)
    evs.foreach { case (u, rows0) =>
      val seq0 = rows0.sortBy(r => (r._2, r._3))
      val ivs = seq0.zip(seq0.tail).map { case (a, b) =>
        val vc = math.floor(a._4 * 100.0 + 0.5).toLong
        (vc, b._2 - a._2)
      }
      val totalUs = ivs.map(_._2).sum
      if (ivs.isEmpty || totalUs <= 0) assert(!out.contains(u))
      else {
        val num = ivs.map { case (vc, d) => BigInt(vc) * BigInt(d) }.sum
        val twa = num.toDouble / totalUs.toDouble / 100.0
        val (n, t, got) = out(u)
        assert(n === ivs.length.toLong); assert(t === totalUs)
        assert(math.abs(got - twa) < 1e-3, s"user $u: got $got, sequential $twa")
      }
    }
  }
}
