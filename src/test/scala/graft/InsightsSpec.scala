package graft

import org.apache.spark.sql.functions._

/** Invariants for the insight tier (exact values are under the DuckDB
  * oracle via graft.Verify; these pin the semantic properties the hash
  * gate can't see — NTILE balance, skyline dominance, distribution-law
  * identities).
  */
class InsightsSpec extends SparkSpec {

  test("driver smoke: SparkEntry.entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0, "the t1 smoke gate must pass")
  }

  test("ntileGlobal matches Spark's ntile window bucket-for-bucket") {
    val li = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_extendedprice").as("p"), col("l_orderkey"), col("l_linenumber"))
    for (k <- Seq(3, 7, 10)) {
      val ours = operators.Insights.ntileGlobal(
        li, Seq(col("p").asc, col("l_orderkey").asc, col("l_linenumber").asc),
        k, "bucket")
        .select(col("l_orderkey"), col("l_linenumber"), col("bucket"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("p").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      val ref = li.select(col("l_orderkey"), col("l_linenumber"),
                          ntile(k).over(w).as("bucket"))
      assert(ours.except(ref).isEmpty && ref.except(ours).isEmpty,
             s"two-phase NTILE($k) must equal the window NTILE")
    }
  }

  test("assoc rules: lift/confidence/support satisfy their defining identities") {
    val r = SparkEntry.queries("q_assoc_rules")(spark, Sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val s = row.getAs[Double]("support")
      val c = row.getAs[Double]("confidence")
      val l = row.getAs[Double]("lift")
      assert(s > 0 && s <= 1.0); assert(c > 0 && c <= 1.0); assert(l > 0)
      assert(row.getAs[String]("brand_a") < row.getAs[String]("brand_b"),
             "each pair appears once, canonically ordered")
    }
  }

  test("rfm: quintile scores are 1..5 and near-balanced, rfm composes digits") {
    val r = SparkEntry.queries("q_rfm")(spark, Sf).collect()
    val n = r.length
    for (colName <- Seq("r_score", "f_score", "m_score")) {
      val hist = r.groupBy(_.getAs[Int](colName)).view.mapValues(_.size).toMap
      assert(hist.keySet.subsetOf((1 to 5).toSet))
      // NTILE balance: bucket sizes differ by at most 1
      assert(hist.values.max - hist.values.min <= 1, s"$colName unbalanced: $hist")
    }
    r.foreach { row =>
      assert(row.getAs[Int]("rfm") ===
        row.getAs[Int]("r_score") * 100 + row.getAs[Int]("f_score") * 10 +
        row.getAs[Int]("m_score"))
    }
    assert(n > 0)
  }

  test("attribution: conversions sum to total purchases; channels are event types") {
    val r = SparkEntry.queries("q_attribution")(spark, Sf).collect()
    val purchases = graft.util.Tables.t(spark, Sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(r.map(_.getAs[Long]("conversions")).sum === purchases,
           "every purchase is attributed exactly once")
    val valid = Set("click", "view", "signup", "error", "(direct)")
    assert(r.map(_.getAs[String]("channel")).forall(valid.contains),
           "touch channel is a non-purchase event type or (direct)")
  }

  test("pareto front: survivors are mutually non-dominating and dominate the rest") {
    val front = SparkEntry.queries("q_pareto_front")(spark, Sf).collect()
      .map(row => (row.getAs[Double]("price"), row.getAs[Int]("p_size")))
    assert(front.nonEmpty)
    // no frontier point dominates another (strictly better on one axis, no worse on the other)
    for ((p1, s1) <- front; (p2, s2) <- front if (p1, s1) != (p2, s2))
      assert(!(p1 <= p2 && s1 >= s2 && (p1 < p2 || s1 > s2)),
             s"($p1,$s1) dominates frontier member ($p2,$s2)")
    // every non-frontier part is dominated by some frontier part
    val all = graft.util.Tables.t(spark, Sf, "part")
      .select(col("p_retailprice"), col("p_size")).collect()
      .map(row => (row.getDouble(0), row.getInt(1)))
    val frontSet = front.toSet
    all.filterNot(x => frontSet.contains((math.floor(x._1 * 10000 + 0.5) / 10000, x._2)))
      .foreach { case (p, s) =>
        assert(front.exists { case (fp, fs) =>
          fp <= p && fs >= s && (fp < p || fs > s) },
          s"non-frontier part ($p,$s) must be dominated")
      }
  }

  test("equi-depth: 10 buckets, equal depth ±1, contiguous non-overlapping ranges") {
    val r = SparkEntry.queries("q_equi_depth_hist")(spark, Sf).collect()
      .sortBy(_.getAs[Int]("bucket"))
    assert(r.map(_.getAs[Int]("bucket")).toSeq === (1 to 10))
    val ns = r.map(_.getAs[Long]("n"))
    assert(ns.max - ns.min <= 1, s"equi-depth violated: ${ns.toSeq}")
    r.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"),
             "bucket value ranges must not overlap")
    case _ => ()
    }
  }

  test("stratified sample: k rows per stratum, ranks contiguous, deterministic") {
    val r1 = SparkEntry.queries("q_stratified_sample")(spark, Sf).collect()
    val r2 = SparkEntry.queries("q_stratified_sample")(spark, Sf).collect()
    assert(r1.map(_.toSeq).toSeq === r2.map(_.toSeq).toSeq, "sample must be reproducible")
    r1.groupBy(_.getAs[String]("c_mktsegment")).foreach { case (_, g) =>
      assert(g.length <= 20)
      assert(g.map(_.getAs[Int]("rn")).sorted.toSeq === (1 to g.length))
    }
  }

  test("ks statistic: in [0,1], and equals the brute-force ECDF gap") {
    val row = SparkEntry.queries("q_ks_test")(spark, Sf).collect().head
    val d = row.getAs[Double]("ks_d")
    assert(d >= 0.0 && d <= 1.0)
    val cust = graft.util.Tables.t(spark, Sf, "customer")
      .select(col("c_mktsegment"), col("c_acctbal")).collect()
    val a = cust.filter(_.getString(0) == "BUILDING").map(_.getDouble(1)).sorted
    val b = cust.filter(_.getString(0) == "MACHINERY").map(_.getDouble(1)).sorted
    val support = (a ++ b).distinct.sorted
    val brute = support.map { x =>
      math.abs(a.count(_ <= x).toDouble / a.length - b.count(_ <= x).toDouble / b.length)
    }.max
    assert(math.abs(d - brute) < 1e-4, s"ks=$d brute=$brute")
    assert(row.getAs[Long]("n1") === a.length && row.getAs[Long]("n2") === b.length)
  }

  test("gini: in [0,1) for non-negative spend, 0 for a uniform distribution") {
    val r = SparkEntry.queries("q_gini")(spark, Sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val g = row.getAs[Double]("gini")
      assert(g >= -0.0001 && g < 1.0, s"gini out of range: $g")
    }
  }

  test("curriculum: 4 near-equal phases, monotone in quality score") {
    val r = SparkEntry.queries("q_curriculum")(spark, Sf).collect()
    val byPhase = r.groupBy(_.getAs[Int]("phase"))
    assert(byPhase.keySet === Set(1, 2, 3, 4))
    val sizes = byPhase.view.mapValues(_.size).values
    assert(sizes.max - sizes.min <= 1)
    // phases partition the score axis: max score of phase p <= min of p+1
    for (p <- 1 to 3) {
      val hi = byPhase(p).map(_.getAs[Double]("quality_score")).max
      val lo = byPhase(p + 1).map(_.getAs[Double]("quality_score")).min
      assert(hi <= lo, s"phase $p max $hi > phase ${p + 1} min $lo")
    }
  }

  test("right outer join preserves all parts; cross join is the full grid") {
    val ro = SparkEntry.queries("q_join_right_outer")(spark, Sf).collect()
    val nParts = graft.util.Tables.t(spark, Sf, "part").count()
    assert(ro.length === nParts, "one row per part, orphans included")
    val cj = SparkEntry.queries("q_cross_join")(spark, Sf).collect()
    val nR = graft.util.Tables.t(spark, Sf, "region").count()
    val nN = graft.util.Tables.t(spark, Sf, "nation").count()
    assert(cj.length === nR * nN)
    assert(cj.map(_.getAs[Int]("is_member")).sum === nN,
           "each nation belongs to exactly one region")
  }

  test("bm25: top-k ranked desc, scores positive, only query-term docs appear") {
    val r = SparkEntry.queries("q_bm25")(spark, Sf).collect()
    assert(r.nonEmpty && r.length <= 20)
    val scores = r.map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "ranked desc")
    assert(scores.forall(_ > 0.0))
  }

  test("triangles: every emitted triple is oriented a<b<c and mutually connected") {
    val tri = SparkEntry.queries("q_triangles")(spark, Sf).collect()
    tri.foreach { row =>
      val (a, b, c) = (row.getAs[String]("brand_a"), row.getAs[String]("brand_b"),
                       row.getAs[String]("brand_c"))
      assert(a < b && b < c, s"orientation violated: ($a,$b,$c)")
    }
    assert(tri.map(_.toSeq).distinct.length === tri.length, "no duplicate triangles")
  }

  test("sliding distinct: 7-day actives >= daily actives, bounded by total users") {
    val r = SparkEntry.queries("q_sliding_distinct")(spark, Sf).collect()
    assert(r.nonEmpty)
    val ev = graft.util.Tables.events(spark, Sf)
      .select(col("user_id"), to_date(timestamp_micros(col("ts_us"))).as("d"))
      .distinct().collect()
    val totalUsers = ev.map(_.getAs[Long]("user_id")).distinct.length
    val daily = ev.groupBy(_.getAs[java.sql.Date]("d").toString)
      .view.mapValues(_.map(_.getAs[Long]("user_id")).distinct.length).toMap
    r.foreach { row =>
      val d = row.getAs[java.sql.Date]("anchor").toString
      val a7 = row.getAs[Long]("active_7d")
      assert(a7 >= daily(d), s"$d: trailing-window actives below same-day actives")
      assert(a7 <= totalUsers)
    }
  }

  test("hierarchy: pointer jumping equals direct arithmetic root/depth") {
    val r = SparkEntry.queries("q_hierarchy")(spark, Sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val k = row.getAs[Long]("p_partkey")
      // ground truth by repeated division — the structure the operator traverses
      var cur = k; var depth = 0L
      while (cur >= 10) { cur /= 10; depth += 1 }
      assert(row.getAs[Long]("root_key") === cur, s"root of $k")
      assert(row.getAs[Long]("depth") === depth, s"depth of $k")
    }
  }

  test("cusum: curve starts/ends near zero, exactly one peak day flagged set") {
    val r = SparkEntry.queries("q_cusum")(spark, Sf).collect().sortBy(
      _.getAs[java.sql.Date]("d").getTime)
    assert(r.nonEmpty)
    // CUSUM telescopes to zero at the final day: n·total − n·total
    assert(math.abs(r.last.getAs[Double]("cusum")) < 0.01)
    assert(r.map(_.getAs[Int]("is_peak")).sum >= 1)
    val peakDev = r.filter(_.getAs[Int]("is_peak") == 1).map(x => math.abs(x.getAs[Double]("cusum"))).head
    assert(r.forall(x => math.abs(x.getAs[Double]("cusum")) <= peakDev + 1e-9))
  }

  test("moments: mean matches direct average; kurtosis ~3 for near-uniform tails") {
    val r = SparkEntry.queries("q_moments")(spark, Sf).collect()
    assert(r.nonEmpty)
    val bals = graft.util.Tables.t(spark, Sf, "customer")
      .select(col("c_mktsegment"), col("c_acctbal")).collect()
      .groupBy(_.getString(0))
    r.foreach { row =>
      val seg = row.getAs[String]("c_mktsegment")
      val xs = bals(seg).map(_.getDouble(1))
      assert(math.abs(row.getAs[Double]("mean") - xs.sum / xs.length) < 0.01,
             s"mean mismatch for $seg")
      assert(row.getAs[Long]("n") === xs.length)
      // any real spread ⇒ both shape stats defined
      assert(!row.isNullAt(row.fieldIndex("skewness")))
      assert(row.getAs[Double]("kurtosis") > 1.0)
    }
  }

  test("typed sessionization equals the window gaps-and-islands formulation") {
    val typed = SparkEntry.queries("q_sessionize_typed")(spark, Sf)
    val window = SparkEntry.queries("q_session_gaps")(spark, Sf)
    assert(typed.except(window).isEmpty && window.except(typed).isEmpty)
  }

  test("relational division: qualifiers bought every divisor brand, non-qualifiers missing one") {
    val r = SparkEntry.queries("q_division")(spark, Sf).collect()
    val nBrands = graft.util.Tables.t(spark, Sf, "part")
      .filter(col("p_brand").startsWith("Brand#1"))
      .select(col("p_brand")).distinct().count()
    assert(r.forall(_.getAs[Long]("n_bought") === nBrands))
  }

  test("NOT IN with subquery NULLs returns zero rows while NOT EXISTS does not") {
    val row = SparkEntry.queries("q_not_in_nulls")(spark, Sf).collect().head
    assert(row.getAs[Long]("n_not_in") === 0L,
           "a NULL in the NOT IN subquery must poison every comparison")
    assert(row.getAs[Long]("n_not_exists") > 0L)
  }

  test("agg-of-agg: per-segment CLV average sits inside [min,max], counts partition customers") {
    val r = SparkEntry.queries("q_agg_of_agg")(spark, Sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (lo, avg, hi) = (row.getAs[Double]("min_clv"), row.getAs[Double]("avg_clv"),
                           row.getAs[Double]("max_clv"))
      assert(lo <= avg && avg <= hi)
    }
    val totalCustomers = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(r.map(_.getAs[Long]("n_customers")).sum === totalCustomers)
  }

  test("oov rate: in [0,1], hits never exceed tokens, covers every doc") {
    val r = SparkEntry.queries("q_oov_rate")(spark, Sf).collect()
    val nDocs = graft.util.Tables.t(spark, Sf, "documents").count()
    assert(r.length === nDocs)
    r.foreach { row =>
      val (nt, hit) = (row.getAs[Long]("n_tokens"), row.getAs[Long]("n_in_vocab"))
      assert(hit <= nt && nt > 0)
      val rate = row.getAs[Double]("oov_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("embed quantize: checksums match a driver-side requantization") {
    val r = SparkEntry.queries("q_embed_quantize")(spark, Sf).collect()
      .map(x => x.getAs[Long]("vec_id") -> x).toMap
    val vecs = graft.util.Tables.t(spark, Sf, "embeddings").collect()
    assert(r.size === vecs.length)
    vecs.take(50).foreach { row =>
      val id = row.getAs[Long]("vec_id")
      val xs = row.getSeq[Float](row.fieldIndex("embedding")).map(_.toDouble)
      val scale = xs.map(math.abs).max
      val q = xs.map(x => math.floor(x / scale * 127.0 + 0.5).toLong)
      assert(r(id).getAs[Long]("checksum") === q.sum, s"vec $id checksum")
      assert(r(id).getAs[Long]("nnz") === q.count(_ != 0L), s"vec $id nnz")
      assert(q.forall(v => v >= -127 && v <= 128), "int8 range")
    }
  }

  test("except all: surplus equals per-priority count difference clamped at zero") {
    val r = SparkEntry.queries("q_except_all")(spark, Sf).collect()
      .map(x => x.getAs[String]("o_orderpriority") -> x.getAs[Long]("surplus")).toMap
    val o = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_orderstatus"), col("o_orderpriority")).collect()
    val f = o.filter(_.getString(0) == "F").groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val p = o.filter(_.getString(0) == "O").groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val expect = f.map { case (k, nf) => k -> (nf - p.getOrElse(k, 0)).toLong }
      .filter(_._2 > 0)
    assert(r === expect)
  }

  test("referential integrity: synthetic star schema has no orphans or dup PKs") {
    val r = SparkEntry.queries("q_ref_integrity")(spark, Sf).collect()
    assert(r.length === 6)
    r.foreach { row =>
      assert(row.getAs[Long]("n_orphans") === 0L, row.getAs[String]("fk_edge"))
      assert(row.getAs[Long]("n_dup_pk") === 0L, row.getAs[String]("fk_edge"))
    }
  }

  test("mult means: harmonic <= geometric <= arithmetic (AM-GM-HM inequality)") {
    val r = SparkEntry.queries("q_mult_means")(spark, Sf).collect()
    val am = graft.util.Tables.t(spark, Sf, "orders")
      .join(graft.util.Tables.t(spark, Sf, "customer"),
            col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(avg(col("o_totalprice")).as("a")).collect()
      .map(x => x.getAs[String]("c_mktsegment") -> x.getAs[Double]("a")).toMap
    assert(r.nonEmpty)
    r.foreach { row =>
      val seg = row.getAs[String]("c_mktsegment")
      val (g, h) = (row.getAs[Double]("geo_mean"), row.getAs[Double]("harmonic_mean"))
      assert(h <= g + 1e-9 && g <= am(seg) + 1e-6, s"$seg: H=$h G=$g AM=${am(seg)}")
    }
  }

  test("iqr outliers: every flagged row is outside its segment fence, fences ordered") {
    val r = SparkEntry.queries("q_outlier_iqr")(spark, Sf).collect()
    r.foreach { row =>
      val (x, lo, hi) = (row.getAs[Double]("c_acctbal"),
                         row.getAs[Double]("fence_lo"), row.getAs[Double]("fence_hi"))
      assert(lo < hi)
      assert(x < lo || x > hi)
      assert(row.getAs[String]("side") === (if (x < lo) "low" else "high"))
    }
  }

  test("count-min estimates are one-sided: est >= exact, over-error within εN") {
    val r = SparkEntry.queries("q_cms_heavyhitters")(spark, Sf).collect()
    assert(r.nonEmpty)
    val totalTokens = graft.util.Tables.t(spark, Sf, "documents")
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "").count()
    val epsN = math.ceil(totalTokens * (math.E / 1024)).toLong // ε = e/width
    r.foreach { row =>
      val (exact, est) = (row.getAs[Long]("exact_n"), row.getAs[Long]("cms_est"))
      assert(est >= exact, s"${row.getString(0)}: CMS must never under-estimate")
      assert(est - exact <= epsN,
             s"${row.getString(0)}: over-error ${est - exact} beyond εN=$epsN")
    }
  }

  test("in-plan xxh64_seed is bit-identical to the jpountz hash the CMS aggregator uses") {
    // cmsHeavyHitters' lazy point query stands on this equality: the
    // Catalyst XxHash64(seed=d) addressing the sketch IN-PLAN must land on
    // the same slots the jpountz-hashing aggregator incremented
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val words = Seq("join", "hash", "scan", "the", "über", "", "a b c")
    val df = words.toDF("w")
    val xx = net.jpountz.xxhash.XXHashFactory.fastestInstance().hash64()
    for (seed <- 0L to 3L) {
      val got = df.select(call_function("xxh64_seed", col("w").cast("binary"), lit(seed)).as("h"))
        .collect().map(_.getLong(0)).toSeq
      val want = words.map { w => val b = w.getBytes("UTF-8"); xx.hash(b, 0, b.length, seed) }
      assert(got === want, s"seed=$seed")
    }
  }

  test("nth_value/bool aggs: third value null iff <3 events, flags consistent") {
    val r = SparkEntry.queries("q_nth_value_bool")(spark, Sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("n_events")
      assert(row.isNullAt(row.fieldIndex("third_value")) === (n < 3))
      val (allPos, anyErr) = (row.getAs[Int]("all_positive"), row.getAs[Int]("any_error"))
      assert(allPos == 0 || allPos == 1); assert(anyErr == 0 || anyErr == 1)
    }
  }

  test("seqlen percentiles are monotone p50<=p90<=p99<=max; savings account for all docs") {
    val r = SparkEntry.queries("q_seqlen_percentiles")(spark, Sf).collect()
    r.foreach { row =>
      val (a, b, c) = (row.getAs[Double]("p50"), row.getAs[Double]("p90"), row.getAs[Double]("p99"))
      assert(a <= b && b <= c && c <= row.getAs[Long]("max_tokens").toDouble)
    }
    val sv = SparkEntry.queries("q_dedup_savings")(spark, Sf).collect()
    val nDocs = graft.util.Tables.t(spark, Sf, "documents").count()
    val accounted = sv.map(x => x.getAs[Long]("cluster_size") * x.getAs[Long]("n_clusters")).sum
    assert(accounted === nDocs, "every document belongs to exactly one cluster")
    sv.foreach { x =>
      assert(x.getAs[Long]("docs_removed") ===
        (x.getAs[Long]("cluster_size") - 1) * x.getAs[Long]("n_clusters"))
    }
  }

  test("first-touch conversions total equals last-touch total (same purchases)") {
    val ft = SparkEntry.queries("q_first_touch")(spark, Sf).collect()
    val lt = SparkEntry.queries("q_attribution")(spark, Sf).collect()
    assert(ft.map(_.getAs[Long]("conversions")).sum ===
           lt.map(_.getAs[Long]("conversions")).sum)
  }

  test("incremental join maintenance equals the monolithic join rollup") {
    val incr = SparkEntry.queries("q_incr_join_merge")(spark, Sf)
    val full = graft.util.Tables.t(spark, Sf, "orders")
      .join(graft.util.Tables.t(spark, Sf, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_items"))
    val got = incr.select(col("yr"), col("mo"), col("n_items"))
    assert(got.except(full).isEmpty && full.except(got).isEmpty)
  }

  test("decile lift: shares sum to 1, cum_pct monotone, top decile carries most") {
    val r = SparkEntry.queries("q_decile_lift")(spark, Sf).collect().sortBy(_.getAs[Int]("decile"))
    assert(r.map(_.getAs[Int]("decile")).toSeq === (1 to 10))
    assert(math.abs(r.map(_.getAs[Double]("pct_of_total")).sum - 1.0) < 0.001)
    val cums = r.map(_.getAs[Double]("cum_pct"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(math.abs(cums.last - 1.0) < 0.001)
    assert(r.head.getAs[Double]("pct_of_total") >= r.last.getAs[Double]("pct_of_total"))
  }

  test("abc classification: classes ordered by cumulative share, all parts covered") {
    val r = SparkEntry.queries("q_abc_class")(spark, Sf).collect()
    val nParts = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_partkey")).distinct().count()
    assert(r.length === nParts)
    r.foreach { row =>
      val (share, cls) = (row.getAs[Double]("cum_share"), row.getAs[String]("abc_class"))
      if (share <= 0.79) assert(cls === "A", s"share=$share")
      if (share > 0.96) assert(cls !== "A")
    }
    assert(r.map(_.getAs[String]("abc_class")).toSet.subsetOf(Set("A", "B", "C")))
  }

  test("explode_outer emits exactly one NULL row per match-less order") {
    val r = SparkEntry.queries("q_explode_outer")(spark, Sf).collect()
    val orders = graft.util.Tables.t(spark, Sf, "orders").count()
    val matchless = r.filter(_.isNullAt(1)).map(_.getLong(0)).toSet
    val matched = r.filterNot(_.isNullAt(1)).map(_.getLong(0)).toSet
    assert(matchless.intersect(matched).isEmpty, "an order is matched XOR null-extended")
    assert(matchless.size + matched.size === orders, "every order survives")
  }

  test("quantized IVF: recall vs exact brute-force top-k stays high, rerank exactness") {
    val approx = SparkEntry.queries("q_ann_ivf_quantized")(spark, Sf).collect()
      .map(_.getAs[Long]("vec_id"))
    val exact = SparkEntry.queries("q_embed_cosine_topk")(spark, Sf).collect()
      .map(_.getAs[Long]("vec_id"))
    assert(approx.length === exact.length)
    val recall = approx.toSet.intersect(exact.toSet).size.toDouble / exact.length
    assert(recall >= 0.5, s"quantized-IVF recall collapsed: $recall")
    // whatever survives the shortlist is scored EXACTLY: any id in both lists
    // must carry the same full-precision similarity
    val exactSim = SparkEntry.queries("q_embed_cosine_topk")(spark, Sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim")).toMap
    SparkEntry.queries("q_ann_ivf_quantized")(spark, Sf).collect().foreach { r =>
      val id = r.getAs[Long]("vec_id")
      exactSim.get(id).foreach(s => assert(r.getAs[Double]("cos_sim") === s))
    }
  }

  test("chi2: expected cell counts sum to N; contributions are non-negative") {
    val r = SparkEntry.queries("q_chi2")(spark, Sf).collect()
    val n = graft.util.Tables.t(spark, Sf, "orders").count()
    val expSum = r.map(_.getAs[Double]("expected")).sum
    assert(math.abs(expSum - n) < 0.01, s"sum(expected)=$expSum != N=$n")
    assert(r.forall(_.getAs[Double]("contrib") >= 0.0))
    val totals = r.map(_.getAs[Double]("chi2_total")).distinct
    assert(totals.length === 1, "grand total must be constant across cells")
    assert(math.abs(r.map(_.getAs[Double]("contrib")).sum - totals.head) < 0.01)
  }
}
