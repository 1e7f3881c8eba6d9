package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-7 operator batch (exact values are under the
  * DuckDB oracle via graft.Verify; these pin semantic properties the hash
  * gate can't see, each against an independent in-test recomputation).
  */
class Round7OpsSpec extends SparkSpec {

  test("kcore: matches a sequential peel fold over the collected graph") {
    val got = SparkEntry.queries("q_kcore")(spark, Sf).collect()
      .map(r => r.getAs[Long]("part_id") -> r.getAs[Long]("deg")).toMap
    // independent sequential recompute from the raw tables
    val items = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
    val byOrder = items.groupBy(_._1).values.map(_.map(_._2).toSeq)
    var edges: Set[(Long, Long)] = byOrder.flatMap { ps =>
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSet
    val degs0 = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val k = degs0.values.sum * 3 / (degs0.size * 4)
    for (_ <- 1 to graft.operators.Insights.KcoreRounds) {
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= k).keySet
      edges = edges.filter { case (a, b) => keep(a) && keep(b) }
    }
    val expect = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(got === expect)
    assert(got.nonEmpty && got.size < degs0.size, "peeling must remove something")
  }

  test("incremental minhash: batch membership, flag/match consistency") {
    val r = SparkEntry.queries("q_incr_dedup_minhash")(spark, Sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val id = row.getAs[Long]("new_id")
      assert(id % 10 === 0L, "only batch docs appear")
      val dup = row.getAs[Boolean]("is_dup")
      val nb = row.getAs[Long]("n_hit_bands")
      assert(dup === (nb > 0L))
      if (dup) {
        val m = row.getAs[Long]("first_match")
        assert(m % 10 !== 0L, "match partner must come from the corpus side")
        val est = row.getAs[Double]("first_est")
        assert(est >= 0.0 && est <= 1.0)
        assert(nb >= 1L && nb <= graft.operators.Dedup.Bands.toLong)
      } else {
        assert(row.isNullAt(row.fieldIndex("first_match")))
        assert(row.isNullAt(row.fieldIndex("first_est")))
      }
    }
  }

  test("lsh recall: counts are consistent and the near-identical twins are found") {
    val r = SparkEntry.queries("q_lsh_recall")(spark, Sf).collect()
    assert(r.length === 1)
    val row = r.head
    val nTruth = row.getAs[Long]("n_truth")
    val nCand = row.getAs[Long]("n_cand")
    val nHit = row.getAs[Long]("n_hit")
    assert(nTruth > 0L, "the synthetic corpus plants J≈0.99 twins")
    assert(nHit <= nTruth && nHit <= nCand)
    val recall = row.getAs[Double]("recall")
    assert(recall === math.floor(nHit.toDouble / nTruth * 10000.0 + 0.5) / 10000.0)
    // 8 bands × 4 rows catch a J=0.99 pair w.p. 1-(1-0.99⁴)⁸ ≈ 1-10⁻¹¹;
    // truth at τ=½ is dominated by the planted twins, so measured recall
    // must sit well above the τ=½ band floor of 0.4
    assert(recall >= 0.5, s"recall $recall implausibly low")
  }

  test("lsh recall: the hot-bucket cap's losses are measured, not hidden") {
    import spark.implicits._
    // 200 identical docs collapse into one band bucket per band (>> cap 64),
    // so the capped generator emits ONLY the anchor star — 199 of the
    // 200·199/2 true pairs. The recall arithmetic must report that honestly.
    val clones = (0L until 200L).map(i => (i, "the quick brown fox jumps over the lazy dog again and again"))
    val distinct = (1000L until 1050L).map(i => (i, s"unique document number $i with its own words entirely"))
    val docs = (clones ++ distinct).toDF("doc_id", "text")
    val cand = graft.operators.Dedup.wordMinhashCandidates(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val clonePairs = cand.filter(_._1 < 200L)
    assert(clonePairs === (1L until 200L).map(b => (0L, b)).toSet,
      "a >cap bucket must emit exactly the min-id anchor star")
    val nTruth = 200L * 199L / 2
    val recall = clonePairs.size.toDouble / nTruth
    assert(recall < 0.02, s"capped recall over a mass-duplicate corpus is ~1%, got $recall")
    // downstream clustering still recovers the FULL clone cluster from the star
    val cc = graft.operators.Dedup.connectedComponents(
      graft.operators.Dedup.wordMinhashCandidates(docs), "doc_a", "doc_b")
    val labels = cc.collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert((0L until 200L).forall(i => labels.get(i).forall(_ === 0L)),
      "anchor-star pairs keep the duplicate CLUSTER connected")
  }

  test("semantic dedup: flags match a brute-force within-cluster recompute") {
    val got = SparkEntry.queries("q_semantic_dedup")(spark, Sf).collect()
    val thr = 130000000L
    // reproduce the fixed-point quantization and measure within the
    // clusters the query itself assigned (the fit is oracle-gated; this
    // checks the pair scan + keep-lowest-id marking independently)
    val emb = graft.util.Tables.t(spark, Sf, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding"))
          .map(v => math.floor(v.toDouble * 10000.0 + 0.5).toLong + 16384L).toArray)
      .toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val byCluster = got.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.values.foreach { members =>
      val ids = members.map(_.getAs[Long]("vec_id")).sorted
      members.foreach { row =>
        val id = row.getAs[Long]("vec_id")
        val preds = ids.filter(_ < id)
          .map(p => p -> d2(emb(p), emb(id))).filter(_._2 <= thr)
        if (preds.isEmpty) {
          assert(!row.getAs[Boolean]("is_dup"), s"vec $id wrongly flagged")
        } else {
          assert(row.getAs[Boolean]("is_dup"), s"vec $id missed")
          assert(row.getAs[Long]("dup_of") === preds.map(_._1).min)
          assert(row.getAs[Long]("min_d2") === preds.map(_._2).min)
        }
      }
      // the lowest id of every cluster is always kept
      assert(!members.minBy(_.getAs[Long]("vec_id")).getAs[Boolean]("is_dup"))
    }
    assert(got.exists(_.getAs[Boolean]("is_dup")), "threshold must flag something")
  }

  test("multi-probe semantic dedup: dup set strictly contains the single-probe set") {
    val single = SparkEntry.queries("q_semantic_dedup")(spark, Sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    val multi = SparkEntry.queries("q_semantic_dedup_mp")(spark, Sf).collect()
    assert(multi.length === single.size)
    multi.foreach { row =>
      val id = row.getAs[Long]("vec_id")
      val s = single(id)
      // primary cell is the same argmin — cluster ids must agree
      assert(row.getAs[Long]("cluster_id") === s.getAs[Long]("cluster_id"))
      if (s.getAs[Boolean]("is_dup")) {
        // widening the pair set can only keep or improve a flag
        assert(row.getAs[Boolean]("is_dup"), s"vec $id lost its flag under multi-probe")
        assert(row.getAs[Long]("min_d2") <= s.getAs[Long]("min_d2"))
        assert(row.getAs[Long]("dup_of") <= s.getAs[Long]("dup_of"))
      }
    }
    val nSingle = single.values.count(_.getAs[Boolean]("is_dup"))
    val nMulti = multi.count(_.getAs[Boolean]("is_dup"))
    assert(nMulti >= nSingle)
  }

  test("mann-whitney: exact integers match a sequential rank computation") {
    val r = SparkEntry.queries("q_mannwhitney")(spark, Sf).collect()
    assert(r.length === 1)
    val row = r.head
    val o = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_totalprice"), col("o_orderpriority")).collect()
      .map(x => (math.floor(x.getAs[Double]("o_totalprice") * 100.0 + 0.5).toLong,
                 x.getAs[String]("o_orderpriority") == "1-URGENT"))
    val n = o.length.toLong
    val na = o.count(_._2).toLong
    // tie-averaged doubled ranks from the sorted value histogram
    val hist = o.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.count(_._2).toLong)).toSeq.sortBy(_._1)
    var cumb = 0L; var w2a = 0L; var ties = 0L
    hist.foreach { case (_, (cnt, cnta)) =>
      w2a += cnta * (2 * cumb + cnt + 1)
      ties += cnt * cnt * cnt - cnt
      cumb += cnt
    }
    assert(row.getAs[Long]("n_a") === na)
    assert(row.getAs[Long]("n_b") === n - na)
    assert(row.getAs[Long]("w2_a") === w2a)
    assert(row.getAs[Long]("u2_a") === w2a - na * (na + 1))
    assert(row.getAs[Long]("tie_sum") === ties)
    // z must be finite and reproducible from the gated integers
    val u = (w2a - na * (na + 1)).toDouble / 2.0
    val nb = (n - na).toDouble
    val z = (u - na.toDouble * nb / 2.0) /
      math.sqrt(na.toDouble * nb / 12.0 *
        ((n.toDouble + 1.0) - ties.toDouble / (n.toDouble * (n.toDouble - 1.0))))
    assert(row.getAs[Double]("z") === math.floor(z * 10000.0 + 0.5) / 10000.0)
  }

  test("bridge allocation: matches an exact sequential recompute, conserves order totals") {
    val got = SparkEntry.queries("q_bridge_alloc")(spark, Sf).collect()
      .map(r => r.getAs[Long]("part_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("alloc_cents"))).toMap
    val li = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .collect()
    val otp = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        math.floor(r.getAs[Double]("o_totalprice") * 100.0 + 0.5).toLong).toMap
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    // bridge grain: exact decimal line revenue per (order, part)
    val lr = li.groupBy(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
      .view.mapValues(_.map(r =>
        d2(r.getAs[Double]("l_extendedprice")) *
          (BigDecimal(1) - d2(r.getAs[Double]("l_discount")))).sum).toMap
    val orv = lr.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val expect = lr.toSeq.map { case ((ok, pk), v) =>
      val lrQ = (v * 10000).toLongExact
      val orvQ = (orv(ok) * 10000).toLongExact
      pk -> (otp(ok) * lrQ / orvQ)
    }.groupBy(_._1).view.mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    assert(got === expect)
    // conservation: per-order floors each lose < 1 cent, so the grand total
    // sits within (bridge rows) cents below the order-total grand sum
    val totalAlloc = got.values.map(_._2).sum
    val totalOtp = orv.keys.map(otp).sum
    val nBridge = got.values.map(_._1).sum
    assert(totalAlloc <= totalOtp && totalOtp - totalAlloc < nBridge)
  }

  test("ann join: side contract, threshold, and flag consistency") {
    val r = SparkEntry.queries("q_ann_join")(spark, Sf).collect()
    assert(r.nonEmpty)
    val emb = graft.util.Tables.t(spark, Sf, "embeddings")
      .select(col("vec_id")).collect().map(_.getAs[Long]("vec_id"))
    assert(r.length === emb.count(_ % 2 == 1), "one row per query-side vector")
    r.foreach { row =>
      assert(row.getAs[Long]("vec_id") % 2 === 1L, "query side is odd ids")
      val m = row.getAs[Boolean]("is_match")
      if (m) {
        assert(row.getAs[Long]("match_id") % 2 === 0L, "matches come from the reference side")
        val d = row.getAs[Long]("match_d2")
        assert(d >= 0L && d <= 130000000L)
      } else {
        assert(row.isNullAt(row.fieldIndex("match_id")))
        assert(row.isNullAt(row.fieldIndex("match_d2")))
      }
    }
    assert(r.exists(_.getAs[Boolean]("is_match")), "threshold must match something")
  }

  test("psi drift: terms match a sequential recompute, total is the term sum") {
    val r = SparkEntry.queries("q_psi_drift")(spark, Sf).collect()
    assert(r.length === 10)
    val o = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_totalprice"), year(col("o_orderdate")).as("y")).collect()
      .map(x => (math.floor(x.getAs[Double]("o_totalprice") * 100.0 + 0.5).toLong,
                 x.getAs[Int]("y") <= 1997))
    val mn = o.map(_._1).min; val mx = o.map(_._1).max
    def bin(v: Long) = math.min(9L, (v - mn) * 10 / (mx - mn + 1))
    val base = o.filter(_._2).map(t => bin(t._1))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val curr = o.filterNot(_._2).map(t => bin(t._1))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val na = o.count(_._2).toLong; val nc = o.length - na
    val expTerms = (0L to 9L).map { b =>
      val pp = (base.getOrElse(b, 0L) + 1).toDouble / (na + 10)
      val pq = (curr.getOrElse(b, 0L) + 1).toDouble / (nc + 10)
      b -> math.floor((pp - pq) * math.log(pp / pq) * 1000000.0 + 0.5).toLong
    }.toMap
    r.foreach { row =>
      val b = row.getAs[Long]("bin")
      assert(row.getAs[Long]("c_base") === base.getOrElse(b, 0L))
      assert(row.getAs[Long]("c_curr") === curr.getOrElse(b, 0L))
      assert(row.getAs[Long]("psi_term_fp") === expTerms(b))
      assert(row.getAs[Long]("psi_total_fp") === expTerms.values.sum)
    }
  }

  test("spearman: rho matches a sequential tie-averaged rank recompute") {
    val r = SparkEntry.queries("q_spearman")(spark, Sf).collect()
    assert(r.length === 1)
    val row = r.head
    val joined = graft.util.Tables.t(spark, Sf, "orders")
      .join(graft.util.Tables.t(spark, Sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_totalprice"), col("c_acctbal")).collect()
      .map(x => (math.floor(x.getAs[Double]("o_totalprice") * 100.0 + 0.5).toLong,
                 math.floor(x.getAs[Double]("c_acctbal") * 100.0 + 0.5).toLong))
    def ranks2(vs: Seq[Long]): Map[Long, Long] = {
      val hist = vs.groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
      var cumb = 0L
      hist.map { case (v, cnt) =>
        val r2 = 2 * cumb + cnt + 1; cumb += cnt; v -> r2
      }.toMap
    }
    val rx = ranks2(joined.map(_._1)); val ry = ranks2(joined.map(_._2))
    val pairs = joined.map { case (x, y) => (BigInt(rx(x)), BigInt(ry(y))) }
    val n = BigInt(pairs.length)
    val sa = pairs.map(_._1).sum; val sb = pairs.map(_._2).sum
    val saa = pairs.map(p => p._1 * p._1).sum
    val sbb = pairs.map(p => p._2 * p._2).sum
    val sab = pairs.map(p => p._1 * p._2).sum
    val rho = (n * sab - sa * sb).toDouble /
      math.sqrt((n * saa - sa * sa).toDouble * (n * sbb - sb * sb).toDouble)
    assert(row.getAs[Long]("n_pairs") === pairs.length.toLong)
    assert(row.getAs[Double]("rho") === math.floor(rho * 10000.0 + 0.5) / 10000.0)
    assert(math.abs(row.getAs[Double]("rho")) <= 1.0)
  }

  test("skew report: metrics match a collected recount") {
    val r = SparkEntry.queries("q_skew_report")(spark, Sf).collect()
    assert(r.length === 1)
    val row = r.head
    val cnts = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_partkey")).collect().map(_.getAs[Long]("l_partkey"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nKeys = cnts.size.toLong
    val nRows = cnts.values.sum
    val maxCnt = cnts.values.max
    val top20 = cnts.toSeq.sortBy { case (k, c) => (-c, k) }.take(20).map(_._2).sum
    assert(row.getAs[Long]("n_keys") === nKeys)
    assert(row.getAs[Long]("n_rows") === nRows)
    assert(row.getAs[Long]("max_cnt") === maxCnt)
    assert(row.getAs[Double]("skew_ratio") >= 1.0)
    assert(row.getAs[Double]("top20_share") ===
      math.floor(top20.toDouble / nRows * 10000.0 + 0.5) / 10000.0)
  }
}
