package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Round-11 tier: the bucketed-candidate production twins of the n²
  * miners (the r10 verdict's last 100 TB scale-killer) and their measured
  * recall vs the exact miners. The twins mine from the gated-IVF
  * multi-probe candidate stream — near probes for max-cosine searches,
  * negation (far) probes for the min-cosine hardest-positive search —
  * so the pair volume is bucket-bounded instead of n².
  */
class Round11OpsSpec extends SparkSpec {

  test("hardNegativesIvf: same contract as the exact miner; mined extremes " +
       "are conservative (subset max <= true max, subset min >= true min)") {
    val ex = rows(Similarity.hardNegatives(spark, Sf))
      .map(r => r.head.asInstanceOf[Long] ->
        (r(4).asInstanceOf[Double], r(6).asInstanceOf[Double])).toMap
    val iv = Similarity.hardNegativesIvf(spark, Sf)
    assertNonDegenerate(iv, Seq("hard_neg_id", "hard_neg_cos",
                                "hard_pos_id", "hard_pos_cos"), minRows = 10)
    rows(iv).foreach { r =>
      val (vid, hnc, hpc) = (r.head.asInstanceOf[Long],
        r(4).asInstanceOf[Double], r(6).asInstanceOf[Double])
      val (xhnc, xhpc) = ex(vid)
      // candidate set is a subset of all pairs: its max cos can't beat the
      // true max, its min can't undercut the true min (r4 half-ulp slack)
      assert(hnc <= xhnc + 1e-9, s"anchor $vid: ivf hn cos $hnc > exact $xhnc")
      assert(hpc >= xhpc - 1e-9, s"anchor $vid: ivf hp cos $hpc < exact $xhpc")
    }
  }

  test("hardNegativesRecall: every exact anchor is mined, hard-negative " +
       "recall >= 0.65 and hard-positive recall >= 0.45 on the fixture " +
       "(measured 0.73 / 0.57 at sf0.001), regret bounded") {
    val r = rows(Similarity.hardNegativesRecall(spark, Sf)).head
    val (nAnchors, nMined) = (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long])
    assert(nAnchors >= 25 && nMined === nAnchors,
      s"mined $nMined of $nAnchors anchors")
    val (hnRecall, hpRecall) = (r(6).asInstanceOf[Double], r(7).asInstanceOf[Double])
    assert(hnRecall >= 0.65, s"hard-negative recall $hnRecall < 0.65")
    assert(hpRecall >= 0.45, s"hard-positive recall $hpRecall < 0.45")
    // average per-anchor regret stays under 250 basis points of cosine —
    // misses are near-ties in VALUE even when the id differs
    val (hnReg, hpReg) = (r(4).asInstanceOf[Long], r(5).asInstanceOf[Long])
    assert(hnReg >= 0 && hnReg <= 250 * nAnchors, s"hn regret $hnReg")
    assert(hpReg >= 0 && hpReg <= 250 * nAnchors, s"hp regret $hpReg")
  }

  test("knnLabelNoiseIvf: per-label report over all labels; noise rates in " +
       "[0,1]; candidate stream covers every label's vectors") {
    val ex = rows(Similarity.knnLabelNoise(spark, Sf))
      .map(r => r.head.asInstanceOf[Long] -> r(1).asInstanceOf[Long]).toMap
    val iv = Similarity.knnLabelNoiseIvf(spark, Sf)
    assertNonDegenerate(iv, Seq("n_vectors", "n_flagged"), minRows = 5)
    val got = rows(iv)
    assert(got.map(_.head.asInstanceOf[Long]).toSet === ex.keySet,
      "ivf twin must report the same label set as the exact miner")
    got.foreach { r =>
      val (lbl, n, rate) = (r.head.asInstanceOf[Long],
        r(1).asInstanceOf[Long], r(3).asInstanceOf[Double])
      // every vector has >= 1 candidate (it shares its own cells), so the
      // per-label vector counts match the exact miner's exactly
      assert(n === ex(lbl), s"label $lbl: $n vectors vs exact ${ex(lbl)}")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("knnNoiseRecall: candidate stream is strictly sub-quadratic and " +
       "surfaces >= 55% of the true 5-NN edges (measured 0.60)") {
    val r = rows(Similarity.knnNoiseRecall(spark, Sf)).head
    val (nTruth, nCand, nHit, recall) = (r.head.asInstanceOf[Long],
      r(1).asInstanceOf[Long], r(2).asInstanceOf[Long],
      r(3).asInstanceOf[Double])
    assert(nTruth === 2500L) // 500 anchors x 5 edges
    // scale shape: candidates are a strict subset of the n^2 directed pairs
    assert(nCand < 500L * 499L / 2, s"candidate volume $nCand not bucketed")
    assert(nHit <= nTruth)
    assert(recall >= 0.55, s"edge recall $recall < 0.55")
  }

  test("Patterns.triggerResolve: spike-decay finds only >40% jumps, decay " +
       "offsets are within horizon, and the operator family is symmetric " +
       "with matchVShape") {
    val df = graft.operators.Windows.matchSpikeDecay(spark, Sf, 40, 3)
    assertNonDegenerate(df, Seq("spike_day", "spike_frac"), minRows = 10)
    rows(df).foreach { r =>
      val frac = r(3).asInstanceOf[Double]
      assert(frac > 0.4 - 1e-9, s"row not a 40% spike: $r")
      Option(r(4)).foreach { d =>
        val off = d.asInstanceOf[Long]
        assert(off >= 1L && off <= 3L, s"decay offset $off outside horizon")
      }
    }
  }

  test("Patterns.islands: synthetic run-length check — maximal strict-rise " +
       "runs get distinct island ids, breaks split runs, first rows drop") {
    import spark.implicits._
    val s = Seq((1, 10L), (2, 20L), (3, 30L), (4, 5L), (5, 6L), (6, 6L),
                (7, 9L)).toDF("t", "v")
    val got = rows(graft.operators.Patterns.islands(
        s, Seq(), Seq(col("t").asc), col("v"),
        step = (cur, prev) => cur > prev))
      .map(r => (r.head.asInstanceOf[Int], r(2).asInstanceOf[Long]))
    // rises at t=2,3 (island A), t=5 (B), t=7 (C); t=1 has no prev, t=4/6
    // break. Island ids are the running break count: 0, 0, 1, 2.
    assert(got === Seq((2, 0L), (3, 0L), (5, 1L), (7, 2L)))
  }

  test("cellStats: members sum to the corpus, shares to ~10000 bp, pair " +
       "volumes are exactly n(n-1)/2") {
    val df = graft.operators.Ivf.cellStats(spark, Sf)
    assertNonDegenerate(df, Seq("n_members", "pair_volume"), minRows = 8)
    val r = rows(df)
    assert(r.map(_(1).asInstanceOf[Long]).sum === 500L)
    val shares = r.map(_(2).asInstanceOf[Long]).sum
    assert(shares >= 10000L - r.size && shares <= 10000L, s"share sum $shares")
    r.foreach { row =>
      val (n, pv) = (row(1).asInstanceOf[Long], row(3).asInstanceOf[Long])
      assert(pv === n * (n - 1) / 2)
    }
  }

  test("rrfFusion: scores descend, every score re-derives from its two " +
       "ranks, and both legs contribute to the top-10") {
    val r = rows(graft.operators.Similarity.rrfFusion(spark, Sf))
    assert(r.size === 10)
    val scores = r.map(_(3).asInstanceOf[Double])
    assert(scores === scores.sorted.reverse)
    r.foreach { row =>
      val lex = Option(row(1)).map(_.asInstanceOf[Int])
      val den = Option(row(2)).map(_.asInstanceOf[Int])
      val expect = lex.fold(0.0)(x => 1.0 / (60 + x)) +
                   den.fold(0.0)(x => 1.0 / (60 + x))
      assert(math.abs(row(3).asInstanceOf[Double] -
        math.floor(expect * 10000.0 + 0.5) / 10000.0) < 1e-9)
    }
    assert(r.exists(_(1) != null) && r.exists(_(2) != null))
  }

  test("randomProjection: JL concentration — global ratio near 1, " +
       "extremes bracket it, all %7 pairs measured") {
    val r = rows(graft.operators.Similarity.randomProjection(spark, Sf)).head
    assert(r.head.asInstanceOf[Long] === (72L * 71) / 2)
    val (g, lo, hi) = (r(3).asInstanceOf[Double], r(4).asInstanceOf[Double],
                       r(5).asInstanceOf[Double])
    assert(g > 0.8 && g < 1.2, s"global ratio $g off JL expectation")
    assert(lo < g && g < hi)
  }

  test("emaCrossover: directions strictly alternate and both kinds occur") {
    val r = rows(graft.operators.Windows.emaCrossover(spark, Sf))
    assert(r.size >= 10)
    val dirs = r.map(_(1).asInstanceOf[String])
    dirs.sliding(2).foreach { w =>
      if (w.size == 2) assert(w(0) !== w(1), "consecutive same-direction crossovers")
    }
    assert(dirs.toSet === Set("golden", "death"))
  }

  test("dpGeometric: released = true + noise, noise bounded by the " +
       "truncation and varying across groups") {
    val df = graft.operators.Insights.dpGeometric(spark, Sf)
    assertNonDegenerate(df, Seq("true_count", "noise"), minRows = 5)
    rows(df).foreach { r =>
      val (t, n, rel) = (r(1).asInstanceOf[Long], r(2).asInstanceOf[Long],
                         r(3).asInstanceOf[Long])
      assert(rel === t + n)
      assert(n >= -12L && n <= 12L)
    }
  }

  test("saxSymbols: segments cover the calendar, weighted z-mass is ~0, " +
       "symbols live in the 4-letter alphabet") {
    val df = graft.operators.Insights.saxSymbols(spark, Sf)
    assertNonDegenerate(df, Seq("paa_revenue", "z"), minRows = 16)
    val r = rows(df)
    assert(r.size === 16)
    val wz = r.map(x => x(1).asInstanceOf[Long] * x(3).asInstanceOf[Double]).sum
    assert(math.abs(wz) < 1.0, s"weighted z sum $wz not ~0")
    assert(r.map(_(4).asInstanceOf[String]).forall(Set("a", "b", "c", "d")))
  }

  test("pqCodebook: 4 subspaces x 8 live codes, per-subspace members sum " +
       "to the corpus, mean errors re-derive from the exact sums") {
    val df = graft.operators.Ivf.pqCodebook(spark, Sf)
    assertNonDegenerate(df, Seq("n_members", "sum_err"), minRows = 16)
    val r = rows(df)
    assert(r.map(_.head.asInstanceOf[Long]).toSet === Set(0L, 1L, 2L, 3L))
    (0 to 3).foreach { s =>
      val sub = r.filter(_.head == s.toLong)
      assert(sub.map(_(2).asInstanceOf[Long]).sum === 500L,
        s"subspace $s members")
    }
    r.foreach { row =>
      val (n, se, me) = (row(2).asInstanceOf[Long],
        row(3).asInstanceOf[Double], row(4).asInstanceOf[Double])
      assert(n >= 1)
      assert(math.abs(me - math.floor(se / n * 10000.0 + 0.5) / 10000.0) < 1e-9)
    }
  }

  test("annPq: ADC top-10 ascends, ids distinct, probe excluded, and the " +
       "ADC winner is genuinely near the probe by exact cosine") {
    val r = rows(graft.operators.Ivf.annPq(spark, Sf))
    assert(r.size === 10)
    val ids = r.map(_.head.asInstanceOf[Long])
    assert(ids.distinct.size === 10 && !ids.contains(0L))
    val ds = r.map(_(1).asInstanceOf[Long])
    assert(ds === ds.sorted && ds.forall(_ > 0))
    // sanity: the ADC winner should rank well under the EXACT metric too —
    // its true cosine to the probe must beat the corpus median
    val exact = rows(graft.operators.Similarity
      .cosineTopK(spark, Sf, k = 250)).map(_.head.asInstanceOf[Long]).toSet
    assert(exact.contains(ids.head),
      s"ADC winner ${ids.head} not in the exact top-half")
  }

  test("hwForecast: 14 rows, the forecast re-derives as level + 7*trend " +
       "+ seasonal, and the seasonal index actually varies") {
    val df = graft.operators.Insights.hwForecast(spark, Sf)
    assertNonDegenerate(df, Seq("level", "trend", "seasonal"), minRows = 14)
    val r = rows(df)
    assert(r.size === 14)
    r.foreach { row =>
      val (lvl, tr, sea, fc) = (row(2).asInstanceOf[Double],
        row(3).asInstanceOf[Double], row(4).asInstanceOf[Double],
        row(5).asInstanceOf[Double])
      // outputs are independently r4-rounded from the exact integers —
      // four roundings compose to up to 4 x 0.5e-4 of drift, and trend
      // contributes 7x its own rounding
      assert(math.abs(fc - (lvl + 7 * tr + sea)) < 6e-4,
        s"forecast identity broken: $row")
    }
  }

  test("matryoshkaRecall: truncation monotone — 32-dim recall >= 16-dim, " +
       "both legs measured over the full probe batch") {
    val r = rows(graft.operators.Similarity.matryoshkaRecall(spark, Sf))
    assert(r.size === 2)
    val byDim = r.map(x => x.head.asInstanceOf[Long] ->
      (x(2).asInstanceOf[Long], x(3).asInstanceOf[Long],
       x(4).asInstanceOf[Double])).toMap
    assert(byDim.keySet === Set(16L, 32L))
    assert(byDim(16)._1 === 80L && byDim(32)._1 === 80L) // 8 probes x 10
    assert(byDim(32)._3 >= byDim(16)._3,
      "a longer prefix cannot lose recall on average fixtures")
    byDim.values.foreach { case (_, hit, rec) =>
      assert(hit >= 1 && rec > 0.0 && rec < 1.0)
    }
  }

  test("centroidDrift: every label reported, halves partition the label, " +
       "cosines live in [-1, 1] and vary") {
    val df = graft.operators.Similarity.centroidDrift(spark, Sf)
    assertNonDegenerate(df, Seq("centroid_cos"), minRows = 10)
    val r = rows(df)
    assert(r.size === 10)
    val total = r.map(x => x(1).asInstanceOf[Long] + x(2).asInstanceOf[Long]).sum
    assert(total === 500L)
    r.foreach { row =>
      val c = row(3).asInstanceOf[Double]
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("abtestCuped: adjusted diff re-derives from the adjusted means, " +
       "variance reduction is a fraction, variants partition the users") {
    val r = rows(graft.operators.Insights.abtestCuped(spark, Sf)).head
    val (nA, nB) = (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long])
    assert(nA >= 1 && nB >= 1)
    val (cA, cB, dC) = (r(5).asInstanceOf[Double], r(6).asInstanceOf[Double],
                        r(8).asInstanceOf[Double])
    assert(math.abs(dC - (cA - cB)) < 3e-4, s"cuped diff identity: $r")
    val vr = r(9).asInstanceOf[Double]
    assert(vr >= 0.0 && vr <= 1.0, s"rho^2 out of range: $vr")
  }

  test("postingStats: log2 buckets bound their df extremes, term mass " +
       "adds up, postings >= terms") {
    val df = graft.operators.Text.postingStats(spark, Sf)
    val r = rows(df)
    assert(r.size >= 2)
    r.foreach { row =>
      val (b, n, p, lo, hi) = (row.head.asInstanceOf[Long],
        row(1).asInstanceOf[Long], row(2).asInstanceOf[Long],
        row(3).asInstanceOf[Long], row(4).asInstanceOf[Long])
      // bucket = bit length: 2^(b-1) <= df < 2^b
      assert(lo >= (1L << (b - 1).toInt) && hi < (1L << b.toInt),
        s"df extremes escape bucket $b: $row")
      assert(p >= n && lo <= hi)
    }
  }

  test("annIvfPq: IVFPQ top-10 ascends, ids distinct, probe excluded, " +
       "residual-coded ADC winner survives the exact-metric sanity rank") {
    val r = rows(graft.operators.Ivf.annIvfPq(spark, Sf))
    assert(r.size === 10)
    val ids = r.map(_.head.asInstanceOf[Long])
    assert(ids.distinct.size === 10 && !ids.contains(0L))
    val ds = r.map(_(1).asInstanceOf[Long])
    assert(ds === ds.sorted && ds.forall(_ > 0))
    val exact = rows(graft.operators.Similarity
      .cosineTopK(spark, Sf, k = 250)).map(_.head.asInstanceOf[Long]).toSet
    assert(exact.contains(ids.head),
      s"IVFPQ winner ${ids.head} not in the exact top-half")
  }

  test("balancedInterleave: slots contiguous and deduped, union size in " +
       "[K, 2K], per-source ranks ascend with slot, both rankers present") {
    val r = rows(graft.operators.Similarity.balancedInterleave(spark, Sf))
    val n = r.size
    assert(n >= 10 && n <= 20, s"union size $n")
    assert(r.map(_.head.asInstanceOf[Int]).toSeq === (1 to n))
    assert(r.map(_(1).asInstanceOf[Long]).distinct.size === n)
    assert(r.map(_(2).asInstanceOf[String]).toSet === Set("A", "B"))
    Seq(("A", 3), ("B", 4)).foreach { case (src, col) =>
      val ranks = r.filter(_(2) == src).flatMap(x => Option(x(col)))
        .map(_.asInstanceOf[Int])
      assert(ranks === ranks.sorted, s"$src ranks not slot-monotone")
    }
  }

  test("ivfPqRecall: cell recall bounds ADC recall from above (a neighbor " +
       "whose cell was not probed can never be returned) and both are " +
       "nontrivial fractions") {
    val r = rows(graft.operators.Ivf.ivfPqRecall(spark, Sf)).head
    val (nT, nH, nC) = (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long],
                        r(2).asInstanceOf[Long])
    assert(nT === 10L)
    assert(nH <= nC, "ADC can only return vectors in probed cells")
    val (rec, cellRec) = (r(3).asInstanceOf[Double], r(4).asInstanceOf[Double])
    assert(rec >= 0.2 && rec <= 1.0, s"ADC recall $rec")
    assert(cellRec >= 0.6, s"cell recall $cellRec — coarse routing broken")
  }

  test("oracle registry: per-domain maps are disjoint and cover exactly " +
       "the oracled query names") {
    val maps = Seq(
      graft.oracles.RelationalSql.sql, graft.oracles.WarehouseSql.sql,
      graft.oracles.QualitySql.sql, graft.oracles.WindowsSql.sql,
      graft.oracles.TextSql.sql, graft.oracles.SimilaritySql.sql,
      graft.oracles.InsightsSql.sql, graft.oracles.InsightsSql2.sql)
    val total = maps.map(_.size).sum
    assert(total === SparkEntry.oracleSql.size,
      s"overlapping keys across domain files: $total union ${SparkEntry.oracleSql.size}")
    // every oracle key names a registered query
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }
}
