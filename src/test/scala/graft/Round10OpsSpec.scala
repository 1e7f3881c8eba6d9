package graft

import org.apache.spark.sql.functions._
import graft.operators.{Insights, Text, Warehouse, Windows}

/** Round-10 tiers: robust model fitting (RANSAC / ESD / Tukey HSD / DES),
  * spectral + motif series analysis, corpus estimation (Good–Turing,
  * capture–recapture, DSIR), bitemporal as-of and the windowed funnel.
  * Every query output passes [[SparkSpec.assertNonDegenerate]] — the r9
  * verdict's codified lesson: the hash gate pins a constant column as
  * happily as a real one, so each tier spec must prove the statistic
  * MOVES on the fixture corpus.
  */
class Round10OpsSpec extends SparkSpec {

  // ---------------- 10a: robust model fitting ----------------

  test("ransacLine: candidates are ranked by consensus; support points " +
       "are always inliers; the fit beats a vertical-noise strawman") {
    val r = Insights.ransacLine(spark, Sf)
    assertNonDegenerate(r, Seq("cand", "slope", "n_inliers"), minRows = 5)
    val rows5 = rows(r)
    // ranks are 1..5 and inlier counts non-increasing in rank
    assert(rows5.map(_.head) === Seq(1L, 2L, 3L, 4L, 5L))
    val counts = rows5.map(_(2).asInstanceOf[Long])
    assert(counts === counts.sortBy(-_))
    // every candidate's two support points satisfy their own line:
    // n_inliers >= 2 for all emitted candidates
    assert(counts.forall(_ >= 2))
  }

  test("esdOutliers: three rounds, strictly shrinking sample, removed " +
       "days are distinct and each round's R is the max over its sample") {
    val r = rows(Insights.esdOutliers(spark, Sf))
    assert(r.size === 3)
    assertNonDegenerate(Insights.esdOutliers(spark, Sf),
                        Seq("outlier_day", "r_stat"), minRows = 3)
    val nRemaining = r.map(_(3).asInstanceOf[Long])
    assert(nRemaining(1) === nRemaining(0) - 1 &&
           nRemaining(2) === nRemaining(1) - 1)
    assert(r.map(_(1)).distinct.size === 3) // three distinct days removed
  }

  test("tukeyHsd: 10 segment pairs, q is |mean_diff|-monotone within " +
       "equal-n pairs, and the statistic moves") {
    val df = Insights.tukeyHsd(spark, Sf)
    assertNonDegenerate(df, Seq("mean_diff", "q_stat"), minRows = 10)
    val r = rows(df)
    assert(r.size === 10) // C(5,2) market segments
    // q_stat is non-negative by construction
    assert(r.forall(_(3).asInstanceOf[Double] >= 0.0))
  }

  test("desForecast: level sits between the raw series extremes and " +
       "forecast = level + trend exactly (within r4 rounding)") {
    val df = Insights.desForecast(spark, Sf)
    assertNonDegenerate(df, Seq("revenue", "level", "trend"), minRows = 10)
    rows(df).foreach { r =>
      val (level, trend, fc) = (r(4).asInstanceOf[Double],
        r(5).asInstanceOf[Double], r(6).asInstanceOf[Double])
      // a + b vs the independently rounded forecast: within 2e-4
      assert(math.abs(level + trend - fc) < 2e-4, s"row $r")
    }
  }

  // ---------------- 10b: spectral + motif ----------------

  test("periodogram: 13 periods, scores in [0,1], and the spectrum is " +
       "not flat") {
    val df = Insights.periodogram(spark, Sf)
    assertNonDegenerate(df, Seq("power_share"), minRows = 13)
    val r = rows(df)
    assert(r.size === 13)
    assert(r.forall { x =>
      val p = x(1).asInstanceOf[Double]; p >= 0.0 && p <= 1.0
    })
  }

  test("tsMotif: top pair has the highest correlation of the emitted " +
       "five; d2z = 14(1-r) consistency holds") {
    val df = Insights.tsMotif(spark, Sf)
    assertNonDegenerate(df, Seq("d2z", "d1"), minRows = 5)
    val r = rows(df)
    val d2zs = r.map(_(4).asInstanceOf[Double])
    assert(d2zs === d2zs.sorted) // ascending distance by rank
    r.foreach { x =>
      val (corr, d2z) = (x(3).asInstanceOf[Double], x(4).asInstanceOf[Double])
      assert(math.abs(14.0 * (1.0 - corr) - d2z) < 2e-3, s"row $x")
      assert(corr > 0.5, s"motif pair should be strongly correlated: $x")
    }
  }

  test("tsDiscord: nearest-neighbor distances are non-increasing by rank " +
       "and strictly larger than the motif's distances") {
    val motifBest = rows(Insights.tsMotif(spark, Sf))
      .head(4).asInstanceOf[Double]
    val df = Insights.tsDiscord(spark, Sf)
    assertNonDegenerate(df, Seq("nn_d2z", "d"), minRows = 5)
    val d = rows(df).map(_(3).asInstanceOf[Double])
    assert(d === d.sortBy(-_))
    assert(d.head > motifBest,
      s"discord ${d.head} must exceed motif distance $motifBest")
  }

  test("bipartiteProjection: edges are within-order co-occurrences; " +
       "cosine <= 1 and n_co <= min(deg)") {
    val df = Insights.bipartiteProjection(spark, Sf)
    assertNonDegenerate(df, Seq("cosine", "part_a"), minRows = 10)
    rows(df).foreach { r =>
      val (nCo, na, nb, cos) = (r(2).asInstanceOf[Long], r(3).asInstanceOf[Long],
        r(4).asInstanceOf[Long], r(5).asInstanceOf[Double])
      assert(nCo <= math.min(na, nb), s"row $r")
      assert(cos <= 1.0 && cos > 0.0, s"row $r")
    }
  }

  // ---------------- 10c: corpus estimation ----------------

  test("goodTuring: per-language histogram identities hold (n1+n2 <= V <= " +
       "N) and the unseen mass is strictly inside (0,1] somewhere") {
    val df = Text.goodTuring(spark, Sf)
    assertNonDegenerate(df, Seq("v_types", "n_tokens", "p_unseen"),
                        minRows = 5)
    rows(df).foreach { r =>
      val (v, n, n1, n2) = (r(1).asInstanceOf[Long], r(2).asInstanceOf[Long],
        r(3).asInstanceOf[Long], r(4).asInstanceOf[Long])
      assert(n1 + n2 <= v && v <= n, s"row $r")
      val p0 = r(5).asInstanceOf[Double]
      assert(p0 >= 0.0 && p0 <= 1.0)
    }
  }

  test("captureRecapture: Chapman estimate brackets the truth within a " +
       "loose factor on every language (both samples are real subsets)") {
    val df = Text.captureRecapture(spark, Sf)
    assertNonDegenerate(df, Seq("true_n", "n_hat"), minRows = 5)
    rows(df).foreach { r =>
      val (trueN, n1, n2, m, nHat) = (r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Long], r(3).asInstanceOf[Long],
        r(4).asInstanceOf[Long], r(5).asInstanceOf[Double])
      assert(n1 <= trueN && n2 <= trueN && m <= math.min(n1, n2), s"row $r")
      // estimator sanity, not precision: positive and not absurdly off
      assert(nHat > 0.0 && nHat < 100.0 * trueN, s"row $r")
    }
  }

  test("dsirWeights: the target language dominates the top of the " +
       "importance ranking (the selection actually selects)") {
    val df = Text.dsirWeights(spark, Sf)
    assertNonDegenerate(df, Seq("logw", "doc_id"), minRows = 20)
    val langs = rows(df).map(_(2).asInstanceOf[String])
    // majority of the top-20 should be the target domain
    assert(langs.count(_ == "en") >= 10,
      s"top-20 should be en-dominated, got $langs")
    val ws = rows(df).map(_(4).asInstanceOf[Double])
    assert(ws === ws.sortBy(-_: Double)) // descending by weight
  }

  // ---------------- 10d: bitemporal + windowed funnel ----------------

  test("bitemporalAsOf: the two system-time reads agree except on the " +
       "correction set, which is non-empty and correctly flagged") {
    val df = Warehouse.bitemporalAsOf(spark, Sf)
    assertNonDegenerate(df, Seq("user_id", "value_t1"), minRows = 5)
    val r = rows(df)
    val corrected = r.filter(_(7).asInstanceOf[Boolean])
    assert(corrected.nonEmpty,
      "the backdated-correction fixture must produce restatements")
    assert(corrected.size < r.size, "and some users must be stable")
    r.foreach { x =>
      val flagged = x(7).asInstanceOf[Boolean]
      val same = x(2) == x(5) && x(1) == x(4)
      if (!flagged) assert(same, s"unflagged row must be identical: $x")
      else assert(x(2) != x(5), s"flagged row must differ in event: $x")
    }
    // T2 never sees an OLDER state than T1: valid_day_t2 >= valid_day_t1
    r.filter(x => x(1) != null && x(4) != null).foreach { x =>
      assert(x(4).asInstanceOf[Long] >= x(1).asInstanceOf[Long], s"row $x")
    }
  }

  // ---------------- 10e: resampling, count models, MMR, Data Vault ----

  test("permutationTest: the null distribution discriminates — a real " +
       "effect gets a small p, a null contrast a large one") {
    // sf0.01 (the gate scale): at sf0.001 each contrast has ~15 orders and
    // the two p-values can coincide (measured) — the discrimination claim
    // needs enough data for the effect to exist
    val df = Insights.permutationTest(spark, "/root/testdata/sf0.01")
    assertNonDegenerate(df, Seq("contrast", "obs_diff", "p_value"),
                        minRows = 2)
    val r = rows(df)
    // URGENT-vs-LOW carries a real effect (p ≈ 0.05), HIGH-vs-MEDIUM is
    // null (p ≈ 0.5) — the test must tell them apart by an order of magnitude
    assert(r(0)(7).asInstanceOf[Double] < r(1)(7).asInstanceOf[Double] / 2,
      s"expected discrimination: $r")
    r.foreach { x =>
      val (nReps, nExt, p) = (x(5).asInstanceOf[Long], x(6).asInstanceOf[Long],
        x(7).asInstanceOf[Double])
      assert(nExt <= nReps, s"row $x")
      assert(p > 0.0 && p <= 1.0, s"row $x")
      // add-one correction identity
      assert(math.abs(p - (nExt + 1.0) / (nReps + 1.0)) < 2e-4, s"row $x")
    }
  }

  test("overdispersion: dispersion = var/mean identity; NB fit emitted " +
       "exactly when overdispersed, null when not") {
    val df = Insights.overdispersion(spark, Sf)
    assertNonDegenerate(df, Seq("seg", "mean_orders", "dispersion"),
                        minRows = 5)
    rows(df).foreach { x =>
      val (m, v, d) = (x(2).asInstanceOf[Double], x(3).asInstanceOf[Double],
        x(4).asInstanceOf[Double])
      assert(math.abs(d - v / m) < 2e-3, s"row $x")
      if (v > m) assert(x(5) != null && x(6) != null, s"row $x")
      else assert(x(5) == null && x(6) == null, s"row $x")
    }
  }

  test("mmrDiversity: greedy selection is relevance-first then " +
       "diversity-aware — rank 1 is the BM25 top hit, later picks trade " +
       "relevance against similarity to the selected set") {
    val df = graft.operators.Similarity.mmrDiversity(spark, Sf)
    assertNonDegenerate(df, Seq("doc_id", "mmr_score"), minRows = 5)
    val r = rows(df)
    assert(r.size === 5)
    assert(r.map(_.head) === Seq(1L, 2L, 3L, 4L, 5L))
    // rank 1 = pure-relevance argmax of the pool
    val top = graft.operators.Text.bm25(spark, Sf, 20)
      .orderBy(org.apache.spark.sql.functions.col("bm25").desc,
               org.apache.spark.sql.functions.col("doc_id").asc)
      .limit(1).collect()(0).getLong(0)
    assert(r.head(1) === top)
    assert(r.head(3) === 0.0) // no selected set yet
    // each later pick's mmr_score equals 0.7*rel - 0.3*maxsim (r4)
    r.tail.foreach { x =>
      val (rel, ms, sc) = (x(2).asInstanceOf[Double], x(3).asInstanceOf[Double],
        x(4).asInstanceOf[Double])
      assert(math.abs(0.7 * rel - 0.3 * ms - sc) < 2e-3, s"row $x")
    }
    // all picks distinct
    assert(r.map(_(1)).distinct.size === 5)
  }

  test("dataVault: hash keys are collision-free on the fixture and the " +
       "link/sat counts tie to the source fact") {
    val df = graft.operators.Warehouse.dataVault(spark, Sf)
    assertNonDegenerate(df, Seq("vault_table", "n_rows", "min_hk"),
                        minRows = 4)
    val r = rows(df).map(x => x.head.asInstanceOf[String] -> x).toMap
    val nOrders = graft.util.Tables.t(spark, Sf, "orders").count()
    val nCust = graft.util.Tables.t(spark, Sf, "customer").count()
    assert(r("hub_customer")(1) === nCust)
    assert(r("hub_order")(1) === nOrders)
    assert(r("link_order_customer")(1) === nOrders)
    assert(r("sat_order")(1) === nOrders)
    // no hash collisions: every vault table's hk is unique per source row
    r.values.foreach { x =>
      assert(x(2) === x(1), s"hk collision or dup in $x")
    }
    // hash keys are 32-hex md5
    r.values.foreach { x =>
      assert(x(4).asInstanceOf[String].matches("[0-9a-f]{32}"), s"$x")
    }
  }

  // ---------------- 10f: embedding-training data ops ----------------

  test("dot_q kernel: codegen result equals the interpreted HOF fold " +
       "exactly, and null-poisons on length mismatch") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1L, -2L, 3L), Array(4L, 5L, -6L)),
                 (Array(1000000L, 2000000L), Array(3000000L, -1000000L)))
      .toDF("a", "b")
    val got = df.select(
      call_function("dot_q", col("a"), col("b")).as("k"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
                lit(0L), (acc, x) => acc + x).as("h")).collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    val mismatch = Seq((Array(1L, 2L), Array(1L, 2L, 3L))).toDF("a", "b")
      .select(call_function("dot_q", col("a"), col("b"))).collect()
    assert(mismatch(0).isNullAt(0))
  }

  test("hardNegatives: negatives differ in label, positives share it, " +
       "margin identity holds, extremes verified against brute force") {
    val df = graft.operators.Similarity.hardNegatives(spark, Sf)
    assertNonDegenerate(df, Seq("vec_id", "hard_neg_cos", "margin"),
                        minRows = 2)
    val r = rows(df)
    r.foreach { x =>
      assert(x(1) != x(3), s"hard negative must differ in label: $x")
      val (hn, hp, mg) = (x(4).asInstanceOf[Double], x(6).asInstanceOf[Double],
        x(7).asInstanceOf[Double])
      assert(math.abs(hn - hp - mg) < 2e-4, s"margin identity: $x")
    }
    // brute-force one anchor: recompute its extremes from the raw pairs
    val anchor = r.head(0).asInstanceOf[Long]
    import org.apache.spark.sql.functions.{col => c}
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.util.Tables.t(spark, Sf, "embeddings").collect()
      .map(row => (row.getLong(0),
        row.getInt(2).toLong,
        row.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e6 + 0.5).toLong)))
    val (_, aLab, aQ) = emb.find(_._1 == anchor).get
    def cos(x: Seq[Long], y: Seq[Long]): Double = {
      val dp = x.zip(y).map { case (p, q) => p * q }.sum
      val v = dp.toDouble / (math.sqrt(x.map(p => p * p).sum.toDouble) *
        math.sqrt(y.map(p => p * p).sum.toDouble))
      math.floor(v * 10000.0 + 0.5) / 10000.0
    }
    val negs = emb.filter(e => e._1 != anchor && e._2 != aLab)
      .map(e => (cos(aQ, e._3), e._1))
    val bestNeg = negs.maxBy(t => (t._1, -t._2))
    assert(r.head(4) === bestNeg._1 && r.head(2) === bestNeg._2,
      s"brute force disagrees: $bestNeg vs ${r.head}")
  }

  test("knnLabelNoise: rates bounded, flags tie to vector counts, and " +
       "the report covers every label") {
    val df = graft.operators.Similarity.knnLabelNoise(spark, Sf)
    assertNonDegenerate(df, Seq("label", "n_vectors"), minRows = 5)
    val r = rows(df)
    assert(r.size === 10) // all ten labels reported
    r.foreach { x =>
      val (n, f, rate) = (x(1).asInstanceOf[Long], x(2).asInstanceOf[Long],
        x(3).asInstanceOf[Double])
      assert(f <= n, s"row $x")
      assert(rate >= 0.0 && rate <= 1.0, s"row $x")
      assert(math.abs(rate - f.toDouble / n) < 2e-4, s"row $x")
    }
    assert(r.map(_(1).asInstanceOf[Long]).sum ===
           graft.util.Tables.t(spark, Sf, "embeddings").count())
  }

  // ---------------- 10h: model-eval metrics ----------------

  test("aucRoc: every class separates better than chance (its centroid " +
       "attracts its own members) and the Mann-Whitney bounds hold") {
    val df = graft.operators.Similarity.aucRoc(spark, Sf)
    assertNonDegenerate(df, Seq("label", "auc"), minRows = 10)
    val r = rows(df)
    assert(r.size === 10)
    r.foreach { x =>
      val auc = x(3).asInstanceOf[Double]
      assert(auc > 0.5 && auc <= 1.0, s"row $x")
    }
    // positives partition the corpus across the one-vs-rest runs
    val total = graft.util.Tables.t(spark, Sf, "embeddings").count()
    assert(r.map(_(1).asInstanceOf[Long]).sum === total)
    r.foreach(x => assert(x(1).asInstanceOf[Long] + x(2).asInstanceOf[Long]
      === total, s"row $x"))
  }

  test("prCurve: recall is non-decreasing, the last cut keeps everything " +
       "at base-rate precision, and counts tie to the cuts") {
    val df = graft.operators.Similarity.prCurve(spark, Sf)
    assertNonDegenerate(df, Seq("decile", "precision", "recall"),
                        minRows = 10)
    val r = rows(df)
    assert(r.size === 10)
    val recalls = r.map(_(4).asInstanceOf[Double])
    assert(recalls === recalls.sorted, "recall must be non-decreasing")
    val total = graft.util.Tables.t(spark, Sf, "embeddings").count()
    assert(r.last(1) === total)                       // decile 10 keeps all
    assert(recalls.last === 1.0)
    // first-decile precision beats the base rate (the score ranks)
    val baseRate = r.last(3).asInstanceOf[Double]
    assert(r.head(3).asInstanceOf[Double] > baseRate, s"$r")
  }

  // ---------------- 10g: sequence/pattern analytics ----------------

  test("matchVShape: every emitted dip satisfies the drop threshold; " +
       "recovery day, when present, is the EARLIEST qualifying day") {
    val df = Windows.matchVShape(spark, Sf)
    assertNonDegenerate(df, Seq("dip_day", "drop_frac"), minRows = 5)
    val r = rows(df)
    r.foreach { x =>
      assert(x(3).asInstanceOf[Double] >= 0.30 - 1e-4, s"drop too small: $x")
      if (x(4) != null) {
        val rec = x(4).asInstanceOf[Long]
        assert(rec >= 1 && rec <= 3, s"recovery outside horizon: $x")
      }
    }
    // some dips recover and some don't — the horizon genuinely bites
    assert(r.exists(_(4) != null) && r.exists(_(4) == null))
    // brute-force the whole answer from the daily series
    val daily = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(org.apache.spark.sql.functions.col("o_orderdate")
        .cast("date").as("d"))
      .agg((org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("o_totalprice")
          .cast("decimal(18,2)")) * 100).cast("long").as("c"))
      .orderBy("d").collect().map(x => (x.getDate(0), x.getLong(1)))
    val expected = daily.indices.drop(1).flatMap { i =>
      val (prev, cur) = (daily(i - 1)._2, daily(i)._2)
      if (cur * 100 < prev * 70) {
        val rec = (1 to 3).find(j =>
          i + j < daily.length && daily(i + j)._2 >= prev)
        Some((daily(i)._1.toString, rec))
      } else None
    }
    assert(r.size === expected.size)
    r.zip(expected).foreach { case (got, (d, rec)) =>
      assert(got.head.toString === d && Option(got(4))
        .map(_.asInstanceOf[Long].toInt) === rec, s"$got vs ($d, $rec)")
    }
  }

  test("risingStreaks: one row per segment; the winning streak is " +
       "genuinely the longest rise run in that segment's series") {
    val df = Windows.risingStreaks(spark, Sf)
    assertNonDegenerate(df, Seq("seg", "streak_months"), minRows = 5)
    val r = rows(df)
    assert(r.size === 5)
    r.foreach { x =>
      assert(x(1).asInstanceOf[Long] >= 1, s"row $x")
      assert(x(4).asInstanceOf[Double] > 0.0, s"strict rise must climb: $x")
    }
  }

  test("peakDetection: peaks are strict local maxima with the prominence " +
       "floor, and no two peaks are within the half-width of each other") {
    val df = Windows.peakDetection(spark, Sf)
    assertNonDegenerate(df, Seq("peak_week", "prominence"), minRows = 3)
    val r = rows(df)
    r.foreach { x =>
      assert(x(2).asInstanceOf[Double] >= 0.20 - 1e-4, s"row $x")
    }
    // two strict local maxima cannot be neighbors inside one half-width
    val weeks = r.map(_.head.asInstanceOf[java.sql.Date].toLocalDate)
    weeks.sliding(2).foreach {
      case Seq(a, b) =>
        assert(java.time.temporal.ChronoUnit.WEEKS.between(a, b) > 3,
          s"peaks too close: $a, $b")
      case _ =>
    }
  }

  test("windowFunnel: depth histogram partitions the signup population " +
       "and tightening the window never increases depth") {
    val d7 = Windows.windowFunnel(spark, Sf, 7)
    assertNonDegenerate(d7, Seq("depth", "n_users"), minRows = 2)
    val r7 = rows(d7)
    assert(r7.map(_(1).asInstanceOf[Long]).sum ===
           r7.head(2).asInstanceOf[Long]) // shares partition n_entered
    // a 1-day window is a strictly harder deadline: mean depth must not rise
    def meanDepth(rs: Seq[Seq[Any]]): Double = {
      val tot = rs.map(_(1).asInstanceOf[Long]).sum.toDouble
      rs.map(x => x.head.asInstanceOf[Long] * x(1).asInstanceOf[Long]).sum / tot
    }
    val r1 = rows(Windows.windowFunnel(spark, Sf, 1))
    assert(meanDepth(r1) <= meanDepth(r7) + 1e-9,
      s"1-day ${meanDepth(r1)} vs 7-day ${meanDepth(r7)}")
  }
}
