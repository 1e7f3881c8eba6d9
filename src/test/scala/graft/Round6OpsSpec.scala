package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Invariants for the round-6 operator batch (exact values are under the
  * DuckDB oracle via graft.Verify; these pin semantic and PLAN properties
  * the hash gate can't see).
  */
class Round6OpsSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("ngram_lm: probabilities are valid, ranks contiguous, context counts honored") {
    val r = SparkEntry.queries("q_ngram_lm")(spark, Sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val p = row.getAs[Double]("p_smooth")
      assert(p > 0.0 && p < 1.0, s"smoothed probability out of range: $p")
      assert(row.getAs[Long]("c_xy") >= 5L, "min-count threshold must hold")
    }
    // per-context ranks are 1..k with no gaps and descending probability
    r.groupBy(_.getAs[String]("w1")).foreach { case (_, g) =>
      val byRk = g.sortBy(_.getAs[Long]("rk"))
      assert(byRk.map(_.getAs[Long]("rk")).toSeq === (1L to byRk.length).toSeq)
      val ps = byRk.map(_.getAs[Double]("p_smooth"))
      assert(ps.zip(ps.tail).forall { case (a, b) => a >= b })
    }
  }

  test("domain cap: no source exceeds the cap, survivors are the largest docs") {
    val cap = 10
    val r = SparkEntry.queries("q_domain_cap")(spark, Sf).collect()
    val bySrc = r.groupBy(_.getAs[String]("source"))
    assert(bySrc.values.forall(_.length <= cap))
    val docs = graft.util.Tables.t(spark, Sf, "documents")
      .select(col("source"), col("doc_id"), col("n_chars")).collect()
    val docsBySrc = docs.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (src, kept) =>
      val all = docsBySrc(src)
      assert(kept.length === math.min(cap, all.length),
        s"$src must keep min(cap, available)")
      // survivors == top-cap by (n_chars desc, doc_id asc)
      val expect = all.sortBy(x => (-x.getAs[Long]("n_chars"), x.getAs[Long]("doc_id")))
        .take(cap).map(_.getAs[Long]("doc_id")).toSet
      assert(kept.map(_.getAs[Long]("doc_id")).toSet === expect)
    }
  }

  test("dup spans: top-k ranking matches a naive in-test recomputation") {
    val got = SparkEntry.queries("q_dup_spans")(spark, Sf).collect()
    assert(got.nonEmpty && got.length <= 100)
    // naive recompute: distinct 3-gram shingles per doc, span -> doc set
    val perDoc = graft.util.Tables.t(spark, Sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ").sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet)
    val spanDocs = perDoc.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      .filter(_._2.size >= 2)
    val expect = spanDocs.toSeq
      .map { case (s, ds) => (s, ds.size.toLong, ds.min, ds.max) }
      .sortBy { case (s, n, _, _) => (-n, s) }.take(100)
    val gotSeq = got.map(r => (r.getAs[String]("s"), r.getAs[Long]("n_docs"),
      r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc"))).toSeq
    assert(gotSeq === expect)
    // top-k is a bounded TakeOrderedAndProject, never a full global sort
    val p = plan(SparkEntry.queries("q_dup_spans")(spark, Sf))
    assert(p.contains("TakeOrderedAndProject"), s"expected bounded top-k:\n$p")
  }

  test("embed centroid: one row per (label, dim); centroid inside value envelope") {
    val r = SparkEntry.queries("q_embed_centroid")(spark, Sf).collect()
    val labels = graft.util.Tables.t(spark, Sf, "embeddings")
      .select(col("label")).distinct().count()
    assert(r.length === labels * 64, "64 dimensions per label")
    r.foreach { row =>
      val c = row.getAs[Double]("centroid_val")
      assert(c >= -1.5 && c <= 1.5, s"centroid far outside embedding range: $c")
      assert(row.getAs[Long]("n") > 0)
    }
  }

  test("exists subquery: Catalyst rewrites to semi + anti joins (no per-row re-execution)") {
    val df = SparkEntry.queries("q_exists_subquery")(spark, Sf)
    val p = plan(df)
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a left-semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as a left-anti join:\n$p")
    // semantic cross-check against explicit set arithmetic
    val orders = graft.util.Tables.t(spark, Sf, "orders")
    val big = orders.filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0)).toSet
    val failed = orders.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0)).toSet
    val got = df.collect().map(_.getAs[Long]("c_custkey")).toSet
    assert(got === big.diff(failed))
  }

  test("conditional agg: one scan, accumulators match per-predicate recomputation") {
    val df = SparkEntry.queries("q_conditional_agg")(spark, Sf)
    // single pass: exactly one relation scan in the optimized plan
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.length
    assert(scans === 1, "conditional aggregation must not rescan per predicate")
    val li = graft.util.Tables.t(spark, Sf, "lineitem")
    val r = df.collect().map(x => x.getAs[String]("l_returnflag") -> x).toMap
    val bulk = li.filter(col("l_quantity") > 25).groupBy(col("l_returnflag")).count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    r.foreach { case (flag, row) =>
      assert(row.getAs[Long]("n_bulk") === bulk.getOrElse(flag, 0L))
    }
  }

  test("dense crosstab: full grid present, empty cells zero-filled") {
    val r = SparkEntry.queries("q_crosstab_dense")(spark, Sf).collect()
    val nR = graft.util.Tables.t(spark, Sf, "region").count()
    val nP = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_orderpriority")).distinct().count()
    assert(r.length === nR * nP, "every (region, priority) cell must exist")
    r.foreach { row =>
      val n = row.getAs[Long]("n_orders")
      val rev = row.getAs[Double]("revenue")
      assert(n >= 0L)
      if (n == 0L) assert(rev === 0.0, "empty cells must read 0, not NULL")
    }
  }

  test("weekly resample: buckets start Monday and partition the order count") {
    val r = SparkEntry.queries("q_resample_weekly")(spark, Sf).collect()
    r.foreach { row =>
      val d = row.getAs[java.sql.Date]("week_start").toLocalDate
      assert(d.getDayOfWeek === java.time.DayOfWeek.MONDAY)
    }
    val total = r.map(_.getAs[Long]("n_orders")).sum
    assert(total === graft.util.Tables.t(spark, Sf, "orders").count())
  }

  test("scalar subquery: rewritten to aggregate+join; customers without orders get 0/null") {
    val df = SparkEntry.queries("q_scalar_subquery")(spark, Sf)
    val p = df.queryExecution.optimizedPlan.toString
    assert(!p.contains("scalar-subquery"),
      s"correlated scalars must be rewritten away, not re-executed per row:\n${p.take(1200)}")
    val r = df.collect()
    val withOrders = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0)).toSet
    r.foreach { row =>
      val ck = row.getAs[Long]("c_custkey")
      if (withOrders.contains(ck)) {
        assert(row.getAs[Long]("n_orders") > 0L)
        assert(row.getAs[java.sql.Date]("last_order") != null)
      } else {
        assert(row.getAs[Long]("n_orders") === 0L, s"customer $ck")
        assert(row.getAs[java.sql.Date]("last_order") == null, s"customer $ck")
      }
    }
  }

  test("lateral top-n: at most k rows per outer row, matching the window formulation") {
    import org.apache.spark.sql.expressions.Window
    val r = SparkEntry.queries("q_lateral_topn")(spark, Sf).collect()
    assert(r.groupBy(_.getAs[String]("n_name")).values.forall(_.length <= 2))
    val expect = graft.util.Tables.t(spark, Sf, "customer")
      .join(graft.util.Tables.t(spark, Sf, "nation"),
            col("c_nationkey") === col("n_nationkey"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("n_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)))
      .filter(col("rk") <= 2)
      .select(col("n_name"), col("c_custkey")).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSet
    assert(r.map(x => (x.getAs[String]("n_name"), x.getAs[Long]("c_custkey"))).toSet
      === expect)
  }

  test("benford: ratios are a distribution and expectation follows log10(1+1/d)") {
    val r = SparkEntry.queries("q_benford")(spark, Sf).collect()
    assert(r.map(_.getAs[Int]("digit")).toSet.subsetOf((1 to 9).toSet))
    val obsSum = r.map(_.getAs[Double]("obs_ratio")).sum
    assert(math.abs(obsSum - 1.0) < 0.001, s"observed ratios must sum to ~1, got $obsSum")
    r.foreach { row =>
      val d = row.getAs[Int]("digit")
      val expected = math.floor(math.log(1.0 + 1.0 / d) / math.log(10.0) * 10000.0 + 0.5) / 10000.0
      assert(row.getAs[Double]("exp_ratio") === expected)
    }
  }

  test("role-playing dim: items conserved across the quarter matrix, roles independent") {
    val r = SparkEntry.queries("q_role_playing_dim")(spark, Sf).collect()
    val total = r.map(_.getAs[Long]("n_items")).sum
    assert(total === graft.util.Tables.t(spark, Sf, "lineitem").count(),
      "every lineitem lands in exactly one (order-q, ship-q) cell")
    // both roles resolve through the SAME calendar yet vary independently:
    // the matrix is genuinely 2-D, not a degenerate diagonal
    val orderQs = r.map(x => (x.getAs[Int]("order_yr"), x.getAs[Int]("order_qtr"))).toSet
    val shipQs = r.map(x => (x.getAs[Int]("ship_yr"), x.getAs[Int]("ship_qtr"))).toSet
    assert(orderQs.size > 1 && shipQs.size > 1)
    assert(r.exists(x => (x.getAs[Int]("order_yr"), x.getAs[Int]("order_qtr")) !=
                         (x.getAs[Int]("ship_yr"), x.getAs[Int]("ship_qtr"))),
      "some shipments must cross a quarter boundary")
    r.foreach(row => assert(row.getAs[Long]("n_items") > 0L))
  }

  test("perplexity filter: keep flag is the exact integer rule, scores positive") {
    val r = SparkEntry.queries("q_perplexity_filter")(spark, Sf).collect()
    assert(r.nonEmpty)
    var kept = 0
    r.foreach { row =>
      val nll = row.getAs[Double]("avg_nll")
      assert(nll > 0.0 && row.getAs[Long]("n_bigrams") > 0L)
      val isKept = row.getAs[Boolean]("is_kept")
      if (isKept) kept += 1
      // keep decision must be consistent with the (rounded) average score
      if (isKept) assert(nll <= 8.0001) else assert(nll >= 7.9999)
    }
    assert(kept > 0, "threshold should keep some of the corpus")
  }

  test("abtest: exhaustive variant split, z-score sign matches rate difference") {
    val r = SparkEntry.queries("q_abtest")(spark, Sf).collect()
    assert(r.length === 1)
    val row = r.head
    val users = graft.util.Tables.events(spark, Sf)
      .select(col("user_id")).distinct().count()
    assert(row.getAs[Long]("n_a") + row.getAs[Long]("n_b") === users,
      "every user lands in exactly one variant")
    assert(row.getAs[Long]("conv_a") <= row.getAs[Long]("n_a"))
    assert(row.getAs[Long]("conv_b") <= row.getAs[Long]("n_b"))
    val z = row.getAs[Double]("z_score")
    val dRate = row.getAs[Double]("rate_a") - row.getAs[Double]("rate_b")
    if (math.abs(dRate) > 1e-9) assert(math.signum(z) === math.signum(dRate))
  }

  test("markov transitions: rows form a stochastic matrix (outgoing probs sum to 1)") {
    val r = SparkEntry.queries("q_markov_transitions")(spark, Sf).collect()
    assert(r.nonEmpty)
    r.groupBy(_.getAs[String]("cur")).foreach { case (cur, g) =>
      val sum = g.map(_.getAs[Double]("p")).sum
      assert(math.abs(sum - 1.0) < 0.001, s"P(·|$cur) must sum to ~1, got $sum")
    }
    r.foreach(row => assert(row.getAs[Long]("n") > 0L))
  }

  test("yoy delta: first year per segment has null delta, later deltas reconcile") {
    val r = SparkEntry.queries("q_yoy_delta")(spark, Sf).collect()
    r.groupBy(_.getAs[String]("c_mktsegment")).foreach { case (_, g) =>
      val byYr = g.sortBy(_.getAs[Int]("yr"))
      assert(byYr.head.isNullAt(byYr.head.fieldIndex("delta")),
        "no previous year ⇒ null delta")
      byYr.sliding(2).foreach {
        case Array(prev, curr) =>
          val expect = math.floor(
            (curr.getAs[Double]("revenue") - prev.getAs[Double]("revenue")) * 10000.0 + 0.5
          ) / 10000.0
          assert(math.abs(curr.getAs[Double]("delta") - expect) < 0.001,
            s"delta must be revenue difference: $curr")
        case _ =>
      }
    }
  }

  test("bpe merges: pairs are 2 chars, counts weighted by word frequency, rank total") {
    val r = SparkEntry.queries("q_bpe_merges")(spark, Sf).collect()
    assert(r.length === 20)
    r.foreach { row =>
      assert(row.getAs[String]("pair").length === 2)
      assert(row.getAs[Long]("n") > 0L)
    }
    val ns = r.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "descending count order")
    // hand-check the top pair's count on a tiny slice of the corpus logic:
    // every adjacent char pair of every word occurrence is counted once
    val docsText = graft.util.Tables.t(spark, Sf, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val counts = new scala.collection.mutable.HashMap[String, Long]()
    docsText.foreach { t =>
      t.toLowerCase.split(" ", -1).filter(_.length >= 2).foreach { w =>
        w.sliding(2).foreach(p => counts(p) = counts.getOrElse(p, 0L) + 1L)
      }
    }
    val top = r.head
    assert(counts(top.getAs[String]("pair")) === top.getAs[Long]("n"),
      "top merge count must equal the brute-force count")
  }

  test("wma: warm-up rows use only present weights; steady state matches by hand") {
    val r = SparkEntry.queries("q_wma")(spark, Sf)
    val one = r.filter(col("user_id") === 1).collect()
    val vals = graft.util.Tables.events(spark, Sf)
      .filter(col("user_id") === 1)
      .orderBy(col("ts_us").asc, col("event_id").asc)
      .select(col("value")).collect().map(_.getDouble(0))
    assert(one.length === vals.length, "one output row per input event")
    def q(x: Double) = math.floor(x * 10000.0 + 0.5)
    def expect(i: Int): Double = {
      val lo = math.max(0, i - 4)
      val terms = (lo to i).map(j => (q(vals(j)), (5 - (i - j)).toLong))
      val raw = terms.map { case (qv, w) => qv * w }.sum / 10000.0 / terms.map(_._2).sum
      math.floor(raw * 10000.0 + 0.5) / 10000.0
    }
    one.zipWithIndex.foreach { case (row, i) =>
      assert(row.getAs[Double]("wma5") === expect(i), s"row $i")
    }
  }

  test("pagerank: mass conserved within floor-division leak, base rank floors every node") {
    val r = SparkEntry.queries("q_pagerank")(spark, Sf).collect()
    assert(r.nonEmpty)
    val n = r.length.toLong
    val base = (15L * (1000000000000L / n)) / 100L
    val mass = r.map(_.getAs[Long]("rank_fp")).sum
    // floor division only ever DROPS sub-unit mass: total stays in
    // (1e12 - leak, 1e12], and every node keeps at least its teleport base
    assert(mass <= 1000000000000L && mass > 999000000000L, s"mass=$mass")
    assert(r.forall(_.getAs[Long]("rank_fp") >= base))
    // a popular part must outrank the uniform share (the ranking does rank)
    assert(r.map(_.getAs[Long]("rank_fp")).max > 1000000000000L / n)
  }

  test("dq rules: clean orders pass every rule; injected violations are counted exactly") {
    import graft.operators._
    // the registered report over real orders: all green
    val report = SparkEntry.queries("q_dq_rules")(spark, Sf).collect()
    assert(report.length === 9)
    assert(report.forall(_.getAs[Boolean]("pass")), "driver orders data is clean")
    // injected violations: each rule class counts its own, exactly
    import spark.implicits._
    val dirty = Seq(
      (1L, "F", 10.0, "Clerk#1", "1-URGENT"),            // clean
      (1L, "F", 10.0, "Clerk#2", "2-HIGH"),              // dup key
      (2L, "X", -5.0, "nobody", "9-BOGUS"),              // set+range+regex+check
      (3L, null, 20.0, "Clerk#3", "3-MEDIUM")            // null status passes in_set
    ).toDF("k", "status", "price", "clerk", "prio")
    val rules = Seq(
      Unique("k"),
      InSet("status", Seq("F", "O", "P")),
      InRange("price", 0.0, 100.0),
      MatchesRegex("clerk", "^Clerk#[0-9]+$"),
      Check("priority_known", !col("prio").rlike("^[1-5]-")),
      // status classes: F(2 rows), X(1), null(1) -> the two singletons are
      // re-identifiable at k=2 (and the null class counts as a class)
      KAnonymity(Seq("status"), 2))
    val got = DqRules.validate(dirty, rules).collect()
      .map(r => r.getAs[String]("rule") -> r.getAs[Long]("n_violations")).toMap
    assert(got === Map(
      "unique(k)" -> 1L, "in_set(status)" -> 1L, "in_range(price)" -> 1L,
      "matches_regex(clerk)" -> 1L, "priority_known" -> 1L,
      "k_anonymity(status,2)" -> 2L))
    // enforcement: the one offending row quarantined with ALL its rule tags
    val r = DqRules.enforce(dirty, rules)
    assert(r.clean.count() === 3)
    val q = r.quarantine.collect()
    assert(q.length === 1 && q.head.getAs[Long]("k") === 2L)
    assert(q.head.getAs[scala.collection.Seq[String]]("_dq_violations").sorted ===
      Seq("in_range(price)", "in_set(status)", "matches_regex(clerk)", "priority_known"))
  }

  test("shortest path: matches a sequential 4-round Bellman-Ford fold exactly") {
    val r = SparkEntry.queries("q_shortest_path")(spark, Sf).collect()
      .map(x => x.getAs[Long]("part_id") -> x.getAs[Long]("dist_fp")).toMap
    assert(r.nonEmpty)
    // exactly one source at distance 0, and it is the smallest node
    assert(r.count(_._2 == 0L) === 1)
    assert(r.minBy(_._1)._2 === 0L)
    // independent sequential reference: same edge definition, same fold
    val items = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = items.as("a")
      .join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .agg(count(lit(1)).as("w"))
      .collect()
      .map(x => (x.getAs[Long]("src"), x.getAs[Long]("dst"),
                 1L + 1000L / (x.getAs[Long]("w") + 1L)))
    val inf = 1000000000000000L
    val nodes = edges.map(_._1).distinct
    val srcN = nodes.min
    var d = nodes.map(n => n -> (if (n == srcN) 0L else inf)).toMap
    for (_ <- 1 to graft.operators.Insights.SpRounds) {
      val relaxed = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => d(e._1) + e._3).min
      }
      d = d.map { case (n, v) => n -> math.min(v, relaxed.getOrElse(n, inf)) }
    }
    assert(r === d.filter(_._2 < inf), "distributed fold must equal sequential fold")
  }

  test("ewma: matches a sequential per-user exponential recurrence") {
    val got = SparkEntry.queries("q_ewma")(spark, Sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        r.getAs[Double]("ewma5")).toMap
    assert(got.nonEmpty)
    val ev = graft.util.Tables.t(spark, Sf, "events")
      .select(col("user_id"), col("event_id"),
              unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
                 r.getAs[Long]("ts_us"), r.getAs[Double]("value")))
    ev.groupBy(_._1).foreach { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      val q = ordered.map(r => math.floor(r._4 * 10000.0 + 0.5).toLong)
      ordered.indices.foreach { i =>
        // truncated adjusted EWMA: weights 16 >> lag over the last <=5 obs
        val lags = (0 until math.min(5, i + 1))
        val sq = lags.map(l => q(i - l) * (16L >> l)).sum
        val sw = lags.map(l => 16L >> l).sum
        val expect = math.floor(sq.toDouble / 10000.0 / sw.toDouble
          * 10000.0 + 0.5) / 10000.0
        assert(got((uid, ordered(i)._2)) === expect,
          s"ewma mismatch for user $uid event ${ordered(i)._2}")
      }
    }
  }

  test("containment join: lossless vs naive all-ordered-pairs; asymmetric by construction") {
    val got = SparkEntry.queries("q_containment_join")(spark, Sf).collect()
      .map(x => (x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b"))).toSet
    assert(got.nonEmpty)
    val sh = graft.operators.Text
      .shingleRows(graft.util.Tables.t(spark, Sf, "documents"))
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[String]("s")).toSet).toMap
    val ids = sh.keys.toArray.sorted
    // ORDERED pairs: containment is directional
    val naive = (for {
      a <- ids.iterator; b <- ids.iterator if a != b
      c = (sh(a) & sh(b)).size
      if c * 5 >= sh(a).size * 4
    } yield (a, b)).toSet
    assert(got === naive, "containment prefix filtering must be lossless")
    // directionality is numerically exercised: C(A,B) = c/na, and some
    // qualifying pair has na != nb so the two directions score differently
    val vals = SparkEntry.queries("q_containment_join")(spark, Sf).collect()
      .map(x => (x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b")) ->
        x.getAs[Double]("containment")).toMap
    vals.foreach { case ((a, b), v) =>
      val expect = math.floor((sh(a) & sh(b)).size.toDouble / sh(a).size
        * 10000.0 + 0.5) / 10000.0
      assert(v === expect, s"containment value mismatch for ($a,$b)")
    }
    assert(vals.exists { case ((a, b), v) =>
      vals.get((b, a)).exists(_ != v)
    }, "expected some pair scoring differently in the two directions")
  }

  test("jaccard prefix join: lossless vs naive all-pairs, and the prefix prunes") {
    val got = SparkEntry.queries("q_jaccard_prefix_join")(spark, Sf).collect()
      .map(x => (x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b"))).toSet
    assert(got.nonEmpty)
    // naive in-test reference over the SAME shingle sets
    val sh = graft.operators.Text
      .shingleRows(graft.util.Tables.t(spark, Sf, "documents"))
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[String]("s")).toSet).toMap
    val ids = sh.keys.toArray.sorted
    val naive = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      a = sh(ids(i)); b = sh(ids(j))
      c = (a & b).size
      // J >= 1/2 as the same integer cross-multiplication the engine uses
      if c * 3 >= a.size + b.size
    } yield (ids(i), ids(j))).toSet
    assert(got === naive, "prefix filtering must be lossless")
    // the prune is real: candidate pairs (sharing a PREFIX shingle) are
    // strictly fewer than pairs sharing ANY shingle
    val freq = sh.values.toSeq.flatten.groupBy(identity)
      .view.mapValues(_.size).toMap
    val prefixes = sh.map { case (id, s) =>
      val p = s.size - (s.size + 1) / 2 + 1
      id -> s.toSeq.sortBy(x => (freq(x), x)).take(p).toSet
    }
    def sharing(m: Map[Long, Set[String]]): Int = {
      val inv = m.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
        .groupBy(_._1).values
      inv.flatMap(ps => for {
        a <- ps.map(_._2); b <- ps.map(_._2) if a < b
      } yield (a, b)).toSet.size
    }
    assert(sharing(prefixes) < sharing(sh))
  }
}
