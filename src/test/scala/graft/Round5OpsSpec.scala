package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Invariants for the round-5 operators (exact values are covered by the
  * DuckDB oracle via graft.Verify; these pin semantic properties the hash
  * gate can't see).
  */
class Round5OpsSpec extends SparkSpec {

  test("ann_batch: k rows per probe, descending scores, probe 0 agrees with single-probe topk") {
    val r = SparkEntry.queries("q_ann_batch")(spark, Sf).collect()
    val byProbe = r.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.keySet === (0L until 8L).toSet)
    byProbe.values.foreach { g =>
      assert(g.map(_.getAs[Long]("rk")).sorted.toSeq === (1L to 5L).toSeq)
      val scores = g.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos_sim"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(g.forall(row => row.getAs[Long]("vec_id") != row.getAs[Long]("probe_id")))
    }
    // batched probe 0 ≡ the single-probe brute-force query's head
    val single = operators.Similarity.cosineTopK(spark, Sf, 5).collect()
      .map(x => (x.getAs[Long]("vec_id"), x.getAs[Double]("cos_sim"))).toSeq
    val batch0 = byProbe(0L).sortBy(_.getAs[Long]("rk"))
      .map(x => (x.getAs[Long]("vec_id"), x.getAs[Double]("cos_sim"))).toSeq
    assert(batch0 === single)
  }

  test("split_assign: pure function of doc_id, full coverage, 8/1/1 buckets") {
    val r = SparkEntry.queries("q_split_assign")(spark, Sf).collect()
    val total = graft.util.Tables.t(spark, Sf, "documents").count()
    assert(r.length.toLong === total)
    r.foreach { row =>
      val id = row.getAs[Long]("doc_id"); val b = row.getAs[Long]("bucket")
      assert(b === id % 10)
      val expected = if (b < 8) "train" else if (b == 8) "val" else "test"
      assert(row.getAs[String]("split") === expected)
    }
  }

  test("incr_dedup: survivors are from the increment and share no fingerprint with the seen corpus") {
    val fp = operators.Text.docFingerprint(spark, Sf)
      .select(col("doc_id"), col("fingerprint"))
    val seenFps = fp.filter(pmod(col("doc_id"), lit(5L)) =!= 4)
      .select("fingerprint").collect().map(_.getString(0)).toSet
    val r = SparkEntry.queries("q_incr_dedup")(spark, Sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("doc_id") % 5 === 4)
      assert(!seenFps.contains(row.getAs[String]("fingerprint")),
        s"doc ${row.getAs[Long]("doc_id")} duplicates a seen fingerprint")
    }
  }

  test("topk_per_group: two-phase result identical to the single-window formulation") {
    val li = graft.util.Tables.t(spark, Sf, "lineitem")
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    val naive = li.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("l_suppkey"), col("rk"), col("l_orderkey"), col("l_linenumber"))
      .collect().map(_.toSeq).toSet
    val twoPhase = SparkEntry.queries("q_topk_per_group")(spark, Sf)
      .select(col("l_suppkey"), col("rk"), col("l_orderkey"), col("l_linenumber"))
      .collect().map(_.toSeq).toSet
    assert(twoPhase === naive)
  }

  test("rolling median: bounded by the frame's min/max and robust to a spike") {
    val r = SparkEntry.queries("q_rolling_median")(spark, Sf)
    // median of any window lies within the per-user global [min,max]
    val bounds = graft.util.Tables.events(spark, Sf)
      .groupBy("user_id").agg(min("value").as("lo"), max("value").as("hi"))
    val joined = r.join(bounds, "user_id")
      .filter(col("med7") < col("lo") - 1e-4 || col("med7") > col("hi") + 1e-4)
    assert(joined.count() === 0)
  }

  test("regr_agg: agrees with Spark's built-in regr_* within rounding tolerance") {
    val r = SparkEntry.queries("q_regr_agg")(spark, Sf).collect()
      .map(x => x.getAs[String]("l_returnflag") ->
        (x.getAs[Double]("slope"), x.getAs[Double]("intercept"), x.getAs[Double]("r2"))).toMap
    val builtin = graft.util.Tables.t(spark, Sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("regr_slope(l_extendedprice, l_quantity)").as("s"),
           expr("regr_intercept(l_extendedprice, l_quantity)").as("i"),
           expr("regr_r2(l_extendedprice, l_quantity)").as("r"))
      .collect()
    assert(builtin.nonEmpty)
    builtin.foreach { row =>
      val (s, i, r2) = r(row.getAs[String]("l_returnflag"))
      assert(math.abs(s - row.getAs[Double]("s")) < 1e-3)
      assert(math.abs(i - row.getAs[Double]("i")) < 1e-2)
      assert(math.abs(r2 - row.getAs[Double]("r")) < 1e-3)
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("dedup_components_editdist: paired docs share a component, canonical is the min member") {
    val pairs = operators.Dedup.editDistPairs(spark, Sf, 40, 8).collect()
      .map(x => (x.getAs[Long]("a_id"), x.getAs[Long]("b_id")))
    val assign = SparkEntry.queries("q_dedup_components_editdist")(spark, Sf).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("component_id"), x.getAs[Boolean]("is_canonical"))).toMap
    // full-corpus coverage
    assert(assign.size.toLong === graft.util.Tables.t(spark, Sf, "documents").count())
    // every edge's endpoints share a component
    pairs.foreach { case (a, b) => assert(assign(a)._1 === assign(b)._1) }
    // canonical ⇔ id equals its component's min member
    val members = assign.groupBy(_._2._1).map { case (c, m) => c -> m.keys.min }
    assign.foreach { case (id, (comp, canon)) =>
      assert(comp <= id)
      assert(canon === (id == members(comp)), s"canonical flag wrong for $id")
    }
  }

  test("BandedLevenshteinRule: naive lev<=k predicates plan banded, results identical") {
    import org.apache.spark.sql.catalyst.expressions.Levenshtein
    // parquet-backed input: a local relation would be constant-folded away
    // (ConvertToLocalRelation) before the expression could be inspected
    val df = graft.util.Tables.t(spark, Sf, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 12).as("h"))
    def bandedLevs(q: org.apache.spark.sql.DataFrame) =
      q.queryExecution.optimizedPlan
        .collect { case p => p.expressions.flatMap(_.collect { case l: Levenshtein => l }) }
        .flatten
    // unbanded ground truth computed WITHOUT a comparison (nothing to rewrite)
    val dist = df.select(col("doc_id"), expr("levenshtein(h, 'the quick br')").as("d"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("d")).toMap
    for ((pred, bound) <- Seq("levenshtein(h, 'the quick br') <= 6" -> 6,
                              "levenshtein(h, 'the quick br') < 7" -> 6,
                              "6 >= levenshtein(h, 'the quick br')" -> 6)) {
      val q = df.filter(expr(pred))
      val levs = bandedLevs(q)
      assert(levs.nonEmpty && levs.forall(_.threshold.isDefined),
        s"'$pred' not rewritten to the banded form")
      val got = q.collect().map(_.getAs[Long]("doc_id")).toSet
      val want = dist.collect { case (id, d) if d <= bound => id }.toSet
      assert(got === want, s"'$pred' changed results")
    }
    // unbounded uses stay untouched
    assert(bandedLevs(df.select(expr("levenshtein(h, 'the quick br')"))).nonEmpty)
    assert(bandedLevs(df.select(expr("levenshtein(h, 'the quick br')")))
      .forall(_.threshold.isEmpty))
  }

  test("scd2_asof: exactly one covering version per user signed up by the as-of instant") {
    val T = 1705276800000000L
    val asof = SparkEntry.queries("q_scd2_asof")(spark, Sf).collect()
    asof.foreach { row =>
      assert(row.getAs[Long]("valid_from_us") <= T)
      assert(row.isNullAt(row.fieldIndex("valid_to_us")) ||
             row.getAs[Long]("valid_to_us") > T)
    }
    assert(asof.map(_.getAs[Long]("user_id")).distinct.length === asof.length,
      "at most one version per user can cover the instant")
    val expected = operators.Warehouse.scd2Versions(spark, Sf)
      .filter(col("valid_from_us") <= T)
      .select("user_id").distinct().count()
    assert(asof.length.toLong === expected,
      "every user with any version before T has exactly one covering version")
  }

  test("knn_classify: prediction is a neighbor label with a winning vote count") {
    val nb = operators.Similarity.cosineTopKBatch(spark, Sf, 8, 5)
      .join(graft.util.Tables.t(spark, Sf, "embeddings").select(col("vec_id"), col("label")), "vec_id")
      .collect().groupBy(_.getAs[Long]("probe_id"))
    val r = SparkEntry.queries("q_knn_classify")(spark, Sf).collect()
    assert(r.map(_.getAs[Long]("probe_id")).toSet === (0L until 8L).toSet)
    r.foreach { row =>
      val labels = nb(row.getAs[Long]("probe_id")).map(_.getAs[Int]("label"))
      val counts = labels.groupBy(identity).view.mapValues(_.length)
      val pred = row.getAs[Int]("predicted")
      assert(labels.contains(pred))
      assert(counts(pred).toLong === row.getAs[Long]("votes"))
      assert(counts.values.forall(_ <= counts(pred)), "prediction must take the max vote")
    }
  }

  test("percent_total: shares within each returnflag sum to 1") {
    val r = SparkEntry.queries("q_percent_total")(spark, Sf).collect()
    assert(r.nonEmpty)
    r.groupBy(_.getAs[String]("l_returnflag")).values.foreach { g =>
      val s = g.map(_.getAs[Double]("share")).sum
      assert(math.abs(s - 1.0) < 1e-3 * g.length, s"shares sum to $s")
    }
  }

  test("gaps_islands: islands are consecutive runs with at least a one-day gap between them") {
    val r = SparkEntry.queries("q_gaps_islands")(spark, Sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val len = row.getAs[java.sql.Date]("end_day").toLocalDate.toEpochDay -
                row.getAs[java.sql.Date]("start_day").toLocalDate.toEpochDay + 1
      assert(len === row.getAs[Long]("n_days"), "island length must equal its day count")
    }
    r.groupBy(_.getAs[Long]("user_id")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[java.sql.Date]("start_day").toLocalDate.toEpochDay)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        val gap = b.getAs[java.sql.Date]("start_day").toLocalDate.toEpochDay -
                  a.getAs[java.sql.Date]("end_day").toLocalDate.toEpochDay
        assert(gap >= 2, "adjacent islands must be separated by a missing day")
      }
    }
  }

  test("window cume_dist: in (0,1], 1.0 at each customer's priciest order") {
    val r = SparkEntry.queries("q_window_cume")(spark, Sf).collect()
    assert(r.nonEmpty)
    assert(r.forall(x => x.getAs[Double]("cume") > 0.0 && x.getAs[Double]("cume") <= 1.0))
    val maxPerCust = r.groupBy(_.getAs[Long]("o_custkey"))
      .values.map(_.maxBy(x => (x.getAs[Double]("o_totalprice"), x.getAs[Long]("o_orderkey"))))
    assert(maxPerCust.forall(_.getAs[Double]("cume") === 1.0))
  }
}
