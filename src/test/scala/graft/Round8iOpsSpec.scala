package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Text, Windows}

/** Round-8i additions: duplicate concentration by source, inter-purchase
  * cadence, the quality-filter token budget, and the vocabulary coverage
  * curve. Driver folds plus conservation/monotonicity invariants.
  */
class Round8iOpsSpec extends SparkSpec {

  test("dupBySource: per-source tallies reconcile with the CC assignment exactly") {
    val out = Dedup.dupBySource(spark, Sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_clustered"),
         r.getAs[Long]("n_dropped"))).toMap
    val assign = Dedup.dedupComponentsEditdist(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component_id"),
                 r.getAs[Boolean]("is_canonical")))
    val srcOf = graft.util.Tables.t(spark, Sf, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val csize = assign.groupBy(_._2).map { case (c, v) => c -> v.size }
    val expected = assign.groupBy(r => srcOf(r._1)).map { case (s, rs) =>
      s -> (rs.size.toLong, rs.count(r => csize(r._2) >= 2).toLong,
            rs.count(!_._3).toLong) }
    assert(out === expected)
    // conservation: dropped docs across sources == non-canonical docs total
    assert(out.values.map(_._3).sum === assign.count(!_._3).toLong)
  }

  test("interPurchase: gap stats match a per-customer fold") {
    val out = Windows.interPurchase(spark, Sf).collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        (r.getAs[Long]("n_gaps"), r.getAs[Double]("mean_gap_days"),
         r.getAs[Double]("p50_gap_days"))).toMap
    val seg = graft.util.Tables.t(spark, Sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[String]("c_mktsegment")).toMap
    val ords = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
              col("o_orderdate").cast("date").as("d")).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"),
                 r.getAs[java.sql.Date]("d").toLocalDate))
    val gaps = ords.groupBy(_._1).toSeq.flatMap { case (ck, rs) =>
      rs.sortBy(r => (r._3.toEpochDay, r._2)).map(_._3).toSeq.sliding(2)
        .filter(_.length == 2)
        .map(p => (seg(ck), java.time.temporal.ChronoUnit.DAYS.between(p(0), p(1))))
    }
    gaps.groupBy(_._1).foreach { case (s, v) =>
      val xs = v.map(_._2.toDouble).sorted
      assert(out(s)._1 === xs.length.toLong, s"$s n_gaps")
      assert(math.abs(out(s)._2 - xs.sum / xs.length) < 1e-3, s"$s mean")
      val h = (xs.length - 1) * 0.5; val k = h.toInt
      val med = xs(k) + (h - k) * (xs(math.min(k + 1, xs.length - 1)) - xs(k))
      assert(math.abs(out(s)._3 - med) < 1e-3, s"$s p50")
    }
  }

  test("filterBudget: per-rule tallies match the gopher flags; composite dominates each rule") {
    val out = Text.filterBudget(spark, Sf).collect()
      .map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("n_docs_failing"), r.getAs[Long]("tokens_removed"))).toMap
    val g = Text.gopherRules(spark, Sf).collect()
    def tally(pred: org.apache.spark.sql.Row => Boolean) =
      (g.count(pred).toLong, g.filter(pred).map(_.getAs[Long]("n_words")).sum)
    assert(out("word_count") === tally(r => !r.getAs[Boolean]("r_word_count")))
    assert(out("mean_word_len") === tally(r => !r.getAs[Boolean]("r_mean_word_len")))
    assert(out("alpha_ratio") === tally(r => !r.getAs[Boolean]("r_alpha_ratio")))
    assert(out("stopwords") === tally(r => !r.getAs[Boolean]("r_stopwords")))
    assert(out("composite") === tally(r => !r.getAs[Boolean]("keep")))
    // the composite fails at least as much as any single rule
    val (cd, ct) = out("composite")
    out.filterKeys(_ != "composite").values.foreach { case (d, t) =>
      assert(d <= cd && t <= ct)
    }
  }

  test("vocabCoverage: monotone in k, consistent with sorted frequencies, total at |vocab|") {
    val out = Text.vocabCoverage(spark, Sf, Seq(5, 10, 20, 50)).collect()
      .sortBy(_.getAs[Int]("k"))
    val freq = graft.util.Tables.t(spark, Sf, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").collect().map(_.getAs[String]("t"))
      .groupBy(identity).map { case (t, v) => (t, v.size.toLong) }
      .toSeq.sortBy { case (t, c) => (-c, t) }
    val total = freq.map(_._2).sum.toDouble
    out.foreach { r =>
      val used = r.getAs[Long]("vocab_used")
      assert(used === math.min(r.getAs[Int]("k").toLong, freq.size.toLong))
      val exp = freq.take(used.toInt).map(_._2).sum / total
      assert(math.abs(r.getAs[Double]("coverage") - exp) < 1e-3, s"k=${r.getAs[Int]("k")}")
    }
    val cov = out.map(_.getAs[Double]("coverage"))
    cov.sliding(2).foreach { case Array(a, b) => assert(b >= a - 1e-9); case _ => }
    if (out.last.getAs[Long]("vocab_used") === freq.size.toLong)
      assert(math.abs(cov.last - 1.0) < 1e-9)
  }
}
