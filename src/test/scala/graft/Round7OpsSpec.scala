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
}
