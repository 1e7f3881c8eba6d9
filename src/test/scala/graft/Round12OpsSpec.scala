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
