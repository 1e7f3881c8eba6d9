package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Insights, Ivf, Similarity}

/** Round-8 additions: convergence-detected fixpoint graph ops (differential
  * vs the bounded oracle-gated queries and vs sequential driver folds),
  * production↔gated differentials for the simhash / hyperplane-LSH hash
  * families (production candidate machinery over the gated portable
  * signatures must equal the gated twin — so the production op's unverified
  * surface is exactly its hash kernel), and the hierarchical coarse→fine
  * IVF assignment's invariants.
  */
class Round8OpsSpec extends SparkSpec {

  private def coPurchaseEdges() = {
    val items = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    items.as("a")
      .join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
  }

  test("kcoreFixpoint: equals the sequential peel run to convergence, and is stable") {
    val e = coPurchaseEdges().select(col("src"), col("dst"))
    // same data-derived k as the bounded query
    val degs0 = e.groupBy(col("src")).agg(count(lit(1)).as("dg"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k = degs0.values.sum * 3 / (degs0.size * 4)

    val got = Insights.kcoreFixpoint(e, k).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("deg")).toMap

    // sequential driver fold to convergence
    var edges = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    var changed = true
    while (changed) {
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val next = edges.filter { case (a, b) => keep(a) && keep(b) }
      changed = next.size != edges.size
      edges = next
    }
    val expect = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(got === expect)
    // fixpoint property: every surviving node has degree >= k
    assert(got.values.forall(_ >= k))
    // and the bounded 3-round query is an OVER-approximation (supersets the
    // true core) — the fixpoint peels at least as far
    assert(got.keySet.subsetOf(expect.keySet))
  }

  test("spFixpoint: exact distances on a graph deeper than the bounded round count") {
    import spark.implicits._
    // a 10-hop chain with a costly shortcut: frontier expansion bounded at
    // SpRounds=4 cannot reach the tail; the fixpoint must (and must prefer
    // the cheap long path over the expensive shortcut)
    val raw = ((1L to 10L).map(i => (i, i + 1, 1L)) :+ (1L, 11L, 100L))
    val e = raw.flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
      .toDF("src", "dst", "cost")
    val got = Insights.spFixpoint(e, srcNode = 1L).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    val expect = (1L to 11L).map(i => i -> (i - 1)).toMap // chain distance
    assert(got === expect, "node 11 must be reached at cost 10 via the chain, not 100 via the shortcut")

    // differential vs the bounded frontier formulation: at rounds >= the
    // convergence depth the bounded min-plus fold agrees exactly
    def boundedFrontier(rounds: Int): Map[Long, Long] = {
      def expand(f: org.apache.spark.sql.DataFrame) =
        e.join(f, col("src") === col("node"))
          .groupBy(col("dst").as("n"))
          .agg(min(col("dist") + col("cost")).as("d"))
          .select(col("n").as("node"), col("d").as("dist"))
      val f0 = Seq((1L, 0L)).toDF("node", "dist")
      val frontiers = Iterator.iterate(f0)(expand).take(rounds + 1).toSeq
      frontiers.reduce(_ union _).groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(boundedFrontier(10) === got)
    val bounded4 = boundedFrontier(4)
    assert(bounded4.size < got.size, "4 bounded rounds must NOT cover the 10-hop chain")
    // wherever the bounded pass reached, the fixpoint is never worse
    bounded4.foreach { case (n, d) => assert(got(n) <= d) }
  }

  test("spFixpoint on the co-purchase graph: matches the bounded query where converged") {
    val e = coPurchaseEdges()
      .select(col("src"), col("dst"),
        (lit(1L) + expr("1000 div (w + 1)")).as("cost"))
    val srcNode = e.agg(min(col("src"))).head().getLong(0)
    val fixed = Insights.spFixpoint(e, srcNode).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    val bounded = SparkEntry.queries("q_shortest_path")(spark, Sf).collect()
      .map(r => r.getAs[Long]("part_id") -> r.getAs[Long]("dist_fp")).toMap
    // the bounded 4-round walk can only over-estimate or miss nodes
    bounded.foreach { case (n, d) => assert(fixed(n) <= d) }
    assert(bounded.keySet.subsetOf(fixed.keySet))
  }

  test("simhash differential: production machinery over md5-48 sigs ≡ gated twin") {
    val docs = graft.util.Tables.t(spark, Sf, "documents")
      .filter(col("doc_id") < 50)
    val sigs = Dedup.simhashGatedSigs(docs)
    // the hot-bucket cap must not bind on this corpus, else the plain-join
    // twin and the capped production path legitimately differ
    val chunked = sigs.select(col("doc_id"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("sig"), c * 12).bitwiseAND(lit(0xFFFL))): _*))
        .as(Seq("chunk_id", "chunk")))
    val maxBucket = chunked.groupBy(col("chunk_id"), col("chunk"))
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).head().getLong(0)
    assert(maxBucket <= Dedup.HotBucketCap, s"cap binds at $maxBucket; shrink the corpus")

    val prod = Dedup.simhashPairsFromSigs(sigs, chunkBits = 12, k = 100000).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
                 r.getAs[Number]("hamming").longValue)).toSet
    val gated = Dedup.simhashGatedPairs(spark, Sf, 100000)
    // restrict the full-corpus gated twin to the 50-doc window
    val gatedSet = gated.collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
                 r.getAs[Number]("hamming").longValue))
      .filter { case (a, b, _) => a < 50 && b < 50 }.toSet
    assert(prod === gatedSet,
      "production chunk/candidate/Hamming path must equal the gated pair algebra modulo hash")
    assert(prod.nonEmpty, "differential is vacuous on an empty pair set")
  }

  test("LSH differential: production candidate machinery over md5 planes ≡ gated twin") {
    val emb = graft.util.Tables.t(spark, Sf, "embeddings")
      .filter(col("vec_id") < 50)
    val banded = Similarity.lshGatedBanded(spark, emb)
    val maxBucket = banded.groupBy(col("band_id"), col("bucket"))
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).head().getLong(0)
    assert(maxBucket <= Dedup.HotBucketCap, s"cap binds at $maxBucket; shrink the corpus")

    val prod = Similarity.lshCandidateRerank(banded).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
                 r.getAs[Double]("cos_sim"))).toSet
    val gated = Similarity.annLshGatedPairsFor(spark, emb, 100000).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
                 r.getAs[Double]("cos_sim"))).toSet
    assert(prod === gated,
      "production banding/candidates/re-rank must equal the gated pair algebra modulo plane hash")
    assert(prod.nonEmpty, "differential is vacuous on an empty pair set")
  }

  test("semantic dedup hier: corpus coverage, keep-lowest-id, threshold honored") {
    val emb = graft.util.Tables.t(spark, Sf, "embeddings")
    val r = SparkEntry.queries("q_semantic_dedup_hier")(spark, Sf).collect()
    assert(r.length === emb.count())
    r.foreach { row =>
      val id = row.getAs[Long]("vec_id")
      if (row.getAs[Boolean]("is_dup")) {
        assert(row.getAs[Long]("dup_of") < id, "duplicates point at a lower id")
        assert(row.getAs[Long]("min_d2") <= 130000000L)
      } else {
        assert(row.isNullAt(row.fieldIndex("dup_of")))
      }
    }
    // the routing approximation changes CELLS, not the keep-lowest-id
    // algebra: within the hier output, every flagged doc's dup_of shares
    // its cluster (construction invariant, re-checked end-to-end)
    val byId = r.map(x => x.getAs[Long]("vec_id") -> x.getAs[Long]("cluster_id")).toMap
    r.filter(_.getAs[Boolean]("is_dup")).foreach { row =>
      assert(byId(row.getAs[Long]("dup_of")) === row.getAs[Long]("cluster_id"))
    }
  }

  test("production hier assignment: nCoarse=1 routing is EXACTLY the flat argmax") {
    val spark0 = spark
    graft.functions.GraftFunctions.register(spark0)
    val emb = graft.util.Tables.t(spark, Sf, "embeddings")
    val fine = Ivf.trainCentroids(spark0, emb, 16)
    val flat = Ivf.assignLists(emb, fine).select("vec_id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hier1 = Ivf.assignListsHier(emb, fine, nCoarse = 1)
      .select("vec_id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hier1 === flat, "one coarse group holds every fine centroid → routing exact")
    // and a real two-level split still assigns every vector to a live cell
    val hier4 = Ivf.assignListsHier(emb, fine, nCoarse = 4)
      .select("vec_id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hier4.keySet === flat.keySet)
    val agree = hier4.count { case (v, c) => flat(v) == c }
    info(f"hier(4) agrees with flat on ${agree * 100.0 / flat.size}%.1f%% of vectors")
    assert(agree.toDouble / flat.size >= 0.7,
      "coarse routing must agree with flat assignment on most vectors")
  }

  test("hier assignment cost shape: coarse+fine kernel calls, not flat nLists") {
    // plan-level sanity: the hierarchical assignment folds BOTH levels into
    // one broadcast row — no per-vector join against the fine table, no
    // corpus shuffle before the cell self-join
    val df = graft.operators.Ivf.semanticDedupHier(spark, Sf, 4, 4, 130000000L)
    val plan = df.queryExecution.optimizedPlan.toString
    // the corpus-side assignment must not shuffle the embeddings table on a
    // join key before cells exist: the only non-broadcast exchanges belong
    // to the fit (bounded sample) and the within-cell pair join
    assert(plan.contains("sq_l2"), "integer-L2 kernel must drive the assignment")
  }
}
