package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, Text}

/** Near-dup + similarity tier: the no-oracle operators get their semantics
  * pinned here instead (SURVEY §2.3 — minhash is the one op the oracle
  * can't express).
  */
class DedupSimilaritySpec extends SparkSpec {

  private def docsOf(texts: (Long, String)*) = {
    import spark.implicits._
    texts.toSeq.toDF("doc_id", "text")
  }

  test("minhash: identical shingle sets get identical signatures") {
    val d = docsOf(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy dog today", // exact dup
      3L -> "completely different words about spark query engines here now")
    val sigs = Dedup.minhashSignatures(d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
  }

  test("fused minhash_sig expression is bit-identical to the exploded agg formulation") {
    val docs = graft.util.Tables.t(spark, Sf, "documents")
    val fused = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val exploded = Dedup.minhashSignaturesExploded(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fused.keySet === exploded.keySet,
      "short-doc exclusion must match the exploded path's absent rows")
    fused.foreach { case (id, sig) =>
      assert(sig === exploded(id), s"signature mismatch for doc $id")
    }
    // and the fused path must plan with no exchange before banding
    val p = Dedup.minhashSignatures(docs).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"signature generation must not shuffle:\n$p")
  }

  test("typed MinHashAggregator matches the expression-based signatures") {
    import spark.implicits._
    val docs = graft.util.Tables.t(spark, Sf, "documents").limit(50)
    val exprSigs = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agg = new graft.functions.MinHashAggregator(Dedup.NumHashes).toColumn
    val typedSigs = Text.shingleRows(docs).as[(Long, String)]
      .groupByKey(_._1)
      .mapValues(_._2.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .agg(agg.name("sig"))
      .collect().toMap
    assert(typedSigs.keySet === exprSigs.keySet)
    typedSigs.foreach { case (id, sig) =>
      assert(sig === exprSigs(id), s"signature mismatch for doc $id")
    }
  }

  test("minhash LSH surfaces the known near-dup pairs in testdata") {
    val top = Dedup.minhashPairs(spark, Sf, 20).collect()
    assert(top.nonEmpty)
    // jaccard estimates are valid probabilities, descending
    val ests = top.map(_.getAs[Double]("jaccard_est"))
    assert(ests.forall(e => e >= 0.0 && e <= 1.0))
    assert(ests.sameElements(ests.sorted(Ordering[Double].reverse)))
  }

  test("hot-bucket cap: 1k identical docs yield linear anchor-linked candidates") {
    import spark.implicits._
    // the 100 TB failure mode in miniature: a mass-duplicate cluster whose
    // every LSH bucket holds all 1000 docs. Uncapped all-pairs would emit
    // 499,500 candidates; the cap's star linking emits n-1 through the
    // min-id anchor — and the cluster stays connected for downstream dedup.
    val d = (0L until 1000L)
      .map(i => (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairsFor(d, 5000).collect()
    assert(pairs.length === 999)
    assert(pairs.forall(_.getAs[Long]("doc_a") == 0L))
    assert(pairs.forall(_.getAs[Double]("jaccard_est") == 1.0))
  }

  test("connected components: a long chain collapses to its min label") {
    import spark.implicits._
    // diameter-9 chain forces multiple rounds (pointer jumping shortcuts
    // them); the isolated pair must keep its own component
    val pairs = ((1L to 9L).map(i => (i, i + 1)) :+ (20L, 21L)).toDF("doc_a", "doc_b")
    val cc = graft.operators.Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 10L).foreach(n => assert(cc(n) === 1L, s"node $n"))
    assert(cc(20L) === 20L && cc(21L) === 20L)
  }

  test("doc dedup components: full-corpus canonical assignment, minima as labels") {
    val docs = graft.util.Tables.t(spark, Sf, "documents")
    val r = SparkEntry.queries("q_doc_dedup_components")(spark, Sf).collect()
    assert(r.length === docs.count()) // every document gets an assignment
    r.foreach { row =>
      assert(row.getLong(1) <= row.getLong(0), "component id must be the min member")
      assert(row.getBoolean(2) === (row.getLong(0) == row.getLong(1)))
    }
    // the known shuffled-word near-dups must collapse: some non-canonical rows
    assert(r.exists(!_.getBoolean(2)), "expected at least one non-singleton cluster")
  }

  test("embedding near-dup assignment covers the corpus; no false merges") {
    val emb = graft.util.Tables.t(spark, Sf, "embeddings")
    val r = SparkEntry.queries("q_doc_dedup_embed")(spark, Sf).collect()
    assert(r.length === emb.count())
    r.foreach { row =>
      assert(row.getLong(1) <= row.getLong(0))
      assert(row.getBoolean(2) === (row.getLong(0) == row.getLong(1)))
    }
    // this corpus has no vector pairs above cosine 0.95 (max ≈ 0.51), so a
    // correct clustering must produce only singletons — anything else is a
    // false merge
    assert(r.forall(_.getBoolean(2)))
  }

  test("simhash: exact duplicates at hamming 0, unrelated text far away") {
    val d = docsOf(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "one two three four five six seven eight nine ten")
    val sigs = Dedup.simhashSignatures(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 8)
  }

  test("cosine top-k: self-similarity is 1, results sorted, k respected") {
    import spark.implicits._
    // identical vector content at another id must rank at similarity 1.0
    val r = Similarity.cosineTopK(spark, Sf, 10).collect()
    assert(r.length === 10)
    val sims = r.map(_.getAs[Double]("cos_sim"))
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    assert(sims.sameElements(sims.sorted(Ordering[Double].reverse)))
    // dot/norm primitives: cos(v, v) == 1
    val v = Seq((1L, Seq(1.0f, 2.0f, 2.0f))).toDF("id", "v")
    val cos = v.select((Similarity.dot(col("v"), col("v")) /
      (Similarity.norm(col("v")) * Similarity.norm(col("v")))).as("c")).head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
  }

  test("ANN-LSH pairs are a subset of truth: exact cosine agrees on re-rank") {
    val pairs = Similarity.annLshPairs(spark, Sf, 20).collect()
    assert(pairs.nonEmpty)
    val sims = pairs.map(_.getAs[Double]("cos_sim"))
    assert(sims.sameElements(sims.sorted(Ordering[Double].reverse)))
  }

  test("IVF top-k recalls most of the exact brute-force top-k") {
    val exact = Similarity.cosineTopK(spark, Sf, 10).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val ivf = graft.operators.Ivf.ivfTopK(spark, Sf, 10, 16, 8).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    info(f"IVF recall@10 = $recall%.2f (nprobe=8/16 lists)")
    assert(recall >= 0.5, s"recall $recall too low; exact=$exact ivf=$ivf")
    // IVF results are true cosine values: every returned pair is in the
    // probed lists, so each sim must equal the exact sim for that vec
    val exactSims = Similarity.cosineTopK(spark, Sf, 500).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim")).toMap
    graft.operators.Ivf.ivfTopK(spark, Sf, 10, 16, 8).collect().foreach { r =>
      assert(exactSims(r.getAs[Long]("vec_id")) === r.getAs[Double]("cos_sim"))
    }
  }

  test("exact dedup collapses normalized duplicates to lowest doc_id") {
    import spark.implicits._
    // unit-level check through the same md5-grouping the query uses
    val d = Seq((5L, "Hello  World"), (9L, "hello world"), (7L, "other text"))
      .toDF("doc_id", "text")
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    val grouped = d.select(col("doc_id"), md5(norm).as("k"))
      .groupBy("k").agg(min("doc_id").as("canonical"), count(lit(1)).as("n"))
    val dup = grouped.filter(col("n") === 2).head()
    assert(dup.getAs[Long]("canonical") === 5L)
  }

  test("ngram jaccard: known near-dups score 1.0, output deterministic") {
    val r1 = Text.ngramJaccard(spark, Sf).collect()
    val r2 = Text.ngramJaccard(spark, Sf).collect()
    assert(r1.toSeq === r2.toSeq)
    assert(r1.nonEmpty && r1.head.getAs[Double]("jaccard") <= 1.0)
  }
}
