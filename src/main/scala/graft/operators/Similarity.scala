package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Two tiers, per the LLM-pipeline north star:
  *  - brute-force cosine top-k (exact baseline; embarrassingly parallel —
  *    a broadcast probe against a fully partitioned corpus, TakeOrdered
  *    top-k so only k rows per partition reach the driver);
  *  - random-hyperplane LSH ANN (the 100 TB path: candidates meet only
  *    inside signature buckets, exact cosine re-rank on candidates).
  */
object Similarity {

  /** Double-precision dot product of two float-array columns via
    * zip_with + aggregate — sequential fold in index order, deterministic,
    * fully codegen-friendly (no UDF).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
                   lit(0.0), (acc, v) => acc + v))

  /** Exact cosine top-k neighbors of probe vector vec_id=0. The probe is a
    * one-row broadcast — no shuffle of the corpus at any scale; top-k plans
    * as TakeOrderedAndProject.
    */
  def cosineTopK(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val emb = t(spark, sfDir, "embeddings")
    // limit(1) states the point-lookup bound in the PLAN (vec_id is unique,
    // so it drops nothing) — the broadcast hint below is legal because the
    // hinted subtree is provably ≤1 row at any corpus scale
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe_emb")).limit(1)
    // native codegen kernel (graft.functions.CosineSimilarity): bit-identical
    // to the zip_with/aggregate formulation, ~3× faster (VectorFunctionsSpec)
    val cos = call_function("cosine_sim", col("embedding"), col("probe_emb"))
    emb.crossJoin(broadcast(probe))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), r4(cos).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Batched exact cosine top-k: every probe in a SMALL probe set (here the
    * vec_id < nProbes vectors — stand-in for a query batch) gets its k
    * nearest corpus neighbors. The realistic serving/eval shape: probe
    * batches are bounded (requests, eval suites), so the batch broadcasts
    * and the corpus streams through ONE scan scoring all probes per row —
    * corpus-side work is O(n·|batch|) flops with zero corpus shuffle.
    * Per-probe top-k via the two-phase [[graft.util.TopK]] (local k per
    * partition, merge survivors) — never a global per-probe sort.
    *
    * Ranking uses the ROUNDED score with vec_id tiebreak so the order is a
    * total one computed identically by the oracle — raw-double ranking
    * would make the k-th slot depend on sub-1e-4 accumulation noise.
    */
  def cosineTopKBatch(spark: SparkSession, sfDir: String,
                      nProbes: Int = 8, k: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val emb = t(spark, sfDir, "embeddings")
    // limit(nProbes) = the batch bound, in the plan (vec_id unique ⇒ the
    // filter already yields ≤ nProbes rows; the limit just makes the
    // broadcast hint's legality assertable)
    val probes = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
      .limit(nProbes)
    val scored = emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
              r4(call_function("cosine_sim", col("embedding"), col("probe_emb")))
                .as("cos_sim"))
    ordered(
      graft.util.TopK.perGroup(scored, Seq(col("probe_id")),
          Seq(col("cos_sim").desc, col("vec_id").asc), k)
        .select(col("probe_id"), col("vec_id"), col("cos_sim"),
                col("rn").cast("long").as("rk")),
      "probe_id", "rk")
  }

  /** kNN classification on top of [[cosineTopKBatch]]: each probe takes the
    * majority label among its k nearest neighbors (ties → smallest label,
    * pinned via max_by struct ordering — no window). The end-to-end "what
    * is ANN for" query: neighbor search + a per-probe hash aggregate whose
    * vote table is k·|batch| rows — driver-scale regardless of corpus size.
    */
  def knnClassify(spark: SparkSession, sfDir: String,
                  nProbes: Int = 8, k: Int = 5): DataFrame = {
    val emb = t(spark, sfDir, "embeddings").select(col("vec_id"), col("label"))
    val votes = cosineTopKBatch(spark, sfDir, nProbes, k)
      .join(emb, "vec_id")
      .groupBy(col("probe_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val picked = votes.groupBy(col("probe_id"))
      .agg(max_by(struct(col("label").as("predicted"), col("votes")),
                  struct(col("votes"), -col("label"))).as("p"))
      .select(col("probe_id"), col("p.predicted").as("predicted"),
              col("p.votes").as("votes"))
    ordered(
      picked.join(emb.select(col("vec_id").as("probe_id"),
                             col("label").as("true_label")), "probe_id"),
      "probe_id")
  }

  /** Per-vector L2 norms — the normalization pass before cosine-metric
    * indexing (normalized corpus ⇒ cosine ≡ dot, so ANN structures store
    * unit vectors). Pure codegen scan via the native dot kernel
    * (norm = √⟨v,v⟩), zero shuffle; oracled against DuckDB's sequential
    * list fold, proving the kernel's accumulation order is portable.
    */
  def embedNorms(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    ordered(
      t(spark, sfDir, "embeddings")
        .select(col("vec_id"),
                r4(sqrt(call_function("dot_f", col("embedding"), col("embedding"))))
                  .as("l2_norm")),
      "vec_id")
  }

  /** Per-dimension embedding health report — dead dims, dominant dims,
    * variance concentration: the pre-indexing check every vector corpus
    * needs (a dead dimension wastes index bits; one dominant dimension
    * makes cosine ≈ that dim's sign). Fixed-point quantized values
    * (×1000, the embed_outliers basis) make every moment exact: per dim,
    * mean = S/n, variance = (n·S2 − S²)/n², plus each dim's share of
    * total variance (ratio of exact DECIMAL sums). One explode +
    * dim-keyed hash-agg — output is DIMENSION-bounded at any corpus
    * size.
    */
  def embedDimVar(spark: SparkSession, sfDir: String): DataFrame = {
    val d190 = "decimal(19,0)"
    val ex = t(spark, sfDir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("pos").cast("long").as("dim_idx"),
              floor(col("x").cast("double") * 1000.0 + 0.5).cast("long").as("q"))
    val per = ex.groupBy(col("dim_idx"))
      .agg(count(lit(1)).as("n"),
           sum(col("q").cast("decimal(38,0)")).as("s"),
           sum((col("q").cast(d190) * col("q").cast(d190)).cast("decimal(38,0)")).as("s2"))
      .withColumn("varq",
        expr("""(cast(n as double) * cast(s2 as double)
               | - cast(s as double) * cast(s as double))
               |/ (cast(n as double) * cast(n as double))"""
          .stripMargin.replace("\n", " ")))
    val tot = per.agg(sum(col("varq").cast("decimal(28,8)")).as("tv"))
    ordered(
      per.crossJoin(broadcast(tot))
        .select(col("dim_idx"),
                r4(expr("cast(s as double) / cast(n as double) / 1000.0")).as("mean"),
                r4(expr("varq / 1000000.0")).as("variance"),
                r4(expr("varq / cast(tv as double)")).as("var_share")),
      "dim_idx")
  }

  /** Deterministic sampled-pair cosine histogram — the similarity-scale
    * calibration every embedding-dedup threshold choice needs ("what does
    * cosine 0.8 MEAN in this corpus"): pair vector i with vectors i+1,
    * i+17, i+257 (fixed strides — reproducible across runs/engines, no
    * RNG state; three strides decorrelate any id-order structure), score
    * each pair by exact-integer quantized cosine (see inline comment),
    * bucket the ROUNDED score into 0.1-wide bins (bin = ⌊10·cos⌋+10 ∈
    * 0..20, computed from the r4 value so both engines bin identically).
    * Corpus-linear: the stride join is 3 hash-joins on vec_id, no
    * quadratic pair set.
    */
  def cosSimHist(spark: SparkSession, sfDir: String,
                 offsets: Seq[Int] = Seq(1, 17, 257)): DataFrame = {
    import spark.implicits._
    // components quantized to int64 fixed point (·10⁶ — components are
    // ~|0.35| so q ≤ ~4·10⁵, q² ≤ 1.6·10¹¹, 64-dim sums ≤ ~10¹³, no
    // overflow) so dp and the squared norms are EXACT integer sums on both
    // engines: a plain double sum(av·bv) has engine-specific summation
    // order, and a cosine within float-noise of an r4 rounding boundary
    // could flip its 0.1-wide bin — the order-dependent-double-sum class
    // the suite eliminates everywhere else (the embed_outliers basis).
    // sqrt/division over exact integer inputs are IEEE-deterministic.
    val q = transform(col("embedding"),
                      v => floor(v.cast("double") * 1000000.0 + 0.5).cast("long"))
    val e = t(spark, sfDir, "embeddings").select(col("vec_id"), q.as("qv"))
    val ofs = offsets.toDF("ofs")
    val pairs = e.crossJoin(broadcast(ofs))
      .select(col("ofs"), (col("vec_id") + col("ofs")).as("b_id"),
              col("qv").as("qa"))
      .join(e.select(col("vec_id").as("b_id"), col("qv").as("qb")), "b_id")
    def isum(c: Column): Column =
      aggregate(c, lit(0L), (acc, x) => acc + x)
    val dp = isum(zip_with(col("qa"), col("qb"), (x, y) => x * y))
    val na2 = isum(transform(col("qa"), x => x * x))
    val nb2 = isum(transform(col("qb"), x => x * x))
    val cos = r4(dp.cast("double") /
                 (sqrt(na2.cast("double")) * sqrt(nb2.cast("double"))))
    ordered(
      pairs.select(col("ofs").cast("long").as("ofs"),
                   floor(cos * 10.0 + 10.0).cast("long").as("bin"))
        .groupBy(col("ofs"), col("bin"))
        .agg(count(lit(1)).as("n")),
      "ofs", "bin")
  }

  /** ANN via random-hyperplane LSH: 32 sign-projections → 4 bands of 8 bits;
    * vectors sharing any (band, 8-bit bucket) become candidates; candidates
    * are re-ranked by exact cosine. Output: top-k pairs over the
    * hot-bucket-capped candidate set (see Dedup.minhashPairs for the cap
    * contract). No-oracle (not ANSI-SQL-expressible); the spec checks
    * ordering/recall against brute force.
    */
  def annLshPairs(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame =
    lshScoredPairs(spark, t(spark, sfDir, "embeddings"))
      .orderBy(col("cos_sim").desc, col("vec_a").asc, col("vec_b").asc)
      .limit(k)

  /** Full scored candidate stream (no order/limit): hyperplane-LSH bucketed
    * pairs re-ranked by exact cosine — shared by the top-k query and the
    * embedding near-dup clustering.
    */
  def lshScoredPairs(spark: SparkSession, emb: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // all 32 sign bits + 4 band buckets in ONE pass over each vector
    // (graft.functions.HyperplaneBands) — the 32-separate-dot_f-projections
    // formulation it replaces made 32 passes and 32 optimizer columns
    val banded = emb.select(
      col("vec_id"), col("embedding"),
      posexplode(call_function("hyperplane_bands", col("embedding")))
        .as(Seq("band_id", "bucket")))
    lshCandidateRerank(banded)
  }

  /** The production candidate machinery downstream of banding — hot-bucket-
    * capped candidates ([[Dedup.bucketCandidates]]: degenerate corpora
    * with many identical vectors stay O(n), not n²) re-ranked by exact
    * cosine. Factored so the SAME code path can run over the gated twin's
    * md5-plane banding in the differential spec: production ≡ gated modulo
    * the plane hash, which shrinks the production op's unverified surface
    * to exactly the hyperplane source ([[annLshGatedPairs]] scaladoc).
    */
  def lshCandidateRerank(banded: DataFrame): DataFrame = {
    val cand = Dedup.bucketCandidates(banded, Seq("band_id", "bucket"),
                                      "vec_id", Seq("embedding"))
    val cos = call_function("cosine_sim", col("embedding_a"), col("embedding_b"))
    cand.select(col("vec_id_a").as("vec_a"), col("vec_id_b").as("vec_b"), r4(cos).as("cos_sim"))
  }

  /** Hyperplane-LSH pair search under the EXACT hash gate — the gated twin
    * of [[annLshPairs]], shrinking the production op's unverified surface
    * to exactly its hyperplane source. Two swaps make the full path
    * portable: (1) hyperplane components are ±1 derived from the md5 hex
    * prefix of "p_d" (computed ONCE on the driver here, by `md5()` in the
    * oracle — same function, same bytes), so both engines use the
    * identical planes; (2) projections run on fixed-point quantized
    * components (floor(v·10⁴+0.5) longs — the embedCentroid discipline),
    * so the 32 dot products are INTEGER sums: associative, any partial-agg
    * tree or fold order yields the same sign bit, and the bucket layout
    * matches bit-for-bit. Signature+banding is one map pass (32
    * aggregate-HOF dots per row, no explode before the band shuffle);
    * candidate pairs re-rank by exact cosine like the production op.
    * ±1 hyperplanes are a standard random-projection family (signs of a
    * Rademacher matrix), so the gated twin exercises real LSH geometry,
    * not a toy.
    */
  def annLshGatedPairs(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame =
    annLshGatedPairsFor(spark, t(spark, sfDir, "embeddings"), k)

  /** The md5-plane integer-projection banding stage of the gated LSH twin,
    * exposed (a) for [[annLshGatedPairsFor]] and (b) for the differential
    * spec that runs the PRODUCTION candidate machinery
    * ([[lshCandidateRerank]]) over this banding — proving production ≡
    * gated modulo the plane hash on a corpus where the hot-bucket cap
    * doesn't bind. Output: (vec_id, embedding, band_id, bucket).
    */
  def lshGatedBanded(spark: SparkSession, emb: DataFrame): DataFrame = {
    val P = 32; val BandBits = 8; val NBands = P / BandBits
    val MaxDim = 128
    def signs(p: Int): Seq[Long] = (1 to MaxDim).map { d =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${p}_${d}".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex.substring(0, 12), 16) % 2 == 1) 1L else -1L
    }
    // native codegen dot kernel (r15, guide §1.2 per-task work): the
    // aggregate(zip_with(...)) form dispatched an interpreted closure per
    // element — 32 planes × 64 dims per row; DotProductLong computes the
    // identical exact integer sum in one codegen'd loop
    def dot(p: Int): Column =
      call_function("dot_q", col("qv"),
                    slice(typedLit(signs(p)), lit(1), size(col("qv"))))
    def bandHash(b: Int): Column =
      (0 until BandBits).map(j =>
        when(dot(b * BandBits + j) > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _)
    graft.functions.GraftFunctions.register(spark)
    emb
      .withColumn("qv", transform(col("embedding"),
        x => floor(x.cast("double") * lit(10000.0) + lit(0.5)).cast("long")))
      .select(col("vec_id"), col("embedding"),
        posexplode(array((0 until NBands).map(bandHash): _*))
          .as(Seq("band_id", "bucket")))
  }

  /** [[annLshGatedPairs]] over an arbitrary embedding frame. */
  def annLshGatedPairsFor(spark: SparkSession, emb: DataFrame, k: Int): DataFrame = {
    // persisted (r15): both self-join sides reference the banding, whose
    // 32-projection signature pass is the expensive stage — unpersisted,
    // it ran twice (the Dedup.bucketCandidates persist rationale applied
    // to the gated twin). Self-persisted class; harness callers
    // clearCache() between queries.
    val banded = lshGatedBanded(spark, emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = banded.select(col("band_id"), col("bucket"),
      col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = banded.select(col("band_id"), col("bucket"),
      col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    a.join(b, Seq("band_id", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_emb"), col("b_emb"))
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"),
        r4(call_function("cosine_sim", col("a_emb"), col("b_emb"))).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("a_id").asc, col("b_id").asc)
      .limit(k)
  }

  /** Per-label mean embedding (the k-means M-step / class-prototype
    * computation) as a GATED query: posexplode the vectors to
    * (label, pos, val) and aggregate per (label, dimension). Cross-row
    * float sums are partition-order dependent in IEEE arithmetic, so the
    * values are first quantized to exact fixed-point longs
    * (floor(val·10⁴ + 0.5) — same portable rounding as r4) and summed as
    * integers: the aggregation is associative, any partial-agg tree yields
    * the identical centroid, and DuckDB's sequential fold hash-matches a
    * 32-way parallel one. One explode + one hash aggregate; the shuffle
    * carries (label, pos, partial sum) — 64·|labels| accumulators total,
    * independent of corpus size.
    */
  def embedCentroid(spark: SparkSession, sfDir: String): DataFrame = {
    val exploded = t(spark, sfDir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "val")))
      .select(col("label"), col("pos").cast("long").as("pos"),
              floor(col("val").cast("double") * lit(10000.0) + lit(0.5))
                .cast("long").as("q"))
    ordered(
      exploded.groupBy(col("label"), col("pos"))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"))
        .select(col("label"), col("pos"), col("n"),
                r4(col("sq").cast("double") / lit(10000.0) / col("n").cast("double"))
                  .as("centroid_val")),
      "label", "pos")
  }

  /** Embedding-cosine near-duplicate canonical assignment: LSH-bucketed
    * candidates at exact cosine ≥ minCos, clustered via connected
    * components, joined back to the FULL corpus — every vector reports its
    * canonical (min-id) representative, singletons map to themselves. The
    * embedding twin of Dedup.dedupComponents, same output contract.
    */
  def dedupEmbed(spark: SparkSession, sfDir: String,
                 minCos: Double = 0.95): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val pairs = lshScoredPairs(spark, emb).filter(col("cos_sim") >= minCos)
    Dedup.canonicalAssignment(emb, "vec_id",
      Dedup.connectedComponents(pairs, "vec_a", "vec_b"))
  }

  /** Symmetric int8 quantization per embedding — the 4× memory compression
    * every billion-vector ANN index applies before sharding. Per vector:
    * scale = max |xᵢ| (order-free max of exactly-widened floats), qᵢ =
    * floor(xᵢ/scale·127 + 0.5) — one mirrored IEEE chain per element inside
    * a codegen'd array HOF, zero shuffle. The gated output is the quantized
    * payload's integer checksum and nnz (exact, associative), plus the
    * scale — enough for the oracle to prove every qᵢ without shipping 64
    * columns.
    */
  def embedQuantize(spark: SparkSession, sfDir: String): DataFrame = {
    val xd = transform(col("embedding"), x => abs(x.cast("double")))
    val scale = array_max(xd)
    val qArr = transform(col("embedding"),
      x => floor(x.cast("double") / col("scale") * lit(127.0) + lit(0.5)).cast("long"))
    ordered(
      t(spark, sfDir, "embeddings")
        .withColumn("scale", scale)
        .filter(col("scale") > 0)
        .withColumn("q", qArr)
        .select(col("vec_id"), r4(col("scale")).as("scale"),
                aggregate(col("q"), lit(0L), (a, b) => a + b).as("checksum"),
                size(filter(col("q"), v => v =!= 0L)).cast("long").as("nnz")),
      "vec_id")
  }

  /** Rounds of power iteration in [[embedPcaPower]]; fixed so the plan is
    * static and the oracle can unroll the same fold.
    */
  val PcaRounds = 3

  /** Top principal component of the embedding corpus by POWER ITERATION
    * over the exact integer covariance matrix — the embedding-geometry
    * diagnostic (anisotropy / dominant-direction check) a curation run
    * reads before whitening or indexing decisions. Exactness end to end:
    * components quantize to 1e-3 fixed point, centering multiplies
    * through by n (cx = n·q − S, integer — the q_pacf discipline, no
    * rational means), the D×D covariance is one DECIMAL(38,0) hash-agg
    * of cx products, and each matvec round is exact decimal arithmetic
    * with an L1 renormalization whose divisor is computed EXACTLY
    * (floor(L1/10⁶), max 1) and applied as sign·(abs div d) so Spark
    * `div` ≡ DuckDB `//` on the positive operand (signed loadings would
    * otherwise hit the floor-vs-truncate divide divergence).
    *
    * Scale shape: the covariance join fans each vector to D² product
    * rows — bounded by D²·n, shuffled as (i, j) digests to a 4096-row
    * frame; every round after that is matvec on D² × D rows. The L1
    * normalizer is collected per round (1 BigDecimal; lazy broadcast
    * normalizers double the lineage per round — the q_hits lesson — and
    * the divisor exceeds Long range at the 100× decade, so it splices
    * back as a DECIMAL literal). ScaleInfraSpec's iterative exemption
    * names this entry; rounds localCheckpoint and unpersist as they go.
    */
  def embedPcaPower(spark: SparkSession, sfDir: String): DataFrame = {
    // Covariance via a MAP-ONLY per-vector outer product (r15, guide §2.4):
    // the old element-grain self-join on vec_id shuffled the exploded
    // corpus twice (plus a per-pos stats exchange) to build the same D²·n
    // product rows this shape emits straight out of the scan — one corpus
    // pass, one broadcast of the 1-row (n, Σq per dim) stats aggregate,
    // zero pre-aggregate exchanges. Values are bit-identical: n·q − s per
    // element, the identical decimal products, the identical (i, j) sums.
    val dim = graft.operators.Ivf.EmbDim
    val qarr = t(spark, sfDir, "embeddings")
      .select(col("vec_id"),
              transform(col("embedding"),
                x => floor(x.cast("double") * lit(1000.0) + lit(0.5))
                  .cast("long")).as("q"))
    val aggs = count(lit(1)).as("n") +:
      (0 until dim).map(i => sum(col("q").getItem(i)).as(s"_s$i"))
    val st = qarr.agg(aggs.head, aggs.tail: _*)
      .select(col("n"), array((0 until dim).map(i => col(s"_s$i")): _*).as("s"))
    val cxa = qarr.crossJoin(broadcast(st))
      .select(col("vec_id"),
              zip_with(col("q"), col("s"), (q, s) => col("n") * q - s).as("cx"))
    val cov = cxa
      .select(posexplode(col("cx")).as(Seq("pi", "cxi")), col("cx"))
      .select(col("pi").cast("long").as("i"), col("cxi"),
              posexplode(col("cx")).as(Seq("pj", "cxj")))
      .select(col("i"), col("pj").cast("long").as("j"), col("cxi"), col("cxj"))
      .groupBy(col("i"), col("j"))
      .agg(sum((col("cxi").cast("decimal(19,0)") * col("cxj").cast("decimal(19,0)"))
        .cast("decimal(38,0)")).as("m"))
      .localCheckpoint(true)
    val dims = cov.select(col("i").as("j")).distinct()
      .localCheckpoint(true)
    val d0 = dims.count()
    // Rounds keep the eager checkpoint on the matvec aggregate only (the
    // L1 collect needs it materialized anyway); the normalized vector is a
    // lazy depth-1 projection over that checkpoint — the q_hits sparse-
    // round discipline, one eager job per round instead of two.
    var v = dims.select(col("j"), lit(1000000L / d0).as("v"))
    var prevMv: DataFrame = null
    for (_ <- 1 to PcaRounds) {
      val mv = cov.join(v, "j")
        .groupBy(col("i"))
        .agg(sum((col("m") * col("v")).cast("decimal(38,0)")).as("mv"))
        .localCheckpoint(true)
      if (prevMv != null) prevMv.unpersist()
      prevMv = mv
      val l1 = mv.agg(sum(abs(col("mv")))).head().getDecimal(0)
      val divisor = BigInt(l1.toBigInteger) / BigInt(1000000) max BigInt(1)
      v = mv.select(col("i").as("j"),
          expr(s"cast(sign(mv) as bigint) * " +
               s"(abs(mv) div cast('$divisor' as decimal(38,0)))").as("v"))
    }
    cov.unpersist()
    dims.unpersist()
    ordered(v.select(col("j").as("dim_idx"), col("v").as("loading_fp")), "dim_idx")
  }

  /** Embedding outlier screen — the "is this vector even from the same
    * distribution" gate an embedding pipeline runs before indexing: exact
    * squared distance of every vector from the corpus centroid, top-20.
    * Exactness without rational means: multiplying through by n makes the
    * per-element deviation cx = n·q − S an integer (the q_pacf
    * discipline), so n²·dist² = Σ cx² is one DECIMAL(38,0) per-vector
    * sum and the ranking is EXACT (no float tie ambiguity at the cut);
    * the reported distance divides the n² and quantization scales back
    * out as the single final double. One element-grain projection + one
    * vector-grain hash-agg + a 20-row TakeOrdered — embarrassingly
    * parallel at any corpus size.
    */
  def embedOutliers(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val ex = t(spark, sfDir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
              floor(col("x").cast("double") * lit(1000.0) + lit(0.5))
                .cast("long").as("q"))
    val st = ex.groupBy(col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"))
    ex.join(broadcast(st), "pos")
      .select(col("vec_id"), (col("n") * col("q") - col("s")).as("cx"),
              col("n"))
      .groupBy(col("vec_id"))
      .agg(sum((col("cx").cast("decimal(19,0)") * col("cx").cast("decimal(19,0)"))
        .cast("decimal(38,0)")).as("n2d2"),
           max(col("n")).as("n"))
      .select(col("vec_id"), col("n2d2"),
              r4(expr("cast(n2d2 as double) / cast(n as double) / cast(n as double)")
                 / lit(1000000.0)).as("dist_sq"))
      .orderBy(col("n2d2").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), col("dist_sq"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
    * the diversity-aware selection every RAG context builder runs after
    * retrieval: greedily pick k documents maximizing λ·relevance −
    * (1−λ)·max-similarity-to-already-picked, so near-duplicate top hits
    * don't crowd the context window. Relevance is the BM25 top-20's
    * r4 score; pairwise similarity is the exact-integer quantized cosine
    * over the docs' embeddings ([[cosSimHist]] discipline — portable).
    * The k−1 selection rounds are UNROLLED DataFrame transforms over the
    * candidate pool (≤20 rows after the BM25 cut), so the plan is static
    * and the only corpus-scale work is BM25 itself + one 20-row
    * embedding fetch — MMR's cost at 100 TB is the retrieval, never the
    * re-rank. Tie rule: r4 score desc, doc_id asc, both engines.
    */
  def mmrDiversity(spark: SparkSession, sfDir: String, k: Int = 5,
                   lambda: Double = 0.7): DataFrame = {
    val rel = graft.operators.Text.bm25(spark, sfDir, 20)
      .select(col("doc_id"), col("bm25").as("rel"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = transform(col("embedding"),
                      v => floor(v.cast("double") * 1000000.0 + 0.5).cast("long"))
    val emb = t(spark, sfDir, "embeddings")
      .join(rel.select(col("doc_id")), col("vec_id") === col("doc_id"))
      .select(col("vec_id"), q.as("qv"))
    def isum(c: Column): Column = aggregate(c, lit(0L), (acc, x) => acc + x)
    val sim = emb.select(col("vec_id").as("a_id"), col("qv").as("qa"))
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("qv").as("qb")))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
              r4(isum(zip_with(col("qa"), col("qb"), (x, y) => x * y))
                   .cast("double") /
                 (sqrt(isum(transform(col("qa"), x => x * x)).cast("double")) *
                  sqrt(isum(transform(col("qb"), x => x * x)).cast("double"))))
                .as("sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val first = rel
      .orderBy(col("rel").desc, col("doc_id").asc).limit(1)
      .select(lit(1L).as("rank"), col("doc_id"), col("rel"),
              lit(0.0).as("maxsim"), r4(lit(lambda) * col("rel")).as("mmr_score"))
    var selected = first
    for (j <- 2 to k) {
      val maxsim = sim
        .join(selected.select(col("doc_id").as("b_id")), "b_id")
        .groupBy(col("a_id")).agg(max(col("sim")).as("maxsim"))
      val pick = rel.join(selected.select(col("doc_id")), Seq("doc_id"),
                          "left_anti")
        .join(maxsim, col("doc_id") === col("a_id"))
        .select(lit(j.toLong).as("rank"), col("doc_id"), col("rel"),
                col("maxsim"),
                r4(lit(lambda) * col("rel") -
                   lit(1.0 - lambda) * col("maxsim")).as("mmr_score"))
        .orderBy(col("mmr_score").desc, col("doc_id").asc).limit(1)
      // eager localCheckpoint on the ≤k-row selected frame: each round's
      // pick nests ALL prior rounds' TakeOrdered subtrees, so the lazy
      // plan grows super-linearly in k and re-plans every stage (the
      // rakingIpf nested-margins lesson; measured 5.9 s → 1.4 s at k=5).
      // The checkpointed frame is k rows — driver-trivial at any scale.
      selected = selected.unionByName(pick).localCheckpoint(true)
    }
    ordered(selected, "rank")
  }

  /** Labeled, ·10⁶-quantized vector frame shared by the embedding-training
    * data ops: (vec_id, label, qv array<bigint>, n2 = dot_q(qv,qv)).
    * Norms precomputed ONCE per vector — the pair joins below would
    * otherwise recompute each norm n times.
    */
  private def labeledQuantized(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val q = transform(col("embedding"),
                      v => floor(v.cast("double") * 1000000.0 + 0.5).cast("long"))
    t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"), q.as("qv"))
      .withColumn("n2", call_function("dot_q", col("qv"), col("qv")))
  }

  /** Hard-negative mining for embedding training (the triplet-builder
    * behind every contrastive fine-tune): for each anchor vector, the
    * HIGHEST-cosine vector of a DIFFERENT label (hardest negative — the
    * confusable impostor) and the LOWEST-cosine vector of the SAME label
    * (hardest positive — the estranged twin), plus the margin
    * hn_cos − hp_cos (positive margin = the anchor's class is locally
    * entangled; the rows a curriculum should upweight). Pair scoring is
    * the exact-integer `dot_q` codegen kernel over ·10⁶-quantized
    * components — the interpreted zip_with fold is unusable at this
    * fan-out, and float kernels break the hash gate (engine summation
    * order; the q_cos_sim_hist lesson). Plan: one n² self-join with
    * per-vector norms precomputed, two max_by/min_by-style struct
    * extremes per anchor in ONE hash-agg. Corpus-wide mining; output
    * bounded to the vec_id % 17 sample (gate-size discipline, the
    * targetEncodingLoo precedent). At 100 TB the n² join swaps for the
    * annLsh bucketed candidate stream — scoring and extremes unchanged.
    */
  def hardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    val v = labeledQuantized(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = v.select(col("vec_id").as("a_id"), col("label").as("a_label"),
                     col("qv").as("qa"), col("n2").as("na2"))
    val b = v.select(col("vec_id").as("b_id"), col("label").as("b_label"),
                     col("qv").as("qb"), col("n2").as("nb2"))
    val cos = r4(call_function("dot_q", col("qa"), col("qb")).cast("double") /
                 (sqrt(col("na2").cast("double")) *
                  sqrt(col("nb2").cast("double"))))
    val scored = a.join(b, col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("a_label"), col("b_id"), col("b_label"),
              cos.as("cos"))
    // deterministic extremes: max/min struct with (cos, ±b_id) tiebreak —
    // b_id negated on the max side so ties break to the SMALLER id
    val mined = scored.groupBy(col("a_id"), col("a_label"))
      .agg(
        max(when(col("a_label") =!= col("b_label"),
                 struct(col("cos").as("c"), (-col("b_id")).as("nid"),
                        col("b_label").as("lb")))).as("hn"),
        min(when(col("a_label") === col("b_label"),
                 struct(col("cos").as("c"), col("b_id").as("id"),
                        col("b_label").as("lb")))).as("hp"))
    // anchors lacking a different-label peer (singleton class) or a
    // same-label peer yield a null hn/hp struct — dropped explicitly so the
    // Spark side agrees with the oracle's inner join of the hn/hp CTEs by
    // construction, not by fixture luck (round-11 advice item)
    ordered(
      mined.filter(col("a_id") % 17 === 0)
        .filter(col("hn").isNotNull && col("hp").isNotNull)
        .select(col("a_id").as("vec_id"), col("a_label").as("label"),
                (-col("hn.nid")).as("hard_neg_id"),
                col("hn.lb").as("hard_neg_label"),
                col("hn.c").as("hard_neg_cos"),
                col("hp.id").as("hard_pos_id"),
                col("hp.c").as("hard_pos_cos"),
                r4(col("hn.c") - col("hp.c")).as("margin")),
      "vec_id")
  }

  /** Directed, deduped, cosine-scored candidate pairs from the gated-IVF
    * multi-probe cells — the 100 TB candidate stream the bucketed miners
    * ([[hardNegativesIvf]], [[knnLabelNoiseIvf]]) share. Every vector is
    * INDEXED in its two nearest integer-k-means cells
    * ([[graft.operators.Ivf.gatedProbes2]]); an anchor PROBES its two
    * nearest cells (near-neighbor candidates) and — when `includeFar` —
    * also the two cells nearest its negation (farthest-point candidates,
    * the hardest-positive modality: min dot ≡ nearest of −v). A directed
    * pair (a → b) exists when a probe cell of `a` holds `b`. Pair volume
    * is Σ_cell |cell|·|probes into cell| — corpus-linear under the
    * standard raise-nLists-with-corpus sizing rule — where the exact
    * miners score n² pairs. Scoring is the same exact-integer `dot_q`
    * cosine as the exact miners; dedup runs AFTER scoring so only
    * (ids, labels, cos) ever re-shuffles, never the 64-long vectors
    * (duplicate pairs score identically, so dedup-after-scoring is
    * value-identical at ~2x kernel calls on the dup fraction — cheap;
    * vectors are wide).
    */
  private def ivfCandidateScored(spark: SparkSession, sfDir: String,
                                 nLists: Int = 16,
                                 includeFar: Boolean = false): DataFrame = {
    import graft.sources.SnapshotStore
    val root = buildCandidateStream(spark, sfDir, nLists)
    val df = SnapshotStore.readCommitted(spark, root)
    if (includeFar) df.dropDuplicates("a_id", "b_id").drop("a_far")
    else df.filter(!col("a_far")).drop("a_far")
  }

  /** Versioned root for the persisted scored candidate stream over
    * `sfDir`'s embeddings — keyed by corpus path + nLists + a format tag
    * (bump `v1` if the probe/scoring arithmetic changes, so stale streams
    * never serve), the [[graft.operators.Ivf]] index-root discipline.
    */
  private def candRoot(sfDir: String, nLists: Int): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/graft-cands-v1-$tag-n$nLists"
  }

  /** Build and PERSIST the scored candidate superset ONCE per corpus
    * (idempotent — returns immediately when committed): the NEAR and FAR
    * a-side probe explosions in one pass, each pair tagged `a_far`, scored
    * with the exact-integer dot_q cosine at build time, deduped by
    * (a_id, b_id, a_far) — duplicate pairs score identically, so the
    * payload is functionally determined and the commit is deterministic.
    * Readers reconstruct both legacy streams exactly: near-only =
    * filter !a_far (already unique per pair); near+far = dedup (a,b)
    * across both flags.
    *
    * Round-13 rationale (r12 verdict item 1): the four miner-family
    * queries (both bucketed miners + both recall measurements) each
    * re-ran the k-means probe fit + the cell self-join per query — the
    * same frame four times per suite, and the one >2x unattributed
    * BENCH reading sat exactly here. Build-once/serve-many is the
    * q_ann_recall_curve pattern promoted to the family: after the first
    * call every miner is a lazy plan over one narrow parquet table
    * (ids + labels + cos — the 64-long vectors never persist).
    */
  private def buildCandidateStream(spark: SparkSession, sfDir: String,
                                   nLists: Int = 16): String = {
    import graft.sources.SnapshotStore
    val root = candRoot(sfDir, nLists)
    if (SnapshotStore.committedVersions(spark, root).nonEmpty) return root
    val pv = Ivf.gatedProbes2(spark, sfDir, nLists)
      .join(labeledQuantized(spark, sfDir), "vec_id")
      // feeds both self-join sides — persist, or the k-means fit +
      // assignment subtree runs once per side
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = pv.select(
        explode(array(
          struct(col("near1").as("cell"), lit(false).as("afar")),
          struct(col("near2").as("cell"), lit(false).as("afar")),
          struct(col("far1").as("cell"), lit(true).as("afar")),
          struct(col("far2").as("cell"), lit(true).as("afar")))).as("pc"),
        col("vec_id").as("a_id"), col("label").as("a_label"),
        col("qv").as("qa"), col("n2").as("na2"))
      .select(col("pc.cell").as("cell"), col("pc.afar").as("a_far"),
              col("a_id"), col("a_label"), col("qa"), col("na2"))
    val b = pv.select(explode(array(col("near1"), col("near2"))).as("cell"),
                      col("vec_id").as("b_id"), col("label").as("b_label"),
                      col("qv").as("qb"), col("n2").as("nb2"))
    val cos = r4(call_function("dot_q", col("qa"), col("qb")).cast("double") /
                 (sqrt(col("na2").cast("double")) *
                  sqrt(col("nb2").cast("double"))))
    // EXPLICIT-width repartition before the broadcast join: the a-side is
    // tiny pre-explosion (4 rows per anchor), so AQE coalesces it to ~1
    // partition — and then the join's 10⁸-pair fan-out and the dedup's
    // partial hash-agg run in ONE task (observed: a single core pinned
    // 16 min at the 10× decade). An explicit partition count survives AQE
    // coalescing; the shuffle it pays is the narrow pre-explosion rows
    val nPart = spark.sessionState.conf.numShufflePartitions
    val scored = a.repartition(nPart, col("a_id")).join(b, Seq("cell"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("a_label"), col("b_id"), col("b_label"),
              cos.as("cos"), col("a_far"))
      .dropDuplicates("a_id", "b_id", "a_far")
    SnapshotStore.commitSnapshot(scored, root)
    pv.unpersist()
    root
  }

  /** [[hardNegatives]] mined from the IVF multi-probe candidate stream
    * instead of all pairs — the 100 TB production twin (the round-10
    * verdict's last scale-killer): same exact-integer scoring, same
    * deterministic extremes and output contract, but the pair set is the
    * bucket-bounded [[ivfCandidateScored]] stream — near probes feed the
    * hardest-NEGATIVE search (a max-cosine problem) and negation probes
    * feed the hardest-POSITIVE search (a min-cosine/farthest-point problem
    * that near-neighbor candidates cannot surface by construction) — so
    * the plan scales corpus-linearly. The candidate generator's miss rate
    * vs the exact miner is MEASURED by q_hard_negatives_recall
    * ([[hardNegativesRecall]]) rather than assumed. Anchors whose
    * candidate set lacks a different-label or same-label peer are dropped
    * (mirrored inner-join semantics, as in the exact miner).
    */
  def hardNegativesIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = ivfCandidateScored(spark, sfDir, includeFar = true)
    val mined = scored.groupBy(col("a_id"), col("a_label"))
      .agg(
        max(when(col("a_label") =!= col("b_label"),
                 struct(col("cos").as("c"), (-col("b_id")).as("nid"),
                        col("b_label").as("lb")))).as("hn"),
        min(when(col("a_label") === col("b_label"),
                 struct(col("cos").as("c"), col("b_id").as("id"),
                        col("b_label").as("lb")))).as("hp"))
    ordered(
      mined.filter(col("a_id") % 17 === 0)
        .filter(col("hn").isNotNull && col("hp").isNotNull)
        .select(col("a_id").as("vec_id"), col("a_label").as("label"),
                (-col("hn.nid")).as("hard_neg_id"),
                col("hn.lb").as("hard_neg_label"),
                col("hn.c").as("hard_neg_cos"),
                col("hp.id").as("hard_pos_id"),
                col("hp.c").as("hard_pos_cos"),
                r4(col("hn.c") - col("hp.c")).as("margin")),
      "vec_id")
  }

  /** [[knnLabelNoise]] voted from the IVF multi-probe candidate stream —
    * the corpus-linear production twin: per anchor, the k best candidates
    * by (cos desc, b_id) out of the bucket-bounded pair stream (not all
    * n−1 neighbors), then the same majority-vote noise-rate tail. Anchors
    * with an empty candidate set drop out (no votes); edge recall vs the
    * exact 5-NN is measured by q_knn_noise_recall ([[knnNoiseRecall]]).
    */
  def knnLabelNoiseIvf(spark: SparkSession, sfDir: String,
                       k: Int = 5): DataFrame = {
    val knn = graft.util.TopK.perGroup(
      ivfCandidateScored(spark, sfDir),
      Seq(col("a_id"), col("a_label")),
      Seq(col("cos").desc, col("b_id").asc), k)
    val voted = knn.groupBy(col("a_id"), col("a_label"), col("b_label"))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col("a_id"), col("a_label"))
      .agg(max(struct(col("votes").as("v"), (-col("b_label")).as("nl")))
             .as("m"))
      .select(col("a_id"), col("a_label"), (-col("m.nl")).as("knn_label"))
    ordered(
      voted.groupBy(col("a_label").as("label"))
        .agg(count(lit(1)).as("n_vectors"),
             sum(when(col("knn_label") =!= col("a_label"), 1L).otherwise(0L))
               .as("n_flagged"))
        .select(col("label"), col("n_vectors"), col("n_flagged"),
                r4(col("n_flagged").cast("double") /
                   col("n_vectors").cast("double")).as("noise_rate")),
      "label")
  }

  /** Measured recall of the bucketed hard-negative miner vs the exact one —
    * the q_lsh_recall pattern applied to mining: per %17-sampled anchor,
    * does [[hardNegativesIvf]] find the SAME hardest negative / hardest
    * positive (id equality — cos equality follows) as the exact n² miner?
    * One row: exact/bucketed anchor counts, per-extreme hit counts,
    * fixed-point recalls. Integer counts throughout, so the whole
    * measurement sits under the hash gate.
    */
  def hardNegativesRecall(spark: SparkSession, sfDir: String): DataFrame = {
    // cos values are already r4-rounded; ·10⁴ makes them exact integer
    // basis points, so the regret sums are exact on both engines
    def bp(c: Column): Column =
      floor(c * lit(10000.0) + lit(0.5)).cast("long")
    val ex = hardNegatives(spark, sfDir)
      .select(col("vec_id"), col("hard_neg_id").as("x_hn"),
              col("hard_pos_id").as("x_hp"),
              bp(col("hard_neg_cos")).as("x_hnc"),
              bp(col("hard_pos_cos")).as("x_hpc"))
    val iv = hardNegativesIvf(spark, sfDir)
      .select(col("vec_id"), col("hard_neg_id").as("i_hn"),
              col("hard_pos_id").as("i_hp"),
              bp(col("hard_neg_cos")).as("i_hnc"),
              bp(col("hard_pos_cos")).as("i_hpc"))
    ex.join(iv, Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n_anchors"),
           sum(when(col("i_hn").isNotNull, 1L).otherwise(0L)).as("n_mined"),
           sum(when(col("i_hn") === col("x_hn"), 1L).otherwise(0L))
             .as("n_hn_hit"),
           sum(when(col("i_hp") === col("x_hp"), 1L).otherwise(0L))
             .as("n_hp_hit"),
           // regret in basis points: how far the mined extreme's cosine sits
           // from the true extreme's, summed over mined anchors (0 = every
           // miss is a value-tie). hn regret = true max − mined max ≥ 0;
           // hp regret = mined min − true min ≥ 0.
           sum(coalesce(col("x_hnc") - col("i_hnc"), lit(0L)))
             .as("hn_regret_bp"),
           sum(coalesce(col("i_hpc") - col("x_hpc"), lit(0L)))
             .as("hp_regret_bp"))
      .select(col("n_anchors"), col("n_mined"), col("n_hn_hit"),
              col("n_hp_hit"), col("hn_regret_bp"), col("hp_regret_bp"),
              r4(col("n_hn_hit").cast("double") /
                 col("n_anchors").cast("double")).as("hn_recall"),
              r4(col("n_hp_hit").cast("double") /
                 col("n_anchors").cast("double")).as("hp_recall"))
  }

  /** Measured edge recall of the IVF candidate stream vs the exact 5-NN
    * graph: what fraction of the true (anchor, neighbor) top-5 edges does
    * the bucketed generator surface? One row: truth size, candidate
    * volume, hits, fixed-point recall — the index-quality number that
    * decides whether [[knnLabelNoiseIvf]]'s noise rates can be trusted.
    */
  def knnNoiseRecall(spark: SparkSession, sfDir: String,
                     k: Int = 5): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val v = labeledQuantized(spark, sfDir)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = v.select(col("vec_id").as("a_id"), col("qv").as("qa"),
                     col("n2").as("na2"))
    val b = v.select(col("vec_id").as("b_id"), col("qv").as("qb"),
                     col("n2").as("nb2"))
    val cos = r4(call_function("dot_q", col("qa"), col("qb")).cast("double") /
                 (sqrt(col("na2").cast("double")) *
                  sqrt(col("nb2").cast("double"))))
    val truth = graft.util.TopK.perGroup(
      a.repartition(col("a_id"))
        .join(b, col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"), cos.as("cos")),
      Seq(col("a_id")), Seq(col("cos").desc, col("b_id").asc), k)
      .select(col("a_id"), col("b_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cand = ivfCandidateScored(spark, sfDir)
      .select(col("a_id"), col("b_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val hit = truth.join(cand, Seq("a_id", "b_id"), "left_semi")
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_truth"), col("n_cand"), col("n_hit"),
              r4(col("n_hit").cast("double") / col("n_truth").cast("double"))
                .as("recall"))
  }

  /** Per-vector one-vs-rest centroid scores shared by [[aucRoc]] and
    * [[prCurve]]: for every class c, every vector's exact-integer cosine
    * to class c's SUM vector (scale-invariant for cosine, so the sum
    * replaces the mean and stays an exact integer vector). Per-dimension
    * join against the broadcast 64·|classes|-row centroid frame —
    * fact-linear, no n² anywhere.
    */
  private def centroidScores(spark: SparkSession, sfDir: String): DataFrame = {
    val ex = t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"),
              posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("label"), col("pos"),
              floor(col("v").cast("double") * 1000000.0 + 0.5).cast("long")
                .as("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = ex.groupBy(col("label").as("label_c"), col("pos"))
      .agg(sum(col("q")).as("s"))
    val cn = cents.groupBy(col("label_c"))
      .agg(sum(col("s").cast("decimal(38,0)") * col("s")).as("cn2"))
    val per = ex.join(broadcast(cents), Seq("pos"))
      .groupBy(col("vec_id"), col("label"), col("label_c"))
      .agg(sum(col("q").cast("decimal(38,0)") * col("s")).as("dp"),
           sum(col("q").cast("decimal(38,0)") * col("q")).as("n2"))
    per.join(broadcast(cn), "label_c")
      .select(col("vec_id"), col("label"), col("label_c"),
              r4(col("dp").cast("double") /
                 (sqrt(col("n2").cast("double")) *
                  sqrt(col("cn2").cast("double")))).as("score"))
  }

  /** One-vs-rest ROC AUC per class — the separability scorecard of the
    * embedding space (the eval-metric family's missing member next to
    * nDCG and calibration): score = exact-integer cosine to the class
    * centroid, AUC by the Mann–Whitney rank-sum identity with MIDRANKS
    * for ties carried as exact integers (2·midrank = 2·min_rank +
    * tie_size − 1, so AUC = (Σ 2r_pos − 2·n₊(n₊+1)/2) / (2·n₊·n₋) is a
    * single division of exact integers; ties are deterministic on the r4
    * score). Class-sharded rank windows over a vector-grain frame. AUC
    * 0.5 = inseparable, and the per-class spread IS the answer.
    */
  def aucRoc(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = centroidScores(spark, sfDir)
      .select(col("label_c"), (col("label") === col("label_c")).cast("int")
                .as("is_pos"), col("score"))
    val wRank = Window.partitionBy(col("label_c")).orderBy(col("score").asc)
    val wTie = Window.partitionBy(col("label_c"), col("score"))
    val ranked = scored
      .withColumn("r2", lit(2) * rank().over(wRank) +
                        count(lit(1)).over(wTie) - 1)
    ordered(
      ranked.groupBy(col("label_c").as("label"))
        .agg(sum(col("is_pos")).cast("long").as("n_pos"),
             sum(lit(1) - col("is_pos")).cast("long").as("n_neg"),
             sum(col("is_pos") * col("r2")).cast("long").as("sr2"))
        .select(col("label"), col("n_pos"), col("n_neg"),
                r4((col("sr2") - col("n_pos") * (col("n_pos") + 1))
                     .cast("double") /
                   (lit(2.0) * col("n_pos").cast("double") *
                    col("n_neg").cast("double"))).as("auc")),
      "label")
  }

  /** Precision/recall curve at decile score cuts for the label-0
    * one-vs-rest centroid score — the threshold-picking table behind
    * every filter deployment ("what recall do I give up at 90%
    * precision"): vectors ranked by score descending, cut at k·n/10 for
    * k = 1..10, cumulative positives via one running window — precision,
    * recall, F1 as single divisions of exact counts at each cut.
    */
  def prCurve(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // persisted: the two PrefixSum passes + the totals agg below each scan
    // this frame several times (bucketing min/max, local window, offsets),
    // and its centroid-scoring lineage is the expensive part — 3 narrow
    // columns cache; 5.7 s -> ~0.6 s at sf0.1 measured.
    // SELF-PERSISTED CLASS (r15, ADVICE note): the mark is never
    // unpersisted by this builder — the returned frame still references it,
    // so an in-builder unpersist would defeat the cache before the caller's
    // action runs. Same contract as q_adf/q_var_es: harness callers
    // (Bench/Verify) clearCache() between queries; long-lived sessions own
    // the eviction.
    val scored = centroidScores(spark, sfDir)
      .filter(col("label_c") === 0)
      .select(col("vec_id"), (col("label") === 0).cast("long").as("is_pos"),
              col("score"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // global rank + running positives via the two-phase PrefixSum scan —
    // the single-reducer `Window.orderBy(score)` over the corpus-sized
    // scored frame was the r13-verdict scale-killer; rank = exclusive
    // count-prefix + 1, cum_pos = exclusive pos-prefix + own is_pos
    val ord = Seq(col("score").desc, col("vec_id").asc)
    val cum = graft.util.PrefixSum.exclusiveColsMulti(
        scored, ord, Seq("rk0" -> lit(1L), "cp0" -> col("is_pos")))
      .withColumn("rk", col("rk0") + 1L)
      .withColumn("cum_pos", col("cp0") + col("is_pos"))
    val tot = scored.agg(count(lit(1)).as("n"),
                         sum(col("is_pos")).as("np"))
    // the k-th decile cut = the row ranked ⌊k·n/10⌋, via an explicit
    // 10-row cuts frame (integer div, no modular cleverness)
    val cuts = spark.range(1, 11).toDF("decile")
      .crossJoin(broadcast(tot))
      .select(col("decile"), expr("decile * n div 10").as("rk"), col("np"))
    ordered(
      cum.join(broadcast(cuts), "rk")
        .select(col("decile"),
                col("rk").as("n_kept"), col("cum_pos").as("n_pos_kept"),
                r4(col("cum_pos").cast("double") / col("rk").cast("double"))
                  .as("precision"),
                r4(col("cum_pos").cast("double") / col("np").cast("double"))
                  .as("recall"),
                r4(lit(2.0) * col("cum_pos").cast("double") /
                   (col("rk") + col("np")).cast("double")).as("f1")),
      "decile")
  }

  /** Reciprocal-rank fusion of lexical and dense retrieval — the hybrid-
    * search combiner every RAG stack ships (Cormack et al. 2009: rrf(d) =
    * Σ 1/(K + rank_i(d)), K = 60): leg A ranks documents by the registered
    * BM25 scores ([[graft.operators.Text.bm25Scores]], query terms
    * join/hash/scan), leg B ranks vectors by exact-integer cosine to probe
    * vec 0 — the `documents`/`embeddings` fixtures share one id space, the
    * doc-with-its-embedding shape of a real corpus. Each leg keeps its
    * top-`legK` (rank-bounded union, the production shape: fusion reads
    * index RESULTS, never corpora), full-outer-joins on id, and a missing
    * leg contributes 0. The rrf sum is a fixed two-term double expression
    * (no aggregation), so it is deterministic on both engines; ranks are
    * total-ordered with id tiebreaks. Scale: both legs are index lookups
    * (postings-bounded BM25, broadcast-probe cosine) + one top-K each —
    * the fusion join touches 2·legK rows regardless of corpus size.
    */
  def rrfFusion(spark: SparkSession, sfDir: String, legK: Int = 50,
                k: Int = 10, kRrf: Int = 60): DataFrame = {
    // legs are TakeOrdered top-legK with the rank computed over the
    // legK-row result (graft.util.Ranked) — never a global-window rank of
    // the corpus-sized scored frame (the r13-verdict scale-killer class)
    val lex = graft.util.Ranked.topkRanked(
        Text.bm25Scores(spark, sfDir), legK, "lex_rank",
        col("bm25").desc, col("doc_id").asc)
      .select(col("doc_id").as("id"), col("lex_rank"))
    val v = labeledQuantized(spark, sfDir)
    val probe = v.filter(col("vec_id") === 0)
      .select(col("qv").as("pq"), col("n2").as("pn2")).limit(1)
    val cos = r4(call_function("dot_q", col("qv"), col("pq")).cast("double") /
                 (sqrt(col("n2").cast("double")) *
                  sqrt(col("pn2").cast("double"))))
    val dense = graft.util.Ranked.topkRanked(
        v.crossJoin(broadcast(probe))
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id").as("id"), cos.as("cos")),
        legK, "dense_rank", col("cos").desc, col("id").asc)
      .select(col("id"), col("dense_rank"))
    val rrf = coalesce(lit(1.0) / (lit(kRrf) + col("lex_rank")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(kRrf) + col("dense_rank")), lit(0.0))
    lex.join(dense, Seq("id"), "full_outer")
      .select(col("id").as("doc_id"), col("lex_rank"), col("dense_rank"),
              r4(rrf).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Johnson–Lindenstrauss random ±1 projection with a MEASURED distortion
    * report — the dimensionality-reduction workhorse (Achlioptas 2003
    * sign-matrix variant) under the exact hash gate: qv (·10⁶ ints) is
    * projected to `m` dimensions through a sign matrix whose entries are
    * md5-derived LITERALS inlined identically into the Spark plan and the
    * oracle SQL (the cwCoef discipline — no engine hash functions), so
    * every projected coordinate is an exact integer. The report compares
    * squared L2 distances before/after over the %7-sampled pair set: JL
    * says E[d²_proj / m] = d²_orig, and the output pins the global ratio
    * plus the per-pair extremes — the numbers that tell an operator
    * whether m is high enough for their recall target. All sums are
    * exact integers; ratios are single mirrored divisions. Scale: the
    * projection is a broadcast m×64 matrix join (map-only per vector);
    * the report's pair stage is sample-bounded.
    */
  def randomProjection(spark: SparkSession, sfDir: String,
                       m: Int = 16): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // md5-derived ±1 sign matrix, inlined as literals on both engines
    val signs = for (j <- 0 until m; i <- 0 until 64)
      yield (j, i + 1, rpSign(j, i))
    val signDf = broadcast(
      spark.createDataFrame(signs).toDF("j", "i", "s"))
    val v = labeledQuantized(spark, sfDir)
      .filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"), posexplode(col("qv")).as(Seq("pos", "q")))
      .select(col("vec_id"), (col("pos") + 1).as("i"), col("q"))
    val proj = v.join(signDf, "i")
      .groupBy(col("vec_id"), col("j"))
      .agg(sum(col("q") * col("s")).as("y"))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("j"), col("y")))).as("yv"))
      .select(col("vec_id"),
              transform(col("yv"), x => x.getField("y")).as("yv"))
    val q = labeledQuantized(spark, sfDir)
      .filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"), col("qv"))
      .join(proj, "vec_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = q.select(col("vec_id").as("a_id"), col("qv").as("qa"),
                     col("yv").as("ya"))
    val b = q.select(col("vec_id").as("b_id"), col("qv").as("qb"),
                     col("yv").as("yb"))
    graft.functions.GraftFunctions.register(spark)
    val pairs = a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
              call_function("sq_l2", col("qa"), col("qb")).as("d2o"),
              call_function("sq_l2", col("ya"), col("yb")).as("d2p"))
      .withColumn("ratio",
        r4(col("d2p").cast("double") /
           (lit(m.toDouble) * col("d2o").cast("double"))))
    pairs.agg(count(lit(1)).as("n_pairs"),
              sum(col("d2o").cast("decimal(38,0)")).as("sum_d2_orig"),
              sum(col("d2p").cast("decimal(38,0)")).as("sum_d2_proj"),
              min(col("ratio")).as("min_ratio"),
              max(col("ratio")).as("max_ratio"))
      .select(col("n_pairs"),
              col("sum_d2_orig").cast("double").as("sum_d2_orig"),
              col("sum_d2_proj").cast("double").as("sum_d2_proj"),
              r4(col("sum_d2_proj").cast("double") /
                 (lit(m.toDouble) * col("sum_d2_orig").cast("double")))
                .as("global_ratio"),
              col("min_ratio"), col("max_ratio"))
  }

  /** md5-derived ±1 entry of the JL sign matrix (shared by the Spark
    * builder and the generated oracle SQL, which inlines the same values
    * — the [[graft.operators.Dedup.cwCoef]] discipline).
    */
  def rpSign(j: Int, i: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp_${j}_$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (hex.charAt(0) < '8') 1 else -1
  }

  /** Matryoshka truncation recall — how much retrieval quality survive
    * PREFIX-truncated embeddings (Kusupati et al. 2022: MRL-trained
    * models pack information into leading dims; even for plain embeddings
    * the truncation curve tells an operator what a 4× memory cut costs):
    * for each probe (vec_id < 8), the exact top-10 by FULL 64-dim integer
    * cosine is the truth; the same top-10 recomputed from the first 16
    * and first 32 dims is the candidate; output per prefix length: probe
    * count, truth size, hits, recall@10. All scoring is the exact-integer
    * `dot_q` kernel over sliced quantized vectors; top-k per probe via
    * [[graft.util.TopK.perGroup]]. Scale: probes are bounded (a query
    * batch), each leg is one corpus scan scoring all probes — the
    * cosineTopKBatch shape at three prefix lengths.
    */
  def matryoshkaRecall(spark: SparkSession, sfDir: String,
                       nProbes: Int = 8, k: Int = 10): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val v = labeledQuantized(spark, sfDir)
      .select(col("vec_id"), col("qv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def topkAt(dims: Int): DataFrame = {
      val sliced =
        if (dims == 64) v
        else v.select(col("vec_id"), slice(col("qv"), 1, dims).as("qv"))
      // limit(nProbes) states the probe-batch bound IN THE PLAN (vec_id is
      // unique, so it drops nothing) — the broadcast hint below is legal
      // because the hinted subtree is provably bounded at any corpus scale
      // (the cosineTopK discipline, enforced by ScaleInfraSpec's hint guard)
      val probes = sliced.filter(col("vec_id") < nProbes)
        .limit(nProbes)
        .select(col("vec_id").as("p_id"), col("qv").as("pq"))
        .withColumn("pn2", call_function("dot_q", col("pq"), col("pq")))
      val cos = r4(call_function("dot_q", col("qv"), col("pq")).cast("double") /
                   (sqrt(call_function("dot_q", col("qv"), col("qv"))
                           .cast("double")) *
                    sqrt(col("pn2").cast("double"))))
      graft.util.TopK.perGroup(
        sliced.crossJoin(broadcast(probes))
          .filter(col("vec_id") =!= col("p_id"))
          .select(col("p_id"), col("vec_id").as("n_id"), cos.as("cos")),
        Seq(col("p_id")), Seq(col("cos").desc, col("n_id").asc), k)
        .select(col("p_id"), col("n_id"))
    }
    val truth = topkAt(64).persist(StorageLevel.MEMORY_AND_DISK)
    val legs = Seq(16, 32).map { dims =>
      val cand = topkAt(dims)
      val hit = truth.join(cand, Seq("p_id", "n_id"), "left_semi")
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select(lit(dims.toLong).as("prefix_dims"),
                lit(nProbes.toLong).as("n_probes"),
                col("n_truth"), col("n_hit"),
                r4(col("n_hit").cast("double") / col("n_truth").cast("double"))
                  .as("recall_at_k"))
    }
    ordered(legs.reduce(_ unionByName _), "prefix_dims")
  }

  /** Balanced interleaving of the lexical and dense rankings (Joachims
    * 2002 — the online ranking-eval the offline rrf_fusion complements):
    * the interleaved list is the deduped union of the two top-`legK`
    * prefixes extended in LOCKSTEP, which has a closed form — a document
    * enters at prefix depth min(ra, rb); within a depth the A-contributed
    * document precedes the B-contributed one (A leads). That is one
    * full-outer join of the two rank-bounded legs and one ordering key:
    * (entry depth, contributed-by-B, id) — no sequential draft state, so
    * the whole construction is set-wise (team-DRAFT interleaving, whose
    * greedy turn interplay has no closed form, needs per-impression
    * simulation — the documented reason this op pins the balanced
    * variant). Each slot records the source ranker and both ranks; the
    * deterministic relevance stand-in (membership in the exact dense
    * top-K) makes the per-slot credit reproducible — production swaps in
    * click credit. Bounded: both legs are top-`legK` index results.
    */
  def balancedInterleave(spark: SparkSession, sfDir: String,
                         legK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // TakeOrdered legs + rank over the legK-row result (util.Ranked) —
    // the slot window below then orders a ≤2·legK-row joined frame
    val lex = graft.util.Ranked.topkRanked(
        Text.bm25Scores(spark, sfDir), legK, "ra",
        col("bm25").desc, col("doc_id").asc)
      .select(col("doc_id").as("id"), col("ra"))
    val v = labeledQuantized(spark, sfDir)
    val probe = v.filter(col("vec_id") === 0)
      .select(col("qv").as("pq"), col("n2").as("pn2")).limit(1)
    val cos = r4(call_function("dot_q", col("qv"), col("pq")).cast("double") /
                 (sqrt(col("n2").cast("double")) *
                  sqrt(col("pn2").cast("double"))))
    val dense = graft.util.Ranked.topkRanked(
        v.crossJoin(broadcast(probe))
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id").as("id"), cos.as("cos")),
        legK, "rb", col("cos").desc, col("id").asc)
      .select(col("id"), col("rb"))
    val both = lex.join(dense, Seq("id"), "full_outer")
      .select(col("id"),
              coalesce(col("ra"), lit(legK + 1)).as("ra"),
              coalesce(col("rb"), lit(legK + 1)).as("rb"))
      .withColumn("entry", least(col("ra"), col("rb")))
      .withColumn("via_b", (col("rb") < col("ra")).cast("int")) // A wins ties
    val slotted = both.withColumn("slot", row_number().over(
      Window.orderBy(col("entry").asc, col("via_b").asc, col("id").asc)))
    ordered(
      slotted.select(col("slot"), col("id").as("doc_id"),
                     when(col("via_b") === 0, lit("A")).otherwise(lit("B"))
                       .as("source"),
                     when(col("ra") <= legK, col("ra")).as("lex_rank"),
                     when(col("rb") <= legK, col("rb")).as("dense_rank"),
                     (col("rb") <= legK).as("relevant")),
      "slot")
  }

  /** Per-label embedding-centroid drift between two corpus halves (even
    * vs odd vec_ids — the batch-A/batch-B stand-in): for each label, the
    * exact-integer cosine between its two half-centroids. The monitoring
    * op behind "did this week's embedding batch shift" — [[graft
    * .operators.Insights]]'s psi_drift for feature distributions, this
    * for the embedding space itself. Centroid = per-dimension SUM vector
    * (scale-invariant under cosine, so it stays an exact integer vector);
    * one posexplode hash-agg per half, a 64·|labels|-row join, one
    * mirrored division per label. Corpus-linear, no pair stage.
    */
  def centroidDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val ex = t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"),
              (col("vec_id") % 2 === 0).as("even"),
              posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("label"), col("even"), col("pos"),
              floor(col("v").cast("double") * 1000000.0 + 0.5).cast("long")
                .as("q"))
    val cents = ex.groupBy(col("label"), col("even"), col("pos"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("nrows"))
    val a = cents.filter(col("even"))
      .select(col("label"), col("pos"), col("s").as("sa"))
    val b = cents.filter(!col("even"))
      .select(col("label"), col("pos"), col("s").as("sb"))
    val nPer = t(spark, sfDir, "embeddings")
      .groupBy(col("label").cast("long").as("label"))
      .agg(sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("n_even"),
           sum(when(col("vec_id") % 2 =!= 0, 1L).otherwise(0L)).as("n_odd"))
    val dots = a.join(b, Seq("label", "pos"))
      .groupBy(col("label"))
      .agg(sum(col("sa").cast("decimal(38,0)") * col("sb")).as("dab"),
           sum(col("sa").cast("decimal(38,0)") * col("sa")).as("daa"),
           sum(col("sb").cast("decimal(38,0)") * col("sb")).as("dbb"))
    ordered(
      dots.join(nPer, "label")
        .select(col("label"), col("n_even"), col("n_odd"),
                r4(col("dab").cast("double") /
                   (sqrt(col("daa").cast("double")) *
                    sqrt(col("dbb").cast("double")))).as("centroid_cos")),
      "label")
  }

  /** Hybrid-retrieval EVALUATION — nDCG@k of the RRF-fused ranking against
    * the two single legs (r11-verdict item 6: [[rrfFusion]] and
    * [[balancedInterleave]] produce rankings but nothing measured them).
    * The claim hybrid retrieval makes is CROSS-MODALITY COVERAGE — one
    * modality's index cannot surface the other modality's relevant set —
    * so the fixture is built to measure exactly that: graded deterministic
    * relevance gain(id) = [doc contains all three query terms ≥3× each —
    * the q_ndcg lexical ground truth] + [id is in the exact full-precision
    * dense top-`legK` for probe 0 — the semantic ground truth] ∈ {0,1,2},
    * each leg bounded at its top-`legK` (a real index returns a short
    * result page), and the metric read at k = 2·legK. A single leg can
    * fill at most half the ideal page; the fused page draws from both —
    * fused ≥ max(single leg) is asserted in Round12OpsSpec as measured.
    * The dense-side truth is served by the dense leg itself (the exact
    * ranking IS the semantic relevance, the matryoshkaRecall convention);
    * the lexical truth is independent of the BM25 ranking, so the lex
    * leg's nDCG is a real measurement, not an identity. Rankings: BM25
    * desc, exact-integer dense cosine desc, and the RRF sum of the two
    * rank-bounded legs (the [[rrfFusion]] construction, K=60); id 0 (the
    * probe) is excluded from all three so no leg scores a document
    * another leg cannot retrieve. DCG terms accumulate as DECIMAL(28,8)
    * (the [[graft.operators.Text.ndcgAt]] discipline); IDCG is the
    * closed-form top-k of the gain counts. Output: one row per ranking
    * (lex / dense / fused) with dcg, idcg, ndcg@k. Scale: both legs are
    * index lookups + top-K; everything after is k-row frames and one
    * corpus hash-agg for the gain table.
    */
  def fusionNdcg(spark: SparkSession, sfDir: String, legK: Int = 10,
                 k: Int = 20, kRrf: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    val relLexCol = Seq("join", "hash", "scan").map(tm =>
      size(filter(split(lower(col("text")), " "), x => x === lit(tm))) >= 3)
      .reduce(_ && _)
    val lexRel = t(spark, sfDir, "documents")
      .select(col("doc_id").as("id"),
              when(relLexCol, 1L).otherwise(0L).as("g_lex"))
    val v = labeledQuantized(spark, sfDir)
    // TakeOrdered legs + rank over the legK-row result (util.Ranked); the
    // fused window below orders a join of the two bounded legs
    val lex = graft.util.Ranked.topkRanked(
        Text.bm25Scores(spark, sfDir).filter(col("doc_id") =!= 0),
        legK, "ra", col("bm25").desc, col("doc_id").asc)
      .select(col("doc_id").as("id"), col("ra"))
    val probe = v.filter(col("vec_id") === 0)
      .select(col("qv").as("pq"), col("n2").as("pn2")).limit(1)
    val cos = r4(call_function("dot_q", col("qv"), col("pq")).cast("double") /
                 (sqrt(col("n2").cast("double")) *
                  sqrt(col("pn2").cast("double"))))
    val dense = graft.util.Ranked.topkRanked(
        v.crossJoin(broadcast(probe))
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id").as("id"), cos.as("cos")),
        legK, "rb", col("cos").desc, col("id").asc)
      .select(col("id"), col("rb"))
    // semantic truth = the exact dense top-legK itself (the ranking the
    // dense leg serves IS the full-precision semantic ground truth)
    val semRel = dense.select(col("id"), lit(1L).as("g_sem"))
    val gain = lexRel.join(semRel, Seq("id"), "full_outer")
      .select(col("id"),
              (coalesce(col("g_lex"), lit(0L)) +
               coalesce(col("g_sem"), lit(0L))).as("gain"))
      .filter(col("id") =!= 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rrf = coalesce(lit(1.0) / (lit(kRrf) + col("ra")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(kRrf) + col("rb")), lit(0.0))
    val fused = lex.join(dense, Seq("id"), "full_outer")
      .select(col("id"), r4(rrf).as("rrf_score"))
      .withColumn("i", row_number().over(
        Window.orderBy(col("rrf_score").desc, col("id").asc)))
      .filter(col("i") <= k).select(col("id"), col("i"))
    def dcgOf(ranking: DataFrame, name: String): DataFrame =
      ranking.join(gain, Seq("id"), "left")
        .select(col("i"), coalesce(col("gain"), lit(0L)).as("g"))
        .agg(sum((col("g").cast("double") /
                  log2(col("i").cast("double") + 1.0))
               .cast("decimal(28,8)")).as("dcg"))
        .select(lit(name).as("ranking"), col("dcg"))
    val lexK = lex.filter(col("ra") <= k).select(col("id"), col("ra").as("i"))
    val denseK = dense.filter(col("rb") <= k).select(col("id"), col("rb").as("i"))
    val idcg = gain
      .agg(sum(when(col("gain") === 2, 1L).otherwise(0L)).as("n2"),
           sum(when(col("gain") === 1, 1L).otherwise(0L)).as("n1"))
      .select(explode(sequence(lit(1L), lit(k.toLong))).as("i"),
              col("n2"), col("n1"))
      .select(when(col("i") <= col("n2"), 2L)
                .when(col("i") <= col("n2") + col("n1"), 1L)
                .otherwise(0L).as("g"), col("i"))
      .agg(sum((col("g").cast("double") /
                log2(col("i").cast("double") + 1.0))
             .cast("decimal(28,8)")).as("idcg"))
    val legs = Seq(dcgOf(lexK, "lex"), dcgOf(denseK, "dense"),
                   dcgOf(fused, "fused")).reduce(_ unionByName _)
    ordered(
      legs.crossJoin(broadcast(idcg))
        .select(col("ranking"), r4(col("dcg").cast("double")).as("dcg"),
                r4(col("idcg").cast("double")).as("idcg"),
                r4(col("dcg").cast("double") /
                   col("idcg").cast("double")).as("ndcg")),
      "ranking")
  }

  /** kNN label-noise screen (the Wilson/ENN-style edit rule every
    * labeled-dataset cleaning pass runs): a vector whose k=5 nearest
    * neighbors' majority label disagrees with its own label is flagged as
    * probable noise; emitted as a per-label noise-rate report. Neighbors
    * by the same exact-integer dot_q cosine; the k-cut is
    * [[graft.util.TopK.perGroup]] per anchor on the r4 score with b_id
    * tiebreak (engine-portable) — phase 1's per-(anchor, partition)
    * local top-k runs where the pair stream is born (the nested-loop
    * join's output is already anchor-partitioned), so only ~k rows per
    * anchor ever shuffle instead of the full n² pair stream (the plain
    * rank-window draft shuffled 4·10⁸ rows at the 10× decade and walled
    * >10 min; this one is 10× cheaper on the same data). Majority =
    * max (votes, −label): vote ties break to the smaller label,
    * deterministically. Same n²-scoring scale shape as [[hardNegatives]]
    * with the same LSH swap-in at 100 TB.
    */
  def knnLabelNoise(spark: SparkSession, sfDir: String,
                    k: Int = 5): DataFrame = {
    val v = labeledQuantized(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = v.select(col("vec_id").as("a_id"), col("label").as("a_label"),
                     col("qv").as("qa"), col("n2").as("na2"))
    val b = v.select(col("vec_id").as("b_id"), col("label").as("b_label"),
                     col("qv").as("qb"), col("n2").as("nb2"))
    val cos = r4(call_function("dot_q", col("qa"), col("qb")).cast("double") /
                 (sqrt(col("na2").cast("double")) *
                  sqrt(col("nb2").cast("double"))))
    // pre-partition the ANCHOR side (a 20k-row exchange): the nested-loop
    // join preserves the streamed side's partitioning, and
    // HashPartitioning(a_id) satisfies both TopK windows' clustering, so
    // the n² pair stream is scored, locally sorted, and k-cut IN PLACE —
    // without this the window exchanged all 4·10⁸ pairs at the 10× decade
    // (~17 GB shuffle) and the query walled >10 min; with it the pair
    // stream never leaves its producing task
    val knn = graft.util.TopK.perGroup(
      a.repartition(col("a_id"))
        .join(b, col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("a_label"), col("b_id"), col("b_label"),
                cos.as("cos")),
      Seq(col("a_id"), col("a_label")),
      Seq(col("cos").desc, col("b_id").asc), k)
    val voted = knn.groupBy(col("a_id"), col("a_label"), col("b_label"))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col("a_id"), col("a_label"))
      .agg(max(struct(col("votes").as("v"), (-col("b_label")).as("nl")))
             .as("m"))
      .select(col("a_id"), col("a_label"), (-col("m.nl")).as("knn_label"))
    ordered(
      voted.groupBy(col("a_label").as("label"))
        .agg(count(lit(1)).as("n_vectors"),
             sum(when(col("knn_label") =!= col("a_label"), 1L).otherwise(0L))
               .as("n_flagged"))
        .select(col("label"), col("n_vectors"), col("n_flagged"),
                r4(col("n_flagged").cast("double") /
                   col("n_vectors").cast("double")).as("noise_rate")),
      "label")
  }
}
