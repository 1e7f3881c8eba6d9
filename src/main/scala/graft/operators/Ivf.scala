package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** IVF (inverted-file) approximate nearest-neighbor search — the coarse-
  * quantizer scale path for embedding similarity (the LSH alternative lives
  * in Similarity.annLshPairs).
  *
  * Build: k-means coarse centroids over the corpus (deterministic: fixed
  * seed, fixed iterations, k-means|| init via Spark ML), then assign every
  * vector to its nearest centroid — the "inverted list" is just a
  * `centroid_id` column, i.e. a partition key.
  *
  * Search: a probe scores only the vectors in its `nprobe` nearest lists —
  * at 100 TB with k=4096 lists and nprobe=8, each query touches ~0.2% of
  * the corpus, and the list assignment is a broadcast-able centroid table
  * regardless of corpus size. Exact cosine re-ranks within the probed
  * lists (same native kernel as brute force).
  */
object Ivf {

  /** Training-set cap: k-means converges on a representative sample; fitting
    * on the full corpus would be 10 full passes over 100 TB for centroids
    * that a few ×10⁴ vectors pin down just as well (IVF quantizers are
    * conventionally trained on samples, e.g. ≤256·k points).
    */
  val TrainCap = 20000L

  /** Centroids as (centroid_id, centroid float array), deterministic.
    *
    * Training is the FAISS shape: ONE cluster job collects the fixed-seed
    * sample (capped at [[TrainCap]] rows — ≤20k×64 floats ≈ 5 MB, bounded
    * at ANY corpus size) and Lloyd's iterations run driver-local. A
    * distributed fit here is the wrong tool: each of its ~15 serial
    * init/iteration jobs is a cluster-wide barrier to refine centroids
    * that a 5 MB in-process loop pins down in milliseconds. The corpus-
    * sized work — list assignment — stays fully distributed in
    * [[assignLists]].
    *
    * Cosine metric throughout (matching assignment + search), spherical
    * k-means style. Deterministic: sample rows sorted by vec_id, init =
    * k evenly spaced points of the sorted sample, fixed 5 iterations,
    * ties to the lowest centroid id.
    */
  def trainCentroids(spark: SparkSession, emb: DataFrame, k: Int): DataFrame = {
    // one cheap count (parquet row-group metadata) to size the sample
    val n = emb.count()
    val sampled =
      if (n <= TrainCap) emb
      else emb.sample(withReplacement = false, TrainCap.toDouble / n, seed = 42L)
    val pts: Array[Array[Float]] = sampled.select(col("vec_id"), col("embedding"))
      .collect()
      .sortBy(_.getAs[Long]("vec_id"))
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    val m = pts.length
    val dim = pts.head.length
    def cos(a: Array[Float], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }
    var centroids = Array.tabulate(k)(c => pts((c.toLong * m / k).toInt).map(_.toDouble))
    for (_ <- 0 until 5) {
      val sums = Array.fill(k, dim)(0.0)
      val counts = Array.fill(k)(0L)
      pts.foreach { p =>
        var best = 0; var bestSim = Double.NegativeInfinity; var c = 0
        while (c < k) {
          val s = cos(p, centroids(c))
          if (s > bestSim) { bestSim = s; best = c } // strict > ⇒ lowest id wins ties
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(k)(c =>
        if (counts(c) == 0L) centroids(c) // empty list: keep the old centroid
        else sums(c).map(_ / counts(c)))
    }
    import spark.implicits._
    centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.map(_.toFloat).toSeq) }
      .toDF("centroid_id", "centroid")
  }

  /** Assign each vector to its nearest centroid by cosine: broadcast the
    * centroid table, arg-max via max_by aggregation. The partial max_by
    * folds the n×k scored rows map-side, so the one shuffle carries a single
    * row per vector — a window row_number here would instead shuffle and
    * sort all n×k rows. Tie-break: highest sim, then LOWEST centroid_id
    * (struct max on (sim, -centroid_id)), deterministic.
    */
  def assignLists(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = emb.crossJoin(broadcast(centroids))
      .withColumn("sim", call_function("cosine_sim", col("embedding"), col("centroid")))
    scored.groupBy(col("vec_id"))
      .agg(max_by(struct(col("centroid_id"), col("embedding")),
                  struct(col("sim"), (-col("centroid_id")).as("tie"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
              col("best.centroid_id").as("centroid_id"))
  }

  /** End-to-end IVF query: top-k cosine neighbors of probe vec_id=0,
    * searching only the nprobe nearest inverted lists. No-oracle
    * (k-means internals are engine-specific); OperatorsSpec checks recall
    * against the exact brute-force top-k.
    */
  def ivfTopK(spark: SparkSession, sfDir: String, k: Int = 10,
              nLists: Int = 16, nprobe: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val emb = t(spark, sfDir, "embeddings")
    val centroids = trainCentroids(spark, emb, nLists)
    val lists = assignLists(emb, centroids)
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe_emb")).limit(1)
    // nprobe nearest lists for the probe
    val probeLists = centroids.crossJoin(broadcast(probe))
      .withColumn("sim", call_function("cosine_sim", col("centroid"), col("probe_emb")))
      .orderBy(col("sim").desc, col("centroid_id").asc)
      .limit(nprobe)
      .select(col("centroid_id"))
    lists.join(broadcast(probeLists), "centroid_id")
      .crossJoin(broadcast(probe))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
              r4(call_function("cosine_sim", col("embedding"), col("probe_emb"))).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** IVF search over int8-QUANTIZED vectors with full-precision re-rank —
    * the realistic billion-vector serving shape: the index holds 4×-smaller
    * quantized vectors (memory bandwidth is the ANN bottleneck, not
    * flops), candidate scoring runs on them, and only the shortlist (3k)
    * is re-scored at full precision. Symmetric-quantization insight: the
    * per-vector scale CANCELS in cosine, so quantized cosine needs no
    * dequantization — the int8 codes are cast to float arrays and scored
    * by the same native codegen kernel as the exact path. No-oracle
    * (k-means + quantization layouts are engine-specific); the spec
    * checks recall against brute-force exact top-k.
    */
  def ivfTopKQuantized(spark: SparkSession, sfDir: String, k: Int = 10,
                       nLists: Int = 16, nprobe: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val emb = t(spark, sfDir, "embeddings")
    // int8 codes, stored as float[] so the native cosine kernel applies
    // (every value in [-127,128] is exactly representable in float)
    val scale = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
    val qvec = transform(col("embedding"),
      x => floor(x.cast("double") / col("scale") * lit(127.0) + lit(0.5))
        .cast("float"))
    val quant = emb.withColumn("scale", scale).filter(col("scale") > 0)
      .withColumn("qvec", qvec)
    val centroids = trainCentroids(spark, emb, nLists)
    val lists = assignLists(emb, centroids)
      .select(col("vec_id"), col("centroid_id"))
    val probeQ = quant.filter(col("vec_id") === 0)
      .select(col("qvec").as("probe_q")).limit(1)
    val probeF = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe_emb")).limit(1)
    val probeLists = centroids.crossJoin(broadcast(
        emb.filter(col("vec_id") === 0).select(col("embedding").as("p")).limit(1)))
      .withColumn("sim", call_function("cosine_sim", col("centroid"), col("p")))
      .orderBy(col("sim").desc, col("centroid_id").asc)
      .limit(nprobe)
      .select(col("centroid_id"))
    // stage 1: quantized scoring inside the probed lists only
    val shortlist = quant.join(broadcast(probeLists.join(lists, "centroid_id")
        .select(col("vec_id"))), "vec_id")
      .crossJoin(broadcast(probeQ))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
              call_function("cosine_sim", col("qvec"), col("probe_q")).as("q_sim"))
      .orderBy(col("q_sim").desc, col("vec_id").asc)
      .limit(3 * k)
    // stage 2: full-precision re-rank of the shortlist
    emb.join(broadcast(shortlist.select(col("vec_id"))), "vec_id")
      .crossJoin(broadcast(probeF))
      .select(col("vec_id"),
              r4(call_function("cosine_sim", col("embedding"), col("probe_emb"))).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }
}
