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

  /** Centroids as (centroid_id, centroid float array), deterministic: the
    * k-means fit runs on a fixed-seed sample capped at [[TrainCap]] rows —
    * never the full corpus.
    */
  def trainCentroids(spark: SparkSession, emb: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // one cheap count (parquet row-group metadata) to size the sample
    val n = emb.count()
    val sampled =
      if (n <= TrainCap) emb
      else emb.sample(withReplacement = false, TrainCap.toDouble / n, seed = 42L)
    // persist the sampled features: k-means makes one pass per iteration,
    // and without it every pass would re-scan + re-sample the corpus
    val feats = sampled.select(
      array_to_vector(col("embedding").cast("array<double>")).as("features"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // random init (fixed seed) instead of k-means||: the || init alone runs
    // ~2 passes per init step — more jobs than the fit itself — and on a
    // coarse quantizer recall is centroid-coverage-driven, not init-driven
    // (DedupSimilaritySpec pins the recall bound). 5 iterations suffice for
    // a stable coarse partition; IVF lists don't need converged centroids.
    val model = new KMeans().setK(k).setSeed(42L).setMaxIter(5)
      .setInitMode("random")
      .setFeaturesCol("features").fit(feats)
    feats.unpersist()
    import spark.implicits._
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) }
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
      .select(col("embedding").as("probe_emb"))
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
}
