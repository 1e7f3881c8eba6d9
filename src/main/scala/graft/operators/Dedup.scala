package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Near-duplicate detection for LLM-data pipelines: MinHash+LSH and SimHash.
  * Neither is ANSI-SQL-expressible (xxhash64 signatures), so these are
  * no-oracle operators — covered by unit tests instead (DedupSpec).
  *
  * Scale design: both avoid any O(n²) comparison. Candidate generation is
  * banded LSH — docs collide only inside a (band, bucket) shuffle key, so
  * the self-join is per-bucket; the full cross join never materializes.
  * Signatures are fixed-width (32 longs / 1 long), so the shuffled rows are
  * tiny regardless of document size — the 100 TB corpus shuffles ~40 bytes
  * per doc per band.
  */
object Dedup {

  val NumHashes = 32
  val Bands = 8 // → 4 rows per band; P(collide) = 1-(1-j^4)^8 for Jaccard j

  /** Per-doc MinHash signature: explode distinct 3-gram shingles, take the
    * min of xxhash64(seed, shingle) per seed. One explode + one hash-agg;
    * partial min runs map-side so the shuffle carries one row per doc.
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val sh = Text.shingleRows(docs).withColumnRenamed("s", "sh")
    val minExprs = (0 until NumHashes).map(s => min(xxhash64(lit(s), col("sh"))).as(s"h$s"))
    sh.groupBy(col("doc_id"))
      .agg(minExprs.head, minExprs.tail: _*)
      .select(col("doc_id"), array((0 until NumHashes).map(s => col(s"h$s")): _*).as("sig"))
  }

  /** LSH banding → candidate pairs → Jaccard estimate from signature
    * agreement. Returns the top-k most similar pairs (est desc, ids asc).
    */
  def minhashPairs(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val rowsPerBand = NumHashes / Bands
    val sigs = minhashSignatures(t(spark, sfDir, "documents"))
    // band hash = xxhash64 over the band's signature slice
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(array((0 until Bands).map { b =>
        xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => element_at(col("sig"), i + 1)): _*)
      }: _*)).as(Seq("band_id", "band_hash")))
    val a = banded.select(col("band_id"), col("band_hash"),
                          col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band_id"), col("band_hash"),
                          col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    val cand = a.join(b, Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    val matches = size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
                              m => m))
    cand.select(col("doc_a"), col("doc_b"),
                r4(matches.cast("double") / lit(NumHashes.toDouble)).as("jaccard_est"))
      .orderBy(col("jaccard_est").desc, col("doc_a").asc, col("doc_b").asc)
      .limit(k)
  }

  /** Per-doc 64-bit SimHash over word hashes: bit b is the sign of
    * Σ_words (±1 by bit b of xxhash64(word)). One explode + one agg with 64
    * partial sums, then bits packed into a single long.
    */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map { bitPos =>
      sum(when(shiftright(col("h"), bitPos).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$bitPos")
    }
    val packed = (0 until 64)
      .map(bitPos => when(col(s"b$bitPos") > 0, shiftleft(lit(1L), bitPos)).otherwise(lit(0L)))
      .reduce(_ + _)
    words.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
  }

  /** SimHash near-dup pairs: candidates from 4×16-bit chunk collisions
    * (a pair within Hamming distance 3 must agree on ≥1 chunk — standard
    * pigeonhole banding), then exact Hamming distance via bit_count(xor).
    */
  def simhashPairs(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val sigs = simhashSignatures(t(spark, sfDir, "documents"))
    val chunked = sigs.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk_id", "chunk")))
    val a = chunked.select(col("chunk_id"), col("chunk"),
                           col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    val b = chunked.select(col("chunk_id"), col("chunk"),
                           col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    val cand = a.join(b, Seq("chunk_id", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand.select(col("doc_a"), col("doc_b"),
                bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .orderBy(col("hamming").asc, col("doc_a").asc, col("doc_b").asc)
      .limit(k)
  }
}
