package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for joins whose hot keys overwhelm single
  * reducers at scale (SURVEY §7.5.6; the prompt's "salting for skew").
  *
  * AQE's skew-join handles sort-merge skew automatically (enabled in
  * Sessions.tune); explicit salting remains necessary when (a) the skewed
  * side feeds an aggregation before the join, or (b) a deterministic plan
  * is preferred over runtime re-splitting. The salt is derived from a
  * stable hash of a spread column — never rand() — so retried tasks and
  * re-runs produce identical results (hash-match discipline).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key` with the big side's hot keys spread
    * over `salts` buckets: big rows get salt = hash(spreadCol) % salts;
    * the small side is replicated `salts` times with an exploded salt
    * column. Join key becomes (key, salt). Shuffle of the big side spreads
    * a hot key across `salts` reducers; the small side grows ×salts, which
    * is the standard trade (small side must be modest — it usually is,
    * else the join would broadcast anyway).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 spreadCol: String, salts: Int): DataFrame = {
    val salted = big.withColumn("salt",
      pmod(xxhash64(col(spreadCol)), lit(salts.toLong)).cast("int"))
    val replicated = small.withColumn("salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "salt")).drop("salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys: first
    * aggregate on (key, salt) — spreading a hot key over `salts` reducers —
    * then combine the partials per key. `partialAggs` must be decomposable
    * (sum/count/min/max); avg is sum/count at the final step.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     salts: Int): DataFrame = {
    val salted = df.withColumn("salt",
      pmod(xxhash64(col(valueCol)), lit(salts.toLong)).cast("int"))
    salted.groupBy(col(key), col("salt"))
      .agg(sum(col(valueCol)).as("s"), count(lit(1)).as("c"))
      .groupBy(col(key))
      .agg(sum(col("s")).as("sum_value"), sum(col("c")).as("n_rows"))
  }
}
