package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Range/interval join shapes (SURVEY §2.2: absent from the reference;
  * part of a complete join family).
  *
  * Two scale-distinct cases:
  *  - interval join WITH an equi key: hash-join on the key, range predicate
  *    as a residual filter — free, the range never drives the join;
  *  - pure range join (no equi key): band the range into coarse buckets so
  *    candidates meet only within a bucket — turns O(n²) comparisons into
  *    Σ per-bucket products, the same blocking idea as LSH.
  */
object RangeJoins {

  /** Lineitems shipped within 90 days of their order's date: equi join on
    * the order key carries the work; `BETWEEN` is a cheap residual.
    */
  def intervalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_date"))
    val li = t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
              col("l_suppkey"), col("l_shipdate").cast("date").as("ship_date"))
    ordered(
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("ship_date") >= col("o_date") &&
                col("ship_date") <= date_add(col("o_date"), 90))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
                col("l_suppkey"), col("o_date"), col("ship_date")),
      "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
      "o_date", "ship_date")
  }

  /** Pure range self-join, banded: pairs of distinct events within 1 second
    * of each other. Each event lands in its epoch-second bucket AND the
    * next (explode two band keys), so any pair ≤1 s apart shares a bucket;
    * the exact |Δt| ≤ 1 s predicate filters residually and doc_a < doc_b
    * plus dropDuplicates kills the double-count from pairs sharing two
    * buckets. Join volume is Σ per-second-bucket count² — linear for
    * time-spread events, never n².
    */
  def rangeBandJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val usPerSec = 1000000L
    val ev = events(spark, sfDir).select(col("event_id"), col("ts_us"))
    val banded = ev.select(col("event_id"), col("ts_us"),
      explode(array(expr(s"ts_us div $usPerSec"),
                    expr(s"ts_us div $usPerSec") + 1)).as("band"))
    val a = banded.select(col("band"), col("event_id").as("id_a"), col("ts_us").as("ts_a"))
    val b = banded.select(col("band"), col("event_id").as("id_b"), col("ts_us").as("ts_b"))
    ordered(
      a.join(b, Seq("band"))
        .filter(col("id_a") < col("id_b") &&
                abs(col("ts_a") - col("ts_b")) <= usPerSec)
        .select(col("id_a"), col("id_b"),
                (col("ts_b") - col("ts_a")).as("delta_us"))
        .dropDuplicates("id_a", "id_b"),
      "id_a", "id_b")
  }
}
