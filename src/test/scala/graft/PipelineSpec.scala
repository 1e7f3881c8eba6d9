package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.WeatherEtl

/** End-to-end test of the composed reference lifecycle (SURVEY §3.4) on
  * weather-shaped fixtures covering every documented quirk (FIXTURES.md §B):
  * duplicate staging keys, single-null imputation rows, 1-row and
  * zero-variance cities, a never-seen dim city, matched + unmatched merge
  * keys.
  */
class PipelineSpec extends SparkSpec {

  private def stg: DataFrame = {
    import spark.implicits._
    Seq(
      // duplicate (city, date) — dedup keeps the max-temp row
      ("London", "2024-01-01", "10.00", "3.00", "1.00", false),
      ("London", "2024-01-01", "11.00", "4.00", "0.00", false),
      // missing temp_max → BOTH temps overwritten by (city, month) averages
      ("London", "2024-01-02", null, "5.00", "0.50", false),
      ("London", "2024-01-03", "14.00", "6.00", "0.00", false),
      // zero-variance city: stddev = 0 → z-score guard keeps values
      ("Dubai", "2024-01-01", "30.00", "20.00", "0.00", false),
      ("Dubai", "2024-01-02", "30.00", "21.00", "0.00", false),
      ("Dubai", "2024-01-03", "30.00", "22.00", "0.00", false),
      // 1-row city: stddev NULL → guard keeps value
      ("Oslo", "2024-01-01", "-5.00", "-12.00", "2.00", false),
      // city absent from dim → SCD insert-new
      ("Lahore", "2024-01-01", "25.00", "15.00", "0.00", false),
    ).toDF("city_name", "date_s", "tmax_s", "tmin_s", "prec_s", "is_processed")
      .select(col("city_name"), col("date_s").cast("date").as("date"),
              col("tmax_s").cast("decimal(5,2)").as("temp_max"),
              col("tmin_s").cast("decimal(5,2)").as("temp_min"),
              col("prec_s").cast("decimal(5,2)").as("precipitation"),
              col("is_processed"))
  }

  private def dim: DataFrame = {
    import spark.implicits._
    Seq((1, "London"), (2, "Dubai"), (3, "Oslo"))
      .toDF("city_id", "city_name")
      .withColumn("country", lit(null).cast("string"))
  }

  private def fact: DataFrame = {
    import spark.implicits._
    // existing (London, 2024-01-01) row — must be UPDATED by the merge
    Seq((1, "2024-01-01", "9.00", "2.00", "0.10"))
      .toDF("city_id", "date_s", "tmax_s", "tmin_s", "prec_s")
      .select(col("city_id"), col("date_s").cast("date").as("date"),
              col("tmax_s").cast("decimal(5,2)").as("temp_max"),
              col("tmin_s").cast("decimal(5,2)").as("temp_min"),
              col("prec_s").cast("decimal(5,2)").as("precipitation"),
              lit("2024-01-01 00:00:00").cast("timestamp").as("load_timestamp"))
  }

  test("dedup keeps exactly one deterministic row per (city, date)") {
    val d = WeatherEtl.dedupStaging(stg)
    assert(d.count() === 8)
    val kept = d.filter(col("city_name") === "London" && col("date") === lit("2024-01-01").cast("date"))
      .select("temp_max").collect().map(_.getDecimal(0).toPlainString)
    assert(kept.toSeq === Seq("11.00")) // max-temp tiebreaker, not arbitrary
  }

  test("dedup is idempotent") {
    val once = WeatherEtl.dedupStaging(stg)
    val twice = WeatherEtl.dedupStaging(once)
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("dedup scopes to unprocessed rows only (transform_load.sql:14 semantics)") {
    import spark.implicits._
    // a key duplicated across the flag: one processed, one unprocessed —
    // the reference CTE filters is_processed = 0, so BOTH rows survive;
    // two unprocessed duplicates still collapse to one
    val s = Seq(
      ("Paris", "2024-02-01", "8.00", true),
      ("Paris", "2024-02-01", "9.00", false),
      ("Rome", "2024-02-01", "12.00", false),
      ("Rome", "2024-02-01", "13.00", false))
      .toDF("city_name", "date_s", "tmax_s", "is_processed")
      .select(col("city_name"), col("date_s").cast("date").as("date"),
              col("tmax_s").cast("decimal(5,2)").as("temp_max"),
              lit(null).cast("decimal(5,2)").as("temp_min"),
              lit(null).cast("decimal(5,2)").as("precipitation"),
              col("is_processed"))
    val d = WeatherEtl.dedupStaging(s)
    assert(d.filter(col("city_name") === "Paris").count() === 2)
    val rome = d.filter(col("city_name") === "Rome")
    assert(rome.count() === 1)
    assert(rome.select("temp_max").head().getDecimal(0).toPlainString === "13.00")
  }

  test("imputation fills BOTH temps when either is NULL (reference quirk)") {
    val i = WeatherEtl.imputeMissing(WeatherEtl.dedupStaging(stg))
    val r = i.filter(col("city_name") === "London" && col("date") === lit("2024-01-02").cast("date"))
      .select("temp_max", "temp_min").head()
    // London Jan avgs over non-null values: max (11+14)/2 = 12.50; the
    // present temp_min 5.00 is ALSO overwritten by avg(4,5,6) = 5.00
    assert(r.getDecimal(0).toPlainString === "12.50")
    assert(r.getDecimal(1).toPlainString === "5.00")
    // rows with both temps present are untouched
    val untouched = i.filter(col("city_name") === "Dubai").select("temp_max")
      .collect().map(_.getDecimal(0).toPlainString).toSet
    assert(untouched === Set("30.00"))
  }

  test("z-score capping survives zero-variance and single-row groups") {
    val c = WeatherEtl.capOutliers(WeatherEtl.imputeMissing(WeatherEtl.dedupStaging(stg)))
    // Dubai sigma=0 → unchanged; Oslo 1-row sigma NULL → unchanged
    assert(c.filter(col("city_name") === "Dubai").select("temp_max")
      .collect().forall(_.getDecimal(0).toPlainString == "30.00"))
    assert(c.filter(col("city_name") === "Oslo").head().getAs[java.math.BigDecimal]("temp_max")
      .toPlainString === "-5.00")
  }

  test("full batch: dim gains only the unseen city; fact upserts + inserts") {
    val (newDim, newFact, processed) = WeatherEtl.runBatch(stg, dim, fact)
    // dim: 3 existing + Lahore with a freshly assigned surrogate id
    // (IDENTITY semantics); non-key attributes stay NULL like the reference
    assert(newDim.count() === 4)
    val lahore = newDim.filter(col("city_name") === "Lahore").head()
    assert(lahore.getAs[Int]("city_id") === 4)
    assert(lahore.isNullAt(lahore.fieldIndex("country")))
    // fact: 8 deduped staging rows land on (city,date) keys; the matched
    // (London, 2024-01-01) row is updated not duplicated
    assert(newFact.count() === 8)
    val updated = newFact.filter(col("city_id") === 1 && col("date") === lit("2024-01-01").cast("date")).head()
    assert(updated.getAs[java.math.BigDecimal]("temp_max").toPlainString === "11.00")
    // staging: every row flagged processed
    assert(processed.filter(!col("is_processed")).isEmpty)
  }

  test("re-running the merge with the same source is a no-op (idempotence)") {
    val cleaned = WeatherEtl.capOutliers(WeatherEtl.imputeMissing(WeatherEtl.dedupStaging(stg)))
    val d2 = WeatherEtl.dimInsertNew(dim, cleaned)
    val f1 = WeatherEtl.factMerge(fact, cleaned, d2).drop("load_timestamp")
    val f2 = WeatherEtl.factMerge(f1.withColumn("load_timestamp", current_timestamp()),
                                  cleaned, d2).drop("load_timestamp")
    assert(f1.exceptAll(f2).isEmpty && f2.exceptAll(f1).isEmpty)
  }
}
