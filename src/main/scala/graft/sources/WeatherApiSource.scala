package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's extract step re-expressed Spark-natively (ref
  * /root/reference/etl/extract_weather.py:39–65 and README.md:40–43).
  *
  * The reference fetches Open-Meteo JSON per city and walks the
  * struct-of-parallel-arrays payload row by row over ODBC. Its design doc
  * declares the alternative it never implemented: land the raw JSON and
  * parse in the warehouse. This module implements that declared-intent
  * shape: a DataFrame of raw payload strings → explicit-schema from_json →
  * arrays_zip → posexplode → typed staging rows. Fetching/retry itself
  * (extract_weather.py:37–54) is an ingestion concern outside the engine
  * (SURVEY §2 op 23) — payloads arrive as data.
  *
  * Scale: one JSON payload expands to thousands of rows inside codegen on
  * whatever partition it lives on — no driver loop, no row-at-a-time
  * inserts; 10⁶ payloads parse exactly like 5.
  */
object WeatherApiSource {

  /** Explicit payload schema (never inferred — the reference's DDL-first
    * discipline): daily.time[i] / temperature_2m_max[i] / …_min[i] /
    * precipitation_sum[i] are parallel arrays indexed together.
    */
  val payloadSchema: StructType = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("daily", StructType(Seq(
      StructField("time", ArrayType(StringType)),
      StructField("temperature_2m_max", ArrayType(DoubleType)),
      StructField("temperature_2m_min", ArrayType(DoubleType)),
      StructField("precipitation_sum", ArrayType(DoubleType)))))))

  /** (city_name, payload_json) → typed staging rows, one per day index —
    * the columnar→row unpivot the reference does in Python
    * (extract_weather.py:57–65), as a single codegen'd generator.
    */
  def parsePayloads(payloads: DataFrame): DataFrame = {
    val parsed = payloads
      .withColumn("p", from_json(col("payload_json"), payloadSchema))
      .withColumn("z", arrays_zip(
        col("p.daily.time"),
        col("p.daily.temperature_2m_max"),
        col("p.daily.temperature_2m_min"),
        col("p.daily.precipitation_sum")))
    parsed
      .select(col("city_name"), posexplode(col("z")).as(Seq("idx", "day")))
      .select(
        col("city_name"),
        col("day.time").cast("date").as("date"),
        col("day.temperature_2m_max").cast("decimal(5,2)").as("temp_max"),
        col("day.temperature_2m_min").cast("decimal(5,2)").as("temp_min"),
        col("day.precipitation_sum").cast("decimal(5,2)").as("precipitation"),
        lit(false).as("is_processed"))
  }
}
