package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed CSV ingestion with a quarantine lane — the flat-file sibling of
  * [[WeatherApiSource]]'s JSON staging. The reference's extract trusts its
  * API client to hand it clean values (extract_weather.py:57–65, no
  * validation); a warehouse landing zone cannot: a malformed row must
  * neither kill the load (FAILFAST) nor silently vanish (DROPMALFORMED).
  *
  * PERMISSIVE parsing with an explicit `_corrupt_record` column splits the
  * input into (typed clean rows, quarantined raw lines + load metadata) in
  * ONE pass over the files. The quarantine table is what the reference's
  * email-alert step (run_etl_bat:20–27) would attach: the exact offending
  * lines, replayable after a schema fix.
  *
  * Scale notes: schema is declared, never inferred (inference = an extra
  * full scan of 100 TB); the split is two filters over one scan — Spark
  * requires the parsed frame be materialized before `_corrupt_record` can
  * be referenced alone (SPARK-21610), hence the localized persist, released
  * by the caller via [[IngestResult.unpersist]].
  */
object CsvQuarantine {

  final case class IngestResult(clean: DataFrame, quarantine: DataFrame) {
    def unpersist(): Unit = { clean.sparkSession.catalog.clearCache() }
  }

  val CorruptCol = "_corrupt_record"

  /** Read `path` as CSV against `schema` (plus the corrupt-record lane).
    * `clean` carries exactly the declared columns; `quarantine` carries the
    * raw offending line plus the source file and ingest partition for
    * replay/alerting.
    */
  def readTyped(spark: SparkSession, path: String, schema: StructType,
                header: Boolean = true): IngestResult = {
    val withCorrupt = schema.add(StructField(CorruptCol, StringType))
    // load metadata must be captured ON the file scan — input_file_name()
    // evaluates empty above a cached (InMemoryRelation) scan
    val raw = spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt)
      .csv(path)
      .withColumn("_source_file", input_file_name())
      .withColumn("_ingest_partition", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clean = raw.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantine = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"),
              col("_source_file").as("source_file"),
              col("_ingest_partition").as("ingest_partition"))
    IngestResult(clean, quarantine)
  }
}
