package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wire-format streaming adapters for the HTTP-payload lane — the
  * reference's declared real-time growth path (ref README.md:390 lists
  * "real-time data ingestion" as future work; ref etl/extract_weather.py
  * is the batch fetch it would replace) expressed in Structured Streaming.
  *
  * Two arrival shapes, one parser:
  *  - **socket**: a newline-delimited feed (Spark's built-in `socket`
  *    source — one `value: String` column), for a push producer;
  *  - **rate-limited replay**: a landed payload snapshot re-emitted at a
  *    bounded rows/second using the built-in `rate` source as the pacing
  *    clock — the backfill-throttle shape ("replay yesterday's landing
  *    zone into the live pipeline without swamping it").
  *
  * Both feed [[parsePayloadLines]], whose output schema and quarantine
  * contract are IDENTICAL to the batch lane
  * ([[graft.sources.HttpSnapshotSource.read]]): `(city_name,
  * payload_json, source_file, fetch_attempts, payload_ok)`, clean rows
  * flowing to [[graft.sources.WeatherApiSource.parsePayloads]] unchanged.
  * StreamingSpec proves batch ≡ stream row-for-row on the adapter, so the
  * real-time path inherits the batch lane's verified semantics.
  *
  * Scale: the parser is stateless per-line projection (no shuffle, no
  * state store); socket fan-in is bounded by the receiver, and the rate
  * replay's only join is stream-static on a precomputed dense rank —
  * broadcast-sized ticks against a pruned static scan.
  */
object WireIngest {

  /** Wire format: one payload per line, `city_name<TAB>payload_json`.
    * Serialized JSON never contains a raw tab, so the FIRST tab splits
    * unambiguously; lines with no tab or malformed JSON arrive with
    * `payload_ok = false` and divert to quarantine downstream — the
    * landing zone trusts nothing (CsvQuarantine discipline).
    */
  def formatLine(city: String, payloadJson: String): String =
    s"$city\t$payloadJson"

  /** Parse a one-column `value: String` frame (the schema of the `socket`
    * source, MemoryStream[String], and the rate replay below) into the
    * batch lane's snapshot schema. `payload_ok` uses the same Jackson
    * validity probe as the batch reader (`get_json_object($)` is null
    * exactly when the payload is not syntactically valid JSON).
    */
  def parsePayloadLines(lines: DataFrame,
                        sourceTag: String = "socket"): DataFrame = {
    val tab = instr(col("value"), "\t")
    val city = when(tab > 0, substring_index(col("value"), "\t", 1))
      .otherwise(lit(""))
    val payload = when(tab > 0, expr("substring(value, instr(value, '\t') + 1)"))
      .otherwise(col("value"))
    lines.select(
      city.as("city_name"),
      payload.as("payload_json"),
      lit(sourceTag).as("source_file"),
      lit(1).as("fetch_attempts"),
      (tab > 0 && length(trim(city)) > 0 &&
        get_json_object(payload, "$").isNotNull).as("payload_ok"))
  }

  /** Socket adapter: newline-delimited `city\tpayload` lines from a TCP
    * endpoint, parsed into the snapshot schema. The `socket` source is
    * at-most-once by nature (dev/bridge tier, exactly like its Spark
    * upstream documents); production durability comes from landing the
    * parsed stream through [[StreamOps.ingestStream]]'s idempotent
    * batch-versioned sinks.
    */
  def socketPayloadStream(spark: SparkSession, host: String,
                          port: Int): DataFrame =
    parsePayloadLines(
      spark.readStream.format("socket")
        .option("host", host).option("port", port).load(),
      sourceTag = s"socket://$host:$port")

  /** Rate-limited replay of a landed payload snapshot (parquet dir with
    * `city_name`, `payload_json` columns): tick k of the `rate` source
    * releases the row with dense arrival rank k. Emits each payload
    * exactly once, paced at `rowsPerSec`, then goes quiet — bounded
    * backfill pressure by construction rather than by sink backoff.
    * The static side computes its rank once (one window over the landed
    * snapshot — batch-side, allowed); each micro-batch then inner-joins
    * the tick range against that rank, a stream-static equi-join Spark
    * plans as a pruned hash join.
    */
  def ratePayloadReplay(spark: SparkSession, snapshotDir: String,
                        rowsPerSec: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = spark.read.parquet(snapshotDir)
      .withColumn("_rk",
        row_number().over(
          Window.orderBy(col("city_name").asc, col("payload_json").asc)) - 1)
    val ticks = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSec.toString).load()
      .select(col("value").as("_rk"))
    parsePayloadLines(
      ticks.join(ranked, Seq("_rk"))
        .select(concat_ws("\t", col("city_name"), col("payload_json"))
                  .as("value")),
      sourceTag = s"replay:$snapshotDir")
  }
}
