package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for a directory of pre-fetched HTTP payloads — the
  * engine-side half of the reference's extract loop (ref
  * /root/reference/etl/extract_weather.py:37–54; README.md:179–198): one
  * file per fetched city payload, read as `graft-http-snapshot` rows
  * `(city_name, payload_json, source_file, fetch_attempts, payload_ok)`.
  *
  * The reference's operational semantics map onto Spark's execution model
  * instead of a driver-side polling loop:
  *  - **retry budget**: extract_weather.py retries each city 3× with a
  *    60 s sleep. Here each FILE is one [[InputPartition]], and the
  *    partition reader retries a failed open/read up to `retries` times
  *    (default 3) sleeping `retryDelayMs` between attempts (default 0 —
  *    a production mirror of the reference would set 60000). Task-level
  *    retry (spark.task.maxFailures) then multiplies this budget, exactly
  *    as a 1000-executor cluster should: the retry unit is the payload,
  *    not the job.
  *  - **quarantine lane**: the reference trusts its client; a landing
  *    zone cannot. A payload that survives the read but is not
  *    syntactically valid JSON is flagged `payload_ok = false` — the
  *    [[HttpSnapshotSource.read]] companion splits the frame into
  *    (clean, quarantine) with the same contract as [[CsvQuarantine]],
  *    so a malformed payload neither kills the load nor vanishes.
  *  - **fault injection**: `injectFailures=N` makes the first N read
  *    attempts of every matching file (`injectPathContains`) throw — the
  *    chaos hook the retry spec drives; a no-op unless explicitly set.
  *
  * Scale: file listing is one driver-side FS call; each payload parses on
  * its partition (cf. [[WeatherApiSource.parsePayloads]] for the
  * downstream explode), so 10⁶ payloads fan out like 5.
  */
class HttpSnapshotSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-http-snapshot"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpSnapshotSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new HttpSnapshotTable(new CaseInsensitiveStringMap(properties))
}

object HttpSnapshotSource {
  val schema: StructType = StructType(Seq(
    StructField("city_name", StringType, nullable = false),
    StructField("payload_json", StringType, nullable = false),
    StructField("source_file", StringType, nullable = false),
    StructField("fetch_attempts", IntegerType, nullable = false),
    StructField("payload_ok", BooleanType, nullable = false)))

  /** Clean/quarantine split over the snapshot table — the
    * [[CsvQuarantine.IngestResult]] contract for the HTTP lane: `clean`
    * feeds [[WeatherApiSource.parsePayloads]]; `quarantine` carries the
    * raw payload + provenance for replay/alerting.
    */
  def read(spark: SparkSession, dir: String): CsvQuarantine.IngestResult = {
    val all = spark.read.format("graft-http-snapshot").option("path", dir).load()
    CsvQuarantine.IngestResult(
      clean = all.filter(col("payload_ok"))
        .select(col("city_name"), col("payload_json")),
      quarantine = all.filter(!col("payload_ok"))
        .select(col("payload_json").as("raw_payload"),
                col("source_file"), col("fetch_attempts")))
  }

  /** Per-JVM attempt counters backing the `injectFailures` chaos option
    * (keyed by file path, so retry N+1 of the same payload succeeds).
    */
  private[sources] val attemptCounters = new ConcurrentHashMap[String, AtomicInteger]()

  /** Clear the per-JVM injection counters (chaos tests between scenarios). */
  def resetInjection(): Unit = attemptCounters.clear()
}

private[sources] class HttpSnapshotTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft-http-snapshot(${options.get("path")})"
  override def schema(): StructType = HttpSnapshotSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(caseInsensitiveOptions)
    new HttpSnapshotScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private[sources] class HttpSnapshotScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = HttpSnapshotSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-http-snapshot requires a 'path' option"))
    val spark = SparkSession.active
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // one partition per payload file: the file IS the retry unit, matching
    // the reference's per-city fetch loop
    fs.listStatus(root).iterator
      .filter(s => s.isFile && !s.getPath.getName.startsWith(("_")) &&
                   !s.getPath.getName.startsWith("."))
      .map(s => HttpSnapshotPartition(s.getPath.toString): InputPartition)
      .toArray
      .sortBy(_.asInstanceOf[HttpSnapshotPartition].path)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new HttpSnapshotReaderFactory(
      retries = Option(options.get("retries")).map(_.toInt).getOrElse(3),
      retryDelayMs = Option(options.get("retryDelayMs")).map(_.toLong).getOrElse(0L),
      injectFailures = Option(options.get("injectFailures")).map(_.toInt).getOrElse(0),
      injectPathContains = Option(options.get("injectPathContains")).getOrElse(""))
}

private[sources] final case class HttpSnapshotPartition(path: String) extends InputPartition

private[sources] class HttpSnapshotReaderFactory(
    retries: Int, retryDelayMs: Long,
    injectFailures: Int, injectPathContains: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new HttpSnapshotReader(partition.asInstanceOf[HttpSnapshotPartition].path,
                           retries, retryDelayMs, injectFailures, injectPathContains)
}

private[sources] class HttpSnapshotReader(
    path: String, retries: Int, retryDelayMs: Long,
    injectFailures: Int, injectPathContains: String)
    extends PartitionReader[InternalRow] {

  private var done = false
  private var row: InternalRow = _

  private def readOnce(): String = {
    if (injectFailures > 0 && injectPathContains.nonEmpty &&
        path.contains(injectPathContains)) {
      val n = HttpSnapshotSource.attemptCounters
        .computeIfAbsent(path, _ => new AtomicInteger(0)).incrementAndGet()
      if (n <= injectFailures)
        throw new java.io.IOException(s"injected transient failure $n for $path")
    }
    val p = new Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, "UTF-8")
    } finally in.close()
  }

  override def next(): Boolean = {
    if (done) return false
    var attempt = 0
    var payload: String = null
    var lastErr: Throwable = null
    while (payload == null && attempt < retries) {
      attempt += 1
      try payload = readOnce()
      catch {
        case e: java.io.IOException =>
          lastErr = e
          if (attempt < retries && retryDelayMs > 0) Thread.sleep(retryDelayMs)
      }
    }
    if (payload == null)
      throw new java.io.IOException(
        s"payload $path failed after $retries attempts (ref extract_weather.py:53)", lastErr)
    val fileName = new Path(path).getName
    val city = fileName.lastIndexOf('.') match {
      case -1 => fileName
      case i  => fileName.substring(0, i)
    }
    val ok = try {
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(payload)
      true
    } catch { case _: Exception => false }
    row = InternalRow(
      UTF8String.fromString(city),
      UTF8String.fromString(payload),
      UTF8String.fromString(path),
      attempt,
      ok)
    done = true
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
