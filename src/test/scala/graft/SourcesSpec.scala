package graft

import org.apache.spark.sql.functions._
import graft.sources.WeatherApiSource

/** The raw-JSON staging shape declared in the reference design
  * (README.md:40–43) — payload → from_json → arrays_zip → posexplode →
  * typed staging rows, including the reference's null-precipitation case.
  */
class SourcesSpec extends SparkSpec {

  private val londonPayload =
    """{"latitude": 51.5, "longitude": -0.12,
       |"daily": {"time": ["2024-01-01", "2024-01-02", "2024-01-03"],
       |"temperature_2m_max": [10.5, 11.25, null],
       |"temperature_2m_min": [3.1, 4.0, 2.5],
       |"precipitation_sum": [0.0, null, 1.75]}}""".stripMargin

  test("payload unpivots to one typed row per day index") {
    import spark.implicits._
    val rows = WeatherApiSource.parsePayloads(
      Seq(("London", londonPayload)).toDF("city_name", "payload_json"))
    assert(rows.count() === 3)
    assert(rows.schema("date").dataType.typeName === "date")
    assert(rows.schema("temp_max").dataType.typeName === "decimal(5,2)")
    val day2 = rows.filter(col("date") === lit("2024-01-02").cast("date")).head()
    assert(day2.getAs[java.math.BigDecimal]("temp_max").toPlainString === "11.25")
    assert(day2.isNullAt(day2.fieldIndex("precipitation"))) // nulls survive
    // parallel arrays stay index-aligned (the extract loop's invariant)
    val day3 = rows.filter(col("date") === lit("2024-01-03").cast("date")).head()
    assert(day3.isNullAt(day3.fieldIndex("temp_max")))
    assert(day3.getAs[java.math.BigDecimal]("precipitation").toPlainString === "1.75")
  }

  test("malformed payload yields null-parsed rows, not a crash") {
    import spark.implicits._
    val rows = WeatherApiSource.parsePayloads(
      Seq(("Nowhere", "{not json")).toDF("city_name", "payload_json"))
    assert(rows.count() === 0) // posexplode of null zip → no rows
  }

  test("parsed staging feeds the ETL pipeline end-to-end") {
    import spark.implicits._
    val stg = WeatherApiSource.parsePayloads(
      Seq(("London", londonPayload)).toDF("city_name", "payload_json"))
    val dim = Seq((1, "London")).toDF("city_id", "city_name")
    val emptyFact = Seq.empty[(Int, java.sql.Date)].toDF("city_id", "date")
      .withColumn("temp_max", lit(null).cast("decimal(5,2)"))
      .withColumn("temp_min", lit(null).cast("decimal(5,2)"))
      .withColumn("precipitation", lit(null).cast("decimal(5,2)"))
      .withColumn("load_timestamp", lit(null).cast("timestamp"))
    val (newDim, newFact, _) = graft.pipeline.WeatherEtl.runBatch(stg, dim, emptyFact)
    assert(newDim.count() === 1)
    assert(newFact.count() === 3) // all three days inserted
  }

  test("CSV quarantine: clean rows typed, malformed lines quarantined verbatim, nothing lost") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("csvq")
    val lines = Seq(
      "city,temp,day",
      "London,12.5,2024-01-01",
      "Paris,NOT_A_NUMBER,2024-01-02",   // type failure → quarantine
      "Lagos,31.0,2024-01-03",
      "Tokyo,8.25")                       // missing column → quarantine
    java.nio.file.Files.write(dir.resolve("load.csv"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("city", StringType), StructField("temp", DoubleType),
      StructField("day", DateType)))
    val r = sources.CsvQuarantine.readTyped(spark, dir.toString, schema)
    val clean = r.clean.orderBy("city").collect()
    assert(clean.map(_.getAs[String]("city")).toSeq === Seq("Lagos", "London"))
    assert(clean.forall(!_.anyNull))
    assert(r.clean.schema.fieldNames.toSeq === Seq("city", "temp", "day"))
    val bad = r.quarantine.collect()
    assert(bad.map(_.getAs[String]("raw_line")).sorted.toSeq ===
      Seq("Paris,NOT_A_NUMBER,2024-01-02", "Tokyo,8.25"))
    assert(bad.forall(_.getAs[String]("source_file").contains("load.csv")))
    // conservation: every input data line is exactly one of clean/quarantine
    assert(clean.length + bad.length === 4)
    r.unpersist()
  }

  test("graft-http-snapshot: reads one row per payload file, city from filename") {
    val dir = java.nio.file.Files.createTempDirectory("httpsnap")
    java.nio.file.Files.write(dir.resolve("London.json"), londonPayload.getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("Paris.json"),
      """{"latitude": 48.8, "longitude": 2.35, "daily": {"time": [], "temperature_2m_max": [], "temperature_2m_min": [], "precipitation_sum": []}}""".getBytes("UTF-8"))
    val df = spark.read.format("graft-http-snapshot").load(dir.toString)
    val rows = df.orderBy("city_name").collect()
    assert(rows.map(_.getAs[String]("city_name")).toSeq === Seq("London", "Paris"))
    assert(rows.forall(_.getAs[Boolean]("payload_ok")))
    assert(rows.forall(_.getAs[Int]("fetch_attempts") === 1))
    assert(rows.head.getAs[String]("payload_json").contains("temperature_2m_max"))
    // the clean lane feeds the existing JSON staging parse end-to-end
    val staged = WeatherApiSource.parsePayloads(
      graft.sources.HttpSnapshotSource.read(spark, dir.toString).clean)
    assert(staged.count() === 3) // London's three day rows; Paris's arrays are empty
  }

  test("graft-http-snapshot: malformed payload lands in the quarantine lane") {
    val dir = java.nio.file.Files.createTempDirectory("httpsnapq")
    java.nio.file.Files.write(dir.resolve("London.json"), londonPayload.getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("Dubai.json"),
      "<html>Minutely API request limit exceeded</html>".getBytes("UTF-8"))
    val r = graft.sources.HttpSnapshotSource.read(spark, dir.toString)
    val clean = r.clean.collect()
    val quarantined = r.quarantine.collect()
    assert(clean.map(_.getAs[String]("city_name")).toSeq === Seq("London"))
    assert(quarantined.length === 1)
    assert(quarantined.head.getAs[String]("raw_payload").contains("request limit"))
    assert(quarantined.head.getAs[String]("source_file").contains("Dubai.json"))
    // conservation: every payload is exactly one of clean/quarantine
    assert(clean.length + quarantined.length === 2)
  }

  test("graft-http-snapshot: transient read failures are retried per file") {
    graft.sources.HttpSnapshotSource.resetInjection()
    val dir = java.nio.file.Files.createTempDirectory("httpsnapr")
    java.nio.file.Files.write(dir.resolve("Tokyo.json"),
      """{"latitude": 35.6}""".getBytes("UTF-8"))
    // first two attempts throw (injected), third succeeds — the reference's
    // 3-attempt budget (extract_weather.py:37–54) at the partition reader
    val df = spark.read.format("graft-http-snapshot")
      .option("retries", "3")
      .option("injectFailures", "2")
      .option("injectPathContains", "Tokyo")
      .load(dir.toString)
    val row = df.collect().head
    assert(row.getAs[String]("city_name") === "Tokyo")
    assert(row.getAs[Int]("fetch_attempts") === 3, "two injected failures + one success")

    // budget exhausted → the task fails loudly, it does not drop the payload
    graft.sources.HttpSnapshotSource.resetInjection()
    val dead = spark.read.format("graft-http-snapshot")
      .option("retries", "2")
      .option("injectFailures", "5")
      .option("injectPathContains", "Tokyo")
      .load(dir.toString)
    val err = intercept[org.apache.spark.SparkException] { dead.collect() }
    assert(err.getMessage.contains("failed after 2 attempts") ||
           Option(err.getCause).exists(_.getMessage.contains("failed after 2 attempts")))
    graft.sources.HttpSnapshotSource.resetInjection()
  }

  test("ORC snapshot round-trips with partition pruning and filter pushdown") {
    import java.nio.file.Files
    import graft.sources.SnapshotStore
    val dir = Files.createTempDirectory("graft_orc").toString
    val orders = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
    SnapshotStore.writeFactOrc(orders, dir, "o_orderdate")
    val back = SnapshotStore.readOrc(spark, dir)
    assert(back.count() === orders.count())
    // date partition pruning: one day's directory only
    val oneDay = back.filter(col("part_date") === lit("1995-06-17").cast("date"))
    val pruned = oneDay.queryExecution.executedPlan.toString
    assert(!pruned.contains("PartitionFilters: []") || oneDay.count() == 0,
      "date filter must reach PartitionFilters on the ORC scan")
    // predicate pushdown reaches the ORC reader
    val q = back.filter(col("o_totalprice") > 300000.0).select(col("o_orderkey"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,300000.0)]"),
      s"filter must push into the ORC scan:\n${plan.take(1500)}")
    assert(q.count() === orders.filter(col("o_totalprice") > 300000.0).count())
  }
}
