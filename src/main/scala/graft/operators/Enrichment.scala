package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Enrichment tier: columnar→row unpivot, JSON extraction, date/math scalar
  * suites (ref /root/reference/etl/extract_weather.py:45–65,
  * transform_load.sql:21–35). All narrow, codegen'd expressions — no
  * shuffles except the final presentation sort.
  */
object Enrichment {

  /** Parallel-array unpivot (ref extract_weather.py:57–65 — the Open-Meteo
    * struct-of-arrays walked index by index into rows). posexplode is the
    * Spark-native generator: one input row fans out to |array| rows inside
    * whole-stage codegen, no driver loop. Testdata: embeddings.embedding.
    */
  def arraysZipExplode(spark: SparkSession, sfDir: String): DataFrame =
    ordered(
      t(spark, sfDir, "embeddings")
        .filter(col("vec_id") < 8)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("vec_id"), col("pos"),
                r4(col("v").cast("double")).as("v")),
      "vec_id", "pos")

  /** JSON point extraction (ref extract_weather.py:45–47 — navigate
    * `data['daily']`; README.md:40 declares raw-JSON staging). get_json_object
    * on events.props, typed to INT. On the declared-intent staging shape the
    * same pipeline is from_json with an explicit StructType schema.
    */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    ordered(
      events(spark, sfDir)
        .select(col("event_id"),
                get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k") > 50),
      "event_id")

  /** Raw-JSON staging parse (ref README.md:40–43 — the declared-but-never-
    * built alternative extract shape: land raw JSON payloads, parse in the
    * warehouse; same pipeline as sources/WeatherApiSource.parsePayloads).
    * A nested payload (struct + array) is assembled from events columns with
    * engine-portable integer formatting, then parsed by `from_json` with an
    * EXPLICIT StructType — never schema inference, the reference's DDL-first
    * discipline — and projected to typed columns. All narrow codegen'd
    * expressions: 10⁶ payloads parse exactly like 5, no driver loop.
    */
  def jsonStaging(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val payload = concat(
      lit("{\"meta\":"), col("props"),
      lit(",\"ids\":["), col("event_id").cast("string"),
      lit(","), col("user_id").cast("string"), lit("]}"))
    val schema = StructType(Seq(
      StructField("meta", StructType(Seq(StructField("k", IntegerType)))),
      StructField("ids", ArrayType(LongType))))
    ordered(
      events(spark, sfDir)
        .select(col("event_id"), from_json(payload, schema).as("p"))
        .select(col("event_id"),
                col("p.meta.k").as("k"),
                element_at(col("p.ids"), 2).as("second_id"),
                size(col("p.ids")).cast("long").as("n_ids"))
        .filter(col("k") >= 10 && col("k") < 90),
      "event_id")
  }

  /** Date-part scalar suite (ref transform_load.sql:21–22 `MONTH(date)`;
    * README.md:232 — planned "season based on date, day of week"
    * enrichment). ISO day-of-week so both engines agree on numbering.
    */
  def scalarDateFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    val d = col("o_orderdate").cast("date")
    ordered(
      t(spark, sfDir, "orders").select(
        col("o_orderkey"),
        d.as("o_date"),
        year(d).as("yr"),
        quarter(d).as("qtr"),
        month(d).as("mo"),
        (weekday(d) + 1).as("dow_iso"), // ISO 1=Mon..7=Sun, = DuckDB isodow()
        when(month(d).isin(12, 1, 2), "winter")
          .when(month(d).isin(3, 4, 5), "spring")
          .when(month(d).isin(6, 7, 8), "summer")
          .otherwise("autumn").as("season")),
      "o_orderkey")
  }

  /** String scalar suite — the natural completion of §2.2 (the reference
    * uses strings only for equality; a full engine ships the standard
    * manipulation set). All codegen'd built-ins, zero shuffle.
    */
  def scalarStringFuncs(spark: SparkSession, sfDir: String): DataFrame =
    ordered(
      t(spark, sfDir, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("upper_name"),
        length(col("c_name")).cast("int").as("name_len"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("cust_code"),
        substring(col("c_mktsegment"), 1, 3).as("seg3"),
        element_at(split(col("c_name"), "#"), 2).as("num_part"),
        regexp_replace(col("c_name"), "Customer", "Cust").as("short_name"),
        concat_ws("-", col("c_mktsegment"), col("c_custkey").cast("string")).as("seg_key")),
      "c_custkey")

  /** Math scalar suite (ref transform_load.sql:35 — ABS/division/CASE in the
    * z-score expression; README.md:234 — planned derived measures). Derived
    * net/profit columns with guard-railed division.
    */
  def scalarMathFuncs(spark: SparkSession, sfDir: String): DataFrame =
    ordered(
      t(spark, sfDir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        r4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"),
        r4(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("charged"),
        r4(abs(col("l_discount") - col("l_tax"))).as("abs_disc_tax_gap"),
        r4(when(col("l_quantity") =!= 0.0, col("l_extendedprice") / col("l_quantity"))).as("unit_price"),
        when(col("l_discount") >= 0.05, "high").otherwise("low").as("disc_band")),
      "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
      "net_price", "charged", "abs_disc_tax_gap", "unit_price", "disc_band")

  /** Null-semantics suite: null-safe equality (Spark `<=>` ≡ SQL
    * IS NOT DISTINCT FROM), three-valued-logic comparison vs NULL, NULLIF
    * and COALESCE — the subtle cross-engine semantics the MERGE join
    * condition (Warehouse.mergeUpsert's `<=>` on keys) depends on, pinned
    * as an oracled row-level query. m is NULL on every 3rd line.
    */
  def nullSemantics(spark: SparkSession, sfDir: String): DataFrame = {
    val m = when(col("l_linenumber") =!= 3, col("l_quantity"))
    ordered(
      t(spark, sfDir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        m.as("m"),
        (m <=> lit(null)).as("nseq_null"),          // true exactly when m IS NULL
        (m <=> lit(30.0)).as("nseq_30"),            // never NULL, unlike m = 30
        (m === lit(30.0)).as("eq_30"),              // NULL when m IS NULL (3VL)
        nullif(col("l_quantity"), lit(30.0)).as("qty_nullif_30"),
        coalesce(m, lit(-1.0)).as("m_defaulted")),
      "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "m")
  }

  /** Value-based RANGE window frame — distinct semantics from the ROWS
    * frame in Windows.windowFrame: the frame spans every event of the user
    * within the preceding 30 minutes of EVENT TIME (however many rows that
    * is), the sliding-window aggregate shape behind rate counters and
    * rolling exposure sums. Money-exact decimal sum inside the frame.
    */
  def windowRangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val halfHourUs = 30L * 60 * 1000 * 1000
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us").asc)
      .rangeBetween(-halfHourUs, Window.currentRow)
    ordered(
      events(spark, sfDir).select(
        col("event_id"), col("user_id"), col("ts_us"),
        count(lit(1)).over(w).as("n_last_30m"),
        r4(sum(money(col("value"))).over(w).cast("double")).as("sum_last_30m")),
      "user_id", "ts_us", "event_id")
  }

  /** explode_outer null semantics — the generator-side outer join: orders
    * whose big-discount item array is NULL (no qualifying lineitems) still
    * emit one NULL-extended row, exactly the rows an inner explode drops.
    * The oracle is the equivalent LEFT JOIN formulation, so the hash gate
    * pins the generator's null contract to standard outer-join semantics.
    */
  def explodeOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val items = t(spark, sfDir, "lineitem")
      .filter(col("l_discount") > 0.09)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_linenumber"))).as("arr"))
    ordered(
      t(spark, sfDir, "orders")
        .select(col("o_orderkey"))
        .join(items, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"), explode_outer(col("arr")).as("item")),
      "o_orderkey", "item")
  }
}
