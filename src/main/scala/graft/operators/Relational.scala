package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Core relational tier: scan/project, filter, aggregate, joins, distinct,
  * sort/limit, set ops, rollup. Re-expresses the reference's T-SQL statement
  * shapes (ref: /root/reference/etl/transform_load.sql) over the driver
  * testdata. Everything here is stock Catalyst — declarative plans so
  * predicate pushdown, column pruning and AQE join planning stay free.
  */
object Relational {

  /** Scan + projection (ref transform_load.sql:52–58 — the MERGE source
    * SELECT). Only 4 of 11 lineitem columns are touched; the Parquet reader
    * must show exactly those in ReadSchema (column pruning at 100 TB is the
    * difference between reading 4 TB and 11 TB).
    * Output contract: money surfaces as an r4 DOUBLE, never DECIMAL — the
    * two engines serialize DECIMAL differently (trailing zeros, sum
    * precision 28 vs 38), which breaks the driver's value hash even when
    * every value is identical.
    */
  def scanProject(spark: SparkSession, sfDir: String): DataFrame =
    ordered(
      t(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
                col("l_suppkey"), col("l_quantity"),
                r4(col("l_extendedprice")).as("l_extendedprice")),
      // (orderkey, linenumber) alone is NOT unique in the synthetic data,
      // and sf0.001 even has one duplicate (ok,ln,pk,sk) quad — sort by
      // every output column so the order is total no matter what
      "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
      "l_quantity", "l_extendedprice")

  /** Compound-predicate filter (ref transform_load.sql:14, 24, 38, 60 —
    * `WHERE is_processed = 0 AND (a IS NULL OR b IS NULL)` shapes). The whole
    * predicate is pushdown-eligible; verify PushedFilters in explain().
    */
  def filterPredicate(spark: SparkSession, sfDir: String): DataFrame =
    ordered(
      t(spark, sfDir, "lineitem")
        .filter((col("l_returnflag") === "R" || col("l_linestatus") === "F") &&
                col("l_discount") > 0.05 && col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
                col("l_suppkey"), col("l_returnflag"), col("l_linestatus"),
                col("l_quantity")),
      "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
      "l_returnflag", "l_linestatus", "l_quantity")

  /** Grouped aggregation, TPC-H Q1 shape (ref transform_load.sql:28–32 —
    * AVG/STDEV per city; extract_weather.py:27 — MAX). Hash aggregate with
    * partial (map-side) + final phases — the only shuffle carries one row per
    * (group × partition), so this scales linearly to any fact size.
    * Money sums use DECIMAL for partition-order-independent exactness.
    */
  def aggGroup(spark: SparkSession, sfDir: String): DataFrame =
    ordered(
      t(spark, sfDir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("date"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // DECIMAL inside the sum (associative, partition-order independent),
          // DOUBLE outside (engine-portable serialization for the hash gate)
          r4(sum(money(col("l_quantity"))).cast("double")).as("sum_qty"),
          r4(sum(money(col("l_extendedprice"))).cast("double")).as("sum_base_price"),
          r4(sum(money(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - money(col("l_discount"))))
            .cast("double")).as("sum_disc_price"),
          // averages as exact-decimal sum ÷ count (single double division at
          // the end): avg(double) sums in partial-aggregation order, which
          // Spark doesn't pin and DuckDB's sequential scan doesn't share
          r4(sum(money(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          r4(sum(money(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
          r4(sum(money(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order")),
      "l_returnflag", "l_linestatus")

  /** Equi inner join fact ⋈ dim (ref transform_load.sql:58–59 — stg JOIN
    * dim_city ON city_name). No broadcast HINT on `part`: it scales with
    * the data (~20 B rows at 100 TB), so a forced broadcast would hit the
    * 8 GB ceiling and kill the query at scale. AQE broadcasts it at small
    * SF where it fits and falls back to a shuffled join (ideally against a
    * part-bucketed snapshot — SnapshotStore) when it doesn't.
    */
  def joinInnerEqui(spark: SparkSession, sfDir: String): DataFrame =
    ordered(
      t(spark, sfDir, "lineitem")
        .join(t(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          r4(sum(money(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - money(col("l_discount"))))
            .cast("double")).as("revenue"),
          count(lit(1)).as("n_items")),
      "p_brand")

  /** Left outer join keeping customers with no orders (NULL-extended side),
    * the keyed-outer-join shape underlying the reference's MERGE ON clause
    * (transform_load.sql:62). Aggregates after the join; customer is the
    * smaller side but outer-join direction pins the build side — AQE still
    * broadcasts the dim.
    */
  def joinLeftOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer")
    val o = t(spark, sfDir, "orders")
    ordered(
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
             // NULL-preserving: a customer with no orders keeps a NULL spend
             r4(sum(money(col("o_totalprice"))).cast("double")).as("total_spend")),
      "c_custkey")
  }

  /** Right outer join — the mirror of [[joinLeftOuter]] with the preserved
    * side on the right: every part keeps a row even with zero lineitems
    * (NULL-preserving counts/sums). Catalyst canonicalizes right⟕ to left⟕
    * with sides swapped, so the physical plan is the same shuffled hash
    * join; registering it separately proves the API surface end-to-end.
    */
  def joinRightOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    val p = t(spark, sfDir, "part")
    ordered(
      li.join(p, li("l_partkey") === p("p_partkey"), "right")
        .groupBy(col("p_partkey"))
        .agg(count(col("l_orderkey")).as("n_lineitems"),
             r4(sum(money(col("l_quantity"))).cast("double")).as("total_qty")),
      "p_partkey")
  }

  /** Explicit CROSS JOIN — the dimension-grid generator (every region ×
    * every nation, membership flagged). Both sides are broadcast-sized
    * dims; the product is |region|·|nation| rows, and Spark plans a
    * BroadcastNestedLoopJoin — the only correct physical shape for a
    * keyless join, and harmless when one side is a dim.
    */
  def crossJoinDims(spark: SparkSession, sfDir: String): DataFrame = {
    val r = t(spark, sfDir, "region").select(col("r_regionkey"), col("r_name"))
    val n = t(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    ordered(
      r.crossJoin(n)
        .select(col("r_regionkey"), col("r_name"), col("n_nationkey"), col("n_name"),
                when(col("n_regionkey") === col("r_regionkey"), 1).otherwise(0)
                  .as("is_member")),
      "r_regionkey", "n_nationkey")
  }

  /** The joinInnerEqui aggregation through the explicit salted-join path
    * (util.Skew): hot part keys spread across 8 salt buckets before the
    * shuffle. Oracle-identical to a plain join — salting must never change
    * results, only the reducer layout — so the driver gate proves the skew
    * machinery end-to-end, not just in specs. Here `part` rides the salted
    * replicate path instead of broadcasting (the scenario where the dim is
    * too big to broadcast but a key is hot).
    */
  def saltedJoinAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    val part = t(spark, sfDir, "part").select(col("p_partkey").as("l_partkey"), col("p_brand"))
    ordered(
      graft.util.Skew.saltedJoin(li, part, "l_partkey", "l_extendedprice", 8)
        .groupBy(col("p_brand"))
        .agg(
          r4(sum(money(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - money(col("l_discount"))))
            .cast("double")).as("revenue"),
          count(lit(1)).as("n_items")),
      "p_brand")
  }

  /** Full outer join — the MERGE ON shape (transform_load.sql:62) surfaced
    * as its own row-level operator: BUILDING-segment customers ⟗ big-ticket
    * order counts, null-extended on both sides. AQE still broadcasts the
    * smaller side when stats allow; neither side is pinned as build side.
    */
  def joinFullOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"), col("c_name"))
    val o = t(spark, sfDir, "orders").filter(col("o_totalprice") > 450000.0)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_big_orders"))
    ordered(
      c.join(o, Seq("custkey"), "full_outer")
        .select(col("custkey"), col("c_name"), col("n_big_orders")),
      "custkey")
  }

  /** Left semi join — the watermark scalar-subquery shape
    * (extract_weather.py:27) as a set operation: customers that have at
    * least one URGENT order. Semi joins never duplicate the left side, so
    * they shuffle strictly less than inner-join+distinct.
    */
  def joinSemi(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer")
    val o = t(spark, sfDir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    ordered(
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment")),
      "c_custkey")
  }

  /** Left anti join — the `WHEN NOT MATCHED` half of the reference MERGE
    * (transform_load.sql:46, 68): customers with no big-ticket order.
    * (Every customer has SOME order in this data, so the filter keeps the
    * anti set non-empty and the oracle non-trivial.)
    */
  def joinAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer")
    val o = t(spark, sfDir, "orders").filter(col("o_totalprice") > 300000.0)
    ordered(
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name")),
      "c_custkey")
  }

  /** DISTINCT (ref transform_load.sql:44 — `SELECT DISTINCT city_name`).
    * Implemented as a hash aggregate over the key — partial distinct runs
    * map-side, so the shuffle carries unique values only.
    */
  def distinctKeys(spark: SparkSession, sfDir: String): DataFrame =
    ordered(
      t(spark, sfDir, "orders")
        .select(col("o_orderpriority"), col("o_orderstatus")).distinct(),
      "o_orderpriority", "o_orderstatus")

  /** Sort + limit (top-k). Spark plans orderBy+limit as TakeOrderedAndProject:
    * each partition keeps a k-row heap and only k rows per partition reach
    * the driver — no global sort, scale-safe for any fact size.
    * Ties broken by unique key so the k-set is deterministic.
    */
  def topK(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"), r4(col("o_totalprice")).as("o_totalprice"),
              col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** Set operations: UNION / EXCEPT (CDC-diff primitive, SURVEY §2 op 18).
    * (building-segment customers ∪ big-order customers) ∖ negative-balance
    * customers. Spark's EXCEPT/UNION-distinct are aggregate-based — no
    * cartesian anywhere.
    */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer")
    val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val bigSpend = t(spark, sfDir, "orders").filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey").as("c_custkey"))
    val negative = c.filter(col("c_acctbal") < 0).select(col("c_custkey"))
    ordered(building.union(bigSpend).distinct().except(negative), "c_custkey")
  }

  /** ROLLUP aggregation — the natural completion of the reference's generic
    * "business rules and aggregations" (README.md:237). grouping_id()
    * disambiguates NULL-as-subtotal from NULL data on both engines.
    */
  def rollupAgg(spark: SparkSession, sfDir: String): DataFrame =
    ordered(
      t(spark, sfDir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(r4(sum(money(col("l_quantity"))).cast("double")).as("sum_qty"),
             count(lit(1)).as("n_rows"),
             grouping_id().cast("int").as("gid")),
      "gid", "l_returnflag", "l_linestatus")

  /** PIVOT: event counts per user spread into one column per event type —
    * a single hash aggregate (pivot with an explicit value list never scans
    * twice; the values become CASE branches inside the aggregate).
    */
  def pivotCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = events(spark, sfDir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .count()
    ordered(
      p.select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*),
      "user_id")
  }

  /** UNPIVOT (stack): measures back to (name, value) rows — the inverse
    * generator, columnar→long format for ML feature pipelines.
    */
  def unpivotMeasures(spark: SparkSession, sfDir: String): DataFrame =
    ordered(
      t(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          expr("stack(3, 'qty', l_quantity, 'disc', l_discount, 'tax', l_tax)")
            .as(Seq("measure", "value"))),
      "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "measure", "value")

  /** GROUPING SETS — explicit set list (rollup/cube cover the lattice
    * shapes; this is the à-la-carte form). Uses the Spark 4 Dataset-API
    * groupingSets builder — same Expand+hash-agg plan as rollup/cube without
    * the SQL parse/analyze path (the r1 bench showed the spark.sql route
    * paying a one-time multi-second first-parse cost in a fresh JVM).
    */
  def groupingSets(spark: SparkSession, sfDir: String): DataFrame =
    ordered(
      t(spark, sfDir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(r4(sum(money(col("l_quantity"))).cast("double")).as("sum_qty"),
             grouping_id().cast("int").as("gid")),
      "gid", "l_returnflag", "l_linestatus")

  /** INTERSECT — completes the set-op family (union/except in setOps).
    * Spark plans intersect-distinct as a left-semi join over distincts.
    */
  def intersectOp(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer")
    val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val buyers = t(spark, sfDir, "orders").select(col("o_custkey").as("c_custkey"))
    ordered(building.intersect(buyers), "c_custkey")
  }

  /** Sketch aggregates — the approximate tier for 100 TB interactive use
    * (HyperLogLog++ distinct counts, quantile sketch): one pass, fixed
    * memory per group, mergeable partials, no exact-distinct expand+shuffle.
    * No oracle (sketch internals differ across engines) — OperatorsSpec
    * bounds the error against exact results instead.
    */
  def approxSketches(spark: SparkSession, sfDir: String): DataFrame =
    ordered(
      t(spark, sfDir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_price"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000)).as("p99_price")),
      "l_returnflag")

  /** Deterministic string aggregation (SQL Server STRING_AGG / listagg):
    * distinct statuses per priority, sorted then joined — collect_list
    * alone is partition-order nondeterministic; array_sort pins it.
    */
  def groupConcat(spark: SparkSession, sfDir: String): DataFrame =
    ordered(
      t(spark, sfDir, "orders")
        .select(col("o_orderpriority"), col("o_orderstatus")).distinct()
        .groupBy(col("o_orderpriority"))
        .agg(concat_ws(",", array_sort(collect_list(col("o_orderstatus"))))
               .as("statuses")),
      "o_orderpriority")

  /** Deterministic per-group MODE: most frequent order status per priority,
    * ties broken toward the smallest value. Built-in mode() has
    * nondeterministic ties; this is two hash aggregates — counts, then a
    * map-side min_by over (-count, value) struct ordering — with no window
    * over the low-cardinality group key.
    */
  def modeAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = t(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    ordered(
      counts.groupBy(col("o_orderpriority"))
        .agg(min_by(struct(col("o_orderstatus"), col("n")),
                    struct((-col("n")).as("neg_n"), col("o_orderstatus"))).as("best"))
        .select(col("o_orderpriority"),
                col("best.o_orderstatus").as("mode_status"),
                col("best.n").as("n_mode")),
      "o_orderpriority")
  }

  /** Exact quantiles per group (p25/p50/p75 of order value) — the
    * oracle-checkable twin of approxSketches: identical linear-interpolation
    * definition on both engines, deterministic because it is sort-based,
    * not accumulation-order based. Exact percentile sorts each group's
    * values; at 100 TB the approx sketch (fixed memory, mergeable partials)
    * is the production path — this operator exists for the exact tier and
    * for validating sketch error.
    */
  def quantilesExact(spark: SparkSession, sfDir: String): DataFrame =
    ordered(
      t(spark, sfDir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
             r4(percentile(col("o_totalprice"), lit(0.25))).as("p25"),
             r4(percentile(col("o_totalprice"), lit(0.5))).as("p50"),
             r4(percentile(col("o_totalprice"), lit(0.75))).as("p75")),
      "o_orderpriority")

  /** Pearson correlation per group from EXACT decimal moment sums — the
    * statistical-aggregate tier done the deterministic way. Built-in
    * corr() accumulates doubles in partition order (nondeterministic vs
    * the oracle's sequential scan), so instead the five moments
    * Σx, Σy, Σxy, Σx², Σy² are summed as DECIMAL (inputs are 2-decimal;
    * products scale 4 — all exact and associative) and the correlation is
    * assembled in double at the end with a fixed expression order mirrored
    * verbatim in the oracle. Still one partial+final hash aggregate.
    */
  def corrAgg(spark: SparkSession, sfDir: String): DataFrame = {
    def x = money(col("l_discount")); def y = money(col("l_quantity"))
    val g = t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
           sum((x * y).cast("decimal(30,4)")).cast("double").as("sxy"),
           sum((x * x).cast("decimal(30,4)")).cast("double").as("sxx"),
           sum((y * y).cast("decimal(30,4)")).cast("double").as("syy"))
    ordered(
      g.select(col("l_returnflag"), col("n"),
        r4((col("n") * col("sxy") - col("sx") * col("sy")) /
           (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
          .as("corr_disc_qty")),
      "l_returnflag")
  }

  /** Per-group ordinary-least-squares regression (slope / intercept / R²)
    * of order value on quantity, from the same exact-DECIMAL moment sums as
    * [[corrAgg]] — the built-in regr_* aggregates fold doubles in
    * partition order, which the hash gate can't accept. One partial+final
    * hash aggregate; the five moments are associative, so the shuffle
    * carries one 5-number row per (group × partition) at any scale.
    */
  def regrAgg(spark: SparkSession, sfDir: String): DataFrame = {
    def x = money(col("l_quantity")); def y = money(col("l_extendedprice"))
    val g = t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
           sum((x * y).cast("decimal(30,4)")).cast("double").as("sxy"),
           sum((x * x).cast("decimal(30,4)")).cast("double").as("sxx"),
           sum((y * y).cast("decimal(30,4)")).cast("double").as("syy"))
    // num/A/B spelled once and combined EXACTLY as the oracle SQL does —
    // r2 = num²/(A·B), not (num/(√A·√B))², whose different fp path could
    // land across an r4 boundary
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val a = col("n") * col("sxx") - col("sx") * col("sx")
    val b = col("n") * col("syy") - col("sy") * col("sy")
    val slope = num / a
    ordered(
      g.select(col("l_returnflag"), col("n"),
        r4(slope).as("slope"),
        r4((col("sy") - slope * col("sx")) / col("n")).as("intercept"),
        r4((num * num) / (a * b)).as("r2")),
      "l_returnflag")
  }

  /** Ratio-to-report: each (returnflag, linestatus) cell's share of its
    * returnflag group's revenue. Both levels are hash aggregates over
    * exact-DECIMAL sums; the share division happens on the already-
    * aggregated (tiny) frame via a same-key join of the two aggregate
    * outputs — at 100 TB the fact table is touched once, and no window
    * ever sees pre-aggregate rows.
    */
  def percentTotal(spark: SparkSession, sfDir: String): DataFrame = {
    val cell = t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(money(col("l_extendedprice"))).as("rev_d"))
    val tot = cell.groupBy(col("l_returnflag"))
      .agg(sum(col("rev_d")).as("tot_d"))
    ordered(
      cell.join(tot, "l_returnflag")
        .select(col("l_returnflag"), col("l_linestatus"),
                r4(col("rev_d").cast("double")).as("revenue"),
                r4(col("rev_d").cast("double") / col("tot_d").cast("double"))
                  .as("share")),
      "l_returnflag", "l_linestatus")
  }

  /** CUBE over two dims with exact count-distinct — grouping-set execution
    * expands rows map-side; count(distinct) plans as a two-phase expand+agg.
    */
  def cubeAgg(spark: SparkSession, sfDir: String): DataFrame =
    ordered(
      t(spark, sfDir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
             countDistinct(col("o_custkey")).as("n_customers"),
             grouping_id().cast("int").as("gid")),
      "gid", "o_orderstatus", "o_orderpriority")

  /** Arg-max per group via `max_by` with a composite deterministic ordering
    * key — "the row that wins per group" without a window. The partial
    * max_by folds map-side, so the one shuffle carries a single candidate
    * row per (group, map partition); a row_number window would shuffle and
    * sort every input row (the oracle states the window form, proving the
    * aggregate path ≡ the sort path). Ties on balance break by LOWEST
    * custkey (struct order on (acctbal, −custkey)).
    */
  def argmaxPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val j = t(spark, sfDir, "customer")
      .join(broadcast(t(spark, sfDir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
    ordered(
      j.groupBy(col("n_name"))
        .agg(max_by(struct(col("c_custkey"), col("c_acctbal")),
                    struct(col("c_acctbal"), (-col("c_custkey")).as("tb"))).as("best"),
             count(lit(1)).as("n_members"))
        .select(col("n_name"), col("best.c_custkey").as("top_custkey"),
                r4(col("best.c_acctbal")).as("top_acctbal"), col("n_members")),
      "n_name")
  }

  /** Bloom-filter–pruned join: build a Bloom filter over the filtered build
    * side's keys and prune the probe side BEFORE its shuffle — the classic
    * big-join bandwidth saver (at 100 TB, dropping ~75% of lineitem rows
    * ahead of the exchange is the difference between shuffling 100 TB and
    * 25 TB). The filter is built with one job over the (already filtered)
    * orders side and broadcast as a ~1.1 MB sketch regardless of probe
    * size; false positives are removed by the real join, so the result is
    * EXACTLY the plain join — which is what the oracle states. Spark's own
    * runtime row-level filtering (InjectRuntimeFilter) applies the same
    * idea automatically for eligible equi-joins; this operator is the
    * explicit form for when the build predicate is known up front.
    */
  def bloomPrunedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, BloomFilterMightContain, ScalarSubquery, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
    val urgent = t(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    // The sketch is built IN-PLAN, not by a builder-time df.stat action:
    // a scalar subquery aggregating BloomFilterAggregate(xxhash64(key)) —
    // the exact construction Spark's own InjectRuntimeFilter emits, and
    // the shape BloomFilterMightContain's type check demands (constant or
    // scalar subquery). Keeps the registry lazy AND swaps the old
    // per-row Scala UDF probe for the codegen'd native predicate.
    // expectedNumItems sized generously for the sf sweep (sf0.1 has ~30k
    // urgent orders); default fpp keeps the sketch ~1 MB — broadcast-cheap.
    val urgentPlan = urgent.queryExecution.analyzed
    val bfAgg = new BloomFilterAggregate(
      new XxHash64(Seq(urgentPlan.output.head), 42L), 200000L)
    val sketchPlan = Aggregate(Nil,
      Seq(Alias(bfAgg.toAggregateExpression(), "bf")()), urgentPlan)
    val li = t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))
    val liPlan = li.queryExecution.analyzed
    val probe = new XxHash64(
      Seq(liPlan.output.find(_.name == "l_orderkey").get), 42L)
    val pruned = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      Filter(BloomFilterMightContain(ScalarSubquery(sketchPlan), probe), liPlan))
    ordered(
      pruned
        .join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
             r4(sum(money(col("l_extendedprice"))).cast("double")).as("revenue")),
      "l_returnflag")
  }

  /** Per-group top-k as a first-class query: the 3 priciest lineitems per
    * supplier via the two-phase [[graft.util.TopK]] — local top-k inside
    * every (group, partition) slice, then a merge over ≤ k·partitions
    * survivors. The single-window formulation the oracle uses would funnel
    * the whole fact table through one reducer per supplier; two-phase keeps
    * every stage fully parallel, which is the difference that matters when
    * the group count is small relative to the data (the 100 TB norm).
    * Ranked on (price, orderkey, linenumber) — a total order, so both
    * phases and the oracle agree on exactly which rows survive ties.
    */
  def topkPerGroup(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
              col("l_extendedprice"))
    ordered(
      graft.util.TopK.perGroup(li, Seq(col("l_suppkey")),
          Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
              col("l_linenumber").asc), k)
        .select(col("l_suppkey"), col("rn").cast("long").as("rk"),
                col("l_orderkey"), col("l_linenumber"),
                r4(col("l_extendedprice")).as("l_extendedprice")),
      "l_suppkey", "rk")
  }

  /** Star-schema flagship: discounted revenue per ASIA nation — the
    * TPC-H-Q5 shape every Kimball warehouse query reduces to (fact ⋈
    * snowflaked dims ⋈ fact). Join geometry is the point: region⋈nation is
    * driver-tiny and carries an explicit broadcast HINT (static dims —
    * bounded at any SF); customer-after-dim-filter SCALES with the data,
    * so it gets no hint — AQE broadcasts it while it fits and degrades to
    * a shuffled join past the ceiling instead of dying. The only forced
    * repartitioning in the whole plan is the lineitem⋈orders fact-fact
    * join on l_orderkey — one shuffle of each fact, which is the floor for
    * co-locating two facts without bucketed layout (SnapshotStore's
    * bucketed path removes even that when the snapshot is pre-bucketed).
    * Revenue sums as exact DECIMAL (associative across any partial-agg
    * tree), cast to double only at the output boundary.
    */
  def starJoinRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val asiaNations = t(spark, sfDir, "nation")
      .join(broadcast(t(spark, sfDir, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val custDim = t(spark, sfDir, "customer")
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val ord = t(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val rev = money(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,2)") - money(col("l_discount")))
    val li = t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), rev.as("rev"))
    ordered(
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(custDim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("n_name"))
        .agg(r4(sum(col("rev")).cast("double")).as("revenue"),
             count(lit(1)).as("n_items")),
      "n_name")
  }

  /** Discrete per-group percentile: the ACTUAL group value at rank
    * ⌈p·n⌉ in (value, id) order — not the interpolated midpoint
    * [[quantilesExact]] returns. The rank rule is spelled explicitly
    * (sort by (c_acctbal, c_custkey), pick rank ⌈p·n⌉) so both engines
    * agree bit-for-bit even on duplicate values; engines' native
    * quantile_disc functions pin ties differently, which is why neither
    * side uses one. Sort-based per group like quantilesExact — the exact
    * tier; the approx sketch stays the 100 TB path.
    */
  def percentileDisc(spark: SparkSession, sfDir: String): DataFrame = {
    val sorted = array_sort(collect_list(struct(col("c_acctbal"), col("c_custkey"))))
    def at(arr: org.apache.spark.sql.Column, p: Double): org.apache.spark.sql.Column =
      element_at(arr, ceil(size(arr) * lit(p)).cast("int")).getField("c_acctbal")
    ordered(
      t(spark, sfDir, "customer")
        .select(col("c_nationkey"), col("c_acctbal"), col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(sorted.as("arr"), count(lit(1)).as("n"))
        .select(col("c_nationkey"), col("n"),
                r4(at(col("arr"), 0.5)).as("p50_disc"),
                r4(at(col("arr"), 0.9)).as("p90_disc")),
      "c_nationkey")
  }

  /** Basket-size histogram — orders by line count, the first profiling
    * number on any order fact (it sizes the per-order fan-out every
    * basket-keyed operator in this engine depends on: the assoc-rules /
    * co-purchase pair explosions are quadratic in THIS histogram's tail).
    * Two hash-aggs; output bounded by the max basket size.
    */
  def basketSizeHist(spark: SparkSession, sfDir: String): DataFrame = {
    val sizes = t(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_lines"))
    val total = sizes.agg(count(lit(1)).as("n_orders_total"))
    ordered(
      sizes.groupBy(col("n_lines")).agg(count(lit(1)).as("n_orders"))
        .crossJoin(broadcast(total))
        .select(col("n_lines"), col("n_orders"),
                r4(col("n_orders").cast("double") /
                   col("n_orders_total").cast("double")).as("share")),
      "n_lines")
  }

  /** Interpolated (PERCENTILE_CONT) percentiles at scale — the linear
    * interpolation h = (n−1)·p between the two bracketing order
    * statistics, computed WITHOUT sorting facts or holding all values in
    * one aggregation buffer (what [[quantilesExact]]'s built-in
    * percentile() does — fine per group, wrong shape for one 10¹⁰-row
    * distribution). The fact collapses to VALUE grain (cents, count),
    * one two-phase [[graft.util.PrefixSum]] assigns each distinct value
    * its global sort-position range [cum, cum+count), and each requested
    * percentile broadcast-joins in to pick the order statistics at
    * ⌊h⌋ and ⌊h⌋+1 by range containment — two lookups per percentile,
    * no global window. The interpolation is one mirrored double chain.
    */
  def percentileContDistributed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val grain = t(spark, sfDir, "orders")
      .select(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val ps = graft.util.PrefixSum
      .exclusiveColsTotal(grain, Seq(col("v").asc), col("c"), "cum0", "n")
    val pcts = Seq(0.25, 0.5, 0.75, 0.9).toDF("p")
    val j = ps.crossJoin(broadcast(pcts))
      .withColumn("h", (col("n") - 1).cast("double") * col("p"))
      .withColumn("k", floor(col("h")).cast("long"))
      .withColumn("k2", least(col("k") + 1, col("n") - 1))
      .withColumn("in_k", col("cum0") <= col("k") && col("k") < col("cum0") + col("c"))
      .withColumn("in_k2", col("cum0") <= col("k2") && col("k2") < col("cum0") + col("c"))
    val lo = col("vlo").cast("double") / lit(100.0)
    val hi = col("vhi").cast("double") / lit(100.0)
    ordered(
      j.filter(col("in_k") || col("in_k2"))
        .groupBy(col("p"))
        .agg(max(col("n")).as("n"), max(col("h")).as("h"),
             min(when(col("in_k"), col("v"))).as("vlo"),
             min(when(col("in_k2"), col("v"))).as("vhi"))
        .select(col("p"), col("n"),
                r4(lo + (col("h") - floor(col("h"))) * (hi - lo)).as("value")),
      "p")
  }

  /** Two-proportion A/B test — the experiment-analysis aggregate: users
    * split into variants by a pure id hash (reproducible assignment, no RNG
    * state), conversion = any event with value above threshold, and the
    * pooled two-proportion z-score decides significance. Counts are exact
    * integers; every double after them is a single mirrored expression, so
    * both engines compute a bit-identical z and the |z| > 1.96 verdict can't
    * flip on accumulation noise. Two hash aggregates (per-user conversion,
    * then per-variant tallies) — the user table never sorts.
    */
  def abTest(spark: SparkSession, sfDir: String, threshold: Double = 250.0): DataFrame = {
    val perUser = graft.util.Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(max((col("value") > threshold).cast("int")).as("converted"))
      .select((col("user_id") % 2 === 0).as("is_a"), col("converted"))
    val tallies = perUser.agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("is_a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(col("is_a"), col("converted").cast("long")).otherwise(0L)).as("conv_a"),
      sum(when(!col("is_a"), col("converted").cast("long")).otherwise(0L)).as("conv_b"))
    val pA = col("conv_a").cast("double") / col("n_a").cast("double")
    val pB = col("conv_b").cast("double") / col("n_b").cast("double")
    val pPool = (col("conv_a") + col("conv_b")).cast("double") /
                (col("n_a") + col("n_b")).cast("double")
    // degenerate pools (nobody / everybody converted) have zero variance —
    // z is undefined there, and ANSI mode would raise on the division
    val degenerate = (col("conv_a") + col("conv_b") === lit(0L)) ||
      (col("conv_a") + col("conv_b") === col("n_a") + col("n_b"))
    val z = when(degenerate, lit(null).cast("double")).otherwise(
      (pA - pB) /
        sqrt(pPool * (lit(1.0) - pPool) *
             (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double"))))
    tallies.select(
      col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      r4(pA).as("rate_a"), r4(pB).as("rate_b"),
      r4(z).as("z_score"), (abs(z) > lit(1.96)).as("significant"))
  }

  /** Correlated EXISTS / NOT EXISTS subqueries through the SQL front end:
    * customers with at least one big order and no failed-status order.
    * Written as subqueries (not explicit joins) deliberately — Catalyst's
    * RewritePredicateSubquery turns them into LEFT SEMI and LEFT ANTI hash
    * joins (PlanSpec asserts both appear, so the rewrite is verified, not
    * assumed): the correlated probe never re-executes per row the way the
    * reference's scalar-subquery watermark pattern does on SQL Server.
    */
  def existsSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "customer").createOrReplaceTempView("customer")
    t(spark, sfDir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Geometric and harmonic means of order value per segment — the
    * multiplicative/rate-average aggregates (CAGR-style growth, average of
    * ratios) that arithmetic mean gets wrong. G = exp(Σln x / n),
    * H = n / Σ(1/x); both Σs are sums OF doubles, so each term is cast to
    * DECIMAL(28,8) before aggregation (associative, partial-tree-proof —
    * the q_token_entropy pattern), and exp/ln/division are mirrored IEEE
    * calls on exact-by-construction inputs.
    */
  def multMeans(spark: SparkSession, sfDir: String): DataFrame = {
    val x = money(col("o_totalprice")).cast("double")
    ordered(
      t(spark, sfDir, "orders")
        .join(t(spark, sfDir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"),
                log(x).cast("decimal(28,8)").as("lnx"),
                (lit(1.0) / x).cast("decimal(28,8)").as("invx"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
             r4(exp(sum(col("lnx")).cast("double") / count(lit(1)).cast("double")))
               .as("geo_mean"),
             r4(count(lit(1)).cast("double") / sum(col("invx")).cast("double"))
               .as("harmonic_mean")),
      "c_mktsegment")
  }

  /** Multiset EXCEPT ALL — bag semantics the DISTINCT set ops can't
    * express: each duplicate survives as many times as it outnumbers the
    * subtrahend (SQL's EXCEPT ALL). Here: order-priority rows of 'F'
    * orders minus those of 'O' orders — the result counts per-priority
    * surplus with multiplicity. Spark's exceptAll plans as a
    * count-difference aggregate + generate, never a row-pairing join.
    */
  def exceptAll(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders")
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_orderpriority"))
    val p = o.filter(col("o_orderstatus") === "O").select(col("o_orderpriority"))
    ordered(
      f.exceptAll(p).groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("surplus")),
      "o_orderpriority")
  }

  /** Referential-integrity audit — orphan counts across every FK edge of
    * the star schema (the PK/FK checks a warehouse on SQL Server gets from
    * constraints; on a lake they must be ASSERTED by query). Each edge is
    * one anti-join (left-anti = rows whose FK misses every PK) aggregated
    * to a count. Broadcast HINTS only on the static dims (nation, region —
    * bounded at any SF); the SF-scaling parents (orders, part, supplier,
    * customer) go through AQE-chosen joins — at 100 TB the
    * lineitem→orders edge is a fact-fact anti-join whose parent key set is
    * itself fact-sized, and a forced broadcast there would OOM the driver.
    * Also validates PK uniqueness of each parent by count-vs-distinct.
    */
  def refIntegrity(spark: SparkSession, sfDir: String): DataFrame = {
    // one composed plan, ONE action: each edge contributes a single-row
    // (orphans × dup-pk) frame and the report is their union — no
    // count()-per-edge driver loop (12 sequential jobs → 1)
    def edge(name: String, child: DataFrame, fk: String,
             parent: DataFrame, pk: String, smallDim: Boolean): DataFrame = {
      val keys = parent.select(col(pk))
      val orphans = child.select(col(fk)).filter(col(fk).isNotNull)
        .join(if (smallDim) broadcast(keys) else keys,
              col(fk) === col(pk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      val dup = parent.agg(
        (count(lit(1)) - countDistinct(col(pk))).as("n_dup_pk"))
      orphans.crossJoin(dup).select(lit(name).as("fk_edge"),
                                    col("n_orphans"), col("n_dup_pk"))
    }
    val li = t(spark, sfDir, "lineitem"); val o = t(spark, sfDir, "orders")
    val c = t(spark, sfDir, "customer"); val n = t(spark, sfDir, "nation")
    val r = t(spark, sfDir, "region"); val p = t(spark, sfDir, "part")
    val s = t(spark, sfDir, "supplier")
    ordered(
      Seq(
        edge("lineitem.l_orderkey -> orders", li, "l_orderkey", o, "o_orderkey", smallDim = false),
        edge("lineitem.l_partkey -> part", li, "l_partkey", p, "p_partkey", smallDim = false),
        edge("lineitem.l_suppkey -> supplier", li, "l_suppkey", s, "s_suppkey", smallDim = false),
        edge("orders.o_custkey -> customer", o, "o_custkey", c, "c_custkey", smallDim = false),
        edge("customer.c_nationkey -> nation", c, "c_nationkey", n, "n_nationkey", smallDim = true),
        edge("nation.n_regionkey -> region", n, "n_regionkey", r, "r_regionkey", smallDim = true))
        .reduce(_.unionAll(_)),
      "fk_edge")
  }

  /** FK cardinality profile — the relationship-shape report that pairs
    * with [[refIntegrity]]'s orphan gate: per FK edge, how many children
    * does a parent actually have (min/avg/max over PRESENT parents plus
    * the count of childless ones via the dim-side anti/left join). The
    * report that catches a fan-out regression (a 1:N edge silently
    * becoming 1:N² after a bad load) before a join explodes downstream.
    * One child-side hash-agg per edge + one parent-count agg, composed
    * as a single unioned plan (the refIntegrity no-driver-loop rule).
    */
  def fkCardinality(spark: SparkSession, sfDir: String): DataFrame = {
    def edge(name: String, child: DataFrame, fk: String,
             parent: DataFrame, pk: String): DataFrame = {
      val perParent = child.groupBy(col(fk)).agg(count(lit(1)).as("nc"))
      val present = perParent.agg(
        count(lit(1)).as("n_parents_with_children"),
        sum(col("nc")).as("n_children"),
        min(col("nc")).as("min_children"),
        max(col("nc")).as("max_children"))
      val parents = parent.agg(count(lit(1)).as("n_parents"))
      present.crossJoin(parents)
        .select(lit(name).as("fk_edge"), col("n_parents"),
                col("n_parents_with_children"),
                (col("n_parents") - col("n_parents_with_children"))
                  .as("n_childless"),
                col("n_children"), col("min_children"), col("max_children"),
                r4(col("n_children").cast("double") /
                   col("n_parents_with_children").cast("double"))
                  .as("avg_children"))
    }
    val li = t(spark, sfDir, "lineitem"); val o = t(spark, sfDir, "orders")
    val c = t(spark, sfDir, "customer"); val n = t(spark, sfDir, "nation")
    val p = t(spark, sfDir, "part"); val s = t(spark, sfDir, "supplier")
    ordered(
      Seq(
        edge("lineitem -> orders", li, "l_orderkey", o, "o_orderkey"),
        edge("lineitem -> part", li, "l_partkey", p, "p_partkey"),
        edge("lineitem -> supplier", li, "l_suppkey", s, "s_suppkey"),
        edge("orders -> customer", o, "o_custkey", c, "c_custkey"),
        edge("customer -> nation", c, "c_nationkey", n, "n_nationkey"))
        .reduce(_.unionAll(_)),
      "fk_edge")
  }

  /** Relational division — "customers who bought EVERY brand in the
    * divisor set", the classic operator SQL has no keyword for. Shape:
    * dividend = distinct (customer, brand) purchases, divisor = the
    * filtered brand set; a customer qualifies when its distinct-brand
    * count over the divisor equals |divisor| (a broadcast scalar). Two
    * hash aggregates and one broadcast — never a per-customer set
    * comparison; the fact table shuffles once on (custkey, brand).
    */
  def relationalDivision(spark: SparkSession, sfDir: String): DataFrame = {
    val prefix = "Brand#1"
    val wanted = t(spark, sfDir, "part")
      .filter(col("p_brand").startsWith(prefix))
      .select(col("p_partkey"), col("p_brand"))
    val divisor = wanted.agg(countDistinct(col("p_brand")).as("n_brands"))
    val dividend = t(spark, sfDir, "lineitem")
      .join(t(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(wanted, col("l_partkey") === col("p_partkey"))
      .select(col("o_custkey").as("custkey"), col("p_brand"))
      .distinct()
    ordered(
      dividend.groupBy(col("custkey"))
        .agg(countDistinct(col("p_brand")).as("n_bought"))
        .crossJoin(broadcast(divisor))
        .filter(col("n_bought") === col("n_brands"))
        .select(col("custkey"), col("n_bought")),
      "custkey")
  }

  /** The NOT IN null trap — three-valued logic made visible: a NOT IN
    * whose subquery yields ANY NULL returns zero rows (x <> NULL is
    * UNKNOWN for every x), while the NOT EXISTS spelling of "the same"
    * predicate returns the expected set. Registered as a gated query so
    * the engine's null-aware anti-join semantics (Spark plans a
    * null-aware anti join; SQL Server users hit this exact trap when
    * porting) are proven equal to DuckDB's, not just documented. Output
    * is both counts side by side.
    */
  def notInNulls(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "customer").createOrReplaceTempView("customer")
    t(spark, sfDir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer
        |   WHERE c_custkey NOT IN
        |     (SELECT CASE WHEN o_totalprice > 450000.0 THEN o_custkey END
        |      FROM orders)) AS n_not_in,
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer c
        |   WHERE NOT EXISTS
        |     (SELECT 1 FROM orders o
        |      WHERE o.o_totalprice > 450000.0
        |        AND o.o_custkey = c.c_custkey)) AS n_not_exists""".stripMargin)
  }

  /** Aggregate-of-aggregate — per-segment statistics OF per-customer
    * totals (average customer lifetime value, not average order value):
    * the two-level rollup every mart report needs and every naive GROUP BY
    * gets wrong. Inner aggregate is DECIMAL-exact per customer; the outer
    * level re-aggregates the (much smaller) per-customer frame, and the
    * average is one mirrored double division of exact sums.
    */
  def aggOfAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val perCust = t(spark, sfDir, "orders")
      .join(t(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(sum(money(col("o_totalprice"))).as("spend"))
    ordered(
      perCust.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
             r4(sum(col("spend")).cast("double") / count(lit(1)).cast("double"))
               .as("avg_clv"),
             r4(min(col("spend")).cast("double")).as("min_clv"),
             r4(max(col("spend")).cast("double")).as("max_clv")),
      "c_mktsegment")
  }

  /** Correlated scalar subqueries — the reference's watermark pattern
    * (transform_load.sql's SELECT MAX(...) scalar lookups) generalized to
    * per-row correlation: each customer's last order date and order count
    * as inline scalars. Catalyst's RewriteCorrelatedScalarSubquery turns
    * both into ONE aggregate + left outer join — the subquery never
    * re-executes per row (SQL Server evaluates these as per-row probes
    * unless it finds the same rewrite). coalesce is spelled on both
    * engines so the no-orders case is a portable 0, not an engine-specific
    * NULL fix-up.
    */
  def scalarSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "customer").createOrReplaceTempView("customer")
    t(spark, sfDir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT c_custkey, c_name,
        |  CAST((SELECT max(o_orderdate) FROM orders
        |        WHERE o_custkey = c_custkey) AS DATE) AS last_order,
        |  coalesce((SELECT count(*) FROM orders
        |            WHERE o_custkey = c_custkey), 0) AS n_orders
        |FROM customer
        |ORDER BY c_custkey""".stripMargin)
  }

  /** LATERAL correlated subquery — per-nation top-2 customers by balance,
    * written as the SQL-standard `, LATERAL (... ORDER BY ... LIMIT k)`
    * instead of a window: the shape every "top-n related rows per outer
    * row" report takes. Catalyst plans the correlation as a domain join +
    * per-group limit — no per-outer-row re-execution.
    */
  def lateralTopN(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "customer").createOrReplaceTempView("customer")
    t(spark, sfDir, "nation").createOrReplaceTempView("nation")
    spark.sql(
      """SELECT n_name, ln.c_custkey,
        |       floor(ln.c_acctbal * 1e4 + 0.5D) / 1e4 AS c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) ln
        |ORDER BY n_name, c_custkey""".stripMargin)
  }

  /** Benford first-digit profile — the data-quality screen for fabricated
    * numeric columns: observed leading-digit frequencies of o_totalprice
    * against Benford's log₁₀(1+1/d) expectation. Digits extract as exact
    * integer/string ops; ratios are single IEEE divisions of exact counts,
    * so both engines emit bit-identical doubles. One hash aggregate with
    * a 9-row result — any scale.
    */
  def benfordProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val digit = substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
      .cast("int").as("digit")
    val counted = t(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 0.0)
      .groupBy(digit).agg(count(lit(1)).as("n"))
    val total = counted.agg(sum(col("n")).as("total"))
    ordered(
      counted.crossJoin(broadcast(total))
        .select(col("digit"), col("n"),
                r4(col("n").cast("double") / col("total").cast("double")).as("obs_ratio"),
                r4(log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0)))
                  .as("exp_ratio")),
      "digit")
  }

  /** Conditional aggregation — the FILTER-clause family: per return flag,
    * counts and sums restricted by per-row predicates inside ONE pass
    * (count_if / sum(CASE)). The single-scan replacement for the reference's
    * sequence of per-predicate UPDATE ... WHERE statements: at 100 TB each
    * extra pass is a full table read, so collapsing n predicates into one
    * scan with n conditional accumulators is the core trick of profiling
    * queries. Money sums stay DECIMAL until the output boundary.
    */
  def conditionalAgg(spark: SparkSession, sfDir: String): DataFrame =
    ordered(
      t(spark, sfDir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(when(col("l_quantity") > 25, lit(1))).as("n_bulk"),
          count(when(col("l_discount") === 0.0, lit(1))).as("n_undiscounted"),
          sum(when(col("l_discount") > 0.05, money(col("l_extendedprice")))
            .otherwise(money(lit(0.0)))).as("disc_rev_dec"),
          max(when(col("l_tax") > 0.04, col("l_quantity"))).as("max_taxed_qty"))
        .select(col("l_returnflag"), col("n_rows"), col("n_bulk"),
                col("n_undiscounted"),
                r4(col("disc_rev_dec").cast("double")).as("disc_revenue"),
                r4(col("max_taxed_qty")).as("max_taxed_qty")),
      "l_returnflag")

  /** Dense cross-tab with zero fill: EVERY (region, order-priority) cell,
    * including empty ones — reporting surfaces need the full grid, and an
    * inner join silently drops absent combinations. The dimension grid is a
    * cross join of two driver-tiny frames (5×5 rows — broadcast, never a
    * corpus cartesian); facts aggregate FIRST (region×priority cells), then
    * left-join onto the grid, so the outer join touches |grid| rows, not
    * |orders|.
    */
  def denseCrosstab(spark: SparkSession, sfDir: String): DataFrame = {
    val regions = t(spark, sfDir, "region").select(col("r_regionkey"), col("r_name"))
    val prios = t(spark, sfDir, "orders").select(col("o_orderpriority")).distinct()
    val cells = t(spark, sfDir, "orders")
      .join(t(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(spark, sfDir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey").as("r_regionkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders_raw"),
           sum(money(col("o_totalprice"))).as("rev_dec"))
    ordered(
      regions.crossJoin(prios)
        .join(cells, Seq("r_regionkey", "o_orderpriority"), "left")
        .select(col("r_name"), col("o_orderpriority"),
                coalesce(col("n_orders_raw"), lit(0L)).as("n_orders"),
                r4(coalesce(col("rev_dec").cast("double"), lit(0.0))).as("revenue")),
      "r_name", "o_orderpriority")
  }
}
