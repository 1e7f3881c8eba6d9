package graft.oracles

/** DuckDB oracle SQL for the core relational / join / time-join tier — split out of SparkEntry
  * verbatim (round-11 registry hygiene). SparkEntry.oracleSql concatenates
  * the per-domain maps; keys stay globally unique and strings unchanged, so
  * the driver's hash gate sees an identical contract.
  */
object RelationalSql {
  val sql: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
        | floor(l_extendedprice * 10000.0 + 0.5) / 10000.0 AS l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         l_quantity, floor(l_extendedprice * 10000.0 + 0.5) / 10000.0""".stripMargin,

    "q_filter_predicate" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        | l_returnflag, l_linestatus, l_quantity
        |FROM lineitem
        |WHERE (l_returnflag = 'R' OR l_linestatus = 'F')
        |  AND l_discount > 0.05 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         l_returnflag, l_linestatus, l_quantity""".stripMargin,

    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        | floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS sum_base_price,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS sum_disc_price,
        | floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_price,
        | floor(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_inner_equi" ->
      """SELECT p_brand,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_salted_join" ->
      """SELECT p_brand,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q_join_full_outer" ->
      """WITH c AS (SELECT c_custkey AS custkey, c_name FROM customer
        |           WHERE c_mktsegment = 'BUILDING'),
        |o AS (SELECT o_custkey AS custkey, count(*) AS n_big_orders
        |      FROM orders WHERE o_totalprice > 450000.0 GROUP BY 1)
        |SELECT coalesce(c.custkey, o.custkey) AS custkey, c_name, n_big_orders
        |FROM c FULL OUTER JOIN o ON c.custkey = o.custkey
        |ORDER BY 1""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, floor(o_totalprice * 10000.0 + 0.5) / 10000.0 AS o_totalprice,
        | o_orderpriority
        |FROM orders
        |ORDER BY floor(o_totalprice * 10000.0 + 0.5) / 10000.0 DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_set_ops" ->
      """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | UNION
        | SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000.0)
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_acctbal < 0
        |ORDER BY c_custkey""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        | CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        | CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        | CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        | CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        | CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, measure, value
        |FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         'qty' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         'disc' AS measure, l_discount AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         'tax' AS measure, l_tax AS value FROM lineitem) u
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, measure, value""".stripMargin,

    "q_asof_join" ->
      """WITH s AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS event_id
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id, epoch_us(ts)),
        |p AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id, p.user_id,
        |       p.ts_us AS purchase_ts_us,
        |       s.ts_us AS signup_ts_us, s.event_id AS signup_id
        |FROM p ASOF LEFT JOIN s
        |  ON p.user_id = s.user_id AND s.ts_us <= p.ts_us
        |ORDER BY purchase_id""".stripMargin,

    // identical oracle on purpose: the hash gate then proves the custom
    // physical operator (AsofJoinExec) ≡ the compositional window form,

    "q_asof_join_native" ->
      """WITH s AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS event_id
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id, epoch_us(ts)),
        |p AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id, p.user_id,
        |       p.ts_us AS purchase_ts_us,
        |       s.ts_us AS signup_ts_us, s.event_id AS signup_id
        |FROM p ASOF LEFT JOIN s
        |  ON p.user_id = s.user_id AND s.ts_us <= p.ts_us
        |ORDER BY purchase_id""".stripMargin,

    "q_asof_tolerance" ->
      """WITH s AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS event_id
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id, epoch_us(ts)),
        |p AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id, p.user_id,
        |       p.ts_us AS purchase_ts_us,
        |       CASE WHEN p.ts_us - s.ts_us <= 604800000000 THEN s.ts_us END AS signup_ts_us,
        |       CASE WHEN p.ts_us - s.ts_us <= 604800000000 THEN s.event_id END AS signup_id
        |FROM p ASOF LEFT JOIN s
        |  ON p.user_id = s.user_id AND s.ts_us <= p.ts_us
        |ORDER BY purchase_id""".stripMargin,

    "q_interval_join" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        | CAST(o_orderdate AS DATE) AS o_date,
        | CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE)
        |  AND CAST(l_shipdate AS DATE) <= CAST(o_orderdate AS DATE) + 90
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         o_date, ship_date""".stripMargin,

    "q_range_band_join" ->
      """SELECT a.event_id AS id_a, b.event_id AS id_b,
        | epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
        |FROM events a JOIN events b
        |  ON a.event_id < b.event_id
        | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 1000000
        |ORDER BY id_a, id_b""".stripMargin,

    "q_topk_per_group" ->
      """WITH r AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |  row_number() OVER (PARTITION BY l_suppkey
        |                     ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
        | FROM lineitem)
        |SELECT l_suppkey, CAST(rk AS BIGINT) AS rk, l_orderkey, l_linenumber,
        | floor(l_extendedprice * 10000.0 + 0.5) / 10000.0 AS l_extendedprice
        |FROM r WHERE rk <= 3 ORDER BY l_suppkey, rk""".stripMargin,

    "q_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
        | count(*) AS n_rows,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        | count(*) AS n_orders,
        | count(DISTINCT o_custkey) AS n_customers,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_star_join" ->
      """SELECT n_name,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_percentile_disc" ->
      """WITH r AS (
        |  SELECT c_nationkey, c_acctbal,
        |         row_number() OVER (PARTITION BY c_nationkey
        |                            ORDER BY c_acctbal, c_custkey) AS rn,
        |         count(*) OVER (PARTITION BY c_nationkey) AS n
        |  FROM customer)
        |SELECT c_nationkey, max(n) AS n,
        | floor(max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN c_acctbal END) * 10000.0 + 0.5) / 10000.0 AS p50_disc,
        | floor(max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN c_acctbal END) * 10000.0 + 0.5) / 10000.0 AS p90_disc
        |FROM r GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_group_concat" ->
      """WITH d AS (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders)
        |SELECT o_orderpriority,
        | string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
        |FROM d GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_mode_agg" ->
      """WITH c AS (SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |           FROM orders GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
        |                ORDER BY n DESC, o_orderstatus ASC) AS rn FROM c)
        |SELECT o_orderpriority, o_orderstatus AS mode_status, n AS n_mode
        |FROM r WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin,

    "q_quantiles_exact" ->
      """SELECT o_orderpriority, count(*) AS n,
        | floor(quantile_cont(o_totalprice, 0.25) * 10000.0 + 0.5) / 10000.0 AS p25,
        | floor(quantile_cont(o_totalprice, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
        | floor(quantile_cont(o_totalprice, 0.75) * 10000.0 + 0.5) / 10000.0 AS p75
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_corr_agg" ->
      """WITH g AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        | floor((n * sxy - sx * sy) /
        |       (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |       * 10000.0 + 0.5) / 10000.0 AS corr_disc_qty
        |FROM g ORDER BY l_returnflag""".stripMargin,

    "q_regr_agg" ->
      """WITH g AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        | floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 10000.0 + 0.5) / 10000.0 AS slope,
        | floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n * 10000.0 + 0.5) / 10000.0 AS intercept,
        | floor(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
        |       ((n * sxx - sx * sx) * (n * syy - sy * sy)) * 10000.0 + 0.5) / 10000.0 AS r2
        |FROM g ORDER BY l_returnflag""".stripMargin,

    "q_percent_total" ->
      """WITH cell AS (
        |  SELECT l_returnflag, l_linestatus,
        |         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev_d
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus),
        |tot AS (SELECT l_returnflag, sum(rev_d) AS tot_d
        |        FROM cell GROUP BY l_returnflag)
        |SELECT cell.l_returnflag, cell.l_linestatus,
        | floor(CAST(rev_d AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(CAST(rev_d AS DOUBLE) / CAST(tot_d AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS share
        |FROM cell JOIN tot ON cell.l_returnflag = tot.l_returnflag
        |ORDER BY cell.l_returnflag, cell.l_linestatus""".stripMargin,

    "q_argmax" ->
      """WITH j AS (SELECT n_name, c_custkey, c_acctbal
        |           FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |r AS (SELECT n_name, c_custkey, c_acctbal,
        |        row_number() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey ASC) AS rn,
        |        count(*) OVER (PARTITION BY n_name) AS n_members
        |      FROM j)
        |SELECT n_name, c_custkey AS top_custkey,
        | floor(c_acctbal * 10000.0 + 0.5) / 10000.0 AS top_acctbal, n_members
        |FROM r WHERE rn = 1 ORDER BY n_name""".stripMargin,

    "q_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n_items,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_exists_subquery" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q_conditional_agg" ->
      """SELECT l_returnflag,
        | count(*) AS n_rows,
        | count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
        | count(*) FILTER (WHERE l_discount = 0.0) AS n_undiscounted,
        | floor(CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |              FILTER (WHERE l_discount > 0.05), 0) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS disc_revenue,
        | floor(max(l_quantity) FILTER (WHERE l_tax > 0.04) * 10000.0 + 0.5) / 10000.0
        |   AS max_taxed_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_crosstab_dense" ->
      """WITH grid AS (
        |  SELECT r_regionkey, r_name, o_orderpriority
        |  FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)),
        |cells AS (
        |  SELECT n_regionkey AS r_regionkey, o_orderpriority,
        |         count(*) AS n_orders_raw,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT g.r_name, g.o_orderpriority,
        | coalesce(c.n_orders_raw, 0) AS n_orders,
        | floor(coalesce(CAST(c.rev_dec AS DOUBLE), 0.0) * 10000.0 + 0.5) / 10000.0
        |   AS revenue
        |FROM grid g LEFT JOIN cells c
        |  ON g.r_regionkey = c.r_regionkey AND g.o_orderpriority = c.o_orderpriority
        |ORDER BY g.r_name, g.o_orderpriority""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT c_custkey, c_name,
        |  CAST((SELECT max(o_orderdate) FROM orders
        |        WHERE o_custkey = c_custkey) AS DATE) AS last_order,
        |  coalesce((SELECT count(*) FROM orders
        |            WHERE o_custkey = c_custkey), 0) AS n_orders
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "q_lateral_topn" ->
      """SELECT n_name, ln.c_custkey,
        |       floor(ln.c_acctbal * 10000.0 + 0.5) / 10000.0 AS c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) ln
        |ORDER BY n_name, c_custkey""".stripMargin,

    "q_benford" ->
      """WITH counted AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
        |         count(*) AS n
        |  FROM orders WHERE o_totalprice > 0.0
        |  GROUP BY 1),
        |total AS (SELECT sum(n) AS total FROM counted)
        |SELECT digit, n,
        | floor(CAST(n AS DOUBLE) / CAST(total AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS obs_ratio,
        | floor(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) * 10000.0 + 0.5) / 10000.0 AS exp_ratio
        |FROM counted, total
        |ORDER BY digit""".stripMargin,

    "q_abtest" ->
      """WITH per_user AS (
        |  SELECT user_id % 2 = 0 AS is_a,
        |         max(CASE WHEN value > 250.0 THEN 1 ELSE 0 END) AS converted
        |  FROM events GROUP BY user_id),
        |t AS (
        |  SELECT sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS n_a,
        |         sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS n_b,
        |         sum(CASE WHEN is_a THEN converted ELSE 0 END) AS conv_a,
        |         sum(CASE WHEN NOT is_a THEN converted ELSE 0 END) AS conv_b
        |  FROM per_user)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        | CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
        | floor(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS rate_a,
        | floor(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS rate_b,
        | CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN NULL ELSE
        | floor((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |       / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |              * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |              * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 END AS z_score,
        | CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN NULL ELSE
        | abs((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |      - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |     / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |            * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |            * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))) > 1.96
        |   END AS significant
        |FROM t""".stripMargin,

    "q_join_right_outer" ->
      """SELECT p_partkey, count(l_orderkey) AS n_lineitems,
        | floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS total_qty
        |FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
        |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin,

    "q_cross_join" ->
      """SELECT r.r_regionkey, r.r_name, n.n_nationkey, n.n_name,
        |       CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END AS is_member
        |FROM region r CROSS JOIN nation n
        |ORDER BY r.r_regionkey, n.n_nationkey""".stripMargin,

    "q_mult_means" ->
      """WITH j AS (
        |  SELECT c_mktsegment,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        | floor(exp(CAST(sum(CAST(ln(x) AS DECIMAL(28,8))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS geo_mean,
        | floor(CAST(count(*) AS DOUBLE)
        |       / CAST(sum(CAST(1.0 / x AS DECIMAL(28,8))) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS harmonic_mean
        |FROM j GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_except_all" ->
      """WITH d AS (
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT ALL
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O')
        |SELECT o_orderpriority, count(*) AS surplus
        |FROM d GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_ref_integrity" ->
      """SELECT * FROM (
        |  SELECT 'lineitem.l_orderkey -> orders' AS fk_edge,
        |    (SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
        |    (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS n_dup_pk
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey -> part',
        |    (SELECT count(*) FROM lineitem l WHERE l.l_partkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)),
        |    (SELECT count(*) - count(DISTINCT p_partkey) FROM part)
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey -> supplier',
        |    (SELECT count(*) FROM lineitem l WHERE l.l_suppkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)),
        |    (SELECT count(*) - count(DISTINCT s_suppkey) FROM supplier)
        |  UNION ALL
        |  SELECT 'orders.o_custkey -> customer',
        |    (SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
        |    (SELECT count(*) - count(DISTINCT c_custkey) FROM customer)
        |  UNION ALL
        |  SELECT 'customer.c_nationkey -> nation',
        |    (SELECT count(*) FROM customer c WHERE c.c_nationkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)),
        |    (SELECT count(*) - count(DISTINCT n_nationkey) FROM nation)
        |  UNION ALL
        |  SELECT 'nation.n_regionkey -> region',
        |    (SELECT count(*) FROM nation n WHERE n.n_regionkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)),
        |    (SELECT count(*) - count(DISTINCT r_regionkey) FROM region)
        |) t ORDER BY fk_edge""".stripMargin,

    "q_division" ->
      """WITH wanted AS (
        |  SELECT p_partkey, p_brand FROM part WHERE p_brand LIKE 'Brand#1%'),
        |divisor AS (SELECT count(DISTINCT p_brand) AS n_brands FROM wanted),
        |dividend AS (
        |  SELECT DISTINCT o.o_custkey AS custkey, w.p_brand
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN wanted w ON l.l_partkey = w.p_partkey)
        |SELECT custkey, CAST(count(DISTINCT p_brand) AS BIGINT) AS n_bought
        |FROM dividend CROSS JOIN divisor
        |GROUP BY custkey, divisor.n_brands
        |HAVING count(DISTINCT p_brand) = divisor.n_brands
        |ORDER BY custkey""".stripMargin,

    "q_not_in_nulls" ->
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer
        |   WHERE c_custkey NOT IN
        |     (SELECT CASE WHEN o_totalprice > 450000.0 THEN o_custkey END
        |      FROM orders)) AS n_not_in,
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer c
        |   WHERE NOT EXISTS
        |     (SELECT 1 FROM orders o
        |      WHERE o.o_totalprice > 450000.0
        |        AND o.o_custkey = c.c_custkey)) AS n_not_exists""".stripMargin,

    "q_agg_of_agg" ->
      """WITH pc AS (
        |  SELECT c_mktsegment, o_custkey,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment, o_custkey)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        | floor(CAST(sum(spend) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS avg_clv,
        | floor(CAST(min(spend) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS min_clv,
        | floor(CAST(max(spend) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS max_clv
        |FROM pc GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_fk_cardinality" ->
      """WITH e1 AS (
        |  SELECT 'lineitem -> orders' AS fk_edge,
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_parents,
        |    CAST(count(*) AS BIGINT) AS n_parents_with_children,
        |    CAST(sum(nc) AS BIGINT) AS n_children,
        |    CAST(min(nc) AS BIGINT) AS min_children,
        |    CAST(max(nc) AS BIGINT) AS max_children
        |  FROM (SELECT l_orderkey, count(*) AS nc FROM lineitem GROUP BY 1)),
        |e2 AS (
        |  SELECT 'lineitem -> part',
        |    (SELECT CAST(count(*) AS BIGINT) FROM part),
        |    CAST(count(*) AS BIGINT), CAST(sum(nc) AS BIGINT),
        |    CAST(min(nc) AS BIGINT), CAST(max(nc) AS BIGINT)
        |  FROM (SELECT l_partkey, count(*) AS nc FROM lineitem GROUP BY 1)),
        |e3 AS (
        |  SELECT 'lineitem -> supplier',
        |    (SELECT CAST(count(*) AS BIGINT) FROM supplier),
        |    CAST(count(*) AS BIGINT), CAST(sum(nc) AS BIGINT),
        |    CAST(min(nc) AS BIGINT), CAST(max(nc) AS BIGINT)
        |  FROM (SELECT l_suppkey, count(*) AS nc FROM lineitem GROUP BY 1)),
        |e4 AS (
        |  SELECT 'orders -> customer',
        |    (SELECT CAST(count(*) AS BIGINT) FROM customer),
        |    CAST(count(*) AS BIGINT), CAST(sum(nc) AS BIGINT),
        |    CAST(min(nc) AS BIGINT), CAST(max(nc) AS BIGINT)
        |  FROM (SELECT o_custkey, count(*) AS nc FROM orders GROUP BY 1)),
        |e5 AS (
        |  SELECT 'customer -> nation',
        |    (SELECT CAST(count(*) AS BIGINT) FROM nation),
        |    CAST(count(*) AS BIGINT), CAST(sum(nc) AS BIGINT),
        |    CAST(min(nc) AS BIGINT), CAST(max(nc) AS BIGINT)
        |  FROM (SELECT c_nationkey, count(*) AS nc FROM customer GROUP BY 1)),
        |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2
        |      UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4
        |      UNION ALL SELECT * FROM e5)
        |SELECT fk_edge, n_parents, n_parents_with_children,
        | CAST(n_parents - n_parents_with_children AS BIGINT) AS n_childless,
        | n_children, min_children, max_children,
        | floor(CAST(n_children AS DOUBLE) / CAST(n_parents_with_children AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS avg_children
        |FROM u ORDER BY fk_edge""".stripMargin,

    "q_percentile_cont" ->
      """WITH grain AS (
        |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |ps AS (
        |  SELECT v, c,
        |         COALESCE(sum(c) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0,
        |         sum(c) OVER () AS n
        |  FROM grain),
        |pp AS (SELECT unnest([0.25, 0.5, 0.75, 0.9]) AS p),
        |j AS (
        |  SELECT ps.*, pp.p,
        |         CAST(n - 1 AS DOUBLE) * p AS h,
        |         CAST(floor(CAST(n - 1 AS DOUBLE) * p) AS BIGINT) AS k
        |  FROM ps CROSS JOIN pp),
        |j2 AS (
        |  SELECT *, least(k + 1, n - 1) AS k2,
        |         (cum0 <= k AND k < cum0 + c) AS in_k,
        |         (cum0 <= least(k + 1, n - 1) AND least(k + 1, n - 1) < cum0 + c) AS in_k2
        |  FROM j),
        |sel AS (
        |  SELECT p, CAST(max(n) AS BIGINT) AS n, max(h) AS h,
        |         min(CASE WHEN in_k THEN v END) AS vlo,
        |         min(CASE WHEN in_k2 THEN v END) AS vhi
        |  FROM j2 WHERE in_k OR in_k2 GROUP BY p)
        |SELECT p, n,
        | floor((CAST(vlo AS DOUBLE) / 100.0
        |        + (h - floor(h)) * (CAST(vhi AS DOUBLE) / 100.0 - CAST(vlo AS DOUBLE) / 100.0))
        |       * 10000.0 + 0.5) / 10000.0 AS value
        |FROM sel ORDER BY p""".stripMargin,

    "q_basket_size_hist" ->
      """WITH sizes AS (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_orders_total FROM sizes)
        |SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders,
        | floor((CAST(count(*) AS DOUBLE) / CAST(n_orders_total AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS share
        |FROM sizes CROSS JOIN tot GROUP BY n_lines, n_orders_total
        |ORDER BY n_lines""".stripMargin
  )
}
