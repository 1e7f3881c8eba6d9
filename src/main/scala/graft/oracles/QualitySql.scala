package graft.oracles

/** DuckDB oracle SQL for the data-quality / enrichment tier — split out of SparkEntry
  * verbatim (round-11 registry hygiene). SparkEntry.oracleSql concatenates
  * the per-domain maps; keys stay globally unique and strings unchanged, so
  * the driver's hash gate sees an identical contract.
  */
object QualitySql {
  val sql: Map[String, String] = Map(
    "q_scalar_string_funcs" ->
      """SELECT c_custkey,
        | upper(c_name) AS upper_name,
        | CAST(length(c_name) AS INT) AS name_len,
        | lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS cust_code,
        | substr(c_mktsegment, 1, 3) AS seg3,
        | split_part(c_name, '#', 2) AS num_part,
        | replace(c_name, 'Customer', 'Cust') AS short_name,
        | concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_seasonal_anomaly" ->
      """WITH e AS (SELECT event_id, event_type, value,
        |                  (epoch_us(ts) // 3600000000) % 24 AS hour
        |           FROM events),
        |s AS (SELECT event_type, hour,
        |        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS mu,
        |        stddev_samp(value) AS sigma
        |      FROM e GROUP BY event_type, hour)
        |SELECT event_id, e.event_type, e.hour,
        | floor(value * 10000.0 + 0.5) / 10000.0 AS value,
        | floor(mu * 10000.0 + 0.5) / 10000.0 AS mu
        |FROM e JOIN s USING (event_type, hour)
        |WHERE sigma IS NOT NULL AND sigma > 0
        |  AND abs(value - mu) > 2.0 * sigma
        |ORDER BY event_id""".stripMargin,

    "q_winsorize" ->
      """WITH e AS (SELECT event_id, event_type, value FROM events),
        |edges AS (SELECT event_type,
        |            quantile_cont(value, 0.05) AS p_lo,
        |            quantile_cont(value, 0.95) AS p_hi
        |          FROM e GROUP BY event_type)
        |SELECT event_id, e.event_type,
        | floor(value * 10000.0 + 0.5) / 10000.0 AS value,
        | floor((CASE WHEN value < p_lo THEN p_lo
        |             WHEN value > p_hi THEN p_hi
        |             ELSE value END) * 10000.0 + 0.5) / 10000.0 AS value_w
        |FROM e JOIN edges ON e.event_type = edges.event_type
        |ORDER BY event_id""".stripMargin,

    "q_dedup_rownum" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type, event_id, ts_us,
        | floor(value * 10000.0 + 0.5) / 10000.0 AS value
        |FROM e WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q_impute_avg" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag,
        |         CAST(month(CAST(l_shipdate AS DATE)) AS INT) AS mo,
        |         CASE WHEN l_linenumber <> 3 THEN l_quantity END AS m1,
        |         CASE WHEN l_linenumber <> 4 THEN l_discount END AS m2
        |  FROM lineitem),
        |g AS (
        |  SELECT l_returnflag, mo,
        |         CAST(sum(CAST(m1 AS DECIMAL(18,2))) AS DOUBLE) / count(m1) AS a1,
        |         CAST(sum(CAST(m2 AS DECIMAL(18,2))) AS DOUBLE) / count(m2) AS a2
        |  FROM li GROUP BY l_returnflag, mo)
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag, mo,
        | floor((CASE WHEN m1 IS NULL OR m2 IS NULL THEN a1 ELSE m1 END) * 10000.0 + 0.5) / 10000.0 AS m1_filled,
        | floor((CASE WHEN m1 IS NULL OR m2 IS NULL THEN a2 ELSE m2 END) * 10000.0 + 0.5) / 10000.0 AS m2_filled
        |FROM li JOIN g USING (l_returnflag, mo)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         l_returnflag, mo, m1_filled, m2_filled""".stripMargin,

    "q_outlier_zscore" ->
      """WITH s AS (SELECT event_type,
        |                  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS mu,
        |                  stddev_samp(value) AS sigma
        |           FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type,
        | floor((CASE WHEN s.sigma IS NULL OR s.sigma = 0
        |                  OR abs(e.value - s.mu) / s.sigma <= 3
        |             THEN e.value ELSE s.mu END) * 10000.0 + 0.5) / 10000.0 AS value_capped
        |FROM events e JOIN s USING (event_type)
        |ORDER BY event_id""".stripMargin,

    "q_dq_profile" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS column_name, l_quantity AS v FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT column_name, count(*) AS n_rows,
        | count(*) - count(v) AS n_nulls,
        | floor(min(v) * 10000.0 + 0.5) / 10000.0 AS min_v,
        | floor(max(v) * 10000.0 + 0.5) / 10000.0 AS max_v,
        | count(DISTINCT v) AS n_distinct
        |FROM u GROUP BY column_name ORDER BY column_name""".stripMargin,

    "q_dq_rules" ->
      """WITH nr AS (SELECT count(*) AS n_rows FROM orders),
        |rep AS (
        |  SELECT 'not_null(o_custkey)' AS rule,
        |         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        |  FROM orders
        |  UNION ALL SELECT 'not_null(o_orderdate)',
        |    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'in_range(o_totalprice)',
        |    CAST(sum(CASE WHEN o_totalprice IS NOT NULL
        |                   AND (o_totalprice < 0.0 OR o_totalprice > 1000000.0)
        |             THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'in_set(o_orderstatus)',
        |    CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
        |                   AND o_orderstatus NOT IN ('F', 'O', 'P')
        |             THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'matches_regex(o_orderpriority)',
        |    CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
        |                   AND NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
        |             THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'date_in_epoch',
        |    CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1990-01-01'
        |             THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'unique(o_orderkey)',
        |    CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'ref_integrity(o_custkey)',
        |    CAST((SELECT count(*) FROM orders o
        |          LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |          WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL) AS BIGINT)
        |  UNION ALL SELECT 'k_anonymity(o_orderstatus,o_orderpriority,2)',
        |    CAST(coalesce((SELECT sum(n) FROM (
        |            SELECT count(*) AS n FROM orders
        |            GROUP BY o_orderstatus, o_orderpriority) g
        |          WHERE n < 2), 0) AS BIGINT))
        |SELECT rule, n_violations, (SELECT n_rows FROM nr) AS n_rows,
        |       n_violations = 0 AS pass
        |FROM rep ORDER BY rule""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(least(9, floor(l_extendedprice / 11000.0)) AS INT) AS bucket,
        | count(*) AS n_rows,
        | floor(min(l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS min_price,
        | floor(max(l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS max_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_update_conditional" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag,
        | CASE WHEN l_returnflag = 'R' AND l_quantity > 30
        |      THEN CAST(30.0 AS DOUBLE) ELSE l_quantity END AS qty_capped
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         l_returnflag, qty_capped""".stripMargin,

    "q_arrays_zip_explode" ->
      """SELECT vec_id, CAST(i - 1 AS INT) AS pos,
        | floor(CAST(v AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS v
        |FROM (SELECT vec_id, unnest(embedding) AS v,
        |             generate_subscripts(embedding, 1) AS i
        |      FROM embeddings WHERE vec_id < 8) u
        |ORDER BY vec_id, pos""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
        |ORDER BY event_id""".stripMargin,

    "q_json_staging" ->
      """WITH staged AS (
        |  SELECT event_id,
        |         '{"meta":' || props || ',"ids":[' || event_id || ',' || user_id || ']}' AS payload
        |  FROM events)
        |SELECT event_id,
        | CAST(json_extract_string(payload, '$.meta.k') AS INT) AS k,
        | CAST(json_extract_string(payload, '$.ids[1]') AS BIGINT) AS second_id,
        | CAST(json_array_length(payload, '$.ids') AS BIGINT) AS n_ids
        |FROM staged
        |WHERE CAST(json_extract_string(payload, '$.meta.k') AS INT) >= 10
        |  AND CAST(json_extract_string(payload, '$.meta.k') AS INT) < 90
        |ORDER BY event_id""".stripMargin,

    "q_scalar_date_funcs" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        | CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
        | CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qtr,
        | CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS mo,
        | CAST(isodow(CAST(o_orderdate AS DATE)) AS INT) AS dow_iso,
        | CASE WHEN month(CAST(o_orderdate AS DATE)) IN (12,1,2) THEN 'winter'
        |      WHEN month(CAST(o_orderdate AS DATE)) IN (3,4,5) THEN 'spring'
        |      WHEN month(CAST(o_orderdate AS DATE)) IN (6,7,8) THEN 'summer'
        |      ELSE 'autumn' END AS season
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_scalar_math_funcs" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        | floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) / 10000.0 AS net_price,
        | floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 10000.0 + 0.5) / 10000.0 AS charged,
        | floor(abs(l_discount - l_tax) * 10000.0 + 0.5) / 10000.0 AS abs_disc_tax_gap,
        | floor((CASE WHEN l_quantity <> 0.0 THEN l_extendedprice / l_quantity END) * 10000.0 + 0.5) / 10000.0 AS unit_price,
        | CASE WHEN l_discount >= 0.05 THEN 'high' ELSE 'low' END AS disc_band
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         net_price, charged, abs_disc_tax_gap, unit_price, disc_band""".stripMargin,

    "q_null_semantics" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        | CASE WHEN l_linenumber <> 3 THEN l_quantity END AS m,
        | (CASE WHEN l_linenumber <> 3 THEN l_quantity END) IS NOT DISTINCT FROM NULL AS nseq_null,
        | (CASE WHEN l_linenumber <> 3 THEN l_quantity END) IS NOT DISTINCT FROM 30.0 AS nseq_30,
        | (CASE WHEN l_linenumber <> 3 THEN l_quantity END) = 30.0 AS eq_30,
        | nullif(l_quantity, 30.0) AS qty_nullif_30,
        | coalesce(CASE WHEN l_linenumber <> 3 THEN l_quantity END, -1.0) AS m_defaulted
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, m NULLS FIRST""".stripMargin,

    "q_window_range_frame" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        | count(*) OVER w AS n_last_30m,
        | floor(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS sum_last_30m
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q_outlier_mad" ->
      """WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
        |med AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM ev GROUP BY 1),
        |dev AS (SELECT event_type, med, abs(value - med) AS adev
        |        FROM ev JOIN med USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1)
        |SELECT event_type, count(*) AS n,
        | floor(min(med) * 10000.0 + 0.5) / 10000.0 AS med,
        | floor(min(mad) * 10000.0 + 0.5) / 10000.0 AS mad,
        | CAST(sum(CASE WHEN adev > 4.4478 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev JOIN mad USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_explode_outer" ->
      """SELECT o.o_orderkey, l.l_linenumber AS item
        |FROM orders o LEFT JOIN (
        |  SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_discount > 0.09) l
        |ON o.o_orderkey = l.l_orderkey
        |ORDER BY o.o_orderkey, item NULLS FIRST""".stripMargin,

    "q_outlier_iqr" ->
      """WITH f AS (
        |  SELECT c_mktsegment,
        |         quantile_cont(c_acctbal, 0.25) AS q1,
        |         quantile_cont(c_acctbal, 0.75) AS q3
        |  FROM customer GROUP BY c_mktsegment),
        |fe AS (
        |  SELECT c_mktsegment,
        |         q1 - 1.5 * (q3 - q1) AS lo,
        |         q3 + 1.5 * (q3 - q1) AS hi
        |  FROM f)
        |SELECT c.c_mktsegment, c.c_custkey,
        | floor(c.c_acctbal * 10000.0 + 0.5) / 10000.0 AS c_acctbal,
        | floor(fe.lo * 10000.0 + 0.5) / 10000.0 AS fence_lo,
        | floor(fe.hi * 10000.0 + 0.5) / 10000.0 AS fence_hi,
        | CASE WHEN c.c_acctbal < fe.lo THEN 'low' ELSE 'high' END AS side
        |FROM customer c JOIN fe ON c.c_mktsegment = fe.c_mktsegment
        |WHERE c.c_acctbal < fe.lo OR c.c_acctbal > fe.hi
        |ORDER BY c.c_mktsegment, c.c_custkey""".stripMargin,

    "q_cusum" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS HUGEINT) AS cents
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT d, cents,
        |         sum(cents) OVER (ORDER BY d
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
        |         CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
        |  FROM daily),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(cents) AS total FROM daily),
        |s AS (SELECT c.d, c.cents, (t.n * c.prefix - c.i * t.total) AS dev, t.n
        |      FROM c CROSS JOIN t),
        |p AS (SELECT max(abs(dev)) AS peak_dev FROM s)
        |SELECT s.d,
        | floor(CAST(s.cents AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(CAST(s.dev AS DOUBLE) / (100.0 * CAST(s.n AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS cusum,
        | CASE WHEN abs(s.dev) = p.peak_dev THEN 1 ELSE 0 END AS is_peak
        |FROM s CROSS JOIN p ORDER BY s.d""".stripMargin,

    "q_moments" ->
      """WITH b AS (
        |  SELECT c_mktsegment,
        |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM customer),
        |s AS (
        |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(x AS HUGEINT)) AS s1,
        |         sum(CAST(x AS HUGEINT) * x) AS s2,
        |         sum(CAST(x AS HUGEINT) * x * x) AS s3,
        |         sum(CAST(x AS HUGEINT) * x * x * x) AS s4
        |  FROM b GROUP BY 1),
        |m AS (
        |  SELECT c_mktsegment, n,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS a2,
        |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS a3,
        |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS a4
        |  FROM s),
        |k AS (
        |  SELECT c_mktsegment, n, mu,
        |    a2 - mu * mu AS m2,
        |    a3 - 3.0 * mu * a2 + 2.0 * mu * mu * mu AS m3,
        |    a4 - 4.0 * mu * a3 + 6.0 * mu * mu * a2 - 3.0 * mu * mu * mu * mu AS m4
        |  FROM m)
        |SELECT c_mktsegment, n,
        | floor(mu / 100.0 * 10000.0 + 0.5) / 10000.0 AS mean,
        | CASE WHEN m2 > 0 THEN floor(m3 / (m2 * sqrt(m2)) * 10000.0 + 0.5) / 10000.0 END AS skewness,
        | CASE WHEN m2 > 0 THEN floor(m4 / (m2 * m2) * 10000.0 + 0.5) / 10000.0 END AS kurtosis
        |FROM k ORDER BY c_mktsegment""".stripMargin,

    "q_psi_drift" ->
      """WITH o AS (
        |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS vc,
        |         year(o_orderdate) <= 1997 AS is_base
        |  FROM orders),
        |rng AS (SELECT min(vc) AS mn, max(vc) AS mx FROM o),
        |cnts AS (
        |  SELECT least(9, ((vc - mn) * 10) // (mx - mn + 1)) AS bin,
        |         CAST(sum(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT) AS c_base,
        |         CAST(sum(CASE WHEN NOT is_base THEN 1 ELSE 0 END) AS BIGINT) AS c_curr
        |  FROM o, rng GROUP BY 1),
        |tot AS (SELECT CAST(sum(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |               CAST(sum(CASE WHEN NOT is_base THEN 1 ELSE 0 END) AS BIGINT) AS nc
        |        FROM o),
        |ab AS (SELECT CAST(unnest(range(10)) AS BIGINT) AS bin),
        |terms AS (
        |  SELECT ab.bin,
        |         COALESCE(c_base, 0) AS c_base, COALESCE(c_curr, 0) AS c_curr,
        |         CAST(floor((CAST(COALESCE(c_base, 0) + 1 AS DOUBLE) / CAST(na + 10 AS DOUBLE)
        |                     - CAST(COALESCE(c_curr, 0) + 1 AS DOUBLE) / CAST(nc + 10 AS DOUBLE))
        |                    * ln((CAST(COALESCE(c_base, 0) + 1 AS DOUBLE) / CAST(na + 10 AS DOUBLE))
        |                         / (CAST(COALESCE(c_curr, 0) + 1 AS DOUBLE) / CAST(nc + 10 AS DOUBLE)))
        |                    * 1000000.0 + 0.5) AS BIGINT) AS psi_term_fp
        |  FROM ab LEFT JOIN cnts ON cnts.bin = ab.bin, tot)
        |SELECT bin, c_base, c_curr, psi_term_fp,
        |       (SELECT CAST(sum(psi_term_fp) AS BIGINT) FROM terms) AS psi_total_fp
        |FROM terms ORDER BY bin""".stripMargin
  )
}
