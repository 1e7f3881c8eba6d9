package graft.oracles

/** DuckDB oracle SQL for the warehouse lifecycle (SCD, MERGE, CDC, vault) tier — split out of SparkEntry
  * verbatim (round-11 registry hygiene). SparkEntry.oracleSql concatenates
  * the per-domain maps; keys stay globally unique and strings unchanged, so
  * the driver's hash gate sees an identical contract.
  */
object WarehouseSql {
  val sql: Map[String, String] = Map(
    "q_watermark_max" ->
      """SELECT max(CAST(o_orderdate AS DATE)) AS max_date FROM orders
        |WHERE o_custkey = (SELECT c_custkey FROM customer
        |                   WHERE c_name = 'Customer#000000042')""".stripMargin,

    "q_coalesce_default" ->
      """SELECT coalesce(max(CAST(o_orderdate AS DATE)), DATE '2000-01-01') AS since_date
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_name = 'Customer#NOSUCH')""".stripMargin,

    "q_incr_range_filter" ->
      """SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_date,
        | max(CAST(o_orderdate AS DATE)) + 1 AS start_date,
        | DATE '2000-06-01' AS end_date
        |FROM orders GROUP BY o_custkey
        |HAVING max(CAST(o_orderdate AS DATE)) + 1 <= DATE '2000-06-01'
        |ORDER BY o_custkey""".stripMargin,

    "q_scd_insert_new" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey < 100
        |UNION ALL
        |SELECT DISTINCT o_custkey AS c_custkey, NULL AS c_name, NULL AS c_mktsegment
        |FROM orders
        |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey < 100)
        |ORDER BY c_custkey""".stripMargin,

    "q_merge_upsert" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) AS o_totalprice,
        |         CAST(o_orderdate AS DATE) AS o_orderdate
        |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1999-01-01'),
        |s AS (
        |  SELECT o_orderkey, o_custkey, 'R' AS o_orderstatus,
        |         CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) * 1.1 AS DECIMAL(30,4)) AS o_totalprice,
        |         CAST(o_orderdate AS DATE) AS o_orderdate
        |  FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01')
        |SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
        |       floor(CAST(coalesce(s.o_totalprice, t.o_totalprice) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS o_totalprice,
        |       coalesce(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
        |       coalesce(s.o_custkey, t.o_custkey) AS o_custkey,
        |       coalesce(s.o_orderdate, t.o_orderdate) AS o_orderdate
        |FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
        |ORDER BY 1""".stripMargin,

    "q_mark_processed" ->
      """SELECT event_id, user_id, event_type, TRUE AS is_processed
        |FROM events ORDER BY event_id""".stripMargin,

    "q_cdc_changes" ->
      """WITH o_old AS (
        |  SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) AS p
        |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1997-06-01'),
        |o_new AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderpriority = '1-URGENT'
        |              THEN CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) * 1.05 AS DECIMAL(30,4))
        |              ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) END AS p
        |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |    AND o_orderpriority <> '3-MEDIUM'),
        |d AS (
        |  SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
        |         floor(CAST(n.p AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS new_price,
        |         CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |              WHEN n.o_orderkey IS NULL THEN 'delete'
        |              WHEN o.p <> n.p THEN 'update'
        |              ELSE 'unchanged' END AS change_type
        |  FROM o_new n FULL OUTER JOIN o_old o ON o.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey, new_price, change_type FROM d
        |WHERE change_type <> 'unchanged'
        |ORDER BY o_orderkey""".stripMargin,

    // round-13: sys.sp_cdc_get_all_changes — every intermediate operation
    // across the three version snapshots in LSN order, __$operation codes
    // 1=delete 2=insert 3=update-old 4=update-new (updates emit BOTH rows)
    "q_cdc_all_changes" -> {
      def pair(l: Int, o: String, n: String): String =
        s"""SELECT CAST($l AS BIGINT) AS lsn, n.o_orderkey,
           |       CAST(2 AS BIGINT) AS op, 'insert' AS op_name,
           |       floor(CAST(n.p AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS price
           |FROM $n n WHERE n.o_orderkey NOT IN (SELECT o_orderkey FROM $o)
           |UNION ALL
           |SELECT CAST($l AS BIGINT), o.o_orderkey, CAST(1 AS BIGINT),
           |       'delete', floor(CAST(o.p AS DOUBLE) * 10000.0 + 0.5) / 10000.0
           |FROM $o o WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM $n)
           |UNION ALL
           |SELECT CAST($l AS BIGINT), n.o_orderkey, CAST(3 AS BIGINT),
           |       'update_old', floor(CAST(o.p AS DOUBLE) * 10000.0 + 0.5) / 10000.0
           |FROM $n n JOIN $o o USING (o_orderkey) WHERE o.p <> n.p
           |UNION ALL
           |SELECT CAST($l AS BIGINT), n.o_orderkey, CAST(4 AS BIGINT),
           |       'update_new', floor(CAST(n.p AS DOUBLE) * 10000.0 + 0.5) / 10000.0
           |FROM $n n JOIN $o o USING (o_orderkey) WHERE o.p <> n.p""".stripMargin
      s"""WITH s1 AS (
        |  SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) AS p
        |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1997-06-01'),
        |s2 AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderpriority = '1-URGENT'
        |              THEN CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) * 1.05 AS DECIMAL(30,4))
        |              ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) END AS p
        |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1997-09-01'
        |    AND o_orderpriority <> '3-MEDIUM'),
        |s3 AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderpriority = '2-HIGH'
        |              THEN CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) * 1.1 AS DECIMAL(30,4))
        |              WHEN o_orderpriority = '1-URGENT'
        |              THEN CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) * 1.05 AS DECIMAL(30,4))
        |              ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) END AS p
        |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |    AND o_orderpriority NOT IN ('3-MEDIUM', '5-LOW'))
        |${pair(1, "s1", "s2")}
        |UNION ALL
        |${pair(2, "s2", "s3")}
        |ORDER BY lsn, o_orderkey, op""".stripMargin
    },

    // round-14: sys.sp_cdc_cleanup_change_table — retention prune with the
    // low-water mark clamped at the lagging consumer's bookmark (LSN 1 of
    // 2), so only the LSN-2 slice of the change log survives; lwm = 1 on
    // every surviving row
    "q_cdc_cleanup" ->
      """WITH s2 AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderpriority = '1-URGENT'
        |              THEN CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) * 1.05 AS DECIMAL(30,4))
        |              ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) END AS p
        |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1997-09-01'
        |    AND o_orderpriority <> '3-MEDIUM'),
        |s3 AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderpriority = '2-HIGH'
        |              THEN CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) * 1.1 AS DECIMAL(30,4))
        |              WHEN o_orderpriority = '1-URGENT'
        |              THEN CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) * 1.05 AS DECIMAL(30,4))
        |              ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) END AS p
        |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |    AND o_orderpriority NOT IN ('3-MEDIUM', '5-LOW'))
        |SELECT CAST(2 AS BIGINT) AS lsn, n.o_orderkey,
        |       CAST(2 AS BIGINT) AS op, 'insert' AS op_name,
        |       floor(CAST(n.p AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS price,
        |       CAST(1 AS BIGINT) AS low_water_mark
        |FROM s3 n WHERE n.o_orderkey NOT IN (SELECT o_orderkey FROM s2)
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), o.o_orderkey, CAST(1 AS BIGINT),
        |       'delete', floor(CAST(o.p AS DOUBLE) * 10000.0 + 0.5) / 10000.0,
        |       CAST(1 AS BIGINT)
        |FROM s2 o WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM s3)
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), n.o_orderkey, CAST(3 AS BIGINT),
        |       'update_old', floor(CAST(o.p AS DOUBLE) * 10000.0 + 0.5) / 10000.0,
        |       CAST(1 AS BIGINT)
        |FROM s3 n JOIN s2 o USING (o_orderkey) WHERE o.p <> n.p
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), n.o_orderkey, CAST(4 AS BIGINT),
        |       'update_new', floor(CAST(n.p AS DOUBLE) * 10000.0 + 0.5) / 10000.0,
        |       CAST(1 AS BIGINT)
        |FROM s3 n JOIN s2 o USING (o_orderkey) WHERE o.p <> n.p
        |ORDER BY lsn, o_orderkey, op""".stripMargin,

    // round-13: sys.sp_cdc_get_net_changes — first vs last snapshot, one
    // row per key, net mask codes 1=delete 2=insert 4=update (new image);
    // mid-history insert-then-delete keys net to nothing
    "q_cdc_net_changes" ->
      """WITH s1 AS (
        |  SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) AS p
        |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1997-06-01'),
        |s3 AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderpriority = '2-HIGH'
        |              THEN CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) * 1.1 AS DECIMAL(30,4))
        |              WHEN o_orderpriority = '1-URGENT'
        |              THEN CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) * 1.05 AS DECIMAL(30,4))
        |              ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) END AS p
        |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |    AND o_orderpriority NOT IN ('3-MEDIUM', '5-LOW')),
        |d AS (
        |  SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
        |         CASE WHEN o.o_orderkey IS NULL THEN CAST(2 AS BIGINT)
        |              WHEN n.o_orderkey IS NULL THEN CAST(1 AS BIGINT)
        |              WHEN o.p <> n.p THEN CAST(4 AS BIGINT) END AS op,
        |         CASE WHEN o.o_orderkey IS NULL OR o.p <> n.p
        |              THEN floor(CAST(n.p AS DOUBLE) * 10000.0 + 0.5) / 10000.0
        |              ELSE floor(CAST(o.p AS DOUBLE) * 10000.0 + 0.5) / 10000.0
        |              END AS price
        |  FROM s3 n FULL OUTER JOIN s1 o ON o.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey, op,
        |       CASE op WHEN 1 THEN 'delete' WHEN 2 THEN 'insert'
        |               ELSE 'update' END AS op_name, price
        |FROM d WHERE op IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,

    "q_date_dim_generate" ->
      """SELECT CAST(g AS DATE) AS d,
        | CAST(year(CAST(g AS DATE)) AS INT) AS yr,
        | CAST(quarter(CAST(g AS DATE)) AS INT) AS qtr,
        | CAST(month(CAST(g AS DATE)) AS INT) AS mo,
        | CAST(day(CAST(g AS DATE)) AS INT) AS dom,
        | CAST(isodow(CAST(g AS DATE)) AS INT) AS dow_iso,
        | isodow(CAST(g AS DATE)) >= 6 AS is_weekend
        |FROM generate_series(DATE '2000-01-01', DATE '2002-12-31', INTERVAL 1 DAY) t(g)
        |ORDER BY d""".stripMargin,

    "q_scd2_versions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'signup')
        |SELECT user_id, event_id, ts_us AS valid_from_us,
        |       lead(ts_us) OVER w AS valid_to_us,
        |       lead(ts_us) OVER w IS NULL AS is_current
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, valid_from_us, event_id""".stripMargin,

    "q_scd2_asof" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'signup'),
        |v AS (SELECT user_id, event_id, ts_us AS valid_from_us,
        |             lead(ts_us) OVER w AS valid_to_us,
        |             lead(ts_us) OVER w IS NULL AS is_current
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT * FROM v
        |WHERE valid_from_us <= 1705276800000000
        |  AND (valid_to_us IS NULL OR valid_to_us > 1705276800000000)
        |ORDER BY user_id""".stripMargin,

    // round-13: FOR SYSTEM_TIME CONTAINED IN (lo, hi) — versions whose
    // whole validity lies inside the interval, boundaries INCLUSIVE;
    // open/current versions are never contained
    "q_scd2_contained_in" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'signup'),
        |v AS (SELECT user_id, event_id, ts_us AS valid_from_us,
        |             lead(ts_us) OVER w AS valid_to_us,
        |             lead(ts_us) OVER w IS NULL AS is_current
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT * FROM v
        |WHERE valid_from_us >= 1704067200000000
        |  AND valid_to_us IS NOT NULL AND valid_to_us <= 1719792000000000
        |ORDER BY user_id, valid_from_us, event_id""".stripMargin,

    // round-14: FOR SYSTEM_TIME ALL — every version of every key (current
    // + history as one relation), per-key version ordinal, source table tag
    "q_scd2_all" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'signup'),
        |v AS (SELECT user_id, event_id, ts_us AS valid_from_us,
        |             lead(ts_us) OVER w AS valid_to_us,
        |             lead(ts_us) OVER w IS NULL AS is_current,
        |             CAST(row_number() OVER w AS BIGINT) AS version_no
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT user_id, event_id, valid_from_us, valid_to_us, is_current,
        |       version_no,
        |       CASE WHEN is_current THEN 'current' ELSE 'history' END
        |         AS src_table
        |FROM v
        |ORDER BY user_id, valid_from_us, event_id""".stripMargin,

    // round-14: HISTORY_RETENTION_PERIOD — closed versions ending at or
    // before the cutoff are purged, open/current rows always survive,
    // ordinals re-densify over the retained table
    "q_scd2_retention" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'signup'),
        |v AS (SELECT user_id, event_id, ts_us AS valid_from_us,
        |             lead(ts_us) OVER w AS valid_to_us,
        |             lead(ts_us) OVER w IS NULL AS is_current
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT * FROM v
        |      WHERE is_current OR valid_to_us > 1705276800000000)
        |SELECT user_id, event_id, valid_from_us, valid_to_us, is_current,
        |       CAST(row_number() OVER (PARTITION BY user_id
        |              ORDER BY valid_from_us, event_id) AS BIGINT)
        |         AS version_no,
        |       CAST(1705276800000000 AS BIGINT) AS retention_cutoff_us
        |FROM s
        |ORDER BY user_id, valid_from_us, event_id""".stripMargin,

    // round-14: the CDC bookmark consumer's replica must equal the latest
    // dimension snapshot (s3 recomputed straight from orders), consumed
    // LSN = 2 (two change slices applied)
    "q_cdc_incremental_consume" ->
      """WITH s3 AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderpriority = '2-HIGH'
        |              THEN CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) * 1.1 AS DECIMAL(30,4))
        |              WHEN o_orderpriority = '1-URGENT'
        |              THEN CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) * 1.05 AS DECIMAL(30,4))
        |              ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) END AS p
        |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |    AND o_orderpriority NOT IN ('3-MEDIUM', '5-LOW'))
        |SELECT o_orderkey,
        |       floor(CAST(p AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS price,
        |       CAST(2 AS BIGINT) AS consumed_lsn
        |FROM s3 ORDER BY o_orderkey""".stripMargin,

    // round-13: FOR SYSTEM_TIME FROM lo TO hi — interval overlap with SQL
    // Server's strict boundaries (valid_from < hi AND valid_to > lo)
    "q_scd2_between" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'signup'),
        |v AS (SELECT user_id, event_id, ts_us AS valid_from_us,
        |             lead(ts_us) OVER w AS valid_to_us,
        |             lead(ts_us) OVER w IS NULL AS is_current
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT * FROM v
        |WHERE valid_from_us < 1711929600000000
        |  AND (valid_to_us IS NULL OR valid_to_us > 1704067200000000)
        |ORDER BY user_id, valid_from_us, event_id""".stripMargin,

    "q_late_arriving" ->
      """WITH dim AS (SELECT c_custkey, c_name, c_nationkey FROM customer
        |             WHERE c_custkey % 10 <> 0),
        |inf AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
        |        WHERE o_custkey NOT IN (SELECT c_custkey FROM dim))
        |SELECT c_custkey, c_name, c_nationkey, 0 AS is_inferred FROM dim
        |UNION ALL
        |SELECT c_custkey, 'UNKNOWN#' || c_custkey AS c_name,
        |       CAST(-1 AS INTEGER) AS c_nationkey, 1 AS is_inferred FROM inf
        |ORDER BY c_custkey""".stripMargin,

    "q_surrogate_key" ->
      """SELECT c_custkey, row_number() OVER (ORDER BY c_custkey) AS sk
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_incr_agg_merge" ->
      """SELECT o_custkey,
        | floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS total_spend,
        | count(*) AS n_orders
        |FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_etl_run_report" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |         CAST(len(list_filter(string_split(text, ' '),
        |                              w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |         CAST(list_contains(string_split(text, ' '), 'the') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'a') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'of') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'and') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'to') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'with') AS INT) AS n_stops,
        |         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS dg
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, dg,
        |         ((n_words >= 20 AND n_words <= 1000)
        |          AND (CAST(length(text) - (n_words - 1) AS DOUBLE)
        |               / CAST(n_words AS DOUBLE) >= 3.0
        |               AND CAST(length(text) - (n_words - 1) AS DOUBLE)
        |                   / CAST(n_words AS DOUBLE) <= 10.0)
        |          AND (n_alpha * 5 >= n_words * 4) AND (n_stops >= 2)) AS g,
        |         (doc_id % 10 < 8) AS tr
        |  FROM d),
        |cn AS (SELECT dg, min(doc_id) AS mn FROM f WHERE g GROUP BY dg),
        |fl AS (SELECT f.g, (f.g AND f.doc_id = cn.mn) AS c, f.tr
        |       FROM f LEFT JOIN cn USING (dg)),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n0,
        |             CAST(sum(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |             CAST(sum(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |             CAST(sum(CASE WHEN c AND tr THEN 1 ELSE 0 END) AS BIGINT) AS n3
        |      FROM fl),
        |s AS (
        |  SELECT 1 AS stage_id, 'ingest' AS stage, n0 AS rows_in, n0 AS rows_out FROM a
        |  UNION ALL SELECT 2, 'gopher_quality', n0, n1 FROM a
        |  UNION ALL SELECT 3, 'exact_dedup', n1, n2 FROM a
        |  UNION ALL SELECT 4, 'train_split', n2, n3 FROM a)
        |SELECT CAST(stage_id AS BIGINT) AS stage_id, stage, rows_in, rows_out,
        |       rows_in - rows_out AS rows_dropped,
        |       floor(CAST(rows_in - rows_out AS DOUBLE) / CAST(rows_in AS DOUBLE)
        |             * 10000.0 + 0.5) / 10000.0 AS drop_pct
        |FROM s ORDER BY stage_id""".stripMargin,

    "q_resample_weekly" ->
      """SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
        | o_orderstatus, count(*) AS n_orders,
        | floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS max_price
        |FROM orders
        |GROUP BY 1, 2 ORDER BY week_start, o_orderstatus""".stripMargin,

    "q_role_playing_dim" ->
      """WITH dd AS (
        |  SELECT CAST(g AS DATE) AS d,
        |         CAST(year(CAST(g AS DATE)) AS INT) AS yr,
        |         CAST(quarter(CAST(g AS DATE)) AS INT) AS qtr
        |  FROM generate_series(DATE '1995-01-01', DATE '2001-12-31', INTERVAL 1 DAY) t(g))
        |SELECT od.yr AS order_yr, od.qtr AS order_qtr,
        |       sd.yr AS ship_yr, sd.qtr AS ship_qtr,
        |       count(*) AS n_items,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN dd od ON CAST(o_orderdate AS DATE) = od.d
        |JOIN dd sd ON CAST(l_shipdate AS DATE) = sd.d
        |GROUP BY 1, 2, 3, 4
        |ORDER BY order_yr, order_qtr, ship_yr, ship_qtr""".stripMargin,

    "q_incr_join_merge" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mo,
        |       count(*) AS n_items,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_hierarchy" ->
      """WITH RECURSIVE h AS (
        |  SELECT p_partkey AS node, p_partkey AS cur, CAST(0 AS BIGINT) AS depth
        |  FROM part
        |  UNION ALL
        |  SELECT node, cur // 10, depth + 1 FROM h WHERE cur >= 10)
        |SELECT node AS p_partkey, cur AS root_key, depth
        |FROM h WHERE cur < 10 ORDER BY node""".stripMargin,

    "q_scd2_timeline_join" ->
      """WITH pa AS (SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS d,
        |                   min(o_orderpriority) AS priority
        |            FROM orders GROUP BY 1, 2),
        |a AS (SELECT ck, d AS fa,
        |             lead(d, 1) OVER (PARTITION BY ck ORDER BY d ASC) AS ta,
        |             priority
        |      FROM pa),
        |pb AS (SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS d,
        |              min(o_orderstatus) AS status
        |       FROM orders GROUP BY 1, 2),
        |b AS (SELECT ck, d AS fb,
        |             lead(d, 1) OVER (PARTITION BY ck ORDER BY d ASC) AS tb,
        |             status
        |      FROM pb)
        |SELECT a.ck AS c_custkey,
        | greatest(a.fa, b.fb) AS valid_from,
        | CASE WHEN COALESCE(a.ta, DATE '9999-12-31')
        |           <= COALESCE(b.tb, DATE '9999-12-31')
        |      THEN a.ta ELSE b.tb END AS valid_to,
        | a.priority, b.status
        |FROM a JOIN b ON a.ck = b.ck
        |WHERE a.fa < COALESCE(b.tb, DATE '9999-12-31')
        |  AND b.fb < COALESCE(a.ta, DATE '9999-12-31')
        |ORDER BY c_custkey, valid_from""".stripMargin,

    "q_agg_rewrite" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
        | floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY n_name, yr""".stripMargin,

    "q_snapshot_reconcile" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'signup'),
        |v AS (SELECT user_id, event_id, ts_us AS f,
        |             lead(ts_us) OVER w AS t
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |a AS (SELECT user_id, event_id AS v1 FROM v
        |      WHERE f <= 1704844800000000
        |        AND (t IS NULL OR t > 1704844800000000)),
        |b AS (SELECT user_id, event_id AS v2 FROM v
        |      WHERE f <= 1705276800000000
        |        AND (t IS NULL OR t > 1705276800000000))
        |SELECT
        | CAST(sum(CASE WHEN v1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_t1,
        | CAST(sum(CASE WHEN v2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_t2,
        | CAST(sum(CASE WHEN v1 IS NULL AND v2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        | CAST(sum(CASE WHEN v1 IS NOT NULL AND v2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        | CAST(sum(CASE WHEN v1 IS NOT NULL AND v2 IS NOT NULL AND v1 <> v2
        |               THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        | CAST(sum(CASE WHEN v1 = v2 THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
        |FROM a FULL OUTER JOIN b USING (user_id)""".stripMargin,

    "q_scd6" ->
      """WITH v AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'signup')
        |SELECT user_id,
        | CAST(row_number() OVER w AS BIGINT) AS version_n,
        | ts_us AS valid_from_us,
        | lead(ts_us) OVER w AS valid_to_us,
        | cents,
        | lag(cents) OVER w AS prior_cents,
        | last_value(cents) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |   AS current_cents,
        | (lead(ts_us) OVER w IS NULL) AS is_current
        |FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, version_n""".stripMargin,

    "q_audit_dim" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS batch_month,
        | CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        | CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        | floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS total_price,
        | CAST(sum((o_orderkey * 1000003 + o_custkey) % 2147483647) AS BIGINT)
        |   AS content_checksum
        |FROM orders GROUP BY 1 ORDER BY batch_month""".stripMargin,

    "q_bridge_alloc" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey,
        |         sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS lr
        |  FROM lineitem GROUP BY 1, 2),
        |orv AS (SELECT l_orderkey, sum(lr) AS orv FROM li GROUP BY 1),
        |otp AS (SELECT o_orderkey,
        |               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS otp_c
        |        FROM orders),
        |al AS (SELECT li.l_partkey,
        |              (otp_c * CAST(lr * 10000 AS BIGINT))
        |                // CAST(orv * 10000 AS BIGINT) AS ac
        |       FROM li JOIN orv USING (l_orderkey)
        |            JOIN otp ON o_orderkey = l_orderkey)
        |SELECT l_partkey AS part_id, CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(ac) AS BIGINT) AS alloc_cents,
        |       floor(CAST(sum(ac) AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0
        |         AS alloc_rev
        |FROM al GROUP BY 1 ORDER BY part_id""".stripMargin,

    "q_scd3" ->
      """WITH v AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events WHERE event_type = 'signup')
        |SELECT user_id,
        | max(CASE WHEN rn = 1 THEN cents END) AS cur_cents,
        | max(CASE WHEN rn = 2 THEN cents END) AS prior_cents,
        | max(CASE WHEN rn = 1 THEN ts_us END) AS changed_at_us,
        | CAST(count(*) AS BIGINT) AS n_versions
        |FROM v GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_periodic_snapshot" ->
      """WITH monthly AS (
        |  SELECT l_suppkey AS s_suppkey,
        |         CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        |  FROM lineitem GROUP BY 1, 2),
        |bounds AS (
        |  SELECT CAST(date_trunc('month', min(l_shipdate)) AS DATE) AS lo,
        |         CAST(date_trunc('month', max(l_shipdate)) AS DATE) AS hi
        |  FROM lineitem),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS m
        |  FROM bounds),
        |grid AS (SELECT s.s_suppkey, sp.m FROM supplier s CROSS JOIN spine sp),
        |filled AS (
        |  SELECT g.s_suppkey, g.m,
        |         COALESCE(mo.qty, CAST(0 AS DECIMAL(18,2))) AS q
        |  FROM grid g LEFT JOIN monthly mo
        |    ON g.s_suppkey = mo.s_suppkey AND g.m = mo.m)
        |SELECT s_suppkey, m, CAST(q AS DOUBLE) AS qty_shipped,
        | CAST(sum(q) OVER (PARTITION BY s_suppkey ORDER BY m
        |                   ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS balance
        |FROM filled ORDER BY s_suppkey, m""".stripMargin,

    "q_accumulating_snapshot" ->
      """WITH ms AS (
        |  SELECT l_orderkey AS o_orderkey,
        |         min(CAST(l_shipdate AS DATE)) AS first_ship,
        |         max(CAST(l_shipdate AS DATE)) AS last_ship,
        |         CAST(count(*) AS BIGINT) AS n_lines,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        |  FROM lineitem GROUP BY 1)
        |SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS placed,
        | ms.first_ship, ms.last_ship, ms.n_lines,
        | CAST(ms.qty AS DOUBLE) AS total_qty,
        | CAST(date_diff('day', CAST(o.o_orderdate AS DATE), ms.first_ship) AS BIGINT) AS days_to_first_ship,
        | CAST(date_diff('day', ms.first_ship, ms.last_ship) AS BIGINT) AS ship_span_days
        |FROM orders o JOIN ms ON o.o_orderkey = ms.o_orderkey
        |ORDER BY o.o_orderkey""".stripMargin,

    "q_scd4_minidim" ->
      """WITH combos AS (
        |  SELECT CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        |         c_mktsegment AS segment,
        |         CAST(count(*) AS BIGINT) AS n_customers
        |  FROM customer GROUP BY 1, 2)
        |SELECT CAST(row_number() OVER (ORDER BY bal_band, segment) AS BIGINT) AS mini_key,
        |       bal_band, segment, n_customers
        |FROM combos ORDER BY mini_key""".stripMargin,

    "q_factless_coverage" ->
      """WITH cm AS (
        |  SELECT DISTINCT o_custkey AS ck,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS m
        |  FROM orders),
        |spine AS (
        |  SELECT ck, CAST(unnest(generate_series(m0, m1, INTERVAL 1 MONTH)) AS DATE) AS m
        |  FROM (SELECT ck, min(m) AS m0, max(m) AS m1 FROM cm GROUP BY ck)),
        |j AS (SELECT s.m, CASE WHEN cm.ck IS NULL THEN 0 ELSE 1 END AS active
        |      FROM spine s LEFT JOIN cm ON s.ck = cm.ck AND s.m = cm.m)
        |SELECT m, CAST(count(*) AS BIGINT) AS n_eligible,
        |       CAST(sum(active) AS BIGINT) AS n_active,
        |       CAST(count(*) - sum(active) AS BIGINT) AS n_silent,
        |       floor(CAST(count(*) - sum(active) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |             * 10000.0 + 0.5) / 10000.0 AS silent_rate
        |FROM j GROUP BY m ORDER BY m""".stripMargin,

    "q_junk_dim" ->
      """WITH hr AS (
        |  SELECT l_orderkey,
        |         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_returns
        |  FROM lineitem GROUP BY 1),
        |flags AS (
        |  SELECT o_orderstatus AS status, o_orderpriority AS priority,
        |         CAST(COALESCE(hr.has_returns, 0) AS BIGINT) AS has_returns,
        |         o_totalprice
        |  FROM orders LEFT JOIN hr ON o_orderkey = hr.l_orderkey),
        |combos AS (
        |  SELECT status, priority, has_returns,
        |         CAST(count(*) AS BIGINT) AS n_orders,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM flags GROUP BY 1, 2, 3)
        |SELECT CAST(row_number() OVER (ORDER BY status, priority, has_returns)
        |            AS BIGINT) AS junk_key,
        |       status, priority, has_returns, n_orders,
        |       floor(CAST(rev AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue
        |FROM combos ORDER BY junk_key""".stripMargin,

    "q_bitemporal_asof" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    epoch_us(ts) // 86400000000 - event_id % 3 AS valid_day,
        |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |b AS (SELECT min(valid_day) AS d0 FROM e),
        |q1 AS (SELECT user_id, valid_day, ts_us, event_id, vq
        |       FROM e CROSS JOIN b
        |       WHERE valid_day <= d0 + 15 AND ts_us < (d0 + 16) * 86400000000),
        |q2 AS (SELECT user_id, valid_day, ts_us, event_id, vq
        |       FROM e CROSS JOIN b
        |       WHERE valid_day <= d0 + 15 AND ts_us < (d0 + 41) * 86400000000),
        |a1 AS (SELECT user_id, valid_day AS valid_day_t1, event_id AS event_id_t1,
        |         floor(CAST(vq AS DOUBLE) / 10000.0 * 10000.0 + 0.5) / 10000.0
        |           AS value_t1
        |       FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |               ORDER BY valid_day DESC, ts_us DESC, event_id DESC) AS rn
        |             FROM q1) WHERE rn = 1),
        |a2 AS (SELECT user_id, valid_day AS valid_day_t2, event_id AS event_id_t2,
        |         floor(CAST(vq AS DOUBLE) / 10000.0 * 10000.0 + 0.5) / 10000.0
        |           AS value_t2
        |       FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |               ORDER BY valid_day DESC, ts_us DESC, event_id DESC) AS rn
        |             FROM q2) WHERE rn = 1)
        |SELECT COALESCE(a1.user_id, a2.user_id) AS user_id,
        |       valid_day_t1, event_id_t1, value_t1,
        |       valid_day_t2, event_id_t2, value_t2,
        |       COALESCE(event_id_t1, -1) <> COALESCE(event_id_t2, -1) AS corrected
        |FROM a1 FULL OUTER JOIN a2 ON a1.user_id = a2.user_id
        |ORDER BY user_id""".stripMargin,

    "q_data_vault" ->
      """WITH hc AS (SELECT md5(CAST(c_custkey AS VARCHAR)) AS hk FROM customer),
        |ho AS (SELECT md5(CAST(o_orderkey AS VARCHAR)) AS hk FROM orders),
        |lo AS (SELECT md5(concat_ws('|', CAST(o_orderkey AS VARCHAR),
        |                            CAST(o_custkey AS VARCHAR))) AS hk
        |       FROM orders),
        |so AS (SELECT md5(concat_ws('|', CAST(o_orderkey AS VARCHAR))) AS hk,
        |         md5(concat_ws('|', o_orderstatus,
        |             CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
        |                  AS VARCHAR),
        |             CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
        |             o_orderpriority)) AS hashdiff
        |       FROM orders),
        |u AS (
        |  SELECT 'hub_customer' AS vault_table, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(DISTINCT hk) AS BIGINT) AS n_distinct_hk,
        |    CAST(count(DISTINCT hk) AS BIGINT) AS n_distinct_payload,
        |    min(hk) AS min_hk, max(hk) AS max_hk
        |  FROM hc
        |  UNION ALL
        |  SELECT 'hub_order', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT hk) AS BIGINT),
        |    CAST(count(DISTINCT hk) AS BIGINT), min(hk), max(hk)
        |  FROM ho
        |  UNION ALL
        |  SELECT 'link_order_customer', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT hk) AS BIGINT),
        |    CAST(count(DISTINCT hk) AS BIGINT), min(hk), max(hk)
        |  FROM lo
        |  UNION ALL
        |  SELECT 'sat_order', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT hk) AS BIGINT),
        |    CAST(count(DISTINCT hashdiff) AS BIGINT), min(hk), max(hk)
        |  FROM so)
        |SELECT * FROM u ORDER BY vault_table""".stripMargin
  )
}
