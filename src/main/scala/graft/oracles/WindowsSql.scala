package graft.oracles

/** DuckDB oracle SQL for the window / sequence / event tier — split out of SparkEntry
  * verbatim (round-11 registry hygiene). SparkEntry.oracleSql concatenates
  * the per-domain maps; keys stay globally unique and strings unchanged, so
  * the driver's hash gate sees an identical contract.
  */
object WindowsSql {
  val sql: Map[String, String] = Map(
    "q_window_ranks" ->
      """SELECT o_orderkey, o_orderpriority,
        | floor(o_totalprice * 10000.0 + 0.5) / 10000.0 AS o_totalprice,
        | CAST(rank() OVER w AS BIGINT) AS rnk,
        | CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        | floor(percent_rank() OVER w * 10000.0 + 0.5) / 10000.0 AS pct_rank
        |FROM orders WHERE o_totalprice > 450000.0
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin,

    "q_window_cume" ->
      """SELECT o_orderkey, o_custkey,
        | floor(o_totalprice * 10000.0 + 0.5) / 10000.0 AS o_totalprice,
        | floor(cume_dist() OVER (PARTITION BY o_custkey
        |                         ORDER BY o_totalprice, o_orderkey)
        |       * 10000.0 + 0.5) / 10000.0 AS cume
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_rolling_median" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        |           FROM events)
        |SELECT event_id, user_id, ts_us,
        | floor(quantile_cont(value, 0.5) OVER (PARTITION BY user_id
        |        ORDER BY ts_us, event_id
        |        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |       * 10000.0 + 0.5) / 10000.0 AS med7
        |FROM e ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q_gap_fill_locf" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day, value
        |           FROM events),
        |daily AS (SELECT user_id, day,
        |            CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |          FROM e GROUP BY user_id, day),
        |spine AS (SELECT user_id,
        |            unnest(generate_series(min(day), max(day))) AS day
        |          FROM daily GROUP BY user_id),
        |j AS (SELECT s.user_id, s.day, d.v
        |      FROM spine s LEFT JOIN daily d USING (user_id, day))
        |SELECT user_id, day,
        | floor((last_value(v IGNORE NULLS) OVER (
        |          PARTITION BY user_id ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |       * 10000.0 + 0.5) / 10000.0 AS v_filled,
        | CAST(v IS NULL AS INT) AS is_filled
        |FROM j ORDER BY user_id, day""".stripMargin,

    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s0 AS (SELECT user_id, min(ts_us) AS t_signup FROM e
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |v0 AS (SELECT e.user_id, t_signup, min(ts_us) AS t_view
        |       FROM e JOIN s0 ON e.user_id = s0.user_id
        |       WHERE event_type = 'view' AND ts_us > t_signup
        |       GROUP BY e.user_id, t_signup),
        |p0 AS (SELECT e.user_id, t_signup, t_view, min(ts_us) AS t_purchase
        |       FROM e JOIN v0 ON e.user_id = v0.user_id
        |       WHERE event_type = 'purchase' AND ts_us > t_view
        |       GROUP BY e.user_id, t_signup, t_view)
        |SELECT user_id, t_signup, t_view, t_purchase FROM p0
        |ORDER BY user_id""".stripMargin,

    "q_retention" ->
      """WITH ue AS (
        |  SELECT DISTINCT user_id,
        |    year(make_timestamp(epoch_us(ts))) * 12 + month(make_timestamp(epoch_us(ts))) AS ym
        |  FROM events),
        |c AS (SELECT user_id, min(ym) AS cohort_ym FROM ue GROUP BY user_id)
        |SELECT cohort_ym, ym - cohort_ym AS month_offset,
        | count(DISTINCT ue.user_id) AS n_users
        |FROM ue JOIN c ON ue.user_id = c.user_id
        |GROUP BY cohort_ym, ym - cohort_ym
        |ORDER BY cohort_ym, month_offset""".stripMargin,

    "q_gaps_islands" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |g AS (SELECT user_id, day,
        |        day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
        |                   AS INTEGER) AS grp
        |      FROM d)
        |SELECT user_id, min(day) AS start_day, max(day) AS end_day,
        |       count(*) AS n_days
        |FROM g GROUP BY user_id, grp ORDER BY user_id, start_day""".stripMargin,

    "q_window_tumbling" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
        | count(*) AS n_events,
        | floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS sum_value,
        | count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_session_gaps" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                          OR ts_us - lag(ts_us) OVER w > 1800000000
        |                     THEN 1 ELSE 0 END AS new_sess
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
        |                     ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |      FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        | min(ts_us) AS session_start_us, max(ts_us) AS session_end_us
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    "q_window_frame" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        | floor(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |       / count(*) OVER w * 10000.0 + 0.5) / 10000.0 AS mavg4
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q_window_values" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        | lag(event_type, 1) OVER w AS prev_type,
        | floor(lag(value, 1) OVER w * 10000.0 + 0.5) / 10000.0 AS prev_value,
        | first_value(event_id) OVER wg AS first_event,
        | nth_value(event_id, 3) OVER wg AS third_event,
        | last_value(event_id) OVER wf AS last_event
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
        |       wg AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |       wf AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q_markov_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS cur,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY epoch_us(ts), event_id) AS nxt
        |  FROM events),
        |trans AS (SELECT cur, nxt, count(*) AS n FROM seq
        |          WHERE nxt IS NOT NULL GROUP BY cur, nxt),
        |outgoing AS (SELECT cur, sum(n) AS n_out FROM trans GROUP BY cur)
        |SELECT t.cur, t.nxt, t.n,
        | floor(CAST(t.n AS DOUBLE) / CAST(o.n_out AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS p
        |FROM trans t JOIN outgoing o ON t.cur = o.cur
        |ORDER BY t.cur, t.nxt""".stripMargin,

    "q_yoy_delta" ->
      """WITH yearly AS (
        |  SELECT c_mktsegment, CAST(year(o_orderdate) AS INT) AS yr,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |lagged AS (
        |  SELECT c_mktsegment, yr, rev_dec,
        |         lag(rev_dec) OVER (PARTITION BY c_mktsegment ORDER BY yr) AS prev_dec
        |  FROM yearly)
        |SELECT c_mktsegment, yr,
        | floor(CAST(rev_dec AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(CAST(rev_dec - prev_dec AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS delta,
        | floor(CAST(rev_dec - prev_dec AS DOUBLE) / CAST(prev_dec AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS pct_change
        |FROM lagged ORDER BY c_mktsegment, yr""".stripMargin,

    "q_wma" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |         CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS q,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events)
        |SELECT a.user_id, a.event_id, a.ts_us,
        | floor(CAST(sum(b.q * (5 - (a.rn - b.rn))) AS DOUBLE) / 10000.0
        |       / CAST(sum(5 - (a.rn - b.rn)) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS wma5
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |                 AND a.rn - b.rn >= 0 AND a.rn - b.rn < 5
        |GROUP BY a.user_id, a.event_id, a.ts_us
        |ORDER BY a.user_id, a.ts_us, a.event_id""".stripMargin,

    "q_ewma" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |         CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS q,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events)
        |SELECT a.user_id, a.event_id, a.ts_us,
        | floor(CAST(sum(b.q * (16 >> (a.rn - b.rn))) AS DOUBLE) / 10000.0
        |       / CAST(sum(16 >> (a.rn - b.rn)) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS ewma5
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |                 AND a.rn - b.rn >= 0 AND a.rn - b.rn < 5
        |GROUP BY a.user_id, a.event_id, a.ts_us
        |ORDER BY a.user_id, a.ts_us, a.event_id""".stripMargin,

    "q_nth_value_bool" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value, event_type
        |  FROM events),
        |w AS (
        |  SELECT *, nth_value(value, 3) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_value
        |  FROM e)
        |SELECT user_id, count(*) AS n_events,
        | floor(min(third_value) * 10000.0 + 0.5) / 10000.0 AS third_value,
        | CAST(min(CASE WHEN value > 0 THEN 1 ELSE 0 END) AS INT) AS all_positive,
        | CAST(max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS INT) AS any_error
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_sessionize_typed" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                          OR ts_us - lag(ts_us) OVER w > 1800000000
        |                     THEN 1 ELSE 0 END AS new_sess
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
        |                     ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |      FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        | min(ts_us) AS session_start_us, max(ts_us) AS session_end_us
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    "q_sliding_distinct" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |ds AS (SELECT DISTINCT d AS anchor FROM ud)
        |SELECT ds.anchor, count(DISTINCT ud.user_id) AS active_7d
        |FROM ds JOIN ud ON ud.d >= ds.anchor - 6 AND ud.d <= ds.anchor
        |GROUP BY ds.anchor ORDER BY ds.anchor""".stripMargin,

    "q_time_weighted_avg" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
        |  FROM events),
        |iv AS (
        |  SELECT user_id, vc,
        |         lead(ts_us) OVER (PARTITION BY user_id
        |                           ORDER BY ts_us, event_id) - ts_us AS dur
        |  FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        | CAST(sum(dur) AS BIGINT) AS total_us,
        | floor(CAST(sum(CAST(vc AS DECIMAL(18,0)) * CAST(dur AS DECIMAL(18,0))) AS DOUBLE)
        |       / CAST(sum(dur) AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS twa
        |FROM iv WHERE dur IS NOT NULL
        |GROUP BY user_id HAVING sum(dur) > 0
        |ORDER BY user_id""".stripMargin,

    "q_new_vs_returning" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |f AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id)
        |SELECT ud.day, count(*) AS active_users,
        | CAST(sum(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
        | count(*) - CAST(sum(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS returning_users
        |FROM ud JOIN f USING (user_id)
        |GROUP BY ud.day ORDER BY ud.day""".stripMargin,

    "q_churn" ->
      """WITH cm AS (
        |  SELECT DISTINCT o_custkey AS ck,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS m
        |  FROM orders),
        |nxt AS (SELECT ck, CAST(m - INTERVAL 1 MONTH AS DATE) AS m, 1 AS nx FROM cm),
        |j AS (
        |  SELECT cm.m, count(*) AS active,
        |         CAST(sum(CASE WHEN nxt.nx IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS churned
        |  FROM cm LEFT JOIN nxt ON cm.ck = nxt.ck AND cm.m = nxt.m
        |  GROUP BY cm.m),
        |mx AS (SELECT max(m) AS max_m FROM cm)
        |SELECT m, active, churned,
        | floor((CAST(churned AS DOUBLE) / CAST(active AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS churn_rate
        |FROM j CROSS JOIN mx WHERE m < max_m ORDER BY m""".stripMargin,

    "q_event_trigrams" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events),
        |tri AS (
        |  SELECT event_type AS e1,
        |         lead(event_type, 1) OVER w AS e2,
        |         lead(event_type, 2) OVER w AS e3
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |c AS (SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
        |      FROM tri WHERE e3 IS NOT NULL GROUP BY 1, 2, 3),
        |tot AS (SELECT sum(n) AS n_total FROM c)
        |SELECT e1, e2, e3, n,
        | floor((CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS share
        |FROM c CROSS JOIN tot ORDER BY e1, e2, e3""".stripMargin,

    "q_funnel_time" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s0 AS (SELECT user_id, min(ts_us) AS t_signup
        |       FROM e WHERE event_type = 'signup' GROUP BY user_id),
        |p0 AS (
        |  SELECT e.user_id, s0.t_signup, min(e.ts_us) AS t_purchase
        |  FROM e JOIN s0 ON e.user_id = s0.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us > s0.t_signup
        |  GROUP BY e.user_id, s0.t_signup),
        |lags AS (SELECT t_purchase - t_signup AS lag_us FROM p0),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |         floor(quantile_cont(lag_us, 0.25) / 60000000.0 * 10000.0 + 0.5) / 10000.0 AS p25_minutes,
        |         floor(quantile_cont(lag_us, 0.5) / 60000000.0 * 10000.0 + 0.5) / 10000.0 AS p50_minutes,
        |         floor(quantile_cont(lag_us, 0.75) / 60000000.0 * 10000.0 + 0.5) / 10000.0 AS p75_minutes,
        |         floor(quantile_cont(lag_us, 0.9) / 60000000.0 * 10000.0 + 0.5) / 10000.0 AS p90_minutes
        |  FROM lags),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_signup FROM s0)
        |SELECT n_signup, n_converted,
        | floor((CAST(n_converted AS DOUBLE) / CAST(n_signup AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS conv_rate,
        | p25_minutes, p50_minutes, p75_minutes, p90_minutes
        |FROM agg CROSS JOIN ns""".stripMargin,

    "q_disorder_rate" ->
      """WITH p AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderkey) AS prev_d
        |  FROM orders),
        |pairs AS (
        |  SELECT CASE WHEN d < prev_d
        |              THEN CAST(date_diff('day', d, prev_d) AS BIGINT) END AS late_days
        |  FROM p WHERE prev_d IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        | CAST(count(late_days) AS BIGINT) AS n_inversions,
        | floor((CAST(count(late_days) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS disorder_rate,
        | max(late_days) AS max_late_days,
        | floor(quantile_cont(late_days, 0.99) * 10000.0 + 0.5) / 10000.0 AS p99_late_days
        |FROM pairs""".stripMargin,

    "q_interpurchase" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |         CAST(date_diff('day',
        |           lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
        |             ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
        |           CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
        |  FROM orders),
        |gg AS (SELECT o_custkey, gap_days FROM g WHERE gap_days IS NOT NULL)
        |SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_gaps,
        | floor((CAST(sum(gap_days) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS mean_gap_days,
        | floor(quantile_cont(gap_days, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50_gap_days,
        | floor(quantile_cont(gap_days, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90_gap_days
        |FROM gg JOIN customer c ON gg.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,

    "q_concurrent_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                          OR ts_us - lag(ts_us) OVER w > 1800000000
        |                     THEN 1 ELSE 0 END AS new_sess
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |                 ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        |      FROM g),
        |sess AS (SELECT user_id, session_id, min(ts_us) AS st, max(ts_us) AS en
        |         FROM s GROUP BY 1, 2),
        |bounds AS (
        |  SELECT st AS bts, CAST(1 AS BIGINT) AS delta FROM sess
        |  UNION ALL
        |  SELECT en + 1, CAST(-1 AS BIGINT) FROM sess
        |  UNION ALL
        |  SELECT epoch_us(CAST(d AS TIMESTAMP)), CAST(0 AS BIGINT)
        |  FROM (SELECT unnest(generate_series(
        |                 CAST(make_timestamp(st) AS DATE) + 1,
        |                 CAST(make_timestamp(en) AS DATE),
        |                 INTERVAL 1 DAY)) AS d
        |        FROM sess
        |        WHERE CAST(make_timestamp(en) AS DATE)
        |              > CAST(make_timestamp(st) AS DATE))),
        |run AS (SELECT bts, delta,
        |               CAST(sum(delta) OVER (ORDER BY bts, delta DESC
        |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        |        FROM bounds)
        |SELECT CAST(make_timestamp(bts) AS DATE) AS day,
        |       CAST(max(run) AS BIGINT) AS peak_concurrency,
        |       CAST(sum(CASE WHEN delta <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_boundaries
        |FROM run GROUP BY 1 ORDER BY day""".stripMargin,

    "q_interval_coverage" ->
      """WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s,
        |                   epoch_us(ts) + 600000000 AS e
        |            FROM events),
        |marked AS (
        |  SELECT user_id, s, e,
        |         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |                OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |              THEN 1 ELSE 0 END AS new_island,
        |         event_id
        |  FROM iv),
        |isl AS (SELECT user_id, s, e,
        |               sum(new_island) OVER (PARTITION BY user_id
        |                 ORDER BY s, event_id ROWS UNBOUNDED PRECEDING) AS island
        |        FROM marked),
        |islands AS (SELECT user_id, island, CAST(count(*) AS BIGINT) AS n_ev,
        |                   min(s) AS i_s, max(e) AS i_e
        |            FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(n_ev) AS BIGINT) AS n_events,
        |       CAST(count(*) AS BIGINT) AS n_islands,
        |       CAST(sum(i_e - i_s) AS BIGINT) AS covered_us,
        |       CAST(max(n_ev) AS BIGINT) AS max_island_events
        |FROM islands GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_window_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s0 AS (SELECT user_id, min(ts_us) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |v0 AS (SELECT e.user_id, s0.t1, min(e.ts_us) AS t2
        |       FROM e JOIN s0 ON e.user_id = s0.user_id
        |       WHERE e.event_type = 'view' AND e.ts_us > s0.t1
        |         AND e.ts_us <= s0.t1 + 604800000000
        |       GROUP BY 1, 2),
        |p0 AS (SELECT e.user_id, min(e.ts_us) AS t3
        |       FROM e JOIN v0 ON e.user_id = v0.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts_us > v0.t2
        |         AND e.ts_us <= v0.t1 + 604800000000
        |       GROUP BY 1),
        |depth AS (SELECT s0.user_id,
        |    CAST(1 + (CASE WHEN v0.user_id IS NULL THEN 0 ELSE 1 END)
        |           + (CASE WHEN p0.user_id IS NULL THEN 0 ELSE 1 END)
        |         AS BIGINT) AS depth
        |  FROM s0
        |  LEFT JOIN v0 ON s0.user_id = v0.user_id
        |  LEFT JOIN p0 ON s0.user_id = p0.user_id),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_entered FROM depth)
        |SELECT depth, CAST(count(*) AS BIGINT) AS n_users, n_entered,
        | floor(CAST(count(*) AS DOUBLE) / CAST(n_entered AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS share
        |FROM depth CROSS JOIN tot GROUP BY depth, n_entered
        |ORDER BY depth""".stripMargin,

    "q_match_vshape" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |taps AS (SELECT d, cents,
        |    lag(cents, 1) OVER w AS prev,
        |    COALESCE(
        |      CASE WHEN lead(cents, 1) OVER w >= lag(cents, 1) OVER w
        |           THEN CAST(1 AS BIGINT) END,
        |      CASE WHEN lead(cents, 2) OVER w >= lag(cents, 1) OVER w
        |           THEN CAST(2 AS BIGINT) END,
        |      CASE WHEN lead(cents, 3) OVER w >= lag(cents, 1) OVER w
        |           THEN CAST(3 AS BIGINT) END) AS rec_day
        |  FROM daily WINDOW w AS (ORDER BY d ASC))
        |SELECT d AS dip_day,
        | floor(CAST(prev AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0
        |   AS pre_drop_revenue,
        | floor(CAST(cents AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0
        |   AS dip_revenue,
        | floor((1.0 - CAST(cents AS DOUBLE) / CAST(prev AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS drop_frac,
        | rec_day AS days_to_recovery
        |FROM taps
        |WHERE prev IS NOT NULL AND cents * 100 < prev * (100 - 30)
        |ORDER BY dip_day""".stripMargin,

    "q_ema_crossover" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |taps AS (SELECT d,
        |    row_number() OVER w AS rn,
        |    sum(cents) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS sf,
        |    count(*) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS nf,
        |    sum(cents) OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS ss,
        |    count(*) OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS ns
        |  FROM daily WINDOW w AS (ORDER BY d ASC)),
        |flagged AS (SELECT d, sf, nf, ss, ns,
        |    CASE WHEN sf * ns > ss * nf THEN 1 ELSE 0 END AS above
        |  FROM taps WHERE rn >= 20),
        |marked AS (SELECT *, lag(above, 1) OVER (ORDER BY d ASC) AS prev
        |           FROM flagged)
        |SELECT d AS cross_day,
        | CASE WHEN above = 1 THEN 'golden' ELSE 'death' END AS direction,
        | floor(CAST(sf AS DOUBLE) / (CAST(nf AS DOUBLE) * 100.0)
        |       * 10000.0 + 0.5) / 10000.0 AS fast_avg,
        | floor(CAST(ss AS DOUBLE) / (CAST(ns AS DOUBLE) * 100.0)
        |       * 10000.0 + 0.5) / 10000.0 AS slow_avg
        |FROM marked
        |WHERE prev IS NOT NULL AND above <> prev
        |ORDER BY cross_day""".stripMargin,

    "q_match_spike_decay" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |taps AS (SELECT d, cents,
        |    lag(cents, 1) OVER w AS prev,
        |    COALESCE(
        |      CASE WHEN lead(cents, 1) OVER w <= lag(cents, 1) OVER w
        |           THEN CAST(1 AS BIGINT) END,
        |      CASE WHEN lead(cents, 2) OVER w <= lag(cents, 1) OVER w
        |           THEN CAST(2 AS BIGINT) END,
        |      CASE WHEN lead(cents, 3) OVER w <= lag(cents, 1) OVER w
        |           THEN CAST(3 AS BIGINT) END) AS dec_day
        |  FROM daily WINDOW w AS (ORDER BY d ASC))
        |SELECT d AS spike_day,
        | floor(CAST(prev AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0
        |   AS pre_spike_revenue,
        | floor(CAST(cents AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0
        |   AS spike_revenue,
        | floor((CAST(cents AS DOUBLE) / CAST(prev AS DOUBLE) - 1.0)
        |       * 10000.0 + 0.5) / 10000.0 AS spike_frac,
        | dec_day AS days_to_decay
        |FROM taps
        |WHERE prev IS NOT NULL AND cents * 100 > prev * (100 + 40)
        |ORDER BY spike_day""".stripMargin,

    "q_rising_streaks" ->
      """WITH monthly AS (
        |  SELECT c_mktsegment AS seg,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |           AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |flagged AS (SELECT seg, m, cents,
        |    CASE WHEN cents > lag(cents, 1) OVER ws THEN 1
        |         WHEN lag(cents, 1) OVER ws IS NULL THEN NULL ELSE 0 END AS rise
        |  FROM monthly WINDOW ws AS (PARTITION BY seg ORDER BY m ASC)),
        |isl AS (SELECT seg, m, cents, rise,
        |    sum(CAST(1 - rise AS BIGINT)) OVER (PARTITION BY seg ORDER BY m ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM flagged WHERE rise IS NOT NULL),
        |streaks AS (SELECT seg, island, CAST(count(*) AS BIGINT) AS len,
        |    min(m) AS start_m, max(m) AS end_m,
        |    max(cents) - min(cents) AS climb_cents
        |  FROM isl WHERE rise = 1 GROUP BY 1, 2),
        |best AS (SELECT * FROM (SELECT *,
        |    row_number() OVER (PARTITION BY seg
        |      ORDER BY len DESC, start_m ASC) AS rn FROM streaks)
        |  WHERE rn = 1)
        |SELECT seg, len AS streak_months, start_m, end_m,
        | floor(CAST(climb_cents AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0
        |   AS climb
        |FROM best ORDER BY seg""".stripMargin,

    "q_peak_detection" ->
      """WITH weekly AS (
        |  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |           AS cents
        |  FROM orders GROUP BY 1),
        |st AS (SELECT wk, cents,
        |    sum(cents) OVER nb AS nb_sum,
        |    count(cents) OVER nb AS nb_cnt,
        |    greatest(lag(cents, 3) OVER w, lag(cents, 2) OVER w,
        |             lag(cents, 1) OVER w, lead(cents, 1) OVER w,
        |             lead(cents, 2) OVER w, lead(cents, 3) OVER w) AS max_other
        |  FROM weekly
        |  WINDOW w AS (ORDER BY wk ASC),
        |         nb AS (ORDER BY wk ASC ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
        |SELECT wk AS peak_week,
        | floor(CAST(cents AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0
        |   AS revenue,
        | floor((CAST(cents AS DOUBLE) * CAST(nb_cnt - 1 AS DOUBLE)
        |        / CAST(nb_sum - cents AS DOUBLE) - 1.0) * 10000.0 + 0.5)
        |   / 10000.0 AS prominence
        |FROM st
        |WHERE nb_cnt = 7 AND cents > max_other
        |  AND cents * (nb_cnt - 1) * 100 > (nb_sum - cents) * (100 + 20)
        |ORDER BY peak_week""".stripMargin
  )
}
