package graft.oracles

/** DuckDB oracle SQL for the statistical insights tier (part 1) — split out of SparkEntry
  * verbatim (round-11 registry hygiene). SparkEntry.oracleSql concatenates
  * the per-domain maps; keys stay globally unique and strings unchanged, so
  * the driver's hash gate sees an identical contract.
  */
object InsightsSql {
  val sql: Map[String, String] = Map(
    "q_curriculum" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS DOUBLE) AS n,
        |    CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
        |    CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) AS spaces,
        |    CAST(len(regexp_extract_all(text, '\bthe\b|\ba\b|\bof\b')) AS DOUBLE) AS stops
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    floor((0.5 * (alpha / n) + 0.3 * least(1.0, ((n - spaces) / (spaces + 1.0)) / 8.0)
        |           + 0.2 * least(1.0, stops / 10.0)) * 10000.0 + 0.5) / 10000.0 AS quality_score
        |  FROM f)
        |SELECT doc_id, quality_score,
        |       NTILE(4) OVER (ORDER BY quality_score, doc_id) AS phase
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_decile_lift" ->
      """WITH spend AS (
        |  SELECT o_custkey AS ck, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders GROUP BY 1),
        |r AS (SELECT ck, m, NTILE(10) OVER (ORDER BY m DESC, ck) AS decile FROM spend),
        |pd AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
        |              sum(m) AS rev_dec FROM r GROUP BY 1),
        |tt AS (SELECT sum(rev_dec) AS total_dec FROM pd),
        |cc AS (SELECT pd.decile, pd.n_customers, pd.rev_dec, tt.total_dec,
        |              sum(pd.rev_dec) OVER (ORDER BY pd.decile
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_dec
        |       FROM pd CROSS JOIN tt)
        |SELECT decile, n_customers,
        | floor(CAST(rev_dec AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(CAST(rev_dec AS DOUBLE) / CAST(total_dec AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS pct_of_total,
        | floor(CAST(cum_dec AS DOUBLE) / CAST(total_dec AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS cum_pct
        |FROM cc ORDER BY decile""".stripMargin,

    "q_abc_class" ->
      """WITH rev AS (
        |  SELECT l_partkey AS pk, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT pk, rev,
        |         sum(rev) OVER (ORDER BY rev DESC, pk
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(rev) OVER () AS total
        |  FROM rev)
        |SELECT pk AS p_partkey,
        | floor(CAST(rev AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS cum_share,
        | CASE WHEN cum * 100 <= total * 80 THEN 'A'
        |      WHEN cum * 100 <= total * 95 THEN 'B'
        |      ELSE 'C' END AS abc_class
        |FROM c ORDER BY pk""".stripMargin,

    "q_first_touch" ->
      """WITH s AS (
        |  SELECT user_id, event_type, value,
        |         first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |                     IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT coalesce(touch, '(direct)') AS channel, count(*) AS conversions,
        | floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS revenue
        |FROM s WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_triangles" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS ok, p_brand AS br
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |e AS (
        |  SELECT x.br AS a, y.br AS b FROM b x JOIN b y ON x.ok = y.ok AND x.br < y.br
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT e1.a AS brand_a, e1.b AS brand_b, e2.b AS brand_c
        |FROM e e1
        |JOIN e e2 ON e1.b = e2.a
        |JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |ORDER BY brand_a, brand_b, brand_c""".stripMargin,

    "q_growth_accounting" ->
      """WITH um AS (SELECT DISTINCT o_custkey AS c,
        |                   CAST(date_trunc('month', o_orderdate) AS DATE) AS m
        |            FROM orders),
        |f AS (SELECT c, m, lag(m) OVER w AS prev_m, lead(m) OVER w AS next_m
        |      FROM um WINDOW w AS (PARTITION BY c ORDER BY m)),
        |cls AS (SELECT m, CAST(count(*) AS BIGINT) AS n_active,
        |         CAST(sum(CASE WHEN prev_m IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_new,
        |         CAST(sum(CASE WHEN prev_m = m - INTERVAL 1 MONTH
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |         CAST(sum(CASE WHEN prev_m IS NOT NULL
        |                        AND prev_m < m - INTERVAL 1 MONTH
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |        FROM f GROUP BY m),
        |ch AS (SELECT CAST(m + INTERVAL 1 MONTH AS DATE) AS m,
        |              CAST(count(*) AS BIGINT) AS n_churned
        |       FROM f WHERE next_m IS NULL OR next_m > m + INTERVAL 1 MONTH
        |       GROUP BY 1)
        |SELECT cls.m AS month, n_active, n_new, n_retained, n_resurrected,
        |       COALESCE(n_churned, 0) AS n_churned
        |FROM cls LEFT JOIN ch ON ch.m = cls.m ORDER BY month""".stripMargin,

    "q_cochran_q" ->
      """WITH flags AS (SELECT o_custkey,
        |  max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS x1,
        |  max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS x2,
        |  max(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS x3
        | FROM orders GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
        |  CAST(sum(x1) AS BIGINT) AS t1, CAST(sum(x2) AS BIGINT) AS t2,
        |  CAST(sum(x3) AS BIGINT) AS t3,
        |  CAST(sum(x1 + x2 + x3) AS BIGINT) AS sr,
        |  CAST(sum((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT) AS sr2
        | FROM flags)
        |SELECT n_blocks, t1, t2, t3,
        | floor(cast(2 * (3 * (t1 * t1 + t2 * t2 + t3 * t3)
        |            - (t1 + t2 + t3) * (t1 + t2 + t3)) as double)
        |       / cast(3 * sr - sr2 as double) * 10000.0 + 0.5) / 10000.0 AS q_stat
        |FROM m""".stripMargin,

    "q_partial_corr" ->
      """WITH per AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS x,
        |    CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y,
        |    CAST(sum(CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS z
        |  FROM lineitem GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
        |  CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |  CAST(sum(CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sz,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
        |            AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))
        |            AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxz,
        |  CAST(sum(CAST(CAST(y AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))
        |            AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syz,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))
        |            AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
        |  CAST(sum(CAST(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
        |            AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy,
        |  CAST(sum(CAST(CAST(z AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))
        |            AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS szz
        | FROM per),
        |r AS (SELECT n,
        |  (cast(n as double) * cast(sxy as double)
        |   - cast(sx as double) * cast(sy as double))
        |  / sqrt((cast(n as double) * cast(sxx as double)
        |          - cast(sx as double) * cast(sx as double))
        |         * (cast(n as double) * cast(syy as double)
        |            - cast(sy as double) * cast(sy as double))) AS rxy,
        |  (cast(n as double) * cast(sxz as double)
        |   - cast(sx as double) * cast(sz as double))
        |  / sqrt((cast(n as double) * cast(sxx as double)
        |          - cast(sx as double) * cast(sx as double))
        |         * (cast(n as double) * cast(szz as double)
        |            - cast(sz as double) * cast(sz as double))) AS rxz,
        |  (cast(n as double) * cast(syz as double)
        |   - cast(sy as double) * cast(sz as double))
        |  / sqrt((cast(n as double) * cast(syy as double)
        |          - cast(sy as double) * cast(sy as double))
        |         * (cast(n as double) * cast(szz as double)
        |            - cast(sz as double) * cast(sz as double))) AS ryz
        | FROM m)
        |SELECT n AS n_orders,
        | floor(rxy * 10000.0 + 0.5) / 10000.0 AS r_xy,
        | floor(rxz * 10000.0 + 0.5) / 10000.0 AS r_xz,
        | floor(ryz * 10000.0 + 0.5) / 10000.0 AS r_yz,
        | floor((rxy - rxz * ryz) / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
        |       * 10000.0 + 0.5) / 10000.0 AS r_xy_given_z
        |FROM r""".stripMargin,

    "q_did" ->
      """WITH g AS (
        |  SELECT (c_mktsegment = 'BUILDING') AS treated,
        |         (CAST(o_orderdate AS DATE) >= DATE '1998-01-01') AS post,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS tp
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |a AS (SELECT treated, post, CAST(count(*) AS BIGINT) AS n, sum(tp) AS s
        |      FROM g GROUP BY 1, 2),
        |w AS (SELECT
        |  max(CASE WHEN treated AND post
        |           THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS tp1,
        |  max(CASE WHEN treated AND NOT post
        |           THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS tp0,
        |  max(CASE WHEN NOT treated AND post
        |           THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS cp1,
        |  max(CASE WHEN NOT treated AND NOT post
        |           THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS cp0
        | FROM a)
        |SELECT floor(tp0 * 10000.0 + 0.5) / 10000.0 AS treated_pre,
        |       floor(tp1 * 10000.0 + 0.5) / 10000.0 AS treated_post,
        |       floor(cp0 * 10000.0 + 0.5) / 10000.0 AS control_pre,
        |       floor(cp1 * 10000.0 + 0.5) / 10000.0 AS control_post,
        |       floor(((tp1 - tp0) - (cp1 - cp0)) * 10000.0 + 0.5) / 10000.0 AS did
        |FROM w""".stripMargin,

    "q_srm" ->
      """WITH sp AS (SELECT doc_id,
        |        CASE WHEN doc_id % 10 < 8 THEN 'train'
        |             WHEN doc_id % 10 = 8 THEN 'val' ELSE 'test' END AS split
        |      FROM documents),
        |obs AS (SELECT split, CAST(count(*) AS BIGINT) AS observed
        |        FROM sp GROUP BY 1),
        |alloc(split, permille) AS (VALUES ('train', 800), ('val', 100), ('test', 100)),
        |tot AS (SELECT CAST(sum(observed) AS BIGINT) AS total FROM obs)
        |SELECT split, observed,
        | floor(cast(total * permille as double) / 1000.0 * 10000.0 + 0.5) / 10000.0
        |   AS expected,
        | floor((cast(observed as double) - cast(total * permille as double) / 1000.0)
        |       * (cast(observed as double) - cast(total * permille as double) / 1000.0)
        |       / (cast(total * permille as double) / 1000.0)
        |       * 10000.0 + 0.5) / 10000.0 AS chi2_contrib
        |FROM obs CROSS JOIN tot JOIN alloc USING (split)
        |ORDER BY split""".stripMargin,

    "q_logrank" ->
      """WITH pc AS (SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS f,
        |                   max(CAST(o_orderdate AS DATE)) AS l
        |            FROM orders GROUP BY 1),
        |seg AS (SELECT c_custkey,
        |               CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g1
        |        FROM customer),
        |hz AS (SELECT max(CAST(o_orderdate AS DATE)) AS hz FROM orders),
        |dur AS (SELECT CAST(date_diff('day', f, l) AS BIGINT) AS t, g1,
        |               CASE WHEN date_diff('day', l, hz) > 90 THEN 1 ELSE 0 END AS ev
        |        FROM pc JOIN seg ON o_custkey = c_custkey CROSS JOIN hz),
        |grain AS (SELECT t, CAST(sum(ev * g1) AS BIGINT) AS d1,
        |                 CAST(sum(ev * (1 - g1)) AS BIGINT) AS d2,
        |                 CAST(sum(g1) AS BIGINT) AS c1,
        |                 CAST(sum(1 - g1) AS BIGINT) AS c2
        |          FROM dur GROUP BY t),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS nt1,
        |               CAST(sum(c2) AS BIGINT) AS nt2 FROM grain),
        |curve AS (SELECT t, d1, d2, nt1, nt2,
        |  nt1 - COALESCE(sum(c1) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
        |  nt2 - COALESCE(sum(c2) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n2
        |  FROM grain CROSS JOIN tot),
        |ev AS (SELECT nt1, nt2, d1, d2, n1, n2, d1 + d2 AS d, n1 + n2 AS n
        |       FROM curve WHERE d1 + d2 > 0),
        |terms AS (SELECT nt1, nt2, d1, d2,
        |  CAST(CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)
        |       AS DECIMAL(28,8)) AS e1,
        |  CASE WHEN n > 1 THEN
        |    CAST(CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |         * CAST(n - d AS DOUBLE)
        |         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))
        |         AS DECIMAL(28,8))
        |  ELSE CAST(0 AS DECIMAL(28,8)) END AS v
        |  FROM ev)
        |SELECT max(nt1) AS n_group1, max(nt2) AS n_group2,
        | CAST(sum(d1) AS BIGINT) AS observed1,
        | floor(CAST(sum(e1) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS expected1,
        | CAST(sum(d2) AS BIGINT) AS observed2,
        | floor((CAST(sum(d1) AS DOUBLE) - CAST(sum(e1) AS DOUBLE))
        |       * (CAST(sum(d1) AS DOUBLE) - CAST(sum(e1) AS DOUBLE))
        |       / CAST(sum(v) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS chi2
        |FROM terms""".stripMargin,

    "q_nelson_aalen" ->
      """WITH pc AS (SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS f,
        |                   max(CAST(o_orderdate AS DATE)) AS l
        |            FROM orders GROUP BY 1),
        |hz AS (SELECT max(CAST(o_orderdate AS DATE)) AS hz FROM orders),
        |dur AS (SELECT CAST(date_diff('day', f, l) AS BIGINT) AS t,
        |               CASE WHEN date_diff('day', l, hz) > 90 THEN 1 ELSE 0 END AS ev
        |        FROM pc CROSS JOIN hz),
        |grain AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d,
        |                 CAST(count(*) AS BIGINT) AS c
        |          FROM dur GROUP BY t),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM grain),
        |curve AS (SELECT t, d, c,
        |  n_total - COALESCE(sum(c) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        |  FROM grain CROSS JOIN tot),
        |acc AS (SELECT t, d, n_risk,
        |  sum(CAST(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS DECIMAL(28,8)))
        |    OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS h
        |  FROM curve)
        |SELECT t AS duration_days, CAST(n_risk AS BIGINT) AS n_risk, d AS deaths,
        | floor(CAST(h AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS cum_hazard,
        | floor(exp(-CAST(h AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS fh_survival
        |FROM acc WHERE d > 0 ORDER BY duration_days""".stripMargin,

    "q_durbin_watson" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |              AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |base AS (SELECT min(d) AS d0 FROM daily),
        |pts AS (SELECT CAST(date_diff('day', d0, d) AS BIGINT) AS x, y
        |        FROM daily CROSS JOIN base),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
        |  CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx
        | FROM pts),
        |fit AS (SELECT n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
        |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
        |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx FROM m),
        |resid AS (SELECT x, n,
        |  CAST(y AS DOUBLE) - (my + b * (CAST(x AS DOUBLE) - mx)) AS e
        |  FROM pts CROSS JOIN fit),
        |led AS (SELECT n, e, lag(e, 1) OVER (ORDER BY x ASC) AS ep FROM resid)
        |SELECT max(n) AS n_days,
        | floor(CAST(sum(CASE WHEN ep IS NOT NULL
        |                     THEN CAST((e - ep) * (e - ep) AS DECIMAL(38,8))
        |                     ELSE CAST(0 AS DECIMAL(38,8)) END) AS DOUBLE)
        |       / CAST(sum(CAST(e * e AS DECIMAL(38,8))) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS dw
        |FROM led""".stripMargin,

    "q_ljung_box" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |                      CAST(count(*) AS BIGINT) AS y
        |               FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(y) AS BIGINT) AS s FROM daily),
        |z AS (SELECT d, n, n * y - s AS z FROM daily CROSS JOIN tot),
        |led AS (SELECT n, z,
        |  lag(z, 1) OVER w AS z1, lag(z, 2) OVER w AS z2,
        |  lag(z, 3) OVER w AS z3, lag(z, 4) OVER w AS z4,
        |  lag(z, 5) OVER w AS z5
        | FROM z WINDOW w AS (ORDER BY d ASC)),
        |m AS (SELECT max(n) AS n,
        |  CAST(sum(CAST(CAST(z AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS c0,
        |  CAST(sum(CASE WHEN z1 IS NOT NULL
        |    THEN CAST(CAST(z AS DECIMAL(19,0)) * CAST(z1 AS DECIMAL(19,0)) AS DECIMAL(38,0))
        |    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS c1,
        |  CAST(sum(CASE WHEN z2 IS NOT NULL
        |    THEN CAST(CAST(z AS DECIMAL(19,0)) * CAST(z2 AS DECIMAL(19,0)) AS DECIMAL(38,0))
        |    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS c2,
        |  CAST(sum(CASE WHEN z3 IS NOT NULL
        |    THEN CAST(CAST(z AS DECIMAL(19,0)) * CAST(z3 AS DECIMAL(19,0)) AS DECIMAL(38,0))
        |    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS c3,
        |  CAST(sum(CASE WHEN z4 IS NOT NULL
        |    THEN CAST(CAST(z AS DECIMAL(19,0)) * CAST(z4 AS DECIMAL(19,0)) AS DECIMAL(38,0))
        |    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS c4,
        |  CAST(sum(CASE WHEN z5 IS NOT NULL
        |    THEN CAST(CAST(z AS DECIMAL(19,0)) * CAST(z5 AS DECIMAL(19,0)) AS DECIMAL(38,0))
        |    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS c5
        | FROM led),
        |lags AS (
        |  SELECT n, 1 AS lg, CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE) AS rk FROM m
        |  UNION ALL SELECT n, 2, CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE) FROM m
        |  UNION ALL SELECT n, 3, CAST(c3 AS DOUBLE) / CAST(c0 AS DOUBLE) FROM m
        |  UNION ALL SELECT n, 4, CAST(c4 AS DOUBLE) / CAST(c0 AS DOUBLE) FROM m
        |  UNION ALL SELECT n, 5, CAST(c5 AS DOUBLE) / CAST(c0 AS DOUBLE) FROM m),
        |acc AS (SELECT n, lg, rk,
        |  sum(CAST(rk * rk / CAST(n - lg AS DOUBLE) AS DECIMAL(38,18)))
        |    OVER (ORDER BY lg ROWS UNBOUNDED PRECEDING) AS qsum
        | FROM lags)
        |SELECT CAST(lg AS BIGINT) AS lag_k,
        | floor(rk * 10000.0 + 0.5) / 10000.0 AS acf,
        | floor(CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE) * CAST(qsum AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS q_stat
        |FROM acc ORDER BY lag_k""".stripMargin,

    "q_ols_multi" ->
      """WITH li AS (SELECT
        |  CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y,
        |  CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS x,
        |  CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT) AS z
        | FROM lineitem),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
        |  CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |  CAST(sum(CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sz,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxz,
        |  CAST(sum(CAST(CAST(y AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS szy,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
        |  CAST(sum(CAST(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy,
        |  CAST(sum(CAST(CAST(z AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS szz
        | FROM li),
        |cent AS (SELECT n,
        |  CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS cxx,
        |  CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) AS czz,
        |  CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE) AS cxz,
        |  CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cxy,
        |  CAST(n AS DOUBLE) * CAST(szy AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sy AS DOUBLE) AS czy,
        |  CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS cyy,
        |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
        |  CAST(sz AS DOUBLE) / CAST(n AS DOUBLE) AS mz,
        |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my
        | FROM m),
        |fit AS (SELECT n, mx, mz, my, cxy, czy, cyy,
        |  (czz * cxy - cxz * czy) / (cxx * czz - cxz * cxz) AS b1,
        |  (cxx * czy - cxz * cxy) / (cxx * czz - cxz * cxz) AS b2
        | FROM cent)
        |SELECT n AS n_lines,
        | floor((my - b1 * mx - b2 * mz) * 10000.0 + 0.5) / 10000.0 AS intercept,
        | floor(b1 * 10000.0 + 0.5) / 10000.0 AS b_quantity,
        | floor(b2 * 10000.0 + 0.5) / 10000.0 AS b_discount,
        | floor((b1 * cxy + b2 * czy) / cyy * 10000.0 + 0.5) / 10000.0 AS r2
        |FROM fit""".stripMargin,

    "q_bh_fdr" ->
      """WITH li AS (SELECT p_brand,
        |  CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS x
        | FROM lineitem JOIN part ON l_partkey = p_partkey),
        |g AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS ng,
        |             CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sg
        |      FROM li GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
        | FROM li),
        |zs AS (SELECT p_brand, ng,
        |  (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) - mu)
        |    * sqrt(CAST(ng AS DOUBLE)) / sigma AS z
        | FROM (SELECT p_brand, ng, sg,
        |         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |         sqrt((CAST(s2 AS DOUBLE)
        |               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |              / CAST(n AS DOUBLE)) AS sigma
        |       FROM g CROSS JOIN tot)),
        |pv AS (SELECT p_brand, ng, z,
        |  (((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
        |     - 0.284496736) * tt + 0.254829592) * tt) * exp(-az * az) AS p
        | FROM (SELECT p_brand, ng, z, az, 1.0 / (1.0 + 0.3275911 * az) AS tt
        |       FROM (SELECT p_brand, ng, z, abs(z) / sqrt(2.0) AS az FROM zs))),
        |mc AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pv),
        |rk AS (SELECT pv.*, m,
        |         row_number() OVER (ORDER BY p ASC, p_brand ASC) AS i
        |       FROM pv CROSS JOIN mc),
        |qv AS (SELECT *,
        |  min(CAST(m AS DOUBLE) * p / CAST(i AS DOUBLE))
        |    OVER (ORDER BY p DESC, p_brand DESC ROWS UNBOUNDED PRECEDING) AS q,
        |  CASE WHEN p <= CAST(i AS DOUBLE) * 0.05 / CAST(m AS DOUBLE)
        |       THEN 1 ELSE 0 END AS pass
        | FROM rk),
        |fin AS (SELECT *, max(pass) OVER (ORDER BY i ASC
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS disc
        |        FROM qv)
        |SELECT p_brand, ng AS n_lines,
        | floor(z * 10000.0 + 0.5) / 10000.0 AS z,
        | floor(p * 10000.0 + 0.5) / 10000.0 AS p_value,
        | floor(q * 10000.0 + 0.5) / 10000.0 AS q_value,
        | disc = 1 AS discovery
        |FROM fin ORDER BY p_brand""".stripMargin,

    "q_moods_median" ->
      """WITH v AS (SELECT (o_orderpriority = '1-URGENT') AS g1,
        |                  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v
        |           FROM orders),
        |grain AS (SELECT v.v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM grain),
        |ps AS (SELECT v, c,
        |         COALESCE(sum(c) OVER (ORDER BY v ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
        |       FROM grain),
        |med AS (SELECT min(v) AS med FROM ps CROSS JOIN tot
        |        WHERE cum0 + c >= (n + 1) // 2),
        |cells AS (SELECT g1,
        |  CAST(sum(CASE WHEN v.v > med THEN 1 ELSE 0 END) AS BIGINT) AS above,
        |  CAST(sum(CASE WHEN v.v <= med THEN 1 ELSE 0 END) AS BIGINT) AS at_below
        | FROM v CROSS JOIN med GROUP BY 1),
        |w AS (SELECT
        |  max(CASE WHEN g1 THEN above END) AS a,
        |  max(CASE WHEN g1 THEN at_below END) AS b,
        |  max(CASE WHEN NOT g1 THEN above END) AS c,
        |  max(CASE WHEN NOT g1 THEN at_below END) AS d
        | FROM cells)
        |SELECT
        | floor(CAST(med AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0
        |   AS median_value,
        | a AS g1_above, b AS g1_at_below, c AS g2_above, d AS g2_at_below,
        | floor(CAST(a + b + c + d AS DOUBLE)
        |       * CAST(a * d - b * c AS DOUBLE)
        |       * CAST(a * d - b * c AS DOUBLE)
        |       / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
        |          * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS chi2
        |FROM w CROSS JOIN med""".stripMargin,

    "q_bartlett" ->
      """WITH g AS (SELECT l_returnflag AS grp,
        |  CAST(count(*) AS BIGINT) AS ng,
        |  CAST(sum(CAST(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sg,
        |  CAST(sum(CAST(CAST(floor(l_quantity * 100.0 + 0.5) AS DECIMAL(19,0))
        |                * CAST(floor(l_quantity * 100.0 + 0.5) AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2g
        | FROM lineitem GROUP BY 1),
        |si AS (SELECT grp, ng,
        |  (CAST(ng AS DOUBLE) * CAST(s2g AS DOUBLE)
        |   - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
        |  / (CAST(ng AS DOUBLE) * CAST(ng - 1 AS DOUBLE)) AS si2
        | FROM g),
        |m AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
        |             CAST(count(*) AS BIGINT) AS k,
        |  sum(CAST(CAST(ng - 1 AS DOUBLE) * si2 AS DECIMAL(28,8))) AS sv,
        |  sum(CAST(CAST(ng - 1 AS DOUBLE) * ln(si2) AS DECIMAL(28,8))) AS slog,
        |  sum(CAST(1.0 / CAST(ng - 1 AS DOUBLE) AS DECIMAL(38,18))) AS srec
        | FROM si)
        |SELECT n AS n_total, k AS n_groups,
        | floor(CAST(sv AS DOUBLE) / CAST(n - k AS DOUBLE) * 10000.0 + 0.5)
        |   / 10000.0 AS pooled_var,
        | floor(((CAST(n - k AS DOUBLE)
        |         * ln(CAST(sv AS DOUBLE) / CAST(n - k AS DOUBLE))
        |         - CAST(slog AS DOUBLE)))
        |       / (1.0 + (CAST(srec AS DOUBLE) - 1.0 / CAST(n - k AS DOUBLE))
        |                / (3.0 * CAST(k - 1 AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS chi2
        |FROM m""".stripMargin,

    "q_kpss" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |                      CAST(count(*) AS BIGINT) AS y
        |               FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(y) AS BIGINT) AS s FROM daily),
        |z AS (SELECT d, n, n * y - s AS z FROM daily CROSS JOIN tot),
        |st AS (SELECT n, z,
        |         sum(z) OVER (ORDER BY d ASC ROWS UNBOUNDED PRECEDING) AS st
        |       FROM z)
        |SELECT max(n) AS n_days,
        | floor(CAST(sum(CAST(CAST(st AS DECIMAL(19,0)) * CAST(st AS DECIMAL(19,0))
        |                     AS DECIMAL(38,0))) AS DOUBLE)
        |       / (CAST(max(n) AS DOUBLE)
        |          * CAST(sum(CAST(CAST(z AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))
        |                          AS DECIMAL(38,0))) AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS kpss_stat
        |FROM st""".stripMargin,

    "q_granger" ->
      """WITH rev AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y
        | FROM orders GROUP BY 1),
        |qty AS (SELECT CAST(l_shipdate AS DATE) AS d,
        |  CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS x
        | FROM lineitem GROUP BY 1),
        |lg AS (SELECT d, y,
        |         lag(y, 1) OVER w AS yl, lag(x, 1) OVER w AS xl
        |       FROM rev JOIN qty USING (d) WINDOW w AS (ORDER BY d ASC)),
        |lagged AS (SELECT * FROM lg WHERE yl IS NOT NULL AND xl IS NOT NULL),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(yl AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
        |  CAST(sum(CAST(xl AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2,
        |  CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |  CAST(sum(CAST(CAST(yl AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1y,
        |  CAST(sum(CAST(CAST(xl AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2y,
        |  CAST(sum(CAST(CAST(yl AS DECIMAL(19,0)) * CAST(xl AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s12,
        |  CAST(sum(CAST(CAST(yl AS DECIMAL(19,0)) * CAST(yl AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s11,
        |  CAST(sum(CAST(CAST(xl AS DECIMAL(19,0)) * CAST(xl AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s22,
        |  CAST(sum(CAST(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy
        | FROM lagged),
        |cent AS (SELECT n,
        |  CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS c11,
        |  CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS c22,
        |  CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS c12,
        |  CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS c1y,
        |  CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS c2y,
        |  CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS cyy
        | FROM m),
        |fit AS (SELECT n, c1y, c2y, cyy, c11,
        |  (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS b1,
        |  (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS b2
        | FROM cent),
        |rss AS (SELECT n, b1, b2,
        |  cyy - b1 * c1y - b2 * c2y AS rss_u,
        |  cyy - c1y * c1y / c11 AS rss_r
        | FROM fit)
        |SELECT n AS n_days,
        | floor(b1 * 10000.0 + 0.5) / 10000.0 AS b_rev_lag,
        | floor(b2 * 10000.0 + 0.5) / 10000.0 AS b_qty_lag,
        | floor((rss_r - rss_u) / (rss_u / CAST(n - 3 AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS f_stat
        |FROM rss""".stripMargin,

    "q_modularity" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |               FROM lineitem),
        |e AS (
        |  SELECT x.pk AS a, y.pk AS b FROM items x JOIN items y
        |  ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |adj AS (SELECT a AS v, b AS u FROM e UNION ALL SELECT b AS v, a AS u FROM e),
        |l0 AS (SELECT DISTINCT v, v AS lab FROM adj),
        |n1 AS (SELECT adj.v, l0.lab, count(*) AS cnt FROM adj JOIN l0 ON l0.v = adj.u GROUP BY 1, 2),
        |l1 AS (SELECT v, min(lab) AS lab FROM (
        |         SELECT v, lab, cnt, max(cnt) OVER (PARTITION BY v) AS mc FROM n1)
        |       WHERE cnt = mc GROUP BY v),
        |n2 AS (SELECT adj.v, l1.lab, count(*) AS cnt FROM adj JOIN l1 ON l1.v = adj.u GROUP BY 1, 2),
        |l2 AS (SELECT v, min(lab) AS lab FROM (
        |         SELECT v, lab, cnt, max(cnt) OVER (PARTITION BY v) AS mc FROM n2)
        |       WHERE cnt = mc GROUP BY v),
        |n3 AS (SELECT adj.v, l2.lab, count(*) AS cnt FROM adj JOIN l2 ON l2.v = adj.u GROUP BY 1, 2),
        |l3 AS (SELECT v, min(lab) AS lab FROM (
        |         SELECT v, lab, cnt, max(cnt) OVER (PARTITION BY v) AS mc FROM n3)
        |       WHERE cnt = mc GROUP BY v),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg FROM adj GROUP BY 1),
        |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
        |intra AS (SELECT la.lab AS community, CAST(count(*) AS BIGINT) AS e_c
        |          FROM e JOIN l3 la ON la.v = e.a JOIN l3 lb ON lb.v = e.b
        |          WHERE la.lab = lb.lab GROUP BY 1),
        |degc AS (SELECT l3.lab AS community, CAST(count(*) AS BIGINT) AS n_nodes,
        |                CAST(sum(dg) AS BIGINT) AS d_c
        |         FROM l3 JOIN deg ON deg.v = l3.v GROUP BY 1)
        |SELECT community, n_nodes,
        | CAST(COALESCE(e_c, 0) AS BIGINT) AS intra_edges, d_c,
        | floor((CAST(COALESCE(e_c, 0) AS DOUBLE) / CAST(m AS DOUBLE)
        |        - (CAST(d_c AS DOUBLE) / CAST(m * 2 AS DOUBLE))
        |          * (CAST(d_c AS DOUBLE) / CAST(m * 2 AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS q_contrib
        |FROM degc LEFT JOIN intra USING (community) CROSS JOIN mm
        |ORDER BY community""".stripMargin,

    "q_rich_club" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |               FROM lineitem),
        |e AS (SELECT a.pk AS src, b.pk AS dst
        |      FROM items a JOIN items b ON a.ok = b.ok AND a.pk <> b.pk
        |      GROUP BY 1, 2),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS dg FROM e GROUP BY 1),
        |grain AS (SELECT dg, CAST(count(*) AS BIGINT) AS c FROM deg GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
        |cum AS (SELECT dg, sum(c) OVER (ORDER BY dg ASC
        |          ROWS UNBOUNDED PRECEDING) AS cc FROM grain),
        |pg(pct) AS (VALUES (50), (75), (90), (95)),
        |ks AS (SELECT pct, CAST(min(dg) AS BIGINT) AS k
        |       FROM cum CROSS JOIN tot CROSS JOIN pg
        |       WHERE cc * 100 >= pct * n GROUP BY pct),
        |und AS (SELECT e.src, e.dst, ds.dg AS ds, dd.dg AS dd
        |        FROM e JOIN deg ds ON ds.src = e.src
        |               JOIN deg dd ON dd.src = e.dst
        |        WHERE e.src < e.dst),
        |nk AS (SELECT pct, k,
        |         CAST(sum(CASE WHEN dg > k THEN 1 ELSE 0 END) AS BIGINT) AS n_k
        |       FROM deg CROSS JOIN ks GROUP BY 1, 2),
        |ek AS (SELECT pct, k,
        |         CAST(sum(CASE WHEN least(ds, dd) > k THEN 1 ELSE 0 END) AS BIGINT) AS e_k
        |       FROM und CROSS JOIN ks GROUP BY 1, 2)
        |SELECT CAST(pct AS BIGINT) AS pct, k, n_k, e_k,
        | CASE WHEN n_k >= 2
        |      THEN floor(CAST(e_k * 2 AS DOUBLE) / CAST(n_k * (n_k - 1) AS DOUBLE)
        |                 * 10000.0 + 0.5) / 10000.0 END AS phi
        |FROM nk JOIN ek USING (pct, k) ORDER BY pct""".stripMargin,

    "q_forecast_acc" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |                      CAST(count(*) AS BIGINT) AS y
        |               FROM orders GROUP BY 1),
        |lg AS (SELECT y, lag(y, 7) OVER w AS f7, lag(y, 1) OVER w AS f1
        |       FROM daily WINDOW w AS (ORDER BY d ASC))
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        | CAST(sum(CASE WHEN f7 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_forecast,
        | floor(CAST(sum(CASE WHEN f7 IS NOT NULL THEN abs(y - f7) ELSE 0 END) AS DOUBLE)
        |       / CAST(sum(CASE WHEN f7 IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS mae,
        | floor(CAST(sum(CASE WHEN f7 IS NOT NULL
        |   THEN CAST(CAST(abs(y - f7) AS DOUBLE) / CAST(y AS DOUBLE) AS DECIMAL(38,18))
        |   ELSE CAST(0 AS DECIMAL(38,18)) END) AS DOUBLE)
        |       / CAST(sum(CASE WHEN f7 IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS mape,
        | floor(CAST(sum(CASE WHEN f7 IS NOT NULL
        |   THEN CAST(CAST(abs(y - f7) * 2 AS DOUBLE) / CAST(y + f7 AS DOUBLE) AS DECIMAL(38,18))
        |   ELSE CAST(0 AS DECIMAL(38,18)) END) AS DOUBLE)
        |       / CAST(sum(CASE WHEN f7 IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS smape,
        | floor((CAST(sum(CASE WHEN f7 IS NOT NULL THEN abs(y - f7) ELSE 0 END) AS DOUBLE)
        |        / CAST(sum(CASE WHEN f7 IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE))
        |       / (CAST(sum(CASE WHEN f1 IS NOT NULL THEN abs(y - f1) ELSE 0 END) AS DOUBLE)
        |          / CAST(sum(CASE WHEN f1 IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS mase
        |FROM lg""".stripMargin,

    "q_ar2_yw" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |                      CAST(count(*) AS BIGINT) AS y
        |               FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(y) AS BIGINT) AS s FROM daily),
        |z AS (SELECT d, n, n * y - s AS z FROM daily CROSS JOIN tot),
        |lg AS (SELECT n, z, lag(z, 1) OVER w AS z1, lag(z, 2) OVER w AS z2
        |       FROM z WINDOW w AS (ORDER BY d ASC)),
        |m AS (SELECT max(n) AS n_days,
        |  CAST(sum(CAST(CAST(z AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS c0,
        |  CAST(sum(CASE WHEN z1 IS NOT NULL
        |    THEN CAST(CAST(z AS DECIMAL(19,0)) * CAST(z1 AS DECIMAL(19,0)) AS DECIMAL(38,0))
        |    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS c1,
        |  CAST(sum(CASE WHEN z2 IS NOT NULL
        |    THEN CAST(CAST(z AS DECIMAL(19,0)) * CAST(z2 AS DECIMAL(19,0)) AS DECIMAL(38,0))
        |    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS c2
        | FROM lg),
        |r AS (SELECT n_days,
        |        CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r1,
        |        CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r2 FROM m),
        |f AS (SELECT n_days, r1, r2,
        |        r1 * (1.0 - r2) / (1.0 - r1 * r1) AS phi1,
        |        (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi2 FROM r)
        |SELECT n_days,
        | floor(r1 * 10000.0 + 0.5) / 10000.0 AS acf1,
        | floor(r2 * 10000.0 + 0.5) / 10000.0 AS acf2,
        | floor(phi1 * 10000.0 + 0.5) / 10000.0 AS phi1,
        | floor(phi2 * 10000.0 + 0.5) / 10000.0 AS phi2,
        | floor((1.0 - phi1 * r1 - phi2 * r2) * 10000.0 + 0.5) / 10000.0
        |   AS innov_var_ratio
        |FROM f""".stripMargin,

    "q_gtest" ->
      """WITH o AS (SELECT o_orderpriority AS pr, o_orderstatus AS st,
        |                  CAST(count(*) AS BIGINT) AS obs
        |           FROM orders GROUP BY 1, 2),
        |rt AS (SELECT pr, CAST(sum(obs) AS BIGINT) AS rn FROM o GROUP BY 1),
        |ct AS (SELECT st, CAST(sum(obs) AS BIGINT) AS cn FROM o GROUP BY 1),
        |nn AS (SELECT CAST(sum(obs) AS BIGINT) AS n,
        |              CAST(count(DISTINCT pr) AS BIGINT) AS npr,
        |              CAST(count(DISTINCT st) AS BIGINT) AS nst FROM o),
        |terms AS (SELECT n, npr, nst,
        |  CASE WHEN obs > 0
        |       THEN CAST(CAST(obs AS DOUBLE)
        |                 * ln(CAST(obs AS DOUBLE) * CAST(n AS DOUBLE)
        |                      / (CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)))
        |                 AS DECIMAL(28,8))
        |       ELSE CAST(0 AS DECIMAL(28,8)) END AS term
        | FROM o JOIN rt USING (pr) JOIN ct USING (st) CROSS JOIN nn)
        |SELECT n AS n_total, (npr - 1) * (nst - 1) AS dof,
        | floor(CAST(sum(term) AS DOUBLE) * 2.0 * 10000.0 + 0.5) / 10000.0 AS g_stat
        |FROM terms GROUP BY 1, 2""".stripMargin,

    "q_ks_normal" ->
      """WITH v AS (SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v
        |           FROM orders),
        |grain AS (SELECT v.v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
        |  CAST(sum(CAST(CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
        | FROM v),
        |mu AS (SELECT n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |  sqrt((CAST(s2 AS DOUBLE)
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |       / CAST(n AS DOUBLE)) AS sigma FROM m),
        |ps AS (SELECT v, c,
        |         COALESCE(sum(c) OVER (ORDER BY v ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
        |       FROM grain),
        |gaps AS (SELECT n, mu, sigma,
        |  CAST(cum0 + c AS DOUBLE) / CAST(n AS DOUBLE) AS fhi,
        |  CAST(cum0 AS DOUBLE) / CAST(n AS DOUBLE) AS flo,
        |  CASE WHEN z >= 0.0 THEN 1.0 - 0.5 * tail ELSE 0.5 * tail END AS phi
        | FROM (SELECT *,
        |   (((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
        |      - 0.284496736) * tt + 0.254829592) * tt) * exp(-az * az) AS tail
        |  FROM (SELECT *, 1.0 / (1.0 + 0.3275911 * az) AS tt
        |   FROM (SELECT ps.*, n, mu, sigma,
        |           (CAST(v AS DOUBLE) - mu) / sigma AS z,
        |           abs((CAST(v AS DOUBLE) - mu) / sigma) / sqrt(2.0) AS az
        |         FROM ps CROSS JOIN mu))))
        |SELECT max(n) AS n_orders,
        | floor(max(mu) / 100.0 * 10000.0 + 0.5) / 10000.0 AS mean_value,
        | floor(max(sigma) / 100.0 * 10000.0 + 0.5) / 10000.0 AS sd_value,
        | floor(max(greatest(abs(fhi - phi), abs(flo - phi)))
        |       * 10000.0 + 0.5) / 10000.0 AS d_stat,
        | floor(sqrt(CAST(max(n) AS DOUBLE))
        |       * max(greatest(abs(fhi - phi), abs(flo - phi)))
        |       * 10000.0 + 0.5) / 10000.0 AS sqrt_n_d
        |FROM gaps""".stripMargin,

    "q_power_analysis" ->
      """WITH c AS (SELECT
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases
        | FROM events),
        |p AS (SELECT n_events, purchases,
        |        CAST(purchases AS DOUBLE) / CAST(n_events AS DOUBLE) AS p1
        |      FROM c),
        |x AS (SELECT *, p1 * 1.1 AS p2, (p1 + p1 * 1.1) / 2.0 AS pbar FROM p),
        |nr AS (SELECT *,
        |  pow(1.959963985 * sqrt(2.0 * pbar * (1.0 - pbar))
        |      + 0.8416212336 * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)), 2)
        |  / ((p2 - p1) * (p2 - p1)) AS nraw
        | FROM x)
        |SELECT n_events, purchases AS n_purchases,
        | floor(p1 * 10000.0 + 0.5) / 10000.0 AS baseline_rate,
        | floor(p2 * 10000.0 + 0.5) / 10000.0 AS target_rate,
        | CAST(ceil(nraw) AS BIGINT) AS n_per_arm,
        | CAST(ceil(nraw) * 2 AS BIGINT) AS n_total
        |FROM nr""".stripMargin,

    "q_customer_migration" ->
      """WITH cm AS (
        |  SELECT o_custkey AS ck,
        |         year(o_orderdate) * 12 + month(o_orderdate) AS mi,
        |         CASE WHEN count(*) >= 3 THEN 'heavy'
        |              WHEN count(*) = 2 THEN 'regular' ELSE 'light' END AS cls
        |  FROM orders GROUP BY 1, 2),
        |tr AS (SELECT cls,
        |         lead(mi, 1) OVER w AS mi_next,
        |         lead(cls, 1) OVER w AS cls_next, mi
        |       FROM cm WINDOW w AS (PARTITION BY ck ORDER BY mi ASC))
        |SELECT cls AS class_from, cls_next AS class_to,
        | CAST(count(*) AS BIGINT) AS n_transitions
        |FROM tr WHERE mi_next = mi + 1
        |GROUP BY 1, 2 ORDER BY class_from, class_to""".stripMargin,

    "q_hourly_profile" ->
      """WITH ev AS (
        |  SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
        |         ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow
        |  FROM events),
        |o AS (SELECT dow, hour, CAST(count(*) AS BIGINT) AS n
        |      FROM ev GROUP BY 1, 2),
        |rt AS (SELECT dow, CAST(sum(n) AS BIGINT) AS rn FROM o GROUP BY 1),
        |ct AS (SELECT hour, CAST(sum(n) AS BIGINT) AS cn FROM o GROUP BY 1),
        |nn AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM o)
        |SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour, n,
        | floor(CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE) / CAST(total AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS expected,
        | floor((CAST(n AS DOUBLE) - CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)
        |          / CAST(total AS DOUBLE))
        |       * (CAST(n AS DOUBLE) - CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)
        |          / CAST(total AS DOUBLE))
        |       / (CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE) / CAST(total AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS chi2_contrib
        |FROM o JOIN rt USING (dow) JOIN ct USING (hour) CROSS JOIN nn
        |ORDER BY dow, hour""".stripMargin,

    "q_poisson_bootstrap" ->
      """WITH rows_ AS (SELECT o_orderkey AS k,
        |  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS x
        | FROM orders),
        |full_ AS (SELECT CAST(sum(x) AS BIGINT) AS sx,
        |                 CAST(count(*) AS BIGINT) AS n FROM rows_),
        |reps AS (SELECT unnest(generate_series(0, 100 - 1)) AS rep),
        |wts AS (SELECT rep,
        |  CASE WHEN u < 0.36787944117144233 THEN 0
        |       WHEN u < 0.7357588823428847 THEN 1
        |       WHEN u < 0.9196986029286058 THEN 2
        |       WHEN u < 0.9810118431238462 THEN 3
        |       WHEN u < 0.9963401531726563 THEN 4
        |       ELSE 5 END AS w, x
        | FROM (SELECT rep, x,
        |         CAST(((k % 1048576) * 489905 + rep * 40503 + 7) % 1048576
        |              AS DOUBLE) / 1048576.0 AS u
        |       FROM rows_ CROSS JOIN reps)),
        |rm AS (SELECT rep,
        |         CAST(sum(w * x) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS m
        |       FROM wts GROUP BY rep),
        |rk AS (SELECT m, row_number() OVER (ORDER BY m ASC, rep ASC) AS i FROM rm),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS nb,
        |  sum(CAST(m AS DECIMAL(38,18))) AS sm,
        |  sum(CAST(m * m AS DECIMAL(38,18))) AS sm2 FROM rm),
        |ci AS (SELECT min(m) AS lo, max(m) AS hi FROM rk
        |       WHERE i IN (CAST(ceil(0.025 * 100) AS BIGINT),
        |                   CAST(ceil(0.975 * 100) AS BIGINT)))
        |SELECT nb AS n_replicates,
        | floor(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 * 10000.0 + 0.5)
        |   / 10000.0 AS mean_value,
        | floor(lo / 100.0 * 10000.0 + 0.5) / 10000.0 AS ci_lo,
        | floor(hi / 100.0 * 10000.0 + 0.5) / 10000.0 AS ci_hi,
        | floor(sqrt((CAST(sm2 AS DOUBLE)
        |             - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(nb AS DOUBLE))
        |            / CAST(nb - 1 AS DOUBLE)) / 100.0 * 10000.0 + 0.5)
        |   / 10000.0 AS se
        |FROM ci CROSS JOIN st CROSS JOIN full_""".stripMargin,

    "q_page_trend" ->
      """WITH cells AS (
        |  SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS q,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1, 2),
        |complete AS (SELECT yr FROM cells GROUP BY yr HAVING count(*) = 4),
        |ranked AS (SELECT c.yr, c.q,
        |  CAST(row_number() OVER (PARTITION BY c.yr
        |         ORDER BY c.rev ASC, c.q ASC) AS BIGINT) AS rk
        | FROM cells c JOIN complete USING (yr)),
        |rsums AS (SELECT q, CAST(sum(rk) AS BIGINT) AS rj,
        |                 CAST(count(*) AS BIGINT) AS nb
        |          FROM ranked GROUP BY q),
        |agg AS (SELECT max(nb) AS b, CAST(count(*) AS BIGINT) AS k,
        |               CAST(sum(q * rj) AS BIGINT) AS l
        |        FROM rsums)
        |SELECT b AS n_blocks, k AS k_treatments, l AS l_stat,
        | floor((12.0 * CAST(l AS DOUBLE)
        |        - 3.0 * CAST(b AS DOUBLE) * CAST(k AS DOUBLE)
        |          * CAST(k + 1 AS DOUBLE) * CAST(k + 1 AS DOUBLE))
        |       / sqrt(CAST(b AS DOUBLE) * CAST(k AS DOUBLE) * CAST(k AS DOUBLE)
        |              * CAST(k + 1 AS DOUBLE)
        |              * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0))
        |       * 10000.0 + 0.5) / 10000.0 AS z
        |FROM agg""".stripMargin,

    "q_cooks_distance" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |              AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |base AS (SELECT min(d) AS d0 FROM daily),
        |pts AS (SELECT d, CAST(date_diff('day', d0, d) AS BIGINT) AS x, y
        |        FROM daily CROSS JOIN base),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
        |  CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx
        | FROM pts),
        |fit AS (SELECT n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
        |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
        |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
        |  (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS sxxc
        | FROM m),
        |resid AS (SELECT d, y, n,
        |  CAST(y AS DOUBLE) - (my + b * (CAST(x AS DOUBLE) - mx)) AS e,
        |  1.0 / CAST(n AS DOUBLE)
        |    + (CAST(x AS DOUBLE) - mx) * (CAST(x AS DOUBLE) - mx) / sxxc AS h
        | FROM pts CROSS JOIN fit),
        |s2 AS (SELECT CAST(sum(CAST(e * e AS DECIMAL(38,8))) AS DOUBLE)
        |              / CAST(max(n) - 2 AS DOUBLE) AS s2 FROM resid)
        |SELECT d AS day,
        | floor(CAST(y AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(e / 100.0 * 10000.0 + 0.5) / 10000.0 AS residual,
        | floor(h * 10000.0 + 0.5) / 10000.0 AS leverage,
        | floor(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h))
        |       * 10000.0 + 0.5) / 10000.0 AS cooks_d
        |FROM resid CROSS JOIN s2
        |ORDER BY floor(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h))
        |               * 10000.0 + 0.5) / 10000.0 DESC, day ASC
        |LIMIT 10""".stripMargin,

    "q_prediction_interval" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |              AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |base AS (SELECT min(d) AS d0 FROM daily),
        |pts AS (SELECT CAST(date_diff('day', d0, d) AS BIGINT) AS x, y
        |        FROM daily CROSS JOIN base),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, max(x) AS xmax,
        |  CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
        |  CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
        |  CAST(sum(CAST(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))
        |                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx
        | FROM pts),
        |fit AS (SELECT n, xmax,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
        |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
        |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
        |  (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS sxxc
        | FROM m),
        |sse AS (SELECT CAST(sum(CAST(
        |    (CAST(y AS DOUBLE) - (my + b * (CAST(x AS DOUBLE) - mx)))
        |    * (CAST(y AS DOUBLE) - (my + b * (CAST(x AS DOUBLE) - mx)))
        |    AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS sse
        | FROM pts CROSS JOIN fit),
        |fin AS (SELECT n, xmax, b, my, mx, sxxc,
        |  CAST(xmax + 1 AS DOUBLE) AS x0,
        |  sqrt(CAST(sse AS DOUBLE) / CAST(n - 2 AS DOUBLE)) AS s
        | FROM fit CROSS JOIN sse),
        |o AS (SELECT n, xmax,
        |  my + b * (x0 - mx) AS yhat,
        |  s * sqrt(1.0 + 1.0 / CAST(n AS DOUBLE) + (x0 - mx) * (x0 - mx) / sxxc) AS sep
        | FROM fin)
        |SELECT n AS n_days, CAST(xmax + 1 AS BIGINT) AS x0_day,
        | floor(yhat / 100.0 * 10000.0 + 0.5) / 10000.0 AS forecast,
        | floor((yhat - 1.959963985 * sep) / 100.0 * 10000.0 + 0.5) / 10000.0 AS pi_lo,
        | floor((yhat + 1.959963985 * sep) / 100.0 * 10000.0 + 0.5) / 10000.0 AS pi_hi
        |FROM o""".stripMargin,

    "q_trimmed_mean" ->
      """WITH grain AS (
        |  SELECT l_returnflag AS grp,
        |         CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS v,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |ps AS (SELECT grp, v, c,
        |         COALESCE(sum(c) OVER (PARTITION BY grp ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo
        |       FROM grain),
        |tot AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM grain GROUP BY 1),
        |eff AS (SELECT ps.grp, v, n, n // 20 AS g,
        |          greatest(least(lo + c, n - n // 20) - greatest(lo, n // 20), 0)
        |            AS ceff
        |        FROM ps JOIN tot ON ps.grp = tot.grp)
        |SELECT grp AS l_returnflag, max(n) AS n,
        | CAST(max(g) AS BIGINT) AS n_trimmed_each,
        | floor(CAST(sum(ceff * v) AS DOUBLE) / CAST(sum(ceff) AS DOUBLE)
        |       / 100.0 * 10000.0 + 0.5) / 10000.0 AS trimmed_mean
        |FROM eff GROUP BY grp ORDER BY l_returnflag""".stripMargin,

    "q_cliffs_delta" ->
      """WITH o AS (
        |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
        |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ga
        |  FROM orders),
        |vals AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
        |                CAST(sum(ga) AS BIGINT) AS cnta
        |         FROM o GROUP BY v),
        |cum AS (SELECT v, cnt, cnta,
        |               COALESCE(sum(cnt) OVER (ORDER BY v
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
        |        FROM vals),
        |agg AS (SELECT sum(cnta) AS na, sum(cnt) AS n,
        |               sum(cnta * (2 * cumb + cnt + 1)) AS w2a
        |        FROM cum),
        |d AS (SELECT CAST(na AS BIGINT) AS n_a, CAST(n - na AS BIGINT) AS n_b,
        |        CAST(w2a - na * (na + 1) AS DOUBLE)
        |          / (CAST(na AS DOUBLE) * CAST(n - na AS DOUBLE)) - 1.0 AS delta
        |      FROM agg)
        |SELECT n_a, n_b,
        | floor(delta * 10000.0 + 0.5) / 10000.0 AS cliffs_delta,
        | CASE WHEN abs(delta) < 0.147 THEN 'negligible'
        |      WHEN abs(delta) < 0.33 THEN 'small'
        |      WHEN abs(delta) < 0.474 THEN 'medium'
        |      ELSE 'large' END AS magnitude
        |FROM d""".stripMargin,

    "q_pit_features" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |                  CAST(o_orderdate AS DATE) AS d,
        |                  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |           FROM orders)
        |SELECT o_orderkey, o_custkey,
        | CAST(COALESCE(count(*) OVER wp, 0) AS BIGINT) AS prior_n_orders,
        | floor(CAST(COALESCE(sum(cents) OVER wp, 0) AS DOUBLE) / 100.0
        |       * 10000.0 + 0.5) / 10000.0 AS prior_revenue,
        | CAST(date_diff('day', lag(d, 1) OVER wo, d) AS BIGINT) AS days_since_prev
        |FROM o
        |WINDOW wo AS (PARTITION BY o_custkey ORDER BY d ASC, o_orderkey ASC),
        |       wp AS (PARTITION BY o_custkey ORDER BY d ASC, o_orderkey ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |ORDER BY o_orderkey""".stripMargin,

    "q_target_encoding" ->
      """WITH li AS (
        |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |         p_brand,
        |         CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS x
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |g AS (SELECT p_brand, CAST(sum(x) AS BIGINT) AS sg,
        |             CAST(count(*) AS BIGINT) AS ng
        |      FROM li GROUP BY 1),
        |tot AS (SELECT CAST(sum(x) AS BIGINT) AS s,
        |               CAST(count(*) AS BIGINT) AS n FROM li)
        |SELECT l_orderkey, l_linenumber, p_brand,
        | floor(CAST(x AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS quantity,
        | floor(CASE WHEN ng > 1
        |            THEN CAST(sg - x AS DOUBLE) / CAST(ng - 1 AS DOUBLE)
        |            ELSE CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END
        |       / 100.0 * 10000.0 + 0.5) / 10000.0 AS loo_encoding
        |FROM li JOIN g USING (p_brand) CROSS JOIN tot
        |WHERE l_orderkey % 97 = 0
        |ORDER BY l_orderkey, l_linenumber, p_brand, quantity""".stripMargin,

    "q_shapley_attribution" ->
      """WITH users AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    + max(CASE WHEN event_type = 'click' THEN 2 ELSE 0 END)
        |    + max(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END)
        |    + max(CASE WHEN event_type = 'error' THEN 8 ELSE 0 END) AS mask,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |pm AS (SELECT mask, CAST(sum(conv) AS BIGINT) AS nconv
        |       FROM users GROUP BY mask),
        |lat AS (SELECT unnest(generate_series(0, 15)) AS s),
        |v AS (SELECT s, CAST(COALESCE(sum(nconv), 0) AS BIGINT) AS v
        |      FROM lat LEFT JOIN pm ON (pm.mask & lat.s) = pm.mask
        |      GROUP BY s),
        |ch(channel, bit) AS (VALUES ('view', 1), ('click', 2),
        |                            ('signup', 4), ('error', 8)),
        |pairs AS (SELECT channel, v0.s AS s, v0.v AS v_s, v1.v AS v_s1,
        |            CASE bit_count(v0.s) WHEN 0 THEN 6 WHEN 1 THEN 2
        |                 WHEN 2 THEN 2 ELSE 6 END AS w24
        |          FROM ch CROSS JOIN v v0
        |          JOIN v v1 ON v1.s = v0.s + bit
        |          WHERE (v0.s & bit) = 0),
        |tot AS (SELECT
        |  (SELECT v FROM v WHERE s = 15) AS v_full,
        |  (SELECT v FROM v WHERE s = 0) AS v_empty)
        |SELECT channel,
        | floor(CAST(sum(w24 * (v_s1 - v_s)) AS DOUBLE) / 24.0
        |       * 10000.0 + 0.5) / 10000.0 AS shapley_conversions,
        | floor(CAST(sum(w24 * (v_s1 - v_s)) AS DOUBLE) / 24.0
        |       / CAST(v_full - v_empty AS DOUBLE) * 10000.0 + 0.5) / 10000.0
        |   AS credit_share
        |FROM pairs CROSS JOIN tot
        |GROUP BY channel, v_full, v_empty ORDER BY channel""".stripMargin,

    "q_raking_ipf" ->
      """WITH cells AS (SELECT o_orderpriority AS pr, o_orderstatus AS st,
        |                      CAST(count(*) AS BIGINT) AS obs
        |               FROM orders GROUP BY 1, 2),
        |dims AS (SELECT CAST(sum(obs) AS BIGINT) AS n,
        |                CAST(count(DISTINCT pr) AS BIGINT) AS npr,
        |                CAST(count(DISTINCT st) AS BIGINT) AS nst FROM cells),
        |w0 AS (SELECT pr, st, obs, n, npr, nst, CAST(obs AS DOUBLE) AS w
        |       FROM cells CROSS JOIN dims),
        |r1 AS (SELECT w0.*, w * (CAST(n AS DOUBLE) / CAST(npr AS DOUBLE))
        |         / CAST(sum(CAST(w AS DECIMAL(38,18))) OVER (PARTITION BY pr) AS DOUBLE) AS w1
        |       FROM w0),
        |c1 AS (SELECT r1.* EXCLUDE (w, w1), w1 AS wx,
        |         w1 * (CAST(n AS DOUBLE) / CAST(nst AS DOUBLE))
        |         / CAST(sum(CAST(w1 AS DECIMAL(38,18))) OVER (PARTITION BY st) AS DOUBLE) AS w
        |       FROM r1),
        |r2 AS (SELECT c1.* EXCLUDE (wx), w * (CAST(n AS DOUBLE) / CAST(npr AS DOUBLE))
        |         / CAST(sum(CAST(w AS DECIMAL(38,18))) OVER (PARTITION BY pr) AS DOUBLE) AS w1
        |       FROM c1),
        |c2 AS (SELECT r2.* EXCLUDE (w, w1),
        |         w1 * (CAST(n AS DOUBLE) / CAST(nst AS DOUBLE))
        |         / CAST(sum(CAST(w1 AS DECIMAL(38,18))) OVER (PARTITION BY st) AS DOUBLE) AS w
        |       FROM r2),
        |r3 AS (SELECT c2.*, w * (CAST(n AS DOUBLE) / CAST(npr AS DOUBLE))
        |         / CAST(sum(CAST(w AS DECIMAL(38,18))) OVER (PARTITION BY pr) AS DOUBLE) AS w1
        |       FROM c2),
        |c3 AS (SELECT r3.* EXCLUDE (w, w1),
        |         w1 * (CAST(n AS DOUBLE) / CAST(nst AS DOUBLE))
        |         / CAST(sum(CAST(w1 AS DECIMAL(38,18))) OVER (PARTITION BY st) AS DOUBLE) AS w
        |       FROM r3)
        |SELECT pr, st, obs,
        | floor(w * 10000.0 + 0.5) / 10000.0 AS raked_weight,
        | floor(w / CAST(obs AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS weight_ratio
        |FROM c3 ORDER BY pr, st""".stripMargin,

    "q_lorenz_points" ->
      """WITH per AS (SELECT o_custkey,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS v
        | FROM orders GROUP BY 1),
        |grain AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM per GROUP BY 1),
        |ps AS (SELECT v, c,
        |         COALESCE(sum(c) OVER (ORDER BY v ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
        |       FROM grain),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s
        |        FROM per),
        |dec_ AS (SELECT n, s, unnest(generate_series(1, 10)) AS decile FROM tot),
        |dk AS (SELECT decile, n, s, (decile * n) // 10 AS k FROM dec_)
        |SELECT decile, CAST(k AS BIGINT) AS n_customers,
        | floor(CAST(sum(least(c, k - cum0) * v) AS DOUBLE) / CAST(s AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS cum_revenue_share
        |FROM dk JOIN ps ON cum0 < k
        |GROUP BY decile, k, s ORDER BY decile""".stripMargin,

    "q_uniform_sample_k" ->
      """SELECT doc_id, lang, source,
        | CAST((doc_id * 48271 + 11) % 1000003 AS BIGINT) AS h
        |FROM documents
        |ORDER BY h ASC, doc_id ASC LIMIT 100""".stripMargin,

    "q_pacf" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
        |       FROM daily),
        |cx AS (SELECT d, CAST(n * cents - s AS DECIMAL(19,0)) AS cx
        |       FROM daily CROSS JOIN st),
        |led AS (SELECT cx,
        |          lead(cx, 1) OVER w AS c1, lead(cx, 2) OVER w AS c2,
        |          lead(cx, 3) OVER w AS c3
        |        FROM cx WINDOW w AS (ORDER BY d ASC)),
        |m AS (SELECT CAST(sum(CAST(cx * cx AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS den,
        |             CAST(sum(CAST(cx * c1 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS n1,
        |             CAST(sum(CAST(cx * c2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS n2,
        |             CAST(sum(CAST(cx * c3 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS n3
        |      FROM led),
        |r AS (SELECT CAST(n1 AS DOUBLE) / CAST(den AS DOUBLE) AS r1,
        |             CAST(n2 AS DOUBLE) / CAST(den AS DOUBLE) AS r2,
        |             CAST(n3 AS DOUBLE) / CAST(den AS DOUBLE) AS r3
        |      FROM m),
        |p2 AS (SELECT r1, r2, r3, (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22 FROM r),
        |p3 AS (SELECT r1, r2, r3, p22, r1 - p22 * r1 AS p21 FROM p2)
        |SELECT floor(r1 * 10000.0 + 0.5) / 10000.0 AS acf1,
        |       floor(r2 * 10000.0 + 0.5) / 10000.0 AS acf2,
        |       floor(r3 * 10000.0 + 0.5) / 10000.0 AS acf3,
        |       floor(r1 * 10000.0 + 0.5) / 10000.0 AS pacf1,
        |       floor(p22 * 10000.0 + 0.5) / 10000.0 AS pacf2,
        |       floor((r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2)
        |             * 10000.0 + 0.5) / 10000.0 AS pacf3
        |FROM p3""".stripMargin,

    "q_cross_corr" ->
      """WITH xs AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS xc
        |  FROM orders GROUP BY 1),
        |ys AS (
        |  SELECT CAST(l_shipdate AS DATE) AS d2,
        |         CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS yc
        |  FROM lineitem GROUP BY 1),
        |paired AS (
        |  SELECT lag, xc, yc FROM (
        |    SELECT d, xc, unnest(generate_series(-3, 3)) AS lag FROM xs) x
        |  JOIN ys ON ys.d2 = x.d + CAST(x.lag AS INTEGER)),
        |m AS (
        |  SELECT CAST(lag AS BIGINT) AS lag, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(CAST(xc AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
        |         CAST(sum(CAST(yc AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |         CAST(sum(CAST(CAST(xc AS DECIMAL(19,0)) * CAST(yc AS DECIMAL(19,0))
        |                       AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
        |         CAST(sum(CAST(CAST(xc AS DECIMAL(19,0)) * CAST(xc AS DECIMAL(19,0))
        |                       AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
        |         CAST(sum(CAST(CAST(yc AS DECIMAL(19,0)) * CAST(yc AS DECIMAL(19,0))
        |                       AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy
        |  FROM paired GROUP BY 1)
        |SELECT lag, n_days,
        | floor((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |       / sqrt((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
        |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |              * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
        |                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS xcorr
        |FROM m ORDER BY lag""".stripMargin,

    "q_mcnemar" ->
      """WITH flags AS (
        |  SELECT o_custkey,
        |         max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS a,
        |         max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS b
        |  FROM orders GROUP BY 1),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |             CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
        |             CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a_only,
        |             CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b_only,
        |             CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
        |      FROM flags)
        |SELECT n_pairs, n_both, a_only, b_only, n_neither,
        | floor(CAST((abs(a_only - b_only) - 1) * (abs(a_only - b_only) - 1) AS DOUBLE)
        |       / CAST(a_only + b_only AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS chi2_cc
        |FROM c""".stripMargin,

    "q_hits" ->
      """WITH nx AS (
        |  SELECT l_partkey AS src,
        |         lead(l_partkey) OVER (PARTITION BY l_orderkey
        |           ORDER BY l_linenumber, l_partkey, l_suppkey) AS dst
        |  FROM lineitem),
        |e AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
        |      FROM nx WHERE dst IS NOT NULL AND dst <> src GROUP BY 1, 2),
        |nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |h0 AS MATERIALIZED (SELECT node, 1000000000000 // n AS h FROM nodes CROSS JOIN nn),
        |ar1 AS MATERIALIZED (SELECT dst, CAST(sum(h * w) AS BIGINT) AS ar
        |        FROM h0 JOIN e ON h0.node = e.src GROUP BY dst),
        |sa1 AS MATERIALIZED (SELECT CAST(sum(ar) AS BIGINT) AS sa FROM ar1),
        |a1 AS MATERIALIZED (SELECT node,
        |         CAST(COALESCE(ar, 0) // greatest(1, sa // 1000000000000) AS BIGINT) AS a
        |       FROM nodes CROSS JOIN sa1 LEFT JOIN ar1 ON ar1.dst = node),
        |hr1 AS MATERIALIZED (SELECT src, CAST(sum(a * w) AS BIGINT) AS hr
        |        FROM a1 JOIN e ON a1.node = e.dst GROUP BY src),
        |sh1 AS MATERIALIZED (SELECT CAST(sum(hr) AS BIGINT) AS sh FROM hr1),
        |h1 AS MATERIALIZED (SELECT node,
        |         CAST(COALESCE(hr, 0) // greatest(1, sh // 1000000000000) AS BIGINT) AS h
        |       FROM nodes CROSS JOIN sh1 LEFT JOIN hr1 ON hr1.src = node),
        |ar2 AS MATERIALIZED (SELECT dst, CAST(sum(h * w) AS BIGINT) AS ar
        |        FROM h1 JOIN e ON h1.node = e.src GROUP BY dst),
        |sa2 AS MATERIALIZED (SELECT CAST(sum(ar) AS BIGINT) AS sa FROM ar2),
        |a2 AS MATERIALIZED (SELECT node,
        |         CAST(COALESCE(ar, 0) // greatest(1, sa // 1000000000000) AS BIGINT) AS a
        |       FROM nodes CROSS JOIN sa2 LEFT JOIN ar2 ON ar2.dst = node),
        |hr2 AS MATERIALIZED (SELECT src, CAST(sum(a * w) AS BIGINT) AS hr
        |        FROM a2 JOIN e ON a2.node = e.dst GROUP BY src),
        |sh2 AS MATERIALIZED (SELECT CAST(sum(hr) AS BIGINT) AS sh FROM hr2),
        |h2 AS MATERIALIZED (SELECT node,
        |         CAST(COALESCE(hr, 0) // greatest(1, sh // 1000000000000) AS BIGINT) AS h
        |       FROM nodes CROSS JOIN sh2 LEFT JOIN hr2 ON hr2.src = node),
        |ar3 AS MATERIALIZED (SELECT dst, CAST(sum(h * w) AS BIGINT) AS ar
        |        FROM h2 JOIN e ON h2.node = e.src GROUP BY dst),
        |sa3 AS MATERIALIZED (SELECT CAST(sum(ar) AS BIGINT) AS sa FROM ar3),
        |a3 AS MATERIALIZED (SELECT node,
        |         CAST(COALESCE(ar, 0) // greatest(1, sa // 1000000000000) AS BIGINT) AS a
        |       FROM nodes CROSS JOIN sa3 LEFT JOIN ar3 ON ar3.dst = node),
        |hr3 AS MATERIALIZED (SELECT src, CAST(sum(a * w) AS BIGINT) AS hr
        |        FROM a3 JOIN e ON a3.node = e.dst GROUP BY src),
        |sh3 AS MATERIALIZED (SELECT CAST(sum(hr) AS BIGINT) AS sh FROM hr3),
        |h3 AS MATERIALIZED (SELECT node,
        |         CAST(COALESCE(hr, 0) // greatest(1, sh // 1000000000000) AS BIGINT) AS h
        |       FROM nodes CROSS JOIN sh3 LEFT JOIN hr3 ON hr3.src = node)
        |SELECT a3.node AS part_id, a AS auth_fp, h AS hub_fp
        |FROM a3 JOIN h3 ON a3.node = h3.node ORDER BY part_id""".stripMargin,

    "q_link_pred_jaccard" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |ed AS (SELECT a.l_partkey AS a, b.l_partkey AS b
        |       FROM items a JOIN items b
        |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |adj AS (SELECT a AS v, b AS u FROM ed UNION ALL SELECT b, a FROM ed),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY v),
        |wg AS (SELECT x.u AS x, y.u AS y
        |       FROM adj x JOIN adj y ON x.v = y.v AND x.u < y.u),
        |cm AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n_common
        |       FROM wg GROUP BY 1, 2),
        |nonadj AS (SELECT cm.x, cm.y, cm.n_common FROM cm
        |           LEFT JOIN ed ON ed.a = cm.x AND ed.b = cm.y
        |           WHERE ed.a IS NULL)
        |SELECT x AS part_a, y AS part_b, n_common,
        | floor(CAST(n_common AS DOUBLE)
        |       / CAST(dx.deg + dy.deg - n_common AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS jaccard
        |FROM nonadj JOIN deg dx ON dx.v = x JOIN deg dy ON dy.v = y
        |ORDER BY jaccard DESC, part_a, part_b LIMIT 50""".stripMargin,

    "q_pagerank" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM pairs GROUP BY 1, 2),
        |wout AS (SELECT src, CAST(sum(w) AS BIGINT) AS w_out FROM edges GROUP BY 1),
        |e AS (SELECT edges.src, dst, w, w_out FROM edges JOIN wout USING (src)),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |r0 AS (SELECT node, 1000000000000 // n AS r FROM nodes CROSS JOIN nn),
        |base AS (SELECT (15 * (1000000000000 // n)) // 100 AS b FROM nn),
        |r1 AS (SELECT node, CAST(b + (85 * COALESCE(s, 0)) // 100 AS BIGINT) AS r
        |       FROM nodes CROSS JOIN base
        |       LEFT JOIN (SELECT dst, CAST(sum((r * w) // w_out) AS BIGINT) AS s
        |                  FROM r0 JOIN e ON r0.node = e.src GROUP BY dst) t
        |         ON t.dst = node),
        |r2 AS (SELECT node, CAST(b + (85 * COALESCE(s, 0)) // 100 AS BIGINT) AS r
        |       FROM nodes CROSS JOIN base
        |       LEFT JOIN (SELECT dst, CAST(sum((r * w) // w_out) AS BIGINT) AS s
        |                  FROM r1 JOIN e ON r1.node = e.src GROUP BY dst) t
        |         ON t.dst = node),
        |r3 AS (SELECT node, CAST(b + (85 * COALESCE(s, 0)) // 100 AS BIGINT) AS r
        |       FROM nodes CROSS JOIN base
        |       LEFT JOIN (SELECT dst, CAST(sum((r * w) // w_out) AS BIGINT) AS s
        |                  FROM r2 JOIN e ON r2.node = e.src GROUP BY dst) t
        |         ON t.dst = node),
        |r4 AS (SELECT node, CAST(b + (85 * COALESCE(s, 0)) // 100 AS BIGINT) AS r
        |       FROM nodes CROSS JOIN base
        |       LEFT JOIN (SELECT dst, CAST(sum((r * w) // w_out) AS BIGINT) AS s
        |                  FROM r3 JOIN e ON r3.node = e.src GROUP BY dst) t
        |         ON t.dst = node),
        |r5 AS (SELECT node, CAST(b + (85 * COALESCE(s, 0)) // 100 AS BIGINT) AS r
        |       FROM nodes CROSS JOIN base
        |       LEFT JOIN (SELECT dst, CAST(sum((r * w) // w_out) AS BIGINT) AS s
        |                  FROM r4 JOIN e ON r4.node = e.src GROUP BY dst) t
        |         ON t.dst = node)
        |SELECT node AS part_id, r AS rank_fp FROM r5 ORDER BY part_id""".stripMargin,

    "q_shortest_path" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM pairs GROUP BY 1, 2),
        |e AS (SELECT src, dst, 1 + (1000 // (w + 1)) AS cost FROM edges),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |sn AS (SELECT min(node) AS src_node FROM nodes),
        |d0 AS (SELECT node, CAST(CASE WHEN node = src_node THEN 0
        |                         ELSE 1000000000000000 END AS BIGINT) AS dist
        |       FROM nodes CROSS JOIN sn),
        |d1 AS (SELECT d0.node, least(d0.dist, COALESCE(c.nd, 1000000000000000)) AS dist
        |       FROM d0 LEFT JOIN (SELECT dst, min(d0.dist + cost) AS nd
        |                          FROM d0 JOIN e ON d0.node = e.src GROUP BY dst) c
        |         ON c.dst = d0.node),
        |d2 AS (SELECT d1.node, least(d1.dist, COALESCE(c.nd, 1000000000000000)) AS dist
        |       FROM d1 LEFT JOIN (SELECT dst, min(d1.dist + cost) AS nd
        |                          FROM d1 JOIN e ON d1.node = e.src GROUP BY dst) c
        |         ON c.dst = d1.node),
        |d3 AS (SELECT d2.node, least(d2.dist, COALESCE(c.nd, 1000000000000000)) AS dist
        |       FROM d2 LEFT JOIN (SELECT dst, min(d2.dist + cost) AS nd
        |                          FROM d2 JOIN e ON d2.node = e.src GROUP BY dst) c
        |         ON c.dst = d2.node),
        |d4 AS (SELECT d3.node, least(d3.dist, COALESCE(c.nd, 1000000000000000)) AS dist
        |       FROM d3 LEFT JOIN (SELECT dst, min(d3.dist + cost) AS nd
        |                          FROM d3 JOIN e ON d3.node = e.src GROUP BY dst) c
        |         ON c.dst = d3.node)
        |SELECT node AS part_id, CAST(dist AS BIGINT) AS dist_fp
        |FROM d4 WHERE dist < 1000000000000000 ORDER BY part_id""".stripMargin,

    "q_kcore" -> {
      // 3 unrolled peel rounds — same fixed fold the Spark builder runs
      val rounds = (1 to 3).map { r =>
        s"""|d$r AS (SELECT src, count(*) AS dg FROM e${r - 1} GROUP BY src),
        |n$r AS (SELECT src FROM d$r, kv WHERE dg >= k),
        |e$r AS (SELECT e.src, e.dst FROM e${r - 1} e
        |        JOIN n$r a ON e.src = a.src JOIN n$r b ON e.dst = b.src),
        |""".stripMargin.stripSuffix("\n")
      }.mkString("\n")
      s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
        |          FROM items a JOIN items b
        |            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |e0 AS (SELECT DISTINCT src, dst FROM pairs),
        |kv AS (SELECT CAST((sum(dg) * 3) // (count(*) * 4) AS BIGINT) AS k
        |       FROM (SELECT src, count(*) AS dg FROM e0 GROUP BY src)),
        |${rounds.stripSuffix(",")}
        |SELECT src AS part_id, CAST(count(*) AS BIGINT) AS deg
        |FROM e3 GROUP BY src ORDER BY part_id""".stripMargin
    },

    "q_mannwhitney" ->
      """WITH o AS (
        |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
        |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ga
        |  FROM orders),
        |vals AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
        |                CAST(sum(ga) AS BIGINT) AS cnta
        |         FROM o GROUP BY v),
        |cum AS (SELECT v, cnt, cnta,
        |               COALESCE(sum(cnt) OVER (ORDER BY v
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
        |        FROM vals),
        |agg AS (SELECT sum(cnta) AS na, sum(cnt) AS n,
        |               sum(cnta * (2 * cumb + cnt + 1)) AS w2a,
        |               sum(cnt * cnt * cnt - cnt) AS ties
        |        FROM cum)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(n - na AS BIGINT) AS n_b,
        |       CAST(w2a AS BIGINT) AS w2_a,
        |       CAST(w2a - na * (na + 1) AS BIGINT) AS u2_a,
        |       CAST(ties AS BIGINT) AS tie_sum,
        |       floor((CAST(w2a - na * (na + 1) AS DOUBLE) / 2.0
        |              - CAST(na AS DOUBLE) * CAST(n - na AS DOUBLE) / 2.0)
        |             / sqrt(CAST(na AS DOUBLE) * CAST(n - na AS DOUBLE) / 12.0
        |                    * ((CAST(n AS DOUBLE) + 1.0)
        |                       - CAST(ties AS DOUBLE)
        |                         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))
        |             * 10000.0 + 0.5) / 10000.0 AS z
        |FROM agg""".stripMargin,

    "q_skew_report" ->
      """WITH cnts AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY l_partkey),
        |top20 AS (SELECT CAST(sum(cnt) AS BIGINT) AS top20_rows FROM (
        |            SELECT cnt FROM cnts ORDER BY cnt DESC, l_partkey LIMIT 20)),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |             CAST(sum(cnt) AS BIGINT) AS n_rows,
        |             CAST(max(cnt) AS BIGINT) AS max_cnt
        |      FROM cnts)
        |SELECT n_keys, n_rows, max_cnt,
        |       floor(CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)
        |             * 10000.0 + 0.5) / 10000.0 AS mean_cnt,
        |       floor(CAST(max_cnt AS DOUBLE) * CAST(n_keys AS DOUBLE)
        |             / CAST(n_rows AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS skew_ratio,
        |       floor(CAST(top20_rows AS DOUBLE) / CAST(n_rows AS DOUBLE)
        |             * 10000.0 + 0.5) / 10000.0 AS top20_share
        |FROM g, top20""".stripMargin,

    "q_spearman" ->
      """WITH b AS (
        |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS x,
        |         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |hx AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY x),
        |rx AS (SELECT x,
        |              2 * COALESCE(sum(cnt) OVER (ORDER BY x
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |              + cnt + 1 AS r_x
        |       FROM hx),
        |hy AS (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY y),
        |ry AS (SELECT y,
        |              2 * COALESCE(sum(cnt) OVER (ORDER BY y
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |              + cnt + 1 AS r_y
        |       FROM hy),
        |wr AS (SELECT r_x, r_y FROM b JOIN rx USING (x) JOIN ry USING (y)),
        |agg AS (SELECT count(*) AS n, sum(r_x) AS sa, sum(r_y) AS sb,
        |               sum(r_x * r_x) AS saa, sum(r_y * r_y) AS sbb,
        |               sum(r_x * r_y) AS sab
        |        FROM wr)
        |SELECT CAST(n AS BIGINT) AS n_pairs,
        |       floor(CAST(n * sab - sa * sb AS DOUBLE)
        |             / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
        |                    * CAST(n * sbb - sb * sb AS DOUBLE))
        |             * 10000.0 + 0.5) / 10000.0 AS rho
        |FROM agg""".stripMargin,

    "q_assoc_rules" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS ok, p_brand AS br
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |ic AS (SELECT br, count(*) AS c FROM b GROUP BY br),
        |n AS (SELECT count(DISTINCT ok) AS n_orders FROM b),
        |pr AS (
        |  SELECT a.br AS brand_a, c.br AS brand_b, count(*) AS pair_n
        |  FROM b a JOIN b c ON a.ok = c.ok AND a.br < c.br
        |  GROUP BY 1, 2)
        |SELECT pr.brand_a, pr.brand_b, pr.pair_n,
        | floor(CAST(pr.pair_n AS DOUBLE) / CAST(n.n_orders AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS support,
        | floor(CAST(pr.pair_n AS DOUBLE) / CAST(ia.c AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS confidence,
        | floor(CAST(pr.pair_n * n.n_orders AS DOUBLE)
        |       / CAST(ia.c * ib.c AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS lift
        |FROM pr
        |JOIN ic ia ON pr.brand_a = ia.br
        |JOIN ic ib ON pr.brand_b = ib.br
        |CROSS JOIN n
        |ORDER BY pr.brand_a, pr.brand_b""".stripMargin,

    "q_rfm" ->
      """WITH c0 AS (
        |  SELECT o_custkey AS custkey, max(CAST(o_orderdate AS DATE)) AS last_d,
        |         count(*) AS f, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders GROUP BY 1),
        |s AS (
        |  SELECT custkey,
        |         NTILE(5) OVER (ORDER BY last_d, custkey) AS r_score,
        |         NTILE(5) OVER (ORDER BY f, custkey) AS f_score,
        |         NTILE(5) OVER (ORDER BY m, custkey) AS m_score
        |  FROM c0)
        |SELECT custkey, r_score, f_score, m_score,
        |       r_score * 100 + f_score * 10 + m_score AS rfm
        |FROM s ORDER BY custkey""".stripMargin,

    "q_attribution" ->
      """WITH s AS (
        |  SELECT user_id, event_type, value,
        |         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |                    IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT coalesce(touch, '(direct)') AS channel, count(*) AS conversions,
        | floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS revenue
        |FROM s WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_pareto_front" ->
      """WITH pp AS (
        |  SELECT p_retailprice AS pr, max(p_size) AS meq FROM part GROUP BY 1),
        |f AS (
        |  SELECT pr, meq,
        |         max(meq) OVER (ORDER BY pr
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mprev
        |  FROM pp)
        |SELECT p.p_partkey, p.p_name,
        |       floor(p.p_retailprice * 10000.0 + 0.5) / 10000.0 AS price, p.p_size
        |FROM part p JOIN f ON p.p_retailprice = f.pr AND p.p_size = f.meq
        |WHERE f.mprev IS NULL OR f.meq > f.mprev
        |ORDER BY p.p_partkey""".stripMargin
  )
}
