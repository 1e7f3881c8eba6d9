package graft.oracles

/** DuckDB oracle SQL for the statistical insights tier (part 2) — split out of SparkEntry
  * verbatim (round-11 registry hygiene). SparkEntry.oracleSql concatenates
  * the per-domain maps; keys stay globally unique and strings unchanged, so
  * the driver's hash gate sees an identical contract.
  */
object InsightsSql2 {

  /** The geometric-mechanism CDF ladder for q_dp_geometric — the SAME
    * Scala-evaluated threshold doubles the Spark builder inlines
    * (Double.toString round-trips exactly and DuckDB's parser rounds
    * correctly, so both engines compare against identical bits).
    */
  private def dpLadder(epsilon: Double, b: Int): String = {
    val alpha = math.exp(-epsilon)
    def cdf(k: Int): Double =
      if (k < 0) math.pow(alpha, -k) / (1.0 + alpha)
      else 1.0 - math.pow(alpha, k + 1) / (1.0 + alpha)
    (-b until b).map(k => s"WHEN u < ${cdf(k)} THEN CAST($k AS BIGINT)")
      .mkString("\n        |    ") +
      s"\n        |    ELSE CAST($b AS BIGINT)"
  }

  val sql: Map[String, String] = Map(
    "q_dp_geometric" -> {
      s"""WITH g AS (SELECT o_orderpriority,
        |    CAST(count(*) AS BIGINT) AS true_count FROM orders GROUP BY 1),
        |gu AS (SELECT o_orderpriority, true_count,
        |    CAST(('0x' || substr(md5(o_orderpriority), 1, 12)) AS BIGINT)
        |      / 281474976710656.0 AS u
        |  FROM g),
        |rel AS (SELECT o_orderpriority, true_count,
        |    CASE ${dpLadder(0.5, 12)}
        |    END AS noise
        |  FROM gu)
        |SELECT o_orderpriority, true_count, noise,
        |       true_count + noise AS released_count
        |FROM rel ORDER BY o_orderpriority""".stripMargin
    },

    // round-12b: split-conformal intervals — per-type train mean, exact
    // order-statistic half-width at rank min(ceil((n+1)*0.9), n) in
    // (residual, event_id) order, empirical test coverage in bp
    "q_conformal_pi" ->
      """WITH ev AS (SELECT event_id, event_type,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents FROM events),
        |mu AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_train,
        |    CAST(sum(cents) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
        |      AS mu_micro
        |  FROM ev WHERE event_id % 3 = 0 GROUP BY 1),
        |calib AS (SELECT e.event_type, e.event_id,
        |    abs(e.cents * 1000000 - mu_micro) AS r
        |  FROM ev e JOIN mu USING (event_type) WHERE event_id % 3 = 1),
        |rk AS (SELECT event_type, event_id, r,
        |    row_number() OVER (PARTITION BY event_type ORDER BY r, event_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n_cal FROM calib),
        |qh AS (SELECT event_type, CAST(max(n_cal) AS BIGINT) AS n_cal,
        |    CAST(max(r) AS BIGINT) AS q_micro
        |  FROM rk
        |  WHERE rn = least(CAST(ceil((n_cal + 1) * 0.9) AS BIGINT), n_cal)
        |  GROUP BY 1),
        |ts AS (SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_test,
        |    CAST(sum(CASE WHEN abs(e.cents * 1000000 - mu_micro) <= q_micro
        |             THEN 1 ELSE 0 END) AS BIGINT) AS covered
        |  FROM ev e JOIN mu USING (event_type) JOIN qh USING (event_type)
        |  WHERE event_id % 3 = 2 GROUP BY 1)
        |SELECT event_type, n_train, n_cal, n_test, mu_micro, q_micro,
        |       covered * 10000 // n_test AS coverage_bp
        |FROM mu JOIN qh USING (event_type) JOIN ts USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // round-12b: CEM ATT — fixed-cutpoint coarsening, within-stratum exact
    // matching, integer micro-cent mean differences, one final r4 division
    "q_cem_att" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents FROM events),
        |cut AS (SELECT (min(ts_us) + max(ts_us)) // 2 AS cut FROM ev),
        |pu AS (SELECT user_id % 2 = 0 AS treated,
        |    least(4, CAST(sum(CASE WHEN ts_us < cut THEN cents ELSE 0 END)
        |                  AS BIGINT) // 60000) AS spend_bin,
        |    least(4, CAST(sum(CASE WHEN ts_us < cut THEN 1 ELSE 0 END)
        |                  AS BIGINT) // 12) AS act_bin,
        |    CAST(sum(CASE WHEN ts_us >= cut THEN cents ELSE 0 END) AS BIGINT) AS y
        |  FROM ev, cut GROUP BY user_id),
        |strata AS (SELECT spend_bin, act_bin,
        |    CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        |    CAST(sum(CASE WHEN treated THEN y ELSE 0 END) AS BIGINT) AS s_t,
        |    CAST(sum(CASE WHEN NOT treated THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
        |    CAST(sum(CASE WHEN NOT treated THEN y ELSE 0 END) AS BIGINT) AS s_c
        |  FROM pu GROUP BY 1, 2),
        |matched AS (SELECT n_t,
        |    n_t * (s_t * 1000000 // n_t - s_c * 1000000 // n_c) AS wdiff
        |  FROM strata WHERE n_t > 0 AND n_c > 0),
        |nt AS (SELECT CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_treated FROM pu),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_strata_matched,
        |    CAST(sum(n_t) AS BIGINT) AS n_matched_treated,
        |    CAST(sum(wdiff) AS BIGINT) AS total_micro FROM matched)
        |SELECT n_treated, n_matched_treated,
        |       n_matched_treated * 10000 // n_treated AS matched_bp,
        |       n_strata_matched,
        |       floor(CAST(total_micro AS DOUBLE)
        |             / (CAST(n_matched_treated AS DOUBLE) * 1000000.0)
        |             * 10000.0 + 0.5) / 10000.0 AS att_cents
        |FROM agg, nt""".stripMargin,

    // round-12b: Bradley–Terry MM rounds in fixed-point micro-units — two
    // integer floor-divisions per round at 10^12 scale, exactly mirroring
    // the Spark side (Hunter 2004 eq. 1.4 update, 3 unrolled rounds)
    "q_bradley_terry" -> {
      // r13: LEFT JOIN wt + greatest(1, ...) theta floor — zero-win types
      // stay in the iteration (MM limit theta->0) instead of vanishing
      val rounds = (1 to 3).map { r =>
        s"""s$r AS (SELECT n.i,
           |    CAST(sum(n.n_ij * 1000000000000 // (ti.t + tj.t)) AS BIGINT) AS si
           |    FROM n JOIN t${r - 1} ti ON ti.i = n.i
           |    JOIN t${r - 1} tj ON tj.i = n.j GROUP BY 1),
           |t$r AS (SELECT s$r.i,
           |    greatest(1, coalesce(wi, 0) * 1000000000000 // si) AS t
           |    FROM s$r LEFT JOIN wt ON wt.i = s$r.i),""".stripMargin
      }.mkString("\n")
      s"""WITH ev AS (SELECT user_id, event_type,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents FROM events),
        |ut AS (SELECT user_id, event_type, CAST(sum(cents) AS BIGINT) AS v
        |       FROM ev GROUP BY 1, 2),
        |dir AS (SELECT a.event_type AS i, b.event_type AS j,
        |        CAST(count(*) AS BIGINT) AS w
        |        FROM ut a JOIN ut b ON a.user_id = b.user_id
        |          AND a.event_type <> b.event_type AND a.v > b.v
        |        GROUP BY 1, 2),
        |n AS (SELECT i, j, CAST(sum(w) AS BIGINT) AS n_ij FROM (
        |        SELECT i, j, w FROM dir
        |        UNION ALL SELECT j AS i, i AS j, w FROM dir) GROUP BY 1, 2),
        |wt AS (SELECT i, CAST(sum(w) AS BIGINT) AS wi FROM dir GROUP BY 1),
        |t0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS t FROM n),
        |$rounds
        |ni AS (SELECT i, CAST(sum(n_ij) AS BIGINT) AS n_i FROM n GROUP BY 1)
        |SELECT t3.i AS event_type, coalesce(wi, 0) AS wins,
        |       n_i AS comparisons,
        |       t3.t AS theta_micro,
        |       CAST(row_number() OVER (ORDER BY t3.t DESC, t3.i) AS BIGINT)
        |         AS rank
        |FROM t3 LEFT JOIN wt ON wt.i = t3.i JOIN ni ON ni.i = t3.i
        |ORDER BY event_type""".stripMargin
    },

    "q_abtest_cuped" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents FROM events),
        |cut AS (SELECT (min(ts_us) + max(ts_us)) // 2 AS cut FROM ev),
        |pu AS (SELECT user_id,
        |    CAST(sum(CASE WHEN ts_us < cut THEN cents ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN ts_us >= cut THEN cents ELSE 0 END) AS BIGINT) AS y
        |  FROM ev, cut GROUP BY 1),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
        |    sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
        |    sum(CAST(y AS DECIMAL(38,0)) * y) AS syy,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN x ELSE 0 END) AS BIGINT) AS sxa,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN y ELSE 0 END) AS BIGINT) AS sya,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN x ELSE 0 END) AS BIGINT) AS sxb,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN y ELSE 0 END) AS BIGINT) AS syb
        |  FROM pu),
        |e AS (SELECT n, n_a, sxa, sya, sxb, syb, sx,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary
        |  FROM g),
        |m AS (SELECT n_a, n - n_a AS n_b, cov / varx AS theta,
        |    CAST(sya AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 AS mya,
        |    CAST(syb AS DOUBLE) / CAST(n - n_a AS DOUBLE) / 100.0 AS myb,
        |    CAST(sxa AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 AS mxa,
        |    CAST(sxb AS DOUBLE) / CAST(n - n_a AS DOUBLE) / 100.0 AS mxb,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mxall,
        |    cov * cov / (varx * vary) AS vr
        |  FROM e)
        |SELECT n_a, n_b,
        | floor(theta * 10000.0 + 0.5) / 10000.0 AS theta,
        | floor(mya * 10000.0 + 0.5) / 10000.0 AS mean_y_a,
        | floor(myb * 10000.0 + 0.5) / 10000.0 AS mean_y_b,
        | floor((mya - theta * (mxa - mxall)) * 10000.0 + 0.5) / 10000.0
        |   AS cuped_mean_a,
        | floor((myb - theta * (mxb - mxall)) * 10000.0 + 0.5) / 10000.0
        |   AS cuped_mean_b,
        | floor((mya - myb) * 10000.0 + 0.5) / 10000.0 AS diff_raw,
        | floor(((mya - theta * (mxa - mxall)) - (myb - theta * (mxb - mxall)))
        |       * 10000.0 + 0.5) / 10000.0 AS diff_cuped,
        | floor(vr * 10000.0 + 0.5) / 10000.0 AS var_reduction
        |FROM m""".stripMargin,

    "q_hw_forecast" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |s1 AS (SELECT d, cents, row_number() OVER (ORDER BY d ASC) AS rn,
        |    (CAST(d AS DATE) - DATE '1970-01-01' + 3) % 7 AS dow,
        |    cents * 16 + lag(cents, 1) OVER (ORDER BY d ASC) * 8
        |      + lag(cents, 2) OVER (ORDER BY d ASC) * 4
        |      + lag(cents, 3) OVER (ORDER BY d ASC) * 2
        |      + lag(cents, 4) OVER (ORDER BY d ASC) * 1 AS a_num
        |  FROM daily),
        |s2 AS (SELECT d, cents, rn, dow, a_num,
        |    a_num * 16 + lag(a_num, 1) OVER (ORDER BY d ASC) * 8
        |      + lag(a_num, 2) OVER (ORDER BY d ASC) * 4
        |      + lag(a_num, 3) OVER (ORDER BY d ASC) * 2
        |      + lag(a_num, 4) OVER (ORDER BY d ASC) * 1 AS b_num
        |  FROM s1),
        |f AS (SELECT d, cents, dow,
        |    2 * a_num * 31 - b_num AS level_num,
        |    a_num * 31 - b_num AS trend_num,
        |    cents * 961 - (2 * a_num * 31 - b_num) AS dev_num
        |  FROM s2 WHERE rn >= 9),
        |se AS (SELECT *,
        |    sum(dev_num) OVER (PARTITION BY dow ORDER BY d ASC
        |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sdev,
        |    count(*) OVER (PARTITION BY dow ORDER BY d ASC
        |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS scnt
        |  FROM f),
        |last14 AS (SELECT * FROM (SELECT *,
        |    row_number() OVER (ORDER BY d DESC) AS rk FROM se) WHERE rk <= 14)
        |SELECT d,
        | floor(CAST(cents AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(CAST(level_num AS DOUBLE) / 961.0 / 100.0 * 10000.0 + 0.5)
        |   / 10000.0 AS level,
        | floor(CAST(trend_num AS DOUBLE) / 961.0 / 100.0 * 10000.0 + 0.5)
        |   / 10000.0 AS trend,
        | floor(CAST(sdev AS DOUBLE) / (CAST(scnt AS DOUBLE) * 961.0 * 100.0)
        |       * 10000.0 + 0.5) / 10000.0 AS seasonal,
        | floor((CAST(level_num + 7 * trend_num AS DOUBLE) * CAST(scnt AS DOUBLE)
        |        + CAST(sdev AS DOUBLE))
        |       / (CAST(scnt AS DOUBLE) * 961.0 * 100.0) * 10000.0 + 0.5)
        |   / 10000.0 AS forecast_next_week
        |FROM last14 ORDER BY d""".stripMargin,

    "q_sax_symbols" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(cents) AS BIGINT) AS sx,
        |              sum(CAST(cents AS DECIMAL(38,0)) * cents) AS sxx
        |       FROM daily),
        |idx AS (SELECT cents,
        |    row_number() OVER (ORDER BY d ASC) AS rn FROM daily),
        |seg AS (SELECT (rn - 1) * 16 // n AS seg,
        |    CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(cents) AS BIGINT) AS seg_sum,
        |    min(n) AS n, min(sx) AS sx, min(sxx) AS sxx
        |  FROM idx, st GROUP BY 1),
        |z AS (SELECT seg, n_days,
        |    CAST(seg_sum AS DOUBLE) / CAST(n_days AS DOUBLE) AS paa,
        |    (CAST(seg_sum AS DOUBLE) / CAST(n_days AS DOUBLE)
        |     - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS zv
        |  FROM seg)
        |SELECT seg, n_days,
        | floor(paa / 100.0 * 10000.0 + 0.5) / 10000.0 AS paa_revenue,
        | floor(zv * 10000.0 + 0.5) / 10000.0 AS z,
        | CASE WHEN zv < -0.6745 THEN 'a' WHEN zv < 0.0 THEN 'b'
        |      WHEN zv < 0.6745 THEN 'c' ELSE 'd' END AS symbol
        |FROM z ORDER BY seg""".stripMargin,

    "q_equi_depth_hist" ->
      """WITH r AS (
        |  SELECT l_extendedprice AS p,
        |         NTILE(10) OVER (ORDER BY l_extendedprice, l_orderkey,
        |                         l_linenumber) AS bucket
        |  FROM lineitem)
        |SELECT bucket, count(*) AS n,
        | floor(min(p) * 10000.0 + 0.5) / 10000.0 AS lo,
        | floor(max(p) * 10000.0 + 0.5) / 10000.0 AS hi,
        | floor(CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS amount
        |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_stratified_sample" ->
      """SELECT c_mktsegment, rn, c_custkey, c_name FROM (
        |  SELECT c_mktsegment, c_custkey, c_name,
        |         row_number() OVER (
        |           PARTITION BY c_mktsegment
        |           ORDER BY ((c_custkey % 1000000007) * 2654435761) % 1000000007, c_custkey) AS rn
        |  FROM customer) t
        |WHERE rn <= 20
        |ORDER BY c_mktsegment, rn""".stripMargin,

    "q_ks_test" ->
      """WITH v AS (
        |  SELECT c_acctbal AS val,
        |         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ga,
        |         CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS gb
        |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |d AS (SELECT val, sum(ga) AS ca, sum(gb) AS cb FROM v GROUP BY val),
        |c AS (
        |  SELECT val,
        |         sum(ca) OVER (ORDER BY val
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
        |         sum(cb) OVER (ORDER BY val
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
        |  FROM d),
        |t AS (SELECT CAST(sum(ga) AS BIGINT) AS n1,
        |             CAST(sum(gb) AS BIGINT) AS n2 FROM v)
        |SELECT t.n1, t.n2,
        | floor(max(abs(CAST(c.cuma AS DOUBLE) / CAST(t.n1 AS DOUBLE)
        |             - CAST(c.cumb AS DOUBLE) / CAST(t.n2 AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS ks_d
        |FROM c CROSS JOIN t GROUP BY t.n1, t.n2""".stripMargin,

    "q_gini" ->
      """WITH spend AS (
        |  SELECT n.n_name, o.o_custkey AS ck,
        |         CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY n.n_name, o.o_custkey),
        |ranked AS (
        |  SELECT n_name, cents,
        |         row_number() OVER (PARTITION BY n_name
        |                            ORDER BY cents, ck) AS i
        |  FROM spend)
        |SELECT n_name, count(*) AS n,
        | floor((2.0 * CAST(sum(i * cents) AS DOUBLE)
        |        / (CAST(count(*) AS DOUBLE) * CAST(sum(cents) AS DOUBLE))
        |      - (CAST(count(*) AS DOUBLE) + 1.0) / CAST(count(*) AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS gini
        |FROM ranked GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_chi2" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS pr, o_orderstatus AS st, count(*) AS obs
        |  FROM orders GROUP BY 1, 2),
        |rt AS (SELECT pr, sum(obs) AS r FROM o GROUP BY pr),
        |ct AS (SELECT st, sum(obs) AS c FROM o GROUP BY st),
        |n AS (SELECT sum(obs) AS nn FROM o),
        |k AS (
        |  SELECT o.pr, o.st, o.obs,
        |         CAST(rt.r * ct.c AS DOUBLE) / CAST(n.nn AS DOUBLE) AS ex,
        |         (CAST(o.obs AS DOUBLE) - CAST(rt.r * ct.c AS DOUBLE) / CAST(n.nn AS DOUBLE))
        |         * (CAST(o.obs AS DOUBLE) - CAST(rt.r * ct.c AS DOUBLE) / CAST(n.nn AS DOUBLE))
        |         / (CAST(rt.r * ct.c AS DOUBLE) / CAST(n.nn AS DOUBLE)) AS contrib
        |  FROM o JOIN rt ON o.pr = rt.pr JOIN ct ON o.st = ct.st CROSS JOIN n),
        |t AS (SELECT CAST(sum(CAST(contrib AS DECIMAL(28,8))) AS DOUBLE) AS chi2 FROM k)
        |SELECT k.pr AS o_orderpriority, k.st AS o_orderstatus, k.obs,
        |       floor(k.ex * 10000.0 + 0.5) / 10000.0 AS expected,
        |       floor(k.contrib * 10000.0 + 0.5) / 10000.0 AS contrib,
        |       floor(t.chi2 * 10000.0 + 0.5) / 10000.0 AS chi2_total
        |FROM k CROSS JOIN t
        |ORDER BY k.pr, k.st""".stripMargin,

    "q_clustering_coeff" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS ok, p_brand AS br
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |e AS (
        |  SELECT x.br AS a, y.br AS b FROM b x JOIN b y ON x.ok = y.ok AND x.br < y.br
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |adj AS (SELECT a AS v, b AS u FROM e UNION ALL SELECT b AS v, a AS u FROM e),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY v),
        |tri AS (SELECT w1.v, CAST(count(*) AS BIGINT) AS n_tri
        |        FROM adj w1 JOIN adj w2 ON w1.v = w2.v AND w1.u < w2.u
        |        JOIN e ON e.a = w1.u AND e.b = w2.u
        |        GROUP BY w1.v)
        |SELECT deg.v AS brand, deg.deg, COALESCE(tri.n_tri, 0) AS n_tri,
        | CASE WHEN deg.deg < 2 THEN 0.0 ELSE
        |   floor(2.0 * CAST(COALESCE(tri.n_tri, 0) AS DOUBLE)
        |         / (CAST(deg.deg AS DOUBLE) * (CAST(deg.deg AS DOUBLE) - 1.0))
        |         * 10000.0 + 0.5) / 10000.0 END AS lcc
        |FROM deg LEFT JOIN tri ON deg.v = tri.v
        |ORDER BY brand""".stripMargin,

    "q_degree_dist" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM pairs GROUP BY src)
        |SELECT CAST(length(bin(deg)) - 1 AS INTEGER) AS bucket,
        | count(*) AS n_nodes, min(deg) AS min_deg, max(deg) AS max_deg
        |FROM deg GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_autocorr" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1),
        |lagd AS (
        |  SELECT rev,
        |         lead(rev, 1) OVER (ORDER BY d) AS rev_1,
        |         lead(rev, 2) OVER (ORDER BY d) AS rev_2,
        |         lead(rev, 3) OVER (ORDER BY d) AS rev_3
        |  FROM daily),
        |m AS (
        |  SELECT 1 AS lag, count(*) AS n,
        |         CAST(sum(rev) AS DOUBLE) AS sx, CAST(sum(rev_1) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(rev * rev_1 AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
        |         CAST(sum(CAST(rev * rev AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
        |         CAST(sum(CAST(rev_1 * rev_1 AS DECIMAL(38,4))) AS DOUBLE) AS syy
        |  FROM lagd WHERE rev_1 IS NOT NULL
        |  UNION ALL
        |  SELECT 2, count(*),
        |         CAST(sum(rev) AS DOUBLE), CAST(sum(rev_2) AS DOUBLE),
        |         CAST(sum(CAST(rev * rev_2 AS DECIMAL(38,4))) AS DOUBLE),
        |         CAST(sum(CAST(rev * rev AS DECIMAL(38,4))) AS DOUBLE),
        |         CAST(sum(CAST(rev_2 * rev_2 AS DECIMAL(38,4))) AS DOUBLE)
        |  FROM lagd WHERE rev_2 IS NOT NULL
        |  UNION ALL
        |  SELECT 3, count(*),
        |         CAST(sum(rev) AS DOUBLE), CAST(sum(rev_3) AS DOUBLE),
        |         CAST(sum(CAST(rev * rev_3 AS DECIMAL(38,4))) AS DOUBLE),
        |         CAST(sum(CAST(rev * rev AS DECIMAL(38,4))) AS DOUBLE),
        |         CAST(sum(CAST(rev_3 * rev_3 AS DECIMAL(38,4))) AS DOUBLE)
        |  FROM lagd WHERE rev_3 IS NOT NULL)
        |SELECT lag, CAST(n AS BIGINT) AS n_pairs,
        | floor((n * sxy - sx * sy) /
        |       (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |       * 10000.0 + 0.5) / 10000.0 AS acf
        |FROM m ORDER BY lag""".stripMargin,

    "q_mk_trend" ->
      """WITH monthly AS (
        |  SELECT l_returnflag AS grp,
        |         CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS v
        |  FROM lineitem GROUP BY 1, 2),
        |s AS (SELECT a.grp,
        |             CAST(sum(CASE WHEN b.v > a.v THEN 1
        |                           WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s
        |      FROM monthly a JOIN monthly b ON a.grp = b.grp AND a.m < b.m
        |      GROUP BY a.grp),
        |n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_periods FROM monthly GROUP BY grp),
        |ties AS (SELECT grp, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum
        |         FROM (SELECT grp, v, CAST(count(*) AS BIGINT) AS t
        |               FROM monthly GROUP BY grp, v)
        |         GROUP BY grp),
        |j AS (SELECT n.grp, n.n_periods, s.s,
        |             n.n_periods * (n.n_periods - 1) * (2 * n.n_periods + 5) - ties.tsum AS var18
        |      FROM n JOIN s ON n.grp = s.grp JOIN ties ON n.grp = ties.grp)
        |SELECT grp AS l_returnflag, n_periods, s, CAST(var18 AS BIGINT) AS var18,
        | floor((CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |             WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |             ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 AS z
        |FROM j ORDER BY l_returnflag""".stripMargin,

    "q_hhi" ->
      """WITH rev AS (
        |  SELECT n.n_name, l.l_suppkey,
        |         CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  GROUP BY 1, 2)
        |SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
        | CAST(sum(rev) AS DOUBLE) AS total_rev,
        | floor(10000.0 * CAST(sum(CAST(CAST(rev AS DECIMAL(19,2)) * rev AS DECIMAL(38,4))) AS DOUBLE)
        |       / (CAST(sum(rev) AS DOUBLE) * CAST(sum(rev) AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS hhi
        |FROM rev GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_rank_biserial" ->
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
        |        FROM cum)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(n - na AS BIGINT) AS n_b,
        |       CAST(w2a - na * (na + 1) AS BIGINT) AS u2_a,
        |       floor((1.0 - CAST(w2a - na * (na + 1) AS DOUBLE)
        |              / (CAST(na AS DOUBLE) * CAST(n - na AS DOUBLE)))
        |             * 10000.0 + 0.5) / 10000.0 AS r_rb
        |FROM agg""".stripMargin,

    "q_kendall_tau" ->
      """WITH monthly AS (
        |  SELECT l_returnflag AS grp,
        |         CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS x,
        |         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS y
        |  FROM lineitem GROUP BY 1, 2),
        |s AS (SELECT a.grp,
        |             CAST(sum((CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)
        |                    * (CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END)) AS BIGINT) AS s
        |      FROM monthly a JOIN monthly b ON a.grp = b.grp AND a.m < b.m
        |      GROUP BY a.grp),
        |n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_periods FROM monthly GROUP BY grp),
        |tx AS (SELECT grp, CAST(sum(t * (t - 1)) AS BIGINT) AS tx2
        |       FROM (SELECT grp, x, CAST(count(*) AS BIGINT) AS t FROM monthly GROUP BY grp, x)
        |       GROUP BY grp),
        |ty AS (SELECT grp, CAST(sum(t * (t - 1)) AS BIGINT) AS ty2
        |       FROM (SELECT grp, y, CAST(count(*) AS BIGINT) AS t FROM monthly GROUP BY grp, y)
        |       GROUP BY grp)
        |SELECT n.grp AS l_returnflag, n.n_periods, s.s,
        | tx.tx2 // 2 AS n1, ty.ty2 // 2 AS n2,
        | floor(CAST(s.s AS DOUBLE) /
        |       sqrt(CAST(n.n_periods * (n.n_periods - 1) - tx.tx2 AS DOUBLE)
        |            * CAST(n.n_periods * (n.n_periods - 1) - ty.ty2 AS DOUBLE) / 4.0)
        |       * 10000.0 + 0.5) / 10000.0 AS tau_b
        |FROM n JOIN s ON n.grp = s.grp JOIN tx ON n.grp = tx.grp JOIN ty ON n.grp = ty.grp
        |ORDER BY l_returnflag""".stripMargin,

    "q_cramers_v" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS pr, o_orderstatus AS st, count(*) AS obs
        |  FROM orders GROUP BY 1, 2),
        |rt AS (SELECT pr, sum(obs) AS r FROM o GROUP BY pr),
        |ct AS (SELECT st, sum(obs) AS c FROM o GROUP BY st),
        |dims AS (SELECT CAST(count(DISTINCT pr) AS BIGINT) AS n_rows_dim,
        |                CAST(count(DISTINCT st) AS BIGINT) AS n_cols_dim,
        |                CAST(sum(obs) AS BIGINT) AS n
        |         FROM o),
        |k AS (SELECT o.obs, CAST(rt.r * ct.c AS DOUBLE) / CAST(d.n AS DOUBLE) AS ex
        |      FROM o JOIN rt ON o.pr = rt.pr JOIN ct ON o.st = ct.st CROSS JOIN dims d),
        |c2 AS (SELECT CAST(sum(CAST((CAST(obs AS DOUBLE) - ex) * (CAST(obs AS DOUBLE) - ex) / ex
        |                            AS DECIMAL(28,8))) AS DOUBLE) AS chi2
        |       FROM k)
        |SELECT d.n_rows_dim, d.n_cols_dim, d.n,
        | floor(c2.chi2 * 10000.0 + 0.5) / 10000.0 AS chi2,
        | floor(sqrt(c2.chi2 / (CAST(d.n AS DOUBLE)
        |                       * CAST(least(d.n_rows_dim - 1, d.n_cols_dim - 1) AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS cramers_v
        |FROM dims d CROSS JOIN c2""".stripMargin,

    "q_anova_f" ->
      """WITH g AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS ng,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sg,
        |         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS ssg
        |  FROM lineitem GROUP BY 1),
        |terms AS (SELECT ng, ssg, sg,
        |          CAST(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)
        |               AS DECIMAL(28,8)) AS sq_over_n
        |          FROM g),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
        |             CAST(sum(sg) AS DOUBLE) AS sx,
        |             CAST(sum(sq_over_n) AS DOUBLE) AS sqn,
        |             CAST(sum(CAST(ssg AS DECIMAL(28,8))) AS DOUBLE) AS ssq
        |      FROM terms)
        |SELECT k, n,
        | floor((sqn - sx * sx / CAST(n AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS ssb,
        | floor((ssq - sqn) * 10000.0 + 0.5) / 10000.0 AS ssw,
        | floor(((sqn - sx * sx / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
        |       / ((ssq - sqn) / CAST(n - k AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS f
        |FROM a""".stripMargin,

    "q_cohens_d" ->
      """WITH a AS (
        |  SELECT CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sa,
        |         CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sb,
        |         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) END) AS DOUBLE) AS ssa,
        |         CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) END) AS DOUBLE) AS ssb
        |  FROM orders)
        |SELECT n_a, n_b,
        | floor((sa / CAST(n_a AS DOUBLE) - sb / CAST(n_b AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS mean_diff,
        | floor((sa / CAST(n_a AS DOUBLE) - sb / CAST(n_b AS DOUBLE))
        |       / sqrt(((CAST(n_a AS DOUBLE) - 1.0)
        |               * ((ssa - sa * sa / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0))
        |              + (CAST(n_b AS DOUBLE) - 1.0)
        |               * ((ssb - sb * sb / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)))
        |              / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 2.0))
        |       * 10000.0 + 0.5) / 10000.0 AS cohens_d
        |FROM a""".stripMargin,

    "q_assortativity" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
        |g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |         CAST(sum(CAST(da.deg AS DECIMAL(38,0))) AS DOUBLE) AS sx,
        |         CAST(sum(CAST(db.deg AS DECIMAL(38,0))) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(da.deg AS DECIMAL(38,0)) * CAST(db.deg AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
        |         CAST(sum(CAST(da.deg AS DECIMAL(38,0)) * CAST(da.deg AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
        |         CAST(sum(CAST(db.deg AS DECIMAL(38,0)) * CAST(db.deg AS DECIMAL(38,0))) AS DOUBLE) AS syy
        |  FROM e JOIN deg da ON e.src = da.src JOIN deg db ON e.dst = db.src)
        |SELECT n_edges,
        | floor((n_edges * sxy - sx * sy) /
        |       (sqrt(n_edges * sxx - sx * sx) * sqrt(n_edges * syy - sy * sy))
        |       * 10000.0 + 0.5) / 10000.0 AS assortativity
        |FROM g""".stripMargin,

    "q_burstiness" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(c) AS BIGINT) AS sc,
        |         CAST(sum(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))) AS DOUBLE) AS scc
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n_days, sc AS n_events,
        | floor(((CAST(n_days AS DOUBLE) * scc - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
        |        / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)))
        |       / (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS fano,
        | floor((sqrt((CAST(n_days AS DOUBLE) * scc - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
        |             / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)))
        |        - CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE))
        |       / (sqrt((CAST(n_days AS DOUBLE) * scc - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
        |               / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)))
        |          + CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS burstiness
        |FROM g ORDER BY event_type""".stripMargin,

    "q_welch_t" ->
      """WITH agg AS (
        |  SELECT CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |                       THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sa,
        |         CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
        |                       THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sb,
        |         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |                       THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) END) AS DOUBLE) AS ssa,
        |         CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
        |                       THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) END) AS DOUBLE) AS ssb
        |  FROM orders),
        |m AS (
        |  SELECT n_a, n_b, sa, sb, ssa, ssb,
        |         CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd
        |  FROM agg),
        |v AS (
        |  SELECT n_a, n_b, nad, nbd, sa / nad AS ma, sb / nbd AS mb,
        |         ((ssa - sa * sa / nad) / (nad - 1.0)) / nad AS sea,
        |         ((ssb - sb * sb / nbd) / (nbd - 1.0)) / nbd AS seb
        |  FROM m)
        |SELECT n_a, n_b,
        | floor(ma * 10000.0 + 0.5) / 10000.0 AS mean_a,
        | floor(mb * 10000.0 + 0.5) / 10000.0 AS mean_b,
        | floor(((ma - mb) / sqrt(sea + seb)) * 10000.0 + 0.5) / 10000.0 AS t,
        | floor(((sea + seb) * (sea + seb)
        |        / (sea * sea / (nad - 1.0) + seb * seb / (nbd - 1.0))) * 10000.0 + 0.5) / 10000.0 AS df
        |FROM v""".stripMargin,

    "q_theil_sen" ->
      """WITH monthly AS (
        |  SELECT l_returnflag AS grp,
        |         year(l_shipdate) * 12 + month(l_shipdate) AS mi,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS v
        |  FROM lineitem GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.grp, a.mi, b.mi AS mj,
        |         CAST(b.v - a.v AS DOUBLE) / CAST(b.mi - a.mi AS DOUBLE) AS slope
        |  FROM monthly a JOIN monthly b ON a.grp = b.grp AND a.mi < b.mi),
        |ranked AS (
        |  SELECT grp, slope,
        |         row_number() OVER (PARTITION BY grp ORDER BY slope, mi, mj) AS rn,
        |         count(*) OVER (PARTITION BY grp) AS k
        |  FROM pairs)
        |SELECT grp AS l_returnflag, CAST(k AS BIGINT) AS n_pairs,
        | floor(slope * 10000.0 + 0.5) / 10000.0 AS sen_slope
        |FROM ranked WHERE rn * 2 = k OR rn * 2 = k + 1
        |ORDER BY l_returnflag""".stripMargin,

    "q_adamic_adar" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b
        |  FROM items x JOIN items y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |adj AS (SELECT a AS v, b AS u FROM e UNION ALL SELECT b AS v, a AS u FROM e),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY v),
        |sc AS (
        |  SELECT w1.u AS x, w2.u AS y, CAST(count(*) AS BIGINT) AS n_common,
        |         sum(CAST(1.0 / ln(CAST(deg.deg AS DOUBLE)) AS DECIMAL(28,8))) AS aa_sum
        |  FROM adj w1 JOIN adj w2 ON w1.v = w2.v AND w1.u < w2.u
        |  JOIN deg ON deg.v = w1.v
        |  GROUP BY 1, 2)
        |SELECT sc.x AS part_a, sc.y AS part_b, sc.n_common,
        | floor(CAST(aa_sum AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS aa_score
        |FROM sc
        |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = sc.x AND e.b = sc.y)
        |ORDER BY part_a, part_b""".stripMargin,

    "q_label_prop" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS ok, p_brand AS br
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |e AS (
        |  SELECT x.br AS a, y.br AS b FROM b x JOIN b y ON x.ok = y.ok AND x.br < y.br
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
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
        |       WHERE cnt = mc GROUP BY v)
        |SELECT v AS brand, lab AS community FROM l3 ORDER BY brand""".stripMargin,

    "q_seasonal_decompose" ->
      """WITH monthly AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |tr AS (
        |  SELECT m, rev,
        |         sum(rev) OVER (ORDER BY m ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS s1,
        |         count(*) OVER (ORDER BY m ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS c1,
        |         sum(rev) OVER (ORDER BY m ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING) AS s2,
        |         count(*) OVER (ORDER BY m ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING) AS c2
        |  FROM monthly),
        |dt AS (
        |  SELECT m, rev,
        |         CASE WHEN c1 = 12 AND c2 = 12
        |              THEN CAST(s1 + s2 AS DOUBLE) / 24.0 END AS trend
        |  FROM tr),
        |dt2 AS (SELECT m, rev, trend, CAST(rev AS DOUBLE) - trend AS det FROM dt),
        |sidx AS (
        |  SELECT month(m) AS moy,
        |         CAST(sum(CAST(det AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS raw
        |  FROM dt2 WHERE det IS NOT NULL GROUP BY 1),
        |m0 AS (SELECT CAST(sum(CAST(raw AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS m0 FROM sidx),
        |season AS (SELECT moy, raw - m0.m0 AS seasonal FROM sidx CROSS JOIN m0)
        |SELECT dt2.m,
        | floor(CAST(rev AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(trend * 10000.0 + 0.5) / 10000.0 AS trend,
        | floor(seasonal * 10000.0 + 0.5) / 10000.0 AS seasonal,
        | floor((det - seasonal) * 10000.0 + 0.5) / 10000.0 AS resid
        |FROM dt2 LEFT JOIN season ON month(dt2.m) = season.moy
        |ORDER BY dt2.m""".stripMargin,

    "q_weighted_median" ->
      """WITH grain AS (
        |  SELECT l_returnflag AS grp,
        |         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS v,
        |         CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT grp, v, w,
        |         sum(w) OVER (PARTITION BY grp ORDER BY v ROWS UNBOUNDED PRECEDING) AS cw,
        |         sum(w) OVER (PARTITION BY grp) AS tw
        |  FROM grain)
        |SELECT grp AS l_returnflag, CAST(max(tw) AS BIGINT) AS total_weight,
        | floor((CAST(min(v) AS DOUBLE) / 100.0) * 10000.0 + 0.5) / 10000.0 AS weighted_median
        |FROM c WHERE 2 * cw >= tw GROUP BY grp ORDER BY grp""".stripMargin,

    "q_survival_km" ->
      """WITH pc AS (
        |  SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS f,
        |         max(CAST(o_orderdate AS DATE)) AS l
        |  FROM orders GROUP BY 1),
        |hz AS (SELECT max(CAST(o_orderdate AS DATE)) AS hz FROM orders),
        |dur AS (
        |  SELECT CAST(date_diff('day', f, l) AS BIGINT) AS t,
        |         CASE WHEN date_diff('day', l, hz) > 90 THEN 1 ELSE 0 END AS ev
        |  FROM pc CROSS JOIN hz),
        |grain AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS c
        |          FROM dur GROUP BY t),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM grain),
        |curve AS (
        |  SELECT t, d, c,
        |         n_total - COALESCE(sum(c) OVER (ORDER BY t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        |  FROM grain CROSS JOIN tot),
        |terms AS (
        |  SELECT t, d, n_risk,
        |         CASE WHEN d > 0 AND n_risk > d
        |              THEN CAST(ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE)) AS DECIMAL(28,8))
        |              ELSE CAST(0 AS DECIMAL(28,8)) END AS term,
        |         CASE WHEN n_risk = d THEN 1 ELSE 0 END AS z0
        |  FROM curve),
        |acc AS (
        |  SELECT t, d, n_risk,
        |         max(z0) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS zero,
        |         sum(term) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lnsum
        |  FROM terms)
        |SELECT t AS duration_days, CAST(n_risk AS BIGINT) AS n_risk,
        | d AS deaths,
        | CASE WHEN zero = 1 THEN 0.0
        |      ELSE floor(exp(CAST(lnsum AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 END AS survival
        |FROM acc WHERE d > 0 ORDER BY duration_days""".stripMargin,

    "q_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey AS ck, year(o_orderdate) * 12 + month(o_orderdate) AS mi,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS v
        |  FROM orders),
        |first AS (SELECT ck, min(mi) AS cohort FROM o GROUP BY ck),
        |cells AS (
        |  SELECT f.cohort, o.mi - f.cohort AS age, sum(o.v) AS rev
        |  FROM o JOIN first f ON o.ck = f.ck GROUP BY 1, 2),
        |sizes AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_customers
        |          FROM first GROUP BY cohort)
        |SELECT CAST(c.cohort AS BIGINT) AS cohort, CAST(c.age AS BIGINT) AS age,
        | s.n_customers,
        | CAST(c.rev AS DOUBLE) AS revenue,
        | CAST(sum(c.rev) OVER (PARTITION BY c.cohort ORDER BY c.age
        |        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_revenue,
        | floor((CAST(sum(c.rev) OVER (PARTITION BY c.cohort ORDER BY c.age
        |          ROWS UNBOUNDED PRECEDING) AS DOUBLE) / CAST(s.n_customers AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS ltv_per_customer
        |FROM cells c JOIN sizes s ON c.cohort = s.cohort
        |ORDER BY cohort, age""".stripMargin,

    "q_bollinger" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT d, rc,
        |         sum(rc) OVER win AS s,
        |         sum(CAST(CAST(rc AS DECIMAL(19,0)) * rc AS DECIMAL(38,0))) OVER win AS ss,
        |         count(*) OVER win AS c
        |  FROM daily WINDOW win AS (ORDER BY d ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |m AS (
        |  SELECT d, rc,
        |         CAST(s AS DOUBLE) / 20.0 / 100.0 AS mean,
        |         sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / 20.0) / 20.0) / 100.0 AS sd
        |  FROM w WHERE c = 20)
        |SELECT d,
        | floor(CAST(rc AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(mean * 10000.0 + 0.5) / 10000.0 AS mid,
        | floor((mean + 2.0 * sd) * 10000.0 + 0.5) / 10000.0 AS upper,
        | floor((mean - 2.0 * sd) * 10000.0 + 0.5) / 10000.0 AS lower,
        | (CAST(rc AS DOUBLE) / 100.0 > mean + 2.0 * sd OR CAST(rc AS DOUBLE) / 100.0 < mean - 2.0 * sd) AS breakout
        |FROM m ORDER BY d""".stripMargin,

    "q_drawdown" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |p AS (
        |  SELECT d, rev,
        |         max(rev) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS peak
        |  FROM daily)
        |SELECT d,
        | floor(CAST(rev AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(CAST(peak AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS peak,
        | floor((CAST(peak - rev AS DOUBLE) / CAST(peak AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS drawdown
        |FROM p ORDER BY d""".stripMargin,

    "q_seasonal_strength" ->
      """WITH monthly AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |tr AS (
        |  SELECT m, rev,
        |         sum(rev) OVER (ORDER BY m ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS s1,
        |         count(*) OVER (ORDER BY m ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS c1,
        |         sum(rev) OVER (ORDER BY m ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING) AS s2,
        |         count(*) OVER (ORDER BY m ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING) AS c2
        |  FROM monthly),
        |dt2 AS (
        |  SELECT m, rev,
        |         CASE WHEN c1 = 12 AND c2 = 12
        |              THEN CAST(s1 + s2 AS DOUBLE) / 24.0 END AS trend,
        |         CAST(rev AS DOUBLE) - CASE WHEN c1 = 12 AND c2 = 12
        |              THEN CAST(s1 + s2 AS DOUBLE) / 24.0 END AS det
        |  FROM tr),
        |sidx AS (
        |  SELECT month(m) AS moy,
        |         CAST(sum(CAST(det AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS raw
        |  FROM dt2 WHERE det IS NOT NULL GROUP BY 1),
        |m0 AS (SELECT CAST(sum(CAST(raw AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS m0 FROM sidx),
        |comp AS (
        |  SELECT floor(trend * 10000.0 + 0.5) / 10000.0 AS trend,
        |         floor((raw - m0.m0) * 10000.0 + 0.5) / 10000.0 AS seasonal,
        |         floor((det - (raw - m0.m0)) * 10000.0 + 0.5) / 10000.0 AS resid
        |  FROM dt2 LEFT JOIN sidx ON month(dt2.m) = sidx.moy CROSS JOIN m0
        |  WHERE det IS NOT NULL AND sidx.raw IS NOT NULL),
        |mo AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_months,
        |         sum(CAST(resid AS DECIMAL(28,8))) AS r_s,
        |         sum(CAST(resid * resid AS DECIMAL(28,8))) AS r_ss,
        |         sum(CAST(seasonal + resid AS DECIMAL(28,8))) AS sr_s,
        |         sum(CAST((seasonal + resid) * (seasonal + resid) AS DECIMAL(28,8))) AS sr_ss,
        |         sum(CAST(trend + resid AS DECIMAL(28,8))) AS tr_s,
        |         sum(CAST((trend + resid) * (trend + resid) AS DECIMAL(28,8))) AS tr_ss
        |  FROM comp)
        |SELECT n_months,
        | floor(greatest(0.0, 1.0 -
        |   ((CAST(r_ss AS DOUBLE) - CAST(r_s AS DOUBLE) * CAST(r_s AS DOUBLE) / CAST(n_months AS DOUBLE)) / CAST(n_months AS DOUBLE))
        |   / ((CAST(sr_ss AS DOUBLE) - CAST(sr_s AS DOUBLE) * CAST(sr_s AS DOUBLE) / CAST(n_months AS DOUBLE)) / CAST(n_months AS DOUBLE)))
        |   * 10000.0 + 0.5) / 10000.0 AS f_seasonal,
        | floor(greatest(0.0, 1.0 -
        |   ((CAST(r_ss AS DOUBLE) - CAST(r_s AS DOUBLE) * CAST(r_s AS DOUBLE) / CAST(n_months AS DOUBLE)) / CAST(n_months AS DOUBLE))
        |   / ((CAST(tr_ss AS DOUBLE) - CAST(tr_s AS DOUBLE) * CAST(tr_s AS DOUBLE) / CAST(n_months AS DOUBLE)) / CAST(n_months AS DOUBLE)))
        |   * 10000.0 + 0.5) / 10000.0 AS f_trend
        |FROM mo""".stripMargin,

    "q_attribution_decay" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us FROM events),
        |conv AS (
        |  SELECT user_id, ts_us AS tc, event_id AS cid,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
        |  FROM e WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id, ts_us AS tt, event_type AS channel
        |  FROM e WHERE event_type <> 'purchase'),
        |j AS (
        |  SELECT conv.user_id, conv.cid, conv.vc, touch.channel,
        |         exp(CAST(touch.tt - conv.tc AS DOUBLE) / 86400000000.0) AS w
        |  FROM conv JOIN touch ON conv.user_id = touch.user_id
        |  WHERE touch.tt < conv.tc AND conv.tc - touch.tt <= 604800000000),
        |ct AS (
        |  SELECT user_id, cid, vc, channel,
        |         sum(CAST(w AS DECIMAL(28,8))) AS wt,
        |         CAST(count(*) AS BIGINT) AS n_touches
        |  FROM j GROUP BY 1, 2, 3, 4),
        |tot AS (SELECT user_id, cid, sum(wt) AS wtot FROM ct GROUP BY 1, 2),
        |credit AS (
        |  SELECT ct.channel, ct.n_touches,
        |         CAST(CAST(ct.wt AS DOUBLE) / CAST(tot.wtot AS DOUBLE)
        |              * (CAST(ct.vc AS DOUBLE) / 100.0) AS DECIMAL(28,8)) AS cr
        |  FROM ct JOIN tot ON ct.user_id = tot.user_id AND ct.cid = tot.cid)
        |SELECT channel, CAST(sum(n_touches) AS BIGINT) AS n_touches,
        | CAST(count(*) AS BIGINT) AS n_conversion_links,
        | floor(CAST(sum(cr) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS credited_revenue
        |FROM credit GROUP BY channel ORDER BY channel""".stripMargin,

    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |pre AS (
        |  SELECT d,
        |         count(*) OVER w AS i,
        |         sum(rc) OVER w AS s,
        |         sum(CAST(CAST(rc AS DECIMAL(19,0)) * rc AS DECIMAL(38,0))) OVER w AS q
        |  FROM daily WINDOW w AS (ORDER BY d ROWS UNBOUNDED PRECEDING)),
        |tot AS (SELECT max(i) AS n, max(s) AS st, max(q) AS qt FROM pre),
        |cand AS (
        |  SELECT d, i, s, n, st, qt,
        |         (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(i AS DOUBLE))
        |         + ((CAST(qt AS DOUBLE) - CAST(q AS DOUBLE))
        |            - (CAST(st AS DOUBLE) - CAST(s AS DOUBLE)) * (CAST(st AS DOUBLE) - CAST(s AS DOUBLE))
        |              / (CAST(n AS DOUBLE) - CAST(i AS DOUBLE))) AS cost
        |  FROM pre CROSS JOIN tot WHERE i < n)
        |SELECT d AS split_after, CAST(i AS BIGINT) AS n_left,
        | CAST(n - i AS BIGINT) AS n_right,
        | floor(CAST(s AS DOUBLE) / CAST(i AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS mean_left,
        | floor((CAST(st AS DOUBLE) - CAST(s AS DOUBLE)) / (CAST(n AS DOUBLE) - CAST(i AS DOUBLE)) / 100.0
        |       * 10000.0 + 0.5) / 10000.0 AS mean_right,
        | floor((((CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE)) - cost)
        |        / (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS improvement_ratio
        |FROM cand ORDER BY cost, d LIMIT 1""".stripMargin,

    "q_abc_xyz" ->
      """WITH rev AS (
        |  SELECT l_partkey AS pk, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT pk, rev,
        |         sum(rev) OVER (ORDER BY rev DESC, pk
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(rev) OVER () AS total
        |  FROM rev),
        |abc AS (
        |  SELECT pk,
        |         floor(CAST(rev AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
        |         CASE WHEN cum * 100 <= total * 80 THEN 'A'
        |              WHEN cum * 100 <= total * 95 THEN 'B'
        |              ELSE 'C' END AS abc_class
        |  FROM c),
        |monthly AS (
        |  SELECT l_partkey AS pk, CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS qc
        |  FROM lineitem GROUP BY 1, 2),
        |stats AS (
        |  SELECT pk, CAST(count(*) AS BIGINT) AS nm,
        |         CAST(sum(qc) AS BIGINT) AS sq,
        |         sum(CAST(CAST(qc AS DECIMAL(19,0)) * qc AS DECIMAL(38,0))) AS qq
        |  FROM monthly GROUP BY pk),
        |xyz AS (
        |  SELECT pk,
        |         CASE WHEN nm < 2 THEN 'Z'
        |              WHEN sqrt((CAST(qq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(nm AS DOUBLE))
        |                        / (CAST(nm AS DOUBLE) - 1.0))
        |                   / (CAST(sq AS DOUBLE) / CAST(nm AS DOUBLE)) < 0.5 THEN 'X'
        |              WHEN sqrt((CAST(qq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(nm AS DOUBLE))
        |                        / (CAST(nm AS DOUBLE) - 1.0))
        |                   / (CAST(sq AS DOUBLE) / CAST(nm AS DOUBLE)) < 1.0 THEN 'Y'
        |              ELSE 'Z' END AS xyz_class
        |  FROM stats)
        |SELECT abc.abc_class, xyz.xyz_class, CAST(count(*) AS BIGINT) AS n_parts,
        | floor(CAST(sum(CAST(abc.revenue AS DECIMAL(18,4))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue
        |FROM abc JOIN xyz ON abc.pk = xyz.pk
        |GROUP BY 1, 2 ORDER BY abc_class, xyz_class""".stripMargin,

    "q_price_elasticity" ->
      """WITH li AS (
        |  SELECT p_brand,
        |         CAST(floor(l_extendedprice / l_quantity * 100.0 + 0.5) AS BIGINT) AS upc,
        |         CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS qc
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |g AS (
        |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(ln(CAST(upc AS DOUBLE) / 100.0) AS DECIMAL(28,8))) AS sx,
        |         sum(CAST(ln(CAST(qc AS DOUBLE) / 100.0) AS DECIMAL(28,8))) AS sy,
        |         sum(CAST(ln(CAST(upc AS DOUBLE) / 100.0) * ln(CAST(qc AS DOUBLE) / 100.0) AS DECIMAL(28,8))) AS sxy,
        |         sum(CAST(ln(CAST(upc AS DOUBLE) / 100.0) * ln(CAST(upc AS DOUBLE) / 100.0) AS DECIMAL(28,8))) AS sxx
        |  FROM li GROUP BY 1),
        |sl AS (
        |  SELECT p_brand, n,
        |         CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
        |  FROM g)
        |SELECT p_brand, n,
        | floor(slope * 10000.0 + 0.5) / 10000.0 AS elasticity,
        | floor(((syd - slope * sxd) / nd) * 10000.0 + 0.5) / 10000.0 AS intercept
        |FROM sl ORDER BY p_brand""".stripMargin,

    "q_return_rate_ci" ->
      """WITH g AS (
        |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
        |w AS (
        |  SELECT p_brand, n, k,
        |         CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
        |         1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE) AS denom
        |  FROM g)
        |SELECT p_brand, n, k AS returns,
        | floor(p * 10000.0 + 0.5) / 10000.0 AS return_rate,
        | floor((((p + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))) / denom)
        |        - (1.96 * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
        |                       + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / denom))
        |       * 10000.0 + 0.5) / 10000.0 AS wilson_lo,
        | floor((((p + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))) / denom)
        |        + (1.96 * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
        |                       + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / denom))
        |       * 10000.0 + 0.5) / 10000.0 AS wilson_hi
        |FROM w ORDER BY p_brand""".stripMargin,

    "q_leadtime_percentiles" ->
      """WITH lags AS (
        |  SELECT l_suppkey,
        |         CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |                        CAST(l_shipdate AS DATE)) AS BIGINT) AS lag_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_lines,
        | floor((CAST(sum(lag_days) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS mean_days,
        | floor(quantile_cont(lag_days, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50_days,
        | floor(quantile_cont(lag_days, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90_days,
        | max(lag_days) AS max_days
        |FROM lags
        |JOIN supplier s ON lags.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,

    "q_seasonal_mk" ->
      """WITH monthly AS (
        |  SELECT month(o_orderdate) AS moy, year(o_orderdate) AS yr,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS v
        |  FROM orders GROUP BY 1, 2),
        |s AS (SELECT a.moy,
        |             CAST(sum(CASE WHEN b.v > a.v THEN 1
        |                           WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s
        |      FROM monthly a JOIN monthly b ON a.moy = b.moy AND a.yr < b.yr
        |      GROUP BY a.moy),
        |n AS (SELECT moy, CAST(count(*) AS BIGINT) AS n_years FROM monthly GROUP BY moy),
        |ties AS (SELECT moy, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum
        |         FROM (SELECT moy, v, CAST(count(*) AS BIGINT) AS t
        |               FROM monthly GROUP BY moy, v)
        |         GROUP BY moy),
        |per AS (
        |  SELECT n.moy, n.n_years, s.s,
        |         CAST(n.n_years * (n.n_years - 1) * (2 * n.n_years + 5) - ties.tsum AS BIGINT) AS var18
        |  FROM n JOIN s ON n.moy = s.moy JOIN ties ON n.moy = ties.moy),
        |tot AS (
        |  SELECT 0 AS moy, CAST(sum(n_years) AS BIGINT) AS n_years,
        |         CAST(sum(s) AS BIGINT) AS s, CAST(sum(var18) AS BIGINT) AS var18
        |  FROM per)
        |SELECT CAST(moy AS BIGINT) AS moy, n_years, s, var18, CAST(NULL AS DOUBLE) AS z FROM per
        |UNION ALL
        |SELECT CAST(moy AS BIGINT), n_years, s, var18,
        | floor((CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |             WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |             ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0
        |FROM tot ORDER BY moy""".stripMargin,

    "q_grubbs" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(rc) AS BIGINT) AS s,
        |             sum(CAST(CAST(rc AS DECIMAL(19,0)) * rc AS DECIMAL(38,0))) AS ss
        |      FROM daily),
        |sc AS (
        |  SELECT d, rc, n, s, ss,
        |         abs(CAST(rc AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS dev,
        |         sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |              / (CAST(n AS DOUBLE) - 1.0)) AS sd,
        |         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean
        |  FROM daily CROSS JOIN m)
        |SELECT n AS n_days,
        | floor(mean / 100.0 * 10000.0 + 0.5) / 10000.0 AS mean_rev,
        | floor(sd / 100.0 * 10000.0 + 0.5) / 10000.0 AS sd_rev,
        | d AS outlier_day,
        | floor(CAST(rc AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS outlier_rev,
        | floor((dev / sd) * 10000.0 + 0.5) / 10000.0 AS g
        |FROM sc ORDER BY -dev, d LIMIT 1""".stripMargin,

    "q_hurst" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT rc, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i FROM daily),
        |sizes AS (SELECT unnest([8, 16, 32, 64]) AS bn),
        |blk AS (
        |  SELECT s.bn, (i - 1) // s.bn AS b, i, rc FROM idx CROSS JOIN sizes s),
        |full_ AS (
        |  SELECT bn, b, i, rc,
        |         count(*) OVER (PARTITION BY bn, b) AS cnt,
        |         sum(rc) OVER (PARTITION BY bn, b) AS s,
        |         sum(CAST(CAST(rc AS DECIMAL(19,0)) * rc AS DECIMAL(38,0)))
        |           OVER (PARTITION BY bn, b) AS ss,
        |         sum(rc) OVER (PARTITION BY bn, b ORDER BY i ROWS UNBOUNDED PRECEDING) AS cum,
        |         count(*) OVER (PARTITION BY bn, b ORDER BY i ROWS UNBOUNDED PRECEDING) AS k
        |  FROM blk),
        |z AS (
        |  SELECT bn, b, s, ss,
        |         CAST(cum AS DOUBLE) - CAST(k AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(bn AS DOUBLE)) AS zv
        |  FROM full_ WHERE cnt = bn),
        |rs AS (
        |  SELECT bn,
        |         (max(zv) - min(zv))
        |         / sqrt((CAST(max(ss) AS DOUBLE) - CAST(max(s) AS DOUBLE) * CAST(max(s) AS DOUBLE)
        |                 / CAST(bn AS DOUBLE)) / CAST(bn AS DOUBLE)) AS rsv
        |  FROM z GROUP BY bn, b),
        |per AS (
        |  SELECT bn AS block_n, CAST(count(*) AS BIGINT) AS n_blocks,
        |         CAST(sum(CAST(rsv AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS mean_rs
        |  FROM rs WHERE rsv IS NOT NULL GROUP BY bn),
        |fit AS (
        |  SELECT CAST(count(*) AS BIGINT) AS np,
        |         sum(CAST(ln(CAST(block_n AS DOUBLE)) AS DECIMAL(28,8))) AS sx,
        |         sum(CAST(ln(mean_rs) AS DECIMAL(28,8))) AS sy,
        |         sum(CAST(ln(CAST(block_n AS DOUBLE)) * ln(mean_rs) AS DECIMAL(28,8))) AS sxy,
        |         sum(CAST(ln(CAST(block_n AS DOUBLE)) * ln(CAST(block_n AS DOUBLE)) AS DECIMAL(28,8))) AS sxx
        |  FROM per)
        |SELECT CAST(per.block_n AS INTEGER) AS block_n, per.n_blocks,
        | floor(per.mean_rs * 10000.0 + 0.5) / 10000.0 AS mean_rs,
        | floor(((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS hurst
        |FROM per CROSS JOIN fit ORDER BY block_n""".stripMargin,

    "q_kruskal_wallis" ->
      """WITH o AS (
        |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
        |         o_orderpriority AS grp
        |  FROM orders),
        |gv AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS cgv FROM o GROUP BY 1, 2),
        |vals AS (SELECT v, CAST(sum(cgv) AS BIGINT) AS cnt FROM gv GROUP BY v),
        |cum AS (SELECT v, cnt,
        |               COALESCE(sum(cnt) OVER (ORDER BY v
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
        |        FROM vals),
        |per AS (SELECT grp, CAST(sum(cgv) AS BIGINT) AS nj,
        |               sum(cgv * (2 * cumb + cnt + 1)) AS r2j
        |        FROM gv JOIN cum USING (v) GROUP BY grp),
        |ties AS (SELECT sum(cnt * cnt * cnt - cnt) AS tie3 FROM cum),
        |tot AS (SELECT CAST(sum(nj) AS BIGINT) AS n,
        |               CAST(sum(CAST(CAST(r2j AS DOUBLE) * CAST(r2j AS DOUBLE)
        |                             / 4.0 / CAST(nj AS DOUBLE)
        |                             AS DECIMAL(28,8))) AS DOUBLE) AS rsum
        |        FROM per)
        |SELECT grp AS o_orderpriority, nj AS n,
        |       floor(CAST(r2j AS DOUBLE) / (2.0 * CAST(nj AS DOUBLE))
        |             * 10000.0 + 0.5) / 10000.0 AS mean_rank,
        |       CAST(NULL AS DOUBLE) AS h, CAST(NULL AS DOUBLE) AS h_tie
        |FROM per
        |UNION ALL
        |SELECT 'ALL', n, CAST(NULL AS DOUBLE),
        |       floor((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * rsum
        |              - 3.0 * (CAST(n AS DOUBLE) + 1.0)) * 10000.0 + 0.5) / 10000.0,
        |       floor(((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * rsum
        |               - 3.0 * (CAST(n AS DOUBLE) + 1.0))
        |              / (1.0 - CAST(tie3 AS DOUBLE)
        |                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |                    - CAST(n AS DOUBLE)))) * 10000.0 + 0.5) / 10000.0
        |FROM tot CROSS JOIN ties
        |ORDER BY o_orderpriority""".stripMargin,

    "q_jarque_bera" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |anchor AS (SELECT CAST(sum(rc) // count(*) AS BIGINT) AS a FROM daily),
        |xs AS (SELECT CAST(rc - a AS DOUBLE) / 1000000.0 AS x
        |       FROM daily CROSS JOIN anchor),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             sum(CAST(x AS DECIMAL(38,8))) AS s1,
        |             sum(CAST(x * x AS DECIMAL(38,8))) AS s2,
        |             sum(CAST(x * x * x AS DECIMAL(38,8))) AS s3,
        |             sum(CAST(x * x * x * x AS DECIMAL(38,8))) AS s4
        |      FROM xs),
        |c AS (SELECT n,
        |             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS dl,
        |             CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
        |             CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
        |             CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
        |      FROM m),
        |cm AS (SELECT n,
        |              r2 - dl * dl AS m2,
        |              r3 - 3.0 * dl * r2 + 2.0 * dl * dl * dl AS m3,
        |              r4 - 4.0 * dl * r3 + 6.0 * dl * dl * r2
        |                 - 3.0 * dl * dl * dl * dl AS m4
        |       FROM c),
        |sk AS (SELECT n, m3 / (m2 * sqrt(m2)) AS skew,
        |              m4 / (m2 * m2) - 3.0 AS kx
        |       FROM cm)
        |SELECT n AS n_days,
        | floor(skew * 10000.0 + 0.5) / 10000.0 AS skewness,
        | floor(kx * 10000.0 + 0.5) / 10000.0 AS kurtosis_excess,
        | floor(CAST(n AS DOUBLE) / 6.0 * (skew * skew + kx * kx / 4.0)
        |       * 10000.0 + 0.5) / 10000.0 AS jb
        |FROM sk""".stripMargin,

    "q_runs_test" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |ranked AS (SELECT rc, d,
        |                  CAST(row_number() OVER (ORDER BY rc, d) AS BIGINT) AS rn,
        |                  count(*) OVER () AS nn
        |           FROM daily),
        |med AS (SELECT rc AS med FROM ranked
        |        WHERE (rn * 2 = nn OR rn * 2 = nn + 1) AND rn * 2 <= nn + 1),
        |signs AS (SELECT d, CASE WHEN rc > med THEN 1 ELSE 0 END AS sg
        |          FROM daily CROSS JOIN med WHERE rc <> med),
        |brk AS (SELECT sg,
        |               CASE WHEN lag(sg) OVER (ORDER BY d) IS NULL
        |                      OR lag(sg) OVER (ORDER BY d) <> sg
        |                    THEN 1 ELSE 0 END AS b
        |        FROM signs),
        |agg AS (SELECT CAST(sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |               CAST(sum(CASE WHEN sg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
        |               CAST(sum(b) AS BIGINT) AS runs
        |        FROM brk)
        |SELECT n_above, n_below, runs,
        | floor((CAST(runs AS DOUBLE)
        |        - (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
        |           / (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE)) + 1.0))
        |       / sqrt(2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
        |              * (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
        |                 - (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE)))
        |              / ((CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE))
        |                 * (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE))
        |                 * (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE) - 1.0)))
        |       * 10000.0 + 0.5) / 10000.0 AS z
        |FROM agg""".stripMargin,

    "q_levene" ->
      """WITH hist AS (
        |  SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS qv,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |wc AS (SELECT grp, qv, c,
        |              sum(c) OVER (PARTITION BY grp ORDER BY qv
        |                ROWS UNBOUNDED PRECEDING) AS cum,
        |              sum(c) OVER (PARTITION BY grp) AS ng
        |       FROM hist),
        |meds AS (SELECT grp, min(qv) AS med FROM wc WHERE cum * 2 >= ng GROUP BY grp),
        |zc AS (SELECT h.grp, c, abs(qv - med) AS z
        |       FROM hist h JOIN meds USING (grp)),
        |per AS (SELECT grp, CAST(sum(c) AS BIGINT) AS nj,
        |               CAST(sum(c * z) AS BIGINT) AS sz,
        |               sum(CAST(c AS HUGEINT) * z * z) AS szz
        |        FROM zc GROUP BY grp),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(nj) AS BIGINT) AS n,
        |               CAST(sum(sz) AS BIGINT) AS sz_all,
        |               CAST(sum(CAST(CAST(szz AS DOUBLE)
        |                             - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
        |                               / CAST(nj AS DOUBLE)
        |                             AS DECIMAL(28,8))) AS DOUBLE) AS ssw,
        |               CAST(sum(CAST(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
        |                             / CAST(nj AS DOUBLE)
        |                             AS DECIMAL(28,8))) AS DOUBLE) AS sb
        |        FROM per)
        |SELECT per.grp AS l_returnflag, per.nj AS n, meds.med AS median_qty,
        |       floor(CAST(per.sz AS DOUBLE) / CAST(per.nj AS DOUBLE)
        |             * 10000.0 + 0.5) / 10000.0 AS mean_absdev,
        |       CAST(NULL AS DOUBLE) AS f
        |FROM per JOIN meds ON per.grp = meds.grp
        |UNION ALL
        |SELECT 'ALL', n, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
        |       floor(((sb - CAST(sz_all AS DOUBLE) * CAST(sz_all AS DOUBLE)
        |                    / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
        |             / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
        |             * 10000.0 + 0.5) / 10000.0
        |FROM tot
        |ORDER BY l_returnflag""".stripMargin,

    "q_reciprocity" ->
      """WITH seq AS (
        |  SELECT l_partkey AS a,
        |         lead(l_partkey) OVER (PARTITION BY l_orderkey
        |           ORDER BY l_linenumber, l_partkey, l_suppkey) AS b
        |  FROM lineitem),
        |edges AS (SELECT a, b, CAST(count(*) AS BIGINT) AS w
        |          FROM seq WHERE b IS NOT NULL AND b <> a GROUP BY 1, 2),
        |j AS (SELECT e.w, r.w AS wr
        |      FROM edges e LEFT JOIN edges r ON e.a = r.b AND e.b = r.a)
        |SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |       CAST(sum(CASE WHEN wr IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_recip,
        |       CAST(sum(w) AS BIGINT) AS total_w,
        |       CAST(sum(least(w, COALESCE(wr, 0))) AS BIGINT) AS recip_w,
        |       floor(CAST(sum(CASE WHEN wr IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS reciprocity,
        |       floor(CAST(sum(least(w, COALESCE(wr, 0))) AS DOUBLE)
        |             / CAST(sum(w) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS weighted_reciprocity
        |FROM j""".stripMargin,

    "q_mutual_info" ->
      """WITH cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        |               FROM documents GROUP BY 1, 2),
        |joint AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |                 sum(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
        |                          AS DECIMAL(28,8))) AS slj
        |          FROM cells),
        |lm AS (SELECT sum(CAST(CAST(cl AS DOUBLE) * ln(CAST(cl AS DOUBLE))
        |                       AS DECIMAL(28,8))) AS sll
        |       FROM (SELECT sum(c) AS cl FROM cells GROUP BY lang)),
        |sm AS (SELECT sum(CAST(CAST(cs AS DOUBLE) * ln(CAST(cs AS DOUBLE))
        |                       AS DECIMAL(28,8))) AS sls
        |       FROM (SELECT sum(c) AS cs FROM cells GROUP BY source)),
        |h AS (SELECT n,
        |             ln(CAST(n AS DOUBLE)) - CAST(sll AS DOUBLE) / CAST(n AS DOUBLE) AS hl,
        |             ln(CAST(n AS DOUBLE)) - CAST(sls AS DOUBLE) / CAST(n AS DOUBLE) AS hs,
        |             ln(CAST(n AS DOUBLE)) - CAST(slj AS DOUBLE) / CAST(n AS DOUBLE) AS hj
        |      FROM joint CROSS JOIN lm CROSS JOIN sm)
        |SELECT n AS n_docs,
        | floor(hl * 10000.0 + 0.5) / 10000.0 AS h_lang,
        | floor(hs * 10000.0 + 0.5) / 10000.0 AS h_source,
        | floor(hj * 10000.0 + 0.5) / 10000.0 AS h_joint,
        | floor((hl + hs - hj) * 10000.0 + 0.5) / 10000.0 AS mi_nats,
        | floor((hl + hs - hj) / sqrt(hl * hs) * 10000.0 + 0.5) / 10000.0 AS nmi
        |FROM h""".stripMargin,

    "q_theil_index" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
        |               sum(CAST(CAST(x AS DOUBLE) * ln(CAST(x AS DOUBLE))
        |                        AS DECIMAL(28,8))) AS sxlx,
        |               sum(CAST(ln(CAST(x AS DOUBLE)) AS DECIMAL(28,8))) AS slx
        |        FROM cust)
        |SELECT n AS n_customers,
        | floor((CAST(sxlx AS DOUBLE) / CAST(s AS DOUBLE)
        |        - ln(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) * 10000.0 + 0.5)
        |   / 10000.0 AS theil_t,
        | floor((ln(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |        - CAST(slx AS DOUBLE) / CAST(n AS DOUBLE)) * 10000.0 + 0.5)
        |   / 10000.0 AS theil_l
        |FROM agg""".stripMargin,

    "q_adf" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |anchor AS (SELECT CAST(sum(rc) // count(*) AS BIGINT) AS a FROM daily),
        |pairs AS (
        |  SELECT prev - a AS x, rc - prev AS y
        |  FROM (SELECT rc, lag(rc) OVER (ORDER BY d) AS prev FROM daily)
        |       CROSS JOIN anchor
        |  WHERE prev IS NOT NULL),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |             sum(CAST(x AS HUGEINT) * y) AS sxy,
        |             sum(CAST(x AS HUGEINT) * x) AS sxx,
        |             sum(CAST(y AS HUGEINT) * y) AS syy
        |      FROM pairs),
        |c AS (SELECT n,
        |             CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |               / CAST(n AS DOUBLE) AS sxxc,
        |             CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
        |               / CAST(n AS DOUBLE) AS sxyc,
        |             CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
        |               / CAST(n AS DOUBLE) AS syyc
        |      FROM m),
        |g AS (SELECT n, sxyc / sxxc AS gamma,
        |             sqrt((syyc - (sxyc / sxxc) * sxyc)
        |                  / (CAST(n AS DOUBLE) - 2.0) / sxxc) AS se
        |      FROM c)
        |SELECT n AS n_pairs,
        | floor(gamma * 10000.0 + 0.5) / 10000.0 AS gamma,
        | floor(se * 10000.0 + 0.5) / 10000.0 AS se,
        | floor(gamma / se * 10000.0 + 0.5) / 10000.0 AS t_stat
        |FROM g""".stripMargin,

    "q_var_es" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |rets AS (
        |  SELECT d, ln(CAST(rc AS DOUBLE) / CAST(prev AS DOUBLE)) AS r
        |  FROM (SELECT d, rc, lag(rc) OVER (ORDER BY d) AS prev FROM daily)
        |  WHERE prev IS NOT NULL),
        |ranked AS (
        |  SELECT r, CAST(row_number() OVER (ORDER BY r, d) AS BIGINT) AS rn,
        |         count(*) OVER () AS nn,
        |         CAST(ceil(count(*) OVER () * 0.05) AS BIGINT) AS k
        |  FROM rets),
        |v AS (SELECT r AS var5, nn, k FROM ranked WHERE rn = k),
        |tail AS (SELECT CAST(sum(CAST(r AS DECIMAL(28,8))) AS DOUBLE) AS tsum,
        |                CAST(count(*) AS BIGINT) AS tc
        |         FROM ranked WHERE rn <= k)
        |SELECT CAST(nn AS BIGINT) AS n_returns, k AS n_tail,
        | floor(var5 * 10000.0 + 0.5) / 10000.0 AS var_5,
        | floor(tsum / CAST(tc AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS es_5
        |FROM v CROSS JOIN tail""".stripMargin,

    "q_friedman" ->
      """WITH monthly AS (
        |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS blk,
        |         o_orderpriority AS trt,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS v
        |  FROM orders GROUP BY 1, 2),
        |kk AS (SELECT CAST(count(DISTINCT trt) AS BIGINT) AS k FROM monthly),
        |complete AS (
        |  SELECT m.* FROM monthly m CROSS JOIN kk
        |  QUALIFY count(*) OVER (PARTITION BY blk) = k),
        |ranked AS (
        |  SELECT trt,
        |         2 * rank() OVER (PARTITION BY blk ORDER BY v)
        |           + count(*) OVER (PARTITION BY blk, v) - 1 AS r2
        |  FROM complete),
        |per AS (SELECT trt, CAST(count(*) AS BIGINT) AS n_blocks,
        |               CAST(sum(r2) AS BIGINT) AS r2j
        |        FROM ranked GROUP BY trt),
        |tot AS (SELECT CAST(max(n_blocks) AS BIGINT) AS n,
        |               CAST(count(*) AS BIGINT) AS kk2,
        |               CAST(sum(CAST(CAST(r2j AS DOUBLE) * CAST(r2j AS DOUBLE) / 4.0
        |                             AS DECIMAL(28,8))) AS DOUBLE) AS rsum
        |        FROM per)
        |SELECT trt AS o_orderpriority, n_blocks,
        |       floor(CAST(r2j AS DOUBLE) / (2.0 * CAST(n_blocks AS DOUBLE))
        |             * 10000.0 + 0.5) / 10000.0 AS mean_rank,
        |       CAST(NULL AS DOUBLE) AS chi2_f
        |FROM per
        |UNION ALL
        |SELECT 'ALL', n, CAST(NULL AS DOUBLE),
        |       floor((12.0 / (CAST(n AS DOUBLE) * CAST(kk2 AS DOUBLE)
        |                      * (CAST(kk2 AS DOUBLE) + 1.0)) * rsum
        |              - 3.0 * CAST(n AS DOUBLE) * (CAST(kk2 AS DOUBLE) + 1.0))
        |             * 10000.0 + 0.5) / 10000.0
        |FROM tot
        |ORDER BY o_orderpriority""".stripMargin,

    "q_ransac_line" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS qx,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS qy
        |  FROM orders GROUP BY 1),
        |sample_ AS (SELECT CAST(row_number() OVER (ORDER BY d ASC) - 1 AS BIGINT)
        |              AS k, qx, qy
        |            FROM daily),
        |cands AS (SELECT unnest(generate_series(0, 31)) AS cand),
        |hs AS (SELECT cand, k, qx, qy,
        |         ((k % 1048576) * 489905
        |          + CAST(cand AS BIGINT) * 40503 + 17) % 1048576 AS h
        |       FROM sample_ CROSS JOIN cands),
        |sup AS (SELECT cand, qx, qy,
        |          row_number() OVER (PARTITION BY cand
        |            ORDER BY h ASC, k ASC) AS rn
        |        FROM hs),
        |lines AS (SELECT cand,
        |    max(CASE WHEN rn = 1 THEN qx END) AS x1,
        |    max(CASE WHEN rn = 1 THEN qy END) AS y1,
        |    max(CASE WHEN rn = 2 THEN qx END) AS x2,
        |    max(CASE WHEN rn = 2 THEN qy END) AS y2
        |  FROM sup WHERE rn <= 2 GROUP BY cand),
        |ln2 AS (SELECT cand,
        |          CAST(y2 - y1 AS DOUBLE) / CAST(x2 - x1 AS DOUBLE) AS m, x1, y1
        |        FROM lines WHERE x1 <> x2),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sample FROM sample_),
        |sc AS (SELECT cand, m, x1, y1, CAST(count(*) AS BIGINT) AS n_inliers
        |       FROM sample_ CROSS JOIN ln2
        |       WHERE abs(CAST(qy AS DOUBLE)
        |                 - (m * CAST(qx - x1 AS DOUBLE) + CAST(y1 AS DOUBLE)))
        |             <= 20000000.0
        |       GROUP BY 1, 2, 3, 4),
        |rk AS (SELECT cand, m, x1, y1, n_inliers,
        |         CAST(row_number() OVER (ORDER BY n_inliers DESC, cand ASC)
        |              AS BIGINT) AS rank
        |       FROM sc)
        |SELECT rank, CAST(cand AS BIGINT) AS cand, n_inliers, n_sample,
        | floor(m / 100.0 * 10000.0 + 0.5) / 10000.0 AS slope,
        | floor((CAST(y1 AS DOUBLE) - m * CAST(x1 AS DOUBLE)) / 100.0
        |       * 10000.0 + 0.5) / 10000.0 AS intercept,
        | floor(CAST(n_inliers AS DOUBLE) / CAST(n_sample AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS consensus
        |FROM rk CROSS JOIN ns WHERE rank <= 5 ORDER BY rank""".stripMargin,

    "q_esd_outliers" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |s1_ AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s,
        |    CAST(sum(CAST(cents AS DECIMAL(19,0)) * cents) AS DECIMAL(38,0)) AS s2
        |  FROM daily),
        |r1 AS (SELECT d, cents, n,
        |    floor(abs(CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |          / sqrt((CAST(s2 AS DOUBLE)
        |                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |                 / CAST(n - 1 AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS r_stat
        |  FROM daily CROSS JOIN s1_),
        |t1_ AS (SELECT * FROM (SELECT d, cents, n, r_stat,
        |          row_number() OVER (ORDER BY r_stat DESC, d ASC) AS rn FROM r1)
        |        WHERE rn = 1),
        |rem1 AS (SELECT daily.* FROM daily WHERE d NOT IN (SELECT d FROM t1_)),
        |s2_ AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s,
        |    CAST(sum(CAST(cents AS DECIMAL(19,0)) * cents) AS DECIMAL(38,0)) AS s2
        |  FROM rem1),
        |r2 AS (SELECT d, cents, n,
        |    floor(abs(CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |          / sqrt((CAST(s2 AS DOUBLE)
        |                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |                 / CAST(n - 1 AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS r_stat
        |  FROM rem1 CROSS JOIN s2_),
        |t2_ AS (SELECT * FROM (SELECT d, cents, n, r_stat,
        |          row_number() OVER (ORDER BY r_stat DESC, d ASC) AS rn FROM r2)
        |        WHERE rn = 1),
        |rem2 AS (SELECT rem1.* FROM rem1 WHERE d NOT IN (SELECT d FROM t2_)),
        |s3_ AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s,
        |    CAST(sum(CAST(cents AS DECIMAL(19,0)) * cents) AS DECIMAL(38,0)) AS s2
        |  FROM rem2),
        |r3 AS (SELECT d, cents, n,
        |    floor(abs(CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |          / sqrt((CAST(s2 AS DOUBLE)
        |                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |                 / CAST(n - 1 AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS r_stat
        |  FROM rem2 CROSS JOIN s3_),
        |t3_ AS (SELECT * FROM (SELECT d, cents, n, r_stat,
        |          row_number() OVER (ORDER BY r_stat DESC, d ASC) AS rn FROM r3)
        |        WHERE rn = 1),
        |u AS (SELECT CAST(1 AS BIGINT) AS round, d AS outlier_day, cents,
        |             n AS n_remaining, r_stat FROM t1_
        |      UNION ALL
        |      SELECT CAST(2 AS BIGINT), d, cents, n, r_stat FROM t2_
        |      UNION ALL
        |      SELECT CAST(3 AS BIGINT), d, cents, n, r_stat FROM t3_)
        |SELECT round, outlier_day,
        | floor(CAST(cents AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS revenue,
        | n_remaining, r_stat
        |FROM u ORDER BY round""".stripMargin,

    "q_tukey_hsd" ->
      """WITH g AS (
        |  SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS s,
        |    CAST(sum(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(38,0)) AS s2
        |  FROM (SELECT c_mktsegment,
        |          CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS x
        |        FROM orders JOIN customer ON o_custkey = c_custkey)
        |  GROUP BY 1),
        |mse AS (SELECT
        |    CAST(sum(CAST(CAST(s2 AS DOUBLE)
        |                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        |                  AS DECIMAL(38,8))) AS DOUBLE)
        |      / CAST(sum(n) - count(*) AS DOUBLE) AS mse
        |  FROM g)
        |SELECT a.seg AS seg_a, b.seg AS seg_b,
        | floor((CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
        |        - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE)) / 100.0
        |       * 10000.0 + 0.5) / 10000.0 AS mean_diff,
        | floor(abs(CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
        |           - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
        |       / sqrt(mse / 2.0 * (1.0 / CAST(a.n AS DOUBLE)
        |                           + 1.0 / CAST(b.n AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS q_stat
        |FROM g a CROSS JOIN g b CROSS JOIN mse
        |WHERE a.seg < b.seg ORDER BY seg_a, seg_b""".stripMargin,

    "q_des_forecast" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |s1 AS (SELECT d, cents, row_number() OVER (ORDER BY d ASC) AS rn,
        |    cents * 16 + lag(cents, 1) OVER (ORDER BY d ASC) * 8
        |      + lag(cents, 2) OVER (ORDER BY d ASC) * 4
        |      + lag(cents, 3) OVER (ORDER BY d ASC) * 2
        |      + lag(cents, 4) OVER (ORDER BY d ASC) * 1 AS a_num
        |  FROM daily),
        |s2 AS (SELECT d, cents, rn, a_num,
        |    a_num * 16 + lag(a_num, 1) OVER (ORDER BY d ASC) * 8
        |      + lag(a_num, 2) OVER (ORDER BY d ASC) * 4
        |      + lag(a_num, 3) OVER (ORDER BY d ASC) * 2
        |      + lag(a_num, 4) OVER (ORDER BY d ASC) * 1 AS b_num
        |  FROM s1),
        |last10 AS (SELECT * FROM (SELECT d, cents, a_num, b_num,
        |    row_number() OVER (ORDER BY d DESC) AS rk
        |  FROM s2 WHERE rn >= 9) WHERE rk <= 10)
        |SELECT d,
        | floor(CAST(cents AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0 AS revenue,
        | floor(CAST(a_num AS DOUBLE) / 31.0 / 100.0 * 10000.0 + 0.5) / 10000.0 AS s1,
        | floor(CAST(b_num AS DOUBLE) / 961.0 / 100.0 * 10000.0 + 0.5) / 10000.0 AS s2,
        | floor((2.0 * CAST(a_num AS DOUBLE) * 31.0 - CAST(b_num AS DOUBLE))
        |       / 961.0 / 100.0 * 10000.0 + 0.5) / 10000.0 AS level,
        | floor((CAST(a_num AS DOUBLE) * 31.0 - CAST(b_num AS DOUBLE))
        |       / 961.0 / 100.0 * 10000.0 + 0.5) / 10000.0 AS trend,
        | floor((93.0 * CAST(a_num AS DOUBLE) - 2.0 * CAST(b_num AS DOUBLE))
        |       / 961.0 / 100.0 * 10000.0 + 0.5) / 10000.0 AS forecast_next
        |FROM last10 ORDER BY d""".stripMargin,

    "q_periodogram" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
        |       FROM daily),
        |idx AS (SELECT row_number() OVER (ORDER BY d ASC) - 1 AS t,
        |          CAST(n * cents - s AS DECIMAL(19,0)) AS cx, n
        |        FROM daily CROSS JOIN st),
        |p_ AS (SELECT unnest(generate_series(2, 14)) AS p),
        |c AS (SELECT p, n,
        |        CAST(sum((CASE WHEN (t % p) * 2 < p THEN 1 ELSE -1 END) * cx)
        |             AS DECIMAL(38,0)) AS swc,
        |        CAST(sum(CAST(cx * cx AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS scx2
        |      FROM idx CROSS JOIN p_ GROUP BY 1, 2)
        |SELECT CAST(p AS BIGINT) AS period,
        | floor(CAST(CAST(swc * swc AS DECIMAL(38,0)) AS DOUBLE)
        |       / (CAST(scx2 AS DOUBLE) * CAST(n AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS power_share
        |FROM c ORDER BY period""".stripMargin,

    "q_ts_motif" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT row_number() OVER (ORDER BY d ASC) - 1 AS t, d,
        |               cents // 10000 AS x
        |        FROM daily),
        |vec AS (SELECT t, d, x AS x0,
        |    lead(x, 1) OVER (ORDER BY t ASC) AS x1,
        |    lead(x, 2) OVER (ORDER BY t ASC) AS x2,
        |    lead(x, 3) OVER (ORDER BY t ASC) AS x3,
        |    lead(x, 4) OVER (ORDER BY t ASC) AS x4,
        |    lead(x, 5) OVER (ORDER BY t ASC) AS x5,
        |    lead(x, 6) OVER (ORDER BY t ASC) AS x6
        |  FROM idx),
        |st AS (SELECT t, d,
        |    x0 + x1 + x2 + x3 + x4 + x5 + x6 AS sx,
        |    x0*x0 + x1*x1 + x2*x2 + x3*x3 + x4*x4 + x5*x5 + x6*x6 AS sxx,
        |    x0, x1, x2, x3, x4, x5, x6
        |  FROM vec WHERE x6 IS NOT NULL),
        |pr AS (SELECT a.t AS t1, b.t AS t2, a.d AS d1, b.d AS d2,
        |         CAST(7 * (a.x0*b.x0 + a.x1*b.x1 + a.x2*b.x2 + a.x3*b.x3
        |                   + a.x4*b.x4 + a.x5*b.x5 + a.x6*b.x6)
        |              - a.sx * b.sx AS DOUBLE)
        |         / sqrt(CAST(7 * a.sxx - a.sx * a.sx AS DOUBLE)
        |                * CAST(7 * b.sxx - b.sx * b.sx AS DOUBLE)) AS r
        |       FROM st a JOIN st b ON b.t - a.t >= 7
        |       WHERE CAST(7 * a.sxx - a.sx * a.sx AS DOUBLE) > 0
        |         AND CAST(7 * b.sxx - b.sx * b.sx AS DOUBLE) > 0),
        |sc AS (SELECT t1, t2, d1, d2,
        |         floor(r * 10000.0 + 0.5) / 10000.0 AS r,
        |         floor(14.0 * (1.0 - r) * 10000.0 + 0.5) / 10000.0 AS d2z
        |       FROM pr)
        |SELECT CAST(row_number() OVER (ORDER BY d2z ASC, t1 ASC, t2 ASC)
        |            AS BIGINT) AS rank, d1, d2, r, d2z
        |FROM sc ORDER BY d2z ASC, t1 ASC, t2 ASC LIMIT 5""".stripMargin,

    "q_ts_discord" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT row_number() OVER (ORDER BY d ASC) - 1 AS t, d,
        |               cents // 10000 AS x
        |        FROM daily),
        |vec AS (SELECT t, d, x AS x0,
        |    lead(x, 1) OVER (ORDER BY t ASC) AS x1,
        |    lead(x, 2) OVER (ORDER BY t ASC) AS x2,
        |    lead(x, 3) OVER (ORDER BY t ASC) AS x3,
        |    lead(x, 4) OVER (ORDER BY t ASC) AS x4,
        |    lead(x, 5) OVER (ORDER BY t ASC) AS x5,
        |    lead(x, 6) OVER (ORDER BY t ASC) AS x6
        |  FROM idx),
        |st AS (SELECT t, d,
        |    x0 + x1 + x2 + x3 + x4 + x5 + x6 AS sx,
        |    x0*x0 + x1*x1 + x2*x2 + x3*x3 + x4*x4 + x5*x5 + x6*x6 AS sxx,
        |    x0, x1, x2, x3, x4, x5, x6
        |  FROM vec WHERE x6 IS NOT NULL),
        |pr AS (SELECT a.t AS t1, b.t AS t2, a.d AS d1, b.d AS d2,
        |         CAST(7 * (a.x0*b.x0 + a.x1*b.x1 + a.x2*b.x2 + a.x3*b.x3
        |                   + a.x4*b.x4 + a.x5*b.x5 + a.x6*b.x6)
        |              - a.sx * b.sx AS DOUBLE)
        |         / sqrt(CAST(7 * a.sxx - a.sx * a.sx AS DOUBLE)
        |                * CAST(7 * b.sxx - b.sx * b.sx AS DOUBLE)) AS r
        |       FROM st a JOIN st b ON b.t - a.t >= 7
        |       WHERE CAST(7 * a.sxx - a.sx * a.sx AS DOUBLE) > 0
        |         AND CAST(7 * b.sxx - b.sx * b.sx AS DOUBLE) > 0),
        |sc AS (SELECT t1, t2, d1, d2,
        |         floor(14.0 * (1.0 - r) * 10000.0 + 0.5) / 10000.0 AS d2z
        |       FROM pr),
        |sym AS (SELECT t1 AS t, d1 AS d, d2 AS nn_d, d2z FROM sc
        |        UNION ALL
        |        SELECT t2 AS t, d2 AS d, d1 AS nn_d, d2z FROM sc),
        |nn AS (SELECT t, d, nn_d, d2z AS nn_d2z
        |       FROM (SELECT *, row_number() OVER (PARTITION BY t
        |               ORDER BY d2z ASC, nn_d ASC) AS rn FROM sym)
        |       WHERE rn = 1)
        |SELECT CAST(row_number() OVER (ORDER BY nn_d2z DESC, d ASC) AS BIGINT)
        |         AS rank, d, nn_d, nn_d2z
        |FROM nn ORDER BY nn_d2z DESC, d ASC LIMIT 5""".stripMargin,

    "q_bipartite_projection" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |deg AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_orders
        |        FROM op GROUP BY 1),
        |co AS (SELECT a.pk AS part_a, b.pk AS part_b,
        |         CAST(count(*) AS BIGINT) AS n_co
        |       FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY 1, 2),
        |sc AS (SELECT part_a, part_b, n_co,
        |         da.n_orders AS na, db.n_orders AS nb,
        |         floor(CAST(n_co AS DOUBLE)
        |               / sqrt(CAST(da.n_orders AS DOUBLE)
        |                      * CAST(db.n_orders AS DOUBLE))
        |               * 10000.0 + 0.5) / 10000.0 AS cosine
        |       FROM co
        |       JOIN deg da ON co.part_a = da.pk
        |       JOIN deg db ON co.part_b = db.pk)
        |SELECT part_a, part_b, n_co, na, nb, cosine,
        |       CAST(row_number() OVER (ORDER BY cosine DESC, part_a ASC,
        |                               part_b ASC) AS BIGINT) AS rank
        |FROM sc ORDER BY cosine DESC, part_a ASC, part_b ASC LIMIT 30""".stripMargin,

    "q_permutation_test" ->
      """WITH reps AS (SELECT unnest(generate_series(0, 100 - 1)) AS rep),
        |r1 AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
        |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_t,
        |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS x
        |       FROM orders
        |       WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |o1 AS (SELECT CAST(sum(is_t) AS BIGINT) AS nt, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(is_t * x) AS BIGINT) AS st,
        |         CAST(sum((1 - is_t) * x) AS BIGINT) AS sc
        |       FROM r1),
        |ob1 AS (SELECT nt, n,
        |          CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
        |          - CAST(sc AS DOUBLE) / CAST(n - nt AS DOUBLE) AS obs_diff
        |        FROM o1),
        |n1 AS (SELECT rep,
        |         CAST(sum(pt * x) AS DOUBLE) / CAST(sum(pt) AS DOUBLE)
        |         - CAST(sum((1 - pt) * x) AS DOUBLE)
        |           / CAST(sum(1 - pt) AS DOUBLE) AS d
        |       FROM (SELECT rep, x,
        |               CASE WHEN ((k % 1048576) * 489905 + rep * 40503 + 29)
        |                      % 1048576 * n < nt * 1048576
        |                    THEN 1 ELSE 0 END AS pt
        |             FROM r1 CROSS JOIN reps CROSS JOIN ob1)
        |       GROUP BY rep
        |       HAVING sum(pt) > 0 AND sum(1 - pt) > 0),
        |c1 AS (SELECT CAST(1 AS BIGINT) AS contrast_id,
        |         '1-URGENT vs 5-LOW' AS contrast, nt AS n_treat,
        |         n - nt AS n_ctrl,
        |         floor(obs_diff / 100.0 * 10000.0 + 0.5) / 10000.0 AS obs_diff,
        |         CAST(count(*) AS BIGINT) AS n_reps,
        |         CAST(sum(CASE WHEN floor(abs(d) * 10000.0 + 0.5) / 10000.0
        |                        >= floor(abs(ob1.obs_diff) * 10000.0 + 0.5) / 10000.0
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
        |       FROM n1 CROSS JOIN ob1
        |       GROUP BY nt, n, ob1.obs_diff),
        |r2 AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
        |         CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS is_t,
        |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS x
        |       FROM orders
        |       WHERE o_orderpriority IN ('2-HIGH', '3-MEDIUM')),
        |o2 AS (SELECT CAST(sum(is_t) AS BIGINT) AS nt, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(is_t * x) AS BIGINT) AS st,
        |         CAST(sum((1 - is_t) * x) AS BIGINT) AS sc
        |       FROM r2),
        |ob2 AS (SELECT nt, n,
        |          CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
        |          - CAST(sc AS DOUBLE) / CAST(n - nt AS DOUBLE) AS obs_diff
        |        FROM o2),
        |n2 AS (SELECT rep,
        |         CAST(sum(pt * x) AS DOUBLE) / CAST(sum(pt) AS DOUBLE)
        |         - CAST(sum((1 - pt) * x) AS DOUBLE)
        |           / CAST(sum(1 - pt) AS DOUBLE) AS d
        |       FROM (SELECT rep, x,
        |               CASE WHEN ((k % 1048576) * 489905 + rep * 40503 + 29)
        |                      % 1048576 * n < nt * 1048576
        |                    THEN 1 ELSE 0 END AS pt
        |             FROM r2 CROSS JOIN reps CROSS JOIN ob2)
        |       GROUP BY rep
        |       HAVING sum(pt) > 0 AND sum(1 - pt) > 0),
        |c2 AS (SELECT CAST(2 AS BIGINT) AS contrast_id,
        |         '2-HIGH vs 3-MEDIUM' AS contrast, nt AS n_treat,
        |         n - nt AS n_ctrl,
        |         floor(obs_diff / 100.0 * 10000.0 + 0.5) / 10000.0 AS obs_diff,
        |         CAST(count(*) AS BIGINT) AS n_reps,
        |         CAST(sum(CASE WHEN floor(abs(d) * 10000.0 + 0.5) / 10000.0
        |                        >= floor(abs(ob2.obs_diff) * 10000.0 + 0.5) / 10000.0
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
        |       FROM n2 CROSS JOIN ob2
        |       GROUP BY nt, n, ob2.obs_diff),
        |u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2)
        |SELECT contrast_id, contrast, n_treat, n_ctrl, obs_diff, n_reps,
        |       n_extreme,
        |       floor(CAST(n_extreme + 1 AS DOUBLE) / CAST(n_reps + 1 AS DOUBLE)
        |             * 10000.0 + 0.5) / 10000.0 AS p_value
        |FROM u ORDER BY contrast_id""".stripMargin,

    "q_overdispersion" ->
      """WITH pc AS (SELECT c.c_mktsegment AS seg, COALESCE(o.k, 0) AS k
        |  FROM customer c
        |  LEFT JOIN (SELECT o_custkey, CAST(count(*) AS BIGINT) AS k
        |             FROM orders GROUP BY 1) o
        |    ON c.c_custkey = o.o_custkey),
        |a AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(k) AS BIGINT) AS s, CAST(sum(k * k) AS BIGINT) AS s2
        |      FROM pc GROUP BY 1),
        |m AS (SELECT seg, n, s, s2,
        |        CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |        (CAST(s2 AS DOUBLE)
        |         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |        / CAST(n - 1 AS DOUBLE) AS v
        |      FROM a)
        |SELECT seg, n AS n_customers,
        | floor(mu * 10000.0 + 0.5) / 10000.0 AS mean_orders,
        | floor(v * 10000.0 + 0.5) / 10000.0 AS var_orders,
        | floor(v / mu * 10000.0 + 0.5) / 10000.0 AS dispersion,
        | CASE WHEN v > mu
        |      THEN floor(mu * mu / (v - mu) * 10000.0 + 0.5) / 10000.0 END AS nb_r,
        | CASE WHEN v > mu
        |      THEN floor(mu / v * 10000.0 + 0.5) / 10000.0 END AS nb_p
        |FROM m ORDER BY seg""".stripMargin
  )
}
