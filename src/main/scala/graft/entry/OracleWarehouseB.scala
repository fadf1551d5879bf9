package graft

import graft.operators._

/** warehouse/OLAP + analytics oracles (second half, by map order) — split verbatim out of SparkEntry.oracleSql
  * (r10 file-size refactor); the assembled map is identical.
  */
private[graft] trait OracleWarehouseB { this: SparkEntryOracleHelpers =>
  protected def oracleWarehouseB: Map[String, String] = Map(
    "q_theil" ->
      // per-customer e6-quantized Theil terms (nats) on integer
      // ratios; shares exact; between-component per nation
      """WITH cu AS (
           SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         cn AS (
           SELECT n.n_name, cu.x
           FROM cu JOIN customer c ON c.c_custkey = cu.o_custkey
                   JOIN nation n ON n.n_nationkey = c.c_nationkey
           WHERE cu.x >= 1),
         g AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_g,
                 CAST(sum(x) AS BIGINT) AS x_g
               FROM cn GROUP BY 1),
         t AS (SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(sum(x_g) AS BIGINT) AS xt FROM g),
         terms AS (
           SELECT cn.n_name, g.n_g, g.x_g, t.n, t.xt,
             CAST(floor((CAST(cn.x AS DOUBLE) / t.xt)
               * ln(CAST(cn.x AS DOUBLE) * t.n / t.xt) * 1000000 + 0.5) AS BIGINT)
               AS t_term_e6,
             CAST(floor((CAST(cn.x AS DOUBLE) / g.x_g)
               * ln(CAST(cn.x AS DOUBLE) * g.n_g / g.x_g) * 1000000 + 0.5) AS BIGINT)
               AS w_term_e6
           FROM cn JOIN g USING (n_name), t),
         bn AS (SELECT n_name, n_g, x_g, n, xt,
                  CAST(sum(t_term_e6) AS BIGINT) AS t_part_e6,
                  CAST(sum(w_term_e6) AS BIGINT) AS t_within_e6
                FROM terms GROUP BY 1, 2, 3, 4, 5),
         tt AS (SELECT CAST(sum(t_part_e6) AS BIGINT) AS t_total_e6 FROM bn)
         SELECT n_name, n_g AS n_cust, x_g AS revenue_cents,
           CAST(CAST(x_g AS HUGEINT) * 1000000 // xt AS BIGINT) AS share_e6,
           t_within_e6,
           CAST(floor((CAST(x_g AS DOUBLE) / xt)
             * ln(CAST(x_g AS DOUBLE) * n / (CAST(xt AS DOUBLE) * n_g))
             * 1000000 + 0.5) AS BIGINT) AS between_e6,
           t_total_e6
         FROM bn, tt""",
    "q_propensity_strata" ->
      // equal-width order-value strata, per-stratum arm rates,
      // common-support flag, integer-weighted ATE over supported
      """WITH tr AS (
           SELECT DISTINCT l_orderkey AS o_orderkey
           FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type LIKE 'PROMO%')),
         cu AS (
           SELECT CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS bal,
             CAST(o.o_orderstatus = 'F' AS BIGINT) AS rep,
             CASE WHEN o.o_orderkey IN (SELECT o_orderkey FROM tr) THEN 1 ELSE 0 END AS treated
           FROM orders o),
         b AS (SELECT min(bal) AS lo, max(bal) AS hi FROM cu),
         st AS (SELECT ((bal - lo) * 10) // (hi - lo + 1) AS stratum, treated, rep
                FROM cu, b),
         g AS (
           SELECT stratum,
             CAST(sum(CASE WHEN treated = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             CAST(sum(CASE WHEN treated = 1 THEN rep ELSE 0 END) AS BIGINT) AS y_t,
             CAST(sum(CASE WHEN treated = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             CAST(sum(CASE WHEN treated = 0 THEN rep ELSE 0 END) AS BIGINT) AS y_c
           FROM st GROUP BY 1),
         gg AS (
           SELECT *, CAST(n_t >= 1 AND n_c >= 1 AS BIGINT) AS in_support,
             CASE WHEN n_t > 0 THEN CAST(y_t * 1000000 // n_t AS BIGINT) ELSE NULL END
               AS rate_t_e6,
             CASE WHEN n_c > 0 THEN CAST(y_c * 1000000 // n_c AS BIGINT) ELSE NULL END
               AS rate_c_e6
           FROM g),
         g3 AS (SELECT *, CASE WHEN in_support = 1 THEN rate_t_e6 - rate_c_e6 ELSE NULL END
                  AS diff_e6
                FROM gg),
         a AS (
           SELECT CAST(sum(n_t + n_c) AS BIGINT) AS n_supported,
             CAST(sum((n_t + n_c) * diff_e6) AS BIGINT) AS wsum
           FROM g3 WHERE in_support = 1)
         SELECT stratum, n_t, y_t, n_c, y_c, in_support, rate_t_e6, rate_c_e6, diff_e6,
           n_supported,
           CAST((CASE WHEN wsum < 0 THEN -1 ELSE 1 END)
             * (abs(CAST(wsum AS HUGEINT)) // n_supported) AS BIGINT) AS ate_e6
         FROM g3, a""",
    "q_welch_t" ->
      // staged HUGEINT quotients: a_i = s_i^2/n_i in one division,
      // t^2 on the e6 grid (squared statistic, no sqrt), W-S df e3
      """WITH j AS (
           SELECT CAST(p.p_type LIKE 'PROMO%' AS BIGINT) AS t,
             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS c
           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
         m AS (
           SELECT
             CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN t = 1 THEN c ELSE 0 END) AS BIGINT) AS s1,
             sum(CASE WHEN t = 1 THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS q1,
             CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN t = 0 THEN c ELSE 0 END) AS BIGINT) AS s2,
             sum(CASE WHEN t = 0 THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS q2
           FROM j),
         aa AS (
           SELECT *,
             (CAST(n1 AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * s1)
               // (CAST(n1 AS HUGEINT) * n1 * (n1 - 1)) AS a1,
             (CAST(n2 AS HUGEINT) * q2 - CAST(s2 AS HUGEINT) * s2)
               // (CAST(n2 AS HUGEINT) * n2 * (n2 - 1)) AS a2,
             CAST((CASE WHEN CAST(s1 AS HUGEINT) * n2 - CAST(s2 AS HUGEINT) * n1 < 0
                     THEN -1 ELSE 1 END)
               * (abs(CAST(s1 AS HUGEINT) * n2 - CAST(s2 AS HUGEINT) * n1)
                  // (CAST(n1 AS HUGEINT) * n2)) AS BIGINT) AS d_cents
           FROM m)
         SELECT n1, n2, s1 // n1 AS mean1_cents, s2 // n2 AS mean2_cents, d_cents,
           CAST(a1 AS BIGINT) AS se2_1_c2, CAST(a2 AS BIGINT) AS se2_2_c2,
           CASE WHEN a1 + a2 >= 1 THEN
             CAST(CAST(d_cents AS HUGEINT) * d_cents * 1000000 // (a1 + a2) AS BIGINT)
           ELSE NULL END AS t2_e6,
           CASE WHEN a1 * a1 // (n1 - 1) + a2 * a2 // (n2 - 1) >= 1 THEN
             CAST((a1 + a2) * (a1 + a2) * 1000
               // (a1 * a1 // (n1 - 1) + a2 * a2 // (n2 - 1)) AS BIGINT)
           ELSE NULL END AS df_e3
         FROM aa""",
    "q_order_reconciliation" ->
      // header vs recomputed line totals; exact rank-defined error
      // percentiles over the per-VALUE frame
      """WITH rc AS (
           SELECT l_orderkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5)
               AS BIGINT)) AS BIGINT) AS recomputed
           FROM lineitem GROUP BY 1),
         j AS (
           SELECT o.o_orderkey,
             CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS total, rc.recomputed
           FROM orders o LEFT JOIN rc ON rc.l_orderkey = o.o_orderkey),
         summ AS (
           SELECT CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CASE WHEN recomputed IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lineless,
             CAST(sum(CASE WHEN recomputed = total THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
             CAST(sum(CASE WHEN recomputed IS NOT NULL THEN recomputed - total ELSE 0 END)
               AS BIGINT) AS net_drift_cents
           FROM j),
         errs AS (
           SELECT abs(recomputed - total) * 1000000 // total AS rel_e6
           FROM j WHERE recomputed IS NOT NULL AND total >= 1),
         bv AS (SELECT rel_e6, CAST(count(*) AS BIGINT) AS cnt FROM errs GROUP BY 1),
         cu AS (
           SELECT rel_e6, cnt,
             CAST(coalesce(sum(cnt) OVER (ORDER BY rel_e6
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) + 1
               AS first_rank
           FROM bv),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_errs FROM bv),
         tg AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100))
                  AS t(pctl, num, den)),
         rk AS (SELECT pctl, CAST((n_errs * num + den - 1) // den AS BIGINT) AS rank
                FROM tg, tot)
         SELECT rk.pctl, rk.rank, cu.rel_e6 AS rel_err_e6,
           s.n_orders, s.n_lineless, s.n_exact, s.net_drift_cents
         FROM rk
         JOIN cu ON rk.rank >= cu.first_rank AND rk.rank < cu.first_rank + cu.cnt, summ s""",
    "q_brier_decomp" ->
      // train-half bin rates as e6 forecasts; Brier/REL/RES masses
      // expanded exactly on the e12 grid, one div N each
      """WITH o AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS BIGINT) AS day,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
             CAST(o_orderstatus = 'F' AS BIGINT) AS y
           FROM orders),
         m AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM o),
         b AS (SELECT min(v) AS lo, max(v) AS hi FROM o),
         binned AS (
           SELECT ((v - lo) * 10) // (hi - lo + 1) AS bin, y,
             CASE WHEN day < mid THEN 1 ELSE 0 END AS is_train
           FROM o, m, b),
         tr AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_train,
                  CAST(sum(y) AS BIGINT) AS y_train
                FROM binned WHERE is_train = 1 GROUP BY 1),
         tr2 AS (SELECT bin, n_train,
                   CAST(y_train * 1000000 // n_train AS BIGINT) AS p_e6 FROM tr),
         te AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_b, CAST(sum(y) AS BIGINT) AS o_b
                FROM binned WHERE is_train = 0 GROUP BY 1),
         te2 AS (SELECT bin, n_b, o_b,
                   CAST(o_b * 1000000 // n_b AS BIGINT) AS obar_b_e6 FROM te),
         bb AS (SELECT te2.*, tr2.n_train, tr2.p_e6 FROM te2 JOIN tr2 USING (bin)),
         tt AS (SELECT CAST(sum(n_b) AS BIGINT) AS n_test,
                  CAST(sum(o_b) AS BIGINT) AS o_test FROM bb),
         wt AS (SELECT bb.*, n_test,
                  CAST(o_test * 1000000 // n_test AS BIGINT) AS obar_e6 FROM bb, tt),
         g AS (
           SELECT max(n_test) AS n_test, max(obar_e6) AS obar_e6,
             CAST(sum(CAST(o_b AS HUGEINT) * (1000000 - p_e6) * (1000000 - p_e6)
                  + CAST(n_b - o_b AS HUGEINT) * p_e6 * p_e6)
               // max(n_test) AS BIGINT) AS brier_e12,
             CAST(sum(CAST(n_b AS HUGEINT) * (p_e6 - obar_b_e6) * (p_e6 - obar_b_e6))
               // max(n_test) AS BIGINT) AS rel_e12,
             CAST(sum(CAST(n_b AS HUGEINT) * (obar_b_e6 - obar_e6) * (obar_b_e6 - obar_e6))
               // max(n_test) AS BIGINT) AS res_e12,
             CAST(CAST(max(obar_e6) AS HUGEINT) * (1000000 - max(obar_e6)) AS BIGINT)
               AS unc_e12
           FROM wt),
         dr AS (
           SELECT CAST(count(*) AS BIGINT) AS dropped_bins,
             CAST(coalesce(sum(n_b), 0) AS BIGINT) AS dropped_rows
           FROM te2 WHERE bin NOT IN (SELECT bin FROM tr2))
         SELECT wt.bin, wt.n_train, wt.p_e6, wt.n_b, wt.o_b, wt.obar_b_e6,
           g.n_test, g.obar_e6, g.brier_e12, g.rel_e12, g.res_e12, g.unc_e12,
           dr.dropped_bins, dr.dropped_rows
         FROM wt, g, dr""",
    "q_period_detect" ->
      // paired-series ACF per lag, sign-factored e3*e3 r^2, squared
      // white-noise band r^2*m > 4e6, (r^2 desc, lag) winner
      """WITH daily AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS BIGINT) AS d,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         lags AS (SELECT unnest(generate_series(2, 14)) AS lag),
         pairs AS (
           SELECT l.lag, a.x AS x, b.x AS y
           FROM lags l CROSS JOIN daily a JOIN daily b ON b.d = a.d + l.lag),
         pl AS (
           SELECT lag, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
           FROM pairs GROUP BY 1),
         rr AS (
           SELECT CAST(lag AS BIGINT) AS lag, m,
             CAST(m AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
             CAST(m AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den_x,
             CAST(m AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS den_y
           FROM pl),
         r2 AS (
           SELECT lag, m,
             CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
               * ((abs(num) * 1000 // den_x) * (abs(num) * 1000 // den_y)) AS BIGINT)
               AS r2_signed_e6
           FROM rr WHERE den_x > 0 AND den_y > 0),
         r3 AS (SELECT *, CAST(abs(r2_signed_e6) * m > 4000000 AS BIGINT) AS significant
                FROM r2),
         best AS (SELECT lag AS best_lag, r2_signed_e6 AS best_r2_e6
                  FROM r3 ORDER BY r2_signed_e6 DESC, lag LIMIT 1)
         SELECT r3.lag, r3.m, r3.r2_signed_e6, r3.significant, best.best_lag, best.best_r2_e6
         FROM r3, best""",
    "q_seasonal_mk" ->
      // within-season pairwise sign sweeps + per-season tie-corrected
      // var18, both summed across the 7 day-of-week seasons
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         dd AS (SELECT *, day % 7 AS season FROM daily),
         s AS (
           SELECT a.event_type,
             CAST(sum(sign(b.c - a.c)) AS BIGINT) AS s_total,
             CAST(count(*) AS BIGINT) AS n_pairs
           FROM dd a JOIN dd b
             ON a.event_type = b.event_type AND a.season = b.season AND a.day < b.day
           GROUP BY 1),
         t AS (SELECT event_type, season, c, CAST(count(*) AS BIGINT) AS t
               FROM dd GROUP BY 1, 2, 3),
         ps AS (
           SELECT event_type, season,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term,
             CAST(sum(t) AS BIGINT) AS nd
           FROM t GROUP BY 1, 2),
         ties AS (
           SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_seasons,
             CAST(sum(nd) AS BIGINT) AS n_days,
             CAST(sum(nd * (nd - 1) * (2 * nd + 5) - tie_term) AS BIGINT) AS var18_total
           FROM ps GROUP BY 1)
         SELECT s.event_type, n_days, n_seasons, n_pairs, s_total, var18_total
         FROM s JOIN ties ON s.event_type = ties.event_type""",
    "q_cramers_v" ->
      // #189's per-cell e6 chi2 summed; V^2 e12 one further quotient;
      // V e6 via the one-ulp-clamp exact isqrt
      """WITH cells AS (
           SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS o
           FROM orders GROUP BY 1, 2),
         rm AS (SELECT o_orderstatus, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
         cm AS (SELECT o_orderpriority, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
         t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                 CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_rows,
                 CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_cols
               FROM cells),
         x AS (
           SELECT n, n_rows, n_cols,
             CAST(sum((CAST(n * o - r * c AS HUGEINT) * CAST(n * o - r * c AS HUGEINT)
                       * 1000000)
                  // (CAST(n AS HUGEINT) * r * c)) AS BIGINT) AS chi2_e6
           FROM cells JOIN rm USING (o_orderstatus) JOIN cm USING (o_orderpriority), t
           GROUP BY 1, 2, 3),
         v AS (
           SELECT *, CAST(CAST(chi2_e6 AS HUGEINT) * 1000000
                  // (CAST(n AS HUGEINT) * (least(n_rows, n_cols) - 1)) AS BIGINT) AS v2_e12
           FROM x),
         sq AS (SELECT *, CAST(floor(sqrt(CAST(v2_e12 AS DOUBLE))) AS HUGEINT) AS s0 FROM v)
         SELECT n, n_rows, n_cols, chi2_e6, v2_e12,
           CAST(s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= v2_e12 THEN 1 ELSE 0 END)
                   - (CASE WHEN s0 * s0 > v2_e12 THEN 1 ELSE 0 END) AS BIGINT) AS v_e6
         FROM sq""",
    "q_odds_ratio" ->
      // 2x2 cells from the promo-order semi-join; each effect size
      // one truncating e6 HUGEINT quotient, zero margins -> NULL
      """WITH tr AS (
           SELECT DISTINCT l_orderkey AS o_orderkey
           FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type LIKE 'PROMO%')),
         j AS (
           SELECT CAST(o.o_orderstatus = 'F' AS BIGINT) AS y,
             CASE WHEN o.o_orderkey IN (SELECT o_orderkey FROM tr) THEN 1 ELSE 0 END AS t
           FROM orders o),
         m AS (
           SELECT
             CAST(sum(CASE WHEN t = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN t = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN t = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN t = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
           FROM j)
         SELECT a, b, c, d,
           CASE WHEN b > 0 AND c > 0 THEN
             CAST(CAST(a AS HUGEINT) * d * 1000000 // (CAST(b AS HUGEINT) * c) AS BIGINT)
           ELSE NULL END AS odds_ratio_e6,
           CASE WHEN a + b > 0 AND c > 0 THEN
             CAST(CAST(a AS HUGEINT) * (c + d) * 1000000
               // (CAST(c AS HUGEINT) * (a + b)) AS BIGINT)
           ELSE NULL END AS risk_ratio_e6,
           CASE WHEN a + b > 0 AND c + d > 0 THEN
             CAST(a * 1000000 // (a + b) - c * 1000000 // (c + d) AS BIGINT)
           ELSE NULL END AS risk_diff_e6
         FROM m""",
    "q_page_hinkley" ->
      // running-mean deviations, prefix-extrema closed forms, 4-sigma
      // threshold via the one-ulp-clamp exact isqrt
      """WITH byday AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
                   sum(CAST(x AS HUGEINT) * x) AS sxx FROM byday),
         vv AS (SELECT (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                   // (CAST(n AS HUGEINT) * n) AS var_c FROM tot),
         sg AS (SELECT var_c, CAST(floor(sqrt(CAST(var_c AS DOUBLE))) AS HUGEINT) AS s0
                FROM vv),
         sig AS (SELECT CAST(s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= var_c THEN 1 ELSE 0 END)
                      - (CASE WHEN s0 * s0 > var_c THEN 1 ELSE 0 END) AS BIGINT) AS sigma
                 FROM sg),
         w AS (
           SELECT d, x,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
             CAST(sum(x) OVER win AS BIGINT) AS s_pre
           FROM byday
           WINDOW win AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         w2 AS (SELECT *, x - s_pre // i AS dev FROM w),
         w3 AS (SELECT *, CAST(sum(dev) OVER win AS BIGINT) AS m FROM w2
                WINDOW win AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         w4 AS (SELECT *, CAST(min(m) OVER win AS BIGINT) AS m_min,
                  CAST(max(m) OVER win AS BIGINT) AS m_max
                FROM w3
                WINDOW win AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT d AS day, x AS cents, s_pre // i AS mean_so_far, m,
           m - m_min AS ph_plus, m_max - m AS ph_minus,
           4 * sigma AS lambda_c,
           CAST(m - m_min > 4 * sigma AS BIGINT) AS alarm_up,
           CAST(m_max - m > 4 * sigma AS BIGINT) AS alarm_down
         FROM w4, sig""",
    "q_assortment_turnover" ->
      // distinct (month, part) actives; adjacent-month equi-join
      // intersection; Jaccard one truncating e6 quotient
      """WITH mp AS (
           SELECT DISTINCT
             CAST(year(CAST(o.o_orderdate AS DATE)) * 12
                + month(CAST(o.o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
             l.l_partkey
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
         sz AS (SELECT m, CAST(count(*) AS BIGINT) AS n_active FROM mp GROUP BY 1),
         iv AS (
           SELECT a.m, CAST(count(*) AS BIGINT) AS n_common
           FROM mp a JOIN mp b ON b.m = a.m + 1 AND b.l_partkey = a.l_partkey
           GROUP BY 1)
         SELECT s.m AS month, s.m + 1 AS next_month, s.n_active,
           t.n_active AS n_next,
           coalesce(iv.n_common, 0) AS n_common,
           t.n_active - coalesce(iv.n_common, 0) AS n_added,
           s.n_active - coalesce(iv.n_common, 0) AS n_dropped,
           CAST(coalesce(iv.n_common, 0) * 1000000
             // (s.n_active + t.n_active - coalesce(iv.n_common, 0)) AS BIGINT) AS jaccard_e6
         FROM sz s JOIN sz t ON t.m = s.m + 1
         LEFT JOIN iv ON iv.m = s.m""",
    "q_supplier_hhi" ->
      // e4-truncated supplier shares squared to e8; (hhi desc, part)
      // top-25 among multi-supplier parts; sole-source set counted
      """WITH ps AS (
           SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qs
           FROM lineitem GROUP BY 1, 2),
         pp AS (
           SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(sum(qs) AS BIGINT) AS q_tot
           FROM ps GROUP BY 1),
         h AS (
           SELECT ps.l_partkey, pp.n_suppliers, pp.q_tot,
             CAST(sum((ps.qs * 10000 // pp.q_tot) * (ps.qs * 10000 // pp.q_tot)) AS BIGINT)
               AS hhi_e8
           FROM ps JOIN pp USING (l_partkey)
           WHERE pp.q_tot >= 1
           GROUP BY 1, 2, 3),
         ss AS (
           SELECT CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sole_source
           FROM h)
         SELECT h.l_partkey, h.n_suppliers, h.q_tot, h.hhi_e8, ss.n_parts, ss.n_sole_source
         FROM h, ss
         WHERE h.n_suppliers >= 2
         ORDER BY h.hhi_e8 DESC, h.l_partkey
         LIMIT 25""",
    "q_bootstrap_ci" -> bootstrapCiOracle(b = BootstrapB),
    "q_conversion_lag" ->
      // FLAT global-window replay of the hierarchical lag rank.
      """WITH fv AS (
           SELECT user_id, min(epoch_us(ts)) AS v
           FROM events WHERE event_type = 'view' GROUP BY 1),
         fp AS (
           SELECT e.user_id, fv.v, min(epoch_us(e.ts)) AS p
           FROM events e JOIN fv ON fv.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > fv.v
           GROUP BY 1, 2),
         lags AS (SELECT user_id, p - v AS lag_us FROM fp),
         r AS (
           SELECT lag_us,
             row_number() OVER (ORDER BY lag_us, user_id) AS rk
           FROM lags),
         n AS (SELECT count(*) AS n FROM lags),
         t AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10),
                                     ('p99', 99, 100)) AS v(pctl, num, den))
         SELECT t.pctl,
           CAST((n.n * t.num + t.den - 1) // t.den AS BIGINT) AS rank,
           r.lag_us, CAST(n.n AS BIGINT) AS n_converted
         FROM t, n, r
         WHERE r.rk = (n.n * t.num + t.den - 1) // t.den""",
    "q_benford" ->
      """WITH exp6(digit, expected_e6) AS (
           SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
             (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
             (9, 45757)) AS v),
         c AS (
           SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                    AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             count(*) AS n_orders
           FROM orders GROUP BY 1),
         n AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n FROM c)
         SELECT CAST(e.digit AS BIGINT) AS digit,
           CAST(coalesce(c.n_orders, 0) AS BIGINT) AS n_orders,
           CAST((coalesce(c.n_orders, 0) * 1000000) // n.n AS BIGINT)
             AS observed_e6,
           CAST(e.expected_e6 AS BIGINT) AS expected_e6,
           CAST(abs((coalesce(c.n_orders, 0) * 1000000) // n.n - e.expected_e6)
             AS BIGINT) AS abs_dev_e6
         FROM exp6 e LEFT JOIN c ON c.digit = e.digit, n""",
    "q_fifo_allocation" ->
      """WITH li AS (
           SELECT l_partkey, l_orderkey,
             CAST(l_linenumber AS BIGINT) AS l_linenumber, l_shipdate,
             CAST(l_quantity AS BIGINT) AS qty
           FROM lineitem),
         rin AS (
           SELECT l_partkey, l_orderkey AS in_order, l_linenumber AS in_line,
             sum(qty) OVER (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber) AS in_to,
             sum(qty) OVER (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber) - qty AS in_from
           FROM li WHERE l_orderkey % 2 = 0),
         rout AS (
           SELECT l_partkey, l_orderkey AS out_order, l_linenumber AS out_line,
             sum(qty) OVER (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber) AS out_to,
             sum(qty) OVER (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber) - qty AS out_from
           FROM li WHERE l_orderkey % 2 = 1)
         SELECT i.l_partkey, i.in_order, i.in_line, o.out_order, o.out_line,
           CAST(least(i.in_to, o.out_to) - greatest(i.in_from, o.out_from)
             AS BIGINT) AS qty_matched
         FROM rin i JOIN rout o ON o.l_partkey = i.l_partkey
           AND i.in_from < o.out_to AND o.out_from < i.in_to""",
    "q_eventually_follows" ->
      """WITH spans AS (
           SELECT user_id, event_type,
             min(epoch_us(ts)) AS first_ts, max(epoch_us(ts)) AS last_ts
           FROM events GROUP BY 1, 2)
         SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_users_both,
           CAST(sum(CASE WHEN a.first_ts < b.last_ts THEN 1 ELSE 0 END)
             AS BIGINT) AS n_follows,
           CAST((sum(CASE WHEN a.first_ts < b.last_ts THEN 1 ELSE 0 END)
             * 1000000) // count(*) AS BIGINT) AS follow_rate_e6
         FROM spans a JOIN spans b
           ON a.user_id = b.user_id AND a.event_type != b.event_type
         GROUP BY 1, 2""",
    "q_ltv_curve" ->
      """WITH o AS (
           SELECT o_custkey,
             year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           FROM orders),
         f AS (SELECT o_custkey, min(m) AS cohort_m FROM o GROUP BY 1),
         aged AS (
           SELECT f.cohort_m, o.m - f.cohort_m AS age_months,
             o.o_custkey, o.cents
           FROM o JOIN f ON f.o_custkey = o.o_custkey),
         cells AS (
           SELECT cohort_m, age_months,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_active,
             CAST(sum(cents) AS BIGINT) AS rev_cents
           FROM aged GROUP BY 1, 2)
         SELECT CAST(cohort_m AS BIGINT) AS cohort_m,
           CAST(age_months AS BIGINT) AS age_months, n_active, rev_cents,
           CAST(sum(rev_cents) OVER (PARTITION BY cohort_m ORDER BY age_months)
             AS BIGINT) AS cum_rev_cents
         FROM cells""",
    "q_quantile_norm" ->
      // FLAT global-window replay of the hierarchical global rank —
      // the hash-MATCH proves the shard decomposition (#191 pattern).
      """WITH d AS (SELECT doc_id, source, n_chars AS len FROM documents),
         g AS (SELECT len AS g_len,
                 row_number() OVER (ORDER BY len, doc_id) AS grank
               FROM d),
         t AS (SELECT count(*) AS n FROM d),
         s AS (SELECT doc_id, source, len,
                 row_number() OVER (PARTITION BY source ORDER BY len, doc_id)
                   AS srank,
                 count(*) OVER (PARTITION BY source) AS n_s
               FROM d)
         SELECT s.doc_id, s.source, s.len, g.g_len AS norm_len
         FROM s, t, g
         WHERE g.grank = (s.srank * t.n + s.n_s - 1) // s.n_s""",
    "q_seasonal_decomp" ->
      s"""$seasonalKernelSql
         SELECT k.event_type, CAST(k.day AS BIGINT) AS day,
           CAST(k.dow AS BIGINT) AS dow, k.c AS cents,
           CAST(k.trend AS BIGINT) AS trend_cents,
           CAST(sc.seasonal AS BIGINT) AS seasonal_cents,
           CAST(k.det - sc.seasonal AS BIGINT) AS remainder_cents
         FROM kept k JOIN sc ON sc.event_type = k.event_type AND sc.dow = k.dow""",
    "q_anomaly_flags" ->
      // seasonal-remainder MAD flags: lower discrete medians via
      // row_number at rank (n+1)//2 under the (value, day) total
      // order — zero interpolation; 3×MAD threshold, strict >
      s"""$seasonalKernelSql,
         rem AS (
           SELECT k.event_type, k.day, CAST(k.det - sc.seasonal AS BIGINT) AS rem
           FROM kept k JOIN sc ON sc.event_type = k.event_type AND sc.dow = k.dow),
         medr AS (
           SELECT event_type, rem AS med FROM (
             SELECT event_type, rem, day,
               row_number() OVER (PARTITION BY event_type ORDER BY rem, day) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
             FROM rem)
           WHERE rn = (n + 1) // 2),
         dev AS (
           SELECT r.event_type, r.day, r.rem, m.med, abs(r.rem - m.med) AS adev
           FROM rem r JOIN medr m ON m.event_type = r.event_type),
         madr AS (
           SELECT event_type, adev AS mad FROM (
             SELECT event_type, adev, day,
               row_number() OVER (PARTITION BY event_type ORDER BY adev, day) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
             FROM dev)
           WHERE rn = (n + 1) // 2)
         SELECT d.event_type, CAST(d.day AS BIGINT) AS day, d.rem AS remainder_cents,
           d.med AS med_cents, m.mad AS mad_cents,
           CAST(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
         FROM dev d JOIN madr m ON m.event_type = d.event_type""",
    "q_interval_union" ->
      // gaps-and-islands sweep replayed with the same per-supplier
      // windows; endpoints least/greatest-normalized (the synthetic
      // corpus ships some lines before the order date)
      """WITH iv AS (
           SELECT l_suppkey, l_orderkey, l_linenumber,
             least(epoch_us(o_orderdate), epoch_us(l_shipdate)) // 86400000000 AS s,
             greatest(epoch_us(o_orderdate), epoch_us(l_shipdate)) // 86400000000 AS e
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         w AS (
           SELECT *, max(e) OVER (PARTITION BY l_suppkey
               ORDER BY s, e, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e
           FROM iv),
         flg AS (
           SELECT *, CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                          THEN 1 ELSE 0 END AS is_new
           FROM w),
         isl AS (
           SELECT *, sum(is_new) OVER (PARTITION BY l_suppkey
               ORDER BY s, e, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
           FROM flg),
         mi AS (SELECT l_suppkey, island, min(s) AS is_, max(e) AS ie
                FROM isl GROUP BY 1, 2)
         SELECT l_suppkey AS suppkey,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(ie - is_ + 1) AS BIGINT) AS covered_days,
           min(is_) AS first_day, max(ie) AS last_day
         FROM mi GROUP BY 1""",
    "q_auc" ->
      // per-distinct-score counts + global negatives-below prefix;
      // 2U keeps the half-tie term integer; HUGEINT quotient
      """WITH s AS (
           SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
           FROM orders),
         bv AS (
           SELECT v, CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(count(*) - sum(pos) AS BIGINT) AS n_neg
           FROM s GROUP BY v),
         cum AS (
           SELECT v, n_pos, n_neg,
             CAST(coalesce(sum(n_neg) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cnb
           FROM bv),
         agg AS (
           SELECT CAST(sum(n_pos) AS BIGINT) AS n1, CAST(sum(n_neg) AS BIGINT) AS n0,
             sum(CAST(n_pos AS HUGEINT) * (2 * cnb + n_neg)) AS u2,
             CAST(sum(CASE WHEN n_pos > 0 AND n_neg > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nt
           FROM cum)
         SELECT n1 AS n_pos, n0 AS n_neg, nt AS n_tied_scores,
           CAST((u2 * 1000000) // (2 * CAST(n1 AS HUGEINT) * n0) AS BIGINT) AS auc_e6
         FROM agg""",
    "q_calibration" ->
      // equal-width cents bins via min/max scalars; e6 rate and floor
      // mean quotients — nonneg, // ≡ div
      """WITH s AS (
           SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
           FROM orders),
         b AS (SELECT min(v) AS lo, max(v) AS hi FROM s),
         binned AS (SELECT ((v - lo) * 10) // (hi - lo + 1) AS bin, v, pos FROM s, b),
         agg AS (
           SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS n_pos, CAST(sum(v) AS BIGINT) AS sv
           FROM binned GROUP BY bin)
         SELECT bin, n, n_pos,
           CAST(n_pos * 1000000 // n AS BIGINT) AS pos_rate_e6,
           CAST(sv // n AS BIGINT) AS mean_cents
         FROM agg""",
    "q_kaplan_meier" ->
      // identical integer survival trajectory replayed as a recursive
      // CTE: S_t = S_{t-1} * (n_t - d_t) // n_t from S = 1e6; censor
      // horizon interpolated from the same KmCensorMonths constant
      s"""WITH bycust AS (
           SELECT o_custkey,
             min(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS m0,
             max(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS m1
           FROM orders GROUP BY o_custkey),
         mm AS (SELECT max(m1) AS mmax FROM bycust),
         lifes AS (
           SELECT CAST(m1 - m0 AS BIGINT) AS t,
             CASE WHEN m1 < mmax - $KmCensorMonths THEN 1 ELSE 0 END AS death
           FROM bycust, mm),
         byt AS (SELECT t, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(death) AS BIGINT) AS d
                 FROM lifes GROUP BY t),
         risk AS (
           SELECT t, d,
             CAST(sum(cnt) OVER (ORDER BY t
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n,
             CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i
           FROM byt),
         km AS (
           WITH RECURSIVE rec(i, t, n, d, surv) AS (
             SELECT i, t, n, d, CAST(1000000 * (n - d) // n AS BIGINT)
             FROM risk WHERE i = 1
             UNION ALL
             SELECT s.i, s.t, s.n, s.d, CAST(k.surv * (s.n - s.d) // s.n AS BIGINT)
             FROM risk s JOIN rec k ON s.i = k.i + 1)
           SELECT * FROM rec)
         SELECT t, n AS n_risk, d, surv AS surv_e6 FROM km""",
    "q_sax_motifs" ->
      // quartile symbols under the (value, day) total order; 3-day
      // contiguous words; top-1 per series with (count, word) tiebreak
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         sym AS (
           SELECT event_type, day,
             CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY c, day) AS BIGINT) AS s
           FROM daily),
         ld AS (
           SELECT event_type, day, s,
             lead(s, 1) OVER w AS s2, lead(s, 2) OVER w AS s3,
             lead(day, 1) OVER w AS d2, lead(day, 2) OVER w AS d3
           FROM sym WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         words AS (
           SELECT event_type, s * 100 + s2 * 10 + s3 AS word
           FROM ld
           WHERE s3 IS NOT NULL AND d2 = day + 1 AND d3 = day + 2),
         counts AS (
           SELECT event_type, word, CAST(count(*) AS BIGINT) AS n_occurrences
           FROM words GROUP BY 1, 2),
         totals AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_words FROM words GROUP BY 1),
         ranked AS (
           SELECT event_type, word, n_occurrences,
             row_number() OVER (PARTITION BY event_type
               ORDER BY n_occurrences DESC, word) AS rk
           FROM counts)
         SELECT r.event_type, r.word AS motif, r.n_occurrences, t.n_words
         FROM ranked r JOIN totals t ON t.event_type = r.event_type
         WHERE r.rk = 1""",
    "q_funnel_windowed" -> {
      // greedy earliest-chain with step windows (µs) interpolated
      // from the same FunnelWindowDays constant as the Spark call
      val usW = FunnelWindowDays * 86400000000L
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS ts, event_type FROM events),
         signup AS (SELECT user_id, min(ts) AS signup_ts FROM ev
                    WHERE event_type = 'signup' GROUP BY user_id),
         engaged AS (
           SELECT e.user_id, min(e.ts) AS engage_ts
           FROM ev e JOIN signup s ON s.user_id = e.user_id
           WHERE e.event_type IN ('click', 'view')
             AND e.ts > s.signup_ts AND e.ts <= s.signup_ts + $usW
           GROUP BY e.user_id),
         converted AS (
           SELECT e.user_id, min(e.ts) AS convert_ts
           FROM ev e JOIN engaged g ON g.user_id = e.user_id
           WHERE e.event_type = 'purchase'
             AND e.ts > g.engage_ts AND e.ts <= g.engage_ts + $usW
           GROUP BY e.user_id)
         SELECT
           (SELECT CAST(count(*) AS BIGINT) FROM signup) AS n_signup,
           (SELECT CAST(count(*) AS BIGINT) FROM engaged) AS n_engaged_7d,
           (SELECT CAST(count(*) AS BIGINT) FROM converted) AS n_converted_7d"""
    },
    "q_crosscorr" ->
      // off-diagonal lagged Pearson family; same HUGEINT moment and
      // factored-r2 discipline as q_autocorr
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(0, 3)),
         p AS (
           SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
             a.c AS x, b.c AS y
           FROM daily a
           CROSS JOIN lags l
           JOIN daily b ON a.event_type < b.event_type AND b.day = a.day + l.lag),
         agg AS (
           SELECT type_a, type_b, lag, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
           FROM p GROUP BY 1, 2, 3)
         SELECT type_a, type_b, lag, m,
           CAST(CAST(m AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS BIGINT) AS num,
           CAST(CAST(m AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS BIGINT) AS den_x,
           CAST(CAST(m AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS BIGINT) AS den_y,
           CAST((CASE WHEN m * sxy - sx * sy < 0 THEN -1 ELSE 1 END) *
             ((abs(CAST(m * sxy - sx * sy AS HUGEINT)) * 1000
               // CAST(m * sxx - sx * sx AS HUGEINT))
              * (abs(CAST(m * sxy - sx * sy AS HUGEINT)) * 1000
                 // CAST(m * syy - sy * sy AS HUGEINT)))
             AS BIGINT) AS r2_signed_e6
         FROM agg""",
    "q_autocorr" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         p AS (
           SELECT a.event_type, a.c AS x, b.c AS y
           FROM daily a
           JOIN daily b ON b.event_type = a.event_type AND b.day = a.day + 1),
         agg AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
           FROM p GROUP BY 1)
         SELECT event_type, m,
           CAST(CAST(m AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS BIGINT) AS num,
           CAST(CAST(m AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS BIGINT) AS den_x,
           CAST(CAST(m AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS BIGINT) AS den_y,
           CAST((CASE WHEN m * sxy - sx * sy < 0 THEN -1 ELSE 1 END) *
             ((abs(CAST(m * sxy - sx * sy AS HUGEINT)) * 1000
               // CAST(m * sxx - sx * sx AS HUGEINT))
              * (abs(CAST(m * sxy - sx * sy AS HUGEINT)) * 1000
                 // CAST(m * syy - sy * sy AS HUGEINT)))
             AS BIGINT) AS r2_signed_e6
         FROM agg""",
    "q_clustering_coeff" ->
      // #176's degree-oriented replay + a 3-way corner explode of the
      // closed-wedge frame; lcc = 2*tri*1e6 div (deg*(deg-1)), 0 at
      // deg < 2; nodes in no triangle kept via left join
      """WITH bp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n
           FROM bp a JOIN bp b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2),
         e AS (SELECT pa, pb FROM pr WHERE n >= 2),
         d AS (
           SELECT node, count(*) AS deg
           FROM (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
           GROUP BY 1),
         oe AS (
           SELECT CASE WHEN (da.deg, pa) < (db.deg, pb) THEN pa ELSE pb END AS u,
                  CASE WHEN (da.deg, pa) < (db.deg, pb) THEN pb ELSE pa END AS v,
                  CASE WHEN (da.deg, pa) < (db.deg, pb) THEN db.deg ELSE da.deg END AS dv
           FROM e JOIN d da ON da.node = e.pa JOIN d db ON db.node = e.pb),
         w AS (
           SELECT a.u,
                  CASE WHEN (a.dv, a.v) < (b.dv, b.v) THEN a.v ELSE b.v END AS lo,
                  CASE WHEN (a.dv, a.v) < (b.dv, b.v) THEN b.v ELSE a.v END AS hi
           FROM oe a JOIN oe b ON a.u = b.u AND a.v < b.v),
         tri AS (
           SELECT u, lo, hi FROM w
           WHERE EXISTS (SELECT 1 FROM oe WHERE oe.u = w.lo AND oe.v = w.hi)),
         corners AS (
           SELECT u AS node FROM tri
           UNION ALL SELECT lo FROM tri
           UNION ALL SELECT hi FROM tri),
         pn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM corners GROUP BY 1)
         SELECT d.node, CAST(d.deg AS BIGINT) AS deg,
           coalesce(pn.n_tri, 0) AS n_tri,
           CASE WHEN d.deg < 2 THEN 0
                ELSE CAST((2 * coalesce(pn.n_tri, 0) * 1000000)
                     // (d.deg * (d.deg - 1)) AS BIGINT) END AS lcc_e6
         FROM d LEFT JOIN pn ON pn.node = d.node""",
    "q_growth_accounting" ->
      // per-user lag over distinct activity days; churned(d) =
      // active(d-1) - retained(d) via a day -> day-1 self-join
      """WITH ud AS (
           SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
           FROM events),
         f AS (
           SELECT day,
             CASE WHEN lag(day) OVER (PARTITION BY user_id ORDER BY day) IS NULL
                  THEN 1 ELSE 0 END AS is_new,
             CASE WHEN lag(day) OVER (PARTITION BY user_id ORDER BY day) = day - 1
                  THEN 1 ELSE 0 END AS is_retained,
             CASE WHEN lag(day) OVER (PARTITION BY user_id ORDER BY day) < day - 1
                  THEN 1 ELSE 0 END AS is_resurrected
           FROM ud),
         daily AS (
           SELECT day, CAST(count(*) AS BIGINT) AS active,
             CAST(sum(is_new) AS BIGINT) AS new_users,
             CAST(sum(is_retained) AS BIGINT) AS retained,
             CAST(sum(is_resurrected) AS BIGINT) AS resurrected
           FROM f GROUP BY 1)
         SELECT d.day, d.active, d.new_users, d.retained, d.resurrected,
           CAST(coalesce(p.active, 0) - d.retained AS BIGINT) AS churned
         FROM daily d LEFT JOIN daily p ON p.day = d.day - 1""",
    "q_pr_curve" ->
      // distinct-score grid with prefix sums; a threshold row is the
      // first rank of its equi-depth bin; tp = tot_pos - pos_below
      // since predicted-positive means v >= threshold; bin count
      // interpolated from the shared PrCurveBins constant
      s"""WITH s AS (
           SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
           FROM orders),
         bv AS (
           SELECT v, CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(count(*) - sum(pos) AS BIGINT) AS n_neg
           FROM s GROUP BY v),
         tot AS (
           SELECT CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(n_pos) AS BIGINT) AS tot_pos,
             CAST(sum(n_neg) AS BIGINT) AS tot_neg
           FROM bv),
         r AS (
           SELECT v, n_pos, n_neg,
             CAST(row_number() OVER (ORDER BY v) AS BIGINT) AS rank,
             CAST(coalesce(sum(n_pos) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS pos_below,
             CAST(coalesce(sum(n_neg) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS neg_below
           FROM bv)
         SELECT ((rank - 1) * $PrCurveBins) // nd AS bin, v AS threshold_cents,
           tot_pos - pos_below AS tp, tot_neg - neg_below AS fp,
           pos_below AS fn,
           CAST((tot_pos - pos_below) * 1000000
             // greatest(tot_pos - pos_below + tot_neg - neg_below, 1) AS BIGINT)
             AS precision_e6,
           CAST((tot_pos - pos_below) * 1000000 // greatest(tot_pos, 1) AS BIGINT)
             AS recall_e6,
           CAST((2 * ((tot_pos - pos_below) * 1000000
                 // greatest(tot_pos - pos_below + tot_neg - neg_below, 1))
               * ((tot_pos - pos_below) * 1000000 // greatest(tot_pos, 1)))
             // greatest(((tot_pos - pos_below) * 1000000
                 // greatest(tot_pos - pos_below + tot_neg - neg_below, 1))
               + ((tot_pos - pos_below) * 1000000 // greatest(tot_pos, 1)), 1) AS BIGINT)
             AS f1_e6
         FROM r, tot
         WHERE rank = 1 OR ((rank - 1) * $PrCurveBins) // nd > ((rank - 2) * $PrCurveBins) // nd""",
    "q_mann_kendall" ->
      // calendar-bounded pairwise sign sweep per type + tie-corrected
      // variance numerator var18 = n(n-1)(2n+5) - sum t(t-1)(2t+5)
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         s AS (
           SELECT a.event_type,
             CAST(sum(sign(b.c - a.c)) AS BIGINT) AS s_stat,
             CAST(count(*) AS BIGINT) AS n_pairs
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND a.day < b.day
           GROUP BY 1),
         t AS (
           SELECT event_type, c, count(*) AS t FROM daily GROUP BY 1, 2),
         ties AS (
           SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term,
             CAST(sum(t) AS BIGINT) AS n_days
           FROM t GROUP BY 1)
         SELECT s.event_type, n_days, n_pairs, s_stat, n_distinct,
           CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS BIGINT) AS var18
         FROM s JOIN ties ON s.event_type = ties.event_type""",
    "q_spearman" ->
      // doubled tie-average ranks rank2 = 2*below + cnt + 1 on each
      // variable's distinct grid; HUGEINT moments; factored e3*e3
      // signed rho^2 (the #202 discipline)
      """WITH base AS (
           SELECT c.c_custkey,
             CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS x,
             CAST(coalesce(o.y, 0) AS BIGINT) AS y
           FROM customer c LEFT JOIN (
             SELECT o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
             FROM orders GROUP BY 1) o ON o.o_custkey = c.c_custkey),
         rx AS (
           SELECT v, 2 * (CAST(coalesce(sum(cnt) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT))
             + cnt + 1 AS rank2
           FROM (SELECT x AS v, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY 1)),
         ry AS (
           SELECT v, 2 * (CAST(coalesce(sum(cnt) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT))
             + cnt + 1 AS rank2
           FROM (SELECT y AS v, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY 1)),
         ranked AS (
           SELECT rx.rank2 AS r2x, ry.rank2 AS r2y
           FROM base JOIN rx ON rx.v = base.x JOIN ry ON ry.v = base.y),
         agg AS (
           SELECT CAST(count(*) AS HUGEINT) AS m,
             CAST(sum(r2x) AS HUGEINT) AS sx, CAST(sum(r2y) AS HUGEINT) AS sy,
             sum(CAST(r2x AS HUGEINT) * r2y) AS sxy,
             sum(CAST(r2x AS HUGEINT) * r2x) AS sxx,
             sum(CAST(r2y AS HUGEINT) * r2y) AS syy
           FROM ranked),
         mom AS (
           SELECT CAST(m AS BIGINT) AS n_customers,
             m * sxy - sx * sy AS num,
             m * sxx - sx * sx AS den_x,
             m * syy - sy * sy AS den_y
           FROM agg)
         SELECT n_customers,
           CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END) *
             ((abs(num) * 1000 // den_x) * (abs(num) * 1000 // den_y)) AS BIGINT)
             AS rho2_signed_e6
         FROM mom""",
    "q_hhi" ->
      // single-quotient HHI: (sum rev_i^2)*1e6 // (sum rev_i)^2 in
      // HUGEINT - shares never materialized, no per-supplier rounding
      """WITH bysupp AS (
           SELECT l_suppkey,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev
           FROM lineitem GROUP BY 1),
         bynat AS (
           SELECT s.s_nationkey,
             CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(sum(rev) AS BIGINT) AS total_cents,
             sum(CAST(rev AS HUGEINT) * rev) AS sq,
             CAST(max(rev) AS BIGINT) AS max_rev
           FROM bysupp b JOIN supplier s ON s.s_suppkey = b.l_suppkey
           GROUP BY 1)
         SELECT CAST(b.s_nationkey AS BIGINT) AS nationkey, n.n_name,
           n_suppliers, total_cents,
           CAST((sq * 1000000) // (CAST(total_cents AS HUGEINT) * total_cents)
             AS BIGINT) AS hhi_e6,
           CAST((max_rev * 1000000) // total_cents AS BIGINT) AS cr1_e6
         FROM bynat b JOIN nation n ON n.n_nationkey = b.s_nationkey""",
    "q_mix_shift" ->
      // Laspeyres-mix / current-weight-rate split on the e4 grid;
      // sign-factored single divisions of DECIMAL(38)/HUGEINT products
      """WITH cm AS (
           SELECT c.c_mktsegment AS segment,
             CAST(year(CAST(o.o_orderdate AS DATE)) * 12
                  + month(CAST(o.o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS s
           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
           GROUP BY 1, 2),
         tot AS (SELECT m, CAST(sum(n) AS BIGINT) AS nt,
                   CAST(sum(s) AS BIGINT) AS st
                 FROM cm GROUP BY 1),
         valid AS (SELECT m FROM tot WHERE m + 1 IN (SELECT m FROM tot)),
         j AS (
           SELECT coalesce(c0.m, n1.m) AS m, coalesce(c0.segment, n1.segment) AS segment,
             coalesce(c0.n, 0) AS n0, coalesce(c0.s, 0) AS s0,
             coalesce(n1.n1, 0) AS n1, coalesce(n1.s1, 0) AS s1
           FROM cm c0
           FULL OUTER JOIN (SELECT segment, m - 1 AS m, n AS n1, s AS s1 FROM cm) n1
             ON n1.segment = c0.segment AND n1.m = c0.m),
         e AS (
           SELECT j.m, j.segment, j.n0, j.n1, j.s0, j.s1,
             t0.nt AS nt0, t1.nt AS nt1
           FROM j
           JOIN tot t0 ON t0.m = j.m
           JOIN tot t1 ON t1.m = j.m + 1
           WHERE j.m IN (SELECT m FROM valid))
         SELECT m, segment, n0, n1, s0 AS s0_c, s1 AS s1_c,
           CASE WHEN n0 > 0 AND n1 > 0 THEN 'both'
                WHEN n0 = 0 THEN 'new' ELSE 'gone' END AS status,
           CASE WHEN n0 > 0 AND n1 > 0 THEN
             CAST((CASE WHEN (CAST(n1 AS HUGEINT) * nt0 - CAST(n0 AS HUGEINT) * nt1) * s0 < 0
                   THEN -1 ELSE 1 END)
                * (abs((CAST(n1 AS HUGEINT) * nt0 - CAST(n0 AS HUGEINT) * nt1) * s0) * 10000
                   // (CAST(nt0 AS HUGEINT) * nt1 * n0)) AS BIGINT)
           END AS mix_e4,
           CASE WHEN n0 > 0 AND n1 > 0 THEN
             CAST((CASE WHEN CAST(s1 AS HUGEINT) * n0 - CAST(s0 AS HUGEINT) * n1 < 0
                   THEN -1 ELSE 1 END)
                * (abs(CAST(s1 AS HUGEINT) * n0 - CAST(s0 AS HUGEINT) * n1) * 10000
                   // (CAST(nt1 AS HUGEINT) * n0)) AS BIGINT)
           END AS rate_e4,
           CAST((CASE WHEN CAST(s1 AS HUGEINT) * nt0 - CAST(s0 AS HUGEINT) * nt1 < 0
                 THEN -1 ELSE 1 END)
              * (abs(CAST(s1 AS HUGEINT) * nt0 - CAST(s0 AS HUGEINT) * nt1) * 10000
                 // (CAST(nt0 AS HUGEINT) * nt1)) AS BIGINT) AS dcontrib_e4,
           CASE WHEN n0 > 0 AND n1 > 0 THEN
             CAST((CASE WHEN CAST(s1 AS HUGEINT) * nt0 - CAST(s0 AS HUGEINT) * nt1 < 0
                   THEN -1 ELSE 1 END)
                * (abs(CAST(s1 AS HUGEINT) * nt0 - CAST(s0 AS HUGEINT) * nt1) * 10000
                   // (CAST(nt0 AS HUGEINT) * nt1))
              - (CASE WHEN (CAST(n1 AS HUGEINT) * nt0 - CAST(n0 AS HUGEINT) * nt1) * s0 < 0
                   THEN -1 ELSE 1 END)
                * (abs((CAST(n1 AS HUGEINT) * nt0 - CAST(n0 AS HUGEINT) * nt1) * s0) * 10000
                   // (CAST(nt0 AS HUGEINT) * nt1 * n0))
              - (CASE WHEN CAST(s1 AS HUGEINT) * n0 - CAST(s0 AS HUGEINT) * n1 < 0
                   THEN -1 ELSE 1 END)
                * (abs(CAST(s1 AS HUGEINT) * n0 - CAST(s0 AS HUGEINT) * n1) * 10000
                   // (CAST(nt1 AS HUGEINT) * n0)) AS BIGINT)
           END AS resid_e4
         FROM e""",
    "q_holt" ->
      // identical sign-factored dyadic trajectory as a recursive CTE
      // (shared holtCtes helper)
      s"""WITH ${holtCtes}
         SELECT event_type, day, y AS cents, l AS level_c, b AS trend_c,
           l + b AS forecast_next_c
         FROM rec""",
    "q_top_paths" ->
      // #16's sessionization + first-3 rank filter + path assembly +
      // alphabet-bounded top-10 with (count desc, path) tiebreak
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS ts, event_id, event_type
           FROM events),
         gaps AS (
           SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > 30 * 60 * 1000 * 1000
                     THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sess AS (
           SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
           FROM gaps),
         steps AS (
           SELECT user_id, session_id, event_type,
             row_number() OVER (PARTITION BY user_id, session_id
               ORDER BY ts, event_id) AS step
           FROM sess QUALIFY step <= 3),
         paths AS (
           SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY step) AS path,
             CAST(count(*) AS BIGINT) AS n_steps
           FROM steps GROUP BY 1, 2),
         counts AS (
           SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
             min(n_steps) AS n_steps
           FROM paths GROUP BY 1)
         SELECT path, n_sessions, n_steps,
           CAST(row_number() OVER (ORDER BY n_sessions DESC, path) AS BIGINT) AS rank
         FROM counts QUALIFY rank <= 10""",
    "q_ab_test" ->
      // the staged-quotient two-proportion z^2 replayed verbatim:
      // q1 = d^2 // (n1 n2), then q1 * N * 1e6 // (C (N - C))
      """WITH j AS (
           SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS arm_a,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS conv
           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
         arms AS (
           SELECT arm_a, CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS c
           FROM j GROUP BY 1),
         w AS (
           SELECT max(CASE WHEN arm_a = 1 THEN n END) AS n1,
             max(CASE WHEN arm_a = 1 THEN c END) AS c1,
             max(CASE WHEN arm_a = 0 THEN n END) AS n2,
             max(CASE WHEN arm_a = 0 THEN c END) AS c2
           FROM arms)
         SELECT n1, c1, n2, c2,
           CAST(c1 * 1000000 // n1 AS BIGINT) AS rate_a_e6,
           CAST(c2 * 1000000 // n2 AS BIGINT) AS rate_b_e6,
           CAST(CASE WHEN c1 * n2 - c2 * n1 < 0 THEN -1 ELSE 1 END AS BIGINT) AS direction,
           CAST(((CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1)
               * (CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1)
               // (CAST(n1 AS HUGEINT) * n2))
               * (n1 + n2) * 1000000
             // (CAST(c1 + c2 AS HUGEINT) * (n1 + n2 - c1 - c2)) AS BIGINT) AS z2_e6
         FROM w""",
    "q_markov_stationary" ->
      // #174's counts + 3 unrolled power-iteration rounds on the e6
      // grid; zero-mass states kept by the left join each round
      """WITH seq AS (
           SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events),
         t AS (
           SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
           FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
         ft AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM t GROUP BY 1),
         st AS (SELECT DISTINCT state FROM
                (SELECT from_type AS state FROM t UNION ALL SELECT to_type FROM t)),
         kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM st),
         p0 AS (SELECT state, CAST(1000000 // k AS BIGINT) AS pi FROM st, kk),
         p1 AS (
           SELECT st.state, CAST(coalesce(x.p, 0) AS BIGINT) AS pi
           FROM st LEFT JOIN (
             SELECT t.to_type AS state, sum(p0.pi * t.n // ft.n_from) AS p
             FROM t JOIN ft USING (from_type) JOIN p0 ON p0.state = t.from_type
             GROUP BY 1) x USING (state)),
         p2 AS (
           SELECT st.state, CAST(coalesce(x.p, 0) AS BIGINT) AS pi
           FROM st LEFT JOIN (
             SELECT t.to_type AS state, sum(p1.pi * t.n // ft.n_from) AS p
             FROM t JOIN ft USING (from_type) JOIN p1 ON p1.state = t.from_type
             GROUP BY 1) x USING (state)),
         p3 AS (
           SELECT st.state, CAST(coalesce(x.p, 0) AS BIGINT) AS pi
           FROM st LEFT JOIN (
             SELECT t.to_type AS state, sum(p2.pi * t.n // ft.n_from) AS p
             FROM t JOIN ft USING (from_type) JOIN p2 ON p2.state = t.from_type
             GROUP BY 1) x USING (state))
         SELECT state, pi AS pi_e6 FROM p3""",
    "q_control_chart" ->
      // squared 3-sigma inequality on the integer grid - no sqrt:
      // flag iff (c_d*T - C*n_d)^2 > 9*C*(T-C)*n_d
      """WITH byday AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS n_d,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c_d
           FROM orders GROUP BY 1),
         tot AS (SELECT CAST(sum(n_d) AS BIGINT) AS t, CAST(sum(c_d) AS BIGINT) AS ctot
                 FROM byday)
         SELECT day, n_d, c_d,
           CAST(c_d * 1000000 // n_d AS BIGINT) AS rate_e6,
           CAST((CAST(c_d AS HUGEINT) * t - CAST(ctot AS HUGEINT) * n_d)
                  * (CAST(c_d AS HUGEINT) * t - CAST(ctot AS HUGEINT) * n_d)
                > 9 * CAST(ctot AS HUGEINT) * (t - ctot) * n_d AS BIGINT)
             AS out_of_control,
           CAST((CAST(c_d AS HUGEINT) * t - CAST(ctot AS HUGEINT) * n_d)
                  * (CAST(c_d AS HUGEINT) * t - CAST(ctot AS HUGEINT) * n_d) * 1000000
                // (9 * CAST(ctot AS HUGEINT) * (t - ctot) * n_d) AS BIGINT)
             AS dev_ratio_e6
         FROM byday, tot""",
    "q_safety_stock" ->
      // weekly-demand moments + HUGEINT variance + the #226 one-ulp
      // isqrt clamp of 8*var (z^2 * L = 4 * 2)
      """WITH wd AS (
           SELECT l.l_partkey,
             CAST(date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
               AS BIGINT) // 7 AS week,
             CAST(sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qw
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
           GROUP BY 1, 2),
         m AS (
           SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_weeks,
             CAST(sum(qw) AS BIGINT) AS sq,
             sum(CAST(qw AS HUGEINT) * qw) AS sqq
           FROM wd GROUP BY 1),
         v AS (
           SELECT l_partkey, n_weeks, sq,
             CAST((CAST(n_weeks AS HUGEINT) * sqq - CAST(sq AS HUGEINT) * sq)
               // (CAST(n_weeks AS HUGEINT) * (n_weeks - 1)) AS BIGINT) AS var_q,
             sq // n_weeks AS mean_w
           FROM m WHERE n_weeks >= 2),
         r AS (
           SELECT *, CAST(floor(sqrt(CAST(8 * var_q AS DOUBLE))) AS BIGINT) AS s0
           FROM v),
         c AS (
           SELECT l_partkey, n_weeks, sq, var_q, mean_w,
             s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= 8 * var_q THEN 1 ELSE 0 END)
                - (CASE WHEN s0 * s0 > 8 * var_q THEN 1 ELSE 0 END) AS ss
           FROM r)
         SELECT l_partkey, n_weeks, sq AS total_qty, mean_w AS mean_weekly_qty,
           var_q, ss AS safety_stock, 2 * mean_w + ss AS reorder_point
         FROM c""",
    "q_xyz_matrix" ->
      // #191's flat share replay crossed with the single-quotient
      // cv^2 classes; n_weeks = 1 parts are Z by convention
      """WITH rev AS (
           SELECT l_partkey,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)) AS BIGINT))
               AS BIGINT) AS rev
           FROM lineitem GROUP BY 1),
         t AS (SELECT CAST(sum(rev) AS BIGINT) AS t FROM rev),
         ranked AS (
           SELECT l_partkey, rev, sum(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum
           FROM rev),
         classed AS (
           SELECT l_partkey, rev,
             CASE
               WHEN CAST((CAST(cum AS HUGEINT) * 1000000) // t AS BIGINT) <= 800000
                 THEN 'A'
               WHEN CAST((CAST(cum AS HUGEINT) * 1000000) // t AS BIGINT) <= 950000
                 THEN 'B'
               ELSE 'C' END AS abc_class
           FROM ranked, t),
         wd AS (
           SELECT l.l_partkey,
             CAST(date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
               AS BIGINT) // 7 AS week,
             CAST(sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qw
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
           GROUP BY 1, 2),
         m AS (
           SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_weeks,
             CAST(sum(qw) AS BIGINT) AS sq,
             sum(CAST(qw AS HUGEINT) * qw) AS sqq
           FROM wd GROUP BY 1),
         xyz AS (
           SELECT l_partkey,
             CASE WHEN n_weeks < 2 THEN 'Z'
               WHEN (CAST(n_weeks AS HUGEINT) * sqq - CAST(sq AS HUGEINT) * sq)
                    * n_weeks * 1000000
                    // ((CAST(n_weeks AS HUGEINT) - 1) * CAST(sq AS HUGEINT) * sq)
                    < 250000 THEN 'X'
               WHEN (CAST(n_weeks AS HUGEINT) * sqq - CAST(sq AS HUGEINT) * sq)
                    * n_weeks * 1000000
                    // ((CAST(n_weeks AS HUGEINT) - 1) * CAST(sq AS HUGEINT) * sq)
                    < 1000000 THEN 'Y'
               ELSE 'Z' END AS xyz_class
           FROM m)
         SELECT c.abc_class, x.xyz_class, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(c.rev) AS BIGINT) AS cell_revenue_usd,
           CAST((CAST(sum(c.rev) AS HUGEINT) * 1000000) // max(t.t) AS BIGINT)
             AS cell_share_e6
         FROM classed c JOIN xyz x ON x.l_partkey = c.l_partkey, t
         GROUP BY 1, 2"""
  )
}
