package graft

/** warehouse/OLAP + analytics oracles, third part (r11 — OracleWarehouseA/B
  * sit at the ~2.7k-line cap; new entries land here, the assembled map is
  * one concatenation either way).
  */
private[graft] trait OracleWarehouseC { this: SparkEntryOracleHelpers =>
  protected def oracleWarehouseC: Map[String, String] = Map(
    "q_value_mask" -> {
      // same regex chain, DuckDB needs the explicit 'g' flag
      def m(c: String) =
        s"regexp_replace(regexp_replace(regexp_replace($c, '[A-Z]+', 'A', 'g'), " +
          s"'[a-z]+', 'a', 'g'), '[0-9]+', '9', 'g')"
      s"""WITH m AS (
           SELECT 'customer.c_name' AS col_name, ${m("c_name")} AS mask FROM customer
           UNION ALL
           SELECT 'part.p_name', ${m("p_name")} FROM part
           UNION ALL
           SELECT 'orders.o_orderpriority', ${m("o_orderpriority")} FROM orders
           UNION ALL
           SELECT 'documents.source', ${m("source")} FROM documents),
         g AS (
           SELECT col_name, mask, CAST(count(*) AS BIGINT) AS cnt
           FROM m GROUP BY 1, 2),
         t AS (SELECT col_name, CAST(sum(cnt) AS BIGINT) AS total FROM g GROUP BY 1),
         r AS (
           SELECT g.*, row_number() OVER (PARTITION BY col_name
             ORDER BY cnt DESC, mask) AS rn
           FROM g)
         SELECT r.col_name, mask, cnt,
           CAST(cnt * 1000000 // total AS BIGINT) AS share_e6
         FROM r JOIN t ON t.col_name = r.col_name
         WHERE rn <= 10"""
    },
    "q_wilcoxon" ->
      // paired odd-vs-even-month customer spend; doubled midranks
      // (2·below + t + 1), tie-corrected Var(2W+) = (2n(n+1)(2n+1) −
      // Σ(t³−t)) // 12, one-ulp-clamp isqrt, sign factored first
      """WITH p AS (
           SELECT o_custkey,
             sum(CASE WHEN month(CAST(o_orderdate AS DATE)) % 2 = 1
                 THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END) AS x,
             sum(CASE WHEN month(CAST(o_orderdate AS DATE)) % 2 = 0
                 THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END) AS y
           FROM orders GROUP BY 1),
         d AS (
           SELECT CAST(y - x AS BIGINT) AS d FROM p
           WHERE x IS NOT NULL AND y IS NOT NULL AND x <> y),
         v AS (
           SELECT abs(d) AS a, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_pos
           FROM d GROUP BY 1),
         c AS (
           SELECT a, cnt, cnt_pos,
             CAST(coalesce(sum(cnt) OVER (ORDER BY a
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
           FROM v),
         agg AS (
           SELECT CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(cnt_pos * (2 * cum + cnt + 1)) AS BIGINT) AS w_plus_2x,
             sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie_t
           FROM c),
         s AS (
           SELECT *, n * (n + 1) // 2 AS mu_2x,
             (2 * CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1) - tie_t) // 12 AS var_2x
           FROM agg),
         sg AS (
           SELECT *,
             CAST(floor(sqrt(CAST(var_2x AS DOUBLE))) AS HUGEINT) AS s0
           FROM s),
         sig AS (
           SELECT *,
             s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= var_2x THEN 1 ELSE 0 END)
                - (CASE WHEN s0 * s0 > var_2x THEN 1 ELSE 0 END) AS sigma
           FROM sg)
         SELECT n AS n_pairs, w_plus_2x,
           n * (n + 1) - w_plus_2x AS w_minus_2x,
           CAST(tie_t AS BIGINT) AS tie_t,
           CAST((CASE WHEN w_plus_2x >= mu_2x THEN 1 ELSE -1 END)
             * (abs(CAST(w_plus_2x AS HUGEINT) - mu_2x) * 1000000 // sigma)
             AS BIGINT) AS z_e6
         FROM sig""",
    "q_cuped" ->
      // per-user pre/post value sums either side of the day-span
      // midpoint; hash-split null arms; exact integer co-moments
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value + 0.5) AS BIGINT) AS v
           FROM events),
         sp AS (SELECT min(day) + (max(day) - min(day) + 1) // 2 AS split_day FROM ev),
         pu AS (
           SELECT user_id,
             CAST(coalesce(sum(CASE WHEN day < split_day THEN v END), 0) AS BIGINT) AS x,
             CAST(coalesce(sum(CASE WHEN day >= split_day THEN v END), 0) AS BIGINT) AS y,
             ('0x' || substr(md5('cuped:' || user_id), 1, 15))::BIGINT % 2 AS t
           FROM ev, sp GROUP BY user_id, split_day),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             CAST(sum(t) AS BIGINT) AS n1,
             CAST(sum(t * x) AS BIGINT) AS sx1,
             CAST(sum(t * y) AS BIGINT) AS sy1
           FROM pu),
         mm AS (
           SELECT *, n - n1 AS n0, sx - sx1 AS sx0, sy - sy1 AS sy0,
             n * sxy - CAST(sx AS HUGEINT) * sy AS num,
             n * sxx - CAST(sx AS HUGEINT) * sx AS den_x,
             n * syy - CAST(sy AS HUGEINT) * sy AS den_y
           FROM m),
         th AS (
           SELECT *,
             CASE WHEN den_x > 0 THEN
               CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
                 * (abs(num) * 1000000 // den_x) AS BIGINT)
             ELSE NULL END AS theta_e6,
             CASE WHEN n1 > 0 AND n0 > 0 THEN
               CAST((CASE WHEN CAST(sy1 AS HUGEINT) * n0 - CAST(sy0 AS HUGEINT) * n1 < 0
                       THEN -1 ELSE 1 END)
                 * (abs(CAST(sy1 AS HUGEINT) * n0 - CAST(sy0 AS HUGEINT) * n1)
                    * 1000000 // (CAST(n1 AS HUGEINT) * n0)) AS BIGINT)
             ELSE NULL END AS d_raw_e6,
             CAST(sx1 AS HUGEINT) * n0 - CAST(sx0 AS HUGEINT) * n1 AS gap_x
           FROM mm)
         SELECT n AS n_users, n1 AS n_treat, n0 AS n_ctrl, theta_e6, d_raw_e6,
           d_raw_e6 - CASE WHEN den_x > 0 AND n1 > 0 AND n0 > 0 THEN
             CAST((CASE WHEN theta_e6 * gap_x < 0 THEN -1 ELSE 1 END)
               * (abs(CAST(theta_e6 AS HUGEINT) * gap_x)
                  // (CAST(n1 AS HUGEINT) * n0)) AS BIGINT)
           ELSE NULL END AS d_cuped_e6,
           CASE WHEN den_x > 0 AND den_y > 0 THEN
             CAST(num * num * 1000000 // (den_x * den_y) AS BIGINT)
           ELSE NULL END AS rho2_e6
         FROM th""",
    "q_conformal" ->
      // day thirds: slot-mean model on train, exact-rank qhat on
      // calibration (r = ceil(0.9*(n+1)) clamped), coverage on test
      """WITH byday AS (
           SELECT CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
                    AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
           FROM orders GROUP BY 1),
         b AS (
           SELECT min(day) + (max(day) - min(day) + 1) // 3 AS t1,
             min(day) + 2 * ((max(day) - min(day) + 1) // 3) AS t2
           FROM byday),
         ph AS (SELECT day, day % 7 AS slot, y, t1, t2 FROM byday, b),
         model AS (
           SELECT slot, CAST(sum(y) // count(*) AS BIGINT) AS yhat
           FROM ph WHERE day < t1 GROUP BY 1),
         cal AS (
           SELECT p.day, abs(p.y - m.yhat) AS score
           FROM ph p JOIN model m ON m.slot = p.slot
           WHERE p.day >= t1 AND p.day < t2),
         q AS (
           SELECT n_cal, score AS qhat FROM (
             SELECT score,
               row_number() OVER (ORDER BY score, day) AS r,
               CAST(count(*) OVER () AS BIGINT) AS n_cal
             FROM cal)
           WHERE r = least(n_cal, (9 * (n_cal + 1) + 9) // 10)),
         tr AS (
           SELECT CAST(count(*) AS BIGINT) AS n_train FROM ph WHERE day < t1)
         SELECT tr.n_train, q.n_cal,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(max(q.qhat) AS BIGINT) AS qhat,
           CAST(sum(CASE WHEN abs(p.y - m.yhat) <= q.qhat THEN 1 ELSE 0 END) AS BIGINT)
             AS n_covered,
           CAST(sum(CASE WHEN abs(p.y - m.yhat) <= q.qhat THEN 1 ELSE 0 END)
             * 1000000 // count(*) AS BIGINT) AS coverage_e6,
           CAST(900000 AS BIGINT) AS target_e6
         FROM ph p JOIN model m ON m.slot = p.slot, q, tr
         WHERE p.day >= t2
         GROUP BY tr.n_train, q.n_cal""",
    "q_g_test" ->
      // same contingency as q_chi2_assoc; ln of exact-integer ratios
      """WITH cells AS (
           SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS o
           FROM orders GROUP BY 1, 2),
         rowm AS (SELECT o_orderstatus, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
         colm AS (SELECT o_orderpriority, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
         tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
         terms AS (
           SELECT cells.o_orderstatus, cells.o_orderpriority, o AS n_cell,
             CAST((CAST(r AS HUGEINT) * c * 1000000) // CAST(n AS HUGEINT) AS BIGINT)
               AS expected_e6,
             CAST(floor(2.0 * o * ln((CAST(o AS DOUBLE) * n) / (CAST(r AS DOUBLE) * c))
                  * 1000000 + 0.5) AS BIGINT) AS g_term_e6
           FROM cells
           JOIN rowm USING (o_orderstatus)
           JOIN colm USING (o_orderpriority), tot)
         SELECT *, CAST(sum(g_term_e6) OVER () AS BIGINT) AS g_total_e6 FROM terms""",
    "q_hurst" ->
      // R/S per observation-block, e9-rounded before means; 3-point
      // log-log slope with literal weights
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         rn AS (SELECT event_type, day, c,
                  CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
                    AS BIGINT) AS rn
                FROM daily),
         sizes AS (SELECT CAST(unnest([5, 10, 15]) AS BIGINT) AS w),
         blocks AS (
           SELECT event_type, w, (rn - 1) // w AS blk, (rn - 1) % w + 1 AS k, c
           FROM rn, sizes),
         wb AS (
           SELECT event_type, w, blk, k, c,
             CAST(count(*) OVER (PARTITION BY event_type, w, blk) AS BIGINT) AS nblk,
             CAST(sum(c) OVER (PARTITION BY event_type, w, blk ORDER BY k
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p,
             CAST(sum(c) OVER (PARTITION BY event_type, w, blk) AS BIGINT) AS s1,
             sum(CAST(c AS HUGEINT) * c) OVER (PARTITION BY event_type, w, blk) AS s2
           FROM blocks),
         fb AS (SELECT *, w * p - k * s1 AS cd FROM wb WHERE nblk = w),
         pb AS (
           SELECT event_type, w, blk,
             CAST(max(cd) AS BIGINT) AS cdmax, CAST(min(cd) AS BIGINT) AS cdmin,
             CAST(max(s1) AS BIGINT) AS s1m, max(s2) AS s2m,
             CAST(max(w) AS BIGINT) AS wm
           FROM fb GROUP BY 1, 2, 3),
         rs AS (
           SELECT event_type, w,
             CAST(floor(CAST(cdmax - cdmin AS DOUBLE)
               / sqrt(CAST(wm AS DOUBLE) * CAST(s2m AS DOUBLE)
                      - CAST(s1m AS DOUBLE) * CAST(s1m AS DOUBLE))
               * 1000000000 + 0.5) AS BIGINT) AS rs_e9
           FROM pb WHERE CAST(wm AS HUGEINT) * s2m - CAST(s1m AS HUGEINT) * s1m > 0),
         mrs AS (
           SELECT event_type, w, CAST(sum(rs_e9) // count(*) AS BIGINT) AS mrs_e9
           FROM rs GROUP BY 1, 2),
         piv AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_sizes,
             CAST(sum(CASE WHEN w = 5 THEN mrs_e9 ELSE 0 END) AS BIGINT) AS rs5_e9,
             CAST(sum(CASE WHEN w = 10 THEN mrs_e9 ELSE 0 END) AS BIGINT) AS rs10_e9,
             CAST(sum(CASE WHEN w = 15 THEN mrs_e9 ELSE 0 END) AS BIGINT) AS rs15_e9
           FROM mrs GROUP BY 1)
         SELECT event_type, rs5_e9, rs10_e9, rs15_e9,
           CAST(floor(
             ((-0.5972531564093522) * ln(CAST(rs5_e9 AS DOUBLE) / 1000000000.0)
              + (0.09589402415059345) * ln(CAST(rs10_e9 AS DOUBLE) / 1000000000.0)
              + (0.5013591322587576) * ln(CAST(rs15_e9 AS DOUBLE) / 1000000000.0))
             / 0.6172679762079831 * 1000000 + 0.5) AS BIGINT) AS hurst_e6
         FROM piv
         WHERE n_sizes = 3 AND rs5_e9 > 0 AND rs10_e9 > 0 AND rs15_e9 > 0""",
    "q_sprt" ->
      // Wald walk on the treatment arm; e6-rounded daily increments,
      // prefix extrema decide first crossing
      """WITH daily AS (
           SELECT CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS s
           FROM orders
           WHERE ('0x' || substr(md5('sprt:' || o_custkey), 1, 15))::BIGINT % 2 = 1
           GROUP BY 1),
         ll AS (
           SELECT day, n, s,
             CAST(floor((s * 0.06001800972625295 + (n - s) * (-0.06001800972625295))
               * 1000000 + 0.5) AS BIGINT) AS llr_day_e6
           FROM daily),
         cum AS (
           SELECT day, n, s, llr_day_e6,
             CAST(sum(llr_day_e6) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS llr_cum_e6
           FROM ll),
         ex AS (
           SELECT *,
             CAST(max(llr_cum_e6) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_max,
             CAST(min(llr_cum_e6) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_min
           FROM cum)
         SELECT day, n, s, llr_day_e6, llr_cum_e6,
           CAST(CASE WHEN cum_max >= 2944439 THEN 1 ELSE 0 END AS BIGINT) AS rejected_h0,
           CAST(CASE WHEN cum_min <= -2944439 THEN 1 ELSE 0 END AS BIGINT) AS accepted_h0
         FROM ex""",
    "q_universe_sample" ->
      // coordinated hash sample on the customer key; join of samples
      // == sample of join (orphans structurally 0)
      """WITH cs AS (
           SELECT * FROM customer
           WHERE ('0x' || substr(md5('universe:' || c_custkey), 1, 15))::BIGINT
             % 1000 < 125),
         os AS (
           SELECT * FROM orders
           WHERE ('0x' || substr(md5('universe:' || o_custkey), 1, 15))::BIGINT
             % 1000 < 125),
         orphan AS (
           SELECT CAST(count(*) AS BIGINT) AS orphan_orders
           FROM os LEFT JOIN cs ON c_custkey = o_custkey WHERE c_custkey IS NULL),
         samp AS (
           SELECT c_mktsegment,
             CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_cust_sampled,
             CAST(count(*) AS BIGINT) AS n_orders_sampled,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev_sampled_c
           FROM os JOIN cs ON c_custkey = o_custkey GROUP BY 1),
         tru AS (
           SELECT c_mktsegment AS seg,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev_true_c
           FROM orders JOIN customer ON c_custkey = o_custkey GROUP BY 1)
         SELECT c_mktsegment, n_cust_sampled, n_orders_sampled, rev_sampled_c,
           rev_sampled_c * 1000 // 125 AS est_rev_c,
           rev_true_c,
           abs(rev_sampled_c * 1000 // 125 - rev_true_c) * 1000000 // rev_true_c AS err_e6,
           orphan_orders
         FROM samp JOIN tru ON tru.seg = samp.c_mktsegment, orphan""",
    "q_mcnemar" ->
      // discordant-pair chi2 with continuity correction; paired design
      """WITH per AS (
           SELECT o_custkey,
             max(CASE WHEN month(CAST(o_orderdate AS DATE)) % 2 = 1 THEN 1 ELSE 0 END)
               AS has_odd,
             max(CASE WHEN month(CAST(o_orderdate AS DATE)) % 2 = 0 THEN 1 ELSE 0 END)
               AS has_even,
             max(CASE WHEN month(CAST(o_orderdate AS DATE)) % 2 = 1
                 AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS x,
             max(CASE WHEN month(CAST(o_orderdate AS DATE)) % 2 = 0
                 AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS y
           FROM orders GROUP BY 1),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c
           FROM per WHERE has_odd = 1 AND has_even = 1),
         s AS (
           SELECT n_pairs, b, c,
             (abs(b - c) - 1) * (abs(b - c) - 1) * 1000000 // (b + c) AS chi2_e6
           FROM agg WHERE b + c > 0)
         SELECT n_pairs, b, c, chi2_e6,
           CAST(CASE WHEN chi2_e6 > 3841459 THEN 1 ELSE 0 END AS BIGINT) AS significant_5pct
         FROM s""",
    "q_negbin_fit" ->
      // NB2 method of moments on daily counts; NULL params when v <= m
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         agg AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(c) AS BIGINT) AS s1, sum(CAST(c AS HUGEINT) * c) AS s2
           FROM daily GROUP BY 1),
         f AS (SELECT * FROM agg WHERE n_days >= 8),
         mv AS (
           SELECT event_type, n_days,
             CAST(s1 AS DOUBLE) / n_days AS m,
             (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_days)
               / (n_days - 1) AS v
           FROM f)
         SELECT event_type, n_days,
           CAST(floor(m * 1000000 + 0.5) AS BIGINT) AS mean_e6,
           CAST(floor(v / m * 1000000 + 0.5) AS BIGINT) AS dispersion_e6,
           CASE WHEN v > m THEN CAST(floor(m * m / (v - m) * 1000000 + 0.5) AS BIGINT)
             ELSE NULL END AS r_e6,
           CASE WHEN v > m THEN CAST(floor(m / v * 1000000 + 0.5) AS BIGINT)
             ELSE NULL END AS p_e6,
           CAST(CASE WHEN v > m THEN 1 ELSE 0 END AS BIGINT) AS overdispersed
         FROM mv WHERE m > 0 AND v > 0""",
    "q_friedman" ->
      // per-customer quarterly cents ranked WITHIN the row on the
      // doubled midrank grid; tie-corrected chi2, all-integer
      """WITH pc AS (
           SELECT o_custkey,
             CAST(sum(CASE WHEN (month(CAST(o_orderdate AS DATE)) - 1) // 3 = 0
                 THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS v0,
             CAST(sum(CASE WHEN (month(CAST(o_orderdate AS DATE)) - 1) // 3 = 1
                 THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS v1,
             CAST(sum(CASE WHEN (month(CAST(o_orderdate AS DATE)) - 1) // 3 = 2
                 THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS v2,
             CAST(sum(CASE WHEN (month(CAST(o_orderdate AS DATE)) - 1) // 3 = 3
                 THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS v3
           FROM orders GROUP BY 1),
         dr AS (
           SELECT
             2 * len(list_filter([v0, v1, v2, v3], x -> x < v0))
               + len(list_filter([v0, v1, v2, v3], x -> x = v0)) + 1 AS dr0,
             2 * len(list_filter([v0, v1, v2, v3], x -> x < v1))
               + len(list_filter([v0, v1, v2, v3], x -> x = v1)) + 1 AS dr1,
             2 * len(list_filter([v0, v1, v2, v3], x -> x < v2))
               + len(list_filter([v0, v1, v2, v3], x -> x = v2)) + 1 AS dr2,
             2 * len(list_filter([v0, v1, v2, v3], x -> x < v3))
               + len(list_filter([v0, v1, v2, v3], x -> x = v3)) + 1 AS dr3
           FROM pc),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(dr0) AS BIGINT) AS r2_0, CAST(sum(dr1) AS BIGINT) AS r2_1,
             CAST(sum(dr2) AS BIGINT) AS r2_2, CAST(sum(dr3) AS BIGINT) AS r2_3,
             sum(CAST(dr0 AS HUGEINT) * dr0 + CAST(dr1 AS HUGEINT) * dr1
               + CAST(dr2 AS HUGEINT) * dr2 + CAST(dr3 AS HUGEINT) * dr3) AS sdr2
           FROM dr),
         f AS (SELECT * FROM agg WHERE sdr2 - CAST(n_blocks AS HUGEINT) * 4 * 25 > 0),
         s AS (
           SELECT n_blocks, r2_0, r2_1, r2_2, r2_3,
             CAST(3 * (CAST(r2_0 - n_blocks * 5 AS HUGEINT) * (r2_0 - n_blocks * 5)
                 + CAST(r2_1 - n_blocks * 5 AS HUGEINT) * (r2_1 - n_blocks * 5)
                 + CAST(r2_2 - n_blocks * 5 AS HUGEINT) * (r2_2 - n_blocks * 5)
                 + CAST(r2_3 - n_blocks * 5 AS HUGEINT) * (r2_3 - n_blocks * 5)) * 1000000
               // CAST(sdr2 - CAST(n_blocks AS HUGEINT) * 4 * 25 AS HUGEINT)
               AS BIGINT) AS chi2_e6
           FROM f)
         SELECT n_blocks, r2_0, r2_1, r2_2, r2_3, chi2_e6,
           CAST(CASE WHEN chi2_e6 > 7814728 THEN 1 ELSE 0 END AS BIGINT) AS significant_5pct
         FROM s""",
    "q_bass_diffusion" ->
      // daily first-order adopters; 3-regressor Cramer solve; honest
      // corpus: not bass-shaped -> NULL (m, p, q)
      """WITH fo AS (
           SELECT o_custkey,
             min(CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS BIGINT)) AS d0
           FROM orders GROUP BY 1),
         daily AS (SELECT d0, CAST(count(*) AS BIGINT) AS n FROM fo GROUP BY 1),
         wc AS (
           SELECT d0, n,
             CAST(coalesce(sum(n) OVER (ORDER BY d0
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cprev
           FROM daily),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS t,
             CAST(sum(cprev) AS BIGINT) AS sc,
             sum(CAST(cprev AS HUGEINT) * cprev) AS sc2,
             sum(CAST(cprev AS HUGEINT) * cprev * cprev) AS sc3,
             sum(CAST(cprev AS HUGEINT) * cprev * cprev * cprev) AS sc4,
             CAST(sum(n) AS BIGINT) AS sy,
             sum(CAST(cprev AS HUGEINT) * n) AS syc,
             sum(CAST(cprev AS HUGEINT) * cprev * n) AS syc2
           FROM wc),
         f AS (SELECT * FROM agg WHERE t >= 12),
         md AS (
           SELECT t,
             CAST(t AS DOUBLE) AS m00, CAST(sc AS DOUBLE) AS m01,
             CAST(sc2 AS DOUBLE) AS m02, CAST(sc3 AS DOUBLE) AS m12,
             CAST(sc4 AS DOUBLE) AS m22,
             CAST(sy AS DOUBLE) AS b0, CAST(syc AS DOUBLE) AS b1,
             CAST(syc2 AS DOUBLE) AS b2
           FROM f),
         dt AS (
           SELECT t, b0, b1, b2, m00, m01, m02, m12, m22,
             m00 * (m02 * m22 - m12 * m12) - m01 * (m01 * m22 - m12 * m02)
               + m02 * (m01 * m12 - m02 * m02) AS det
           FROM md),
         abc AS (
           SELECT t,
             (b0 * (m02 * m22 - m12 * m12) - m01 * (b1 * m22 - m12 * b2)
               + m02 * (b1 * m12 - m02 * b2)) / det AS a,
             (m00 * (b1 * m22 - b2 * m12) - b0 * (m01 * m22 - m12 * m02)
               + m02 * (m01 * b2 - m02 * b1)) / det AS b,
             (m00 * (m02 * b2 - m12 * b1) - m01 * (m01 * b2 - m02 * b1)
               + b0 * (m01 * m12 - m02 * m02)) / det AS c
           FROM dt WHERE det <> 0.0),
         g AS (
           SELECT t AS n_days,
             CAST(floor(a * 1000000 + 0.5) AS BIGINT) AS a_e6,
             CAST(floor(b * 1000000000 + 0.5) AS BIGINT) AS b_e9,
             CAST(floor(c * 1000000000000 + 0.5) AS BIGINT) AS c_e12,
             a, b, c, b * b - 4.0 * a * c AS disc
           FROM abc)
         SELECT n_days, a_e6, b_e9, c_e12,
           CAST(CASE WHEN c < 0.0 AND disc > 0.0 THEN 1 ELSE 0 END AS BIGINT) AS bass_shaped,
           CASE WHEN c < 0.0 AND disc > 0.0 THEN
             CAST(floor((0.0 - b - sqrt(disc)) / (2.0 * c) * 100 + 0.5) AS BIGINT)
           ELSE NULL END AS m_e2,
           CASE WHEN c < 0.0 AND disc > 0.0 THEN
             CAST(floor(a / ((0.0 - b - sqrt(disc)) / (2.0 * c)) * 1000000000 + 0.5)
               AS BIGINT)
           ELSE NULL END AS p_e9,
           CASE WHEN c < 0.0 AND disc > 0.0 THEN
             CAST(floor((0.0 - c) * ((0.0 - b - sqrt(disc)) / (2.0 * c)) * 1000000000 + 0.5)
               AS BIGINT)
           ELSE NULL END AS q_e9
         FROM g""",
    "q_gumbel" ->
      // 2-day block maxima; method-of-moments Gumbel; e2 grid
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         blocks AS (
           SELECT event_type, day // 2 AS blk, CAST(max(c) AS BIGINT) AS m
           FROM daily GROUP BY 1, 2),
         agg AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(m) AS BIGINT) AS s1,
             sum(CAST(m AS HUGEINT) * m) AS s2
           FROM blocks GROUP BY 1),
         f AS (SELECT * FROM agg WHERE n_blocks >= 12
           AND CAST(n_blocks AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 > 0),
         mv AS (
           SELECT event_type, n_blocks,
             CAST(s1 AS DOUBLE) / n_blocks AS mean,
             (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_blocks)
               / (n_blocks - 1) AS var
           FROM f),
         be AS (SELECT event_type, n_blocks, mean, sqrt(6.0 * var) / pi() AS beta FROM mv),
         mu AS (SELECT event_type, n_blocks,
                  mean - 0.5772156649015329 * beta AS mu, beta FROM be)
         SELECT event_type, n_blocks,
           CAST(floor(mu * 100 + 0.5) AS BIGINT) AS mu_e2,
           CAST(floor(beta * 100 + 0.5) AS BIGINT) AS beta_e2,
           CAST(floor((mu + beta * 2.441716398881459) * 100 + 0.5)
             AS BIGINT) AS rl12_e2,
           CAST(floor((mu + beta * 4.085952773003955) * 100 + 0.5)
             AS BIGINT) AS rl60_e2
         FROM mu""",
    "q_handoff" ->
      // per-user lead pairs on the (us, event_id) order; alphabet^2 agg
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) AS tus, event_id, event_type FROM events),
         led AS (
           SELECT event_type AS from_type,
             lead(event_type) OVER w AS to_type,
             lead(tus) OVER w - tus AS gap_us
           FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
         trans AS (
           SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_trans,
             CAST(sum(gap_us) AS BIGINT) AS total_wait_us,
             CAST(max(gap_us) AS BIGINT) AS max_gap_us
           FROM led WHERE to_type IS NOT NULL GROUP BY 1, 2),
         ft AS (SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS n_from
                FROM trans GROUP BY 1)
         SELECT trans.from_type, to_type, n_trans,
           total_wait_us // n_trans AS mean_gap_us,
           max_gap_us, total_wait_us,
           (n_trans * 1000000) // n_from AS share_e6
         FROM trans JOIN ft ON ft.from_type = trans.from_type""",
    "q_graph_diameter" ->
      // #166's edge build; BFS as a depth-capped recursive CTE with
      // min-dist dedup; 4 lowest-id landmarks
      """WITH bp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n
           FROM bp a JOIN bp b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2),
         e AS (SELECT pa AS src, pb AS dst FROM pr WHERE n >= 2
               UNION ALL SELECT pb, pa FROM pr WHERE n >= 2),
         lm AS (SELECT DISTINCT src AS node FROM e ORDER BY 1 LIMIT 4),
         bfs AS (
           WITH RECURSIVE rec(l, node, d) AS (
             SELECT node, node, CAST(0 AS BIGINT) FROM lm
             UNION
             SELECT r.l, e.dst, r.d + 1 FROM rec r JOIN e ON e.src = r.node
             WHERE r.d < 4)
           SELECT l, node, CAST(min(d) AS BIGINT) AS d FROM rec GROUP BY 1, 2)
         SELECT l AS landmark, CAST(count(*) AS BIGINT) AS n_reached,
           CAST(sum(CASE WHEN d <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS within_1,
           CAST(sum(CASE WHEN d <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS within_2,
           CAST(sum(CASE WHEN d <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS within_3,
           max(d) AS ecc_capped
         FROM bfs GROUP BY 1""",
    "q_eb_shrinkage" ->
      // pseudo-count posterior mean, K=20; top-50 movers, custkey tiebreak
      """WITH per AS (
           SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_complete
           FROM orders GROUP BY 1),
         g AS (SELECT CAST(sum(n_orders) AS BIGINT) AS tot_n,
                 CAST(sum(n_complete) AS BIGINT) AS tot_c FROM per),
         s AS (
           SELECT o_custkey, n_orders, n_complete,
             n_complete * 1000000 // n_orders AS raw_e6,
             (n_complete * tot_n + 20 * tot_c) * 1000000
               // (tot_n * (n_orders + 20)) AS shrunk_e6
           FROM per, g)
         SELECT o_custkey, n_orders, n_complete, raw_e6, shrunk_e6,
           shrunk_e6 - raw_e6 AS delta_e6
         FROM s ORDER BY abs(shrunk_e6 - raw_e6) DESC, o_custkey LIMIT 50""",
    "q_rmst" ->
      // #234's recursive-CTE KM trajectory + an all-integer clipped
      // step integral at tau = 6/12/24 months
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
           SELECT * FROM rec),
         steps AS (
           SELECT t, surv AS surv_e6, lead(t) OVER (ORDER BY t) AS t_next FROM km),
         taus AS (SELECT CAST(unnest([6, 12, 24]) AS BIGINT) AS tau),
         body AS (
           SELECT tau,
             CAST(sum(surv_e6 * (least(coalesce(t_next, tau), tau) - least(t, tau)))
               AS BIGINT) AS body
           FROM steps, taus GROUP BY tau),
         hd AS (SELECT tau, 1000000 * least((SELECT min(t) FROM km), tau) AS head FROM taus)
         SELECT hd.tau AS tau_months,
           CAST(head + body AS BIGINT) AS rmst_e6_months,
           CAST((head + body) // hd.tau AS BIGINT) AS mean_frac_e6
         FROM hd JOIN body ON body.tau = hd.tau""",
    "q_price_elasticity" ->
      // monthly (Q, P) on exact cents grids; ln -> e9 integers so the
      // OLS sums are exact; slope = one fixed double expression
      """WITH monthly AS (
           SELECT p_brand,
             CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT) AS m,
             CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sq,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS se
           FROM lineitem JOIN part ON p_partkey = l_partkey
           GROUP BY 1, 2),
         lns AS (
           SELECT p_brand,
             CAST(floor(ln(CAST(sq AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT) AS lq,
             CAST(floor(ln(CAST(se AS DOUBLE) / CAST(sq AS DOUBLE)) * 1000000000 + 0.5)
               AS BIGINT) AS lp
           FROM monthly WHERE sq > 0 AND se > 0),
         agg AS (
           SELECT p_brand, CAST(count(*) AS BIGINT) AS n_months,
             CAST(sum(lp) AS BIGINT) AS sp, CAST(sum(lq) AS BIGINT) AS sq2,
             sum(CAST(lp AS HUGEINT) * lq) AS spq,
             sum(CAST(lp AS HUGEINT) * lp) AS spp
           FROM lns GROUP BY 1),
         f AS (SELECT * FROM agg
           WHERE n_months >= 12 AND CAST(n_months AS HUGEINT) * spp - CAST(sp AS HUGEINT) * sp > 0)
         SELECT p_brand, n_months,
           CAST(floor((CAST(n_months AS DOUBLE) * CAST(spq AS DOUBLE)
               - CAST(sp AS DOUBLE) * CAST(sq2 AS DOUBLE))
             / (CAST(n_months AS DOUBLE) * CAST(spp AS DOUBLE)
                - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
             * 1000000 + 0.5) AS BIGINT) AS elasticity_e6
         FROM f""",
    "q_jarque_bera" ->
      // exact HUGEINT power sums; one fixed scalar double chain (the
      // Spark side's selectExpr tree copied verbatim)
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         agg AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             sum(CAST(c AS HUGEINT)) AS s1,
             sum(CAST(c AS HUGEINT) * c) AS s2,
             sum(CAST(c AS HUGEINT) * c * c) AS s3,
             sum(CAST(c AS HUGEINT) * c * c * c) AS s4
           FROM daily GROUP BY 1),
         f AS (SELECT * FROM agg
           WHERE n_days >= 8 AND CAST(n_days AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 > 0),
         m AS (
           SELECT event_type, n_days,
             CAST(s1 AS DOUBLE) / n_days AS m1, CAST(s2 AS DOUBLE) / n_days AS r2,
             CAST(s3 AS DOUBLE) / n_days AS r3, CAST(s4 AS DOUBLE) / n_days AS r4
           FROM f),
         cm AS (
           SELECT event_type, n_days,
             r2 - m1 * m1 AS m2,
             r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1 AS m3,
             r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2 - 3.0 * m1 * m1 * m1 * m1 AS m4
           FROM m),
         sk AS (
           SELECT event_type, n_days,
             m3 / sqrt(m2 * m2 * m2) AS skew, m4 / (m2 * m2) AS kurt
           FROM cm),
         jb AS (
           SELECT event_type, n_days,
             CAST(floor(skew * 1000000 + 0.5) AS BIGINT) AS skew_e6,
             CAST(floor(kurt * 1000000 + 0.5) AS BIGINT) AS kurt_e6,
             CAST(floor((CAST(n_days AS DOUBLE) / 6.0)
               * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0) * 1000000 + 0.5)
               AS BIGINT) AS jb_e6
           FROM sk)
         SELECT event_type, n_days, skew_e6, kurt_e6, jb_e6,
           CAST(CASE WHEN jb_e6 > 5991465 THEN 1 ELSE 0 END AS BIGINT) AS reject_normal_5pct
         FROM jb""",
    "q_durbin_watson" ->
      // residuals never materialized: full-series power sums + the
      // successive-difference sums; one fixed double chain
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         agg AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(day) AS BIGINT) AS sd, CAST(sum(c) AS BIGINT) AS sy,
             sum(CAST(day AS HUGEINT) * day) AS sdd,
             sum(CAST(day AS HUGEINT) * c) AS sdy,
             sum(CAST(c AS HUGEINT) * c) AS syy
           FROM daily GROUP BY 1),
         f AS (SELECT * FROM agg
           WHERE n >= 8 AND CAST(n AS HUGEINT) * sdd - CAST(sd AS HUGEINT) * sd > 0),
         lagged AS (
           SELECT event_type,
             c - lag(c) OVER (PARTITION BY event_type ORDER BY day) AS u,
             day - lag(day) OVER (PARTITION BY event_type ORDER BY day) AS v
           FROM daily),
         diffs AS (
           SELECT event_type,
             sum(CAST(u AS HUGEINT) * u) AS suu,
             sum(CAST(u AS HUGEINT) * v) AS suv,
             sum(CAST(v AS HUGEINT) * v) AS svv
           FROM lagged WHERE u IS NOT NULL GROUP BY 1),
         j AS (
           SELECT f.event_type, n AS n_days,
             (CAST(n AS DOUBLE) * CAST(sdy AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                  - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) AS b,
             CAST(sd AS DOUBLE) AS sdf, CAST(sy AS DOUBLE) AS syf,
             CAST(sdd AS DOUBLE) AS sddf, CAST(sdy AS DOUBLE) AS sdyf,
             CAST(syy AS DOUBLE) AS syyf,
             CAST(suu AS DOUBLE) AS suuf, CAST(suv AS DOUBLE) AS suvf,
             CAST(svv AS DOUBLE) AS svvf
           FROM f JOIN diffs ON diffs.event_type = f.event_type),
         k AS (
           SELECT event_type, n_days, (syf - b * sdf) / n_days AS a,
             b, sdf, syf, sddf, sdyf, syyf, suuf, suvf, svvf
           FROM j),
         nd AS (
           SELECT event_type, n_days,
             suuf - 2.0 * b * suvf + b * b * svvf AS num,
             syyf - 2.0 * a * syf - 2.0 * b * sdyf
               + n_days * a * a + 2.0 * a * b * sdf + b * b * sddf AS den
           FROM k),
         dw AS (
           SELECT event_type, n_days,
             CAST(floor(num / den * 1000000 + 0.5) AS BIGINT) AS dw_e6
           FROM nd WHERE den > 0)
         SELECT event_type, n_days, dw_e6,
           1000000 - dw_e6 // 2 AS rho_resid_e6,
           CAST(CASE WHEN dw_e6 < 1500000 THEN 1 ELSE 0 END AS BIGINT) AS positive_autocorr
         FROM dw""",
    "q_adf_test" ->
      // lag-0 Dickey-Fuller with constant: centered closed forms over
      // exact (prev, delta) pair sums; t via one sqrt
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         p AS (
           SELECT event_type,
             lag(c) OVER (PARTITION BY event_type ORDER BY day) AS x,
             c - lag(c) OVER (PARTITION BY event_type ORDER BY day) AS d
           FROM daily),
         agg AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(d) AS BIGINT) AS sd,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * d) AS sxd,
             sum(CAST(d AS HUGEINT) * d) AS sdd
           FROM p WHERE x IS NOT NULL GROUP BY 1),
         f AS (SELECT * FROM agg
           WHERE m >= 10 AND CAST(m AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0),
         cf AS (
           SELECT event_type, m AS n_pairs,
             CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS cxx,
             CAST(m AS DOUBLE) * CAST(sxd AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sd AS DOUBLE) AS cxd,
             CAST(m AS DOUBLE) * CAST(sdd AS DOUBLE)
               - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) AS cdd
           FROM f),
         t AS (
           SELECT event_type, n_pairs,
             CAST(floor(cxd / cxx * 1000000 + 0.5) AS BIGINT) AS rho_e6,
             CAST(floor((cxd / cxx)
               * sqrt((CAST(n_pairs AS DOUBLE) - 2.0) * cxx / (cdd - cxd * cxd / cxx))
               * 1000000 + 0.5) AS BIGINT) AS t_stat_e6
           FROM cf WHERE cdd * cxx - cxd * cxd > 0)
         SELECT event_type, n_pairs, rho_e6, t_stat_e6,
           CAST(CASE WHEN t_stat_e6 < -2860000 THEN 1 ELSE 0 END AS BIGINT) AS unit_root_rejected
         FROM t""",
    "q_pacf" ->
      // three leads in one window pass; Durbin-Levinson on exact-
      // integer ACF ratios, full-series-mean convention
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         l AS (
           SELECT event_type, c,
             lead(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS c1,
             lead(c, 2) OVER (PARTITION BY event_type ORDER BY day) AS c2,
             lead(c, 3) OVER (PARTITION BY event_type ORDER BY day) AS c3
           FROM daily),
         agg AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS sy,
             sum(CAST(c AS HUGEINT) * c) AS syy,
             CAST(sum(CASE WHEN c1 IS NOT NULL THEN c ELSE 0 END) AS BIGINT) AS h1,
             CAST(sum(CASE WHEN c1 IS NOT NULL THEN c1 ELSE 0 END) AS BIGINT) AS t1,
             sum(CASE WHEN c1 IS NOT NULL THEN CAST(c AS HUGEINT) * c1 ELSE 0 END) AS p1,
             CAST(count(c1) AS BIGINT) AS m1,
             CAST(sum(CASE WHEN c2 IS NOT NULL THEN c ELSE 0 END) AS BIGINT) AS h2,
             CAST(sum(CASE WHEN c2 IS NOT NULL THEN c2 ELSE 0 END) AS BIGINT) AS t2,
             sum(CASE WHEN c2 IS NOT NULL THEN CAST(c AS HUGEINT) * c2 ELSE 0 END) AS p2,
             CAST(count(c2) AS BIGINT) AS m2,
             CAST(sum(CASE WHEN c3 IS NOT NULL THEN c ELSE 0 END) AS BIGINT) AS h3,
             CAST(sum(CASE WHEN c3 IS NOT NULL THEN c3 ELSE 0 END) AS BIGINT) AS t3,
             sum(CASE WHEN c3 IS NOT NULL THEN CAST(c AS HUGEINT) * c3 ELSE 0 END) AS p3,
             CAST(count(c3) AS BIGINT) AS m3
           FROM l GROUP BY 1),
         f AS (SELECT * FROM agg
           WHERE n >= 12 AND CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0),
         cc AS (
           SELECT event_type, n AS n_days,
             CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(n AS DOUBLE) * CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS c0,
             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(p1 AS DOUBLE)
               - CAST(n AS DOUBLE) * CAST(sy AS DOUBLE)
                 * (CAST(h1 AS DOUBLE) + CAST(t1 AS DOUBLE))
               + CAST(m1 AS DOUBLE) * CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS c1n,
             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(p2 AS DOUBLE)
               - CAST(n AS DOUBLE) * CAST(sy AS DOUBLE)
                 * (CAST(h2 AS DOUBLE) + CAST(t2 AS DOUBLE))
               + CAST(m2 AS DOUBLE) * CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS c2n,
             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(p3 AS DOUBLE)
               - CAST(n AS DOUBLE) * CAST(sy AS DOUBLE)
                 * (CAST(h3 AS DOUBLE) + CAST(t3 AS DOUBLE))
               + CAST(m3 AS DOUBLE) * CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS c3n
           FROM f),
         r AS (SELECT event_type, n_days, c1n / c0 AS r1, c2n / c0 AS r2, c3n / c0 AS r3
           FROM cc),
         f2 AS (SELECT * FROM r WHERE 1.0 - r1 * r1 <> 0.0),
         ph AS (
           SELECT event_type, n_days, r1, r2, r3,
             (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22
           FROM f2),
         ph2 AS (
           SELECT event_type, n_days, r1, r2, r3, phi22, r1 * (1.0 - phi22) AS phi21
           FROM ph),
         f3 AS (SELECT * FROM ph2 WHERE 1.0 - phi21 * r1 - phi22 * r2 <> 0.0)
         SELECT event_type, n_days,
           CAST(floor(r1 * 1000000 + 0.5) AS BIGINT) AS r1_e6,
           CAST(floor(r2 * 1000000 + 0.5) AS BIGINT) AS r2_e6,
           CAST(floor(r3 * 1000000 + 0.5) AS BIGINT) AS r3_e6,
           CAST(floor(r1 * 1000000 + 0.5) AS BIGINT) AS pacf1_e6,
           CAST(floor(phi22 * 1000000 + 0.5) AS BIGINT) AS pacf2_e6,
           CAST(floor((r3 - phi21 * r2 - phi22 * r1)
             / (1.0 - phi21 * r1 - phi22 * r2) * 1000000 + 0.5) AS BIGINT) AS pacf3_e6
         FROM f3""",
    "q_dp_counts" -> {
      // one SELECT per alpha tier; the e18 power table injected as the
      // SAME precomputed constants the Spark frame uses
      val parts = operators.Profile.DpTiers
        .map { case (a, b) =>
          val tbl = operators.Profile.dlapTable(a, b).mkString(", ")
          def gexpr(salt: String) =
            s"""CAST(sum(CASE WHEN t >
                 (999999999999 - ('0x' || substr(md5('dp:$a/$b:$salt:' || nation), 1, 15))::BIGINT
                   % 1000000000000) * 1000000
               THEN 1 ELSE 0 END) AS BIGINT)"""
          s"""SELECT '$a/$b' AS alpha, nation, n_true,
               g_a - g_b AS noise,
               n_true + g_a - g_b AS n_released,
               abs(g_a - g_b) AS abs_err
             FROM (
               SELECT nation, n_true,
                 ${gexpr("A")} AS g_a,
                 ${gexpr("B")} AS g_b
               FROM base, (SELECT unnest([$tbl]) AS t)
               GROUP BY 1, 2)"""
        }
        .mkString("\n         UNION ALL\n         ")
      s"""WITH base AS (
           SELECT CAST(c_nationkey AS BIGINT) AS nation,
             CAST(count(*) AS BIGINT) AS n_true
           FROM customer GROUP BY 1)
         $parts"""
    },
    "q_salt_advisor" ->
      // ceil divs as (a + b - 1) // b, positive operands everywhere;
      // fair share from the SHARED Scale.SaltShards constant
      s"""WITH per AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS freq
           FROM events GROUP BY 1),
         tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM per),
         a AS (
           SELECT event_type, freq, total,
             (total + ${operators.Scale.SaltShards - 1}) // ${operators.Scale.SaltShards} AS t
           FROM per, tot),
         b AS (
           SELECT *, (freq + t - 1) // t AS salt_factor FROM a)
         SELECT event_type, freq,
           CAST(freq * 1000000 // total AS BIGINT) AS share_e6,
           t AS fair_share_rows,
           salt_factor,
           (freq + salt_factor - 1) // salt_factor AS post_salt_max_rows,
           CAST((freq + salt_factor - 1) // salt_factor * 1000000 // total AS BIGINT)
             AS post_share_e6
         FROM b""",
    "q_salted_agg" ->
      // freq/sum_cents computed DIRECTLY (the unsalt must not change
      // the answer — any error shows as a hash mismatch); only the
      // distribution columns replay the salt hash. Constants from the
      // shared Scale.SaltShards / Scale.SaltHeadroom.
      s"""WITH per AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS freq
           FROM events GROUP BY 1),
         tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM per),
         adv AS (
           SELECT event_type, freq, t AS fair_share_rows,
             (freq + t - 1) // t AS salt_factor
           FROM (SELECT event_type, freq,
                   (total + ${operators.Scale.SaltShards - 1})
                     // ${operators.Scale.SaltShards} AS t
                 FROM per, tot)),
         ev AS (
           SELECT e.event_type,
             ('0x' || substr(md5('saltagg:' || e.event_id), 1, 15))::BIGINT
               % (a.salt_factor * ${operators.Scale.SaltHeadroom}) AS salt
           FROM events e JOIN adv a USING (event_type)),
         s1 AS (
           SELECT event_type, salt, CAST(count(*) AS BIGINT) AS n
           FROM ev GROUP BY 1, 2),
         g AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_subkeys,
             CAST(max(n) AS BIGINT) AS max_subkey_rows
           FROM s1 GROUP BY 1),
         direct AS (
           SELECT event_type,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
           FROM events GROUP BY 1)
         SELECT a.event_type, a.freq, d.sum_cents,
           CAST(a.salt_factor * ${operators.Scale.SaltHeadroom} AS BIGINT) AS applied_salts,
           g.n_subkeys, g.max_subkey_rows, a.fair_share_rows,
           CAST(g.max_subkey_rows * 1000000 // total AS BIGINT) AS max_share_e6,
           CAST(g.max_subkey_rows <= a.fair_share_rows AS BIGINT) AS within_fair
         FROM adv a JOIN g USING (event_type) JOIN direct d USING (event_type), tot""",
    "q_trend_test" ->
      // Cochran-Armitage: A = N*Swy - Y*Swn, z2 = A^2*N/(Y(N-Y)(N*Sw2n-Swn^2))
      """WITH g AS (
           SELECT least(4, CAST(floor(l_quantity - 0.5) AS BIGINT) // 10) AS w,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS yy
           FROM lineitem GROUP BY 1),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(n) AS BIGINT) AS bign, CAST(sum(yy) AS BIGINT) AS bigy,
             CAST(sum(w * yy) AS BIGINT) AS swy, CAST(sum(w * n) AS BIGINT) AS swn,
             CAST(sum(w * w * n) AS BIGINT) AS sw2n
           FROM g),
         s AS (
           SELECT *,
             CAST(bign AS HUGEINT) * swy - CAST(bigy AS HUGEINT) * swn AS a,
             CAST(bigy AS HUGEINT) * (bign - bigy) *
               (CAST(bign AS HUGEINT) * sw2n - CAST(swn AS HUGEINT) * swn) AS den
           FROM m)
         SELECT n_groups, bign AS n_lines, bigy AS n_returned,
           CAST(a AS BIGINT) AS t_num,
           CASE WHEN den > 0 THEN
             CAST(a * a * bign * 1000000 // den AS BIGINT)
           ELSE NULL END AS z2_e6,
           CASE WHEN den > 0 AND a * a * bign * 1000000 // den >= 3841459
             THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS significant_95
         FROM s""",
    "dedup_capture" ->
      // Chapman estimator over two independent hash-drawn crawls,
      // captured units = distinct content fingerprints
      """WITH d AS (SELECT doc_id, md5(text) AS fp FROM documents),
         m AS (
           SELECT fp,
             max(CASE WHEN ('0x' || substr(md5('capA:' || doc_id), 1, 15))::BIGINT
                   % 100 < 30 THEN 1 ELSE 0 END) AS a,
             max(CASE WHEN ('0x' || substr(md5('capB:' || doc_id), 1, 15))::BIGINT
                   % 100 < 30 THEN 1 ELSE 0 END) AS b
           FROM d GROUP BY 1),
         s AS (
           SELECT CAST(count(*) AS BIGINT) AS n_true, CAST(sum(a) AS BIGINT) AS n_a,
             CAST(sum(b) AS BIGINT) AS n_b, CAST(sum(a * b) AS BIGINT) AS n_both
           FROM m)
         SELECT n_a, n_b, n_both,
           CAST((n_a + 1) * (n_b + 1) // (n_both + 1) - 1 AS BIGINT) AS n_hat,
           n_true,
           CAST((CASE WHEN (n_a + 1) * (n_b + 1) // (n_both + 1) - 1 - n_true < 0
                   THEN -1 ELSE 1 END)
             * (abs((n_a + 1) * (n_b + 1) // (n_both + 1) - 1 - n_true) * 1000000
                // n_true) AS BIGINT) AS err_e6
         FROM s""",
    "q_isotonic" ->
      // minimax isotonic: max_{j<=i} min_{k>=i} pooled rate on [j,k];
      // ordering on the e15 key, report floor-of-floor = e6 floor
      """WITH base AS (
           SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
             CAST(o_orderstatus = 'F' AS BIGINT) AS y
           FROM orders),
         b AS (SELECT min(c) AS lo, max(c) AS hi FROM base),
         bins AS (
           SELECT least(9, ((c - lo) * 10) // (hi - lo + 1)) AS bin,
             CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s
           FROM base, b GROUP BY 1),
         iv AS (
           SELECT j.bin AS j, k.bin AS k,
             CAST(sum(m.n) AS BIGINT) AS nn, CAST(sum(m.s) AS BIGINT) AS ss
           FROM bins j, bins k, bins m
           WHERE j.bin <= k.bin AND m.bin BETWEEN j.bin AND k.bin
           GROUP BY 1, 2),
         ivk AS (
           SELECT j, k,
             CAST(CAST(ss AS HUGEINT) * 1000000000000000 // nn AS BIGINT) AS key15
           FROM iv),
         mn AS (
           SELECT i.bin AS i, v.j, min(v.key15) AS mn
           FROM bins i JOIN ivk v ON v.j <= i.bin AND i.bin <= v.k
           GROUP BY 1, 2),
         iso AS (
           SELECT i AS bin, max(mn) // 1000000000 AS rate_iso_e6
           FROM mn GROUP BY 1)
         SELECT bins.bin, n, s,
           CAST(s * 1000000 // n AS BIGINT) AS rate_raw_e6,
           CAST(rate_iso_e6 AS BIGINT) AS rate_iso_e6
         FROM bins JOIN iso ON iso.bin = bins.bin""",
    "q_ar2_forecast" ->
      // Yule-Walker over dollar-grid deviations; phi from
      // KILO-DOWNSCALED co-moments (each c-factor sign-factored
      // // 1000 before the products, so num and den shrink together
      // and every quotient fits BIGINT — see
      // AnalyticsExtStatsB.ar2Forecast); e6 backtest vs naive
      """WITH byday AS (
           SELECT CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
                    AS day,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) // 100 AS x
           FROM orders GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s FROM byday),
         lagged AS (
           SELECT day, x,
             lag(x, 1) OVER (ORDER BY day) AS x1,
             lag(x, 2) OVER (ORDER BY day) AS x2,
             n, s,
             (CASE WHEN n * x - s < 0 THEN -1 ELSE 1 END) * (abs(n * x - s) // n) AS v,
             CASE WHEN lag(x, 1) OVER (ORDER BY day) IS NULL THEN NULL ELSE
               (CASE WHEN n * lag(x, 1) OVER (ORDER BY day) - s < 0 THEN -1 ELSE 1 END)
               * (abs(n * lag(x, 1) OVER (ORDER BY day) - s) // n) END AS v1,
             CASE WHEN lag(x, 2) OVER (ORDER BY day) IS NULL THEN NULL ELSE
               (CASE WHEN n * lag(x, 2) OVER (ORDER BY day) - s < 0 THEN -1 ELSE 1 END)
               * (abs(n * lag(x, 2) OVER (ORDER BY day) - s) // n) END AS v2
           FROM byday, tot),
         mom AS (
           SELECT max(n) AS n, max(s) AS s,
             sum(CAST(v AS HUGEINT) * v) AS c0,
             sum(CAST(v AS HUGEINT) * v1) AS c1,
             sum(CAST(v AS HUGEINT) * v2) AS c2
           FROM lagged),
         moms AS (
           SELECT *,
             (CASE WHEN c0 < 0 THEN -1 ELSE 1 END) * (abs(c0) // 1000) AS c0s,
             (CASE WHEN c1 < 0 THEN -1 ELSE 1 END) * (abs(c1) // 1000) AS c1s,
             (CASE WHEN c2 < 0 THEN -1 ELSE 1 END) * (abs(c2) // 1000) AS c2s
           FROM mom),
         ph AS (
           SELECT *, c0s * c0s - c1s * c1s AS den,
             CASE WHEN c0s * c0s - c1s * c1s > 0 THEN
               CAST((CASE WHEN c1s * (c0s - c2s) < 0 THEN -1 ELSE 1 END)
                 * (abs(c1s * (c0s - c2s)) * 1000000
                    // (c0s * c0s - c1s * c1s)) AS BIGINT)
             ELSE NULL END AS phi1_e6,
             CASE WHEN c0s * c0s - c1s * c1s > 0 THEN
               CAST((CASE WHEN c0s * c2s - c1s * c1s < 0 THEN -1 ELSE 1 END)
                 * (abs(c0s * c2s - c1s * c1s) * 1000000
                    // (c0s * c0s - c1s * c1s)) AS BIGINT)
             ELSE NULL END AS phi2_e6
           FROM moms),
         bt AS (
           SELECT l.x, l.x1, l.v1, l.v2, p.*
           FROM lagged l, ph p
           WHERE l.v1 IS NOT NULL AND l.v2 IS NOT NULL)
         SELECT max(n) AS n_days,
           CAST(max(c0) AS BIGINT) AS c0, CAST(max(c1) AS BIGINT) AS c1,
           CAST(max(c2) AS BIGINT) AS c2,
           max(phi1_e6) AS phi1_e6, max(phi2_e6) AS phi2_e6,
           CAST(count(*) AS BIGINT) AS n_scored,
           CAST(sum(abs(CAST(x AS HUGEINT) * 1000000
                  - (CAST(s AS HUGEINT) * 1000000 // n + phi1_e6 * v1 + phi2_e6 * v2)))
                // (count(*) * 1000000) AS BIGINT) AS mae_ar,
           CAST(sum(abs(CAST(x AS HUGEINT) - x1) * 1000000)
                // (count(*) * 1000000) AS BIGINT) AS mae_naive,
           CASE WHEN sum(abs(CAST(x AS HUGEINT) - x1)) > 0 THEN
             CAST(sum(abs(CAST(x AS HUGEINT) * 1000000
                    - (CAST(s AS HUGEINT) * 1000000 // n + phi1_e6 * v1 + phi2_e6 * v2)))
                  * 1000000
                  // sum(abs(CAST(x AS HUGEINT) - x1) * 1000000) AS BIGINT)
           ELSE NULL END AS mae_ratio_e6
         FROM bt""")
}
