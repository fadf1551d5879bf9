package graft

import graft.operators._

/** warehouse/OLAP + analytics oracles (first half, by map order) — split verbatim out of SparkEntry.oracleSql
  * (r10 file-size refactor); the assembled map is identical.
  */
private[graft] trait OracleWarehouseA { this: SparkEntryOracleHelpers =>
  protected def oracleWarehouseA: Map[String, String] = Map(
    "q_bloom_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY o_orderpriority""",
    "q_approx_distinct" ->
      """SELECT event_type, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users_exact,
           CAST(1 AS INTEGER) AS within_3rsd
         FROM events GROUP BY event_type""",
    // Count-min sketch (#147): all-integer md5-parity hashes, so the
    // oracle replays the ESTIMATE itself — counters, min-lookup,
    // realized overcount — not just a contract flag.
    "q_cms_counts" ->
      """WITH ev AS (SELECT user_id FROM events),
         pos AS MATERIALIZED (
           SELECT user_id, d,
             ('0x' || substr(md5('graft-cms-' || d || ':' || user_id), 1, 15))::BIGINT
               % 256 AS b
           FROM ev, range(3) r(d)),
         counters AS MATERIALIZED (
           SELECT d, b, CAST(count(*) AS BIGINT) AS c FROM pos GROUP BY d, b),
         exact AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact FROM ev GROUP BY user_id),
         est AS (
           SELECT up.user_id, min(co.c) AS n_cms
           FROM (SELECT DISTINCT user_id, d, b FROM pos) up
           JOIN counters co USING (d, b)
           GROUP BY up.user_id)
         SELECT e.user_id, e.n_exact, s.n_cms, s.n_cms - e.n_exact AS overcount
         FROM exact e JOIN est s USING (user_id)""",
    "q_approx_percentiles" ->
      """SELECT l_returnflag, count(*) AS n,
           CAST(1 AS INTEGER) AS ok50, CAST(1 AS INTEGER) AS ok90,
           CAST(1 AS INTEGER) AS ok99
         FROM lineitem GROUP BY l_returnflag""",
    "q_freq_items" ->
      """SELECT event_type, count(*) AS n_events,
           CAST(1 AS INTEGER) AS in_sketch
         FROM events GROUP BY event_type
         HAVING count(*) > 0.1 * (SELECT count(*) FROM events)""",
    "q_json_extract" ->
      """SELECT event_type,
           count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 2) AS avg_k,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY event_type""",
    "q_filter_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
           round(l_extendedprice, 2) AS l_extendedprice,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
           AND CAST(l_shipdate AS DATE) < DATE '1999-01-01'
           AND l_quantity < 25""",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2) AS avg_qty,
           round(avg(l_extendedprice), 2) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q3_top_orders" ->
      """SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
           AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q5_region_revenue" ->
      """SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
           AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
         GROUP BY r_name, n_name""",
    "q_top_parts_per_brand" ->
      """SELECT p_brand, rn, p_partkey, p_name,
           round(p_retailprice, 2) AS p_retailprice
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
               FROM part)
         WHERE rn <= 3""",
    "q_customer_ltv" ->
      """SELECT o_custkey, c_name, n_orders, ltv
         FROM (SELECT o_custkey, count(*) AS n_orders,
                 round(sum(o_totalprice), 2) AS ltv
               FROM orders GROUP BY o_custkey)
         JOIN customer ON o_custkey = c_custkey
         WHERE ltv >= 3000000.0""",
    "q_rollup_orders" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
           coalesce(o_orderpriority, '(all)') AS o_orderpriority,
           count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_id FROM events),
         flagged AS (
           SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sess AS (
           SELECT user_id, ts,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM flagged)
         SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
         FROM sess GROUP BY user_id, session_id""",
    "q_running_totals" ->
      """SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
         FROM orders""",
    "q_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_type FROM events),
         s AS (SELECT user_id, min(ts) AS signup_ts FROM e
               WHERE event_type = 'signup' GROUP BY user_id),
         en AS (SELECT e.user_id, min(e.ts) AS engage_ts FROM e
                JOIN s ON e.user_id = s.user_id
                WHERE e.event_type IN ('click','view') AND e.ts > s.signup_ts
                GROUP BY e.user_id),
         c AS (SELECT e.user_id, min(e.ts) AS convert_ts FROM e
               JOIN en ON e.user_id = en.user_id
               WHERE e.event_type = 'purchase' AND e.ts > en.engage_ts
               GROUP BY e.user_id)
         SELECT (SELECT count(*) FROM s) AS n_signup,
                (SELECT count(*) FROM en) AS n_engaged,
                (SELECT count(*) FROM c) AS n_converted""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey
             AND CAST(o_orderdate AS DATE) >= DATE '2001-01-01')""",
    "q_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
           coalesce(o_orderpriority, '(all)') AS o_orderpriority,
           count(1) AS n_orders, round(sum(o_totalprice), 2) AS total
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""",
    "q_trailing_7d" ->
      """SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS trailing_7d_spend
         FROM orders""",
    "q_percent_rank" ->
      """SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS c_acctbal,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cum_dist
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""",
    "q_split_assign" ->
      """SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
         FROM (SELECT doc_id,
                 CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 100 AS bucket
               FROM documents)""",
    "q_hash_sample" ->
      """SELECT doc_id, md5('graft-sample-1' || text) AS h
         FROM documents ORDER BY h, doc_id LIMIT 100""",
    "q_shuffle_order" ->
      """WITH t AS (
           SELECT doc_id,
             ('0x' || substr(md5('graft-shuffle-epoch0:' || doc_id), 1, 15))::BIGINT AS ord
           FROM documents)
         SELECT doc_id, ord % 8 AS shard,
           row_number() OVER (PARTITION BY ord % 8 ORDER BY ord, doc_id) - 1 AS pos
         FROM t""",
    "q_epoch_shuffle" ->
      // fresh permutation per epoch (seed carries the epoch); epoch 0
      // is bit-identical to q_shuffle_order
      """WITH d AS (SELECT doc_id, unnest(range(0, 3)) AS epoch FROM documents),
         h AS (
           SELECT doc_id, epoch,
             ('0x' || substr(md5('graft-shuffle-epoch' || epoch || ':'
               || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS ord
           FROM d)
         SELECT doc_id, CAST(epoch AS BIGINT) AS epoch, ord % 8 AS shard,
           CAST(row_number() OVER (PARTITION BY epoch, ord % 8
             ORDER BY ord, doc_id) - 1 AS BIGINT) AS pos
         FROM h""",
    "q_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
         WHERE ('0x' || substr(md5('graft-strat-1' || text), 1, 15))::BIGINT % 10000 <
           CASE lang WHEN 'en' THEN 2500
                     WHEN 'de' THEN 10000 WHEN 'fr' THEN 10000
                     WHEN 'es' THEN 10000 WHEN 'zh' THEN 10000 ELSE 0 END""",
    "q_neyman_alloc" ->
      // Neyman n_h ∝ N_h·S_h with HUGEINT moments, exact integer sqrt
      // (double sqrt + one-ulp CASE clamps), Hamilton largest-remainder
      // apportionment, md5 hash-rank realization
      """WITH rows0 AS (
           SELECT o_orderpriority AS stratum, o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           FROM orders),
         mom AS (
           SELECT stratum, CAST(count(*) AS BIGINT) AS n_pop,
             CAST(sum(cents) AS BIGINT) AS sy,
             sum(CAST(cents AS HUGEINT) * cents) AS syy
           FROM rows0 GROUP BY 1),
         varc AS (
           SELECT stratum, n_pop,
             CAST((CAST(n_pop AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy)
                  // (CAST(n_pop AS HUGEINT) * n_pop) AS BIGINT) AS var_c2
           FROM mom),
         sq AS (
           SELECT stratum, n_pop, var_c2,
             CAST(floor(sqrt(CAST(var_c2 AS DOUBLE))) AS BIGINT) AS s0
           FROM varc),
         sstd AS (
           SELECT stratum, n_pop,
             s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= var_c2 THEN 1 ELSE 0 END)
                - (CASE WHEN s0 * s0 > var_c2 THEN 1 ELSE 0 END) AS s_cents
           FROM sq),
         wts AS (
           SELECT stratum, n_pop, s_cents, n_pop * s_cents AS w FROM sstd),
         tot AS (SELECT sum(w) AS wt FROM wts),
         based AS (
           SELECT stratum, n_pop, s_cents, w,
             (CAST(1000 AS BIGINT) * w) // wt AS base,
             (CAST(1000 AS BIGINT) * w) % wt AS rem
           FROM wts, tot),
         alloc AS (
           SELECT stratum, n_pop, s_cents,
             base + (CASE WHEN row_number() OVER (ORDER BY rem DESC, stratum)
                          <= 1000 - (SELECT sum(base) FROM based)
                     THEN 1 ELSE 0 END) AS alloc_n
           FROM based),
         ranked AS (
           SELECT stratum, cents,
             row_number() OVER (PARTITION BY stratum ORDER BY
               ('0x' || substr(md5('graft-ney-1:' || o_orderkey), 1, 15))::BIGINT,
               o_orderkey) AS rn
           FROM rows0),
         samp AS (
           SELECT r.stratum, CAST(count(*) AS BIGINT) AS n_sampled,
             CAST(sum(r.cents) AS BIGINT) AS sampled_cents
           FROM ranked r JOIN alloc a ON a.stratum = r.stratum
           WHERE r.rn <= a.alloc_n GROUP BY 1)
         SELECT a.stratum, a.n_pop, a.s_cents, CAST(a.alloc_n AS BIGINT) AS alloc_n,
           s.n_sampled, s.sampled_cents
         FROM alloc a JOIN samp s ON s.stratum = a.stratum""",
    "q_pack_sequences" ->
      """WITH t AS (
           SELECT doc_id, lang,
             CAST(len(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
               AS BIGINT) AS n_tokens
           FROM documents),
         o AS (
           SELECT doc_id, lang, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT)
               AS start_off
           FROM t)
         SELECT doc_id, lang, n_tokens, start_off,
           CAST(floor(CAST(start_off AS DOUBLE) / 4096) AS BIGINT) AS seq_first,
           CAST(floor(CAST(start_off + n_tokens - 1 AS DOUBLE) / 4096) AS BIGINT) AS seq_last,
           CAST(CAST(floor(CAST(start_off AS DOUBLE) / 4096) AS BIGINT) <>
                CAST(floor(CAST(start_off + n_tokens - 1 AS DOUBLE) / 4096) AS BIGINT) AS INT)
             AS crosses_boundary
         FROM o""",
    "q_pack_composite" ->
      """WITH t AS (
           SELECT doc_id, lang, source,
             CAST(len(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
               AS BIGINT) AS n_tokens
           FROM documents),
         o AS (
           SELECT doc_id, lang, source, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY lang, source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT)
               AS start_off
           FROM t)
         SELECT doc_id, lang, source, n_tokens, start_off,
           CAST(floor(CAST(start_off AS DOUBLE) / 4096) AS BIGINT) AS seq_first,
           CAST(floor(CAST(start_off + n_tokens - 1 AS DOUBLE) / 4096) AS BIGINT) AS seq_last,
           CAST(CAST(floor(CAST(start_off AS DOUBLE) / 4096) AS BIGINT) <>
                CAST(floor(CAST(start_off + n_tokens - 1 AS DOUBLE) / 4096) AS BIGINT) AS INT)
             AS crosses_boundary
         FROM o""",
    "q_source_cap" ->
      """SELECT doc_id, source, rank_in_source FROM (
           SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY md5('graft-cap-1' || text), doc_id) AS BIGINT) AS rank_in_source
           FROM documents)
         WHERE rank_in_source <= 10""",
    "q_value_histogram" ->
      """SELECT event_type, bucket, round(bucket * 25.0, 2) AS bucket_start, n, lo, hi
         FROM (
           SELECT event_type, CAST(floor(value / 25.0) AS BIGINT) AS bucket,
             count(*) AS n, round(min(value), 2) AS lo, round(max(value), 2) AS hi
           FROM events GROUP BY 1, 2)""",
    "q_copurchase" ->
      """SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
         FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
         JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2
         ORDER BY n_orders DESC, part_a, part_b LIMIT 25""",
    // HST density outliers: planted ×3 copies, 16 hash-determinized
    // trees × 10 half-space splits, score = summed leaf occupancy
    "q_hst_outliers" ->
      s"""WITH $hstScoreCtes
         SELECT vec_id, is_planted, score FROM hscores
         ORDER BY score, vec_id LIMIT 100""",
    "q_hst_eval" ->
      s"""WITH $hstScoreCtes,
         htot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(score) AS BIGINT) AS sum_score FROM hscores),
         hfl AS (SELECT s.*, CASE WHEN score * 2 * n < sum_score
                   THEN 1 ELSE 0 END AS flagged
                 FROM hscores s, htot)
         SELECT max(n) AS n,
           CAST(sum(is_planted) AS BIGINT) AS n_planted,
           CAST(sum(flagged * is_planted) AS BIGINT) AS n_caught,
           CAST(sum(flagged * is_planted) * 1000000 // sum(is_planted) AS BIGINT)
             AS catch_e6,
           CAST(sum(flagged * (1 - is_planted)) AS BIGINT) AS n_clean_flagged,
           CAST(sum(flagged * (1 - is_planted)) * 1000000
                // (max(n) - sum(is_planted)) AS BIGINT) AS fpr_e6,
           CAST(sum(score * is_planted) // sum(is_planted) AS BIGINT)
             AS planted_mean_score,
           CAST(sum(score * (1 - is_planted)) // (max(n) - sum(is_planted)) AS BIGINT)
             AS clean_mean_score
         FROM hfl, htot""",
    "q_mad_outliers" ->
      """WITH m AS (
           SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
           FROM events GROUP BY event_type),
         d AS (
           SELECT event_id, e.event_type, value, med, abs(value - med) AS adev
           FROM events e JOIN m USING (event_type)),
         md AS (
           SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS mad
           FROM d GROUP BY event_type),
         s AS (
           SELECT event_id, d.event_type, round(value, 2) AS value,
             CASE WHEN mad = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(floor(0.6745 * (value - med) / mad * 10000 + 0.5) AS BIGINT) END AS rscore_e4
           FROM d JOIN md USING (event_type))
         SELECT event_id, event_type, value, rscore_e4,
           CAST(abs(rscore_e4) > 35000 AS INT) AS is_outlier
         FROM s""",
    "q_cohort_retention" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) // CAST(604800000000 AS BIGINT) AS week FROM events),
         c AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id),
         a AS (SELECT cohort_week, week - cohort_week AS week_offset,
                 count(DISTINCT e.user_id) AS n_users
               FROM e JOIN c USING (user_id) GROUP BY 1, 2),
         s AS (SELECT cohort_week, count(*) AS cohort_size FROM c GROUP BY 1)
         SELECT cohort_week, week_offset, n_users, cohort_size,
           round(CAST(n_users AS DOUBLE) / cohort_size, 4) AS retention
         FROM a JOIN s USING (cohort_week)""",
    "q_neg_sample" ->
      """WITH d AS (
           SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS idx FROM documents),
         n AS (SELECT count(*) AS n_docs FROM documents),
         a AS (SELECT doc_id AS anchor_id, unnest(range(1, 5)) AS j
               FROM documents WHERE doc_id % 11 = 0),
         h AS (SELECT anchor_id, j,
                 ('0x' || substr(md5('neg-1:' || anchor_id || '-' || j), 1, 15))::BIGINT
                   % n_docs AS idx
               FROM a, n)
         SELECT anchor_id, CAST(j AS BIGINT) AS j, d.doc_id AS neg_id
         FROM h JOIN d USING (idx) WHERE d.doc_id <> anchor_id""",
    // Token-budget apportionment (#150): Hamilton largest-remainder,
    // all-integer — quotas telescope to exactly the budget.
    "q_token_budget" ->
      """WITH t AS (
           SELECT source,
             CAST(sum(len(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')))
               AS BIGINT) AS n_tokens
           FROM documents GROUP BY source),
         b AS (
           SELECT source, n_tokens,
             (n_tokens * 1000000) // (SELECT sum(n_tokens) FROM t) AS base,
             (n_tokens * 1000000) % (SELECT sum(n_tokens) FROM t) AS rem
           FROM t),
         s AS (SELECT CAST(1000000 - sum(base) AS BIGINT) AS r FROM b)
         SELECT source, n_tokens, CAST(base AS BIGINT) AS base,
           CAST(rem AS BIGINT) AS rem,
           CAST(base + CAST(row_number() OVER (ORDER BY rem DESC, source)
                 <= (SELECT r FROM s) AS BIGINT) AS BIGINT) AS quota
         FROM b""",
    "q_length_batching" ->
      // 16-token length buckets, shard-major hash order within each,
      // batches of 8, per-batch padding accounting
      """WITH d AS (
           SELECT doc_id,
             CAST(len(regexp_split_to_array(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS len,
             ('0x' || substr(md5('graft-batch-1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS ord
           FROM documents),
         r AS (
           SELECT (len + 15) // 16 AS bucket_id, len,
             row_number() OVER (PARTITION BY (len + 15) // 16
               ORDER BY ord % 8, ord, doc_id) AS rn
           FROM d),
         b AS (
           SELECT bucket_id, CAST((rn - 1) // 8 AS BIGINT) AS batch_idx, len FROM r)
         SELECT bucket_id, batch_idx, count(*) AS n_docs,
           CAST(max(len) AS BIGINT) AS max_len, CAST(sum(len) AS BIGINT) AS sum_len,
           CAST(count(*) * max(len) - sum(len) AS BIGINT) AS waste
         FROM b GROUP BY 1, 2""",
    "q_quota_fill" ->
      // Hamilton quotas on budget = total_tokens // 4, then per source
      // take docs in shard-major salted-hash order until the running
      // token total first reaches the quota (crossing doc included)
      """WITH tok AS (
           SELECT source, doc_id,
             CAST(len(regexp_split_to_array(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tok
           FROM documents),
         tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS n_total FROM tok),
         per AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM tok GROUP BY source),
         bs AS (
           SELECT source, n_tokens,
             (n_tokens * (SELECT n_total // 4 FROM tot)) // (SELECT sum(n_tokens) FROM per) AS base,
             (n_tokens * (SELECT n_total // 4 FROM tot)) % (SELECT sum(n_tokens) FROM per) AS rem
           FROM per),
         sp AS (SELECT (SELECT n_total // 4 FROM tot) - sum(base) AS r FROM bs),
         q AS (
           SELECT source,
             base + CAST(row_number() OVER (ORDER BY rem DESC, source)
                     <= (SELECT r FROM sp) AS BIGINT) AS quota
           FROM bs),
         o AS (
           SELECT source, doc_id, n_tok,
             ('0x' || substr(md5('graft-quota-1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS ord
           FROM tok),
         c AS (
           SELECT source, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY source
               ORDER BY ord % 8, ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM o)
         SELECT c.source, doc_id, n_tok, CAST(cum AS BIGINT) AS cum,
           CAST(quota AS BIGINT) AS quota
         FROM c JOIN q ON c.source = q.source
         WHERE cum - n_tok < quota""",
    "q_priority_sample" ->
      // DLT priority sampling on the 2^20 fixed-point grid: u from the
      // md5-parity hash60 kernel, prio = (w<<20) div u, top-16 per
      // source, tau = 17th priority, est = max(w<<20, tau) — all-BIGINT
      """WITH d AS (
           SELECT source, doc_id, CAST(n_chars AS BIGINT) AS w,
             ('0x' || substr(md5('graft-priority-1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 1048576 + 1 AS u
           FROM documents),
         r AS (
           SELECT source, doc_id, w, (w * 1048576) // u AS prio,
             row_number() OVER (PARTITION BY source
               ORDER BY (w * 1048576) // u DESC, doc_id) AS rn
           FROM d),
         t AS (
           SELECT source,
             coalesce(max(CASE WHEN rn = 17 THEN prio END), 0) AS tau
           FROM r WHERE rn <= 17 GROUP BY source)
         SELECT r.source, doc_id, w, prio, tau,
           greatest(w * 1048576, tau) AS est_scaled
         FROM r JOIN t ON r.source = t.source
         WHERE rn <= 16""",
    "q_mixture_weights" ->
      """WITH t AS (
           SELECT source, count(*) AS n_docs,
             CAST(sum(len(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')))
               AS BIGINT) AS n_tokens
           FROM documents GROUP BY source)
         SELECT source, n_docs, n_tokens,
           round(pow(CAST(n_tokens AS DOUBLE), 0.7) /
                 (SELECT sum(pow(CAST(n_tokens AS DOUBLE), 0.7)) FROM t), 6) AS weight
         FROM t""",
    "q_winsorize" ->
      """WITH b AS (
           SELECT event_type,
             round(quantile_cont(value, 0.05), 6) AS lo,
             round(quantile_cont(value, 0.95), 6) AS hi
           FROM events GROUP BY event_type)
         SELECT event_id, e.event_type, round(value, 2) AS value,
           round(greatest(lo, least(hi, value)), 2) AS value_w,
           CAST(value < lo OR value > hi AS INT) AS clipped
         FROM events e JOIN b USING (event_type)""",
    "q_curve_compare" -> {
      // morton mirrors Scale.morton; the hilbert walk is the same
      // 8-round xy2d fold UNROLLED as a CTE chain (s = 128..1), each
      // step's (x, y, d) computed from the previous step's columns
      val mortonSql = (0 until 8)
        .map(i =>
          s"((ca >> $i) & 1) * ${1L << (2 * i + 1)} + ((cb >> $i) & 1) * ${1L << (2 * i)}")
        .mkString(" + ")
      val hilbertSteps = (7 to 0 by -1)
        .map { k =>
          val s = 1L << k
          val prev = if (k == 7) "z" else s"l${k + 1}"
          val (px, py) = if (k == 7) ("ca", "cb") else ("x", "y")
          val pd = if (k == 7) "0" else "d"
          s"""l$k AS (SELECT o_orderkey, ca, cb, zval,
              CASE WHEN ($py & $s) > 0 THEN $px
                   WHEN ($px & $s) > 0 THEN 255 - $py ELSE $py END AS x,
              CASE WHEN ($py & $s) > 0 THEN $py
                   WHEN ($px & $s) > 0 THEN 255 - $px ELSE $px END AS y,
              $pd + ${s * s} * (CASE WHEN ($px & $s) = 0 AND ($py & $s) = 0 THEN 0
                   WHEN ($px & $s) = 0 THEN 1
                   WHEN ($py & $s) > 0 THEN 2 ELSE 3 END) AS d
            FROM $prev)"""
        }
        .mkString(",\n         ")
      s"""WITH b AS (
           SELECT o_orderkey,
             CAST(ntile(256) OVER (ORDER BY o_custkey, o_orderkey) - 1 AS BIGINT) AS ca,
             CAST(ntile(256) OVER (ORDER BY o_totalprice, o_orderkey) - 1 AS BIGINT) AS cb
           FROM orders),
         z AS (SELECT o_orderkey, ca, cb, CAST($mortonSql AS BIGINT) AS zval FROM b),
         $hilbertSteps,
         fz AS (SELECT 'zorder' AS layout, ca, cb,
                  CAST(ntile(32) OVER (ORDER BY zval, o_orderkey) AS BIGINT) AS file_id
                FROM l0),
         fh AS (SELECT 'hilbert' AS layout, ca, cb,
                  CAST(ntile(32) OVER (ORDER BY d, o_orderkey) AS BIGINT) AS file_id
                FROM l0),
         qs AS (SELECT * FROM (VALUES
                  ('box32', 64, 95, 64, 95),
                  ('box64', 128, 191, 128, 191),
                  ('stripe_ca', 32, 47, 0, 255),
                  ('stripe_cb', 0, 255, 200, 215)) AS t(query, alo, ahi, blo, bhi))
         SELECT layout, query,
           CAST(count(*) AS BIGINT) AS rows_matched,
           CAST(count(DISTINCT file_id) AS BIGINT) AS files_touched,
           CAST(32 AS BIGINT) AS total_files,
           CAST((32 - count(DISTINCT file_id)) * 1000000 // 32 AS BIGINT)
             AS prune_ratio_e6
         FROM (SELECT * FROM fz UNION ALL SELECT * FROM fh) f, qs
         WHERE ca BETWEEN alo AND ahi AND cb BETWEEN blo AND bhi
         GROUP BY layout, query"""
    },
    "q_zorder_stats" -> {
      // 16 interleave terms generated to mirror Scale.morton exactly
      val mortonSql = (0 until 8)
        .map(i =>
          s"((ca >> $i) & 1) * ${1L << (2 * i + 1)} + ((cb >> $i) & 1) * ${1L << (2 * i)}")
        .mkString(" + ")
      s"""WITH b AS (
           SELECT o_orderkey,
             CAST(ntile(256) OVER (ORDER BY o_custkey, o_orderkey) - 1 AS BIGINT) AS ca,
             CAST(ntile(256) OVER (ORDER BY o_totalprice, o_orderkey) - 1 AS BIGINT) AS cb
           FROM orders),
         z AS (SELECT o_orderkey, ca, cb, CAST($mortonSql AS BIGINT) AS zval FROM b),
         f AS (SELECT ca, cb,
                 CAST(ntile(32) OVER (ORDER BY zval, o_orderkey) AS BIGINT) AS file_id
               FROM z)
         SELECT file_id, count(*) AS n_rows,
           min(ca) AS min_cust_b, max(ca) AS max_cust_b,
           min(cb) AS min_price_b, max(cb) AS max_price_b
         FROM f GROUP BY file_id"""
    },
    "q_salted_join" ->
      """SELECT c_nationkey, count(*) AS n_events, round(sum(value), 2) AS total_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_nationkey""",
    "q_key_skew" ->
      """WITH per AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
         hist AS (SELECT c, count(*) AS n_keys FROM per GROUP BY c),
         t AS (SELECT count(*) AS n_keys_total, sum(c) AS n_rows_total, max(c) AS max_c
               FROM per)
         SELECT c, n_keys, round(c * n_keys / n_rows_total, 6) AS row_share,
           n_keys_total,
           round(max_c * n_keys_total / CAST(n_rows_total AS DOUBLE), 4) AS skew_ratio
         FROM hist, t""",
    "q_join_size_est" ->
      // AMS inner product over 2^16 hash buckets vs the exact key-
      // histogram product; overcount-only contract + e4 ratio
      """WITH s1 AS (
           SELECT ('0x' || substr(md5('graft-js-1:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
             % 65536 AS b, count(*) AS c1
           FROM events GROUP BY 1),
         s2 AS (
           SELECT ('0x' || substr(md5('graft-js-1:' || CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT
             % 65536 AS b, count(*) AS c2
           FROM orders GROUP BY 1),
         est AS (
           SELECT CAST(sum(c1 * c2) AS BIGINT) AS est_rows FROM s1 JOIN s2 USING (b)),
         ex AS (
           SELECT CAST(sum(n1 * n2) AS BIGINT) AS exact_rows FROM
             (SELECT user_id, count(*) AS n1 FROM events GROUP BY 1) e
             JOIN (SELECT o_custkey, count(*) AS n2 FROM orders GROUP BY 1) o
             ON e.user_id = o.o_custkey)
         SELECT exact_rows, est_rows,
           CAST(est_rows >= exact_rows AS BIGINT) AS overcount_only,
           (est_rows * 10000) // exact_rows AS ratio_e4
         FROM ex, est""",
    "q_shard_rendezvous" ->
      // HRW argmax over md5-parity hashes for S=8 and S=9; first-max
      // argmax via list_position == Spark array_position
      """WITH d AS (
           SELECT doc_id,
             [('0x' || substr(md5('graft-hrw-1:' || s || ':' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              for s in range(0, 8)] AS h8,
             [('0x' || substr(md5('graft-hrw-1:' || s || ':' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              for s in range(0, 9)] AS h9
           FROM documents)
         SELECT doc_id,
           CAST(list_position(h8, list_max(h8)) - 1 AS BIGINT) AS shard_a,
           CAST(list_position(h9, list_max(h9)) - 1 AS BIGINT) AS shard_b,
           CAST(list_position(h8, list_max(h8)) <> list_position(h9, list_max(h9))
             AS BIGINT) AS moved
         FROM d""",
    "q_resample_daily" ->
      """WITH ev AS (
           SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value
           FROM events),
         bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
         users AS (SELECT DISTINCT user_id FROM ev),
         cal AS (SELECT user_id,
                   CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
                 FROM users, bounds),
         agg AS (SELECT user_id, day, count(*) AS n, round(sum(value), 2) AS tv
                 FROM ev GROUP BY user_id, day)
         SELECT cal.user_id, strftime(cal.day, '%Y-%m-%d') AS day,
           coalesce(agg.n, 0) AS n_events, coalesce(agg.tv, 0.0) AS total_value
         FROM cal LEFT JOIN agg ON cal.user_id = agg.user_id AND cal.day = agg.day""",
    "q_asof_join" ->
      """WITH ord AS (
           SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
             SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
               ORDER BY o_orderkey DESC) AS rn
             FROM orders) WHERE rn = 1)
         SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts,
           o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
         FROM events e ASOF LEFT JOIN ord o
           ON e.user_id = o.o_custkey
          AND epoch_us(e.ts) >= epoch_us(o.o_orderdate)""",
    "q_range_join" ->
      """SELECT p.event_id AS p_event_id, p.user_id,
           count(c.e_ts) AS n_prior_engagements
         FROM (SELECT event_id, user_id, epoch_us(ts) AS p_ts FROM events
               WHERE event_type = 'purchase') p
         LEFT JOIN (SELECT user_id, epoch_us(ts) AS e_ts FROM events
               WHERE event_type IN ('click','view')) c
           ON c.user_id = p.user_id
          AND c.e_ts >= p.p_ts - 1800000000 AND c.e_ts <= p.p_ts
         GROUP BY p.event_id, p.user_id""",
    "q_percentiles" ->
      """SELECT c_mktsegment,
           round(quantile_cont(c_acctbal, 0.5), 2) AS p50_acctbal,
           round(quantile_cont(c_acctbal, 0.9), 2) AS p90_acctbal
         FROM customer GROUP BY c_mktsegment""",
    "q_cube_orders" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
           coalesce(o_orderpriority, '(all)') AS o_orderpriority,
           count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
    "q_pivot_orders" ->
      """SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
           count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
           count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
         FROM orders GROUP BY o_orderpriority""",
    "q_ntile_customers" ->
      """SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS c_acctbal,
           CAST(ntile(4) OVER (PARTITION BY c_mktsegment
             ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
         FROM customer""",
    "q_moment_stats" ->
      """SELECT l_returnflag,
           round(stddev_samp(l_quantity), 2) AS sd_qty,
           round(var_samp(l_quantity), 2) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price
         FROM lineitem GROUP BY l_returnflag""",
    "q2_min_cost_supplier" ->
      """WITH ps AS (
           SELECT l_partkey, l_suppkey,
             round(avg(l_extendedprice / l_quantity), 6) AS unit_price
           FROM lineitem GROUP BY l_partkey, l_suppkey)
         SELECT p.p_partkey, p.p_brand, ps.l_suppkey AS s_suppkey, ps.unit_price
         FROM part p JOIN ps ON ps.l_partkey = p.p_partkey
         WHERE p.p_size <= 10
           AND ps.unit_price = (SELECT min(ps2.unit_price) FROM ps ps2
                                WHERE ps2.l_partkey = p.p_partkey)""",
    "q17_small_qty_revenue" ->
      """SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
         FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         WHERE p.p_brand = 'Brand#1'
           AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                               WHERE l2.l_partkey = l.l_partkey)""",
    "q21_waiting_suppliers" ->
      """SELECT s.s_name, count(*) AS numwait
         FROM supplier s
         JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
         JOIN orders o ON o.o_orderkey = l1.l_orderkey
         WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
         GROUP BY s.s_name
         ORDER BY numwait DESC, s.s_name
         LIMIT 20""",
    "q_theil_sen" ->
      // median of pairwise e4 slopes, discrete lower median at rank
      // ceil(m/2) with (slope, k1, k2) tiebreak
      """WITH p AS (
           SELECT o_custkey, o_orderkey,
             CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
           FROM orders),
         pr AS (
           SELECT a.o_custkey, a.o_orderkey AS k1, b.o_orderkey AS k2,
             ((b.y - a.y) * 10000) // (b.x - a.x) AS slope_e4
           FROM p a JOIN p b ON a.o_custkey = b.o_custkey AND b.x > a.x),
         r AS (
           SELECT o_custkey, slope_e4,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY slope_e4, k1, k2) AS rn,
             count(*) OVER (PARTITION BY o_custkey) AS m
           FROM pr)
         SELECT o_custkey, CAST(m AS BIGINT) AS m,
           CAST(slope_e4 AS BIGINT) AS ts_slope_e4
         FROM r WHERE rn = (m + 1) // 2""",
    "q_weighted_percentile" ->
      // discrete quantity-weighted price percentiles: winner = the row
      // whose running-qty interval (cum-w, cum] contains the integer
      // threshold ceil(num*W/den)
      """WITH b AS (
           SELECT l_returnflag, l_orderkey, l_linenumber,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
             CAST(l_quantity AS BIGINT) AS qty
           FROM lineitem),
         c AS (
           SELECT *,
             CAST(sum(qty) OVER (PARTITION BY l_returnflag
               ORDER BY price_c, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(sum(qty) OVER (PARTITION BY l_returnflag) AS BIGINT) AS wtot
           FROM b),
         pp AS (
           SELECT unnest([{'num': 1, 'den': 4}, {'num': 1, 'den': 2},
                          {'num': 3, 'den': 4}, {'num': 9, 'den': 10}]) AS pr)
         SELECT l_returnflag, CAST(pr.num AS DOUBLE) / pr.den AS p, price_c
         FROM c, pp
         WHERE cum - qty < (pr.num * wtot + pr.den - 1) // pr.den
           AND (pr.num * wtot + pr.den - 1) // pr.den <= cum""",
    "q_ols_trend" ->
      // closed-form OLS per customer: integer day index x cents, e4
      // slope/intercept by toward-zero integer division
      """WITH p AS (
           SELECT o_custkey,
             CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
           FROM orders),
         a AS (
           SELECT o_custkey, count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
           FROM p GROUP BY o_custkey)
         SELECT o_custkey, n,
           CAST(((n * sxy - sx * sy) * 10000) // (n * sxx - sx * sx) AS BIGINT) AS slope_e4,
           CAST((sy * 10000 - (((n * sxy - sx * sy) * 10000) // (n * sxx - sx * sx)) * sx) // n
             AS BIGINT) AS intercept_e4
         FROM a
         WHERE n >= 2 AND n * sxx - sx * sx > 0""",
    "q_equidepth_hist" ->
      // rank-defined B=8 bins: bin = ((rn-1)*8) div n + 1 under the
      // (value, event_id) total order -- populations equal +-1
      """WITH r AS (
           SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
               ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM events)
         SELECT event_type, CAST((rn - 1) * 8 // n AS BIGINT) + 1 AS bin,
           count(*) AS n_rows, round(min(value), 2) AS lo, round(max(value), 2) AS hi
         FROM r GROUP BY 1, 2""",
    "q_profile_customer" ->
      """SELECT 'c_custkey' AS "column",
           count(CASE WHEN c_custkey IS NULL THEN 1 END) AS n_nulls,
           count(DISTINCT c_custkey) AS n_distinct,
           CAST(min(c_custkey) AS VARCHAR) AS min_value,
           CAST(max(c_custkey) AS VARCHAR) AS max_value FROM customer
         UNION ALL
         SELECT 'c_name', count(CASE WHEN c_name IS NULL THEN 1 END),
           count(DISTINCT c_name), CAST(min(c_name) AS VARCHAR),
           CAST(max(c_name) AS VARCHAR) FROM customer
         UNION ALL
         SELECT 'c_nationkey', count(CASE WHEN c_nationkey IS NULL THEN 1 END),
           count(DISTINCT c_nationkey), CAST(min(c_nationkey) AS VARCHAR),
           CAST(max(c_nationkey) AS VARCHAR) FROM customer
         UNION ALL
         SELECT 'c_acctbal', count(CASE WHEN c_acctbal IS NULL THEN 1 END),
           count(DISTINCT c_acctbal), CAST(min(c_acctbal) AS VARCHAR),
           CAST(max(c_acctbal) AS VARCHAR) FROM customer
         UNION ALL
         SELECT 'c_mktsegment', count(CASE WHEN c_mktsegment IS NULL THEN 1 END),
           count(DISTINCT c_mktsegment), CAST(min(c_mktsegment) AS VARCHAR),
           CAST(max(c_mktsegment) AS VARCHAR) FROM customer""",
    "q20_dominant_supplier" ->
      """SELECT s.s_suppkey, s.s_name
         FROM supplier s
         WHERE s.s_suppkey IN (
           SELECT l.l_suppkey
           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
           WHERE p.p_type = 'PROMO'
           GROUP BY l.l_partkey, l.l_suppkey
           HAVING sum(l.l_quantity) > 0.15 * (SELECT sum(l2.l_quantity)
                                              FROM lineitem l2
                                              WHERE l2.l_partkey = l.l_partkey))
         ORDER BY s.s_suppkey""",
    "q_event_gaps" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts FROM events),
         g AS (SELECT user_id,
                 lag(event_id) OVER w AS prev_event_id,
                 lag(ts) OVER w AS prev_ts,
                 event_id, ts
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT user_id, prev_event_id, event_id,
           (ts - prev_ts) // 1000000000 AS gap_sec
         FROM g
         WHERE prev_ts IS NOT NULL
           AND (ts - prev_ts) // 1000000000 >= 86400""",
    "q_rolling_median" ->
      """SELECT event_id, user_id,
           round(quantile_cont(value, 0.5) OVER (PARTITION BY user_id
             ORDER BY epoch_ns(ts)
             RANGE BETWEEN 604800000000000 PRECEDING AND CURRENT ROW), 6) AS med_7d
         FROM events""",
    "q_asof_nearest" ->
      """WITH ord AS (
           SELECT o_custkey, epoch_us(o_orderdate) AS o_ts, o_orderkey FROM (
             SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
               ORDER BY o_orderkey DESC) AS rn
             FROM orders) WHERE rn = 1),
         e AS (SELECT event_id, user_id, epoch_us(ts) AS ts FROM events),
         c AS (
           SELECT e.event_id, e.user_id, e.ts,
             max(CASE WHEN o.o_ts <= e.ts THEN o.o_ts END) AS b_t,
             min(CASE WHEN o.o_ts > e.ts THEN o.o_ts END) AS f_t
           FROM e LEFT JOIN ord o ON o.o_custkey = e.user_id
           GROUP BY e.event_id, e.user_id, e.ts),
         n AS (
           SELECT *,
             CASE WHEN b_t IS NULL AND f_t IS NULL THEN NULL
                  WHEN f_t IS NULL THEN 'b'
                  WHEN b_t IS NULL THEN 'f'
                  WHEN ts - b_t <= f_t - ts THEN 'b' ELSE 'f' END AS direction,
             CASE WHEN b_t IS NULL AND f_t IS NULL THEN NULL
                  WHEN f_t IS NULL THEN b_t
                  WHEN b_t IS NULL THEN f_t
                  WHEN ts - b_t <= f_t - ts THEN b_t ELSE f_t END AS n_t
           FROM c)
         SELECT n.event_id, n.user_id, n.ts, o.o_orderkey, n.direction,
           n.ts - n.n_t AS delta
         FROM n LEFT JOIN ord o
           ON o.o_custkey = n.user_id AND o.o_ts = n.n_t""",
    "q_percentile_disc" ->
      """WITH r AS (
           SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
               ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM events)
         SELECT event_type, p, round(value, 2) AS value
         FROM r, unnest([0.25, 0.5, 0.75, 0.95]) AS u(p)
         WHERE rn = ceil(p * n)""",
    "q4_late_priority" ->
      """SELECT o.o_orderpriority, count(*) AS order_count
         FROM orders o
         WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
           AND o.o_orderdate < TIMESTAMP '1997-01-01'
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY)
         GROUP BY o.o_orderpriority
         ORDER BY o.o_orderpriority""",
    "q11_important_stock" ->
      """SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
         FROM lineitem
         GROUP BY l_partkey
         HAVING sum(l_quantity) > (SELECT 1.5 * sum(l_quantity)
                                          / count(DISTINCT l_partkey)
                                   FROM lineitem)
         ORDER BY total_qty DESC, l_partkey""",
    "q13_cust_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c.c_custkey, count(o.o_orderkey) AS c_count
           FROM customer c
           LEFT OUTER JOIN orders o
             ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
           GROUP BY c.c_custkey)
         GROUP BY c_count
         ORDER BY custdist DESC, c_count DESC""",
    "q15_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS revenue_c
           FROM lineitem GROUP BY l_suppkey)
         SELECT s.s_suppkey, s.s_name, rev.revenue_c
         FROM supplier s JOIN rev ON rev.l_suppkey = s.s_suppkey
         WHERE rev.revenue_c = (SELECT max(revenue_c) FROM rev)
         ORDER BY s.s_suppkey""",
    "q19_disjunctive_revenue" ->
      """SELECT count(*) AS n_items,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS revenue_c
         FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
                AND l.l_quantity BETWEEN 1 AND 20)
            OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
                AND l.l_quantity BETWEEN 10 AND 40)
            OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
                AND l.l_quantity BETWEEN 20 AND 50)""",
    "q22_idle_customers" ->
      """SELECT c.c_mktsegment, count(*) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
         FROM customer c
         WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
           AND c.c_acctbal > (SELECT round(avg(c2.c_acctbal), 4)
                              FROM customer c2 WHERE c2.c_acctbal > 0)
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderdate >= TIMESTAMP '2000-07-01')
         GROUP BY c.c_mktsegment
         ORDER BY c.c_mktsegment""",
    "q_pps_sample" ->
      // hierarchical cumsum replay: per-shard running sums + shard
      // offsets; integer grid-jump picks telescope to exactly k=100
      """WITH d AS (
           SELECT doc_id, n_chars AS w,
             ('0x' || substr(md5('graft-pps-1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS ord
           FROM documents),
         s AS (SELECT *, ord % 8 AS shard FROM d),
         l AS (
           SELECT *,
             CAST(sum(w) OVER (PARTITION BY shard ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_local
           FROM s),
         st AS (SELECT shard, CAST(sum(w) AS BIGINT) AS shard_w FROM s GROUP BY shard),
         o AS (
           SELECT shard,
             CAST(coalesce(sum(shard_w) OVER (ORDER BY shard
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
           FROM st),
         t AS (SELECT CAST(sum(w) AS BIGINT) AS w_total FROM s)
         SELECT doc_id, shard, w, cum, n_picks FROM (
           SELECT l.doc_id, l.shard, l.w, l.cum_local + o.off AS cum,
             (l.cum_local + o.off) * 100 // t.w_total
               - (l.cum_local + o.off - l.w) * 100 // t.w_total AS n_picks
           FROM l JOIN o USING (shard), t)
         WHERE n_picks > 0""",
    "q_catalog_breadth" ->
      // complete month frame then cumsum; zero-new months inherit
      """WITH mp AS (
           SELECT DISTINCT
             CAST(year(CAST(o.o_orderdate AS DATE)) * 12
               + month(CAST(o.o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
             l.l_partkey
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
         act AS (SELECT m, CAST(count(*) AS BIGINT) AS n_active_parts
                 FROM mp GROUP BY 1),
         fs AS (SELECT l_partkey, min(m) AS m FROM mp GROUP BY 1),
         nw AS (SELECT m, CAST(count(*) AS BIGINT) AS n_new_parts FROM fs GROUP BY 1),
         filled AS (
           SELECT act.m, act.n_active_parts,
             CAST(coalesce(nw.n_new_parts, 0) AS BIGINT) AS n_new_parts
           FROM act LEFT JOIN nw ON nw.m = act.m)
         SELECT m AS month, n_active_parts, n_new_parts,
           CAST(sum(n_new_parts) OVER (ORDER BY m
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_catalog
         FROM filled""",
    "q_ship_delay" ->
      // rank-defined discrete p50/p90 per priority + the >60d share
      """WITH d AS (
           SELECT o.o_orderpriority AS priority, l.l_orderkey, l.l_linenumber,
             CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
               CAST(l.l_shipdate AS DATE)) AS BIGINT) AS delay
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
         r AS (
           SELECT priority, delay,
             CAST(row_number() OVER (PARTITION BY priority
               ORDER BY delay, l_orderkey, l_linenumber) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY priority) AS BIGINT) AS n
           FROM d)
         SELECT priority, max(n) AS n_lines,
           max(CASE WHEN rn = (n + 1) // 2 THEN delay END) AS p50_days,
           max(CASE WHEN rn = ((n * 9) + 9) // 10 THEN delay END) AS p90_days,
           CAST(sum(CASE WHEN delay > 60 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(sum(CASE WHEN delay > 60 THEN 1 ELSE 0 END) * 1000000
             // max(n) AS BIGINT) AS late_share_e6
         FROM r GROUP BY 1""",
    "q_link_prediction" ->
      // hub-excluded common-neighbor wedges, Jaccard e6 on uncapped
      // endpoint degrees, anti-join existing edges, total-order top-k
      s"""WITH bp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n
           FROM bp a JOIN bp b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2),
         e AS (SELECT pa, pb FROM pr WHERE n >= ${AnalyticsExt.LinkPredMinOrders}),
         d AS (
           SELECT node, CAST(count(*) AS BIGINT) AS deg
           FROM (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
           GROUP BY 1),
         adj AS (SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e),
         adjc AS (
           SELECT adj.u, adj.v FROM adj
           JOIN d ON d.node = adj.u AND d.deg <= ${AnalyticsExt.LinkPredMaxCenterDeg}),
         cn AS (
           SELECT a.v AS pa, b.v AS pb, CAST(count(*) AS BIGINT) AS cn
           FROM adjc a JOIN adjc b ON a.u = b.u AND a.v < b.v
           GROUP BY 1, 2),
         cand AS (
           SELECT cn.pa, cn.pb, cn.cn FROM cn
           WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = cn.pa AND e.pb = cn.pb))
         SELECT cand.pa, cand.pb, cand.cn, da.deg AS deg_a, db.deg AS deg_b,
           CAST(cand.cn * 1000000 // (da.deg + db.deg - cand.cn) AS BIGINT) AS jaccard_e6
         FROM cand JOIN d da ON da.node = cand.pa JOIN d db ON db.node = cand.pb
         ORDER BY jaccard_e6 DESC, cand.cn DESC, cand.pa, cand.pb
         LIMIT ${AnalyticsExt.LinkPredTopK}""",
    "q_cusum" ->
      // closed-form one-sided CUSUM: C+ = S - running min(S, 0),
      // C- = running max(S, 0) - S; sigma via one-ulp-clamp isqrt
      """WITH byday AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
                   sum(CAST(x AS HUGEINT) * x) AS sxx FROM byday),
         mu AS (SELECT sx // n AS mu,
                  (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                    // (CAST(n AS HUGEINT) * n) AS var_c
                FROM tot),
         sg AS (SELECT mu, CAST(floor(sqrt(CAST(var_c AS DOUBLE))) AS HUGEINT) AS s0, var_c
                FROM mu),
         sig AS (SELECT mu,
                   CAST(s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= var_c THEN 1 ELSE 0 END)
                           - (CASE WHEN s0 * s0 > var_c THEN 1 ELSE 0 END) AS BIGINT) AS sigma
                 FROM sg),
         s AS (SELECT d, x, sigma,
                 CAST(sum(x - mu) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s
               FROM byday, sig),
         m AS (SELECT d, x, s, sigma,
                 least(CAST(min(s) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 0) AS min_s,
                 greatest(CAST(max(s) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 0) AS max_s
               FROM s)
         SELECT d AS day, x AS rev_cents, s - min_s AS c_plus, max_s - s AS c_minus,
           CAST(4 * sigma AS BIGINT) AS h_cents,
           CAST(CASE WHEN s - min_s > 4 * sigma THEN 1 ELSE 0 END AS BIGINT) AS alarm_high,
           CAST(CASE WHEN max_s - s > 4 * sigma THEN 1 ELSE 0 END AS BIGINT) AS alarm_low
         FROM m""",
    "q_lorenz" ->
      // rank-defined deciles ((i-1)*10) div n, cumulative share in
      // HUGEINT (cum_cents * 1e6 exceeds 2^63 at corpus scale)
      """WITH per AS (
           SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS total_cents FROM per),
         r AS (SELECT x,
                 CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT) AS i
               FROM per),
         dec AS (SELECT ((i - 1) * 10) // n AS decile,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(sum(x) AS BIGINT) AS decile_cents
                 FROM r, tot GROUP BY 1)
         SELECT decile, n_customers, decile_cents,
           CAST(sum(decile_cents) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents,
           CAST(CAST(sum(decile_cents) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) * 1000000
             // CAST(total_cents AS HUGEINT) AS BIGINT) AS cum_share_e6
         FROM dec, tot""",
    "q_did" ->
      // 2x2 diff-in-differences on the cents grid, data-derived
      // midpoint split, floor-division means
      """WITH dd AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS BIGINT) AS day
           FROM orders),
         split AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM dd),
         lines AS (
           SELECT CAST(p.p_type LIKE 'PROMO%' AS BIGINT) AS treated,
             CAST(CAST(date_diff('day', DATE '1970-01-01',
               CAST(o.o_orderdate AS DATE)) AS BIGINT) >= split.mid AS BIGINT) AS period,
             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS c
           FROM lineitem l
           JOIN orders o ON o.o_orderkey = l.l_orderkey
           JOIN part p ON p.p_partkey = l.l_partkey, split),
         agg AS (
           SELECT
             CAST(count(CASE WHEN treated = 1 AND period = 0 THEN 1 END) AS BIGINT) AS n_t0,
             CAST(count(CASE WHEN treated = 1 AND period = 1 THEN 1 END) AS BIGINT) AS n_t1,
             CAST(count(CASE WHEN treated = 0 AND period = 0 THEN 1 END) AS BIGINT) AS n_c0,
             CAST(count(CASE WHEN treated = 0 AND period = 1 THEN 1 END) AS BIGINT) AS n_c1,
             CAST(sum(CASE WHEN treated = 1 AND period = 0 THEN c END) AS BIGINT) AS s_t0,
             CAST(sum(CASE WHEN treated = 1 AND period = 1 THEN c END) AS BIGINT) AS s_t1,
             CAST(sum(CASE WHEN treated = 0 AND period = 0 THEN c END) AS BIGINT) AS s_c0,
             CAST(sum(CASE WHEN treated = 0 AND period = 1 THEN c END) AS BIGINT) AS s_c1
           FROM lines)
         SELECT n_t0, n_t1, n_c0, n_c1,
           s_t0 // n_t0 AS mean_t0_cents, s_t1 // n_t1 AS mean_t1_cents,
           s_c0 // n_c0 AS mean_c0_cents, s_c1 // n_c1 AS mean_c1_cents,
           (s_t1 // n_t1 - s_t0 // n_t0) - (s_c1 // n_c1 - s_c0 // n_c0) AS did_cents
         FROM agg""",
    "q_ind_discovery" -> indDiscoveryOracle,
    "q_mann_whitney" ->
      // doubled-midrank grid (2*midrank = 2*cum_below + t + 1), tie-
      // corrected variance in HUGEINT, one-ulp-clamp isqrt, sign
      // extracted before the div
      """WITH lines AS (
           SELECT CAST(p.p_type LIKE 'PROMO%' AS BIGINT) AS t,
             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS c
           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
         bv AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(t) AS BIGINT) AS cnt1
                FROM lines GROUP BY 1),
         cu AS (SELECT c, cnt, cnt1,
                  CAST(coalesce(sum(cnt) OVER (ORDER BY c
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
                FROM bv),
         agg AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(cnt1) AS BIGINT) AS n1,
                   CAST(sum(cnt1 * (2 * cum + cnt + 1)) AS BIGINT) AS r1_2x,
                   sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie_t
                 FROM cu),
         st AS (SELECT n1, n - n1 AS n2, n, r1_2x - n1 * (n1 + 1) AS u1_2x, tie_t FROM agg),
         vv AS (SELECT *, (CAST(n1 AS HUGEINT) * (n - n1)
                   * (CAST(n + 1 AS HUGEINT) * n * (n - 1) - tie_t))
                   // (12 * CAST(n AS HUGEINT) * (n - 1)) AS var_u
                FROM st),
         sg AS (SELECT *, CAST(floor(sqrt(CAST(var_u AS DOUBLE))) AS HUGEINT) AS s0 FROM vv),
         si AS (SELECT *, s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= var_u THEN 1 ELSE 0 END)
                  - (CASE WHEN s0 * s0 > var_u THEN 1 ELSE 0 END) AS sigma
                FROM sg)
         SELECT n1, n2, u1_2x,
           CAST(CAST(u1_2x AS HUGEINT) * 1000000
             // (2 * CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS cl_e6,
           CAST((CASE WHEN u1_2x >= n1 * n2 THEN 1 ELSE -1 END)
             * (abs(CAST(u1_2x AS HUGEINT) - CAST(n1 AS HUGEINT) * n2) * 1000000
                // (2 * sigma)) AS BIGINT) AS z_e6
         FROM si""",
    "q_bloom_fpr" ->
      // the hash60 bit array replayed as a distinct-position set;
      // a probe is a false positive iff all k of its rows hit
      """WITH dim AS (SELECT c_custkey AS key FROM customer
                      WHERE c_mktsegment = 'BUILDING'),
         nk AS (SELECT CAST(count(*) AS BIGINT) AS n_keys FROM dim),
         setbits AS (
           SELECT DISTINCT
             ('0x' || substr(md5('graft-bloom-' || i || ':' || CAST(key AS VARCHAR)), 1, 15))
               ::BIGINT % 16384 AS pos
           FROM dim, range(1, 4) AS r(i)),
         probes AS (SELECT -(i + 1) AS key FROM range(100000) AS t(i)),
         pp AS (
           SELECT p.key,
             ('0x' || substr(md5('graft-bloom-' || i || ':' || CAST(p.key AS VARCHAR)), 1, 15))
               ::BIGINT % 16384 AS pos
           FROM probes p, range(1, 4) AS r(i)),
         hits AS (SELECT key, CAST(count(*) AS BIGINT) AS nhit
                  FROM pp WHERE pos IN (SELECT pos FROM setbits) GROUP BY 1),
         fp AS (SELECT CAST(count(*) AS BIGINT) AS n_false_pos FROM hits WHERE nhit = 3)
         SELECT CAST(16384 AS BIGINT) AS m_bits, CAST(3 AS BIGINT) AS k, n_keys,
           CAST(100000 AS BIGINT) AS n_probes, n_false_pos,
           CAST(n_false_pos * 1000000 // 100000 AS BIGINT) AS fpr_e6,
           CAST(floor(power(1.0 - exp(-CAST(3 * n_keys AS DOUBLE) / 16384), 3)
             * 1000000 + 0.5) AS BIGINT) AS theory_e6
         FROM nk, fp""",
    "q_revenue_bridge" ->
      // p = rev div qty reconstructed grid; the waterfall identity
      // telescopes exactly on it (algebra, no rounding slack)
      """WITH pm AS (
           SELECT l_partkey,
             CAST(year(CAST(l_shipdate AS DATE)) * 12
                + month(CAST(l_shipdate AS DATE)) - 1 AS BIGINT) AS m,
             CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS q,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS r
           FROM lineitem GROUP BY 1, 2),
         pp AS (SELECT l_partkey, m, q, r // q AS p FROM pm WHERE q >= 1),
         months AS (SELECT DISTINCT m FROM pp),
         valid AS (SELECT m FROM months WHERE m - 1 IN (SELECT m FROM months)),
         j AS (
           SELECT coalesce(c.m, pv.m + 1) AS m,
             c.q AS q1, c.p AS p1, pv.q AS q0, pv.p AS p0
           FROM pp c FULL OUTER JOIN pp pv
             ON pv.l_partkey = c.l_partkey AND pv.m = c.m - 1)
         SELECT m AS month,
           CAST(sum(coalesce(p1 * q1, 0)) - sum(coalesce(p0 * q0, 0)) AS BIGINT)
             AS total_delta_cents,
           CAST(sum(CASE WHEN q0 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN q0 IS NULL THEN p1 * q1 ELSE 0 END) AS BIGINT) AS new_rev,
           CAST(sum(CASE WHEN q1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
           CAST(sum(CASE WHEN q1 IS NULL THEN p0 * q0 ELSE 0 END) AS BIGINT) AS churned_rev,
           CAST(sum(CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL
                THEN (p1 - p0) * q0 ELSE 0 END) AS BIGINT) AS price_effect,
           CAST(sum(CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL
                THEN (q1 - q0) * p0 ELSE 0 END) AS BIGINT) AS volume_effect,
           CAST(sum(CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL
                THEN (p1 - p0) * (q1 - q0) ELSE 0 END) AS BIGINT) AS cross_effect
         FROM j WHERE m IN (SELECT m FROM valid)
         GROUP BY 1""",
    "q_psi" ->
      // first-week baseline, add-half-count smoothing as integer
      // ratios (2c+1)/(2n+B), e6-quantized float terms
      """WITH ev AS (SELECT event_type, epoch_ns(ts) // 604800000000000 AS week,
                       CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
         b AS (SELECT min(c) AS lo, max(c) AS hi, min(week) AS w0 FROM ev),
         binned AS (SELECT event_type, week - w0 AS week_idx,
                      ((c - lo) * 10) // (hi - lo + 1) AS bin FROM ev, b),
         cells AS (SELECT event_type, week_idx, bin, CAST(count(*) AS BIGINT) AS cnt
                   FROM binned GROUP BY 1, 2, 3),
         wt AS (SELECT event_type, week_idx, CAST(sum(cnt) AS BIGINT) AS n_w
                FROM cells GROUP BY 1, 2),
         grid AS (
           SELECT wt.event_type, wt.week_idx, g.bin, coalesce(c.cnt, 0) AS cnt, wt.n_w
           FROM wt CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) g
           LEFT JOIN cells c ON c.event_type = wt.event_type
             AND c.week_idx = wt.week_idx AND c.bin = g.bin),
         base AS (SELECT event_type, bin, cnt AS cnt0, n_w AS n_0
                  FROM grid WHERE week_idx = 0),
         terms AS (
           SELECT g.event_type, g.week_idx, g.n_w,
             CAST(floor((
                 (CAST(g.cnt * 2 + 1 AS DOUBLE) / (g.n_w * 2 + 10))
               - (CAST(b2.cnt0 * 2 + 1 AS DOUBLE) / (b2.n_0 * 2 + 10)))
               * ln((CAST(g.cnt * 2 + 1 AS DOUBLE) / (g.n_w * 2 + 10))
                    / (CAST(b2.cnt0 * 2 + 1 AS DOUBLE) / (b2.n_0 * 2 + 10)))
               * 1e6 + 0.5) AS BIGINT) AS term_e6
           FROM grid g JOIN base b2 ON b2.event_type = g.event_type AND b2.bin = g.bin
           WHERE g.week_idx > 0)
         SELECT event_type, week_idx, CAST(max(n_w) AS BIGINT) AS n_events,
           CAST(sum(term_e6) AS BIGINT) AS psi_e6,
           CAST(sum(term_e6) > 100000 AS BIGINT) AS flag_watch,
           CAST(sum(term_e6) > 250000 AS BIGINT) AS flag_act
         FROM terms GROUP BY 1, 2""",
    "q_split_balance" ->
      // pairwise KS on the #190 cross-multiplied integer grid, split
      // buckets = #54's raw-text md5 rule
      """WITH sp AS (
           SELECT doc_id,
             CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
           FROM (SELECT doc_id,
                   CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 100 AS b
                 FROM documents)),
         d AS (SELECT sp.split, CAST(n_chars AS BIGINT) AS len
               FROM sp JOIN documents USING (doc_id)),
         pairs(pair, pa, pb) AS (VALUES ('train|val', 'train', 'val'),
           ('train|test', 'train', 'test'), ('val|test', 'val', 'test')),
         tagged AS (SELECT p.pair, CAST(d.split = p.pa AS BIGINT) AS is_a, d.len
                    FROM pairs p JOIN d ON d.split = p.pa OR d.split = p.pb),
         bl AS (SELECT pair, len, CAST(sum(is_a) AS BIGINT) AS ca,
                  CAST(sum(1 - is_a) AS BIGINT) AS cb
                FROM tagged GROUP BY 1, 2),
         tot AS (SELECT pair, CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b
                 FROM bl GROUP BY 1),
         cum AS (SELECT pair, len,
                   CAST(sum(ca) OVER (PARTITION BY pair ORDER BY len) AS BIGINT) AS cum_a,
                   CAST(sum(cb) OVER (PARTITION BY pair ORDER BY len) AS BIGINT) AS cum_b
                 FROM bl),
         dm AS (SELECT c.pair, t.n_a, t.n_b,
                  CAST(max(abs(c.cum_a * t.n_b - c.cum_b * t.n_a)) AS BIGINT) AS d_max
                FROM cum c JOIN tot t USING (pair) GROUP BY 1, 2, 3)
         SELECT pair, n_a, n_b,
           CAST(CAST(d_max AS HUGEINT) * 1000000 // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
             AS ks_e6
         FROM dm""",
    "q_tukey_fences" ->
      """WITH vals AS (SELECT o_orderpriority AS g, o_orderkey,
                         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c FROM orders),
         r AS (SELECT g, c,
                 CAST(row_number() OVER (PARTITION BY g ORDER BY c, o_orderkey) AS BIGINT) AS rn,
                 CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS nn
               FROM vals),
         q AS (SELECT g, CAST(max(nn) AS BIGINT) AS n,
                 max(CASE WHEN rn = (nn + 3) // 4 THEN c END) AS q1,
                 max(CASE WHEN rn = (3 * nn + 3) // 4 THEN c END) AS q3
               FROM r GROUP BY 1),
         f AS (SELECT g, n, q1, q3, q3 - q1 AS iqr,
                 q1 - (3 * (q3 - q1)) // 2 AS lo_fence,
                 q3 + (3 * (q3 - q1)) // 2 AS hi_fence
               FROM q)
         SELECT f.g AS priority, f.n, f.q1, f.q3, f.iqr, f.lo_fence, f.hi_fence,
           CAST(sum(CASE WHEN v.c < f.lo_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
           CAST(sum(CASE WHEN v.c > f.hi_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
           CAST((sum(CASE WHEN v.c < f.lo_fence THEN 1 ELSE 0 END)
                 + sum(CASE WHEN v.c > f.hi_fence THEN 1 ELSE 0 END)) * 1000000 // f.n
             AS BIGINT) AS outlier_rate_e6
         FROM vals v JOIN f ON f.g = v.g
         GROUP BY 1, 2, 3, 4, 5, 6, 7""",
    "q_return_wilson" ->
      // z^2=4 Wilson lower bound, isqrt on the e6 grid (e3 precision)
      """WITH per AS (
           SELECT l_suppkey AS suppkey, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returns
           FROM lineitem GROUP BY 1),
         sc AS (SELECT *, CAST(n_returns AS HUGEINT) * (n_lines - n_returns) * 1000000
                  // n_lines + 1000000 AS inner_e6 FROM per),
         s1 AS (SELECT *, CAST(floor(sqrt(CAST(inner_e6 AS DOUBLE))) AS HUGEINT) AS s0 FROM sc),
         s2 AS (SELECT *, s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= inner_e6 THEN 1 ELSE 0 END)
                  - (CASE WHEN s0 * s0 > inner_e6 THEN 1 ELSE 0 END) AS sq_e3 FROM s1),
         s3 AS (SELECT suppkey, n_lines, n_returns,
                  CAST(n_returns * 1000000 // n_lines AS BIGINT) AS rate_e6,
                  CAST(((n_returns + 2) * 1000000 - 2 * sq_e3 * 1000) // (n_lines + 4) AS BIGINT)
                    AS wilson_lb_e6
                FROM s2)
         SELECT rank, suppkey, n_lines, n_returns, rate_e6, wilson_lb_e6 FROM (
           SELECT *, CAST(row_number() OVER (ORDER BY wilson_lb_e6 DESC, suppkey) AS BIGINT)
             AS rank FROM s3)
         WHERE rank <= 25""",
    "q_interarrival" ->
      // per-(user,type) lag gaps; equal-ts runs yield the same gap
      // multiset under any stable order, so percentiles are exact
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         g AS (SELECT event_type,
                 ts_us - lag(ts_us) OVER (PARTITION BY user_id, event_type
                   ORDER BY ts_us, user_id) AS gap_us
               FROM ev),
         g2 AS (SELECT event_type, gap_us FROM g WHERE gap_us IS NOT NULL),
         r AS (SELECT event_type, gap_us,
                 CAST(row_number() OVER (PARTITION BY event_type
                   ORDER BY gap_us, event_type) AS BIGINT) AS rn,
                 CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
               FROM g2)
         SELECT event_type, CAST(max(n) AS BIGINT) AS n_gaps,
           CAST(sum(gap_us) // max(n) AS BIGINT) AS mean_us,
           max(CASE WHEN rn = (n + 1) // 2 THEN gap_us END) AS p50_us,
           max(CASE WHEN rn = (9 * n + 9) // 10 THEN gap_us END) AS p90_us,
           max(CASE WHEN rn = (99 * n + 99) // 100 THEN gap_us END) AS p99_us
         FROM r GROUP BY 1""",
    "q_split_gain" ->
      // equal-width bins, prefix counts, one truncation per Gini side
      """WITH o AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
                      CAST(o_orderstatus = 'F' AS BIGINT) AS y FROM orders),
         b AS (SELECT min(v) AS lo, max(v) AS hi FROM o),
         bins AS (SELECT ((v - lo) * 10) // (hi - lo + 1) AS bin,
                    CAST(count(*) AS BIGINT) AS n_b, CAST(sum(y) AS BIGINT) AS pos_b
                  FROM o, b GROUP BY 1),
         tot AS (SELECT CAST(sum(n_b) AS BIGINT) AS n, CAST(sum(pos_b) AS BIGINT) AS pos
                 FROM bins),
         cum AS (SELECT bin, CAST(sum(n_b) OVER (ORDER BY bin) AS BIGINT) AS nl,
                   CAST(sum(pos_b) OVER (ORDER BY bin) AS BIGINT) AS pl FROM bins),
         g AS (SELECT bin AS threshold_bin, nl, pl, n - nl AS nr, pos - pl AS pr, n, pos
               FROM cum, tot WHERE bin < 9),
         sc AS (SELECT threshold_bin, nl AS n_left, pl AS pos_left, nr AS n_right,
                  pr AS pos_right,
                  (1000000 - CAST((CAST(pos AS HUGEINT) * pos
                       + CAST(n - pos AS HUGEINT) * (n - pos)) * 1000000
                     // (CAST(n AS HUGEINT) * n) AS BIGINT)) AS gini_parent_e6,
                  CAST((CAST(nl AS HUGEINT) * (CASE WHEN nl > 0 THEN
                          1000000 - CAST((CAST(pl AS HUGEINT) * pl
                              + CAST(nl - pl AS HUGEINT) * (nl - pl)) * 1000000
                            // (CAST(nl AS HUGEINT) * nl) AS BIGINT) ELSE 0 END)
                      + CAST(nr AS HUGEINT) * (CASE WHEN nr > 0 THEN
                          1000000 - CAST((CAST(pr AS HUGEINT) * pr
                              + CAST(nr - pr AS HUGEINT) * (nr - pr)) * 1000000
                            // (CAST(nr AS HUGEINT) * nr) AS BIGINT) ELSE 0 END))
                    // n AS BIGINT) AS gini_split_e6
                FROM g)
         SELECT threshold_bin, n_left, pos_left, n_right, pos_right,
           gini_parent_e6, gini_split_e6,
           CAST(gini_parent_e6 - gini_split_e6 AS BIGINT) AS gain_e6,
           CAST(row_number() OVER (ORDER BY gini_parent_e6 - gini_split_e6 DESC, threshold_bin)
             = 1 AS BIGINT) AS is_best
         FROM sc"""
  )
}
