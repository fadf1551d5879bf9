package graft

import graft.operators._

/** CDC core: envelope parses, SCD, compaction, IVM, audits — split verbatim out of SparkEntry.oracleSql
  * (r10 file-size refactor); the assembled map is identical.
  */
private[graft] trait OracleCdc { this: SparkEntryOracleHelpers =>
  protected def oracleCdc: Map[String, String] = Map(
    "cdc_schema_drift" ->
      // planted-evolution feed replayed as direct key lists (the
      // Spark side round-trips real JSON through json_object_keys —
      // the hash match proves detector ≡ construction)
      """WITH ev AS (
           SELECT epoch_us(ts) // 86400000000 AS day FROM events),
         b AS (
           SELECT min(day) + (max(day) - min(day) + 1) // 3 AS t1,
             min(day) + 2 * ((max(day) - min(day) + 1) // 3) AS t2
           FROM ev),
         feed AS (
           SELECT day,
             CASE WHEN day < t1 THEN ['id', 'user_id', 'amount']
                  WHEN day < t2 THEN ['id', 'user_id', 'amount', 'channel']
                  ELSE ['id', 'user_id', 'amount_cents', 'channel'] END AS ks
           FROM ev, b),
         perday AS (
           SELECT day, CAST(count(*) AS BIGINT) AS day_msgs FROM feed GROUP BY 1),
         keyed AS (SELECT unnest(ks) AS k, day FROM feed),
         ka AS (
           SELECT k, CAST(min(day) AS BIGINT) AS first_day,
             CAST(max(day) AS BIGINT) AS last_day,
             CAST(count(DISTINCT day) AS BIGINT) AS active_days,
             CAST(count(*) AS BIGINT) AS n_msgs
           FROM keyed GROUP BY 1),
         st AS (
           SELECT ka.k, CAST(sum(p.day_msgs) AS BIGINT) AS span_msgs
           FROM ka JOIN perday p ON p.day BETWEEN ka.first_day AND ka.last_day
           GROUP BY 1)
         SELECT ka.k AS key, first_day, last_day, active_days, n_msgs,
           CAST(n_msgs * 1000000 // span_msgs AS BIGINT) AS presence_e6
         FROM ka JOIN st ON st.k = ka.k""",
    "cdc_classify" ->
      """SELECT event_id, epoch_us(ts) AS ts, user_id,
         CASE WHEN event_type = 'signup' THEN 'INSERT'
              WHEN event_type = 'error' THEN 'DELETE'
              ELSE 'UPDATE' END AS op,
         round(value, 2) AS value
         FROM events""",
    "cdc_history" ->
      """WITH c AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             round(value, 2) AS value
           FROM events)
         SELECT event_id, ts, user_id, op AS change_type, value,
           last_value(CASE WHEN op = 'INSERT' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS original_value
         FROM c""",
    "cdc_current" ->
      """SELECT user_id, event_id AS last_event_id, epoch_us(ts) AS last_ts,
           round(value, 2) AS value
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1 AND event_type <> 'error'""",
    "cdc_stats" ->
      """SELECT user_id, count(*) AS n_changes,
           count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_inserts,
           count(CASE WHEN event_type NOT IN ('signup','error') THEN 1 END) AS n_updates,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS n_deletes,
           epoch_us(min(ts)) AS first_ts, epoch_us(max(ts)) AS last_ts,
           round(sum(round(value, 2)), 2) AS total_value
         FROM events GROUP BY user_id""",
    "cdc_dedup_redelivery" ->
      """WITH redelivered AS (
           SELECT event_id, ts, user_id, event_type, value FROM events
           UNION ALL
           SELECT event_id, ts, user_id, event_type, value FROM events
           WHERE event_id % 10 = 0)
         SELECT event_id, epoch_us(ts) AS ts, user_id, event_type,
           round(min(value), 2) AS value, count(*) AS n_deliveries
         FROM redelivered GROUP BY event_id, ts, user_id, event_type""",
    "cdc_scd2" ->
      """WITH c AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             round(value, 2) AS value
           FROM events)
         SELECT user_id, event_id, op AS change_type, value,
           ts AS valid_from,
           lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           CAST(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                AND op <> 'DELETE' AS INT) AS is_current
         FROM c""",
    "cdc_compact" ->
      """SELECT user_id,
           CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPSERT' END AS net_op,
           event_id AS last_event_id, epoch_us(ts) AS last_ts,
           round(value, 2) AS value
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1""",
    "cdc_envelope_parse" ->
      """WITH c AS (
           SELECT event_id AS id, user_id, props AS account,
             epoch_us(ts) AS registered_at,
             CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END AS __deleted
           FROM events)
         SELECT id, user_id, account, registered_at,
           CASE WHEN __deleted = 'true' THEN 'DELETE'
                WHEN rn = 1 THEN 'INSERT' ELSE 'UPDATE' END AS op
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY user_id, (__deleted = 'true')
                  ORDER BY registered_at, id) AS rn
               FROM c)""",
    // Avro path: wire format is invisible to the oracle — DuckDB
    // replays the SEMANTICS (same SQL as cdc_envelope_parse), so a
    // hash match proves the Avro binary round trip lossless
    "cdc_avro_parse" ->
      """WITH c AS (
           SELECT event_id AS id, user_id, props AS account,
             epoch_us(ts) AS registered_at,
             CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END AS __deleted
           FROM events)
         SELECT id, user_id, account, registered_at,
           CASE WHEN __deleted = 'true' THEN 'DELETE'
                WHEN rn = 1 THEN 'INSERT' ELSE 'UPDATE' END AS op
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY user_id, (__deleted = 'true')
                  ORDER BY registered_at, id) AS rn
               FROM c)""",
    "cdc_maxwell_parse" ->
      """SELECT event_id AS id, user_id, props AS account,
           (epoch_us(ts) // 1000000) * 1000000 AS registered_at,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS op
         FROM events""",
    "cdc_snapshot_diff" ->
      """WITH snap_before AS (
           SELECT user_id, event_id AS old_event_id, round(value, 2) AS old_value
           FROM (SELECT *, row_number() OVER
                   (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE event_id < 5000)
           WHERE rn = 1 AND event_type <> 'error'),
         snap_after AS (
           SELECT user_id, event_id AS new_event_id, round(value, 2) AS new_value
           FROM (SELECT *, row_number() OVER
                   (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events)
           WHERE rn = 1 AND event_type <> 'error')
         SELECT coalesce(b.user_id, a.user_id) AS user_id,
           CASE WHEN b.old_event_id IS NULL THEN 'ADDED'
                WHEN a.new_event_id IS NULL THEN 'REMOVED'
                WHEN b.old_event_id <> a.new_event_id THEN 'CHANGED'
                ELSE 'UNCHANGED' END AS diff,
           b.old_event_id, a.new_event_id, b.old_value, a.new_value
         FROM snap_before b FULL OUTER JOIN snap_after a ON b.user_id = a.user_id""",
    "cdc_merge_incremental" ->
      """SELECT user_id, event_id AS last_event_id, epoch_us(ts) AS last_ts,
           round(value, 2) AS value
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1 AND event_type <> 'error'""",
    "cdc_ooo_repair" -> {
      // planted late delivery replayed with the same three windows;
      // delay interpolated from the shared OooDelayOffsets constant
      s"""WITH c AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             round(value, 2) AS value,
             event_id + CASE WHEN event_id % 7 = 3
                             THEN $OooDelayOffsets ELSE 0 END AS arrival_seq
           FROM events),
         w AS (
           SELECT *,
             row_number() OVER (PARTITION BY user_id
               ORDER BY arrival_seq DESC, event_id DESC) AS rn_arrival,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn_ts,
             lag(ts) OVER (PARTITION BY user_id
               ORDER BY arrival_seq, event_id) AS prev_ts
           FROM c),
         a AS (
           SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_changes,
             CAST(sum(CASE WHEN prev_ts IS NOT NULL AND ts < prev_ts
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_inversions,
             max(CASE WHEN rn_arrival = 1 THEN event_id END) AS naive_event_id,
             max(CASE WHEN rn_arrival = 1 THEN op END) AS naive_op,
             max(CASE WHEN rn_arrival = 1 THEN value END) AS naive_value,
             max(CASE WHEN rn_ts = 1 THEN event_id END) AS repaired_event_id,
             max(CASE WHEN rn_ts = 1 THEN op END) AS repaired_op,
             max(CASE WHEN rn_ts = 1 THEN value END) AS repaired_value
           FROM w GROUP BY user_id)
         SELECT * FROM a WHERE naive_event_id <> repaired_event_id"""
    },
    "cdc_hot_keys" ->
      """WITH per AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_changes
                      FROM events GROUP BY 1),
         tot AS (SELECT CAST(sum(n_changes) AS BIGINT) AS n_total,
                   CAST(count(*) AS BIGINT) AS n_keys FROM per),
         rk AS (SELECT *, CAST(row_number() OVER (ORDER BY n_changes DESC, user_id) AS BIGINT)
                  AS rank FROM per)
         SELECT rank, user_id, n_changes,
           CAST(n_changes * 1000000 // n_total AS BIGINT) AS share_e6,
           CAST(sum(n_changes) OVER (ORDER BY rank) * 1000000 // n_total AS BIGINT)
             AS cum_share_e6,
           n_keys, n_total
         FROM rk, tot WHERE rank <= 10""",
    "cdc_scd3" ->
      """WITH c AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             round(value, 2) AS value
           FROM events),
         w AS (
           SELECT *,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
           FROM c)
         SELECT user_id, value AS current_value, prev_value,
           ts AS last_ts, event_id AS last_event_id
         FROM w WHERE rn = 1 AND op <> 'DELETE'""",
    "cdc_scd2_lookup" ->
      """WITH c AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             round(value, 2) AS value
           FROM events),
         sd AS (
           SELECT user_id, valid_from, event_id, change_type, value FROM (
             SELECT user_id, ts AS valid_from, event_id, op AS change_type, value,
               row_number() OVER (PARTITION BY user_id, ts
                 ORDER BY event_id DESC) AS rn
             FROM c) WHERE rn = 1),
         o AS (SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS o_ts FROM orders)
         SELECT o.o_orderkey, o.o_custkey, o.o_ts,
           sd.event_id AS dim_event_id, sd.change_type AS dim_change_type,
           sd.value AS dim_value
         FROM o ASOF LEFT JOIN sd
           ON sd.user_id = o.o_custkey AND o.o_ts >= sd.valid_from""",
    "cdc_sequence_audit" ->
      // liveness via the integer marker trick: last INSERT/DELETE row's
      // rn*2+isInsert, max over preceding rows, parity = live
      """WITH c AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op
           FROM events),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS rn
           FROM c),
         m AS (
           SELECT *, max(CASE WHEN op <> 'UPDATE'
               THEN rn * 2 + CASE WHEN op = 'INSERT' THEN 1 ELSE 0 END END)
             OVER (PARTITION BY user_id ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lm
           FROM r)
         SELECT op,
           CASE WHEN op = 'INSERT' AND lm IS NOT NULL AND lm % 2 = 1
                  THEN 'double_insert'
                WHEN op = 'UPDATE' AND (lm IS NULL OR lm % 2 = 0)
                  THEN 'update_while_absent'
                WHEN op = 'DELETE' AND (lm IS NULL OR lm % 2 = 0)
                  THEN 'delete_while_absent'
                ELSE 'ok' END AS violation,
           count(*) AS n, count(DISTINCT user_id) AS n_keys
         FROM m GROUP BY 1, 2""",
    "cdc_ivm_agg" ->
      // the INDEPENDENT from-scratch recompute: a hash-MATCH against
      // the Spark side's base+delta maintenance IS the IVM theorem
      """WITH c AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             round(value, 2) AS value
           FROM events),
         s AS (
           SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) AS rk
           FROM c)
         SELECT user_id % 16 AS bucket, count(*) AS n_live,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_value_cents
         FROM s WHERE rk = 1 AND op <> 'DELETE'
         GROUP BY 1""",
    "cdc_state_ttl" ->
      """WITH lastk AS (
           SELECT user_id, max(epoch_us(ts)) AS last_ts, count(*) AS n_changes
           FROM events GROUP BY user_id),
         h AS (SELECT max(last_ts) AS head_ts FROM lastk),
         x AS (
           SELECT hd.horizon_days,
             CASE WHEN last_ts >= head_ts - hd.horizon_days * 86400000000
               THEN 1 ELSE 0 END AS retained,
             n_changes
           FROM lastk, h, (VALUES (7), (30), (90)) hd(horizon_days))
         SELECT CAST(horizon_days AS BIGINT) AS horizon_days,
           CAST(sum(retained) AS BIGINT) AS n_keys_retained,
           CAST(sum(1 - retained) AS BIGINT) AS n_keys_expired,
           CAST(sum(retained * n_changes) AS BIGINT) AS n_changes_retained
         FROM x GROUP BY 1""",
    "cdc_watermark_lateness" ->
      // the flat global prefix-max over the planted-jitter arrival
      // order: the Spark side's sharded hierarchy must equal this
      // exactly
      """WITH e AS (SELECT event_id, epoch_us(ts) AS ts FROM events),
         a AS (
           SELECT *, ts + ('0x' || substr(md5('graft-wm:' || event_id), 1, 15))::BIGINT
             % 7200000001 AS arr
           FROM e),
         p AS (
           SELECT ts, max(ts) OVER (ORDER BY arr, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior
           FROM a),
         l AS (
           SELECT CASE WHEN prior IS NULL OR prior <= ts THEN 0
                       ELSE prior - ts END AS lat
           FROM p)
         SELECT CASE WHEN lat = 0 THEN 'on_time'
                     WHEN lat <= 60000000 THEN 'under_1m'
                     WHEN lat <= 3600000000 THEN 'under_1h'
                     WHEN lat <= 86400000000 THEN 'under_1d'
                     ELSE 'over_1d' END AS bucket,
           count(*) AS n_events, CAST(max(lat) AS BIGINT) AS max_lateness_us
         FROM l GROUP BY 1""",
    "cdc_scd2_align" ->
      """WITH ch AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             round(value, 2) AS value
           FROM events),
         h AS (SELECT max(ts) + 1 AS h FROM ch),
         va AS (
           SELECT user_id, ts AS valid_from,
             coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                      (SELECT h FROM h)) AS valid_to,
             value AS acct_value
           FROM ch
           WHERE op = 'INSERT' OR (op = 'UPDATE' AND event_id % 2 = 0)),
         vb AS (
           SELECT user_id, ts AS valid_from,
             coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                      (SELECT h FROM h)) AS valid_to,
             value AS engagement_value
           FROM ch WHERE op = 'UPDATE' AND event_id % 2 = 1)
         SELECT a.user_id,
           greatest(a.valid_from, b.valid_from) AS seg_from,
           least(a.valid_to, b.valid_to) AS seg_to,
           a.acct_value, b.engagement_value
         FROM va a
         JOIN vb b ON a.user_id = b.user_id
           AND a.valid_from < b.valid_to AND b.valid_from < a.valid_to""",
    "cdc_restatement" ->
      """WITH ch AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             round(value, 2) AS value,
             epoch_us(ts) +
               (('0x' || substr(md5('graft-rst:' || event_id), 1, 15))::BIGINT
                % 7200000001) AS arr
           FROM events),
         h AS (SELECT max(ts) + 1 AS h FROM ch),
         v AS (
           SELECT user_id, ts AS valid_from,
             coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                      (SELECT h FROM h)) AS valid_to,
             arr AS dim_arr, value AS dim_value
           FROM ch
           WHERE op = 'INSERT' OR (op = 'UPDATE' AND event_id % 2 = 0)),
         f AS (
           SELECT user_id, ts AS fact_ts, arr AS fact_arr, event_id AS fact_id
           FROM ch WHERE op = 'UPDATE' AND event_id % 2 = 1)
         SELECT f.fact_id, f.user_id, f.fact_ts, v.dim_value,
           v.dim_arr - f.fact_arr AS arrived_late_by_us
         FROM f JOIN v ON v.user_id = f.user_id
           AND v.valid_from <= f.fact_ts AND f.fact_ts < v.valid_to
         WHERE v.dim_arr > f.fact_arr""",
    "cdc_balance_curve" ->
      """WITH ch AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             CAST(floor(round(value, 2) * 100 + 0.5) AS BIGINT) AS cents
           FROM events),
         st AS (
           SELECT ts, user_id, event_id,
             CASE WHEN op = 'DELETE' THEN 0 ELSE cents END AS stored
           FROM ch),
         d AS (
           SELECT ts // 86400000000 AS day,
             stored - coalesce(lag(stored) OVER (PARTITION BY user_id
               ORDER BY ts, event_id), 0) AS delta
           FROM st),
         daily AS (
           SELECT day, CAST(sum(delta) AS BIGINT) AS net_delta_cents
           FROM d GROUP BY 1)
         SELECT day, net_delta_cents,
           CAST(sum(net_delta_cents) OVER (ORDER BY day) AS BIGINT)
             AS balance_cents
         FROM daily""",
    "cdc_scd2_compact" ->
      """WITH live AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CAST(floor(round(value, 2) / 10) AS BIGINT) AS band
           FROM events WHERE event_type != 'error'),
         h AS (SELECT max(ts) + 1 AS h FROM live),
         runs AS (
           SELECT user_id, ts, event_id, band,
             CASE WHEN lag(band) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) IS NULL
                    OR lag(band) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) != band
                  THEN 1 ELSE 0 END AS run_start
           FROM live),
         runid AS (
           SELECT user_id, ts, band,
             CAST(sum(run_start) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS BIGINT) AS run_id
           FROM runs),
         merged AS (
           SELECT user_id, run_id, min(ts) AS valid_from,
             min(band) AS value_band,
             CAST(count(*) AS BIGINT) AS n_versions_merged
           FROM runid GROUP BY 1, 2)
         SELECT user_id, run_id, value_band, valid_from,
           coalesce(lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id),
                    (SELECT h FROM h)) AS valid_to,
           n_versions_merged
         FROM merged""",
    "cdc_tombstone_gc" ->
      """WITH ch AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op
           FROM events),
         r AS (
           SELECT user_id, op, ts,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rk
           FROM ch),
         lastc AS (
           SELECT user_id, ts AS last_ts, op = 'DELETE' AS dead
           FROM r WHERE rk = 1),
         cnt AS (SELECT user_id, count(*) AS n_rows FROM ch GROUP BY 1),
         mx AS (SELECT max(ts) AS mx FROM ch)
         SELECT CAST(h.horizon_days AS BIGINT) AS horizon_days,
           CAST(sum(CASE WHEN dead AND last_ts < mx - h.horizon_days * 86400000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_keys_reclaimable,
           CAST(sum(CASE WHEN dead AND last_ts < mx - h.horizon_days * 86400000000
                    THEN n_rows ELSE 0 END) AS BIGINT) AS n_rows_reclaimed,
           CAST(sum(CASE WHEN dead AND NOT (last_ts < mx - h.horizon_days * 86400000000)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_tombstones_retained
         FROM lastc JOIN cnt USING (user_id), mx,
           (SELECT unnest([7, 30, 90]) AS horizon_days) h
         GROUP BY 1""",
    "cdc_erasure_audit" ->
      // per-key change-type census + final-op filter + 1-row corpus
      // clock; horizon interpolated from ErasureHorizonDays
      s"""WITH c AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op
           FROM events),
         lastop AS (
           SELECT user_id, op AS final_op FROM (
             SELECT user_id, op, row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn FROM c)
           WHERE rn = 1),
         agg AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n_history_rows,
             CAST(count(CASE WHEN op = 'INSERT' THEN 1 END) AS BIGINT) AS n_inserts,
             CAST(count(CASE WHEN op = 'UPDATE' THEN 1 END) AS BIGINT) AS n_updates,
             CAST(count(CASE WHEN op = 'DELETE' THEN 1 END) AS BIGINT) AS n_deletes,
             min(ts) AS first_ts, max(ts) AS last_ts
           FROM c GROUP BY 1),
         clock AS (SELECT max(ts) AS now_ts FROM c)
         SELECT a.user_id, n_history_rows, n_inserts, n_updates, n_deletes,
           first_ts, last_ts,
           (now_ts - last_ts) // 86400000000 AS tombstone_age_days,
           CAST(now_ts - last_ts >= $ErasureHorizonDays * CAST(86400000000 AS BIGINT)
             AS BIGINT) AS purge_eligible
         FROM agg a JOIN lastop l ON l.user_id = a.user_id, clock
         WHERE l.final_op = 'DELETE'""",
    // ---- StreamDriver rows (#84/#108/#143/#164/#205 run to stream
    // completion — the streamed result equals the batch form these
    // oracles state; streamed ≡ batch itself is pinned per operator
    // in StreamingOpsSpec) ----
    "cdc_stream_sessions" ->
      // session_window's HALF-OPEN gap rule: exactly 30 min starts a
      // NEW session (#16's batch lag+cumsum uses strict >); end =
      // last event + gap
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_id,
             round(value, 2) AS value
           FROM events),
         flagged AS (
           SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= 1800000000 THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sess AS (
           SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM flagged)
         SELECT CAST(min(ts) AS BIGINT) AS session_start_us,
           CAST(max(ts) + 1800000000 AS BIGINT) AS session_end_us,
           user_id, CAST(count(*) AS BIGINT) AS n_changes,
           round(sum(value), 2) AS total_value
         FROM sess GROUP BY user_id, sid""",
    "cdc_stream_dedup" ->
      // redeliveries collapse on event_id → the unique changelog
      """SELECT event_id, epoch_us(ts) AS ts, user_id,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS op,
           round(value, 2) AS value
         FROM events""",
    "cdc_stream_interval_join" ->
      """WITH c AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op
           FROM events)
         SELECT i.user_id AS key, i.event_id AS l_id, d.event_id AS r_id,
           CAST(i.ts AS BIGINT) AS l_t_us, CAST(d.ts AS BIGINT) AS r_t_us
         FROM c i JOIN c d ON d.user_id = i.user_id
           AND i.op = 'INSERT' AND d.op = 'DELETE'
           AND d.ts >= i.ts AND d.ts <= i.ts + 3600000000""",
    "cdc_stream_enrich" ->
      """WITH c AS (
           SELECT event_id, epoch_us(ts) AS ts, user_id,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             round(value, 2) AS value
           FROM events)
         SELECT c.user_id, c.event_id, c.ts, c.op, c.value,
           cu.c_nationkey, cu.c_mktsegment
         FROM c LEFT JOIN customer cu ON cu.c_custkey = c.user_id""",
    "cdc_stream_rolling_mau" ->
      // epoch-aligned sliding windows (7 d wide, 1 d slide): each
      // event lands in exactly 7 window starts; distinct users per
      // window — the sentinel row is not in `events`, and every real
      // window's start is ≤ some real event ts, so the Spark side's
      // sentinel filter drops nothing the oracle keeps
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts FROM events),
         w AS (SELECT DISTINCT user_id,
                 (ts // 86400000000) * 86400000000
                   - j * 86400000000 AS win_start
               FROM e, generate_series(0, 6) AS g(j))
         SELECT CAST(win_start AS BIGINT) AS win_start_us,
           CAST(win_start + 604800000000 AS BIGINT) AS win_end_us,
           CAST(count(*) AS BIGINT) AS n_distinct_users
         FROM w GROUP BY win_start""",
    "cdc_stream_current" ->
      // the upsert state machine run to completion IS the batch
      // current table (cdc_current's shape, identical SQL)
      """SELECT user_id, event_id AS last_event_id, epoch_us(ts) AS last_ts,
           round(value, 2) AS value
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1 AND event_type <> 'error'""",
    "cdc_stream_cms" ->
      // final streamed counters (monotone, max across emissions) =
      // the batch sketch from the same md5 bucket hash
      """WITH pos AS (
           SELECT user_id, d,
             ('0x' || substr(md5('graft-cms-' || d || ':' || user_id), 1, 15))::BIGINT
               % 256 AS b
           FROM events, range(3) r(d))
         SELECT d, b, CAST(count(*) AS BIGINT) AS c FROM pos GROUP BY d, b""",
    "cdc_stream_throttle" ->
      // the per-key greedy spacing fold as a recursive CTE: process
      // each key's rows in (ts, event_id) order; emit iff ts >= last
      // emitted + interval (the first row of a key always emits)
      s"""WITH c AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS op,
             round(value, 2) AS value,
             row_number() OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS rn
           FROM events),
         rec AS (
           WITH RECURSIVE h(user_id, rn, ts, event_id, op, value, last, emit) AS (
             SELECT user_id, rn, ts, event_id, op, value, ts, TRUE
             FROM c WHERE rn = 1
             UNION ALL
             SELECT s.user_id, s.rn, s.ts, s.event_id, s.op, s.value,
               CASE WHEN s.ts >= h.last + ${streaming.StreamDriver.ThrottleIntervalUs}
                    THEN s.ts ELSE h.last END,
               s.ts >= h.last + ${streaming.StreamDriver.ThrottleIntervalUs}
             FROM c s JOIN h ON s.user_id = h.user_id AND s.rn = h.rn + 1)
           SELECT * FROM h)
         SELECT event_id, ts, user_id, op, value FROM rec WHERE emit""",
    "cdc_stream_holt" ->
      // the streamed fold keyed by CDC op — the shared recursive
      // trajectory chain with the series key swapped (holtCtesBy)
      s"""WITH ${holtCtesBy(
        """CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END""")}
         SELECT event_type AS op, day, y AS cents, l AS level_c, b AS trend_c
         FROM rec""",
    "cdc_stream_cusum" ->
      // the streamed per-series CUSUM (fixed reference mean μ = the
      // truncating global mean of per-(op, day) cent sums — the same
      // expression cusumMuCents computes batch-side) replayed with the
      // prefix-extrema closed form; extrema seeds include 0 (the
      // state's initial S/minS/maxS)
      s"""WITH $streamDailyCtes,
         m AS (SELECT CAST(sum(x) // count(*) AS BIGINT) AS mu FROM d),
         s AS (
           SELECT op, day, x,
             CAST(sum(x - mu) OVER (PARTITION BY op ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s
           FROM d, m)
         SELECT op, day, x AS cents,
           CAST(s - least(min(s) OVER w, 0) AS BIGINT) AS c_plus,
           CAST(greatest(max(s) OVER w, 0) - s AS BIGINT) AS c_minus
         FROM s WINDOW w AS (PARTITION BY op ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "cdc_stream_ph" ->
      // the streamed per-series Page–Hinkley monitor: m_t is a cumsum
      // of window-computable terms (x_i − trunc(S_i/i)); PH extrema
      // range over EMITTED m only (the state's MaxValue/MinValue seeds)
      s"""WITH $streamDailyCtes,
         i AS (
           SELECT op, day, x,
             CAST(row_number() OVER (PARTITION BY op ORDER BY day) AS BIGINT) AS t,
             CAST(sum(x) OVER (PARTITION BY op ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s
           FROM d),
         mm AS (
           SELECT op, day, x,
             CAST(sum(x - (CASE WHEN s < 0 THEN -((-s) // t) ELSE s // t END))
               OVER (PARTITION BY op ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS m
           FROM i)
         SELECT op, day, x AS cents, m,
           CAST(m - min(m) OVER w AS BIGINT) AS ph_plus,
           CAST(max(m) OVER w - m AS BIGINT) AS ph_minus
         FROM mm WINDOW w AS (PARTITION BY op ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "cdc_stream_ewma" ->
      // the streamed per-series dyadic EWMA: each day's ≤16-entry
      // register is exactly the observed days with gap ≤ 15, so the
      // fold is the #349 cover join (truncating divide mirrored)
      s"""WITH $streamDailyCtes
         SELECT op, day, x AS cents,
           CAST(CASE WHEN num < 0 THEN -((-num) // den) ELSE num // den END
             AS BIGINT) AS ewma_c
         FROM (
           SELECT a.op, a.day, a.x,
             CAST(sum(b.x * (CAST(1 AS BIGINT) << (15 - (a.day - b.day)))) AS BIGINT) AS num,
             CAST(sum(CAST(1 AS BIGINT) << (15 - (a.day - b.day))) AS BIGINT) AS den
           FROM d a JOIN d b
             ON b.op = a.op AND b.day BETWEEN a.day - 15 AND a.day
           GROUP BY a.op, a.day, a.x) t""",
    "cdc_stream_croston" ->
      // the streamed per-series Croston smoother: the (z, p) recursion
      // is genuinely sequential — the #263 recursive chain with
      // Croston's updates (dyadic α = ¼ sign-factored truncating
      // quarter, interval clamped ≥ 1, rate = z·1000 trunc-div p)
      s"""WITH $streamDailyCtes,
         idx AS (
           SELECT op, day, x,
             CAST(row_number() OVER (PARTITION BY op ORDER BY day) AS BIGINT) AS i
           FROM d),
         rec AS (
           WITH RECURSIVE h(op, i, day, x, z, p) AS (
             SELECT op, i, day, x, x, CAST(1 AS BIGINT) FROM idx WHERE i = 1
             UNION ALL
             SELECT s.op, s.i, s.day, s.x,
               h.z + ${crostonTq("s.x - h.z")},
               greatest(CAST(1 AS BIGINT), h.p + ${crostonTq("(s.day - h.day) - h.p")})
             FROM idx s JOIN h ON s.op = h.op AND s.i = h.i + 1)
           SELECT * FROM h)
         SELECT op, day, x AS cents, z AS z_size, p AS p_interval,
           CAST(CASE WHEN z < 0 THEN -((-(z * 1000)) // p) ELSE (z * 1000) // p END
             AS BIGINT) AS rate_e3
         FROM rec""",
    "cdc_stream_imr" ->
      // the streamed per-series I-MR chart: sufficient statistics are
      // prefix aggregates, mr is a lag (−1 marks a series' first day),
      // flags are the live-limit decisions in HUGEINT cross products
      // (the fold's BigInt comparisons)
      s"""WITH $streamDailyCtes,
         i AS (
           SELECT op, day, x,
             CAST(row_number() OVER wo AS BIGINT) AS n,
             CASE WHEN lag(x) OVER wo IS NULL THEN CAST(-1 AS BIGINT)
                  ELSE abs(x - lag(x) OVER wo) END AS mr,
             CAST(sum(x) OVER (PARTITION BY op ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sx
           FROM d WINDOW wo AS (PARTITION BY op ORDER BY day)),
         j AS (
           SELECT op, day, x, mr, n, sx,
             CAST(sum(CASE WHEN mr >= 0 THEN 1 ELSE 0 END) OVER wc AS BIGINT) AS n1,
             CAST(sum(CASE WHEN mr >= 0 THEN mr ELSE 0 END) OVER wc AS BIGINT) AS smr
           FROM i WINDOW wc AS (PARTITION BY op ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT op, day, x AS cents, mr,
           CASE WHEN n1 > 0
                 AND abs(CAST(x AS HUGEINT) * n - sx) * 1128 * n1
                     > CAST(3000 AS HUGEINT) * smr * n
                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS x_ooc,
           CASE WHEN mr >= 0
                 AND CAST(mr AS HUGEINT) * 1000 * n1 > CAST(3267 AS HUGEINT) * smr
                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS mr_ooc
         FROM j""",
    "cdc_stream_hh" ->
      // the sharded streaming Misra-Gries table with one slot per
      // shard = Boyer-Moore majority over each shard's
      // (ts, event_id)-ordered op sequence; shard assignment is the
      // stream's own String.hashCode map, interpolated from opShard so
      // the two sides can never drift
      s"""WITH c AS (
           SELECT CASE WHEN event_type = 'signup' THEN 'INSERT'
                       WHEN event_type = 'error' THEN 'DELETE'
                       ELSE 'UPDATE' END AS op,
             epoch_us(ts) AS ts, event_id
           FROM events),
         r AS (
           SELECT op,
             CAST(CASE op
               WHEN 'INSERT' THEN ${streaming.StreamDriver
        .opShard("INSERT", streaming.StreamDriver.HhShards)}
               WHEN 'UPDATE' THEN ${streaming.StreamDriver
        .opShard("UPDATE", streaming.StreamDriver.HhShards)}
               ELSE ${streaming.StreamDriver
        .opShard("DELETE", streaming.StreamDriver.HhShards)} END AS BIGINT) AS shard,
             ts, event_id
           FROM c),
         rr AS (
           SELECT op, shard,
             row_number() OVER (PARTITION BY shard ORDER BY ts, event_id) AS rn
           FROM r),
         rec AS (
           WITH RECURSIVE h(shard, rn, cur, cnt) AS (
             SELECT shard, rn, op, CAST(1 AS BIGINT) FROM rr WHERE rn = 1
             UNION ALL
             SELECT s.shard, s.rn,
               CASE WHEN h.cnt = 0 THEN s.op ELSE h.cur END,
               CASE WHEN h.cnt > 0 AND h.cur = s.op THEN h.cnt + 1
                    WHEN h.cnt = 0 THEN CAST(1 AS BIGINT)
                    ELSE h.cnt - 1 END
             FROM rr s JOIN h ON s.shard = h.shard AND s.rn = h.rn + 1)
           SELECT * FROM h),
         fin AS (SELECT shard, max(rn) AS mx FROM rr GROUP BY shard)
         SELECT rec.shard, rec.cur AS op, rec.cnt
         FROM rec JOIN fin ON rec.shard = fin.shard AND rec.rn = fin.mx
         WHERE rec.cnt > 0"""
  )

  /** The streamed smoother family's shared daily series (keyed by the
    * CDC op — the stream's group key): per-(op, day) cent sums on the
    * µs-epoch day grid, the exact batch view of what each
    * `mapGroupsWithState` fold aggregates per micro-batch.
    */
  private def streamDailyCtes: String =
    """e AS (
           SELECT CASE WHEN event_type = 'signup' THEN 'INSERT'
                       WHEN event_type = 'error' THEN 'DELETE'
                       ELSE 'UPDATE' END AS op,
             epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
           FROM events),
         d AS (SELECT op, day, CAST(sum(c) AS BIGINT) AS x FROM e GROUP BY op, day)"""

  /** Croston's sign-factored truncating quarter (dyadic α = ¼) — the
    * SQL twin of `CdcStream.streamingCroston`'s `tq`.
    */
  private def crostonTq(a: String): String =
    s"(CASE WHEN ($a) < 0 THEN -((-($a)) // 4) ELSE ($a) // 4 END)"
}
