package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every entry in `queries` has a matching DuckDB oracle in `oracleSql`
  * unless the operator is not SQL-expressible (approx sketches, LSH
  * banding, mapPartitions plumbing) — those get the driver's rows-only
  * check. Column names are aliased identically on both sides; doubles
  * rounded to 2; `events.ts` flows through as a ns-epoch long
  * (`spark.sql.legacy.parquet.nanosAsLong`) matched by DuckDB
  * `epoch_us(ts)` — exact integer parity.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Cdc.current(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CDC core (§2 #1-7)
    "cdc_classify" -> (Cdc.classify _),
    "cdc_history" -> (Cdc.history _),
    "cdc_current" -> (Cdc.current _),
    "cdc_stats" -> (Cdc.stats _),
    "cdc_dedup_redelivery" -> (Cdc.dedupRedelivery _),
    "cdc_scd2" -> (Cdc.scd2 _),
    "cdc_compact" -> (Cdc.compact _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
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
         WHERE rn = 1"""
  )
}
