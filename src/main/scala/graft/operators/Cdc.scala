package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** CDC core — the reference pipeline's own data-processing surface
  * (reference: airflow-dags/simple_kafka_etl.py:56-163, README.md:34-38),
  * re-expressed as declarative Spark plans over the `events` changelog
  * analog (deterministic mapping: signup→INSERT, click|view|purchase→
  * UPDATE, error→DELETE; `user_id` = key, `event_id` = Kafka offset,
  * `ts` = change timestamp, ns-epoch long).
  *
  * Scale design: every operator here is a single hash-exchange on
  * `user_id` (window or groupBy) — the distributed analog of the
  * reference's per-row Postgres upsert loop
  * (simple_kafka_etl.py:128-163). No driver-side state, no collect;
  * AQE handles skewed keys at 100 TB.
  */
object Cdc {

  /** Per-key change ordering: ts, then offset as the total-order tiebreak
    * (same-instant deliveries resolve by Kafka offset, matching the
    * reference's sequential-consume order, simple_kafka_etl.py:90).
    */
  private val byKey = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
  private val byKeyDesc =
    Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)

  private val opCol: Column =
    when(col("event_type") === "signup", "INSERT")
      .when(col("event_type") === "error", "DELETE")
      .otherwise("UPDATE")

  /** #1 CDC parse + change classification (simple_kafka_etl.py:76,114).
    * Pure projection — no shuffle; classification stays inside the
    * parquet scan's WholeStageCodegen span.
    */
  def classify(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .select(
        col("event_id"),
        expr("ts div 1000").as("ts"), // µs epoch: DuckDB reads TIMESTAMP_NS truncated to µs
        col("user_id"),
        opCol.as("op"),
        round(col("value"), 2).as("value")
      )

  /** #2 History table: append-only change log with `original_value`
    * carried forward from the most recent INSERT of the key — the
    * analog of the reference's preserved `original_registered_at`
    * (simple_kafka_etl.py:96-105,146-155). One exchange on user_id.
    */
  def history(spark: SparkSession, dir: String): DataFrame = {
    val changes = classify(spark, dir)
    changes
      .withColumn(
        "original_value",
        last(when(col("op") === "INSERT", col("value")), ignoreNulls = true)
          .over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
      .select(
        col("event_id"),
        col("ts"),
        col("user_id"),
        col("op").as("change_type"),
        col("value"),
        col("original_value")
      )
  }

  /** #3 Current-state table: latest record per key, tombstones applied
    * (simple_kafka_etl.py:108,134-138,158-163). row_number over one
    * exchange replaces the reference's per-row upsert.
    */
  def current(spark: SparkSession, dir: String): DataFrame =
    classify(spark, dir)
      .withColumn("rn", row_number().over(byKeyDesc))
      .filter(col("rn") === 1 && col("op") =!= "DELETE")
      .select(
        col("user_id"),
        col("event_id").as("last_event_id"),
        col("ts").as("last_ts"),
        col("value")
      )

  /** #4 Per-key stats (`user_account_stats`, README.md:38): change
    * counts by type + first/last change time. Partial aggregation
    * (map-side combine) then one exchange.
    */
  def stats(spark: SparkSession, dir: String): DataFrame =
    classify(spark, dir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_changes"),
        count(when(col("op") === "INSERT", 1)).as("n_inserts"),
        count(when(col("op") === "UPDATE", 1)).as("n_updates"),
        count(when(col("op") === "DELETE", 1)).as("n_deletes"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        round(sum(col("value")), 2).as("total_value")
      )

  /** #5 Idempotent ingest: the reference skips duplicate Kafka
    * deliveries by offset-key lookup (simple_kafka_etl.py:81-84,
    * 119-122). We simulate at-least-once redelivery (every 10th offset
    * delivered twice) and collapse with an exact groupBy on the offset
    * key — distributed, no per-row existence probe.
    */
  def dedupRedelivery(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables
      .events(spark, dir)
      .select(
        col("event_id"),
        expr("ts div 1000").as("ts"),
        col("user_id"),
        col("event_type"),
        col("value")
      )
    val redelivered = events.unionAll(events.filter(col("event_id") % 10 === 0))
    redelivered
      .groupBy("event_id", "ts", "user_id", "event_type")
      .agg(
        round(min(col("value")), 2).as("value"),
        count(lit(1)).as("n_deliveries")
      )
      .select(
        col("event_id"),
        col("ts"),
        col("user_id"),
        col("event_type"),
        col("value"),
        col("n_deliveries")
      )
  }

  /** #6 SCD Type-2: each change versioned with [valid_from, valid_to)
    * and an is_current flag (open interval + not a tombstone). The
    * warehouse-native generalization of the reference's history table.
    */
  def scd2(spark: SparkSession, dir: String): DataFrame =
    classify(spark, dir)
      .withColumn("valid_to", lead(col("ts"), 1).over(byKey))
      .select(
        col("user_id"),
        col("event_id"),
        col("op").as("change_type"),
        col("value"),
        col("ts").as("valid_from"),
        col("valid_to"),
        (col("valid_to").isNull && col("op") =!= "DELETE").cast("int").as("is_current")
      )

  /** #42 Debezium envelope parse: serialize each change to the exact
    * flattened-JSON envelope the reference consumes from Kafka
    * (simple_kafka_etl.py:56-77), then run it through the real
    * `Formats.parseDebezium` JSON-source path — schema-on-read,
    * reference-style op classification (first non-tombstone change per
    * key = INSERT, simple_kafka_etl.py:128-131).
    */
  def envelopeParse(spark: SparkSession, dir: String): DataFrame = {
    val envelopes = Tables
      .events(spark, dir)
      .select(
        to_json(
          struct(
            col("event_id").as("id"),
            col("user_id"),
            col("props").as("account"),
            expr("ts div 1000").as("registered_at"),
            when(col("event_type") === "error", "true").otherwise("false").as("__deleted")
          )).as("value"))
    graft.sources.Formats.parseDebezium(envelopes, col("value"))
  }

  /** #396 Avro envelope parse: the same changelog carried as
    * Avro-BINARY Debezium envelopes (the Confluent AvroConverter wire
    * format — the production alternative to the JsonConverter the
    * reference config ships, `mysql-connector-config-clean.json`)
    * encoded and decoded with the runtime's Avro core via
    * [[graft.sources.AvroEnvelope]], then classified by the SAME
    * shared window as the JSON path — the oracle is therefore
    * IDENTICAL SQL to [[envelopeParse]]'s: a hash-match proves the
    * binary round trip is lossless AND the two converters agree.
    */
  def avroParse(spark: SparkSession, dir: String): DataFrame = {
    val envelopes = Tables
      .events(spark, dir)
      .select(
        col("event_id").as("id"),
        col("user_id"),
        col("props").as("account"),
        expr("ts div 1000").as("registered_at"),
        when(col("event_type") === "error", "true").otherwise("false").as("__deleted"))
    graft.sources.AvroEnvelope.parseDebeziumAvro(graft.sources.AvroEnvelope.encode(envelopes))
  }

  /** #73 Maxwell envelope parse: the same changelog re-serialized as
    * Maxwell JSON (`{database, table, type, ts, data:{...}}` — the
    * other widely deployed MySQL-binlog CDC format) and parsed back to
    * the connector-agnostic change-record shape. With [[envelopeParse]]
    * this makes the ingest surface multi-connector: downstream Cdc /
    * CdcStream operators never see which daemon produced the feed.
    */
  def maxwellParse(spark: SparkSession, dir: String): DataFrame = {
    val envelopes = Tables
      .events(spark, dir)
      .select(
        to_json(
          struct(
            lit("bankdb").as("database"),
            lit("bank_accounts").as("table"),
            when(col("event_type") === "signup", "insert")
              .when(col("event_type") === "error", "delete")
              .otherwise("update")
              .as("type"),
            // Maxwell ts is epoch SECONDS (ns div 1e9); the parser
            // re-expands to the µs timeline
            expr("ts div 1000000000").as("ts"),
            struct(
              col("event_id").as("id"),
              col("user_id"),
              col("props").as("account"),
              round(col("value"), 2).as("value")).as("data")
          )).as("value"))
    graft.sources.Formats.parseMaxwell(envelopes, col("value"))
  }

  /** #62 Snapshot reconciliation: full-outer diff of the current
    * state at two points in time (mid-changelog vs end) classifying
    * every key as ADDED / REMOVED / CHANGED / UNCHANGED — the audit
    * query a CDC pipeline runs to prove two materializations agree.
    * Both snapshots share the user_id exchange; the diff is one
    * full-outer join on the same key.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val changes = classify(spark, dir)
    def snapshotAt(pred: Column): DataFrame =
      changes
        .filter(pred)
        .withColumn("rn", row_number().over(byKeyDesc))
        .filter(col("rn") === 1 && col("op") =!= "DELETE")
        .select(col("user_id"), col("event_id"), col("value"))
    val mid = 5000L // event_id is dense from 0; first half vs full log
    val before = snapshotAt(col("event_id") < mid)
      .select(col("user_id"), col("event_id").as("old_event_id"), col("value").as("old_value"))
    val after = snapshotAt(lit(true))
      .select(col("user_id"), col("event_id").as("new_event_id"), col("value").as("new_value"))
    before
      .join(after, Seq("user_id"), "full_outer")
      .select(
        col("user_id"),
        when(col("old_event_id").isNull, "ADDED")
          .when(col("new_event_id").isNull, "REMOVED")
          .when(col("old_event_id") =!= col("new_event_id"), "CHANGED")
          .otherwise("UNCHANGED")
          .as("diff"),
        col("old_event_id"),
        col("new_event_id"),
        col("old_value"),
        col("new_value"))
  }

  /** #7 Changelog compaction: net effect per key (what a compacted
    * Kafka topic / merge-on-read would retain) — the latest record,
    * tagged DELETE if the key's final state is a tombstone.
    */
  def compact(spark: SparkSession, dir: String): DataFrame =
    classify(spark, dir)
      .withColumn("rn", row_number().over(byKeyDesc))
      .filter(col("rn") === 1)
      .select(
        col("user_id"),
        when(col("op") === "DELETE", "DELETE").otherwise("UPSERT").as("net_op"),
        col("event_id").as("last_event_id"),
        col("ts").as("last_ts"),
        col("value")
      )

  /** #133 SCD Type 3: current value plus the immediately-previous
    * value per key — the "what changed last" dimension layout (one
    * history column instead of SCD2's row-per-version). One window
    * pass computes both the previous value (ascending lag) and the
    * latest-row pick (descending rank) over the same key
    * partitioning; tombstoned keys are dropped like [[current]].
    */
  def scd3(spark: SparkSession, dir: String): DataFrame = {
    val asc = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    classify(spark, dir)
      .withColumn("prev_value", lag(col("value"), 1).over(asc))
      .withColumn("rn", row_number().over(byKeyDesc))
      .filter(col("rn") === 1 && col("op") =!= "DELETE")
      .select(
        col("user_id"),
        col("value").as("current_value"),
        col("prev_value"),
        col("ts").as("last_ts"),
        col("event_id").as("last_event_id"))
  }

  /** #134 Point-in-time SCD2 dimension lookup: each fact row (orders)
    * joined to the dimension VERSION that was valid at the fact's
    * timestamp — the temporal join every SCD2 warehouse runs on every
    * fact load. Under contiguous version intervals this is exactly a
    * backward as-of join on `valid_from` per key, so it rides
    * [[AsOf.join]]'s single-shuffle union-window plan: no range
    * predicate ever reaches a join, no per-row interval probe.
    * Version ties at the same timestamp are pre-collapsed to the
    * max event_id (the as-of contract).
    */
  def scd2Lookup(spark: SparkSession, dir: String): DataFrame = {
    val tieW = Window.partitionBy("user_id", "valid_from").orderBy(col("event_id").desc)
    val dim = classify(spark, dir)
      .select(
        col("user_id"),
        col("ts").as("valid_from"),
        col("event_id"),
        col("op").as("change_type"),
        col("value"))
      .withColumn("_rn", row_number().over(tieW))
      .filter(col("_rn") === 1)
      .drop("_rn")
    val facts = graft.Tables
      .orders(spark, dir)
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_ts"))
    AsOf
      .join(
        facts,
        dim,
        leftKey = "o_custkey",
        rightKey = "user_id",
        leftTime = "o_ts",
        rightTime = "valid_from",
        payload = Seq("event_id", "change_type", "value"))
      .withColumnRenamed("event_id", "dim_event_id")
      .withColumnRenamed("change_type", "dim_change_type")
      .withColumnRenamed("value", "dim_value")
  }

  /** #80 Bucketed CDC warehouse layout: materialize the current-state
    * and per-key stats tables `bucketBy(user_id)` into the catalog, so
    * every downstream key-join between CDC outputs (current × stats,
    * current × any per-user dimension bucketed the same way) runs with
    * ZERO shuffle exchanges — both sides are already hash-partitioned
    * and sorted on the key at rest. At 100 TB this converts the
    * warehouse's most frequent join from a full two-sided shuffle into
    * a local sort-merge per bucket; the one-time bucketing cost is
    * paid by the write that had to happen anyway. `BucketingSpec`
    * asserts the shuffle-free plan and equality with the unbucketed
    * join.
    */
  def writeBucketed(
      spark: SparkSession,
      dir: String,
      buckets: Int = 8,
      prefix: String = "cdc_b"): Unit = {
    current(spark, dir)
      .write
      .bucketBy(buckets, "user_id")
      .sortBy("user_id")
      .mode("overwrite")
      .saveAsTable(s"${prefix}_current")
    stats(spark, dir)
      .write
      .bucketBy(buckets, "user_id")
      .sortBy("user_id")
      .mode("overwrite")
      .saveAsTable(s"${prefix}_stats")
  }

  /** The downstream consumer the bucketed layout serves: current state
    * enriched with lifetime change stats, joined on the bucket key.
    */
  def bucketedEnriched(spark: SparkSession, prefix: String = "cdc_b"): DataFrame =
    spark
      .table(s"${prefix}_current")
      .join(spark.table(s"${prefix}_stats"), "user_id")
      .select(
        col("user_id"),
        col("last_event_id"),
        col("value"),
        col("n_changes"),
        col("n_updates"),
        col("total_value"))

  /** #184 Changelog sequence audit: per-key op-sequence validity — the
    * changelog lint a CDC consumer runs before trusting apply
    * semantics. Protocol: INSERT is valid only on an absent key,
    * UPDATE/DELETE only on a live one (the reference's per-row upsert
    * silently absorbs all four violation classes,
    * simple_kafka_etl.py:128-163; this surfaces them).
    *
    * The state machine (absent→live on INSERT, live→absent on DELETE)
    * is evaluated with zero driver state via an integer window trick:
    * every INSERT/DELETE row emits marker `rn*2 + isInsert`; the max
    * marker over the key's PRECEDING rows identifies the most recent
    * state change, and its parity decodes liveness — no per-key
    * iteration, just two window functions sharing one `user_id`
    * exchange, then a partial-aggregable rollup.
    */
  def sequenceAudit(spark: SparkSession, dir: String): DataFrame = {
    val withRn = classify(spark, dir).withColumn("rn", row_number().over(byKey))
    val marker =
      when(
        col("op") =!= "UPDATE",
        col("rn") * 2 + when(col("op") === "INSERT", 1).otherwise(0))
    val preceding = Window
      .partitionBy("user_id")
      .orderBy(col("rn"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val live = col("lm").isNotNull && col("lm") % 2 === 1
    withRn
      .withColumn("lm", max(marker).over(preceding))
      .withColumn(
        "violation",
        when(col("op") === "INSERT" && live, "double_insert")
          .when(col("op") === "UPDATE" && !live, "update_while_absent")
          .when(col("op") === "DELETE" && !live, "delete_while_absent")
          .otherwise("ok"))
      .groupBy("op", "violation")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_keys"))
  }

  /** #185 Incremental view maintenance: an additive aggregate view
    * over the CURRENT state (live keys only), maintained from a
    * changelog delta without rescanning the base — the IVM contract
    * that makes a 100 TB materialized view affordable: per-batch cost
    * is `O(|delta| + |touched keys|)`, never `O(|base|)`.
    *
    * View: per user-bucket (`user_id % buckets`) count of live keys
    * and sum of their current values in cents. Maintenance:
    * (1) aggregate the base snapshot once (in production this is the
    * stored view, not a recompute); (2) for the keys the delta
    * touches — and ONLY those, a left-semi probe — replay base row ∪
    * delta to the new per-key state; (3) apply `new − old`
    * contribution differences per bucket. The DuckDB oracle is the
    * INDEPENDENT from-scratch recompute over the full changelog, so a
    * hash-MATCH is precisely the IVM theorem (maintained ≡
    * recomputed), not a replay of this construction.
    *
    * The cutoff splitting base from delta is the µs midpoint of the
    * observed ts range — derived relationally (broadcast 1-row agg),
    * no driver round-trip.
    */
  def ivmAgg(spark: SparkSession, dir: String, buckets: Int = 16): DataFrame = {
    val changes = classify(spark, dir)
    val cutoff = changes.agg(
      expr("CAST((min(ts) + max(ts)) div 2 AS BIGINT)").as("cutoff"))
    val cut = changes.crossJoin(broadcast(cutoff))
    val cents = expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")

    // last change per key within a slice → (user_id, bucket, live, cents)
    def stateOf(slice: DataFrame): DataFrame =
      slice
        .withColumn("rk", row_number().over(byKeyDesc))
        .filter(col("rk") === 1)
        .select(
          col("user_id"),
          (col("user_id") % buckets).as("bucket"),
          (col("op") =!= "DELETE").as("live"),
          cents.as("cents"))

    def viewOf(state: DataFrame): DataFrame =
      state
        .filter(col("live"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_live"), sum("cents").as("sum_cents"))

    val base  = cut.filter(col("ts") <= col("cutoff")).drop("cutoff")
    val delta = cut.filter(col("ts") > col("cutoff")).drop("cutoff")

    val baseState = stateOf(base)
    val baseView  = viewOf(baseState)

    // delta-sized work from here down: touched keys only
    val touched      = delta.select("user_id").distinct()
    val baseTouched  = baseState.join(touched, Seq("user_id"), "left_semi")
    // unionByName: the semi join reorders columns (USING key first)
    val mergedState = stateOf(
      base.join(touched, Seq("user_id"), "left_semi").unionByName(delta))
    val oldAgg = viewOf(baseTouched)
      .withColumnRenamed("n_live", "old_n")
      .withColumnRenamed("sum_cents", "old_s")
    val newAgg = viewOf(mergedState)
      .withColumnRenamed("n_live", "new_n")
      .withColumnRenamed("sum_cents", "new_s")

    baseView
      .join(newAgg, Seq("bucket"), "full_outer")
      .join(oldAgg, Seq("bucket"), "full_outer")
      .select(
        col("bucket"),
        (coalesce(col("n_live"), lit(0L)) + coalesce(col("new_n"), lit(0L))
          - coalesce(col("old_n"), lit(0L))).as("n_live"),
        (coalesce(col("sum_cents"), lit(0L)) + coalesce(col("new_s"), lit(0L))
          - coalesce(col("old_s"), lit(0L))).as("sum_value_cents"))
      .filter(col("n_live") > 0)
  }

  /** #187 Streaming state sizing under TTL: for each candidate state
    * TTL (7/30/90 days of event time), how many keys' state survives
    * at the stream head and how many would have been evicted — the
    * capacity-planning query behind every `GroupState` TTL choice:
    * state memory at 100 TB is `keys retained × bytes/key`, and this
    * measures the first factor per policy BEFORE deploying it.
    * A key is retained iff its last change is within the horizon of
    * the snapshot instant (the global max ts). One groupBy(user_id)
    * max + a 3-row horizon explode over a 1-row broadcast — the whole
    * audit is two partial-agg passes.
    */
  def stateTtlAudit(spark: SparkSession, dir: String): DataFrame = {
    val lastPerKey = classify(spark, dir)
      .groupBy("user_id")
      .agg(max("ts").as("last_ts"), count(lit(1)).as("n_changes"))
    val head = lastPerKey.agg(max("last_ts").as("head_ts"))
    lastPerKey
      .crossJoin(broadcast(head))
      .select(
        explode(array(lit(7L), lit(30L), lit(90L))).as("horizon_days"),
        (col("last_ts") >= col("head_ts") - col("horizon_days") * 86400000000L)
          .cast("long")
          .as("retained"),
        col("n_changes"))
      .groupBy("horizon_days")
      .agg(
        sum("retained").as("n_keys_retained"),
        sum(lit(1L) - col("retained")).as("n_keys_expired"),
        sum(col("retained") * col("n_changes")).as("n_changes_retained"))
  }

  /** #188 Watermark lateness audit: per-event lateness = (max event
    * time seen over all PRIOR arrivals) − own event time, in arrival
    * order — the out-of-orderness distribution that picks a watermark
    * delay: `withWatermark(p99 lateness)` keeps 99% of events out of
    * the late-drop path while bounding state. Bucketed counts +
    * per-bucket max are the tuning curve.
    *
    * The synthetic changelog arrives perfectly ordered, so arrival
    * time is simulated as `ts + jitter`, jitter an md5-derived
    * 0..2h transport delay (the planted-dup corpus discipline: the
    * disorder is planted deterministically and the oracle replays
    * it bit-exactly).
    *
    * The running max over arrival order is a GLOBAL prefix scan — the
    * classic single-partition window trap. Here it is hierarchical
    * (the #86/#118 shard discipline): arrivals split into `shards`
    * arrival-time ranges (span derived from max arrival, a pure
    * integer expression — range-sharding is order-consistent); the
    * in-shard prefix max is a bounded-partition window, the
    * cross-shard carry-in is a window over the `shards`-row shard-max
    * table, broadcast back. Exact equality with the flat scan — the
    * DuckDB oracle IS the flat global window, so the hash-MATCH
    * proves the decomposition.
    */
  def watermarkLateness(spark: SparkSession, dir: String, shards: Int = 1024): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val jitterUs = 7200000001L // 0..2h
    val ev = Tables
      .events(spark, dir)
      .select(col("event_id"), expr("ts div 1000").as("ts"))
      .withColumn(
        "arr",
        col("ts") + pmod(
          Dedup.hash60(concat(lit("graft-wm:"), col("event_id"))),
          lit(jitterUs)))
    val span = ev.agg(expr(s"CAST((max(arr) + $shards) div $shards AS BIGINT)").as("w"))
    val sharded = ev
      .crossJoin(broadcast(span))
      .withColumn("shard", expr("arr div w"))
    val inShard = sharded.withColumn(
      "pre_mx",
      max("ts").over(
        Window
          .partitionBy("shard")
          .orderBy(col("arr"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)))
    val carry = sharded
      .groupBy("shard")
      .agg(max("ts").as("smx"))
      .withColumn(
        "carry_mx",
        max("smx").over(
          Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("shard"), col("carry_mx"))
    inShard
      .join(broadcast(carry), "shard")
      // greatest() skips nulls: prior is null only for the very first
      // arrival, whose lateness is 0 by the outer greatest(0, null)
      .withColumn(
        "lateness_us",
        greatest(lit(0L), greatest(col("pre_mx"), col("carry_mx")) - col("ts")))
      .withColumn(
        "bucket",
        when(col("lateness_us") === 0, "on_time")
          .when(col("lateness_us") <= 60000000L, "under_1m")
          .when(col("lateness_us") <= 3600000000L, "under_1h")
          .when(col("lateness_us") <= 86400000000L, "under_1d")
          .otherwise("over_1d"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_events"), max("lateness_us").as("max_lateness_us"))
  }

  /** #217 Tombstone GC audit: per retention horizon, which DEAD keys
    * (last change = DELETE) are old enough that their ENTIRE history
    * can be physically reclaimed, and how many rows that frees — the
    * vacuum/retention planning companion to #187 (which sizes LIVE
    * state): a CDC warehouse cannot drop a tombstone until the
    * horizon passes, or a replayed consumer would resurrect the key.
    * One per-key last-change + count aggregate, a 1-row max-ts
    * broadcast, a 3-way horizon explode, one counting aggregate.
    */
  def tombstoneGc(spark: SparkSession, dir: String): DataFrame = {
    val perKey = classify(spark, dir)
      .groupBy("user_id")
      .agg(
        max(struct(col("ts"), col("event_id"), col("op"))).as("last"),
        count(lit(1)).as("n_rows"))
      .select(
        col("user_id"),
        col("last.ts").as("last_ts"),
        (col("last.op") === "DELETE").as("dead"),
        col("n_rows"))
    val mx = classify(spark, dir).agg(max("ts").as("mx"))
    perKey
      .crossJoin(broadcast(mx))
      .select(
        col("user_id"),
        col("dead"),
        col("n_rows"),
        col("last_ts"),
        col("mx"),
        explode(expr("array(7L, 30L, 90L)")).as("horizon_days"))
      .withColumn(
        "reclaimable",
        col("dead") && col("last_ts") < col("mx") - col("horizon_days") * 86400000000L)
      .groupBy("horizon_days")
      .agg(
        sum(when(col("reclaimable"), 1L).otherwise(0L)).as("n_keys_reclaimable"),
        sum(when(col("reclaimable"), col("n_rows")).otherwise(0L)).as("n_rows_reclaimed"),
        sum(when(col("dead") && !col("reclaimable"), 1L).otherwise(0L))
          .as("n_tombstones_retained"))
  }

  /** #214 SCD2 version compaction (islands merge): adjacent versions
    * carrying the SAME value collapse into one interval — the no-op
    * update churn (heartbeats, touch-writes, idempotent retries)
    * that bloats slowly-changing dimensions; compaction preserves
    * point-in-time semantics exactly while shrinking the history
    * table. Classic gaps-and-islands: a run starts where the value
    * differs from its predecessor (lag), run ids are the running sum
    * of starts, and one aggregate per (key, run) merges the interval.
    * Two per-key windows + one aggregate, all on `user_id`.
    *
    * To make the churn real, the version stream quantizes values to
    * the 10-dollar band (consecutive small changes inside a band are
    * the planted no-ops).
    */
  def scd2Compact(spark: SparkSession, dir: String): DataFrame = {
    val ch = classify(spark, dir)
      .filter(col("op") =!= "DELETE")
      .withColumn("band", expr("CAST(floor(value / 10) AS BIGINT)"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val horizon = ch.agg((max("ts") + 1).as("h"))
    val runs = ch
      .withColumn(
        "run_start",
        when(lag("band", 1).over(w).isNull || lag("band", 1).over(w) =!= col("band"), 1L)
          .otherwise(0L))
      .withColumn(
        "run_id",
        sum("run_start").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val merged = runs
      .groupBy("user_id", "run_id")
      .agg(
        min("ts").as("valid_from"),
        min("band").as("value_band"), // constant within a run by construction
        count(lit(1)).as("n_versions_merged"))
    merged
      .withColumn(
        "valid_to",
        lead(col("valid_from"), 1)
          .over(Window.partitionBy("user_id").orderBy("run_id")))
      .crossJoin(broadcast(horizon))
      .select(
        col("user_id"),
        col("run_id"),
        col("value_band"),
        col("valid_from"),
        coalesce(col("valid_to"), col("h")).as("valid_to"),
        col("n_versions_merged"))
  }

  /** #210 Changelog balance curve (derivative → integral): the daily
    * total-live-value time series of the whole keyspace, computed
    * from per-change DELTAS — each change contributes
    * (stored-after − stored-before) under the #3 current-state
    * machine (INSERT/UPDATE store the new value, DELETE stores 0),
    * daily net deltas aggregate, and a cumulative sum over days
    * integrates back to the absolute curve. This is the O(changes)
    * shape: the naive "for every day, sum every key's last value"
    * rebuild is O(days × keys) and re-scans history per day; the
    * delta form touches each change once — how a warehouse keeps a
    * balance-sheet curve under CDC.
    *
    * One per-key lag window (cents state machine, exact), one daily
    * aggregate, one cumsum over the DAY dimension (bounded by the
    * calendar, not the data; at decades × minutes granularity the
    * #191 shard construction applies).
    */
  def balanceCurve(spark: SparkSession, dir: String): DataFrame = {
    val usPerDay = 86400000000L
    val ch = classify(spark, dir)
      .withColumn("cents", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .withColumn("stored", when(col("op") === "DELETE", 0L).otherwise(col("cents")))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val deltas = ch
      .withColumn("delta", col("stored") - coalesce(lag("stored", 1).over(w), lit(0L)))
      .select(expr(s"ts div ${usPerDay}L").as("day"), col("delta"))
      .groupBy("day")
      .agg(sum("delta").as("net_delta_cents"))
    deltas
      .withColumn(
        "balance_cents",
        sum("net_delta_cents").over(
          Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("day"), col("net_delta_cents"), col("balance_cents"))
  }

  /** #209 Late-arriving-dimension restatement: the facts whose
    * correct dimension attribution was UNKNOWABLE when they arrived —
    * the dimension version covering the fact's event time reached the
    * warehouse (by changelog offset) only after the fact itself. A
    * #134 point-in-time lookup silently attributes these correctly in
    * a full rebuild; an INCREMENTAL pipeline attributed them wrong at
    * ingest and must restate — this operator computes exactly that
    * restatement set, with how late the truth arrived. Streams split
    * as in #194: INSERT/even-offset UPDATEs version the dimension,
    * odd-offset UPDATEs are the facts.
    *
    * Shape: one per-key `lead` window closes versions, one user_id
    * equi-join with interval containment attaches the
    * valid-at-fact-time version, and the restatement test is a plain
    * column comparison of arrival offsets. All user_id exchanges.
    */
  def restatement(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // the synthetic changelog delivers in event-time order, so arrival
    // is modeled as ts + deterministic md5 jitter (0..2h — the #188
    // watermark-audit construction): out-of-order delivery with a
    // replayable clock
    val jitterUs = 7200000001L
    val ch = classify(spark, dir).withColumn(
      "arr",
      col("ts") + pmod(
        Dedup.hash60(concat(lit("graft-rst:"), col("event_id"))),
        lit(jitterUs)))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val horizon = ch.agg((max("ts") + 1).as("h"))
    val versions = ch
      .filter(col("op") === "INSERT" || (col("op") === "UPDATE" && col("event_id") % 2 === 0))
      .select(col("user_id"), col("ts"), col("event_id"), col("arr"), col("value"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .drop("event_id")
      .crossJoin(broadcast(horizon))
      .select(
        col("user_id"),
        col("ts").as("valid_from"),
        coalesce(col("valid_to"), col("h")).as("valid_to"),
        col("arr").as("dim_arr"),
        col("value").as("dim_value"))
    val facts = ch
      .filter(col("op") === "UPDATE" && col("event_id") % 2 === 1)
      .select(
        col("user_id"),
        col("ts").as("fact_ts"),
        col("arr").as("fact_arr"),
        col("event_id").as("fact_id"))
    facts
      .join(versions, Seq("user_id"))
      .filter(col("valid_from") <= col("fact_ts") && col("fact_ts") < col("valid_to"))
      .filter(col("dim_arr") > col("fact_arr"))
      .select(
        col("fact_id"),
        col("user_id"),
        col("fact_ts"),
        col("dim_value"),
        (col("dim_arr") - col("fact_arr")).as("arrived_late_by_us"))
  }

  /** #194 SCD2 interval-align join (temporal alignment): two
    * independently-versioned attribute histories of the same key —
    * the account's VALUE (versioned by signup/purchase events) and
    * its ENGAGEMENT level (versioned by click/view events) — aligned
    * into the piecewise segments where both are simultaneously known,
    * each segment carrying both attributes. This is the bitemporal
    * "align two SCD2 dimensions" operator every warehouse needs when
    * dimensions version on different cadences; a plain equi-join on
    * version ids cannot express it.
    *
    * Shape: each side is one per-key window (`lead` closes the
    * interval; the shared horizon = global max ts closes the last
    * version — a 1-row broadcast), then ONE equi-join on `user_id`
    * with the overlap predicate and `greatest/least` intersection
    * bounds. Per-key version counts are activity-bounded, so the join
    * fan-out is the true segment count, not a cross product; both
    * sides share the `user_id` hash partitioning — one exchange each.
    */
  def scd2Align(spark: SparkSession, dir: String): DataFrame = {
    val ch = classify(spark, dir) // ts in µs
    def versions(pred: Column, attr: Column, name: String): DataFrame = {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      ch.filter(pred)
        .select(col("user_id"), col("ts"), col("event_id"), attr.as(name))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .drop("event_id")
        .withColumnRenamed("ts", "valid_from")
    }
    val horizon = ch.agg((max("ts") + 1).as("h"))
    // classify() drops event_type, so the two histories split on op +
    // offset parity: INSERTs and even-offset UPDATEs version the value
    // history, odd-offset UPDATEs version the engagement history.
    val va = versions(
      col("op") === "INSERT" || (col("op") === "UPDATE" && col("event_id") % 2 === 0),
      round(col("value"), 2),
      "acct_value")
    val vb = versions(
      col("op") === "UPDATE" && col("event_id") % 2 === 1,
      round(col("value"), 2),
      "engagement_value")
    def closed(v: DataFrame): DataFrame =
      v.crossJoin(broadcast(horizon))
        .withColumn("valid_to", coalesce(col("valid_to"), col("h")))
        .drop("h")
    closed(va)
      .alias("a")
      .join(
        closed(vb).alias("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.valid_from") < col("b.valid_to") &&
          col("b.valid_from") < col("a.valid_to"))
      .select(
        col("a.user_id").as("user_id"),
        greatest(col("a.valid_from"), col("b.valid_from")).as("seg_from"),
        least(col("a.valid_to"), col("b.valid_to")).as("seg_to"),
        col("a.acct_value"),
        col("b.engagement_value"))
  }

  /** #237 Out-of-order repair audit: which keys' CURRENT state is
    * wrong if the consumer applies changes in ARRIVAL (offset) order
    * instead of event-time order — the failure mode a CDC pipeline
    * hits when a producer retry or partition rebalance delivers a
    * late event with a newer offset but an older timestamp. The
    * reference applies rows in consumption order
    * (`simple_kafka_etl.py:119-146`), so its `_current` table IS the
    * naive state. The driver corpus arrives perfectly ordered, so —
    * exactly like #5's simulated redelivery — the disorder is
    * PLANTED deterministically: every event with `event_id % 7 == 3`
    * is "stuck in a retry queue" and re-enters the stream 1000
    * offsets late (`arrival_seq = event_id + 1000`); everything
    * downstream treats arrival_seq as the consumption order.
    *
    * Reports every key where arrival-order state and event-time state
    * (#3's (ts, event_id) order) disagree, both states side by side,
    * plus the key's inversion count (adjacent arrival pairs whose
    * timestamps go backwards — the severity of the disorder, not just
    * its existence).
    *
    * Scale: three per-key windows (two arg-max row_numbers + one lag)
    * over one user_id partitioning — a single exchange, then a
    * per-key aggregate; linear, no self-joins.
    */
  def outOfOrderRepair(spark: SparkSession, dir: String, delayOffsets: Long = 1000L)
      : DataFrame = {
    val ch = classify(spark, dir)
      .withColumn(
        "arrival_seq",
        col("event_id") + when(col("event_id") % 7 === 3, lit(delayOffsets)).otherwise(lit(0L)))
    val byArrival =
      Window.partitionBy("user_id").orderBy(col("arrival_seq").desc, col("event_id").desc)
    val byArrivalAsc =
      Window.partitionBy("user_id").orderBy(col("arrival_seq"), col("event_id"))
    val flagged = ch
      .withColumn("rn_arrival", row_number().over(byArrival))
      .withColumn("rn_ts", row_number().over(byKeyDesc))
      .withColumn("prev_ts", lag("ts", 1).over(byArrivalAsc))
      .withColumn("inv", (col("prev_ts").isNotNull && col("ts") < col("prev_ts")).cast("long"))
    flagged
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_changes"),
        sum("inv").as("n_inversions"),
        max(when(col("rn_arrival") === 1, col("event_id"))).as("naive_event_id"),
        max(when(col("rn_arrival") === 1, col("op"))).as("naive_op"),
        max(when(col("rn_arrival") === 1, col("value"))).as("naive_value"),
        max(when(col("rn_ts") === 1, col("event_id"))).as("repaired_event_id"),
        max(when(col("rn_ts") === 1, col("op"))).as("repaired_op"),
        max(when(col("rn_ts") === 1, col("value"))).as("repaired_value"))
      .filter(col("naive_event_id") =!= col("repaired_event_id"))
  }

  /** #249 Erasure (right-to-be-forgotten) audit: the purge manifest a
    * CDC warehouse must produce when a key is tombstoned — GDPR/CCPA
    * erasure is not "the current table forgot the row" (#3 already
    * guarantees that): every HISTORY row, pre-delete version, and
    * carried-forward original value still exists and must be
    * physically located before a compaction/crypto-shred pass can
    * run. Per tombstoned key (final op = DELETE, the #3 state
    * machine): rows to purge by change type, the key's total stored
    * value-bearing rows, first/last change time, age of the
    * tombstone against the corpus clock, and the `purge_eligible`
    * flag under the retention horizon (old enough that replaying
    * consumers — the #217 constraint — can no longer resurrect it).
    * #217 sizes reclaim in aggregate; this is the per-key work
    * order.
    *
    * One user_id exchange (the same single-shuffle discipline as
    * #3/#4): per-key last-op aggregate + change-type counts in one
    * pass, the corpus max-ts as a 1-row broadcast. Linear; output is
    * bounded by the tombstoned-key count.
    */
  def erasureAudit(spark: SparkSession, dir: String, horizonDays: Int = 7): DataFrame = {
    val ch = classify(spark, dir)
    val perKey = ch
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_history_rows"),
        count(when(col("op") === "INSERT", 1)).as("n_inserts"),
        count(when(col("op") === "UPDATE", 1)).as("n_updates"),
        count(when(col("op") === "DELETE", 1)).as("n_deletes"),
        min("ts").as("first_ts"),
        max("ts").as("last_ts"),
        max_by(col("op"), struct(col("ts"), col("event_id"))).as("final_op"))
    val clock = ch.agg(max("ts").as("now_ts"))
    perKey
      .filter(col("final_op") === "DELETE")
      .crossJoin(broadcast(clock))
      .select(
        col("user_id"),
        col("n_history_rows"),
        col("n_inserts"),
        col("n_updates"),
        col("n_deletes"),
        col("first_ts"),
        col("last_ts"),
        expr("(now_ts - last_ts) div 86400000000").as("tombstone_age_days"),
        (col("now_ts") - col("last_ts") >= lit(horizonDays) * 86400000000L)
          .cast("long")
          .as("purge_eligible"))
  }

  /** #353 Hot-key audit: the changelog's per-key change-count
    * distribution — octave histogram (the #348 len(bin) trick) plus
    * the top-10 hottest keys with their share and cumulative share of
    * all changes. THE capacity question for a keyed CDC pipeline:
    * state stores, upsert sinks and shuffle partitions all size to
    * the hottest keys, not the mean (#99 diagnoses value skew for
    * joins; this reads update-frequency skew for state). One per-key
    * aggregate; top-10 rides WindowGroupLimit; shares are truncating
    * e6 quotients against a 1-row broadcast total.
    */
  def hotKeys(spark: SparkSession, dir: String, topK: Int = 10): DataFrame = {
    val perKey = classify(spark, dir).groupBy("user_id").agg(count(lit(1)).as("n_changes"))
    val tot = perKey.agg(sum("n_changes").as("n_total"), count(lit(1)).as("n_keys"))
    val w = Window.orderBy(col("n_changes").desc, col("user_id"))
    perKey
      .orderBy(col("n_changes").desc, col("user_id"))
      .limit(topK)
      .withColumn("rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(tot))
      .withColumn("share_e6", expr("CAST(n_changes * 1000000 div n_total AS BIGINT)"))
      .withColumn(
        "cum_share_e6",
        expr("CAST(sum(n_changes) OVER (ORDER BY rank) * 1000000 div n_total AS BIGINT)"))
      .select(
        col("rank"),
        col("user_id"),
        col("n_changes"),
        col("share_e6"),
        col("cum_share_e6"),
        col("n_keys"),
        col("n_total"))
  }

  /** #434 Payload schema-drift audit: the schema-on-read monitor a
    * JSON CDC feed needs because the registry only versions DECLARED
    * schemas — what actually arrives drifts when an upstream deploy
    * adds, drops, or renames a payload field mid-stream (the Debezium
    * JsonConverter ships whatever the table has NOW). The detector is
    * generic: per payload KEY across the feed's day timeline, report
    * first/last day seen, active days, messages carrying the key, and
    * presence within the key's own active span (n_msgs·1e6 div
    * messages-in-span — 1e6 = the key is in every message while live;
    * less = intermittent, the mixed-producer smell). One
    * `json_object_keys` explode + two aggregates + a span join —
    * linear, alphabet-bounded output, no windows.
    *
    * The audited feed is self-built with PLANTED evolution (the #426
    * planted-truth discipline): phase thirds of the day span —
    * base keys {id, user_id, amount}; the middle third ADDS `channel`;
    * the final third RENAMES amount → amount_cents (drop + add, the
    * classic breaking deploy) and keeps channel. The expected read:
    * id/user_id span everything at presence 1e6; amount ends at t2
    * with presence 1e6 inside its span; channel starts at t1;
    * amount_cents starts at t2.
    */
  /** to_json drops null struct fields by default
    * (ignoreNullFields=true) — a null event_type/value/event_id/
    * user_id in a future corpus would silently shrink a phase's key
    * set and break both the oracle's hard-coded per-phase key lists
    * and the presence == 1e6 invariant. Emitting explicit nulls keeps
    * every payload carrying exactly the keys the phase declares.
    */
  private val KeepNulls = Map("ignoreNullFields" -> "false")

  def schemaDrift(spark: SparkSession, dir: String): DataFrame = {
    val nsPerDay = 86400L * 1000000000L
    val ev = Tables
      .events(spark, dir)
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"),
        expr(s"ts div ${nsPerDay}L").as("day"))
    val bounds = ev.agg(
      expr("min(day) + (max(day) - min(day) + 1) div 3").as("t1"),
      expr("min(day) + 2 * ((max(day) - min(day) + 1) div 3)").as("t2"))
    val phased = ev.crossJoin(broadcast(bounds))
    val p0 = phased
      .filter(col("day") < col("t1"))
      .select(
        col("day"),
        to_json(
          struct(
            col("event_id").as("id"),
            col("user_id"),
            col("cents").as("amount")),
          KeepNulls).as("payload"))
    val p1 = phased
      .filter(col("day") >= col("t1") && col("day") < col("t2"))
      .select(
        col("day"),
        to_json(
          struct(
            col("event_id").as("id"),
            col("user_id"),
            col("cents").as("amount"),
            col("event_type").as("channel")),
          KeepNulls).as("payload"))
    val p2 = phased
      .filter(col("day") >= col("t2"))
      .select(
        col("day"),
        to_json(
          struct(
            col("event_id").as("id"),
            col("user_id"),
            col("cents").as("amount_cents"),
            col("event_type").as("channel")),
          KeepNulls).as("payload"))
    val feed = p0.unionAll(p1).unionAll(p2)
    // the generic detector: everything below sees only (day, payload)
    val perDay = feed.groupBy("day").agg(count(lit(1)).as("day_msgs"))
    val keyed = feed
      .select(col("day"), explode(expr("json_object_keys(payload)")).as("k"))
      .groupBy("k")
      .agg(
        min("day").as("first_day"),
        max("day").as("last_day"),
        count_distinct(col("day")).as("active_days"),
        count(lit(1)).as("n_msgs"))
    val spanTotals = keyed
      .join(
        perDay,
        perDay("day") >= keyed("first_day") && perDay("day") <= keyed("last_day"))
      .groupBy("k")
      .agg(sum("day_msgs").as("span_msgs"))
    keyed
      .join(spanTotals, "k")
      .select(
        col("k").as("key"),
        col("first_day"),
        col("last_day"),
        col("active_days"),
        col("n_msgs"),
        expr("CAST(n_msgs * 1000000 div span_msgs AS BIGINT)").as("presence_e6"))
  }
}
