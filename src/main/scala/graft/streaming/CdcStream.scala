package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** A classified CDC change record (the streaming analog of
  * `Cdc.classify` output: µs-epoch ts, op ∈ INSERT/UPDATE/DELETE).
  */
case class Change(event_id: Long, ts: Long, user_id: Long, op: String, value: Double)

/** Keeper state per key: the latest applied change. */
case class KeyState(last_event_id: Long, last_ts: Long, value: Double, op: String)

/** Per-key current-state row emitted on every update; `op` = DELETE
  * marks a tombstoned key (downstream filters it out of "current").
  */
case class CurrentRow(user_id: Long, last_event_id: Long, last_ts: Long, value: Double, op: String)

/** Change plus its event-time timestamp column (for watermarking). */
case class ChangeT(
    event_id: Long,
    ts: Long,
    user_id: Long,
    op: String,
    value: Double,
    ts_us: java.sql.Timestamp)

/** One Misra-Gries slot-table emission: the shard's candidate items
  * with their (under-)counts, stamped with a per-shard version so a
  * reader takes the latest emission per shard.
  */
case class MgEmit(shard: Int, version: Long, items: Map[String, Long])

/** A closed (or, at stream end, still-open) SCD2 version row. */
case class Scd2Row(
    user_id: Long,
    event_id: Long,
    change_type: String,
    value: Double,
    valid_from: Long,
    valid_to: Option[Long])

/** Structured Streaming CDC apply — the incremental path of the
  * reference pipeline (Kafka consumer loop + per-row Postgres upsert,
  * simple_kafka_etl.py:39-52,128-163) re-expressed as a stateful
  * stream: file-source changelog → `flatMapGroupsWithState` keyed on
  * user_id maintaining latest-change state → updated current rows.
  *
  * Scale: state lives in the state store partitioned by key (RocksDB
  * on a real cluster); each micro-batch shuffles only its new changes
  * on user_id — the same single-exchange shape as the batch operators.
  */
object CdcStream {

  val changeSchema: StructType = StructType(
    Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("op", StringType),
      StructField("value", DoubleType)
    ))

  /** Open a file-source changelog stream of `Change` rows. */
  def readChangelog(spark: SparkSession, dir: String): Dataset[Change] = {
    import spark.implicits._
    spark.readStream
      .schema(changeSchema)
      .parquet(dir)
      .as[Change]
  }

  /** Kafka-source variant of the changelog: subscribe to a Debezium
    * topic and parse each record's value as a flattened envelope — the
    * exact feed the reference consumes (KafkaConsumer on
    * `dbserver1.bankdb.bank_accounts`, simple_kafka_etl.py:49-58).
    * Requires the `spark-sql-kafka` provider on the classpath at run
    * time; the parse/classify logic is [[parseKafkaEnvelope]], which is
    * spec-tested on Kafka-envelope-shaped batch rows without a broker.
    */
  def readKafka(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    parseKafkaEnvelope(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load())

  /** Kafka envelope → typed change records. Keeps the Kafka coordinates
    * (topic, partition, offset): the reference's idempotent-ingest
    * check dedups on exactly this triple (simple_kafka_etl.py:81-84,
    * 119-122) — [[dedupByOffset]] is the streaming analog. Works on both
    * streaming and batch frames with (topic, partition, offset, value)
    * columns.
    */
  def parseKafkaEnvelope(raw: DataFrame): DataFrame =
    raw
      .select(
        col("topic"),
        col("partition"),
        col("offset"),
        from_json(col("value").cast("string"), graft.sources.Formats.debeziumSchema).as("r"))
      .select(
        col("topic"),
        col("partition"),
        col("offset"),
        col("r.id").as("event_id"),
        col("r.user_id"),
        col("r.account"),
        col("r.registered_at").as("ts"),
        when(col("r.__deleted") === "true", "DELETE").otherwise("UPSERT").as("op"))

  /** At-least-once → effectively-once: drop redelivered records by
    * Kafka coordinate. On a stream this is state-store dedup (pair with
    * a watermark to bound the state); on a batch frame it is exact
    * dedup — same declaration either way.
    */
  def dedupByOffset(parsed: DataFrame): DataFrame =
    parsed.dropDuplicates("topic", "partition", "offset")

  /** #108 Watermark-bounded streaming dedup: the production form of
    * [[dedupByOffset]]'s state-store dedup. Plain `dropDuplicates` on
    * a stream keeps EVERY key seen forever — unbounded state on an
    * unbounded stream, the 100 TB streaming killer.
    * `dropDuplicatesWithinWatermark` evicts a key's dedup record once
    * the watermark passes its event time + delay, so state is bounded
    * by the redelivery horizon (`delay`) × arrival rate, independent
    * of stream lifetime — redeliveries inside the horizon are
    * dropped, which is exactly the at-least-once contract (brokers
    * redeliver within a bounded window, not arbitrarily late).
    */
  def dedupWithinWatermark(changes: Dataset[Change], delay: String = "10 minutes"): DataFrame =
    changes
      .withColumn("ts_us", timestamp_micros(col("ts")))
      .withWatermark("ts_us", delay)
      .dropDuplicatesWithinWatermark("event_id")
      .drop("ts_us")

  /** Latest-change-wins upsert state machine. Changes inside a batch
    * are applied in (ts, event_id) order; stale arrivals (older than
    * the applied state) are ignored — at-least-once safe.
    */
  def currentState(changes: Dataset[Change]): Dataset[CurrentRow] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(applyChanges)
  }

  private[streaming] def applyChanges(
      key: Long,
      changes: Iterator[Change],
      state: GroupState[KeyState]): Iterator[CurrentRow] = {
    var st = state.getOption
    changes.toSeq.sortBy(c => (c.ts, c.event_id)).foreach { c =>
      val newer = st.forall(s =>
        c.ts > s.last_ts || (c.ts == s.last_ts && c.event_id > s.last_event_id))
      if (newer) st = Some(KeyState(c.event_id, c.ts, c.value, c.op))
    }
    st match {
      case Some(s) =>
        state.update(s)
        Iterator(CurrentRow(key, s.last_event_id, s.last_ts, s.value, s.op))
      case None => Iterator.empty
    }
  }

  /** Current-state with event-time TTL: keys idle for `ttlMs` past
    * the watermark are EXPIRED and their state removed — the guard
    * that keeps keyed state bounded on an unbounded key space (the
    * 100 TB streaming concern the plain version defers). Expiry is
    * announced as a CurrentRow with op = "EXPIRED" so downstream
    * sinks can retire the key.
    */
  def currentStateWithTtl(changes: Dataset[Change], ttlMs: Long): Dataset[CurrentRow] = {
    import changes.sparkSession.implicits._
    changes
      .withColumn("ts_us", timestamp_micros(col("ts")))
      .withWatermark("ts_us", "1 second")
      .as[ChangeT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, it: Iterator[ChangeT], state: GroupState[KeyState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(CurrentRow(key, s.last_event_id, s.last_ts, s.value, "EXPIRED"))
          } else {
            val out = applyChanges(key, it.map(c => Change(c.event_id, c.ts, c.user_id, c.op, c.value)), state)
            state.getOption.foreach { s =>
              // last_ts is µs; timeout timestamps are ms epoch. Clamp past
              // the current watermark: a stale redelivery for a key whose
              // applied state is old would otherwise compute a deadline <=
              // watermark and setTimeoutTimestamp throws, killing the query
              // — exactly the at-least-once case this operator tolerates.
              val deadline =
                math.max(state.getCurrentWatermarkMs() + 1, s.last_ts / 1000L + ttlMs)
              state.setTimeoutTimestamp(deadline)
            }
            out
          }
      }
  }

  /** Streaming SCD Type-2: on each applied change, emit the CLOSED
    * version row for the key's previous state (valid_to = new change's
    * ts) and track the open version in state. The append-only history
    * a warehouse sink (Delta/Iceberg) would receive incrementally;
    * union the emitted closed rows with the final open states to get
    * the full batch SCD2 table.
    */
  def scd2Stream(changes: Dataset[Change]): Dataset[Scd2Row] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(closeVersions)
  }

  private[streaming] def closeVersions(
      key: Long,
      changes: Iterator[Change],
      state: GroupState[KeyState]): Iterator[Scd2Row] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Row]
    var st = state.getOption
    changes.toSeq.sortBy(c => (c.ts, c.event_id)).foreach { c =>
      val newer = st.forall(s =>
        c.ts > s.last_ts || (c.ts == s.last_ts && c.event_id > s.last_event_id))
      if (newer) {
        st.foreach { s =>
          out += Scd2Row(key, s.last_event_id, s.op, s.value, s.last_ts, Some(c.ts))
        }
        st = Some(KeyState(c.event_id, c.ts, c.value, c.op))
      }
    }
    st.foreach(state.update)
    out.iterator
  }

  /** Watermarked windowed aggregation over the changelog: change
    * counts + value sums per (1 hour, op) window, tolerating 1 hour of
    * event-time lateness.
    */
  def windowedCounts(changes: Dataset[Change]): DataFrame =
    changes
      .withColumn("ts_us", timestamp_micros(col("ts")))
      .withWatermark("ts_us", "1 hour")
      .groupBy(window(col("ts_us"), "1 hour"), col("op"))
      .agg(count(lit(1)).as("n_changes"), round(sum("value"), 2).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("op"),
        col("n_changes"),
        col("total_value"))

  /** Gap-based session windows over the changelog: per-(user, session)
    * activity via `session_window` — the engine merges any events
    * within `gap` of each other into one variable-length window and
    * the watermark closes a session (and frees its state) once event
    * time passes session_end + gap. This is the streaming analog of
    * the batch lag+cumsum sessionization (`Analytics.sessionize`):
    * same gap semantics, but incremental and state-bounded — the
    * 100 TB streaming path never re-sorts history, it merges into
    * per-key session state as events arrive.
    */
  def sessionized(changes: Dataset[Change], gap: String = "30 minutes"): DataFrame =
    changes
      .withColumn("ts_us", timestamp_micros(col("ts")))
      .withWatermark("ts_us", "1 hour")
      .groupBy(session_window(col("ts_us"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_changes"), round(sum("value"), 2).as("total_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"),
        col("n_changes"),
        col("total_value"))

  /** #145 Streaming heavy hitters: sharded Misra-Gries slot tables
    * maintained in `mapGroupsWithState` — the streaming analog of #59
    * (`stat.freqItems`) with MEMORY BOUNDED BY `slots`, not by item
    * cardinality, and state sharded by item hash so no single task
    * owns the table. Each item lives in exactly ONE shard, so an item
    * heavy in the whole stream is at least as heavy relative to its
    * shard — the per-shard MG guarantee (any item with shard count >
    * n_shard/(slots+1) survives, and its counter undercounts by at
    * most n_shard/(slots+1)) therefore lifts to the global support
    * contract, exactly how mergeable-summary systems shard MG.
    * Emissions carry a per-shard version; readers take the latest.
    *
    * MG is ORDER-SENSITIVE (which slot a decrement evicts depends on
    * arrival order), so the fold processes each micro-batch's rows in
    * (ts, event_id) order — the same determinism contract
    * [[throttled]] pins — making the streamed table replayable from
    * the batch view given day-ordered micro-batches.
    */
  def streamingHeavyHitters(
      changes: Dataset[Change],
      slots: Int = 2,
      nShards: Int = 2): Dataset[MgEmit] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(c => math.floorMod(c.op.hashCode, nShards))
      .mapGroupsWithState[MgEmit, MgEmit](GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[Change], state: GroupState[MgEmit]) =>
          var table = state.getOption.map(_.items).getOrElse(Map.empty[String, Long])
          rows.toSeq.sortBy(c => (c.ts, c.event_id)).foreach { c =>
            val item = c.op
            if (table.contains(item)) table = table.updated(item, table(item) + 1)
            else if (table.size < slots) table = table.updated(item, 1L)
            else {
              // the MG decrement: charge one count to every slot AND
              // the arriving item (its implicit counter drops 0 → -1,
              // i.e. it is not inserted); empty slots free up
              table = table.map { case (k, v) => k -> (v - 1) }.filter(_._2 > 0)
            }
          }
          val next = MgEmit(shard, state.getOption.map(_.version).getOrElse(0L) + 1, table)
          state.update(next)
          next
      }
  }

  /** #149 Streaming count-min maintenance: the #147 CMS counter table
    * kept incrementally — state keyed by (depth, bucket), so the
    * store holds exactly depth×width longs regardless of stream
    * length or item cardinality, and each micro-batch shuffles only
    * its own increments (a counter-table-sized exchange). Because the
    * CMS build is a pure additive aggregation over deterministic
    * hash positions, the streamed table is BIT-IDENTICAL to a batch
    * build over the same prefix — `StreamingOpsSpec` pins streamed ≡
    * batch across two waves (the #137 frozen-model discipline applied
    * to a sketch).
    */
  def streamingCms(
      changes: Dataset[Change],
      depth: Int = 3,
      width: Int = 256): Dataset[(Long, Long, Long)] = {
    import changes.sparkSession.implicits._
    changes
      .flatMap { c =>
        (0 until depth).map { d =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md
            .digest(s"graft-cms-$d:${c.user_id}".getBytes("UTF-8"))
            .map("%02x".format(_))
            .mkString
            .take(15)
          (d.toLong, java.lang.Long.parseLong(hex, 16) % width)
        }
      }
      .groupByKey(identity)
      .mapGroupsWithState[Long, (Long, Long, Long)](GroupStateTimeout.NoTimeout) {
        (key: (Long, Long), rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val c = state.getOption.getOrElse(0L) + rows.size
          state.update(c)
          (key._1, key._2, c)
      }
  }

  /** #183 Per-key throttle (debounce): emit at most one change per key
    * per `intervalUs` of EVENT time — the flap-suppression stage in
    * front of an expensive sink (a key updating 1000×/s must not issue
    * 1000 warehouse merges; one per interval carries the same current
    * state). Greedy spacing semantics: process a key's changes in
    * (ts, event_id) order, emit a change iff its ts is at least
    * `intervalUs` past the last EMITTED ts — the first change of every
    * quiet period always passes, so a throttled stream never delays
    * the edge that matters (the flap START), it drops the middle.
    *
    * State per key = ONE long (last emitted ts) in
    * `flatMapGroupsWithState` — memory bounded by the key space,
    * independent of rate. Deterministic given per-key in-order
    * arrival (the changelog contract the upstream dedup/apply stages
    * already assume); `StreamingOpsSpec` pins streamed ≡ the greedy
    * reference across two arrival waves with state carried over.
    */
  def throttled(changes: Dataset[Change], intervalUs: Long): Dataset[Change] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Change](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[Change], state: GroupState[Long]) =>
          val sorted = rows.toSeq.sortBy(c => (c.ts, c.event_id))
          var last = state.getOption.getOrElse(Long.MinValue)
          val out = Seq.newBuilder[Change]
          sorted.foreach { c =>
            if (last == Long.MinValue || c.ts >= last + intervalUs) {
              out += c
              last = c.ts
            }
          }
          if (last != Long.MinValue) state.update(last)
          out.result().iterator
      }
  }

  /** #164 Stream-static enrichment join: attach a static dimension
    * (customer attributes) to a CDC change stream — the standard
    * "enrich before sinking" stage. Stream-static joins are
    * STATELESS in Structured Streaming: the static side is
    * re-resolved per micro-batch and broadcast, no watermark, no join
    * state to expire — `StreamStaticSpec` pins both streamed ≡ batch
    * equality AND the zero-state-operator plan property (the contract
    * that separates this from #143's symmetric stateful join). Left
    * join: a change whose key has no dimension row still flows,
    * null-enriched — enrichment must never drop or delay data.
    *
    * Scale: per micro-batch cost = batch × broadcast(dim); a dim too
    * big to broadcast becomes a shuffle join per batch — both are
    * Catalyst's call, the operator stays declarative.
    */
  def enrichWithDim(changes: DataFrame, dim: DataFrame): DataFrame =
    changes.join(
      broadcast(dim.select(
        col("c_custkey").as("user_id"),
        col("c_nationkey"),
        col("c_mktsegment"))),
      Seq("user_id"),
      "left")

  /** #143 Watermarked stream-stream interval join: right-side events
    * within `[left.t, left.t + horizon]` of a same-key left event —
    * the streaming attribution shape (touchpoint ↔ conversion,
    * INSERT ↔ DELETE audit, order ↔ shipment). Both sides declare a
    * `delay` watermark and the join predicate time-bounds BOTH
    * directions, which is exactly what lets the engine EXPIRE state:
    * a buffered left row can stop waiting once the right watermark
    * passes `t + horizon`, and vice versa — without the interval
    * bound, stream-stream join state grows forever. Inputs are
    * (key, id, t)-shaped frames; output carries both ids, the key,
    * and both event times. `StreamingOpsSpec` pins streamed ≡ batch
    * on the same inputs (the #84/#108 discipline).
    *
    * Scale: state is horizon × per-key arrival rate per side —
    * independent of stream length; the join itself is the standard
    * symmetric hash exchange on `key`, linear per micro-batch.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      horizon: String = "1 hour",
      delay: String = "1 hour"): DataFrame =
    left
      .select(col("key").as("l_key"), col("id").as("l_id"), col("t").as("l_t"))
      .withWatermark("l_t", delay)
      .join(
        right
          .select(col("key").as("r_key"), col("id").as("r_id"), col("t").as("r_t"))
          .withWatermark("r_t", delay),
        expr(s"l_key = r_key AND r_t >= l_t AND r_t <= l_t + interval $horizon"))
      .select(
        col("l_key").as("key"),
        col("l_id"),
        col("r_id"),
        col("l_t"),
        col("r_t"))

  /** #205 Streaming rolling distinct users: the #193 rolling-MAU
    * metric kept incrementally — sliding event-time windows
    * (`width` wide, sliding by `slide`) with an EXACT distinct count.
    * Streaming aggregation cannot express `countDistinct` directly,
    * so the plan CHAINS two stateful aggregations (Spark ≥3.4
    * multiple-stateful-operator support): dedup to per-(window, user)
    * presence first, then count presence rows per window — each
    * stage's state is watermark-bounded (presence state = windows ×
    * active users in them, counter state = open windows), and results
    * emit append-mode when the watermark closes a window. The spec
    * pins streamed ≡ the batch `window()` aggregation over the same
    * prefix.
    */
  def rollingDistinctUsers(
      changes: Dataset[Change],
      width: String = "7 days",
      slide: String = "1 day",
      delay: String = "1 hour"): DataFrame =
    changes
      .withColumn("ts_us", timestamp_micros(col("ts")))
      .withWatermark("ts_us", delay)
      .groupBy(window(col("ts_us"), width, slide), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy("window")
      .agg(count(lit(1)).as("n_distinct_users"))
      .select(
        col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("n_distinct_users"))

  /** #263 Streaming Holt state maintenance: the #250 level+trend
    * smoother kept incrementally per series in `mapGroupsWithState` —
    * state is ONE (last_day, level, trend) triple per event type
    * regardless of stream length, each micro-batch folds only its own
    * days, and because the batch trajectory is a left fold over
    * day-ordered steps, the streamed state after any day-aligned
    * prefix is BIT-IDENTICAL to the batch fold over the same prefix
    * (the #149 streamed ≡ batch sketch discipline applied to a model
    * state). Contract: micro-batch boundaries align to whole days
    * (what an event-time trigger provides); days arriving within a
    * batch are folded in day order. Emissions carry the full per-day
    * trajectory of the batch's days.
    */
  def streamingHolt(changes: Dataset[Change]): Dataset[HoltEmit] = {
    import changes.sparkSession.implicits._
    val usPerDay = 86400L * 1000000L // Change.ts is µs (the changelog contract)
    def tq(a: Long): Long = if (a < 0) -((-a) / 4) else a / 4
    changes
      .groupByKey(_.op)
      .mapGroupsWithState[HoltState, HoltEmit](GroupStateTimeout.NoTimeout) {
        (series: String, rows: Iterator[Change], state: GroupState[HoltState]) =>
          val daily = rows.toSeq
            .groupBy(c => c.ts / usPerDay)
            .map { case (d, cs) =>
              d -> cs.map(c => math.floor(c.value * 100 + 0.5).toLong).sum
            }
            .toSeq
            .sortBy(_._1)
          var st = state.getOption.getOrElse(HoltState(series, Long.MinValue, 0L, 0L, first = true))
          val steps = daily.map { case (day, y) =>
            if (st.first) st = HoltState(series, day, y, 0L, first = false)
            else {
              val nl = tq(y + 3 * (st.level + st.trend))
              st = HoltState(series, day, nl, tq((nl - st.level) + 3 * st.trend), first = false)
            }
            (day, y, st.level, st.trend)
          }
          state.update(st)
          HoltEmit(series, steps.map(_._1), steps.map(_._2), steps.map(_._3), steps.map(_._4))
      }
  }

  /** #297 Streaming CUSUM state maintenance: #284's one-sided C⁺/C⁻
    * drift statistics kept incrementally per series in
    * `mapGroupsWithState` against a FIXED reference mean (the
    * monitoring target a baseline period supplies — streaming CUSUM's
    * standard contract; the batch operator derives μ from the corpus,
    * a monitor pins it). State per key is the bounded triple
    * (S, min S, max S) — the prefix-extrema closed form means the
    * recursive max(0,·) fold needs nothing else — so streamed C⁺/C⁻
    * after any day-aligned prefix is BIT-IDENTICAL to the batch fold
    * over that prefix (the #149/#263 streamed ≡ batch discipline).
    * Same day-aligned micro-batch contract as [[streamingHolt]].
    */
  def streamingCusum(changes: Dataset[Change], muCents: Long): Dataset[CusumEmit] = {
    import changes.sparkSession.implicits._
    val usPerDay = 86400L * 1000000L
    changes
      .groupByKey(_.op)
      .mapGroupsWithState[CusumState, CusumEmit](GroupStateTimeout.NoTimeout) {
        (series: String, rows: Iterator[Change], state: GroupState[CusumState]) =>
          val daily = rows.toSeq
            .groupBy(c => c.ts / usPerDay)
            .map { case (d, cs) =>
              d -> cs.map(c => math.floor(c.value * 100 + 0.5).toLong).sum
            }
            .toSeq
            .sortBy(_._1)
          var st = state.getOption.getOrElse(CusumState(series, 0L, 0L, 0L))
          val steps = daily.map { case (day, x) =>
            val s = st.s + (x - muCents)
            st = CusumState(series, s, math.min(st.minS, s), math.max(st.maxS, s))
            (day, x, s - st.minS, st.maxS - s)
          }
          state.update(st)
          CusumEmit(series, steps.map(_._1), steps.map(_._2), steps.map(_._3), steps.map(_._4))
      }
  }

  /** #401 Streaming EWMA state maintenance: #349's exact dyadic EWMA
    * (α = ½ via powers of two, 16-day horizon) kept incrementally per
    * series in `mapGroupsWithState` — the live form of the
    * small-sustained-shift monitor (#297 streams CUSUM, #351 PH; EWMA
    * completes the streaming SPC trio). State per key is the ≤16-row
    * (day, cents) register the horizon needs and nothing more —
    * bounded REGARDLESS of stream length, unlike a naive recursive
    * EWMA whose α-weights never truncate. Each folded day emits
    * ewma = (Σ x_d·2^(15−gap)) div (Σ 2^(15−gap)) over register days
    * with gap ≤ 15 — the EXACT cover-join closed form of #349, so the
    * streamed trajectory after any day-aligned prefix is BIT-IDENTICAL
    * to the batch operator on that prefix (the #149/#263 discipline;
    * same day-aligned micro-batch contract as [[streamingHolt]]).
    * Replayed or out-of-order days ≤ the register head are dropped
    * (the #325/#374 hardened contract).
    */
  def streamingEwma(changes: Dataset[Change]): Dataset[EwmaEmit] = {
    import changes.sparkSession.implicits._
    val usPerDay = 86400L * 1000000L
    changes
      .groupByKey(_.op)
      .mapGroupsWithState[EwmaState, EwmaEmit](GroupStateTimeout.NoTimeout) {
        (series: String, rows: Iterator[Change], state: GroupState[EwmaState]) =>
          val daily = rows.toSeq
            .groupBy(c => c.ts / usPerDay)
            .map { case (d, cs) =>
              d -> cs.map(c => math.floor(c.value * 100 + 0.5).toLong).sum
            }
            .toSeq
            .sortBy(_._1)
          var st = state.getOption.getOrElse(EwmaState(series, Seq.empty, Seq.empty))
          val lastDay = st.days.lastOption.getOrElse(Long.MinValue)
          val steps = daily.filter(_._1 > lastDay).map { case (day, x) =>
            val entries = st.days.zip(st.xs).filter(_._1 > day - 16) :+ (day -> x)
            val num = entries.map { case (d, v) =>
              v * (1L << (15 - (day - d)).toInt)
            }.sum
            val den = entries.map { case (d, _) => 1L << (15 - (day - d)).toInt }.sum
            st = EwmaState(series, entries.map(_._1), entries.map(_._2))
            // batch #349 emits num div den (SQL truncation toward zero);
            // daily cent sums can in principle go negative — mirror it
            (day, x, if (num < 0) -((-num) / den) else num / den)
          }
          state.update(st)
          EwmaEmit(series, steps.map(_._1), steps.map(_._2), steps.map(_._3))
      }
  }

  /** #351 Streaming Page–Hinkley state maintenance: #331's
    * self-calibrating drift statistics kept incrementally per series
    * in `mapGroupsWithState` — the live form of the running-mean SPC
    * monitor (#297 streams CUSUM against a FIXED reference mean;
    * PH recalibrates as the level drifts, so its streaming state must
    * carry the prefix moments too). State per key is the bounded
    * 5-tuple (t, S, m, min m, max m) — exactly what the recursion
    * m_t = m_{t−1} + (x_t − S_t div t) and the prefix-extrema closed
    * forms need — so streamed PH⁺/PH⁻ after any day-aligned prefix is
    * BIT-IDENTICAL to #331's batch windows over that prefix (the
    * #149/#263 streamed ≡ batch discipline; same day-aligned
    * micro-batch contract as [[streamingHolt]]).
    */
  def streamingPageHinkley(changes: Dataset[Change]): Dataset[PhEmit] = {
    import changes.sparkSession.implicits._
    val usPerDay = 86400L * 1000000L
    changes
      .groupByKey(_.op)
      .mapGroupsWithState[PhState, PhEmit](GroupStateTimeout.NoTimeout) {
        (series: String, rows: Iterator[Change], state: GroupState[PhState]) =>
          val daily = rows.toSeq
            .groupBy(c => c.ts / usPerDay)
            .map { case (d, cs) =>
              d -> cs.map(c => math.floor(c.value * 100 + 0.5).toLong).sum
            }
            .toSeq
            .sortBy(_._1)
          var st = state.getOption.getOrElse(
            PhState(series, 0L, 0L, 0L, Long.MaxValue, Long.MinValue, Long.MinValue))
          // replay guard (the #325/#374 hardened contract): a replayed
          // or out-of-order micro-batch whose days fall at or before
          // the folded lastDay is dropped — refolding a day into the
          // (t, S, m, extrema) recursion would silently break the
          // streamed ≡ batch bit-identity this operator promises
          val steps = daily.filter(_._1 > st.lastDay).map { case (day, x) =>
            val t = st.t + 1
            val sum = st.s + x
            val m = st.m + (x - floorDiv(sum, t))
            st = PhState(series, t, sum, m, math.min(st.minM, m), math.max(st.maxM, m), day)
            (day, x, m, m - st.minM, st.maxM - m)
          }
          state.update(st)
          PhEmit(
            series,
            steps.map(_._1),
            steps.map(_._2),
            steps.map(_._3),
            steps.map(_._4),
            steps.map(_._5))
      }
  }

  // batch #331 uses SQL `div` (truncation toward zero); daily cent
  // sums are positive in practice but the stream must not silently
  // diverge if one goes negative — mirror truncating semantics
  private def floorDiv(a: Long, b: Long): Long =
    if (a < 0) -((-a) / b) else a / b

  /** #325 Streaming Croston state maintenance: #316's two-track
    * intermittent-demand smoother (size z, interval p, dyadic α = ¼,
    * sign-factored truncating quarter) kept incrementally per series
    * in `mapGroupsWithState` — the monitor form a spare-parts pipeline
    * runs on its live changelog. State per key is the bounded
    * (z, p, lastDay) triple — everything the recursion needs — so the
    * streamed trajectory after any day-aligned prefix is
    * BIT-IDENTICAL to #316's batch fold over that prefix (the
    * #149/#263 streamed ≡ batch discipline; same day-aligned
    * micro-batch contract as [[streamingHolt]]). Demand days are the
    * days EVENTS ARRIVE — gaps between arrivals are exactly the
    * inter-demand intervals Croston smooths.
    *
    * The p ≥ 1 invariant (rate = z·1000/p must never divide by zero)
    * is ENFORCED, not assumed: a replayed or out-of-order micro-batch
    * whose days fall at or before the folded `lastDay` is dropped
    * (those days were already folded — refolding them would corrupt
    * the batch-equivalence), and the interval update is clamped to 1
    * as a final guard, so a contract-violating producer degrades to
    * skipped rows rather than an ArithmeticException killing the query.
    */
  def streamingCroston(changes: Dataset[Change]): Dataset[CrostonEmit] = {
    import changes.sparkSession.implicits._
    val usPerDay = 86400L * 1000000L
    def tq(a: Long): Long = if (a < 0) -((-a) / 4) else a / 4
    changes
      .groupByKey(_.op)
      .mapGroupsWithState[CrostonState, CrostonEmit](GroupStateTimeout.NoTimeout) {
        (series: String, rows: Iterator[Change], state: GroupState[CrostonState]) =>
          val daily = rows.toSeq
            .groupBy(c => c.ts / usPerDay)
            .map { case (d, cs) =>
              d -> cs.map(c => math.floor(c.value * 100 + 0.5).toLong).sum
            }
            .toSeq
            .sortBy(_._1)
          var st =
            state.getOption.getOrElse(CrostonState(series, Long.MinValue, 0L, 1L, first = true))
          val steps = daily.flatMap { case (day, y) =>
            if (st.first) {
              st = CrostonState(series, day, y, 1L, first = false)
              Some((day, y, st.z, st.p, st.z * 1000L / st.p))
            } else if (day <= st.lastDay) None // replayed/out-of-order day: already folded
            else {
              st = CrostonState(
                series,
                day,
                st.z + tq(y - st.z),
                math.max(1L, st.p + tq((day - st.lastDay) - st.p)),
                first = false)
              Some((day, y, st.z, st.p, st.z * 1000L / st.p))
            }
          }
          state.update(st)
          CrostonEmit(
            series,
            steps.map(_._1),
            steps.map(_._2),
            steps.map(_._3),
            steps.map(_._4),
            steps.map(_._5))
      }
  }

  /** #374 Streaming I-MR state maintenance: #369's individuals &
    * moving-range chart kept incrementally per series in
    * `mapGroupsWithState` — the LIVE form of the ungrouped Shewhart
    * monitor. Unlike the recursive smoothers (#263/#297/#325/#351)
    * the batch I-MR's limits are retrospective (full-series x̄ and
    * M̄R), so the streaming contract is split honestly in two: the
    * STATE (n, Σx, n₁, ΣMR) after any day-aligned prefix is
    * BIT-IDENTICAL to the batch aggregate over that prefix (the
    * streamed ≡ batch discipline on the sufficient statistics), and
    * the emitted flags are the LIVE-limit decisions — each day judged
    * against the limits of the data seen SO FAR (the only limits a
    * live monitor can have; flags need ≥ 1 prior moving range, else
    * 0). Cross-multiplied comparisons run in BigInt inside the
    * per-group fold: x·n·1128·n₁ crosses 2⁶³ within the spec corpus
    * already. Replayed / out-of-order days (≤ the folded lastDay) are
    * dropped — the #325 hardened contract, so a misbehaving producer
    * degrades to skipped rows, never corrupted statistics.
    */
  def streamingImr(changes: Dataset[Change]): Dataset[ImrEmit] = {
    import changes.sparkSession.implicits._
    val usPerDay = 86400L * 1000000L
    changes
      .groupByKey(_.op)
      .mapGroupsWithState[ImrState, ImrEmit](GroupStateTimeout.NoTimeout) {
        (series: String, rows: Iterator[Change], state: GroupState[ImrState]) =>
          val daily = rows.toSeq
            .groupBy(c => c.ts / usPerDay)
            .map { case (d, cs) =>
              d -> cs.map(c => math.floor(c.value * 100 + 0.5).toLong).sum
            }
            .toSeq
            .sortBy(_._1)
          var st = state.getOption.getOrElse(
            ImrState(series, Long.MinValue, 0L, 0L, 0L, 0L, 0L))
          val steps = daily.flatMap { case (day, x) =>
            if (day <= st.lastDay && st.n > 0) None // replayed day: already folded
            else {
              val mr = if (st.n == 0) -1L else math.abs(x - st.lastX)
              val n = st.n + 1
              val sx = st.sx + x
              val n1 = st.n1 + (if (mr >= 0) 1L else 0L)
              val smr = st.smr + (if (mr >= 0) mr else 0L)
              st = ImrState(series, day, x, n, sx, n1, smr)
              val xOoc =
                if (n1 > 0 &&
                  (BigInt(x) * n - sx).abs * 1128 * n1 > BigInt(3000) * smr * n) 1L
                else 0L
              val mrOoc =
                if (mr >= 0 && BigInt(mr) * 1000 * n1 > BigInt(3267) * smr) 1L else 0L
              Some((day, x, mr, xOoc, mrOoc))
            }
          }
          state.update(st)
          ImrEmit(
            series,
            steps.map(_._1),
            steps.map(_._2),
            steps.map(_._3),
            steps.map(_._4),
            steps.map(_._5))
      }
  }
}

/** Per-series Holt smoother state: one bounded triple per key. */
case class HoltState(series: String, lastDay: Long, level: Long, trend: Long, first: Boolean)

/** One emission per (series, micro-batch): that batch's day-ordered
  * trajectory (parallel arrays keep the encoder flat).
  */
case class HoltEmit(
    series: String,
    days: Seq[Long],
    cents: Seq[Long],
    levels: Seq[Long],
    trends: Seq[Long])

/** Per-series CUSUM monitor state: the prefix sum and its running
  * extrema — the closed form's entire requirement, bounded per key.
  */
/** Per-series EWMA register: the ≤16 most recent (day, cents) pairs —
  * everything the dyadic 16-day-horizon EWMA needs, bounded per key.
  */
case class EwmaState(series: String, days: Seq[Long], xs: Seq[Long])

/** One emission per (series, micro-batch): that batch's day-ordered
  * EWMA trajectory (parallel arrays keep the encoder flat).
  */
case class EwmaEmit(series: String, days: Seq[Long], cents: Seq[Long], ewma: Seq[Long])

/** Per-series Page-Hinkley state: prefix count/sum + deviation
  * cumsum and its prefix extrema, plus the last folded day (the
  * replay guard) — one bounded 6-tuple per key.
  */
case class PhState(
    series: String,
    t: Long,
    s: Long,
    m: Long,
    minM: Long,
    maxM: Long,
    lastDay: Long)

/** One emission per (series, micro-batch): that batch's day-ordered
  * PH trajectory (parallel arrays keep the encoder flat).
  */
case class PhEmit(
    series: String,
    days: Seq[Long],
    cents: Seq[Long],
    m: Seq[Long],
    phPlus: Seq[Long],
    phMinus: Seq[Long])

case class CusumState(series: String, s: Long, minS: Long, maxS: Long)

/** One emission per (series, micro-batch): that batch's day-ordered
  * C⁺/C⁻ trajectory (parallel arrays keep the encoder flat).
  */
case class CusumEmit(
    series: String,
    days: Seq[Long],
    cents: Seq[Long],
    cPlus: Seq[Long],
    cMinus: Seq[Long])

/** Per-series Croston state: demand-size and interval smoothings plus
  * the last demand day — the recursion's entire requirement.
  */
case class CrostonState(series: String, lastDay: Long, z: Long, p: Long, first: Boolean)

/** One emission per (series, micro-batch): that batch's day-ordered
  * Croston trajectory (parallel arrays keep the encoder flat).
  */
case class CrostonEmit(
    series: String,
    days: Seq[Long],
    cents: Seq[Long],
    zSize: Seq[Long],
    pInterval: Seq[Long],
    rateE3: Seq[Long])

/** Per-series I-MR sufficient statistics: one bounded 7-tuple per key
  * — (lastDay, lastX) for the next moving range plus the four batch
  * aggregates (n, Σx, n₁, ΣMR).
  */
case class ImrState(
    series: String,
    lastDay: Long,
    lastX: Long,
    n: Long,
    sx: Long,
    n1: Long,
    smr: Long)

/** One emission per (series, micro-batch): that batch's day-ordered
  * I-MR trajectory; mr = −1 marks a series' first-ever day (no range
  * yet), flags are live-limit decisions.
  */
case class ImrEmit(
    series: String,
    days: Seq[Long],
    cents: Seq[Long],
    mr: Seq[Long],
    xOoc: Seq[Long],
    mrOoc: Seq[Long])
