package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Driver-checkable wrappers over the Structured Streaming operators
  * (r11 verdict task 3: the spec-only streaming rows were the driver's
  * blind spot). Each wrapper materializes the sf changelog to a
  * scratch dir, drives the FILE-BACKED stream to completion on a
  * memory sink (`processAllAvailable`, plus a far-future watermark
  * sentinel where append-mode emission needs the event clock pushed
  * past every real window), and returns the final frame eagerly
  * checkpointed — a deterministic batch-comparable result the DuckDB
  * oracle replays exactly, which upgrades these rows from spec-only to
  * full rows+schema+hash CORRECTNESS entries.
  *
  * The streamed-≡-batch equality these wrappers rely on is itself
  * pinned per operator in `StreamingOpsSpec` (including the
  * state-operator plan assertions); the wrappers add the driver-visible
  * gate on top, not a replacement.
  */
object StreamDriver {

  /** Write the inputs, run `build`'s stream to completion on a memory
    * sink, return the sink table eagerly materialized; scratch dir and
    * temp view are cleaned up before returning.
    *
    * `requireSingleBatch = true` pins the assumption the ORDER-SENSITIVE
    * wrappers rely on (per-key greedy/sequential folds and
    * watermark-bounded dedup process the whole feed as one day-ordered
    * unit): the file source must deliver every scratch file in ONE
    * micro-batch (its default — no `maxFilesPerTrigger`, all files
    * available at start). If a source-config or corpus change ever
    * splits the feed across triggers, the wrapper fails loudly here
    * instead of silently diverging from the batch oracle.
    */
  private def runToCompletion(
      spark: SparkSession,
      write: String => Unit,
      build: String => DataFrame,
      mode: String,
      requireSingleBatch: Boolean = false): DataFrame = {
    val dir = Files.createTempDirectory("graft_stream_drv_").toString
    val name = "drv_" + java.util.UUID.randomUUID().toString.replace("-", "")
    try {
      write(dir)
      // r13 optimization round: stateful-operator state is partitioned
      // by spark.sql.shuffle.partitions AT QUERY START, and every
      // micro-batch pays per-partition state-store open/snapshot/commit
      // regardless of rows (measured: the interval join spent 260 s of
      // CPU across 32 store partitions on a 75 KB feed). The wrapper
      // just wrote the ENTIRE bounded feed, so size state partitions
      // from its actual bytes (≥4 MB per partition), clamped at the
      // session setting — at scale the feed is large and the clamp
      // leaves the session value in charge; results are partition-
      // count-invariant (keyed state machines / joins; the oracle
      // compare sorts). Restored in the finally.
      val sessionParts = spark.conf.get("spark.sql.shuffle.partitions")
      val feedBytes = {
        import scala.jdk.CollectionConverters._
        Files
          .walk(java.nio.file.Paths.get(dir))
          .iterator()
          .asScala
          .filter(Files.isRegularFile(_))
          .map(Files.size)
          .sum
      }
      val streamParts =
        math.max(1L, math.min(sessionParts.toLong, feedBytes / (4L << 20) + 1))
      val out =
        try {
          spark.conf.set("spark.sql.shuffle.partitions", streamParts.toString)
          val q = build(dir)
            .writeStream
            .format("memory")
            .queryName(name)
            .outputMode(mode)
            .start()
          try {
            q.processAllAvailable()
            if (requireSingleBatch) {
              val dataBatches = q.recentProgress.count(_.numInputRows > 0)
              require(
                dataBatches <= 1,
                s"order-sensitive stream wrapper expected one data micro-batch, saw $dataBatches " +
                  "(file source split the feed across triggers; the sequential-fold ≡ batch " +
                  "equivalence no longer holds)")
            }
          } finally q.stop()
          spark.table(name).localCheckpoint(eager = true)
        } finally spark.conf.set("spark.sql.shuffle.partitions", sessionParts)
      spark.catalog.dropTempView(name)
      out
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files
        .walk(java.nio.file.Paths.get(dir))
        .sorted(java.util.Comparator.reverseOrder())
        .iterator()
        .asScala
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  private def writeChangelog(spark: SparkSession, sfDir: String)(scratch: String): Unit =
    Cdc.classify(spark, sfDir).write.mode("append").parquet(scratch)

  /** #84 driver form: streaming `session_window` aggregation run to
    * completion in COMPLETE mode (the memory sink holds the full final
    * session table — no emission dependence on the watermark), session
    * bounds as µs longs. Oracle: the gap-merge islands replay with
    * session_window's half-open rule (a gap of EXACTLY 30 min starts a
    * new session; #16's batch lag+cumsum uses `>` — the two operators
    * differ by design at the boundary) and end = last event + gap.
    */
  def sessionsFinal(spark: SparkSession, sfDir: String): DataFrame =
    runToCompletion(
      spark,
      writeChangelog(spark, sfDir),
      d => CdcStream.sessionized(CdcStream.readChangelog(spark, d)),
      "complete")
      .select(
        unix_micros(col("session_start")).as("session_start_us"),
        unix_micros(col("session_end")).as("session_end_us"),
        col("user_id"),
        col("n_changes"),
        col("total_value"))

  /** #108 driver form: watermark-bounded dedup over an at-least-once
    * feed (every 10th event redelivered in a second parquet wave); the
    * deduped stream run to completion IS the unique changelog, which
    * the oracle states directly.
    */
  def dedupFinal(spark: SparkSession, sfDir: String): DataFrame =
    runToCompletion(
      spark,
      scratch => {
        val changes = Cdc.classify(spark, sfDir)
        changes.write.mode("append").parquet(scratch)
        changes.filter(col("event_id") % 10 === 0).write.mode("append").parquet(scratch)
      },
      d => CdcStream.dedupWithinWatermark(CdcStream.readChangelog(spark, d), delay = "40 days"),
      "append",
      requireSingleBatch = true)
      .select(col("event_id"), col("ts"), col("user_id"), col("op"), col("value"))

  /** #143 driver form: the watermarked stream-stream interval join
    * (DELETEs within 1 h after a same-key INSERT — the attribution
    * shape), run to completion; inner-join rows emit as soon as both
    * sides arrive, so the final frame equals the batch interval join
    * the oracle computes.
    */
  def intervalJoinFinal(spark: SparkSession, sfDir: String): DataFrame = {
    def side(df: DataFrame, op: String): DataFrame = df
      .filter(col("op") === op)
      .select(
        col("user_id").as("key"),
        col("event_id").as("id"),
        timestamp_micros(col("ts")).as("t"))
    runToCompletion(
      spark,
      writeChangelog(spark, sfDir),
      d => {
        val s = CdcStream.readChangelog(spark, d).toDF()
        CdcStream.intervalJoin(side(s, "INSERT"), side(s, "DELETE"))
      },
      "append")
      .select(
        col("key"),
        col("l_id"),
        col("r_id"),
        unix_micros(col("l_t")).as("l_t_us"),
        unix_micros(col("r_t")).as("r_t_us"))
  }

  /** #164 driver form: stream-static enrichment (changes left-joined
    * to the broadcast customer dim per micro-batch, stateless), run to
    * completion — equals the batch left join.
    */
  def enrichFinal(spark: SparkSession, sfDir: String): DataFrame =
    runToCompletion(
      spark,
      writeChangelog(spark, sfDir),
      d =>
        CdcStream.enrichWithDim(
          CdcStream.readChangelog(spark, d).toDF(),
          graft.Tables.customer(spark, sfDir)),
      "append")
      .select(
        col("user_id"),
        col("event_id"),
        col("ts"),
        col("op"),
        col("value"),
        col("c_nationkey"),
        col("c_mktsegment"))

  /** #8 driver form: the flatMapGroupsWithState upsert state machine
    * run to completion in update mode; the final frame (latest
    * emission per key, tombstoned keys dropped) IS the batch
    * current-state table, which the oracle states directly
    * (`cdc_current`'s SQL shape).
    */
  def currentStateFinal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    runToCompletion(
      spark,
      writeChangelog(spark, sfDir),
      d => CdcStream.currentState(CdcStream.readChangelog(spark, d)).toDF(),
      "update")
      .withColumn(
        "rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id")
            .orderBy(col("last_ts").desc, col("last_event_id").desc)))
      .filter(col("rn") === 1 && col("op") =!= "DELETE")
      .select(col("user_id"), col("last_event_id"), col("last_ts"), col("value"))
  }

  /** #149 driver form: the mapGroupsWithState count-min maintenance
    * run to completion; counters are monotone, so the final table is
    * the per-(depth, bucket) max across emissions — equal to the
    * batch sketch the oracle replays from the same md5 bucket hash.
    */
  def cmsFinal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    runToCompletion(
      spark,
      writeChangelog(spark, sfDir),
      d =>
        CdcStream
          .streamingCms(CdcStream.readChangelog(spark, d))
          .toDF("d", "b", "c"),
      "update")
      .groupBy("d", "b")
      .agg(max("c").as("c"))
  }

  /** The [[throttleFinal]] spacing interval — one day of event time,
    * shared with the oracle's recursive replay (the spec's measured
    * flap-suppression grain: the synthetic stream flaps well inside a
    * day, so the throttle genuinely drops rows at this interval).
    */
  private[graft] val ThrottleIntervalUs = 86400000000L

  /** #183 driver form: the per-key greedy throttle run to completion
    * (append mode — emissions are final). The greedy "emit iff ts ≥
    * last emitted + interval" is a per-key sequential fold, which the
    * oracle replays as a recursive CTE over each key's (ts, event_id)
    * ordered rows.
    */
  def throttleFinal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    runToCompletion(
      spark,
      writeChangelog(spark, sfDir),
      d =>
        CdcStream
          .throttled(CdcStream.readChangelog(spark, d), ThrottleIntervalUs)
          .toDF(),
      "append",
      requireSingleBatch = true)
      .select(col("event_id"), col("ts"), col("user_id"), col("op"), col("value"))
  }

  /** #263 driver form: the per-series Holt level+trend maintenance
    * run to completion; each emission carries its batch's day
    * trajectory as arrays, so the flattened union across emissions is
    * the full per-day trajectory — bit-identical to the batch fold
    * (the spec's pin), which the oracle replays keyed by the CDC op
    * (the stream's group key) via the shared recursive-CTE chain.
    */
  def holtFinal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    runToCompletion(
      spark,
      writeChangelog(spark, sfDir),
      d => CdcStream.streamingHolt(CdcStream.readChangelog(spark, d)).toDF(),
      "update",
      requireSingleBatch = true)
      .select(
        col("series").as("op"),
        explode(arrays_zip(col("days"), col("cents"), col("levels"), col("trends"))).as("z"))
      .select(
        col("op"),
        col("z.days").as("day"),
        col("z.cents").as("cents"),
        col("z.levels").as("level_c"),
        col("z.trends").as("trend_c"))
  }

  /** #205 driver form: the chained dedup + sliding-window distinct
    * count (append mode — complete is unsupported over multiple
    * stateful operators), with a far-future SENTINEL row (user −1,
    * +100 days) appended to the feed so the event-time watermark
    * passes every real window's end and append mode emits ALL of them
    * (the no-data batch after the last file); sentinel-only windows
    * (the only ones still open, and the only ones past the real max
    * ts) are filtered by window start. Result = the full batch
    * sliding-window distinct count the oracle replays on the
    * epoch-aligned window grid.
    */
  def rollingDistinctFinal(spark: SparkSession, sfDir: String): DataFrame = {
    val changes = Cdc.classify(spark, sfDir)
    val maxTsUs = changes.agg(max("ts")).head().getLong(0)
    val sentinelTs = maxTsUs + 100L * 86400L * 1000000L
    runToCompletion(
      spark,
      scratch => {
        changes.write.mode("append").parquet(scratch)
        changes.sparkSession
          .range(1)
          .select(
            lit(-1L).as("event_id"),
            lit(sentinelTs).as("ts"),
            lit(-1L).as("user_id"),
            lit("INSERT").as("op"),
            lit(0.0).as("value"))
          .write
          .mode("append")
          .parquet(scratch)
      },
      d => CdcStream.rollingDistinctUsers(CdcStream.readChangelog(spark, d)),
      "append")
      .select(
        unix_micros(col("win_start")).as("win_start_us"),
        unix_micros(col("win_end")).as("win_end_us"),
        col("n_distinct_users"))
      .filter(col("win_start_us") <= maxTsUs)
  }

  /** Explode a per-(series, micro-batch) trajectory emission (parallel
    * arrays) into one row per folded day — the shared read-out of the
    * `mapGroupsWithState` smoother family (#263's pattern).
    */
  private def explodeTrajectory(df: DataFrame, fields: Seq[(String, String)]): DataFrame = {
    val zipped = arrays_zip(fields.map { case (src, _) => col(src) }: _*)
    df.select(col("series").as("op"), explode(zipped).as("z"))
      .select(
        col("op") +: fields.map { case (src, out) => col(s"z.$src").as(out) }: _*)
  }

  /** The [[cusumFinal]] reference mean in cents — the FIXED monitoring
    * target streaming CUSUM is parameterized by, derived batch-side as
    * the truncating global mean of the per-(op, day) cent sums; the
    * oracle computes the identical expression in SQL.
    */
  private[graft] def cusumMuCents(spark: SparkSession, sfDir: String): Long =
    Cdc
      .classify(spark, sfDir)
      .select(
        col("op"),
        expr("ts div 86400000000").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("op", "day")
      .agg(sum("c").as("x"))
      .agg(expr("sum(x) div count(1)"))
      .head()
      .getLong(0)

  /** #297 driver form: the per-series streaming CUSUM run to
    * completion; each emission carries its batch's day trajectory, so
    * the flattened union across emissions is the full per-day C⁺/C⁻
    * trajectory — bit-identical to the prefix-extrema closed form the
    * oracle states with window functions (s = Σ(x−μ) over day order,
    * C⁺ = s − min(0, min prefix s), C⁻ = max(0, max prefix s) − s).
    */
  def cusumFinal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val mu = cusumMuCents(spark, sfDir)
    explodeTrajectory(
      runToCompletion(
        spark,
        writeChangelog(spark, sfDir),
        d => CdcStream.streamingCusum(CdcStream.readChangelog(spark, d), mu).toDF(),
        "update",
        requireSingleBatch = true),
      Seq("days" -> "day", "cents" -> "cents", "cPlus" -> "c_plus", "cMinus" -> "c_minus"))
  }

  /** #351 driver form: the per-series streaming Page–Hinkley monitor
    * run to completion; m_t = Σ_{i≤t}(x_i − trunc(S_i/i)) is a cumsum
    * of window-computable terms, so the oracle replays PH⁺/PH⁻ with
    * window functions (extrema over EMITTED m only — the state's
    * MaxValue/MinValue seeds).
    */
  def phFinal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    explodeTrajectory(
      runToCompletion(
        spark,
        writeChangelog(spark, sfDir),
        d => CdcStream.streamingPageHinkley(CdcStream.readChangelog(spark, d)).toDF(),
        "update",
        requireSingleBatch = true),
      Seq(
        "days" -> "day",
        "cents" -> "cents",
        "m" -> "m",
        "phPlus" -> "ph_plus",
        "phMinus" -> "ph_minus"))
  }

  /** #401 driver form: the per-series streaming dyadic EWMA run to
    * completion; each day's register is exactly the observed days with
    * gap ≤ 15, so the oracle replays it as the #349 cover join
    * (Σ x·2^(15−gap) trunc-div Σ 2^(15−gap) over a 15-day self-join).
    */
  def ewmaFinal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    explodeTrajectory(
      runToCompletion(
        spark,
        writeChangelog(spark, sfDir),
        d => CdcStream.streamingEwma(CdcStream.readChangelog(spark, d)).toDF(),
        "update",
        requireSingleBatch = true),
      Seq("days" -> "day", "cents" -> "cents", "ewma" -> "ewma_c"))
  }

  /** #325 driver form: the per-series streaming Croston smoother run
    * to completion; the (z, p) recursion is genuinely sequential, so
    * the oracle replays it as a recursive CTE over each series'
    * day-ordered demand rows (the #263 chain with Croston's updates).
    */
  def crostonFinal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    explodeTrajectory(
      runToCompletion(
        spark,
        writeChangelog(spark, sfDir),
        d => CdcStream.streamingCroston(CdcStream.readChangelog(spark, d)).toDF(),
        "update",
        requireSingleBatch = true),
      Seq(
        "days" -> "day",
        "cents" -> "cents",
        "zSize" -> "z_size",
        "pInterval" -> "p_interval",
        "rateE3" -> "rate_e3"))
  }

  /** #374 driver form: the per-series streaming I-MR chart run to
    * completion; the sufficient statistics (n, Σx, n₁, ΣMR) are prefix
    * aggregates and mr is a lag, so the oracle replays the live-limit
    * flags with window functions and HUGEINT cross products (the
    * BigInt comparisons the fold runs).
    */
  def imrFinal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    explodeTrajectory(
      runToCompletion(
        spark,
        writeChangelog(spark, sfDir),
        d => CdcStream.streamingImr(CdcStream.readChangelog(spark, d)).toDF(),
        "update",
        requireSingleBatch = true),
      Seq(
        "days" -> "day",
        "cents" -> "cents",
        "mr" -> "mr",
        "xOoc" -> "x_ooc",
        "mrOoc" -> "mr_ooc"))
  }

  /** The [[hhFinal]] sharding function — `String.hashCode`-based, the
    * same key the stream groups on; interpolated into the oracle SQL
    * as a CASE over the three CDC ops so the two sides can never
    * drift. With `HhShards = 4`: INSERT/UPDATE → shard 1 (competing
    * for the single slot — real Misra-Gries eviction dynamics),
    * DELETE → shard 3 (alone, so its counter is exact).
    */
  private[graft] def opShard(op: String, nShards: Int): Int =
    math.floorMod(op.hashCode, nShards)
  private[graft] val HhShards = 4
  private[graft] val HhSlots = 1

  /** #145 driver form: the sharded streaming Misra-Gries heavy-hitter
    * table run to completion (latest emission per shard, positive
    * slots exploded). With one slot per shard the fold is exactly
    * Boyer-Moore majority over the shard's (ts, event_id)-ordered op
    * sequence — which the oracle replays as a per-shard recursive CTE
    * (the operator's in-fold sort makes the streamed table
    * deterministic and batch-replayable).
    */
  def hhFinal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    runToCompletion(
      spark,
      writeChangelog(spark, sfDir),
      d =>
        CdcStream
          .streamingHeavyHitters(
            CdcStream.readChangelog(spark, d),
            slots = HhSlots,
            nShards = HhShards)
          .toDF(),
      "update",
      requireSingleBatch = true)
      .withColumn(
        "rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("shard")
            .orderBy(col("version").desc)))
      .filter(col("rn") === 1)
      .select(col("shard").cast("long").as("shard"), explode(col("items")).as(Seq("op", "cnt")))
  }
}
