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
    */
  private def runToCompletion(
      spark: SparkSession,
      write: String => Unit,
      build: String => DataFrame,
      mode: String): DataFrame = {
    val dir = Files.createTempDirectory("graft_stream_drv_").toString
    val name = "drv_" + java.util.UUID.randomUUID().toString.replace("-", "")
    try {
      write(dir)
      val q = build(dir)
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val out = spark.table(name).localCheckpoint(eager = true)
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
      "append")
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
      "append")
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
      "update")
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
}
