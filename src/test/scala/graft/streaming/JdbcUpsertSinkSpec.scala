package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Cdc

/** End-to-end JDBC terminal state: streaming CDC apply →
  * `foreachBatch` → staged MERGE into an embedded-Derby table — the
  * reference's Postgres `bank_accounts_current` semantics
  * (`simple_kafka_etl.py:128-163`) with a set-based merge instead of a
  * per-row loop. Covers the redelivery case: re-applying both the
  * final and an EARLIER batch must be a no-op (the reference's
  * idempotent-ingest guarantee, carried by the (ts, event_id) merge
  * guard instead of an offset-uniqueness probe).
  */
class JdbcUpsertSinkSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftUpsert;create=true"

  private def withTempDir[T](f: String => T): T = {
    val d = Files.createTempDirectory("graft-jdbc").toFile
    try f(d.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(d)
    }
  }

  private def readTable() =
    JdbcUpsertSink
      .readCurrent(spark, url)
      .select("user_id", "last_event_id", "last_ts", "value")

  /** Latest change per key of `changes` as CurrentRow rows (the shape
    * a currentState micro-batch emits).
    */
  private def latestPerKey(changes: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    changes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"),
        col("event_id").as("last_event_id"),
        col("ts").as("last_ts"),
        col("value"),
        col("op"))
      .as[CurrentRow]
  }

  test("streamed JDBC table equals batch current-state; tombstoned keys absent") {
    withTempDir { inDir =>
      val changes = Cdc.classify(spark, sf).cache()
      val mid = changes.agg(expr("percentile(ts, 0.5)")).head.getDouble(0).toLong

      // two arrival waves through the stateful stream into the sink
      changes.filter(col("ts") <= mid).write.mode("append").parquet(inDir)
      val q1 = CdcStream
        .currentState(CdcStream.readChangelog(spark, inDir))
        .writeStream
        .outputMode("update")
        .foreachBatch(JdbcUpsertSink.upsertBatch(url) _)
        .start()
      q1.processAllAvailable()
      changes.filter(col("ts") > mid).write.mode("append").parquet(inDir)
      q1.processAllAvailable()
      q1.stop()

      val got = readTable()
      val want = Cdc.current(spark, sf)
        .select("user_id", "last_event_id", "last_ts", "value")
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        "JDBC table diverged from batch current-state")
      // keys whose net effect is DELETE must have been merged away
      val deleted = Cdc.compact(spark, sf).filter("net_op = 'DELETE'").select("user_id")
      assert(readTable().join(deleted, "user_id").count() == 0)
    }
  }

  test("redelivered final batch and stale earlier batch are both no-ops") {
    val changes = Cdc.classify(spark, sf).cache()
    val mid = changes.agg(expr("percentile(ts, 0.5)")).head.getDouble(0).toLong
    // self-sufficient: seed the table (idempotent if the streamed test
    // already populated it — this IS the operator under test)
    JdbcUpsertSink.upsertBatch(url)(latestPerKey(changes), batchId = 98L)
    val before = readTable().collect().toSet
    assert(before.nonEmpty)

    // exact redelivery of the latest state of every key
    JdbcUpsertSink.upsertBatch(url)(latestPerKey(changes), batchId = 99L)
    assert(readTable().collect().toSet == before, "redelivery changed the table")

    // stale redelivery: first-wave state only — the guard must reject
    JdbcUpsertSink.upsertBatch(url)(
      latestPerKey(changes.filter(col("ts") <= mid)), batchId = 100L)
    assert(readTable().collect().toSet == before, "stale batch regressed the table")
  }

  test("replayed batch id is a no-op even when its rows would pass the ts guard") {
    val changes = Cdc.classify(spark, sf).cache()
    JdbcUpsertSink.upsertBatch(url)(latestPerKey(changes), batchId = 200L)
    val before = readTable().collect().toSet
    assert(before.nonEmpty)

    // hostile replay of the SAME batch id: timestamps bumped forward,
    // values garbled — rows the (ts, event_id) ordering guard alone
    // would happily apply. The ledger must make the whole batch a
    // no-op: batch 200 is already committed.
    val garbled = latestPerKey(
      changes
        .withColumn("ts", col("ts") + lit(1000000000L))
        .withColumn("value", col("value") * 2 + 1))
    JdbcUpsertSink.upsertBatch(url)(garbled, batchId = 200L)
    assert(readTable().collect().toSet == before, "ledger failed to reject the replayed batch id")

    assert(JdbcUpsertSink.isApplied(url, 200L))
    assert(!JdbcUpsertSink.isApplied(url, 201L))
  }

  test("enriched sink: streamed wide table equals batch current-state joined to the dim") {
    withTempDir { inDir =>
      val changes = Cdc.classify(spark, sf).cache()
      val mid = changes.agg(expr("percentile(ts, 0.5)")).head.getDouble(0).toLong
      val dim = graft.Tables.customer(spark, sf)

      changes.filter(col("ts") <= mid).write.mode("append").parquet(inDir)
      val q = CdcStream
        .currentState(CdcStream.readChangelog(spark, inDir))
        .writeStream
        .outputMode("update")
        .foreachBatch(JdbcUpsertSink.upsertEnrichedBatch(url, dim) _)
        .start()
      q.processAllAvailable()
      changes.filter(col("ts") > mid).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      q.stop()

      val got = JdbcUpsertSink
        .readCurrentEnriched(spark, url)
        .select("user_id", "last_event_id", "last_ts", "value", "c_nationkey", "c_mktsegment")
      val want = Cdc.current(spark, sf)
        .join(
          dim.select(
            col("c_custkey").as("user_id"),
            col("c_nationkey").cast("long").as("c_nationkey"),
            col("c_mktsegment")),
          Seq("user_id"),
          "left")
        .select("user_id", "last_event_id", "last_ts", "value", "c_nationkey", "c_mktsegment")
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        "enriched JDBC table diverged from batch current-state x dim")
      // enrichment must never drop rows: same key set as the plain view
      assert(got.count() == want.count())

      // replayed batch id on the enriched ledger is a no-op
      val before = got.collect().toSet
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      val garbled = {
        import spark.implicits._
        changes
          .withColumn("ts", col("ts") + lit(1000000000L))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("ts").as("last_ts"), col("value"), col("op"))
          .as[CurrentRow]
      }
      JdbcUpsertSink.upsertEnrichedBatch(url, dim)(garbled, batchId = 0L)
      val after = JdbcUpsertSink
        .readCurrentEnriched(spark, url)
        .select("user_id", "last_event_id", "last_ts", "value", "c_nationkey", "c_mktsegment")
        .collect().toSet
      assert(after == before, "enriched ledger failed to reject a replayed batch id")
    }
  }
}
