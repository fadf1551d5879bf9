package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Cdc

/** Consumer-group offset-commit conformance (r11 verdict task 2): the
  * reference consumes with auto-commit and `auto_offset_reset =
  * 'earliest'` (simple_kafka_etl.py:49-57), which yields exactly two
  * at-least-once failure shapes this spec replays against the
  * pipeline:
  *
  *  1. DUPLICATE DELIVERY AFTER A COMMIT FAILURE — the poll loop
  *     processed past the last successful auto-commit, crashed, and
  *     the rebalanced consumer re-reads from the stale committed
  *     offset: a mid-feed chunk arrives twice, in different batches.
  *  2. MID-STREAM RESTART WITH EARLIEST RESET — the group loses its
  *     offsets entirely (new group id / reset), so the restarted
  *     consumer re-reads the WHOLE topic while the sink already holds
  *     the first run's applies.
  *
  * Conformance = the terminal tables are bit-identical to a clean
  * single-pass run: the HISTORY table via Kafka-coordinate dedup
  * ([[CdcStream.dedupByOffset]] — the reference's Postgres uniqueness
  * probe, simple_kafka_etl.py:96-105, expressed as stream dedup), and
  * the CURRENT table via the [[CdcStream.currentState]] upsert state
  * machine, which must be idempotent under redelivery WITHOUT any
  * dedup stage (a redelivered change is never `newer` than the state
  * it already wrote — the latest-wins guard is the idempotency).
  */
class OffsetCommitConformanceSpec extends SparkSpec {

  private def withTempDir[T](f: String => T): T = {
    val d = Files.createTempDirectory("graft-offsets").toFile
    try f(d.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(d)
    }
  }

  /** The changelog as Kafka-coordinate records: one topic, partition
    * by key hash (Kafka's default key partitioning — all of a key's
    * changes share a partition, the ordering contract CDC relies on),
    * offset = event_id (dense and unique, a valid per-partition
    * surrogate for this feed).
    */
  private def coordFeed: DataFrame =
    Cdc
      .classify(spark, sf)
      .select(
        lit("dbserver1.bankdb.bank_accounts").as("topic"),
        (col("user_id") % 2).as("partition"),
        col("event_id").as("offset"),
        col("event_id"),
        col("ts"),
        col("user_id"),
        col("op"),
        col("value"))

  private def latestPerKey(emitted: DataFrame): DataFrame =
    emitted
      .withColumn(
        "rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id")
            .orderBy(col("last_ts").desc, col("last_event_id").desc)))
      .filter(col("rn") === 1 && col("op") =!= "DELETE")
      .select("user_id", "last_event_id", "last_ts", "value")

  private val coordSchema =
    "topic STRING, partition BIGINT, offset BIGINT, event_id BIGINT, " +
      "ts BIGINT, user_id BIGINT, op STRING, value DOUBLE"

  test("commit-failure redelivery: history dedup and current upsert equal the single pass") {
    withTempDir { inDir =>
      withTempDir { ckptDedup =>
        withTempDir { ckptState =>
          val feed = coordFeed.cache()
          val n = feed.count()
          val committed = n * 2 / 5 // last successful auto-commit
          val processed = n * 3 / 5 // how far the crashed poll loop got
          // wave 1: everything the first consumer incarnation polled
          feed.filter(col("offset") < processed).write.mode("append").parquet(inDir)

          // history-table path: coordinate dedup across batches
          val qDedup = spark.readStream
            .schema(coordSchema)
            .parquet(inDir)
            .transform(CdcStream.dedupByOffset)
            .writeStream
            .format("memory")
            .queryName("occ_history")
            .outputMode("append")
            .option("checkpointLocation", ckptDedup)
            .start()
          // current-table path: the upsert state machine on the RAW
          // (undeduped) feed — redelivery idempotency is its own
          import spark.implicits._
          val qState = spark.readStream
            .schema(coordSchema)
            .parquet(inDir)
            .select("event_id", "ts", "user_id", "op", "value")
            .as[Change]
            .transform(CdcStream.currentState)
            .writeStream
            .format("memory")
            .queryName("occ_current")
            .outputMode("update")
            .option("checkpointLocation", ckptState)
            .start()
          try {
            qDedup.processAllAvailable()
            qState.processAllAvailable()
            // rebalance re-reads from the stale commit: [committed,
            // processed) arrives AGAIN, then the rest of the topic
            feed
              .filter(col("offset") >= committed)
              .write
              .mode("append")
              .parquet(inDir)
            qDedup.processAllAvailable()
            qState.processAllAvailable()

            val history = spark
              .table("occ_history")
              .select("event_id", "ts", "user_id", "op", "value")
            val clean = Cdc.classify(spark, sf)
            assert(history.count() == n, "history must hold each change exactly once")
            assert(
              history.exceptAll(clean).count() == 0 && clean.exceptAll(history).count() == 0,
              "deduped history differs from the single-pass changelog")

            val current = latestPerKey(spark.table("occ_current"))
            val batch = Cdc.current(spark, sf).select("user_id", "last_event_id", "last_ts", "value")
            assert(
              current.exceptAll(batch).count() == 0 && batch.exceptAll(current).count() == 0,
              "current state diverged from the single-pass apply under redelivery")
          } finally {
            qDedup.stop()
            qState.stop()
            feed.unpersist()
            ()
          }
        }
      }
    }
  }

  test("earliest-reset restart: full re-read over an already-applied sink converges") {
    withTempDir { inDir =>
      withTempDir { ckpt1 =>
        withTempDir { ckpt2 =>
          import spark.implicits._
          val feed = coordFeed.cache()
          val n = feed.count()
          val mid = n / 2
          def startState(ckpt: String, name: String) = spark.readStream
            .schema(coordSchema)
            .parquet(inDir)
            .select("event_id", "ts", "user_id", "op", "value")
            .as[Change]
            .transform(CdcStream.currentState)
            .writeStream
            .format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()

          // first incarnation applies half the topic, then the group
          // loses its offsets (simulated: its checkpoint is abandoned)
          feed.filter(col("offset") < mid).write.mode("append").parquet(inDir)
          val q1 = startState(ckpt1, "occ_run1")
          q1.processAllAvailable()
          q1.stop()

          // rest of the topic lands; the reset consumer re-reads from
          // EARLIEST (fresh checkpoint = no committed progress)
          feed.filter(col("offset") >= mid).write.mode("append").parquet(inDir)
          val q2 = startState(ckpt2, "occ_run2")
          try q2.processAllAvailable()
          finally q2.stop()

          // terminal sink = latest version per key across BOTH
          // incarnations' applies (the JDBC upsert's latest-wins
          // contract): must equal the clean single pass
          val applied = spark.table("occ_run1").unionByName(spark.table("occ_run2"))
          val current = latestPerKey(applied)
          val batch = Cdc.current(spark, sf).select("user_id", "last_event_id", "last_ts", "value")
          assert(
            current.exceptAll(batch).count() == 0 && batch.exceptAll(current).count() == 0,
            "earliest-reset replay diverged from the single-pass apply")
          feed.unpersist()
          ()
        }
      }
    }
  }
}
