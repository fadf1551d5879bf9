package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Cdc

/** The production state store: RocksDB-backed keyed state (bounded
  * memory, incremental checkpoints) instead of the default in-memory
  * HDFS-backed provider — the configuration a 100 TB streaming CDC
  * deployment runs with. Same stateful query, same batch-equivalent
  * answer.
  */
class RocksDbStateSpec extends SparkSpec {

  private def withTempDir[T](f: String => T): T = {
    val d = Files.createTempDirectory("graft-rocks").toFile
    try f(d.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(d)
    }
  }

  test("CDC current-state on the RocksDB state store provider equals batch") {
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      withTempDir { inDir =>
        Cdc.classify(spark, sf).write.mode("append").parquet(inDir)
        val q = CdcStream
          .currentState(CdcStream.readChangelog(spark, inDir))
          .writeStream
          .format("memory")
          .queryName("rocks_current")
          .outputMode("update")
          .start()
        try {
          q.processAllAvailable()
          val emitted = spark.table("rocks_current")
            .filter(col("op") =!= "DELETE")
            .select("user_id", "last_event_id", "last_ts", "value")
          val batch = Cdc.current(spark, sf)
            .select("user_id", "last_event_id", "last_ts", "value")
          assert(emitted.exceptAll(batch).count() == 0)
          assert(batch.exceptAll(emitted).count() == 0)
        } finally q.stop()
      }
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  private def us(s: String): Long =
    java.time.LocalDateTime
      .parse(s.replace(" ", "T"))
      .toInstant(java.time.ZoneOffset.UTC)
      .toEpochMilli * 1000L

  test("TTL current-state on RocksDB restarts from checkpoint with keyed state intact") {
    import spark.implicits._
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      withTempDir { inDir =>
        withTempDir { ckpt =>
          withTempDir { outDir =>
            // update-mode stateful stream → foreachBatch parquet (the
            // fault-tolerant sink shape; memory sink can't resume)
            def startQuery() = CdcStream
              .currentStateWithTtl(CdcStream.readChangelog(spark, inDir),
                ttlMs = 24L * 3600 * 1000)
              .writeStream
              .outputMode("update")
              .option("checkpointLocation", ckpt)
              .foreachBatch { (df: org.apache.spark.sql.Dataset[CurrentRow], id: Long) =>
                df.withColumn("batch_id", org.apache.spark.sql.functions.lit(id))
                  .write.mode("append").parquet(outDir)
              }
              .start()

            // run 1: establish state for keys 1 and 2 at 10:00
            Seq(
              Change(1L, us("2024-01-01 10:00:00"), 1L, "INSERT", 10.0),
              Change(2L, us("2024-01-01 10:00:00"), 2L, "INSERT", 20.0)
            ).toDS().write.mode("append").parquet(inDir)
            val q1 = startQuery()
            q1.processAllAvailable()
            q1.stop()

            // run 2, SAME checkpoint: a logically-stale change for key 1
            // (above the restored watermark, below the restored state's
            // last_ts) plus a fresh change for key 2
            Seq(
              Change(3L, us("2024-01-01 09:59:59") + 500000L, 1L, "UPDATE", 99.0),
              Change(4L, us("2024-01-01 10:05:00"), 2L, "UPDATE", 21.0)
            ).toDS().write.mode("append").parquet(inDir)
            val q2 = startQuery()
            q2.processAllAvailable()
            q2.stop()

            val out = spark.read.parquet(outDir)
            val lastBatch = out.agg(max("batch_id")).head.getLong(0)
            val resumed = out.filter(col("batch_id") === lastBatch)
            // key 1: the stale change must lose to the RESTORED state —
            // emitted row still carries the 10:00 value. Had state been
            // lost on restart, 99.0 would have been applied.
            val k1 = resumed.filter(col("user_id") === 1L).select("value", "last_event_id")
            assert(k1.collect().toSeq.map(r => (r.getDouble(0), r.getLong(1))) == Seq((10.0, 1L)),
              "restored state did not reject the stale redelivery")
            // key 2: the fresh change applies on top of restored state
            val k2 = resumed.filter(col("user_id") === 2L).select("value").head.getDouble(0)
            assert(k2 == 21.0)
          }
        }
      }
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
