package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Cdc

/** Restart-from-checkpoint: stop the stateful CDC stream mid-way,
  * restart against the SAME checkpoint, feed more data — the resumed
  * state must converge to the batch result (no lost or double-applied
  * changes). This is the operational exactly-once story of the
  * reference's offset-tracking consumer, carried by Spark's
  * checkpoint + state store instead of a Postgres uniqueness probe.
  */
class CheckpointRecoverySpec extends SparkSpec {

  private def withTempDir[T](f: String => T): T = {
    val d = Files.createTempDirectory("graft-ckpt").toFile
    try f(d.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(d)
    }
  }

  test("SCD2 stream resumed from checkpoint into a parquet sink equals the batch closed versions") {
    withTempDir { inDir =>
      withTempDir { ckpt =>
        withTempDir { outDir =>
          val changes = Cdc.classify(spark, sf)
          val mid = changes
            .agg(expr("percentile(ts, 0.5)")).head.getDouble(0).toLong

          // append-mode stateful stream into a fault-tolerant file sink
          def startQuery() = CdcStream
            .scd2Stream(CdcStream.readChangelog(spark, inDir))
            .writeStream
            .format("parquet")
            .option("path", outDir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()

          changes.filter(col("ts") <= mid).write.mode("append").parquet(inDir)
          val q1 = startQuery()
          q1.processAllAvailable()
          q1.stop() // simulated failure/redeploy

          changes.filter(col("ts") > mid).write.mode("append").parquet(inDir)
          val q2 = startQuery() // resumes from the same checkpoint + state store
          try {
            q2.processAllAvailable()
          } finally q2.stop()

          val streamedClosed = spark.read
            .schema(
              "user_id BIGINT, event_id BIGINT, change_type STRING, " +
                "value DOUBLE, valid_from BIGINT, valid_to BIGINT")
            .parquet(outDir)
            .select("user_id", "event_id", "change_type", "value", "valid_from", "valid_to")
          val batchClosed = Cdc
            .scd2(spark, sf)
            .filter(col("valid_to").isNotNull)
            .select("user_id", "event_id", "change_type", "value", "valid_from", "valid_to")
          assert(streamedClosed.exceptAll(batchClosed).count() == 0,
            "resumed stream emitted rows not in batch")
          assert(batchClosed.exceptAll(streamedClosed).count() == 0,
            "batch rows missing after resume")
        }
      }
    }
  }
}
