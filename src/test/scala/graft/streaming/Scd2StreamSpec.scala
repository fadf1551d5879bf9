package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Cdc

class Scd2StreamSpec extends SparkSpec {

  private def withTempDir[T](f: String => T): T = {
    val d = Files.createTempDirectory("graft-scd2").toFile
    try f(d.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(d)
    }
  }

  test("streamed closed SCD2 versions equal the batch closed versions across two arrivals") {
    withTempDir { inDir =>
      // split by TIME (CDC deliveries are ordered across batches; the
      // state machine intentionally drops stale cross-batch arrivals)
      val changes = Cdc.classify(spark, sf)
      val mid = changes.agg(
        org.apache.spark.sql.functions.expr("percentile(ts, 0.5)")).head.getDouble(0).toLong
      changes.filter(col("ts") <= mid).write.mode("append").parquet(inDir)
      val q = CdcStream
        .scd2Stream(CdcStream.readChangelog(spark, inDir))
        .writeStream
        .format("memory")
        .queryName("scd2_stream")
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable()
        changes.filter(col("ts") > mid).write.mode("append").parquet(inDir)
        q.processAllAvailable()

        val streamedClosed = spark
          .table("scd2_stream")
          .select("user_id", "event_id", "change_type", "value", "valid_from", "valid_to")
        val batchClosed = Cdc
          .scd2(spark, sf)
          .filter(col("valid_to").isNotNull)
          .select("user_id", "event_id", "change_type", "value", "valid_from", "valid_to")
        assert(streamedClosed.exceptAll(batchClosed).count() == 0, "stream rows not in batch")
        assert(batchClosed.exceptAll(streamedClosed).count() == 0, "batch rows not in stream")
      } finally q.stop()
    }
  }

  test("watermark drops events later than the lateness bound in windowed aggregation") {
    import spark.implicits._
    withTempDir { inDir =>
      withTempDir { ckpt =>
        // batch 1: two on-time events far apart (advances the watermark past w1+1h)
        Seq(
          Change(1L, us("2024-01-01 00:10:00"), 1L, "INSERT", 1.0),
          Change(2L, us("2024-01-01 09:00:00"), 1L, "UPDATE", 1.0)
        ).toDS().write.mode("append").parquet(inDir)

        val q = CdcStream
          .windowedCounts(CdcStream.readChangelog(spark, inDir))
          .writeStream
          .format("memory")
          .queryName("late_windows")
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .start()
        try {
          q.processAllAvailable()
          // batch 2: an event 8h late for the first window — beyond the 1h bound
          Seq(Change(3L, us("2024-01-01 00:20:00"), 1L, "UPDATE", 9.0))
            .toDS().write.mode("append").parquet(inDir)
          q.processAllAvailable()
          val w1 = spark
            .table("late_windows")
            .filter(col("window_start") === lit("2024-01-01 00:00:00").cast("timestamp"))
          // the late UPDATE must NOT have re-emitted the first window
          assert(w1.filter(col("op") === "UPDATE").count() == 0,
            "late event leaked past the watermark")
        } finally q.stop()
      }
    }
  }

  private def us(s: String): Long =
    java.time.LocalDateTime
      .parse(s.replace(" ", "T"))
      .toInstant(java.time.ZoneOffset.UTC)
      .toEpochMilli * 1000L
}
