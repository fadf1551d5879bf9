package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Cdc

/** #8 Streaming CDC apply: the stream must converge to exactly the
  * batch `Cdc.current` result on the same changelog (batch-equivalence
  * oracle), including across incremental file arrivals.
  */
class CdcStreamSpec extends SparkSpec {

  private def withTempDir[T](f: String => T): T = {
    val d = Files.createTempDirectory("graft-stream").toFile
    try f(d.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(d)
    }
  }

  test("streamed current-state converges to the batch result across two incremental batches") {
    import spark.implicits._
    withTempDir { inDir =>
      withTempDir { ckpt =>
        val changes = Cdc.classify(spark, sf) // event_id, ts(µs), user_id, op, value
        // two arrival waves split by offset — simulates incremental CDC delivery
        changes.filter(col("event_id") % 2 === 0).write.mode("append").parquet(inDir)

        val q = CdcStream
          .currentState(CdcStream.readChangelog(spark, inDir))
          .writeStream
          .format("memory")
          .queryName("cdc_stream_current")
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .start()
        try {
          q.processAllAvailable()
          changes.filter(col("event_id") % 2 === 1).write.mode("append").parquet(inDir)
          q.processAllAvailable()

          // final state per key = the latest emitted row; live keys only
          val emitted = spark.table("cdc_stream_current")
          val finalRows = emitted
            .withColumn(
              "rn",
              row_number().over(
                org.apache.spark.sql.expressions.Window
                  .partitionBy("user_id")
                  .orderBy(col("last_ts").desc, col("last_event_id").desc)))
            .filter(col("rn") === 1 && col("op") =!= "DELETE")
            .select("user_id", "last_event_id", "last_ts", "value")

          val batch = Cdc.current(spark, sf).select("user_id", "last_event_id", "last_ts", "value")
          assert(finalRows.exceptAll(batch).count() == 0, "stream rows not in batch")
          assert(batch.exceptAll(finalRows).count() == 0, "batch rows not in stream")
        } finally q.stop()
      }
    }
  }

  test("watermarked windowed aggregation matches the batch window aggregation") {
    withTempDir { inDir =>
      withTempDir { ckpt =>
        val changes = Cdc.classify(spark, sf)
        changes.write.mode("append").parquet(inDir)
        val q = CdcStream
          .windowedCounts(CdcStream.readChangelog(spark, inDir))
          .writeStream
          .format("memory")
          .queryName("cdc_stream_windows")
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .start()
        try {
          q.processAllAvailable()
          val streamed = spark.table("cdc_stream_windows")
          val batch = changes
            .withColumn("ts_us", timestamp_micros(col("ts")))
            .groupBy(window(col("ts_us"), "1 hour"), col("op"))
            .agg(count(lit(1)).as("n_changes"), round(sum("value"), 2).as("total_value"))
            .select(
              col("window.start").as("window_start"),
              col("op"),
              col("n_changes"),
              col("total_value"))
          assert(streamed.exceptAll(batch).count() == 0)
          assert(batch.exceptAll(streamed).count() == 0)
        } finally q.stop()
      }
    }
  }
}
