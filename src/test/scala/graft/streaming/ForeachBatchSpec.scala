package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Cdc

/** foreachBatch multi-sink routing: each micro-batch of current-state
  * updates lands in BOTH a history sink (append-all) and a live sink
  * (tombstones filtered) — the standard production shape for fanning a
  * CDC stream into warehouse tables, with the batch cached once and
  * written twice.
  */
class ForeachBatchSpec extends SparkSpec {

  private def withTempDir[T](f: String => T): T = {
    val d = Files.createTempDirectory("graft-feb").toFile
    try f(d.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(d)
    }
  }

  test("each micro-batch fans out to history and live sinks consistently") {
    withTempDir { inDir =>
      withTempDir { histDir =>
        withTempDir { liveDir =>
          Cdc.classify(spark, sf).write.mode("append").parquet(inDir)
          val q = CdcStream
            .currentState(CdcStream.readChangelog(spark, inDir))
            .writeStream
            .foreachBatch { (batch: org.apache.spark.sql.Dataset[CurrentRow], batchId: Long) =>
              val cached = batch.cache()
              try {
                cached.write.mode("append").parquet(s"$histDir/b=$batchId")
                cached
                  .filter(col("op") =!= "DELETE")
                  .write.mode("append").parquet(s"$liveDir/b=$batchId")
              } finally { cached.unpersist(); () }
            }
            .outputMode("update")
            .start()
          try q.processAllAvailable()
          finally q.stop()

          val hist = spark.read.parquet(s"$histDir/*")
          val live = spark.read.parquet(s"$liveDir/*")
          // live is exactly history minus tombstones, batch by batch
          assert(live.count() == hist.filter(col("op") =!= "DELETE").count())
          assert(live.exceptAll(hist.filter(col("op") =!= "DELETE")).count() == 0)
          // single batch here: live final state equals the batch current
          val batchCur = Cdc.current(spark, sf)
            .select("user_id", "last_event_id", "last_ts", "value")
          val liveCur = live.select("user_id", "last_event_id", "last_ts", "value")
          assert(liveCur.exceptAll(batchCur).count() == 0)
          assert(batchCur.exceptAll(liveCur).count() == 0)
        }
      }
    }
  }
}
