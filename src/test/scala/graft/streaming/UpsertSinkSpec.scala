package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Cdc

/** Materialized upsert sink: foreachBatch maintains an actual
  * current-state table on disk (read-merge-overwrite per micro-batch —
  * the MERGE INTO pattern without a table format; with Delta/Iceberg
  * the merge body becomes a real MERGE). After two arrival waves the
  * materialized table must equal the batch current-state.
  */
class UpsertSinkSpec extends SparkSpec {

  private def withTempDir[T](f: String => T): T = {
    val d = Files.createTempDirectory("graft-upsert").toFile
    try f(d.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(d)
    }
  }

  test("foreachBatch-maintained table equals batch current-state after two waves") {
    withTempDir { inDir =>
      withTempDir { stateDir =>
        val changes = Cdc.classify(spark, sf)
        val mid = changes.agg(expr("percentile(ts, 0.5)")).head.getDouble(0).toLong
        val tablePath = s"$stateDir/current"

        def upsert(batch: org.apache.spark.sql.Dataset[CurrentRow], batchId: Long): Unit = {
          val sp = batch.sparkSession
          val existing =
            try sp.read.parquet(tablePath)
            catch { case _: Throwable => sp.emptyDataFrame }
          val merged =
            if (existing.isEmpty) batch.toDF()
            else {
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy("user_id")
                .orderBy(col("last_ts").desc, col("last_event_id").desc)
              existing
                .unionByName(batch.toDF())
                .withColumn("rn", row_number().over(w))
                .filter(col("rn") === 1)
                .drop("rn")
            }
          // stage-then-swap: write to a new dir, repoint (poor-man's txn)
          val staged = s"$stateDir/staged_$batchId"
          merged.filter(col("op") =!= "DELETE").write.mode("overwrite").parquet(staged)
          val target = new java.io.File(tablePath)
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
          }
          if (target.exists()) rm(target)
          assert(new java.io.File(staged).renameTo(target))
          ()
        }

        changes.filter(col("ts") <= mid).write.mode("append").parquet(inDir)
        val q = CdcStream
          .currentState(CdcStream.readChangelog(spark, inDir))
          .writeStream
          .foreachBatch(upsert _)
          .outputMode("update")
          .start()
        try {
          q.processAllAvailable()
          changes.filter(col("ts") > mid).write.mode("append").parquet(inDir)
          q.processAllAvailable()
        } finally q.stop()

        val materialized = spark.read
          .parquet(tablePath)
          .select(col("user_id"), col("last_event_id"), col("last_ts"), col("value"))
        val batchCur = Cdc.current(spark, sf)
          .select("user_id", "last_event_id", "last_ts", "value")
        assert(materialized.exceptAll(batchCur).count() == 0, "materialized rows not in batch")
        assert(batchCur.exceptAll(materialized).count() == 0, "batch rows missing in materialized")
      }
    }
  }
}
