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
}
