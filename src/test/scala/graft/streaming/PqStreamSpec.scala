package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Similarity

/** Streaming PQ index maintenance: new embedding batches are encoded
  * against the FROZEN codebook (no per-batch retrain) and appended to
  * the index. The all-integer assignment makes streamed codes
  * bit-identical to a batch recompute under the same codebook — the
  * invariant that lets an OPTIMIZE job retrain on its own cadence
  * while ingest keeps appending.
  */
class PqStreamSpec extends SparkSpec {

  private def withTempDir[T](f: String => T): T = {
    val d = Files.createTempDirectory("graft-pqs").toFile
    try f(d.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(d)
    }
  }

  test("streamed index across two ingest waves equals the frozen-codebook batch encode") {
    withTempDir { inDir =>
      withTempDir { outDir =>
        val emb = Tables.embeddings(spark, sf)
        val cb = Similarity.trainPqCodebooks(spark, sf, 2)
        // wave 1 lands before the stream starts
        emb.filter(col("vec_id") % 2 === 0).write.mode("append").parquet(inDir)
        val q = spark.readStream
          .schema(emb.schema)
          .parquet(inDir)
          .writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            Similarity.pqAssignFrozen(b, cb).write.mode("append").parquet(outDir)
            ()
          }
          .start()
        try {
          q.processAllAvailable()
          // wave 2 arrives while the stream runs
          emb.filter(col("vec_id") % 2 === 1).write.mode("append").parquet(inDir)
          q.processAllAvailable()
        } finally q.stop()
        val streamed = spark.read.parquet(outDir)
        val batch = Similarity.pqAssignFrozen(
          emb.select(col("vec_id"), col("embedding")), cb)
        assert(streamed.count() == batch.count())
        assert(streamed.exceptAll(batch).count() == 0)
        assert(batch.exceptAll(streamed).count() == 0)
      }
    }
  }
}
