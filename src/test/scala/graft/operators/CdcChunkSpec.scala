package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The content-defined property that justifies chunking over
  * fixed-size blocks: prepending bytes to a payload re-fingerprints
  * only a bounded PREFIX of its chunks — every chunk after the first
  * re-synchronized boundary is byte-identical, so a content-addressed
  * store re-uploads O(edit) not O(file). Fixed 64-byte blocks would
  * shift every block boundary and share nothing.
  */
class CdcChunkSpec extends SparkSpec {

  private def withDocs[T](rows: Seq[(Long, String)])(f: String => T): T = {
    val d = Files.createTempDirectory("graft-cdc-chunks").toFile
    try {
      import spark.implicits._
      rows
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en"))
        .withColumn("source", lit("spec"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write
        .mode("overwrite")
        .parquet(s"${d.getAbsolutePath}/documents.parquet")
      f(d.getAbsolutePath)
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(d)
    }
  }

  test("prefix insertion re-synchronizes: the shared suffix dedups across versions") {
    val text = (1 to 40)
      .map(i => s"paragraph $i of a long enough synthetic document body to chunk")
      .mkString(" ")
    withDocs(Seq((1L, text), (2L, "PREPENDED EDIT >>> " + text))) { dir =>
      val out = Multimodal.cdcChunks(spark, dir).head()
      val total = out.getAs[Long]("total_chunks")
      val distinct = out.getAs[Long]("distinct_chunks")
      // the two docs share every chunk after the first re-sync point:
      // dedup must recover a large majority of the duplicated bytes
      val dup = total - distinct
      assert(total >= 10, s"corpus must actually chunk (got $total chunks)")
      assert(
        dup * 2 >= total - 4,
        s"re-sync failed: only $dup of ~${total / 2} duplicate chunks found")
      assert(out.getAs[Long]("savings_e6") > 300000, "byte savings must reflect the shared body")
    }
  }

  test("identical payloads dedup to one chunk set; disjoint payloads share nothing") {
    withDocs(Seq((1L, "a" * 500), (2L, "a" * 500))) { dir =>
      val out = Multimodal.cdcChunks(spark, dir).head()
      assert(out.getAs[Long]("total_chunks") == 2 * out.getAs[Long]("distinct_chunks"))
    }
    withDocs(Seq((1L, "abcdefgh" * 60), (2L, "ZYXWVUTS" * 60))) { dir =>
      val out = Multimodal.cdcChunks(spark, dir).head()
      assert(out.getAs[Long]("total_chunks") == out.getAs[Long]("distinct_chunks"))
    }
  }
}
