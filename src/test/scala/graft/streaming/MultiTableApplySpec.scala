package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The cross-table atomicity contract: a batch applied to one table
  * but not yet committed in the manifest is INVISIBLE to readers of
  * every table — a crash between the data write and the manifest
  * append leaves the previous consistent snapshot intact, and
  * re-running the batch is idempotent (partition overwrite).
  */
class MultiTableApplySpec extends SparkSpec {

  private def withTempDir[T](f: String => T): T = {
    val d = Files.createTempDirectory("graft-mta").toFile
    try f(d.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(d)
    }
  }

  private def mkBatch(ids: Seq[Long]) = {
    import spark.implicits._
    ids
      .flatMap(i => Seq(("orders", i, s"o$i"), ("lineitem", i, s"l$i")))
      .toDF("table", "id", "payload")
  }

  test("uncommitted batch is invisible everywhere; commit exposes both tables at once") {
    withTempDir { base =>
      val tables = Seq("orders", "lineitem")
      // batch 0: full commit
      MultiTableApply.applyBatch(mkBatch(Seq(1L, 2L)), tables, 0L, base)
      assert(MultiTableApply.committedWatermark(spark, base) == 0L)
      assert(MultiTableApply.readConsistent(spark, base, "orders").count() == 2)
      assert(MultiTableApply.readConsistent(spark, base, "lineitem").count() == 2)

      // batch 1 CRASHES after writing orders, before the manifest:
      // replicate step 1 for one table only
      mkBatch(Seq(3L))
        .filter(col("table") === "orders")
        .drop("table")
        .write.mode("overwrite").parquet(s"$base/orders/batch_id=1")
      // the torn batch is invisible: both tables still show batch 0 only
      assert(MultiTableApply.committedWatermark(spark, base) == 0L)
      assert(MultiTableApply.readConsistent(spark, base, "orders").count() == 2)
      assert(MultiTableApply.readConsistent(spark, base, "lineitem").count() == 2)

      // the re-run applies the SAME batch id completely (overwriting
      // the orphaned partition) and commits — now both tables move
      MultiTableApply.applyBatch(mkBatch(Seq(3L)), tables, 1L, base)
      assert(MultiTableApply.committedWatermark(spark, base) == 1L)
      val o = MultiTableApply.readConsistent(spark, base, "orders")
      val l = MultiTableApply.readConsistent(spark, base, "lineitem")
      assert(o.count() == 3 && l.count() == 3)
      // cross-table consistency: the id sets are identical
      assert(o.select("id").exceptAll(l.select("id")).count() == 0)
      assert(l.select("id").exceptAll(o.select("id")).count() == 0)
      // idempotent replay: applying batch 1 again changes nothing
      MultiTableApply.applyBatch(mkBatch(Seq(3L)), tables, 1L, base)
      assert(MultiTableApply.readConsistent(spark, base, "orders").count() == 3)
    }
  }

  test("orphaned LOWER-id batch stays invisible after a higher batch commits") {
    withTempDir { base =>
      val tables = Seq("orders", "lineitem")
      // batch 2 crashes mid-write (orders slice only, never committed) …
      mkBatch(Seq(9L))
        .filter(col("table") === "orders")
        .drop("table")
        .write.mode("overwrite").parquet(s"$base/orders/batch_id=2")
      // … and then batch 5 commits out of order. A `<= max(manifest)`
      // watermark read would now expose the torn batch 2; membership
      // must not.
      MultiTableApply.applyBatch(mkBatch(Seq(1L)), tables, 5L, base)
      assert(MultiTableApply.committedWatermark(spark, base) == 5L)
      assert(MultiTableApply.readConsistent(spark, base, "orders").count() == 1)
      assert(MultiTableApply.readConsistent(spark, base, "lineitem").count() == 1)
    }
  }
}
