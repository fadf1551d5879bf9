package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Cdc, Multimodal}
import graft.sources.Formats

class FormatsSpec extends SparkSpec {

  private def withTempDir[T](f: String => T): T = {
    val d = Files.createTempDirectory("graft-fmt").toFile
    try f(d.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(d)
    }
  }

  test("debezium JSONL roundtrip: file-sourced parse equals in-query parse") {
    withTempDir { dir =>
      val envelopes = Tables
        .events(spark, sf)
        .select(
          to_json(
            struct(
              col("event_id").as("id"),
              col("user_id"),
              col("props").as("account"),
              expr("ts div 1000").as("registered_at"),
              when(col("event_type") === "error", "true").otherwise("false").as("__deleted")
            )).as("value"))
      envelopes.write.mode("overwrite").text(s"$dir/jsonl")
      val fromFile = Formats.parseDebezium(
        spark.read.schema(StructType(Seq(StructField("value", StringType)))).text(s"$dir/jsonl")
          .withColumnRenamed("value", "value"),
        col("value"))
      val inQuery = Cdc.envelopeParse(spark, sf)
      assert(fromFile.exceptAll(inQuery).count() == 0)
      assert(inQuery.exceptAll(fromFile).count() == 0)
    }
  }

  test("csv roundtrip with explicit schema") {
    withTempDir { dir =>
      val src = Tables.customer(spark, sf).select("c_custkey", "c_name", "c_acctbal")
      src.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
      val back = Formats.readCsv(spark, s"$dir/csv", StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_acctbal", DoubleType))))
      assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
    }
  }

  test("orc roundtrip preserves rows and pushes filters") {
    withTempDir { dir =>
      val src = Tables.orders(spark, sf)
      src.write.mode("overwrite").orc(s"$dir/orc")
      val back = Formats.readOrc(spark, s"$dir/orc")
      assert(back.count() == src.count())
      val scan = back
        .filter(col("o_totalprice") > 400000.0)
        .queryExecution.executedPlan.collectLeaves().head.toString
      assert(scan.contains("PushedFilters") && !scan.contains("PushedFilters: []"))
    }
  }

  test("partitioned write: hive layout by modality, pruned read, rows preserved") {
    withTempDir { dir =>
      val m = Multimodal.manifest(spark, sf)
      Formats.writePartitioned(m, s"$dir/mm", Seq("modality"), Seq("doc_id"))
      val dirs = new java.io.File(s"$dir/mm").listFiles().filter(_.isDirectory).map(_.getName)
      assert(dirs.toSet == Set("modality=image", "modality=audio", "modality=video"))
      val back = spark.read.parquet(s"$dir/mm")
      assert(back.count() == m.count())
      // partition pruning: the filter must land in PartitionFilters and
      // the scan must select exactly ONE of the three partition dirs —
      // a count-equality fallback would pass even on a full scan
      val pruned = back.filter(col("modality") === "image")
      val scans = pruned.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty)
      assert(scans.head.toString.contains("PartitionFilters"), scans.head.toString)
      assert(scans.head.selectedPartitions.partitionCount == 1,
        s"expected 1 pruned partition, scanned ${scans.head.selectedPartitions.partitionCount}")
      assert(pruned.count() == m.filter(col("modality") === "image").count())
    }
  }

  test("maxwell envelope parse types nested data and maps ops; malformed rows null out") {
    import spark.implicits._
    val rows = Seq(
      """{"database":"bankdb","table":"bank_accounts","type":"insert","ts":1700000000,
         "data":{"id":1,"user_id":7,"account":"a-7","value":10.5}}""".replaceAll("\n\\s*", ""),
      """{"database":"bankdb","table":"bank_accounts","type":"delete","ts":1700000100,
         "data":{"id":2,"user_id":7,"account":"a-7","value":0.0}}""".replaceAll("\n\\s*", ""),
      "not json at all"
    ).toDF("value")
    val parsed = graft.sources.Formats.parseMaxwell(rows, col("value")).collect()
    assert(parsed.length == 3)
    val first = parsed.find(r => !r.isNullAt(0) && r.getLong(0) == 1L).get
    // Maxwell ts is epoch seconds; parse normalizes to the µs timeline
    assert(first.getLong(1) == 7L && first.getString(2) == "a-7" &&
      first.getLong(3) == 1700000000000000L && first.getString(4) == "INSERT")
    assert(parsed.exists(r => !r.isNullAt(4) && r.getString(4) == "DELETE"))
    // malformed record → all-null row, never an exception
    assert(parsed.exists(r => r.isNullAt(0) && r.isNullAt(4)))
    // and the in-query roundtrip matches the batch classify op totals
    val mx = graft.operators.Cdc.maxwellParse(spark, sf)
    val ops = mx.groupBy("op").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = graft.operators.Cdc.classify(spark, sf)
      .groupBy("op").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops == ref, s"maxwell op histogram $ops != classify $ref")
  }

  test("quarantine reader: malformed lines routed to dead-letter, good rows intact") {
    import org.apache.spark.sql.types._
    withTempDir { dir =>
      val p = s"$dir/in.jsonl"
      val w = new java.io.PrintWriter(p)
      w.println("""{"id": 1, "v": "a"}""")
      w.println("""{"id": 2, "v": "b"}""")
      w.println("""{"id": 3, "v": """) // truncated json
      w.println("""not json at all""")
      w.println("""{"id": 5, "v": "e"}""")
      w.close()
      val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
      val qr = Formats.readJsonlWithQuarantine(spark, p, schema)
      val (good, bad) = (qr.good, qr.bad)
      assert(good.count() == 3)
      assert(good.columns.toSeq == Seq("id", "v"))
      assert(bad.count() == 2)
      // dead letters carry the original raw line for replay
      assert(bad.filter(col("raw").contains("not json")).count() == 1)
      // releasing drops the shared parse cache from executor storage
      val cachedBefore = spark.sparkContext.getPersistentRDDs.size
      qr.release()
      assert(spark.sparkContext.getPersistentRDDs.size < cachedBefore,
        "release() did not evict the parse cache")
    }
  }

  test("schema evolution: mergeSchema unions v1/v2 layouts, missing columns null") {
    withTempDir { dir =>
      val v1 = s"$dir/v1"
      val v2 = s"$dir/v2"
      Tables.events(spark, sf).select("event_id", "user_id")
        .limit(10).write.parquet(v1)
      Tables.events(spark, sf).select("event_id", "user_id", "value")
        .limit(10).write.parquet(v2)
      val all = Formats.readEvolved(spark, v1, v2)
      assert(all.columns.toSet == Set("event_id", "user_id", "value"))
      assert(all.count() == 20)
      // v1 rows surface with null value, v2 rows with real ones
      assert(all.filter(col("value").isNull).count() == 10)
      assert(all.filter(col("value").isNotNull).count() == 10)
    }
  }

  test("compaction: fragmented dataset rewritten to the size-derived file count, data intact") {
    withTempDir { dir =>
      val fragDir = s"$dir/frag"
      val outDir = s"$dir/compact"
      val src = Tables.events(spark, sf).select("event_id", "user_id", "value")
      src.repartition(64).write.parquet(fragDir)
      def parts(d: String) =
        new java.io.File(d).listFiles().count(f => f.getName.endsWith(".parquet"))
      assert(parts(fragDir) == 64, "fragmentation setup failed")
      // pick targetBytes so the listing-derived count lands in (1, 64)
      val totalBytes = new java.io.File(fragDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      val n = Formats.compactBySize(spark, fragDir, outDir, targetBytes = totalBytes / 4)
      assert(n >= 4 && n <= 5, s"unexpected file count $n")
      assert(parts(outDir) == n)
      val out = spark.read.parquet(outDir)
      assert(out.exceptAll(src).count() == 0 && src.exceptAll(out).count() == 0)
    }
  }
}
