package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Cdc

/** Streaming coverage beyond the CDC apply: exactly-once-style stream
  * dedup of redelivered offsets, and a watermarked stream-stream
  * interval join — both checked against their batch equivalents.
  */
class StreamingOpsSpec extends SparkSpec {

  private def withTempDir[T](f: String => T): T = {
    val d = Files.createTempDirectory("graft-sops").toFile
    try f(d.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(d)
    }
  }

  test("stream dedup collapses redelivered offsets to the batch-distinct count") {
    withTempDir { inDir =>
      val changes = Cdc.classify(spark, sf)
      // at-least-once delivery: every 10th offset arrives twice
      changes.write.mode("append").parquet(inDir)
      changes.filter(col("event_id") % 10 === 0).write.mode("append").parquet(inDir)

      val q = CdcStream
        .readChangelog(spark, inDir)
        .dropDuplicates("event_id") // prod: dropDuplicatesWithinWatermark bounds state
        .writeStream
        .format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable()
        assert(spark.table("stream_dedup").count() == changes.count())
      } finally q.stop()
    }
  }

  test("watermark-bounded dedup drops cross-batch redeliveries within the horizon") {
    withTempDir { inDir =>
      val changes = Cdc.classify(spark, sf)
      changes.write.mode("append").parquet(inDir)

      // delay spans the whole synthetic window, so every redelivery is
      // inside the horizon and must collapse; in production the same
      // declaration bounds state to horizon × arrival rate
      val q = CdcStream
        .dedupWithinWatermark(CdcStream.readChangelog(spark, inDir), delay = "40 days")
        .writeStream
        .format("memory")
        .queryName("stream_dedup_wm")
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable()
        // second wave: every 10th event redelivered in a LATER batch
        changes.filter(col("event_id") % 10 === 0).write.mode("append").parquet(inDir)
        q.processAllAvailable()
        assert(spark.table("stream_dedup_wm").count() == changes.count())
        // the stateful operator really is the watermark-bounded variant
        val ops = q.lastProgress.stateOperators.map(_.operatorName.toLowerCase)
        assert(ops.exists(_.contains("withinwatermark")), s"state operators: ${ops.mkString(",")}")
      } finally q.stop()
    }
  }

  test("streaming session windows match the batch session_window aggregation") {
    withTempDir { inDir =>
      Cdc.classify(spark, sf).write.mode("append").parquet(inDir)

      val q = CdcStream
        .sessionized(CdcStream.readChangelog(spark, inDir), gap = "30 minutes")
        .writeStream
        .format("memory")
        .queryName("stream_sessions")
        .outputMode("complete") // memory sink holds the full final session table
        .start()
      try {
        q.processAllAvailable()
        val streamed = spark.table("stream_sessions").cache()
        val batch = Cdc.classify(spark, sf)
          .withColumn("ts_us", timestamp_micros(col("ts")))
          .groupBy(session_window(col("ts_us"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_changes"), round(sum("value"), 2).as("total_value"))
          .select(
            col("session_window.start").as("session_start"),
            col("session_window.end").as("session_end"),
            col("user_id"), col("n_changes"), col("total_value"))
        assert(streamed.count() == batch.count())
        assert(streamed.exceptAll(batch).count() == 0 && batch.exceptAll(streamed).count() == 0)
        // session invariants: positive extent; per-user sessions
        // separated by more than the gap (else they'd have merged)
        assert(streamed.filter(col("session_end") <= col("session_start")).count() == 0)
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("session_start")
        val tooClose = streamed
          .withColumn("prev_end", lag("session_end", 1).over(w))
          .filter(col("prev_end").isNotNull &&
            col("session_start").cast("long") - col("prev_end").cast("long") < 0L)
        assert(tooClose.count() == 0, "overlapping sessions for a user")
      } finally q.stop()
    }
  }

  test("streaming heavy hitters: sharded Misra-Gries honors the MG guarantee across batches") {
    withTempDir { inDir =>
      val changes = Cdc.classify(spark, sf)
      val (slots, nShards) = (2, 2)
      // wave 1: the first half of the changelog
      changes.filter(col("event_id") % 2 === 0).write.mode("append").parquet(inDir)

      val q = CdcStream
        .streamingHeavyHitters(CdcStream.readChangelog(spark, inDir), slots, nShards)
        .writeStream
        .format("memory")
        .queryName("stream_mg")
        .outputMode("update")
        .start()
      try {
        q.processAllAvailable()
        // wave 2: the rest, in a later batch — state must carry over
        changes.filter(col("event_id") % 2 === 1).write.mode("append").parquet(inDir)
        q.processAllAvailable()

        // latest emission per shard
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("shard").orderBy(col("version").desc)
        val latest = spark
          .table("stream_mg")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("shard"), explode(col("items")).as(Seq("item", "mg_count")))
          .cache()

        // the self-computing MG contract per shard: exact counts from
        // the batch view, threshold = n_shard/(slots+1); sharding
        // replicated driver-side over the known ops (same
        // String.hashCode the stream keys on)
        val ops = changes.select("op").distinct().collect().map(_.getString(0))
        val shardOf = ops.map(o => o -> math.floorMod(o.hashCode, nShards)).toMap
        val counts = changes.groupBy("op").count().collect()
          .map(r => (r.getString(0), r.getLong(1)))
        val byShard = counts.groupBy { case (op, _) => shardOf(op) }
        byShard.foreach { case (shard, items) =>
          val nShard = items.map(_._2).sum
          val threshold = nShard.toDouble / (slots + 1)
          val streamed = latest
            .filter(col("shard") === shard)
            .collect()
            .map(r => r.getString(1) -> r.getLong(2))
            .toMap
          items.foreach { case (op, exactCount) =>
            if (exactCount > threshold)
              assert(streamed.contains(op), s"MG dropped guaranteed-heavy '$op' in shard $shard")
            streamed.get(op).foreach { mg =>
              assert(mg <= exactCount, s"MG overcounts '$op': $mg > $exactCount")
              assert(exactCount - mg <= threshold + 1,
                s"MG undercount of '$op' exceeds bound: $exactCount - $mg > $threshold")
            }
          }
        }
      } finally q.stop()
    }
  }

  test("streaming CMS: counter table streamed over two waves equals the batch build") {
    withTempDir { inDir =>
      val changes = Cdc.classify(spark, sf)
      changes.filter(col("event_id") % 2 === 0).write.mode("append").parquet(inDir)
      val q = CdcStream
        .streamingCms(CdcStream.readChangelog(spark, inDir))
        .toDF("d", "b", "c")
        .writeStream
        .format("memory")
        .queryName("stream_cms")
        .outputMode("update")
        .start()
      try {
        q.processAllAvailable()
        changes.filter(col("event_id") % 2 === 1).write.mode("append").parquet(inDir)
        q.processAllAvailable()
        // counters are cumulative, so the latest emission per (d,b) is
        // its max
        val streamed = spark.table("stream_cms").groupBy("d", "b").agg(max("c").as("c"))
        // batch build over the full changelog with the same kernel
        graft.functions.GraftFunctions.register(spark)
        val batch = changes
          .select(
            explode(array((0 until 3).map(d =>
              struct(
                lit(d.toLong).as("d"),
                expr(s"pmod(hash60(concat('graft-cms-$d:', CAST(user_id AS STRING))), 256)")
                  .as("b"))): _*)).as("e"))
          .select(col("e.d").as("d"), col("e.b").as("b"))
          .groupBy("d", "b")
          .agg(count(lit(1)).as("c"))
        assert(streamed.exceptAll(batch).count() == 0 && batch.exceptAll(streamed).count() == 0)
      } finally q.stop()
    }
  }

  test("watermarked stream-stream interval join matches the batch join") {
    withTempDir { inDir =>
      Cdc.classify(spark, sf).write.mode("append").parquet(inDir)

      // DELETEs within 1h after an INSERT of the same key — the
      // first-class operator, driven streaming and batch alike
      def side(df: org.apache.spark.sql.DataFrame, op: String) = df
        .filter(col("op") === op)
        .select(
          col("user_id").as("key"),
          col("event_id").as("id"),
          timestamp_micros(col("ts")).as("t"))
      def attributed(src: org.apache.spark.sql.DataFrame) =
        CdcStream.intervalJoin(side(src, "INSERT"), side(src, "DELETE"))

      val stream = CdcStream.readChangelog(spark, inDir).toDF()
      val q = attributed(stream).writeStream
        .format("memory")
        .queryName("stream_join")
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable()
        val batch = attributed(Cdc.classify(spark, sf))
        val streamed = spark.table("stream_join")
        assert(streamed.count() == batch.count())
        assert(streamed.exceptAll(batch).count() == 0)
        assert(batch.exceptAll(streamed).count() == 0)
        // the streaming plan really holds watermarked symmetric join
        // state (not a static-static join)
        val ops = q.lastProgress.stateOperators.map(_.operatorName.toLowerCase)
        assert(ops.exists(_.contains("join")), s"state operators: ${ops.mkString(",")}")
      } finally q.stop()
    }
  }

  test("stream-static enrichment equals the batch join and holds NO streaming state") {
    withTempDir { inDir =>
      val changes = Cdc.classify(spark, sf)
      changes.write.mode("append").parquet(inDir)
      val dim = graft.Tables.customer(spark, sf)

      val q = CdcStream
        .enrichWithDim(CdcStream.readChangelog(spark, inDir).toDF(), dim)
        .writeStream
        .format("memory")
        .queryName("stream_enrich")
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable()
        val streamed = spark.table("stream_enrich")
        val batch = CdcStream.enrichWithDim(changes.toDF(), dim)
        assert(streamed.count() == changes.count(), "enrichment must never drop rows")
        assert(streamed.exceptAll(batch).count() == 0)
        assert(batch.exceptAll(streamed).count() == 0)
        // the defining contract vs #143: stream-static joins are STATELESS
        assert(q.lastProgress.stateOperators.isEmpty,
          s"unexpected state operators: ${q.lastProgress.stateOperators.map(_.operatorName).mkString(",")}")
      } finally q.stop()
    }
  }

  test("throttle: streamed emissions equal the greedy spacing reference across waves") {
    withTempDir { inDir =>
      val intervalUs = 86400000000L // 1 day of event time
      val changes = Cdc.classify(spark, sf).cache()
      val mid = changes.agg(expr("percentile(ts, 0.5)")).head.getDouble(0).toLong

      changes.filter(col("ts") <= mid).write.mode("append").parquet(inDir)
      val q = CdcStream
        .throttled(CdcStream.readChangelog(spark, inDir), intervalUs)
        .writeStream
        .format("memory")
        .queryName("stream_throttle")
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable()
        changes.filter(col("ts") > mid).write.mode("append").parquet(inDir)
        q.processAllAvailable()

        import spark.implicits._
        // greedy spacing reference over each key's full ordered series
        val expected = changes.as[Change].collect()
          .groupBy(_.user_id).values.flatMap { rows =>
            var last = Long.MinValue
            rows.sortBy(c => (c.ts, c.event_id)).filter { c =>
              val ok = last == Long.MinValue || c.ts >= last + intervalUs
              if (ok) last = c.ts
              ok
            }
          }.toSet
        val got = spark.table("stream_throttle").as[Change].collect().toSet
        assert(got == expected, s"${got.size} emitted vs ${expected.size} expected")
        // it actually throttles (the synthetic stream flaps well inside a day)
        assert(got.size < changes.count())
        // the first change of every key always passes (the edge that matters)
        val firsts = changes.as[Change].collect()
          .groupBy(_.user_id).values.map(_.minBy(c => (c.ts, c.event_id))).toSet
        assert(firsts.subsetOf(got))
      } finally q.stop()
    }
  }

  test("streaming rolling distinct equals the batch sliding-window count") {
    withTempDir { inDir =>
      val changes = Cdc.classify(spark, sf)
      changes.write.mode("append").parquet(inDir)
      // redeliver a slice: distinctness must absorb duplicates
      changes.filter(col("event_id") % 7 === 0).write.mode("append").parquet(inDir)

      val q = CdcStream
        .rollingDistinctUsers(CdcStream.readChangelog(spark, inDir))
        .writeStream
        .format("memory")
        .queryName("stream_rolling_mau")
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable()
        val got = spark
          .table("stream_rolling_mau")
          .collect()
          .map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime, r.getLong(2)))
          .toSet
        val batch = changes
          .withColumn("ts_us", timestamp_micros(col("ts")))
          .groupBy(window(col("ts_us"), "7 days", "1 day"), col("user_id"))
          .agg(count(lit(1)).as("n"))
          .groupBy("window")
          .agg(count(lit(1)).as("n_distinct_users"))
          .select(col("window.start"), col("window.end"), col("n_distinct_users"))
          .collect()
          .map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime, r.getLong(2)))
          .toSet
        // append mode emits only watermark-closed windows: got ⊆ batch,
        // every emitted count exact, and most windows do close
        assert(got.nonEmpty)
        assert(got.subsetOf(batch), s"${got.size} emitted vs ${batch.size} batch")
        assert(got.size >= batch.size / 2, s"only ${got.size} of ${batch.size} closed")
      } finally q.stop()
    }
  }

  test("streaming holt: state carried over a day-aligned split equals the batch fold") {
    withTempDir { inDir =>
      val changes = Cdc.classify(spark, sf)
      val usPerDay = 86400L * 1000000L // classify emits µs timestamps
      val splitDay = changes
        .selectExpr(s"ts div $usPerDay AS d").agg(expr("CAST(avg(d) AS BIGINT)"))
        .head.getLong(0)
      // wave 1: strictly earlier days; wave 2: the rest — a day-aligned
      // boundary, the operator's stated contract
      changes.filter(col("ts") < splitDay * usPerDay)
        .write.mode("append").parquet(inDir)
      val q = CdcStream
        .streamingHolt(CdcStream.readChangelog(spark, inDir))
        .writeStream.format("memory").queryName("stream_holt")
        .outputMode("update")
        .start()
      try {
        q.processAllAvailable()
        changes.filter(col("ts") >= splitDay * usPerDay)
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
        val got = spark
          .table("stream_holt")
          .selectExpr(
            "series",
            "explode(arrays_zip(days, cents, levels, trends)) AS z")
          .selectExpr("series", "z.days AS day", "z.cents", "z.levels", "z.trends")
          .collect()
          .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
          .toMap
        // independent batch fold over the SAME op-keyed daily series
        def tq(a: Long): Long = if (a < 0) -((-a) / 4) else a / 4
        val daily = changes
          .selectExpr("op", s"ts div $usPerDay AS day",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c")
          .groupBy("op", "day").agg(sum("c").as("y"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        var nChecked = 0
        daily.groupBy(_._1).foreach { case (series, rows) =>
          var (l, b) = (0L, 0L)
          rows.sortBy(_._2).zipWithIndex.foreach { case ((_, day, y), i) =>
            if (i == 0) { l = y; b = 0L }
            else { val nl = tq(y + 3 * (l + b)); b = tq((nl - l) + 3 * b); l = nl }
            assert(got((series, day)) == ((y, l, b)), s"$series day $day")
            nChecked += 1
          }
        }
        assert(nChecked == got.size && nChecked > 0)
      } finally q.stop()
    }
  }

  test("streaming croston: state over a day-aligned split equals the batch two-track fold") {
    withTempDir { inDir =>
      val changes = Cdc.classify(spark, sf)
      val usPerDay = 86400L * 1000000L
      val splitDay = changes
        .selectExpr(s"ts div $usPerDay AS d").agg(expr("CAST(avg(d) AS BIGINT)"))
        .head.getLong(0)
      changes.filter(col("ts") < splitDay * usPerDay)
        .write.mode("append").parquet(inDir)
      val q = CdcStream
        .streamingCroston(CdcStream.readChangelog(spark, inDir))
        .writeStream.format("memory").queryName("stream_croston")
        .outputMode("update")
        .start()
      try {
        q.processAllAvailable()
        changes.filter(col("ts") >= splitDay * usPerDay)
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
        val got = spark
          .table("stream_croston")
          .selectExpr("series", "explode(arrays_zip(days, cents, zSize, pInterval, rateE3)) AS z")
          .selectExpr("series", "z.days AS day", "z.cents", "z.zSize", "z.pInterval", "z.rateE3")
          .collect()
          .map(r => (r.getString(0), r.getLong(1)) ->
            ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
          .toMap
        // independent batch Croston fold over the SAME op-keyed series
        def tq(a: Long): Long = if (a < 0) -((-a) / 4) else a / 4
        val daily = changes
          .selectExpr("op", s"ts div $usPerDay AS day",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c")
          .groupBy("op", "day").agg(sum("c").as("y"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        var nChecked = 0
        daily.groupBy(_._1).foreach { case (series, rows) =>
          var (z, p, last) = (0L, 1L, Long.MinValue)
          rows.sortBy(_._2).zipWithIndex.foreach { case ((_, day, y), i) =>
            if (i == 0) { z = y; p = 1L }
            else { z = z + tq(y - z); p = p + tq((day - last) - p) }
            last = day
            assert(p >= 1, "interval state stays >= 1")
            assert(got((series, day)) == ((y, z, p, z * 1000L / p)), s"$series day $day")
            nChecked += 1
          }
        }
        assert(nChecked == got.size && nChecked > 0)
        // replayed micro-batch (days <= folded lastDay): the p >= 1
        // guard must DROP the rows, not refold them into state or
        // divide by zero — the query survives and the emitted
        // trajectory is unchanged
        changes.filter(col("ts") < splitDay * usPerDay)
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
        val afterReplay = spark
          .table("stream_croston")
          .selectExpr("explode(days) AS d")
          .count()
        assert(afterReplay == nChecked.toLong, "replayed days are dropped, not refolded")
      } finally q.stop()
    }
  }

  test("streaming cusum: state over a day-aligned split equals the recursive batch fold") {
    withTempDir { inDir =>
      val changes = Cdc.classify(spark, sf)
      val usPerDay = 86400L * 1000000L
      val mu = 12345L // the fixed monitoring target of the contract
      val splitDay = changes
        .selectExpr(s"ts div $usPerDay AS d").agg(expr("CAST(avg(d) AS BIGINT)"))
        .head.getLong(0)
      changes.filter(col("ts") < splitDay * usPerDay)
        .write.mode("append").parquet(inDir)
      val q = CdcStream
        .streamingCusum(CdcStream.readChangelog(spark, inDir), mu)
        .writeStream.format("memory").queryName("stream_cusum")
        .outputMode("update")
        .start()
      try {
        q.processAllAvailable()
        changes.filter(col("ts") >= splitDay * usPerDay)
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
        val got = spark
          .table("stream_cusum")
          .selectExpr("series", "explode(arrays_zip(days, cents, cPlus, cMinus)) AS z")
          .selectExpr("series", "z.days AS day", "z.cents", "z.cPlus", "z.cMinus")
          .collect()
          .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
          .toMap
        // independent RECURSIVE fold (not the closed form): the
        // stream must reproduce max(0, .) exactly
        val daily = changes
          .selectExpr("op", s"ts div $usPerDay AS day",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c")
          .groupBy("op", "day").agg(sum("c").as("y"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        var nChecked = 0
        daily.groupBy(_._1).foreach { case (series, rows) =>
          var cp = 0L
          var cm = 0L
          rows.sortBy(_._2).foreach { case (_, day, y) =>
            cp = math.max(0L, cp + (y - mu))
            cm = math.max(0L, cm - (y - mu))
            assert(got((series, day)) == ((y, cp, cm)), s"$series day $day")
            nChecked += 1
          }
        }
        assert(nChecked == got.size && nChecked > 0)
      } finally q.stop()
    }
  }

  test("streaming page-hinkley: state over a day-aligned split equals the batch recursive fold") {
    withTempDir { dir =>
      val usPerDay = 86400L * 1000000L
      val inDir = s"$dir/in"
      val changes = Cdc.classify(spark, sf)
        .select("op", "ts", "value", "user_id", "event_id")
        .cache()
      val splitDay = changes.selectExpr(s"ts div $usPerDay AS day")
        .agg(expr("(min(day) + max(day) + 1) div 2")).head.getLong(0)
      changes.filter(col("ts") < splitDay * usPerDay)
        .write.mode("append").parquet(inDir)
      val q = CdcStream
        .streamingPageHinkley(CdcStream.readChangelog(spark, inDir))
        .writeStream.format("memory").queryName("stream_ph")
        .outputMode("update")
        .start()
      try {
        q.processAllAvailable()
        changes.filter(col("ts") >= splitDay * usPerDay)
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
        val got = spark
          .table("stream_ph")
          .selectExpr("series", "explode(arrays_zip(days, cents, m, phPlus, phMinus)) AS z")
          .selectExpr("series", "z.days AS day", "z.cents", "z.m", "z.phPlus", "z.phMinus")
          .collect()
          .map(r => (r.getString(0), r.getLong(1)) ->
            ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
          .toMap
        // independent recursive fold with the truncating prefix mean
        val daily = changes
          .selectExpr("op", s"ts div $usPerDay AS day",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c")
          .groupBy("op", "day").agg(sum("c").as("y"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        var nChecked = 0
        daily.groupBy(_._1).foreach { case (series, rows) =>
          var (t, sSum, m) = (0L, 0L, 0L)
          var (mn, mx) = (Long.MaxValue, Long.MinValue)
          rows.sortBy(_._2).foreach { case (_, day, y) =>
            t += 1; sSum += y
            val mean = if (sSum < 0) -((-sSum) / t) else sSum / t
            m += y - mean
            mn = math.min(mn, m); mx = math.max(mx, m)
            assert(got((series, day)) == ((y, m, m - mn, mx - m)), s"$series day $day")
            nChecked += 1
          }
        }
        assert(nChecked == got.size && nChecked > 0)
      } finally q.stop()
      changes.unpersist()
    }
  }

  test("streaming ewma: register state over a day-aligned split equals the batch cover join") {
    withTempDir { dir =>
      val usPerDay = 86400L * 1000000L
      val inDir = s"$dir/in"
      val changes = Cdc.classify(spark, sf)
        .select("op", "ts", "value", "user_id", "event_id")
        .cache()
      val splitDay = changes.selectExpr(s"ts div $usPerDay AS day")
        .agg(expr("(min(day) + max(day) + 1) div 2")).head.getLong(0)
      changes.filter(col("ts") < splitDay * usPerDay)
        .write.mode("append").parquet(inDir)
      val q = CdcStream
        .streamingEwma(CdcStream.readChangelog(spark, inDir))
        .writeStream.format("memory").queryName("stream_ewma")
        .outputMode("update")
        .start()
      try {
        q.processAllAvailable()
        changes.filter(col("ts") >= splitDay * usPerDay)
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
        val got = spark
          .table("stream_ewma")
          .selectExpr("series", "explode(arrays_zip(days, cents, ewma)) AS z")
          .selectExpr("series", "z.days AS day", "z.cents", "z.ewma")
          .collect()
          .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
          .toMap
        // independent batch replay: the #349 cover-join closed form —
        // every register day within 15 of the target weighs 2^(15-gap)
        val daily = changes
          .selectExpr("op", s"ts div $usPerDay AS day",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c")
          .groupBy("op", "day").agg(sum("c").as("y"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        var nChecked = 0
        daily.groupBy(_._1).foreach { case (series, rows) =>
          val byDay = rows.map(r => (r._2, r._3)).sortBy(_._1)
          byDay.foreach { case (day, y) =>
            val window = byDay.filter(e => e._1 > day - 16 && e._1 <= day)
            val num = window.map { case (d, v) => v * (1L << (15 - (day - d)).toInt) }.sum
            val den = window.map { case (d, _) => 1L << (15 - (day - d)).toInt }.sum
            val ewma = if (num < 0) -((-num) / den) else num / den
            assert(got((series, day)) == ((y, ewma)), s"$series day $day")
            nChecked += 1
          }
        }
        assert(nChecked == got.size && nChecked > 0)
      } finally q.stop()
      changes.unpersist()
    }
  }

  test("streaming imr: prefix state equals the batch aggregates; live flags replay") {
    withTempDir { dir =>
      val usPerDay = 86400L * 1000000L
      val inDir = s"$dir/in"
      val changes = Cdc.classify(spark, sf)
        .select("op", "ts", "value", "user_id", "event_id")
        .cache()
      val splitDay = changes.selectExpr(s"ts div $usPerDay AS day")
        .agg(expr("(min(day) + max(day) + 1) div 2")).head.getLong(0)
      changes.filter(col("ts") < splitDay * usPerDay)
        .write.mode("append").parquet(inDir)
      val q = CdcStream
        .streamingImr(CdcStream.readChangelog(spark, inDir))
        .writeStream.format("memory").queryName("stream_imr")
        .outputMode("update")
        .start()
      try {
        q.processAllAvailable()
        changes.filter(col("ts") >= splitDay * usPerDay)
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
        val got = spark
          .table("stream_imr")
          .selectExpr("series", "explode(arrays_zip(days, cents, mr, xOoc, mrOoc)) AS z")
          .selectExpr("series", "z.days AS day", "z.cents", "z.mr", "z.xOoc", "z.mrOoc")
          .collect()
          .map(r => (r.getString(0), r.getLong(1)) ->
            ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
          .toMap
        // independent running-limits fold over the day-ordered series
        val daily = changes
          .selectExpr("op", s"ts div $usPerDay AS day",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c")
          .groupBy("op", "day").agg(sum("c").as("y"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        var nChecked = 0
        daily.groupBy(_._1).foreach { case (series, rows) =>
          var (n, sx, n1, smr) = (0L, 0L, 0L, 0L)
          var lastX = 0L
          rows.sortBy(_._2).foreach { case (_, day, y) =>
            val mr = if (n == 0) -1L else math.abs(y - lastX)
            n += 1; sx += y
            if (mr >= 0) { n1 += 1; smr += mr }
            lastX = y
            val xOoc =
              if (n1 > 0 && (BigInt(y) * n - sx).abs * 1128 * n1 > BigInt(3000) * smr * n)
                1L
              else 0L
            val mrOoc =
              if (mr >= 0 && BigInt(mr) * 1000 * n1 > BigInt(3267) * smr) 1L else 0L
            assert(got((series, day)) == ((y, mr, xOoc, mrOoc)), s"$series day $day")
            nChecked += 1
          }
          // prefix-state ≡ batch-aggregate contract on the full series:
          // the fold's (n, Σx, n1, ΣMR) are exactly the batch I-MR stats
          val xs = rows.sortBy(_._2).map(_._3)
          assert(n == xs.length.toLong && sx == xs.sum)
          val mrs = xs.zip(xs.drop(1)).map { case (a, b) => math.abs(b - a) }
          assert(n1 == mrs.length.toLong && smr == mrs.sum)
        }
        assert(nChecked == got.size && nChecked > 0)
      } finally q.stop()
      changes.unpersist()
    }
  }
}
