package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StateTtlSpec extends SparkSpec {

  private def withTempDir[T](f: String => T): T = {
    val d = Files.createTempDirectory("graft-ttl").toFile
    try f(d.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(d)
    }
  }

  private def us(s: String): Long =
    java.time.LocalDateTime
      .parse(s.replace(" ", "T"))
      .toInstant(java.time.ZoneOffset.UTC)
      .toEpochMilli * 1000L

  test("keys idle past the TTL are expired and announced; active keys survive") {
    import spark.implicits._
    withTempDir { inDir =>
      // key 1 goes idle after 00:00; keys 2 and 3 stay active at 10:00
      Seq(
        Change(1L, us("2024-01-01 00:00:00"), 1L, "INSERT", 1.0),
        Change(2L, us("2024-01-01 00:00:00"), 2L, "INSERT", 2.0)
      ).toDS().write.mode("append").parquet(inDir)

      val q = CdcStream
        .currentStateWithTtl(CdcStream.readChangelog(spark, inDir), ttlMs = 60L * 60 * 1000)
        .writeStream
        .format("memory")
        .queryName("ttl_current")
        .outputMode("update")
        .start()
      try {
        q.processAllAvailable()
        Seq(
          Change(3L, us("2024-01-01 10:00:00"), 2L, "UPDATE", 2.5),
          Change(4L, us("2024-01-01 10:00:00"), 3L, "INSERT", 3.0)
        ).toDS().write.mode("append").parquet(inDir)
        q.processAllAvailable()
        // one more batch so the advanced watermark fires the timeout
        Seq(Change(5L, us("2024-01-01 10:30:00"), 3L, "UPDATE", 3.5))
          .toDS().write.mode("append").parquet(inDir)
        q.processAllAvailable()

        val t = spark.table("ttl_current")
        assert(t.filter(col("op") === "EXPIRED" && col("user_id") === 1L).count() == 1,
          "idle key 1 was not expired")
        assert(t.filter(col("op") === "EXPIRED" && col("user_id").isin(2L, 3L)).count() == 0,
          "active keys must not expire")
      } finally q.stop()
    }
  }
}
