package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.Cdc

/** Debezium temporal/decimal type-mapping conformance (r12 verdict,
  * What's missing #1): the reference pins `database.connectionTimeZone:
  * Asia/Seoul` (reference: mysql-connector-config-clean.json:8), so a
  * real feed carries MySQL TIMESTAMPs as `io.debezium.time.
  * ZonedTimestamp` ISO strings with the +09:00 offset, and DECIMAL
  * columns in one of the three `decimal.handling.mode` wire encodings.
  * These cases pin: offset-independence of the zoned parse (the wire
  * zone never leaks into the decoded timeline), exact two's-complement
  * decode of Connect `Decimal` payloads across sign and byte-width
  * edges, tri-mode agreement over the corpus, and bit-parity of the
  * typed path's classification with the epoch-long JSON path.
  */
class DebeziumTypeFidelitySpec extends SparkSpec {

  /** The corpus changelog with truth cents + the per-mode balance wire
    * encoding and the Seoul-rendered ZonedTimestamp.
    */
  private def typedEnvelopes(mode: String): DataFrame = {
    val base = graft.Tables
      .events(spark, sf)
      .select(
        col("event_id").as("id"),
        col("user_id"),
        col("props").as("account"),
        expr("ts div 1000").as("us"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"),
        when(col("event_type") === "error", "true").otherwise("false").as("__deleted"))
    // Connect Decimal for non-negative cents: minimal-length big-endian
    // bytes, leading 0x00 when the high bit is set (BigInteger.toByteArray)
    val h0 = hex(col("cents"))
    val h1 = when(length(h0) % 2 === 1, concat(lit("0"), h0)).otherwise(h0)
    val h2 = when(
      substring(h1, 1, 1).isin("8", "9", "A", "B", "C", "D", "E", "F"),
      concat(lit("00"), h1)).otherwise(h1)
    val balance = mode match {
      case "precise" => base64(unhex(h2))
      case "string" => (col("cents").cast(DecimalType(18, 2)) / 100).cast(StringType)
      case "double" => (col("cents") / lit(100.0d)).cast(DoubleType)
    }
    base.select(
      col("cents").as("truth_cents"),
      to_json(
        struct(
          col("id"),
          col("user_id"),
          col("account"),
          seoulZoned(col("us")).as("registered_at"),
          balance.as("balance"),
          col("__deleted"))).as("value"))
  }

  /** Render µs as the ISO-8601 ZonedTimestamp string the connector
    * emits under `database.connectionTimeZone: Asia/Seoul`.
    */
  private def seoulZoned(us: org.apache.spark.sql.Column) =
    concat(
      date_format(
        convert_timezone(lit("UTC"), lit("Asia/Seoul"), timestamp_micros(us)),
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
      lit("+09:00"))

  test("ZonedTimestamp parse is offset-independent (Seoul wire zone never leaks)") {
    val us = graft.Tables
      .events(spark, sf)
      .select(expr("ts div 1000").as("us"))
    val rendered = us.select(
      col("us"),
      seoulZoned(col("us")).as("seoul"),
      concat(
        date_format(timestamp_micros(col("us")), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
        lit("Z")).as("utc"))
    val bad = rendered.filter(
      DebeziumTypes.zonedToMicros(col("seoul")) =!= col("us") ||
        DebeziumTypes.zonedToMicros(col("utc")) =!= col("us"))
    assert(bad.isEmpty, "zoned parse drifted from the µs timeline")
  }

  test("precise mode decodes Connect Decimal across sign and byte-width edges") {
    import spark.implicits._
    val cases = Seq(0L, 1L, -1L, 127L, 128L, -128L, -129L, 255L, 256L, -255L, -256L,
      12345L, -12345L, 32767L, 32768L, -32768L, -32769L, 9999999999L, -9999999999L,
      (1L << 47) - 1, -(1L << 47), (1L << 55) - 1, -(1L << 55))
    val wire = cases.map { c =>
      (c, java.util.Base64.getEncoder.encodeToString(BigInt(c).toByteArray))
    }
    val decoded = wire
      .toDF("cents", "b64")
      .select(col("cents"), DebeziumTypes.preciseCents(col("b64")).as("decoded"))
    assert(decoded.filter(col("cents") =!= col("decoded")).isEmpty,
      "two's-complement decode drifted from BigInteger.toByteArray")
  }

  test("the three decimal.handling.mode wire encodings agree with the planted cents") {
    Seq("precise", "string", "double").foreach { mode =>
      val env = typedEnvelopes(mode)
      val parsed = DebeziumTypes
        .parseZonedDecimal(env, col("value"), mode)
        .select(col("id"), col("balance_cents"))
      val truth = env
        .select(get_json_object(col("value"), "$.id").cast("long").as("id"),
          col("truth_cents"))
      val joined = parsed.join(truth, "id")
      assert(joined.filter(col("balance_cents") =!= col("truth_cents")).isEmpty,
        s"mode $mode drifted from the planted cents")
    }
  }

  test("typed envelope classification is bit-parity with the epoch-long JSON path") {
    val typed = DebeziumTypes
      .parseZonedDecimal(typedEnvelopes("precise"), col("value"), "precise")
      .select("id", "user_id", "account", "registered_at", "op")
    val epochLong = Cdc.envelopeParse(spark, sf)
    assert(
      typed.exceptAll(epochLong).isEmpty && epochLong.exceptAll(typed).isEmpty,
      "typed path diverged from the reference-contract JSON path")
  }
}
