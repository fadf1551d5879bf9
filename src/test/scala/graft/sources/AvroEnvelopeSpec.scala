package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Cdc

/** The Avro wire format against the JSON path it must agree with:
  * binary round trip is lossless (including the nullable-account
  * union branch), and the Avro parse emits EXACTLY what the JSON
  * parse emits over the same changelog — the converter-swap guarantee
  * a Confluent deployment relies on.
  */
class AvroEnvelopeSpec extends SparkSpec {

  private def envelopes() = {
    graft.Tables
      .events(spark, sf)
      .select(
        col("event_id").as("id"),
        col("user_id"),
        col("props").as("account"),
        expr("ts div 1000").as("registered_at"),
        when(col("event_type") === "error", "true").otherwise("false").as("__deleted"))
  }

  test("encode → decode round-trips every envelope, nulls included") {
    // plant a null account to force the union's null branch
    val env = envelopes()
      .withColumn("account", when(col("id") % 101 === 0, lit(null)).otherwise(col("account")))
    assert(env.filter(col("account").isNull).count() > 0, "test must cover the null branch")
    val back = AvroEnvelope.decode(AvroEnvelope.encode(env))
    assert(back.exceptAll(env).isEmpty && env.exceptAll(back).isEmpty)
  }

  test("Avro parse equals JSON parse over the same changelog") {
    val viaAvro = Cdc.avroParse(spark, sf)
    val viaJson = Cdc.envelopeParse(spark, sf)
    assert(viaAvro.exceptAll(viaJson).isEmpty && viaJson.exceptAll(viaAvro).isEmpty)
  }

  test("payloads are per-record schemaless binary, non-empty and self-contained") {
    val payloads = AvroEnvelope.encode(envelopes().limit(100)).cache()
    assert(payloads.filter(length(col("value")) < 3).isEmpty, "suspiciously small payload")
    // decoding a shuffled subset must not depend on stream position
    val sample = AvroEnvelope.decode(payloads.orderBy(rand(7)).limit(10))
    assert(sample.count() == 10)
    payloads.unpersist()
  }
}
