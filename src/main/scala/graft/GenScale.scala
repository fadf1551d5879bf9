package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic corpus generator for scale-cliff auditing: emits the same
  * star-schema + events + documents + embeddings layout as the driver
  * testdata (`TESTDATA.md`), at an arbitrary multiple of the sf0.1
  * cardinalities, into a SEPARATE directory (never the driver's
  * read-only testdata). Value distributions mirror the measured sf0.1
  * shapes (key ranges, fk fan-outs, status/priority/segment mixes,
  * 31-word document vocabulary, 10-label embedding clusters,
  * exponential-ish event values, 30-day event window) so per-query
  * scaling ratios are meaningful; everything is hash-derived from row
  * ids — deterministic, no RNG state, generation itself is one linear
  * pass per table.
  *
  * Usage: runMain graft.GenScale <outDir> [mult]   (mult=10 → "sf1")
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val mult = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, outDir, mult)
    spark.stop()
  }

  def generate(spark: SparkSession, outDir: String, mult: Int): Unit = {
    val nCust = 15000L * mult
    val nSupp = 1000L * mult
    val nPart = 20000L * mult
    val nOrders = 150000L * mult
    val nEvents = 100000L * mult
    val nDocs = 5000L * mult
    val nVecs = 2000L * mult

    def h(cols: org.apache.spark.sql.Column*) = abs(xxhash64(cols: _*))
    def save(df: DataFrame, name: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")

    // region + nation are fixed-size dimensions — reuse the driver's
    // (read-only) sf0.1 copies verbatim
    Seq("region", "nation").foreach { t =>
      save(spark.read.parquet(s"/root/testdata/sf0.1/$t.parquet"), t)
    }

    val segs = array(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY").map(lit): _*)
    save(
      spark
        .range(nCust)
        .select(
          col("id").as("c_custkey"),
          format_string("Customer#%09d", col("id")).as("c_name"),
          pmod(h(col("id"), lit(1)), lit(25)).cast("int").as("c_nationkey"),
          round(pmod(h(col("id"), lit(2)), lit(1100000)) / 100.0 - 1000.0, 2).as("c_acctbal"),
          element_at(segs, (pmod(h(col("id"), lit(3)), lit(5)) + 1).cast("int")).as("c_mktsegment")),
      "customer")

    save(
      spark
        .range(nSupp)
        .select(
          col("id").as("s_suppkey"),
          format_string("Supplier#%09d", col("id")).as("s_name"),
          pmod(h(col("id"), lit(4)), lit(25)).cast("int").as("s_nationkey"),
          round(pmod(h(col("id"), lit(5)), lit(1100000)) / 100.0 - 1000.0, 2).as("s_acctbal")),
      "supplier")

    val adjs = array(Seq("large", "hot", "blue", "small", "dark", "light", "round", "flat").map(lit): _*)
    val nouns = array(Seq("ring", "bolt", "gear", "cog", "pin", "rod", "cap", "nut").map(lit): _*)
    val types = array(Seq("ECONOMY", "SMALL", "LARGE", "STANDARD", "PROMO", "MEDIUM").map(lit): _*)
    save(
      spark
        .range(nPart)
        .select(
          col("id").as("p_partkey"),
          concat(
            element_at(adjs, (pmod(h(col("id"), lit(6)), lit(8)) + 1).cast("int")),
            lit(" "),
            element_at(nouns, (pmod(h(col("id"), lit(7)), lit(8)) + 1).cast("int"))).as("p_name"),
          concat(lit("Brand#"), (pmod(h(col("id"), lit(8)), lit(25)) + 1)).as("p_brand"),
          element_at(types, (pmod(h(col("id"), lit(9)), lit(6)) + 1).cast("int")).as("p_type"),
          (pmod(h(col("id"), lit(10)), lit(50)) + 1).cast("int").as("p_size"),
          round(lit(900.0) + pmod(h(col("id"), lit(11)), lit(1000)) / 10.0, 2).as("p_retailprice")),
      "part")

    val statuses = array(Seq("O", "P", "F").map(lit): _*)
    val prios = array(
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW").map(lit): _*)
    val orders = spark
      .range(nOrders)
      .select(
        col("id").as("o_orderkey"),
        pmod(h(col("id"), lit(12)), lit(nCust)).as("o_custkey"),
        element_at(statuses, (pmod(h(col("id"), lit(13)), lit(3)) + 1).cast("int"))
          .as("o_orderstatus"),
        round(lit(1000.0) + pmod(h(col("id"), lit(14)), lit(49900000)) / 100.0, 2)
          .as("o_totalprice"),
        (to_timestamp(lit("1995-01-01")) + make_dt_interval(
          pmod(h(col("id"), lit(15)), lit(2404)).cast("int"))).as("o_orderdate"),
        element_at(prios, (pmod(h(col("id"), lit(16)), lit(5)) + 1).cast("int"))
          .as("o_orderpriority"))
    save(orders, "orders")

    val rflags = array(Seq("A", "N", "R").map(lit): _*)
    save(
      spark
        .range(nOrders)
        .select(
          col("id").as("l_orderkey"),
          explode(sequence(lit(1), (pmod(h(col("id"), lit(17)), lit(7)) + 1).cast("int")))
            .as("l_linenumber"))
        .select(
          col("l_orderkey"),
          pmod(h(col("l_orderkey"), col("l_linenumber"), lit(18)), lit(nPart)).as("l_partkey"),
          pmod(h(col("l_orderkey"), col("l_linenumber"), lit(19)), lit(nSupp)).as("l_suppkey"),
          col("l_linenumber"),
          (pmod(h(col("l_orderkey"), col("l_linenumber"), lit(20)), lit(50)) + 1)
            .cast("double").as("l_quantity"),
          round(lit(900.0) +
            pmod(h(col("l_orderkey"), col("l_linenumber"), lit(21)), lit(10410000)) / 100.0, 2)
            .as("l_extendedprice"),
          (pmod(h(col("l_orderkey"), col("l_linenumber"), lit(22)), lit(11)) / 100.0)
            .as("l_discount"),
          (pmod(h(col("l_orderkey"), col("l_linenumber"), lit(23)), lit(9)) / 100.0).as("l_tax"),
          element_at(rflags,
            (pmod(h(col("l_orderkey"), col("l_linenumber"), lit(24)), lit(3)) + 1).cast("int"))
            .as("l_returnflag"),
          element_at(statuses,
            (pmod(h(col("l_orderkey"), col("l_linenumber"), lit(25)), lit(2)) + 1).cast("int"))
            .as("l_linestatus"),
          (to_timestamp(lit("1995-01-01")) + make_dt_interval(
            pmod(h(col("l_orderkey"), col("l_linenumber"), lit(26)), lit(2500)).cast("int")))
            .as("l_shipdate")),
      "lineitem")

    val etypes = array(Seq("signup", "click", "view", "purchase", "error").map(lit): _*)
    save(
      spark
        .range(nEvents)
        .select(
          col("id").as("event_id"),
          timestamp_micros(
            lit(1704067200000000L) + pmod(h(col("id"), lit(27)), lit(30L * 86400 * 1000000)))
            .as("ts"),
          pmod(h(col("id"), lit(28)), lit(nCust / 10)).as("user_id"),
          element_at(etypes, (pmod(h(col("id"), lit(29)), lit(5)) + 1).cast("int"))
            .as("event_type"),
          // exponential-ish mean≈50, matching the measured sf0.1 tail
          round(least(lit(560.0),
            lit(-50.0) * log((pmod(h(col("id"), lit(30)), lit(100000)) + 1) / 100000.0)), 6)
            .as("value"),
          format_string("{\"k\": %d}", pmod(h(col("id"), lit(31)), lit(100))).as("props")),
      "events")

    val vocab = array(Seq(
      "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast", "filter",
      "group", "hash", "join", "key", "line", "merge", "order", "part", "query", "row",
      "scan", "slow", "small", "sort", "spark", "stream", "table", "the", "value",
      "vector", "window").map(lit): _*)
    val langSel = pmod(h(col("id"), lit(32)), lit(20))
    save(
      spark
        .range(nDocs)
        .select(
          col("id").as("doc_id"),
          array_join(
            transform(
              sequence(lit(1), (pmod(h(col("id"), lit(33)), lit(90)) + 10).cast("int")),
              i => element_at(vocab, (pmod(h(col("id"), i, lit(34)), lit(31)) + 1).cast("int"))),
            " ").as("text"),
          when(langSel < 8, "en")
            .when(langSel < 11, "de")
            .when(langSel < 14, "es")
            .when(langSel < 17, "fr")
            .otherwise("zh").as("lang"),
          concat(lit("src"), pmod(h(col("id"), lit(35)), lit(20))).as("source"))
        .withColumn("n_chars", length(col("text"))),
      "documents")

    save(
      spark
        .range(nVecs)
        .select(
          col("id").as("vec_id"),
          transform(
            sequence(lit(0), lit(63)),
            d =>
              (((pmod(h(pmod(col("id"), lit(10)), d, lit(36)), lit(2001)) - 1000) / 1000.0) * 0.05 +
                ((pmod(h(col("id"), d, lit(37)), lit(2001)) - 1000) / 1000.0) * 0.25)
                .cast("float")).as("embedding"),
          pmod(col("id"), lit(10)).cast("int").as("label")),
      "embeddings")
  }
}
