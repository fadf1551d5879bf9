package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Warehouse/OLAP analytics — the PostgreSQL-OLAP role of the reference
  * (test-etl-pipeline.sh:244-260 queries the OLAP store with ordered
  * scans, counts, per-key listings). Generalized to the standard
  * warehouse surface: filtered scans, multi-key aggregates, star joins,
  * windows, top-n, rollups, funnels.
  *
  * Scale notes: dimension joins (`region nation customer supplier
  * part`) are explicit `broadcast()` — the fact tables (`lineitem`,
  * `orders`, `events`) never shuffle for them. Aggregates rely on
  * partial (map-side) aggregation; windows shuffle once on their
  * partition key. All date/timestamp outputs are formatted strings and
  * doubles rounded to 2, for exact oracle parity.
  */
object Analytics {

  private def day(c: String): org.apache.spark.sql.Column = to_date(col(c))

  /** #9 Scan + filter + project. The filter and the 5-column projection
    * both reach the parquet scan (PushedFilters + pruned ReadSchema).
    */
  def filterScan(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .filter(
        day("l_shipdate") >= lit("1998-01-01") && day("l_shipdate") < lit("1999-01-01") &&
          col("l_quantity") < 25
      )
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_quantity"),
        round(col("l_extendedprice"), 2).as("l_extendedprice"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date")
      )

  /** #10 Multi-key aggregate (TPC-H Q1 style pricing summary). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .filter(day("l_shipdate") <= lit("2000-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2)
          .as("sum_charge"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order")
      )

  /** #11 Join + agg + top-n (TPC-H Q3 style): unshipped-revenue top 10.
    * Customer side is broadcast; revenue ties broken by orderkey for a
    * total order.
    */
  def topOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir).filter(day("o_orderdate") < lit("1998-03-15"))
    val li = Tables.lineitem(spark, dir).filter(day("l_shipdate") > lit("1998-03-15"))
    // customer/orders SCALE with the data — no explicit broadcast; AQE
    // promotes the filtered sides to broadcast when they fit, and
    // falls back to shuffle joins at 100 TB
    li.join(ord.join(cust, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(
        col("l_orderkey"),
        col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_orderpriority")
      )
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** #12 Multi-way star join (TPC-H Q5 style): revenue by region/nation
    * for one order-year. Every dimension is broadcast — lineitem, the
    * only big table, is read once and never shuffled for a join; the
    * single exchange is the final 2-key aggregation.
    */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables
      .orders(spark, dir)
      .filter(day("o_orderdate") >= lit("1997-01-01") && day("o_orderdate") < lit("1998-01-01"))
      .select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey")
    val reg = Tables.region(spark, dir).select("r_regionkey", "r_name")
    // only FIXED-cardinality dims (region: 5, nation: 25) are
    // explicitly broadcast; customer/orders/supplier scale with SF —
    // AQE broadcasts them while they fit and shuffles at 100 TB
    Tables
      .lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
  }

  /** #13 Top-n per group: 3 priciest parts per brand (window row_number,
    * price desc with partkey tiebreak).
    */
  def topPartsPerBrand(spark: SparkSession, dir: String): DataFrame =
    Tables
      .part(spark, dir)
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey")))
      )
      .filter(col("rn") <= 3)
      .select(
        col("p_brand"),
        col("rn").cast("long").as("rn"), // DuckDB row_number() is BIGINT

        col("p_partkey"),
        col("p_name"),
        round(col("p_retailprice"), 2).as("p_retailprice")
      )

  /** #14 Post-aggregation filter (HAVING): high-LTV customers.
    * Customer scales with SF — AQE decides the join strategy.
    */
  def customerLtv(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .groupBy("o_custkey")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("ltv")
      )
      .filter(col("ltv") >= 3000000.0)
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select("o_custkey", "c_name", "n_orders", "ltv")

  /** #15 ROLLUP hierarchical aggregate over status → priority. Rollup
    * nulls are coalesced to a sentinel so both engines agree on the
    * subtotal-row representation.
    */
  def rollupOrders(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("o_orderpriority"),
        col("n_orders"),
        col("total")
      )

  /** #16 Sessionization: gap > 30 min starts a new session (lag +
    * running count over one exchange on user_id). µs-epoch bounds.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000 * 1000
    Tables
      .events(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("ts"), col("event_id"))
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn(
        "is_new",
        (col("prev_ts").isNull || (col("ts") - col("prev_ts") > gapUs)).cast("long"))
      .withColumn("session_id",
        sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts").as("session_start"),
        max("ts").as("session_end")
      )
  }

  /** #17 Running totals: cumulative spend per customer over order date
    * (rows-frame window; single exchange on custkey).
    */
  def runningTotals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        round(sum("o_totalprice").over(w), 2).as("running_total")
      )
  }

  /** #18 Funnel: signup → first engagement (click/view) after signup →
    * first purchase after that engagement. Two grouped passes over one
    * user_id exchange; output is per-stage user counts.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("ts"), col("event_type"))
    val signup = ev
      .filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min("ts").as("signup_ts"))
    // per-user aggregates scale with the data — shuffle joins on the
    // shared user_id partitioning (AQE broadcasts while small)
    val engaged = ev
      .filter(col("event_type").isin("click", "view"))
      .join(signup, "user_id")
      .filter(col("ts") > col("signup_ts"))
      .groupBy("user_id")
      .agg(min("ts").as("engage_ts"))
    val converted = ev
      .filter(col("event_type") === "purchase")
      .join(engaged, "user_id")
      .filter(col("ts") > col("engage_ts"))
      .groupBy("user_id")
      .agg(min("ts").as("convert_ts"))
    signup
      .agg(count(lit(1)).as("n_signup"))
      .crossJoin(engaged.agg(count(lit(1)).as("n_engaged")))
      .crossJoin(converted.agg(count(lit(1)).as("n_converted")))
  }

  /** #19 Anti join: customers with no orders since 2001 (shuffle-free
    * on the customer side when orders aggregate is broadcast).
    */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val recent = Tables
      .orders(spark, dir)
      .filter(day("o_orderdate") >= lit("2001-01-01"))
      .select("o_custkey")
    Tables
      .customer(spark, dir)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  /** #63 Semi-structured extraction: pull typed fields out of the
    * JSON `props` column (schema-on-read over a string column — the
    * raw-event shape every pipeline ingests before schemas settle)
    * and aggregate on them. `get_json_object` is codegen'd; no UDF.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(
        count(col("k")).as("n_with_k"),
        round(avg(col("k")), 2).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  /** #20 Approximate distinct (HyperLogLog++): distinct users per event
    * type at 2% target error — the constant-memory sketch that replaces
    * an exact distinct's full shuffle at 100 TB. The sketch estimate
    * itself is engine-specific, so the driver row carries the sketch's
    * ERROR CONTRACT instead: `within_3rsd` asserts the estimate lands
    * within 3× the configured rsd of the exact count (computed
    * alongside, which the DuckDB oracle reproduces) — a hash-checkable
    * range check, the exact-compare analog of a sketch bound. A
    * drifting HLL implementation now FAILS correctness instead of
    * hiding behind rows-only.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users_exact"),
        approx_count_distinct(col("user_id"), 0.02).as("est"))
      .select(
        col("event_type"),
        col("n_events"),
        col("n_users_exact"),
        (abs(col("est") - col("n_users_exact")) <=
          col("n_users_exact").cast("double") * 0.06).cast("int").as("within_3rsd"))

  /** #147 Count-min sketch (Cormode–Muthukrishnan 2005): per-key
    * point-count estimates from a FIXED depth×width counter table —
    * the constant-memory companion to the heavy-hitter sketch (#59):
    * MG answers "which items are frequent", CMS answers "how often is
    * THIS item", both in O(table) memory at any stream size. Build is
    * one explode(depth) + one groupBy over (d, bucket) — a
    * counter-table-sized shuffle, never keyed by item; the point query
    * is min over the item's depth buckets (overestimates only —
    * collisions add, never subtract, so `n_cms ≥ n_exact` is a hard
    * invariant and `overcount` is the realized collision mass,
    * E[overcount] ≤ n/width per row).
    *
    * Unlike HLL/KLL, every CMS operation is integer arithmetic over
    * md5-parity hash positions — so the DuckDB oracle replays the
    * ESTIMATE itself bit-exactly (counters, min-lookup, overcount),
    * not just a contract flag: the strongest oracle form a sketch can
    * have.
    */
  def cmsCounts(spark: SparkSession, dir: String, depth: Int = 3, width: Int = 256): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val ev = Tables.events(spark, dir).select(col("user_id"))
    def bucket(d: Int): org.apache.spark.sql.Column =
      pmod(
        graft.operators.Dedup.hash60(concat(lit(s"graft-cms-$d:"), col("user_id"))),
        lit(width.toLong))
    val positions = ev.select(
      col("user_id"),
      explode(array((0 until depth).map(d =>
        struct(lit(d.toLong).as("d"), bucket(d).as("b"))): _*)).as("e"))
      .select(col("user_id"), col("e.d").as("d"), col("e.b").as("b"))
    val counters = positions.groupBy("d", "b").agg(count(lit(1)).as("c"))
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
    val est = positions
      .distinct()
      .join(broadcast(counters), Seq("d", "b"))
      .groupBy("user_id")
      .agg(min("c").as("n_cms"))
    exact
      .join(est, "user_id")
      .select(
        col("user_id"),
        col("n_exact"),
        col("n_cms"),
        (col("n_cms") - col("n_exact")).as("overcount"))
  }

  /** #87 Cohort retention: users grouped by first-activity week, then
    * the fraction of each cohort still active N weeks later — the
    * standard product-analytics retention triangle. ONE scan of
    * events and ONE wide shuffle (the user_id aggregation producing
    * each user's cohort week + distinct-week set; a user's weeks are
    * bounded by the calendar, so the set state is small); both the
    * activity triangle and the cohort sizes derive from that shared
    * aggregation — its exchange is reused, not recomputed (r13: the
    * previous shape scanned events twice, once for the cohort
    * assignment and once for the activity join, and paid a
    * countDistinct expansion the per-user set makes a plain count).
    * The per-cohort size table is one row per week, so AQE broadcasts
    * the rate join. At 100 TB nothing here is more than a linear
    * shuffle on user_id.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val WeekUs = 7L * 86400L * 1000000L
    val perUser = Tables
      .events(spark, dir)
      .select(col("user_id"), floor(expr("ts div 1000") / WeekUs).cast("long").as("week"))
      .groupBy("user_id")
      .agg(min("week").as("cohort_week"), collect_set("week").as("weeks"))
    // weeks is a per-user DISTINCT set, so each user contributes at
    // most one row per (cohort_week, offset) — count ≡ countDistinct
    val active = perUser
      .select(col("cohort_week"), explode(col("weeks")).as("week"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = perUser.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    active
      .join(sizes, "cohort_week")
      .select(
        col("cohort_week"),
        col("week_offset"),
        col("n_users"),
        col("cohort_size"),
        round(col("n_users").cast("double") / col("cohort_size"), 4).as("retention"))
  }
}
