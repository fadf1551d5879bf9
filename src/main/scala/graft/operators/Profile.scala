package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data profiling: per-column null counts, distinct cardinality, and
  * min/max — the schema-driven quality report run before any 100 TB
  * ingest. The plan is built dynamically from the input schema and
  * executes as ONE aggregation pass over the table (all columns'
  * stats computed side-by-side, then unpivoted), not one scan per
  * column.
  */
object Profile {

  /** Profile every column of `df`: one row per column.
    *
    * `approxDistinct = true` is the at-scale mode: HLL++ sketches
    * (`approx_count_distinct`, 2% rsd) keep per-column state constant
    * instead of one exact hash set PER COLUMN in a single pass — at
    * 100 TB the exact mode's aggregate state is the scan's memory
    * bottleneck, and a diagnostic profile doesn't need exact
    * cardinalities. Default stays exact so the driver's
    * `q_profile_customer` oracle (DuckDB `count(DISTINCT ...)`) can
    * hash-compare; `ProfileQuantSpec` pins the sketch within 5% of
    * exact at spec scale.
    */
  def profile(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      val distinctAgg =
        if (approxDistinct) approx_count_distinct(col(c), rsd = 0.02)
        else count_distinct(col(c))
      Seq(
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        distinctAgg.as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot: one struct per column, exploded to rows
    val entries = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    }
    wide
      .select(explode(array(entries: _*)).as("e"))
      .select(col("e.column"), col("e.n_nulls"), col("e.n_distinct"), col("e.min_value"), col("e.max_value"))
  }

  /** #51 Profile of the customer table (driver query). */
  def profileCustomer(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.customer(spark, dir))

  /** #91 Fixed-width value histogram per group: bucket counts with
    * in-bucket min/max — the distribution profile a warehouse keeps
    * per column/partition for optimizer statistics and drift
    * monitoring. One aggregation, buckets derived arithmetically (no
    * second pass to find ranges) — at 100 TB this is a single
    * map-side-combined shuffle of (groups × buckets) rows.
    */
  def valueHistogram(spark: SparkSession, dir: String, width: Double = 25.0): DataFrame =
    graft.Tables
      .events(spark, dir)
      .groupBy(
        col("event_type"),
        floor(col("value") / width).cast("long").as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        round(min("value"), 2).as("lo"),
        round(max("value"), 2).as("hi"))
      .select(
        col("event_type"),
        col("bucket"),
        round(col("bucket") * width, 2).as("bucket_start"),
        col("n"),
        col("lo"),
        col("hi"))

  /** #123 Data-quality constraint audit (the Deequ/dbt-test shape): a
    * declarative rule suite — primary-key uniqueness, referential
    * integrity, null checks, range and accepted-value domains —
    * evaluated in bulk, one result row per rule with checked/violation
    * counts. This is the gate a pipeline runs BEFORE publishing a
    * table; the testdata itself fails one rule (lineitem's
    * (l_orderkey, l_linenumber) is not unique), so the report has
    * real findings, not a wall of green.
    *
    * Plan shape: ALL in-scan rules for a table fold into ONE
    * aggregation pass (conditional counts side-by-side, then unpivoted
    * — the [[profile]] layout); each referential-integrity rule is one
    * LeftAnti join, the only per-rule extra scan class. Every count is
    * an exact integer, so the oracle compare is trivially exact.
    */
  def dqRules(
      orders: DataFrame,
      lineitem: DataFrame,
      customer: DataFrame,
      events: DataFrame): DataFrame = {
    def rules(agg: DataFrame, entries: (String, String, Column, Column)*): DataFrame = {
      val structs = entries.map { case (table, rule, checked, viol) =>
        struct(
          lit(table).as("table_name"),
          lit(rule).as("rule"),
          checked.as("n_checked"),
          viol.as("n_violations"))
      }
      agg
        .select(explode(array(structs: _*)).as("e"))
        .select(col("e.table_name"), col("e.rule"), col("e.n_checked"), col("e.n_violations"))
    }
    val o = orders.agg(
      count(lit(1)).as("n"),
      count_distinct(col("o_orderkey")).as("nk"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("bad_price"),
      sum(when(
        col("o_orderdate") < lit("1990-01-01").cast("timestamp")
          || col("o_orderdate") >= lit("2030-01-01").cast("timestamp"),
        1L).otherwise(0L)).as("bad_date"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_cust"))
    val l = lineitem.agg(
      count(lit(1)).as("n"),
      count_distinct(struct(col("l_orderkey"), col("l_linenumber"))).as("nk"),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L)).as("bad_qty"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L).otherwise(0L)).as("bad_disc"))
    val c = customer.agg(
      count(lit(1)).as("n"),
      count_distinct(col("c_custkey")).as("nk"))
    val e = events.agg(
      count(lit(1)).as("n"),
      sum(when(
        !col("event_type").isin("signup", "click", "view", "purchase", "error"),
        1L).otherwise(0L)).as("bad_type"))
    // referential integrity: LeftAnti violation counts (no hint — the
    // dimension side scales, AQE picks the join strategy)
    val orphO = orders
      .join(customer, orders("o_custkey") === customer("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v_fk_cust"))
    val orphL = lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v_fk_ord"))
    val oRules = rules(
      o.crossJoin(orphO),
      ("orders", "pk_unique:o_orderkey", col("n"), col("n") - col("nk")),
      ("orders", "fk:o_custkey->customer", col("n"), col("v_fk_cust")),
      ("orders", "not_null:o_custkey", col("n"), col("null_cust")),
      ("orders", "range:o_totalprice>0", col("n"), col("bad_price")),
      ("orders", "range:o_orderdate in [1990,2030)", col("n"), col("bad_date")))
    val lRules = rules(
      l.crossJoin(orphL),
      ("lineitem", "pk_unique:(l_orderkey,l_linenumber)", col("n"), col("n") - col("nk")),
      ("lineitem", "fk:l_orderkey->orders", col("n"), col("v_fk_ord")),
      ("lineitem", "range:l_quantity in [1,50]", col("n"), col("bad_qty")),
      ("lineitem", "range:l_discount in [0,1]", col("n"), col("bad_disc")))
    val cRules = rules(c, ("customer", "pk_unique:c_custkey", col("n"), col("n") - col("nk")))
    val eRules = rules(
      e,
      ("events", "domain:event_type", col("n"), col("bad_type")))
    oRules
      .unionAll(lRules)
      .unionAll(cRules)
      .unionAll(eRules)
      .withColumn("pass", (col("n_violations") === 0).cast("int"))
  }

  /** #123 driver binding of [[dqRules]] to the sf tables. */
  def dqAudit(spark: SparkSession, dir: String): DataFrame =
    dqRules(
      Tables.orders(spark, dir),
      Tables.lineitem(spark, dir),
      Tables.customer(spark, dir),
      graft.Tables.events(spark, dir))

  /** #211 Benford first-digit audit: the leading-digit distribution
    * of order values against Benford's law — the forensic
    * data-quality screen for fabricated or truncated monetary data
    * (natural multi-magnitude amounts follow log10(1+1/d); entry
    * errors and synthetic rounding show up as large deviations).
    * Expected frequencies are PRECOMPUTED e6 integer constants, so
    * the whole audit is integer arithmetic — no engine-side log10.
    * One map (digit extraction on the whole-dollar string) + one
    * 9-row aggregate; the broadcast constants join is free.
    */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    // log10(1 + 1/d) on the e6 grid, d = 1..9
    val expected = Seq(
      (1L, 301030L), (2L, 176091L), (3L, 124939L), (4L, 96910L), (5L, 79181L),
      (6L, 66947L), (7L, 57992L), (8L, 51153L), (9L, 45757L))
    val exp6 = spark.createDataFrame(expected).toDF("digit", "expected_e6")
    val counts = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS BIGINT)")
          .as("digit"))
      .groupBy("digit")
      .agg(count(lit(1)).as("n_orders"))
    val total = counts.agg(sum("n_orders").as("n"))
    counts
      .join(broadcast(exp6), Seq("digit"), "right_outer")
      .crossJoin(broadcast(total))
      .select(
        col("digit"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        expr("(coalesce(n_orders, 0) * 1000000) div n").as("observed_e6"),
        col("expected_e6"),
        expr("abs((coalesce(n_orders, 0) * 1000000) div n - expected_e6)").as("abs_dev_e6"))
  }

  /** #198 Corpus checksum manifest: an ORDER-INDEPENDENT per-source
    * digest (doc count, char volume, and the content-hash sum split
    * into two 30-bit lanes) plus a `__all__` rollup row — the dataset
    * version fingerprint a 100 TB lake publishes per snapshot so a
    * consumer can verify "same corpus" without re-reading it.
    * Commutative sums make the digest independent of partitioning,
    * task order, and file layout — the property a Merkle-style
    * manifest needs when files are written in parallel; at larger
    * corpora the 30-bit lanes widen to DECIMAL(38,0), same shape.
    *
    * Shape: one map-side hash per doc + a ROLLUP aggregate; no
    * shuffle beyond the 2-level rollup exchange.
    */
  def corpusChecksum(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val h = Dedup.hash60(col("text"))
    Tables
      .documents(spark, dir)
      .select(
        col("source"),
        col("n_chars"),
        (h.bitwiseAND(lit(0x3FFFFFFFL))).as("h_lo"),
        shiftrightunsigned(h, 30).as("h_hi"))
      .rollup("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        sum("h_lo").as("digest_lo"),
        sum("h_hi").as("digest_hi"))
      .select(
        coalesce(col("source"), lit("__all__")).as("source"),
        col("n_docs"),
        col("total_chars"),
        col("digest_lo"),
        col("digest_hi"))
  }

  /** #261 Functional-dependency discovery: for each CANDIDATE rule
    * lhs → rhs, how many lhs keys map to more than one rhs value —
    * the profiling primitive (Papenbrock/Naumann FD-discovery
    * family) that finds the dependencies #123's declarative audit
    * can then ASSERT. A holding FD is a normalization/compression
    * opportunity and an implicit join key; a 99%-holding FD is
    * usually a data bug — which is why the violation COUNT (not just
    * the flag) is the deliverable. Candidates span a true PK FD
    * (nation key → region), near-FDs, and known-false pairs, so both
    * outcomes are exercised.
    *
    * Per candidate: one groupBy(lhs) with two distinct-count
    * aggregates, then a 1-row rollup — map-side partial aggregation
    * does the heavy lifting; rules over different tables union into
    * one frame. Exact counts (count_distinct, not approx) because a
    * violation count of zero is a CONTRACT, not an estimate.
    */
  def fdCheck(spark: SparkSession, dir: String): DataFrame = {
    def fd(df: DataFrame, table: String, lhs: String, rhs: String): DataFrame =
      df.select(col(lhs).cast("string").as("l"), col(rhs).cast("string").as("r"))
        .groupBy("l")
        .agg(count_distinct(col("r")).as("nr"))
        .agg(
          lit(table).as("table_name"),
          lit(lhs).as("lhs"),
          lit(rhs).as("rhs"),
          count(lit(1)).as("n_keys"),
          sum(when(col("nr") > 1, 1L).otherwise(0L)).as("n_violating_keys"),
          max("nr").as("max_rhs_per_key"))
        .withColumn("holds", (col("n_violating_keys") === 0L).cast("long"))
    fd(Tables.nation(spark, dir), "nation", "n_nationkey", "n_regionkey")
      .unionAll(fd(Tables.part(spark, dir), "part", "p_brand", "p_type"))
      .unionAll(fd(Tables.documents(spark, dir), "documents", "source", "lang"))
      .unionAll(fd(Tables.events(spark, dir), "events", "user_id", "event_type"))
      .unionAll(fd(Tables.lineitem(spark, dir), "lineitem", "l_partkey", "l_suppkey"))
  }

  /** #287 Inclusion-dependency discovery: for each candidate
    * lhs_col ⊆ rhs_col pair, how many DISTINCT lhs values are absent
    * from the rhs — the foreign-key–discovery complement to #261's
    * functional dependencies (FDs find keys WITHIN a table; INDs find
    * the join edges BETWEEN tables, the schema-graph profiling step
    * run before anyone writes a join). A holding IND is a candidate
    * FK; a 99%-coverage IND is a referential-integrity bug, which is
    * why the missing-value COUNT and e6 coverage ship, not just the
    * flag. Candidates span the star schema's true FKs, both reverse
    * directions (does every part appear in lineitem?), and
    * known-false pairs, so both outcomes are exercised.
    *
    * Per candidate: distinct-project both sides, one LeftAnti at
    * distinct-value cardinality (never row grain), two 1-row counts —
    * the value sets are the scan reduction, so at 100 TB each
    * candidate moves only its key domain. Exact counts: holds = 0
    * missing is a contract, not an estimate.
    */
  /** The IND candidate set, (lhsTable, lhsCol, rhsTable, rhsCol) —
    * shared with the q_ind_discovery oracle builder so the two sides
    * can never drift (the kcoreOracle precedent).
    */
  val indCandidates: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("part", "p_partkey", "lineitem", "l_partkey"),
    ("customer", "c_custkey", "orders", "o_custkey"),
    ("events", "user_id", "customer", "c_custkey"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey"))

  def indCheck(spark: SparkSession, dir: String): DataFrame = {
    val tables: Map[String, DataFrame] = Map(
      "lineitem" -> Tables.lineitem(spark, dir),
      "orders" -> Tables.orders(spark, dir),
      "customer" -> Tables.customer(spark, dir),
      "part" -> Tables.part(spark, dir),
      "supplier" -> Tables.supplier(spark, dir),
      "nation" -> Tables.nation(spark, dir),
      "region" -> Tables.region(spark, dir),
      "events" -> graft.Tables.events(spark, dir))
    def ind(lt: String, lc: String, rt: String, rc: String): DataFrame = {
      val l = tables(lt).select(col(lc).cast("long").as("v")).filter(col("v").isNotNull).distinct()
      val r = tables(rt).select(col(rc).cast("long").as("v")).filter(col("v").isNotNull).distinct()
      l.agg(count(lit(1)).as("n_lhs_values"))
        .crossJoin(l.join(r, Seq("v"), "left_anti").agg(count(lit(1)).as("n_missing")))
        .select(
          lit(s"$lt.$lc").as("lhs"),
          lit(s"$rt.$rc").as("rhs"),
          col("n_lhs_values"),
          col("n_missing"),
          expr("CAST((n_lhs_values - n_missing) * 1000000 div n_lhs_values AS BIGINT)")
            .as("coverage_e6"),
          (col("n_missing") === 0L).cast("long").as("holds"))
    }
    indCandidates
      .map { case (lt, lc, rt, rc) => ind(lt, lc, rt, rc) }
      .reduce(_ unionAll _)
  }

  /** #262 2-D density heatmap: the (order value × line count) joint
    * distribution on an 8×8 equi-width integer grid — the
    * scatter-density primitive dashboards draw before any model is
    * fit, and the 2-D refinement of #91's 1-D value histogram (a
    * marginal can hide exactly the bimodal ridge the joint shows).
    * Grain: orders with ≥1 lineitem — the joint needs both axes;
    * zero-line orders are a corpus artifact the 1-D marginal keeps.
    * Bin edges come from 1-row min/max broadcasts on both axes with
    * the (v−lo)·B div span integer formula — the #233 calibration
    * binning applied twice; one lineitem rollup + one 64-cell
    * aggregate, linear, no windows.
    */
  def heatmap2d(spark: SparkSession, dir: String, bins: Int = 8): DataFrame = {
    val per = Tables
      .lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"))
      .join(
        Tables
          .orders(spark, dir)
          .select(
            col("o_orderkey").as("l_orderkey"),
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("v")),
        "l_orderkey")
    val bounds = per.agg(
      min("v").as("xlo"),
      max("v").as("xhi"),
      min("n_lines").as("ylo"),
      max("n_lines").as("yhi"))
    per
      .crossJoin(broadcast(bounds))
      .select(
        expr(s"((v - xlo) * $bins) div (xhi - xlo + 1)").as("xbin"),
        expr(s"((n_lines - ylo) * $bins) div (yhi - ylo + 1)").as("ybin"),
        col("v"))
      .groupBy("xbin", "ybin")
      .agg(count(lit(1)).as("n_orders"), sum("v").as("cell_cents"))
  }

  /** Candidate-key column combos probed by [[keyDiscovery]] — a fixed,
    * schema-derived list (shared with the oracle), from the known key
    * through plausible business keys to a clearly-non-key control.
    */
  val KeyCombos: Seq[Seq[String]] = Seq(
    Seq("o_orderkey"),
    Seq("o_custkey"),
    Seq("o_orderdate"),
    Seq("o_custkey", "o_orderdate"),
    Seq("o_custkey", "o_orderdate", "o_totalprice"),
    Seq("o_orderstatus", "o_orderpriority"))

  /** #375 Candidate-key discovery: for each combo in [[KeyCombos]],
    * exact distinct cardinality vs row count — is_key plus the
    * duplication factor rows·10⁶ div distinct. Completes the
    * profiling family's dependency rung: #261 discovers FUNCTIONAL
    * dependencies, #287 INCLUSION dependencies, this discovers UNIQUE
    * constraints — the check run before declaring a merge key or
    * bucketing column on an unfamiliar 100 TB table (a dup factor of
    * 1.02 on a "key" is how silent MERGE fan-out starts). ONE
    * aggregation pass: all combos' distinct counts computed
    * side-by-side (Spark plans multi-distinct as one expand +
    * aggregate — combos× the scan rows, not combos× the scans), then
    * unpivoted to one row per combo; no windows, no joins.
    */
  def keyDiscovery(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val aggs = count(lit(1)).as("n_rows") +:
      KeyCombos.map(c =>
        count_distinct(struct(c.map(col): _*)).as(s"d_${c.mkString("_")}"))
    val wide = orders.agg(aggs.head, aggs.tail: _*)
    val entries = KeyCombos.map { c =>
      struct(
        lit(c.mkString(",")).as("combo"),
        col("n_rows"),
        col(s"d_${c.mkString("_")}").as("n_distinct"))
    }
    wide
      .select(explode(array(entries: _*)).as("e"))
      .select(
        col("e.combo").as("combo"),
        col("e.n_rows").as("n_rows"),
        col("e.n_distinct").as("n_distinct"),
        (col("e.n_rows") === col("e.n_distinct")).cast("long").as("is_key"),
        expr("CAST(e.n_rows * 1000000 div e.n_distinct AS BIGINT)").as("dup_factor_e6"))
  }

  /** #418 k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    * 2007): the privacy read a training-data pipeline runs BESIDE
    * #79's PII redaction — redaction strips direct identifiers, but a
    * record is still re-identifiable when its QUASI-identifier
    * combination is rare (the famous ZIP × birthdate × sex result),
    * and a k-anonymous class still leaks when every member shares the
    * sensitive value (hence l-diversity). Quasi-identifiers here:
    * (nation, market segment); sensitive attribute: the account-
    * balance band in thousands. Per equivalence class: k (class
    * size), l (distinct sensitive bands), and the at-risk flags at
    * the conventional k < 5 / l < 2 thresholds.
    *
    * Exactness: the band is computed on the cents grid SHIFTED
    * POSITIVE before the integer division ((cents + 10⁵) div 10⁵ —
    * TPC-H balances sit in [-999.99, 9999.99], so the shifted operand
    * is ≥ 1 and Spark's truncating div equals DuckDB's floor //
    * without sign-factoring). One hash aggregation over the customer
    * table — class count is bounded by |nations|×|segments|, so the
    * audit output is a broadcast-sized frame at any corpus scale.
    */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    Tables
      .customer(spark, dir)
      .select(
        col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        expr("(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 100000) div 100000")
          .as("bal_band"))
      .groupBy("nation", "segment")
      .agg(
        count(lit(1)).as("k_size"),
        count_distinct(col("bal_band")).as("l_diversity"))
      .select(
        col("nation"),
        col("segment"),
        col("k_size"),
        col("l_diversity"),
        (col("k_size") < 5).cast("long").as("k_at_risk"),
        (col("l_diversity") < 2).cast("long").as("l_at_risk"))

  /** The three discrete-Laplace α tiers of [[dpCounts]]: exact
    * rationals a/b standing in for ε = ln(b/a) — (1,2) ≈ ε 0.69,
    * (3,4) ≈ 0.29, (9,10) ≈ 0.105. Exact rationals are the point:
    * the whole noise draw stays in integer arithmetic.
    */
  private[graft] val DpTiers: Seq[(Long, Long)] = Seq((1L, 2L), (3L, 4L), (9L, 10L))

  /** The e18 power table T_k ≈ α^k·10¹⁸ via the EXACT truncating
    * integer recursion T_k = T_{k-1}·a div b from T_0 = 10¹⁸, cut at
    * zero — one deterministic sequence, generated here once and
    * injected verbatim into the Spark frame AND the oracle's VALUES
    * list (the #211 precomputed-constants pattern), so the geometric
    * inverse-CDF is pure integer comparison in both engines.
    */
  private[graft] def dlapTable(a: Long, b: Long): Seq[Long] = {
    val buf = scala.collection.mutable.ListBuffer.empty[Long]
    var t = BigInt("1000000000000000000")
    var k = 0
    while (t > 0 && k < 1000) {
      t = t * a / b
      k += 1
      if (t > 0) buf += t.toLong
    }
    buf.toSeq
  }

  /** #444 Differentially-private noisy counts (discrete Laplace /
    * two-sided geometric — Ghosh, Roughgarden & Sundararajan 2012's
    * universally-optimal mechanism for counts): per-nation customer
    * counts released with noise G_A − G_B, each G a geometric(1−α)
    * drawn by inverse CDF from a #86 hash uniform — G = #{k ≥ 1 :
    * T_k > (10¹² − 1 − u)·10⁶} against the exact [[dlapTable]], so
    * the whole mechanism is hash-deterministic and integer-exact
    * (DP's ε-indistinguishability is a property of the MECHANISM
    * distribution; the deterministic draw is the replayable test
    * harness for it, exactly like every #86 sampling operator). The
    * DP member of the privacy family beside #418's k-anonymity
    * (k-anon constrains the TABLE, DP the RELEASE). Three ε tiers as
    * exact rationals α = 1/2, 3/4, 9/10 (ε = ln 2, ln 4/3, ln 10/9);
    * per (tier, nation): true count, noise, released count, |err| —
    * the utility-at-ε read, with the tier-ordering claim pinned by
    * the spec (E|noise| = 2α/(1−α²) ≈ 1.3 / 3.4 / 9.5).
    *
    * WARNING — NOT a private release: the noise here is a
    * deterministic, publicly recomputable function of the nation key
    * and a FIXED salt, so n_true is exactly recoverable from
    * n_released by anyone who can run this code. This operator is the
    * replayable parity/utility harness for the mechanism ONLY; an
    * actual DP release must draw its uniforms from a secret seed
    * (swap the fixed `dp:a:b:` salt for caller-supplied secret
    * material) — the ε guarantee is a property of the distribution,
    * which the harness samples but does not keep secret.
    */
  def dpCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val base = Tables
      .customer(spark, dir)
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(count(lit(1)).as("n_true"))
    DpTiers
      .map { case (a, b) =>
        val tdf = broadcast(dlapTable(a, b).toDF("t"))
        def g(salt: String): Column = {
          // u in [0, 1e12); rhs = (1e12 - 1 - u) * 1e6 on the e18 grid
          val u = pmod(
            Dedup.hash60(concat(lit(s"dp:$a/$b:$salt:"), col("nation"))),
            lit(1000000000000L))
          (lit(999999999999L) - u) * lit(1000000L)
        }
        base
          .withColumn("rhs_a", g("A"))
          .withColumn("rhs_b", g("B"))
          .crossJoin(tdf)
          .groupBy("nation", "n_true")
          .agg(
            sum((col("t") > col("rhs_a")).cast("long")).as("g_a"),
            sum((col("t") > col("rhs_b")).cast("long")).as("g_b"))
          .select(
            lit(s"$a/$b").as("alpha"),
            col("nation"),
            col("n_true"),
            (col("g_a") - col("g_b")).as("noise"),
            (col("n_true") + col("g_a") - col("g_b")).as("n_released"),
            abs(col("g_a") - col("g_b")).as("abs_err"))
      }
      .reduce(_ unionAll _)
  }

  /** The collapsed character-class mask shared by [[valueMask]] and
    * its oracle: uppercase runs → `A`, lowercase runs → `a`, digit
    * runs → `9`, everything else kept verbatim. Replacement order is
    * load-bearing — the single `A`/`a` replacement characters must not
    * be re-consumed by a later class, so uppercase collapses first.
    */
  private def maskExpr(c: Column): Column =
    regexp_replace(
      regexp_replace(regexp_replace(c, "[A-Z]+", "A"), "[a-z]+", "a"),
      "[0-9]+",
      "9")

  /** #433 Value-mask pattern profiling: the shape histogram every
    * data-profiling suite leads with (Potter's Wheel, Raman &
    * Hellerstein 2001 calls these structure-inference masks) — each
    * string collapses to its character-class skeleton
    * (`Customer#000000042` → `Aa#9`, `4-NOT SPECIFIED` → `9-A A`) and
    * the per-column mask histogram surfaces format drift, mixed
    * conventions, and injection-shaped outliers that #306's
    * per-column min/max/null profile cannot see. Top-10 masks per
    * column by (count desc, mask) with e6 share-of-column; four
    * heterogeneous columns (customer.c_name, part.p_name,
    * orders.o_orderpriority, documents.source) to exercise all three
    * classes. One scan + one grouped count per column, a per-column
    * rank window over the per-MASK aggregate (mask cardinality ≪
    * rows — the point of masking), WindowGroupLimit prunes to 10.
    */
  def valueMask(spark: SparkSession, dir: String): DataFrame = {
    val inputs: Seq[(String, DataFrame, String)] = Seq(
      ("customer.c_name", Tables.customer(spark, dir), "c_name"),
      ("part.p_name", Tables.part(spark, dir), "p_name"),
      ("orders.o_orderpriority", Tables.orders(spark, dir), "o_orderpriority"),
      ("documents.source", Tables.documents(spark, dir), "source"))
    val masked = inputs
      .map { case (label, df, c) =>
        df.select(lit(label).as("col_name"), maskExpr(col(c)).as("mask"))
      }
      .reduce(_ unionAll _)
      .groupBy("col_name", "mask")
      .agg(count(lit(1)).as("cnt"))
    val totals = masked.groupBy("col_name").agg(sum("cnt").as("total"))
    masked
      .withColumn(
        "rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("col_name")
            .orderBy(col("cnt").desc, col("mask"))))
      .filter(col("rn") <= 10)
      .join(broadcast(totals), "col_name")
      .select(
        col("col_name"),
        col("mask"),
        col("cnt"),
        expr("CAST(cnt * 1000000 div total AS BIGINT)").as("share_e6"))
  }
}
