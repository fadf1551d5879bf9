package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Lineage.CpOps

/** Extended warehouse operators (§2 #35-41): as-of join, bounded
  * range join, exact percentiles, CUBE, pivot, ntile banding, and
  * moment statistics — the remaining standard-OLAP surface.
  */
object AnalyticsExt {

  /** #35 As-of join: each event gets the customer's latest order at or
    * before the event time (events are the driving side, orders the
    * quote side). Right-side (custkey, date) ties are pre-collapsed to
    * the max orderkey so the result is deterministic. One shuffle.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(
        col("event_id"),
        col("user_id"),
        expr("ts div 1000").as("ts"))
    val ord = Tables
      .orders(spark, dir)
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy("o_custkey", "o_orderdate").orderBy(col("o_orderkey").desc)))
      .filter(col("rn") === 1)
      .select(
        col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_ts"),
        col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
    AsOf.join(
      ev,
      ord,
      leftKey = "user_id",
      rightKey = "o_custkey",
      leftTime = "ts",
      rightTime = "o_ts",
      payload = Seq("o_orderkey", "o_totalprice", "order_date"))
  }

  /** #36 Bounded range join: for each purchase, engagement (click/view)
    * counts in the preceding 30 minutes — executed as a bucketed
    * equi-join (purchase side exploded over 2 half-hour buckets) with
    * a residual range filter, NOT a nested-loop range join: shuffle
    * volume stays linear at 100 TB.
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val windowUs = 30L * 60 * 1000 * 1000
    val ev = Tables.events(spark, dir).select(
      col("event_id"),
      col("user_id"),
      expr("ts div 1000").as("ts"),
      col("event_type"))
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("p_event_id"),
        col("user_id"),
        col("ts").as("p_ts"),
        explode(array(lit(0L), lit(1L))).as("boff"))
      .withColumn("bucket", col("p_ts") / windowUs - col("boff"))
      .withColumn("bucket", col("bucket").cast("long"))
    val engagement = ev
      .filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts").as("e_ts"))
      .withColumn("bucket", (col("e_ts") / windowUs).cast("long"))
    purchases
      .join(
        engagement,
        Seq("user_id", "bucket"),
        "left")
      .withColumn(
        "hit",
        col("e_ts").isNotNull &&
          col("e_ts") >= col("p_ts") - windowUs && col("e_ts") <= col("p_ts"))
      .groupBy(col("p_event_id"), col("user_id"))
      .agg(count(when(col("hit"), 1)).as("n_prior_engagements"))
  }

  /** #37 Exact interpolated percentiles per group (p50/p90 of customer
    * balance by segment). At 100 TB the same query shape swaps
    * `percentile` for `approx_percentile` — kept exact here for the
    * oracle.
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables
      .customer(spark, dir)
      .groupBy("c_mktsegment")
      .agg(percentile(col("c_acctbal"), array(lit(0.5), lit(0.9))).as("p"))
      .select(
        col("c_mktsegment"),
        round(element_at(col("p"), 1), 2).as("p50_acctbal"),
        round(element_at(col("p"), 2), 2).as("p90_acctbal"))

  /** #38 CUBE over (status, priority): all 4 grouping sets in one
    * pass; nulls coalesced to a sentinel for engine-agnostic output.
    */
  def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("o_orderpriority"),
        col("n_orders"),
        col("total"))

  /** #39 Pivot: order counts, priorities × status columns. */
  def pivotOrders(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))

  /** #40 Ntile banding: balance quartile of each customer within its
    * segment (deterministic tiebreak on custkey).
    */
  def ntileCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables
      .customer(spark, dir)
      .select(
        col("c_custkey"),
        col("c_mktsegment"),
        round(col("c_acctbal"), 2).as("c_acctbal"),
        ntile(4)
          .over(Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey")))
          .cast("long")
          .as("quartile"))

  /** #65 RANGE-frame window: 7-day trailing spend per customer — a
    * value-based frame (all rows within 6 days of the current order's
    * date), not a row-count frame; same-day orders all see the same
    * trailing total.
    */
  def trailing7d(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("o_custkey")
      .orderBy(col("o_day"))
      .rangeBetween(-6, 0)
    Tables
      .orders(spark, dir)
      .withColumn("o_day", datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date")).cast("long"))
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        round(sum("o_totalprice").over(w), 2).as("trailing_7d_spend"))
  }

  /** #57 GROUPING SETS: the explicit multi-granularity form (status
    * totals + priority totals in one pass, no full cube). SQL-level
    * because the DataFrame API exposes only rollup/cube.
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_orders_gs")
    spark.sql(
      """SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
                coalesce(o_orderpriority, '(all)') AS o_orderpriority,
                count(1) AS n_orders, round(sum(o_totalprice), 2) AS total
         FROM graft_orders_gs
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""")
  }

  /** #58 Percent rank + cumulative distribution of customer balances
    * within segment — the relative-standing window pair.
    */
  def percentRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
    Tables
      .customer(spark, dir)
      .select(
        col("c_custkey"),
        col("c_mktsegment"),
        round(col("c_acctbal"), 2).as("c_acctbal"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cum_dist"))
  }

  /** #59 Frequent items (Karp/Misra-Gries style sketch via
    * `stat.freqItems`): heavy hitters without an exact global count.
    * The sketch's candidate SET is engine/partitioning-specific, but
    * its guarantee is not: every item with frequency > support·n must
    * appear in the candidates. The driver rows are the TRUE heavy
    * hitters (exact counts, which the DuckDB oracle reproduces) each
    * flagged `in_sketch` — so a sketch that drops a guaranteed heavy
    * hitter FAILS the hash compare. Range-checked, not rows-only;
    * false-positive candidates are legal per the MG contract and
    * intentionally unchecked.
    */
  def freqItems(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"))
    val cand = ev.stat.freqItems(Array("event_type"), 0.1)
    val tot = ev.agg(count(lit(1)).as("n_total"))
    ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"))
      .crossJoin(broadcast(tot))
      .filter(col("n_events") > col("n_total").cast("double") * 0.1)
      .crossJoin(broadcast(cand))
      .select(
        col("event_type"),
        col("n_events"),
        array_contains(col("event_type_freqItems"), col("event_type")).cast("int").as("in_sketch"))
  }

  /** #41 Moment statistics per group: stddev/variance/correlation/
    * covariance of lineitem quantity vs price — single partial-agg
    * pass (all four are one-pass moment sketches, scale-safe).
    */
  def momentStats(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 2).as("sd_qty"),
        round(var_samp(col("l_quantity")), 2).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qty_price"))

  /** #89 Co-purchase pairs (market-basket co-occurrence): top part
    * pairs by the number of orders containing both. The pair fan-out
    * happens INSIDE each order's collected part set (baskets are
    * small and bounded), so the explode is O(orders × basket²) with a
    * tiny constant — never a lineitem self-join, which at 100 TB
    * would shuffle the fact table twice and square the hot orders.
    * One groupBy(order), one per-pair count, top-k with a total-order
    * tiebreak (TakeOrdered, no global sort).
    */
  def copurchase(spark: SparkSession, dir: String, topK: Int = 25): DataFrame = {
    val baskets = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set("l_partkey")).as("parts"))
    baskets
      .select(
        explode(
          expr(
            """flatten(transform(parts, (x, i) ->
                 transform(slice(parts, i + 2, size(parts)),
                   y -> named_struct('part_a', x, 'part_b', y))))"""))
          .as("p"))
      .select(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(topK)
  }

  /** #124 PageRank over the co-purchase graph: which parts sit at the
    * center of the basket network — the "customers also bought"
    * centrality every recommender seeds with. Three unrolled power
    * iterations (d=0.85) where EVERYTHING is integer: ranks live in
    * e8 fixed-point BIGINTs, each contribution is `r·w div W(u)`
    * (floor division), and the damping mix is `(85·Σ) div 100` — so
    * the trajectory is bit-identical in any engine and the DuckDB
    * oracle replays all three rounds as CTEs (the k-means/CC
    * iterative-replay discipline applied to graph centrality).
    *
    * Scale shape: the edge list is built once from per-order baskets
    * (fan-out bounded by basket², never a fact self-join) and cached;
    * each iteration is one join on `src` (co-partitioned with the
    * out-weight table) + one aggregation on `dst` — the standard
    * distributed power-iteration layout, linear shuffle per round.
    * Co-purchase edges are symmetric, so no dangling-mass term is
    * needed: every node with an out-edge receives contributions.
    */
  def pageRank(spark: SparkSession, dir: String, iters: Int = 3, topK: Int = 50): DataFrame =
    Lineage.checkpointReleasing(spark) { implicit scope =>
    val pairs = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set("l_partkey")).as("parts"))
      .select(
        explode(
          expr(
            """flatten(transform(parts, (x, i) ->
                 transform(slice(parts, i + 2, size(parts)),
                   y -> named_struct('part_a', x, 'part_b', y))))"""))
          .as("p"))
      .select(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("w"))
      .cache()
    def edges0(p: org.apache.spark.sql.DataFrame) = p
      .select(col("part_a").as("src"), col("part_b").as("dst"), col("w"))
      .unionAll(p.select(col("part_b").as("src"), col("part_a").as("dst"), col("w")))
    // edges carry (src, wout, dst, w) pre-joined ONCE — each round then
    // only joins the rank vector; both the weighted edges and the rank
    // snapshots are cut from their lineage (cache / lazy
    // localCheckpoint, the Dedup.clusters iteration discipline) so
    // round r+1 never re-plans or re-executes round r's subtree.
    // edges is repartitioned on `src` BEFORE caching so the cached
    // blocks carry hash(src) output partitioning — every round's join
    // shuffles only the (tiny) rank vector, never the edge list.
    val outW = edges0(pairs).groupBy("src").agg(sum("w").as("wout"))
    val edges = edges0(pairs).join(outW, "src").repartition(col("src")).cache()
    val nDf = outW.agg(count(lit(1)).as("n_nodes"))
    var ranks = outW
      .crossJoin(broadcast(nDf))
      .select(col("src").as("part"), expr("CAST(100000000 div n_nodes AS BIGINT)").as("r"))
    for (_ <- 1 to iters) {
      ranks = edges
        .join(ranks.withColumnRenamed("part", "src"), "src")
        .select(col("dst").as("part"), expr("r * w div wout").as("c"))
        .groupBy("part")
        .agg(sum("c").as("cs"))
        .crossJoin(broadcast(nDf))
        .select(
          col("part"),
          expr("CAST(15 * 100000000 div (100 * n_nodes) + (85 * cs) div 100 AS BIGINT)").as("r"))
        .cp(false)
    }
    // the wrapper eager-materializes the final top-k THROUGH the
    // loop's lazy checkpoints, then releases BOTH the cached edge
    // frames and every round checkpoint (the r6 finding: clearCache
    // never drops checkpoint blocks, so un-released rounds accumulated
    // across the shared bench JVM); the returned frame is
    // checkpoint-backed, so callers re-read bounded top-k blocks.
    val out = ranks
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("r").desc, col("part"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("part"), col("r").as("pr_e8"), col("rank"))
    (out, Seq(pairs, edges))
  }

  /** #227 Personalized PageRank (PPR) over the co-purchase graph:
    * random walks that TELEPORT back to a seed set instead of the
    * uniform vector — "similar to THESE parts", the
    * recommendation-from-context primitive (#124 ranks global
    * centrality; PPR ranks closeness to the seeds). Seeds are the
    * parts ≡ 0 (mod 100) among graph vertices — deterministic and
    * corpus-proportional. Same all-integer e8 trajectory as #124
    * (contributions `r·w div wout`, damping `(85·Σ) div 100`), with
    * two PPR-specific differences: the teleport term lands ONLY on
    * seeds, and the rank vector must keep zero-rank nodes alive (a
    * left join against the vertex frame — dropping them would lose
    * nodes that first receive mass in a later round).
    *
    * Scale shape: identical to #124 — pre-joined src-partitioned
    * cached edges, one rank-vector join + dst-aggregation per round,
    * lazy lineage cuts, caches released on exit.
    */
  def personalizedPageRank(
      spark: SparkSession,
      dir: String,
      iters: Int = 3,
      topK: Int = 50): DataFrame = Lineage.checkpointReleasing(spark) { implicit scope =>
    val pairs = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set("l_partkey")).as("parts"))
      .select(
        explode(
          expr(
            """flatten(transform(parts, (x, i) ->
                 transform(slice(parts, i + 2, size(parts)),
                   y -> named_struct('part_a', x, 'part_b', y))))"""))
          .as("p"))
      .select(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("w"))
      .cache()
    def edges0(p: DataFrame) = p
      .select(col("part_a").as("src"), col("part_b").as("dst"), col("w"))
      .unionAll(p.select(col("part_b").as("src"), col("part_a").as("dst"), col("w")))
    val outW = edges0(pairs).groupBy("src").agg(sum("w").as("wout"))
    val edges = edges0(pairs).join(outW, "src").repartition(col("src")).cache()
    val nodes = outW
      .select(col("src").as("part"), (col("src") % 100 === 0).cast("long").as("is_seed"))
      .cp(eager = false)
    val nSeedsDf = nodes.agg(sum("is_seed").as("n_seeds"))
    var ranks = nodes
      .crossJoin(broadcast(nSeedsDf))
      .select(
        col("part"),
        expr("CAST(CASE WHEN is_seed = 1 THEN 100000000 div n_seeds ELSE 0 END AS BIGINT)")
          .as("r"))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(ranks.withColumnRenamed("part", "src"), "src")
        .select(col("dst").as("part"), expr("r * w div wout").as("c"))
        .groupBy("part")
        .agg(sum("c").as("cs"))
      ranks = nodes
        .join(contribs, Seq("part"), "left")
        .crossJoin(broadcast(nSeedsDf))
        .select(
          col("part"),
          expr("""CAST(CASE WHEN is_seed = 1 THEN 15 * 100000000 div (100 * n_seeds)
                       ELSE 0 END
                      + (85 * coalesce(cs, 0)) div 100 AS BIGINT)""").as("r"))
        .cp(false)
    }
    val out = ranks
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("r").desc, col("part"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("part"), col("r").as("ppr_e8"), col("rank"))
    (out, Seq(pairs, edges))
  }

  /** #228 HITS hubs & authorities over the BIPARTITE customer→part
    * purchase graph (Kleinberg 1999): authorities = parts bought by
    * well-connected customers, hubs = customers who buy authoritative
    * parts — the mutual-reinforcement pair that PageRank's single
    * score collapses. The bipartite direction matters: on the
    * symmetric co-purchase graph (#124's edge set) hubs and
    * authorities degenerate to the same eigenvector, so this is the
    * one graph query that genuinely needs the customer→part edges.
    *
    * All-integer trajectory (the #124/#227 discipline): hub scores
    * start at e6; each half-step is an exact weighted BIGINT sum
    * (`Σ h·w`, bounded by e6 × per-node line count — no overflow on
    * either engine) followed by max-normalization back onto the e6
    * grid with floor division (`raw * 1e6 div max`), so the whole
    * 2-iteration trajectory is bit-identical in DuckDB's unrolled-CTE
    * replay. Max-normalization (not L2) keeps it integer-exact and is
    * scale-equivalent for the ranking.
    *
    * Scale shape: the edge list is built once (orders⋈lineitem, one
    * shuffle) and materialized ONCE, hash-partitioned by `cust` via an
    * eager localCheckpoint — the authority half-step then joins it
    * shuffle-free (the checkpoint preserves the partitioning), and the
    * hub half-step re-shuffles the checkpointed edges by `part` once
    * per round. At the default iters=2 that is 1 + 2 edge shuffles of
    * an already-materialized frame, strictly cheaper than the r7
    * two-cached-copies layout (which paid the orders⋈lineitem build
    * twice); at high iteration counts a real 100 TB deployment would
    * flip to the two-copy layout (one copy per key) so rounds shuffle
    * only score vectors — the trade is iters×|edges| shuffle vs 2×
    * materialization, and iters=2 sits below the crossover.
    * The per-round max is a 1-row broadcast. Top-k per side via
    * rank-filter; output is the two leaderboards in one frame.
    */
  def hits(spark: SparkSession, dir: String, iters: Int = 2, topK: Int = 20): DataFrame =
    Lineage.checkpointReleasing(spark) { implicit scope =>
    val edgesRaw = Tables
      .orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(
        Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .agg(count(lit(1)).as("w"))
    val edges = edgesRaw.repartition(col("cust")).cp(eager = true)
    val edgesByCust = edges
    val edgesByPart = edges
    var hubs = edgesByCust
      .select(col("cust"))
      .distinct()
      .select(col("cust"), lit(1000000L).as("h"))
    var auths: DataFrame = null
    for (_ <- 1 to iters) {
      val araw = edgesByCust
        .join(hubs, "cust")
        .select(col("part"), expr("h * w").as("c"))
        .groupBy("part")
        .agg(sum("c").as("ar"))
      val amax = araw.agg(max("ar").as("amax"))
      auths = araw
        .crossJoin(broadcast(amax))
        .select(col("part"), expr("ar * 1000000 div amax").as("a"))
        .cp(false)
      val hraw = edgesByPart
        .join(auths, "part")
        .select(col("cust"), expr("a * w").as("c"))
        .groupBy("cust")
        .agg(sum("c").as("hr"))
      val hmax = hraw.agg(max("hr").as("hmax"))
      hubs = hraw
        .crossJoin(broadcast(hmax))
        .select(col("cust"), expr("hr * 1000000 div hmax").as("h"))
        .cp(false)
    }
    val topA = auths
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("a").desc, col("part"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(
        lit("authority").as("kind"),
        col("part").as("node"),
        col("a").as("score_e6"),
        col("rank"))
    val topH = hubs
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("h").desc, col("cust"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(lit("hub").as("kind"), col("cust").as("node"), col("h").as("score_e6"), col("rank"))
    (topA.unionAll(topH), Seq.empty)
  }

  /** #229 Degree assortativity of the co-purchase graph: the Pearson
    * correlation of endpoint degrees across edges — positive means
    * popular parts co-occur with popular parts (hub-clustered
    * baskets), negative means hubs bridge the periphery
    * (Newman 2002). The one-number structural summary that tells a
    * recommender whether the graph is core-periphery or assortative
    * before it picks an embedding strategy.
    *
    * Exact integer moments: degrees are BIGINT neighbor counts from
    * the symmetric support-filtered edge list (#166's graph); the
    * edge-level (deg(src), deg(dst)) pairs feed the same
    * DECIMAL(38,0)↔HUGEINT cross-product discipline as `autocorr` —
    * raw 64-bit would wrap in Spark but raise in DuckDB once Σx·y
    * crosses 2^63 — and r² ships as the factored e3×e3 signed
    * quotient (Cauchy–Schwarz bounds the PRODUCT of the two truncated
    * factors ≤ 10⁶ — not each factor individually — so the product
    * never overflows where num² would).
    *
    * Scale: degree = one groupBy on the edge list; attaching both
    * endpoint degrees = two joins keyed by src/dst; the moment
    * aggregate is a single partial-agg pass — linear, no windows.
    */
  def assortativity(spark: SparkSession, dir: String, minSupport: Int = 2): DataFrame = {
    val po = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = po
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set("l_partkey")).as("parts"))
      .select(
        explode(
          expr(
            """flatten(transform(parts, (x, i) ->
                 transform(slice(parts, i + 2, size(parts)),
                   y -> named_struct('part_a', x, 'part_b', y))))"""))
          .as("p"))
      .select(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minSupport)
    val edges = pairs
      .select(col("part_a").as("src"), col("part_b").as("dst"))
      .unionAll(pairs.select(col("part_b").as("src"), col("part_a").as("dst")))
      .localCheckpoint(eager = false)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    edges
      .join(deg, "src")
      .withColumnRenamed("deg", "x")
      .join(deg.withColumnRenamed("src", "dst").withColumnRenamed("deg", "y"), "dst")
      .agg(
        count(lit(1)).as("m"),
        sum("x").as("sx"),
        sum("y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .select(
        col("m"),
        expr("CAST(CAST(m AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS BIGINT)")
          .as("num"),
        expr("CAST(CAST(m AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS BIGINT)")
          .as("den_x"),
        expr("CAST(CAST(m AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS BIGINT)")
          .as("den_y"),
        expr("""CAST(CASE WHEN m * sxy - sx * sy < 0 THEN -1 ELSE 1 END *
                 ((abs(CAST(m * sxy - sx * sy AS DECIMAL(38,0))) * 1000
                   div CAST(m * sxx - sx * sx AS DECIMAL(38,0)))
                  * (abs(CAST(m * sxy - sx * sy AS DECIMAL(38,0))) * 1000
                     div CAST(m * syy - sy * sy AS DECIMAL(38,0))))
                AS BIGINT)""").as("r2_signed_e6"))
  }

  /** #230 Interval union coverage (sweep-line as windows): per
    * supplier, the number of distinct calendar days covered by the
    * UNION of its lineitems' [order-date, ship-date] activity
    * intervals, plus the count of merged disjoint intervals —
    * the dedup-aware utilization metric (summing raw durations
    * double-counts overlap; the union is what capacity planning and
    * SLA exposure actually need). The synthetic corpus ships some
    * lines before the order date, so endpoints are normalized with
    * least/greatest — every interval is well-formed by construction.
    *
    * The classic sweep line is sequential; its distributed form is
    * gaps-and-islands: order intervals by start WITHIN each supplier,
    * an interval starts a new island iff its start exceeds the
    * running max end of all prior intervals, island id = running
    * count of starts, then one (supplier, island) aggregate gives
    * each merged interval and a supplier aggregate sums coverage.
    * Every window is partitioned by supplier — no global windows, and
    * per-supplier row counts are the natural partition grain at
    * 100 TB (skewed suppliers are still single-key bounded).
    * Inclusive-day lengths; all integer epoch-day arithmetic, µs
    * division identical in both engines.
    */
  def intervalUnion(spark: SparkSession, dir: String): DataFrame = {
    val usPerDay = 86400000000L
    val iv = Tables
      .lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .join(
        Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        col("l_suppkey"),
        col("l_orderkey"),
        col("l_linenumber"),
        expr(s"""least(unix_micros(CAST(o_orderdate AS TIMESTAMP)),
                       unix_micros(CAST(l_shipdate AS TIMESTAMP))) div ${usPerDay}L""")
          .as("s"),
        expr(s"""greatest(unix_micros(CAST(o_orderdate AS TIMESTAMP)),
                          unix_micros(CAST(l_shipdate AS TIMESTAMP))) div ${usPerDay}L""")
          .as("e"))
    val w = Window
      .partitionBy("l_suppkey")
      .orderBy(col("s"), col("e"), col("l_orderkey"), col("l_linenumber"))
    val islands = iv
      .withColumn(
        "prev_max_e",
        max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn(
        "is_new",
        (col("prev_max_e").isNull || col("s") > col("prev_max_e")).cast("long"))
      .withColumn("island", sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    islands
      .groupBy(col("l_suppkey"), col("island"))
      .agg(min("s").as("is_"), max("e").as("ie"))
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("ie") - col("is_") + 1).as("covered_days"),
        min("is_").as("first_day"),
        max("ie").as("last_day"))
  }

  /** #232 AUC / Mann-Whitney rank test: does order value separate
    * finished orders from the rest? The threshold-free classifier
    * metric (equivalently: the probability a random positive
    * outscores a random negative), computed EXACTLY with the tie
    * convention (ties count ½) — the quantity sklearn's
    * roc_auc_score estimates, on the integer grid.
    *
    * Scale shape: rows collapse to per-distinct-score (n_pos, n_neg)
    * counts first — the frame the rank math runs on is bounded by
    * score cardinality, not row count. The global "negatives below
    * this score" prefix is built hierarchically: a monotone
    * score-range shard + within-shard cumsum + an ≤nShards-row shard
    * offset carry (the #180 Gini construction — no global data
    * window). 2U = Σ n_pos·(2·cum_neg_below + n_neg) keeps the ½-tie
    * term integer; the e6 quotient runs through DECIMAL(38,0) ↔
    * HUGEINT because 2·n₁·n₀·10⁶ crosses 2⁶³ far below 100 TB scale.
    */
  def auc(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val byVal = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("v"),
        (col("o_orderstatus") === "F").cast("long").as("pos"))
      .groupBy("v")
      .agg(sum("pos").as("n_pos"), (count(lit(1)) - sum("pos")).as("n_neg"))
    val bounds = byVal.agg(min("v").as("lo"), max("v").as("hi"))
    val sharded = byVal
      .crossJoin(broadcast(bounds))
      .withColumn("shard", expr(s"((v - lo) * $nShards) div (hi - lo + 1)"))
      .localCheckpoint(eager = false)
    val local = sharded.withColumn(
      "local_below",
      coalesce(
        sum("n_neg").over(
          Window.partitionBy("shard").orderBy("v").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val offsets = sharded
      .groupBy("shard")
      .agg(sum("n_neg").as("c"))
      .withColumn(
        "off",
        coalesce(
          sum("c").over(Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("shard"), col("off"))
    local
      .join(broadcast(offsets), "shard")
      .withColumn("cnb", col("off") + col("local_below"))
      .agg(
        sum("n_pos").as("n1"),
        sum("n_neg").as("n0"),
        sum(expr("CAST(n_pos AS DECIMAL(38,0)) * (2 * cnb + n_neg)")).as("u2"),
        sum(expr("CAST(CASE WHEN n_pos > 0 AND n_neg > 0 THEN 1 ELSE 0 END AS BIGINT)"))
          .as("nt"))
      .select(
        col("n1").as("n_pos"),
        col("n0").as("n_neg"),
        col("nt").as("n_tied_scores"),
        expr("""CAST((u2 * 1000000)
                 div (2 * CAST(n1 AS DECIMAL(38,0)) * n0) AS BIGINT)""").as("auc_e6"))
  }

  /** #231 Lagged cross-correlation matrix: Pearson r² between every
    * unordered pair of event types' daily-spend series at lags
    * 0/1/2 days — the lead-lag screen ("do clicks predict purchases
    * two days later?") that decides which features deserve a model.
    * #202's autocorrelation is the diagonal of this matrix; this is
    * the off-diagonal family.
    *
    * Same exact-integer discipline as #202: daily cents series, one
    * lag-offset equi-join per (pair, lag) — the join key is the
    * shifted day, so it stays an equi-join after the 3-lag explode —
    * and all moment cross products in DECIMAL(38,0) ↔ HUGEINT with
    * the factored e3×e3 signed r² quotient. The daily frame is tiny
    * (series × days) and lineage-cut once; the pair×lag fan-out is
    * alphabet-bounded (types² · lags), never row-bounded.
    */
  def crossCorr(spark: SparkSession, dir: String, maxLag: Int = 2): DataFrame = {
    val nsPerDay = 86400L * 1000000000L
    val daily = Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        expr(s"ts div ${nsPerDay}L").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum("cents").as("c"))
      .localCheckpoint(eager = false)
    val lags = spark.range(0, maxLag + 1).select(col("id").as("lag"))
    val pairs = daily
      .alias("a")
      .crossJoin(broadcast(lags))
      .join(
        daily.alias("b"),
        col("a.event_type") < col("b.event_type") &&
          col("b.day") === col("a.day") + col("lag"))
      .select(
        col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        col("lag"),
        col("a.c").as("x"),
        col("b.c").as("y"))
    pairs
      .groupBy("type_a", "type_b", "lag")
      .agg(
        count(lit(1)).as("m"),
        sum("x").as("sx"),
        sum("y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .select(
        col("type_a"),
        col("type_b"),
        col("lag"),
        col("m"),
        expr("CAST(CAST(m AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS BIGINT)")
          .as("num"),
        expr("CAST(CAST(m AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS BIGINT)")
          .as("den_x"),
        expr("CAST(CAST(m AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS BIGINT)")
          .as("den_y"),
        expr("""CAST(CASE WHEN m * sxy - sx * sy < 0 THEN -1 ELSE 1 END *
                 ((abs(CAST(m * sxy - sx * sy AS DECIMAL(38,0))) * 1000
                   div CAST(m * sxx - sx * sx AS DECIMAL(38,0)))
                  * (abs(CAST(m * sxy - sx * sy AS DECIMAL(38,0))) * 1000
                     div CAST(m * syy - sy * sy AS DECIMAL(38,0))))
                AS BIGINT)""").as("r2_signed_e6"))
  }

  /** #233 Calibration / reliability bins: bucket order value into 10
    * equal-width bins and report the observed finished-order rate per
    * bin — the reliability diagram that pairs with #232's AUC (AUC
    * says the score RANKS well; calibration says whether its
    * magnitude MEANS anything). Equal-width bins on the cents grid
    * keep the whole query integer-exact: bucket = (v−lo)·10 div
    * span via a 1-row min/max broadcast, rates on the e6 grid, mean
    * score as a floor quotient. One scan + one 10-row aggregate — no
    * windows, no sort, linear at any scale.
    */
  def calibration(spark: SparkSession, dir: String, nBins: Int = 10): DataFrame = {
    val scored = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("v"),
        (col("o_orderstatus") === "F").cast("long").as("pos"))
    val bounds = scored.agg(min("v").as("lo"), max("v").as("hi"))
    scored
      .crossJoin(broadcast(bounds))
      .withColumn("bin", expr(s"((v - lo) * $nBins) div (hi - lo + 1)"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n"),
        sum("pos").as("n_pos"),
        sum("v").as("sv"))
      .select(
        col("bin"),
        col("n"),
        col("n_pos"),
        expr("CAST(n_pos * 1000000 div n AS BIGINT)").as("pos_rate_e6"),
        expr("CAST(sv div n AS BIGINT)").as("mean_cents"))
  }

  /** #234 Kaplan–Meier survival curve of customer lifetime: S(t) =
    * P(customer still active t months after acquisition), with
    * right-censoring for customers whose last order lands within the
    * censor horizon of the corpus end (they are "still alive" — a
    * naive churn-rate curve counts them as dead and biases survival
    * down; KM's at-risk denominators are exactly the fix,
    * Kaplan & Meier 1958). The retention capstone next to #87's
    * cohort counts and #216's LTV triangle.
    *
    * All-integer: lifetimes in whole months (year·12+month indices),
    * the survival product runs on the e6 grid with stepwise floor
    * division S_t = S_{t−1}·(n_t − d_t) div n_t — sequential by
    * definition, but the step table is CALENDAR-BOUNDED (≤ #months
    * rows), so the fold happens inside one collected array scalar
    * via codegen'd higher-order `aggregate` over `slice` — bounded
    * model state, the k-means-centroid pattern, never a row-scale
    * collect. The at-risk suffix sum is one window over the same
    * bounded per-month aggregate (documented in
    * PlanDisciplineSpec). The DuckDB oracle replays the identical
    * trajectory as a recursive CTE.
    */
  def kaplanMeier(spark: SparkSession, dir: String, censorMonths: Int = 2): DataFrame = {
    val byCust = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").cast("long").as("m"))
      .groupBy("o_custkey")
      .agg(min("m").as("m0"), max("m").as("m1"))
    val corpusMax = byCust.agg(max("m1").as("mmax"))
    val lifes = byCust
      .crossJoin(broadcast(corpusMax))
      .select(
        (col("m1") - col("m0")).as("t"),
        (col("m1") < col("mmax") - censorMonths).cast("long").as("death"))
    val byT = lifes
      .groupBy("t")
      .agg(count(lit(1)).as("cnt"), sum("death").as("d"))
    val withRisk = byT
      .withColumn(
        "n",
        sum("cnt").over(
          Window.orderBy("t").rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .select(col("t"), col("n"), col("d"))
    // bounded (≤ #calendar-months) step table → one array scalar; the
    // e6 survival fold is a codegen'd higher-order aggregate per step
    withRisk
      .agg(expr("sort_array(collect_list(named_struct('t', t, 'n', n, 'd', d)))").as("steps"))
      .select(
        explode(
          expr("""transform(steps, (x, i) -> named_struct(
                    't', x.t, 'n_risk', x.n, 'd', x.d,
                    'surv_e6', aggregate(slice(steps, 1, i + 1), 1000000L,
                                 (acc, y) -> acc * (y.n - y.d) div y.n)))"""))
          .as("s"))
      .select(col("s.t"), col("s.n_risk"), col("s.d"), col("s.surv_e6"))
  }

  /** #235 SAX motif discovery: symbolize each event type's daily
    * cents series into value quartiles (the SAX alphabet, Lin et al.
    * 2003 — rank-based, so no float breakpoints) and count 3-day
    * sliding words over CONTIGUOUS days; the top word per series is
    * its dominant weekly micro-shape ("rise-rise-fall"), the motif
    * primitive behind time-series indexing and anomaly grammars.
    *
    * Exact/deterministic: quartile symbol = ntile(4) under the
    * (value, day) total order — identical assignment in both engines;
    * words from two day-ordered leads with day-contiguity guards (a
    * gap breaks the word, as SAX requires); word encoded as the
    * integer s₁·100 + s₂·10 + s₃. All windows partitioned by
    * event_type; the top-1 pick is a rank with (count desc, word)
    * tiebreak inside the alphabet-bounded (type × ≤64 words) count
    * frame.
    */
  def saxMotifs(spark: SparkSession, dir: String): DataFrame = {
    val nsPerDay = 86400L * 1000000000L
    val daily = Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        expr(s"ts div ${nsPerDay}L").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum("cents").as("c"))
    val sym = daily.withColumn(
      "s",
      ntile(4).over(Window.partitionBy("event_type").orderBy(col("c"), col("day"))).cast("long"))
    val wDay = Window.partitionBy("event_type").orderBy("day")
    val words = sym
      .withColumn("s2", lead("s", 1).over(wDay))
      .withColumn("s3", lead("s", 2).over(wDay))
      .withColumn("d2", lead("day", 1).over(wDay))
      .withColumn("d3", lead("day", 2).over(wDay))
      .filter(
        col("s3").isNotNull &&
          col("d2") === col("day") + 1 && col("d3") === col("day") + 2)
      .select(col("event_type"), (col("s") * 100 + col("s2") * 10 + col("s3")).as("word"))
    val counts = words
      .groupBy("event_type", "word")
      .agg(count(lit(1)).as("n_occurrences"))
    val totals = words.groupBy("event_type").agg(count(lit(1)).as("n_words"))
    counts
      .withColumn(
        "rk",
        row_number().over(
          Window.partitionBy("event_type").orderBy(col("n_occurrences").desc, col("word"))))
      .filter(col("rk") === 1)
      .join(totals, "event_type")
      .select(col("event_type"), col("word").as("motif"), col("n_occurrences"), col("n_words"))
  }

  /** #236 Time-constrained funnel: signup → engagement → purchase
    * where EACH step must land within 7 days of the previous one —
    * the product-analytics funnel semantics (#18's funnel counts
    * "eventually converted"; this counts "converted while the intent
    * was live", which is what activation metrics actually mean).
    * Greedy earliest-chain semantics: the first engagement inside the
    * signup window anchors the purchase window — deterministic and
    * the convention funnel tools use.
    *
    * Same scale shape as #18: per-user min aggregates chained by
    * user_id-keyed joins with the window predicate pushed into the
    * join filter — linear, no windows, no self-joins on raw events.
    */
  def funnelWindowed(spark: SparkSession, dir: String, windowDays: Int = 7): DataFrame = {
    val usWindow = windowDays * 86400000000L
    val ev = Tables
      .events(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("ts"), col("event_type"))
    val signup = ev
      .filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min("ts").as("signup_ts"))
    val engaged = ev
      .filter(col("event_type").isin("click", "view"))
      .join(signup, "user_id")
      .filter(col("ts") > col("signup_ts") && col("ts") <= col("signup_ts") + usWindow)
      .groupBy("user_id")
      .agg(min("ts").as("engage_ts"))
    val converted = ev
      .filter(col("event_type") === "purchase")
      .join(engaged, "user_id")
      .filter(col("ts") > col("engage_ts") && col("ts") <= col("engage_ts") + usWindow)
      .groupBy("user_id")
      .agg(min("ts").as("convert_ts"))
    signup
      .agg(count(lit(1)).as("n_signup"))
      .crossJoin(engaged.agg(count(lit(1)).as("n_engaged_7d")))
      .crossJoin(converted.agg(count(lit(1)).as("n_converted_7d")))
  }

  /** #166 Connected components over the co-purchase graph: which
    * parts form closed purchasing ecosystems — the graph primitive
    * under recommendation clustering, fraud rings, and the dedup
    * keep-list (#64's CC, promoted to a first-class generic query).
    *
    * Convergence-adaptive short-cutting label propagation: each round
    * is (a) a neighbor-min hop — label(p) ← min over p and its
    * neighbors — then (b) a pointer jump, label(p) ← label(label(p)).
    * The jump composes chains, so the propagation radius roughly
    * doubles per round (path-graph recurrence c₁=2, cᵣ₊₁ = 2cᵣ + 2 —
    * see `AnalyticsExtSpec` "planted path"): 12 capped rounds cover
    * diameter ≳8000, versus 6 for the previous fixed 6-hop version,
    * which a diameter-7 chain already defeats. The jump is an inner
    * self-join that is always total, because every label value is
    * itself a vertex id present in the frame.
    *
    * The loop exits early the first round the label vector stops
    * changing (one bounded driver scalar per round); `converged`
    * records whether the fixpoint was reached within `maxRounds`.
    * Replayability is preserved because both steps are IDEMPOTENT at
    * the fixpoint: the DuckDB oracle unrolls all `maxRounds` rounds
    * as CTEs and still compares bit-exactly to an early-exited run —
    * and on a not-yet-converged graph both engines truncate at the
    * same round with identical intermediate algebra. Support-≥2
    * edges keep the graph sparse; isolated parts are their own
    * singleton components.
    *
    * Scale: each round = two hash joins against the dst-partitioned
    * cached edge list + a groupBy min — linear per round, O(log
    * diameter) rounds; label snapshots are eagerly lineage-cut per
    * round (they double as the convergence-check materialization)
    * and the cached frames are released on exit (#124 discipline).
    *
    * `shortcut = false` recovers the legacy plain-hop propagation —
    * kept so the spec can demonstrate the divergence-by-diameter
    * failure mode the jump removes.
    */
  def components(
      spark: SparkSession,
      dir: String,
      maxRounds: Int = 12,
      minSupport: Int = 2,
      shortcut: Boolean = true): DataFrame = Lineage.checkpointReleasing(spark) { implicit scope =>
    val po = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = po
      .select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(po.select(col("l_orderkey"), col("l_partkey").as("part_b")), "l_orderkey")
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minSupport)
      .cache()
    val sym = pairs
      .select(col("part_a").as("src"), col("part_b").as("dst"))
      .unionAll(pairs.select(col("part_b").as("src"), col("part_a").as("dst")))
      .repartition(col("dst"))
      .cache()
    val verts = po.select(col("l_partkey").as("part")).distinct()
    val seed = verts.select(col("part"), col("part").as("label"))
    val (labels, converged) = propagateMinLabels(seed, sym, maxRounds, shortcut)
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("comp_size"))
    val out = labels
      .join(sizes, "label")
      .select(
        col("part"),
        col("label").as("component"),
        col("comp_size"),
        lit(if (converged) 1L else 0L).as("converged"))
    (out, Seq(pairs, sym))
  }

  /** The capped early-exit min-label loop shared by [[components]]
    * and [[componentsIncremental]]: per round a neighbor-min hop then
    * (optionally) a pointer jump, eager lineage cut, one bounded
    * convergence scalar. Any seed labeling that is a per-vertex UPPER
    * bound on the component minimum (identity labels, or a prior
    * run's labels) converges to the same fixpoint.
    */
  private def propagateMinLabels(
      seed: DataFrame,
      sym: DataFrame,
      maxRounds: Int,
      shortcut: Boolean)(implicit scope: Lineage.Scope): (DataFrame, Boolean) = {
    var labels = seed.cp(eager = true)
    var converged = false
    var round = 0
    while (round < maxRounds && !converged) {
      round += 1
      val nmin = sym
        .join(labels.select(col("part").as("dst"), col("label").as("nl")), "dst")
        .groupBy(col("src").as("part"))
        .agg(min("nl").as("m"))
      // the round's OLD label rides along as `prev`, so the
      // convergence check is a scan of the checkpointed frame — no
      // extra join per round
      val hop = labels
        .join(nmin, Seq("part"), "left")
        .select(
          col("part"),
          col("label").as("prev"),
          least(col("label"), coalesce(col("m"), col("label"))).as("label"))
      val next = (if (shortcut)
                    hop
                      .join(
                        hop.select(col("part").as("jp"), col("label").as("jl")),
                        col("label") === col("jp"))
                      .select(col("part"), col("prev"), col("jl").as("label"))
                  else hop).cp(eager = true)
      // bounded driver state: one scalar per round (did anything change?)
      converged = next.filter(col("label") =!= col("prev")).isEmpty
      labels = next.select("part", "label")
    }
    (labels, converged)
  }

  /** #225 Incremental connected components: fold a DELTA ingest batch
    * (the 10% of orders with l_orderkey % 10 = 0 — the #74/#135
    * incremental-maintenance split) into an EXISTING components state
    * without recomputing from scratch. State = the base run's label
    * vector plus its pair-support counts; the fold is (a) incremental
    * support maintenance — delta pair counts summed onto the base
    * counts, only delta orders rescanned — then (b) the SAME
    * short-cutting propagation seeded with the base labels (new parts
    * seed identity). Any upper-bound seeding converges to the same
    * fixpoint, so the contract is bit-equality with the BATCH
    * operator on the full input: this query shares `q_components`'
    * oracle verbatim (the #103/#138 shared-oracle pattern), and the
    * spec additionally pins frame-equality against [[components]].
    *
    * Scale: the delta rescan is |delta| work; the seeded propagation
    * converges in O(log merged-diameter) rounds and typically fewer
    * than the cold run — merged regions already share base labels.
    */
  def componentsIncremental(
      spark: SparkSession,
      dir: String,
      maxRounds: Int = 12,
      minSupport: Int = 2): DataFrame = Lineage.checkpointReleasing(spark) { implicit scope =>
    val po = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")).distinct()
    def pairCounts(df: DataFrame): DataFrame = df
      .select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(df.select(col("l_orderkey"), col("l_partkey").as("part_b")), "l_orderkey")
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("w"))
    // ---- base state (what a prior run would have persisted) ----
    val poBase = po.filter(col("l_orderkey") % 10 =!= 0).cp(eager = false)
    val basePairs = pairCounts(poBase).cp(eager = false)
    val baseSym = basePairs
      .filter(col("w") >= minSupport)
      .select(col("part_a").as("src"), col("part_b").as("dst"))
      .unionAll(basePairs.filter(col("w") >= minSupport)
        .select(col("part_b").as("src"), col("part_a").as("dst")))
      .repartition(col("dst"))
      .cache()
    val baseSeed = poBase.select(col("l_partkey").as("part")).distinct()
      .select(col("part"), col("part").as("label"))
    val (baseLabels, _) = propagateMinLabels(baseSeed, baseSym, maxRounds, shortcut = true)
    // ---- incremental fold of the delta batch ----
    val deltaPairs = pairCounts(po.filter(col("l_orderkey") % 10 === 0))
    val fullPairs = basePairs
      .select(col("part_a"), col("part_b"), col("w"))
      .unionAll(deltaPairs)
      .groupBy("part_a", "part_b")
      .agg(sum("w").as("w"))
      .filter(col("w") >= minSupport)
      .cache()
    val sym = fullPairs
      .select(col("part_a").as("src"), col("part_b").as("dst"))
      .unionAll(fullPairs.select(col("part_b").as("src"), col("part_a").as("dst")))
      .repartition(col("dst"))
      .cache()
    val seed = po.select(col("l_partkey").as("part")).distinct()
      .join(baseLabels.select(col("part"), col("label").as("base_label")), Seq("part"), "left")
      .select(col("part"), coalesce(col("base_label"), col("part")).as("label"))
    val (labels, converged) = propagateMinLabels(seed, sym, maxRounds, shortcut = true)
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("comp_size"))
    val out = labels
      .join(sizes, "label")
      .select(
        col("part"),
        col("label").as("component"),
        col("comp_size"),
        lit(if (converged) 1L else 0L).as("converged"))
    (out, Seq(baseSym, fullPairs, sym))
  }

  /** #110 Nearest-neighbor as-of join: each event matched to its
    * user's temporally CLOSEST order, backward or forward (ties
    * backward) — attribution when the touchpoint can precede or
    * follow the order. Same one-shuffle union-window shape as #35,
    * with two frames over one sort ([[AsOf.nearest]]).
    */
  def asofNearest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts"))
    val ord = Tables
      .orders(spark, dir)
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy("o_custkey", "o_orderdate").orderBy(col("o_orderkey").desc)))
      .filter(col("rn") === 1)
      .select(
        col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_ts"),
        col("o_orderkey"))
    AsOf.nearest(
      ev,
      ord,
      leftKey = "user_id",
      rightKey = "o_custkey",
      leftTime = "ts",
      rightTime = "o_ts",
      payload = Seq("o_orderkey"))
  }

  /** #109 Rolling window median: each event's trailing-7-day median
    * value within its user's history — a percentile aggregate over a
    * RANGE frame (the robust rolling baseline behind anomaly flags;
    * plain avg is what the fat tail owns). One shuffle on user_id;
    * the frame is integer nanoseconds, 6dp-rounded output (the
    * cross-engine interpolation guard).
    */
  def rollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val sevenDaysNs = 7L * 24 * 3600 * 1000000000L
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts"))
      .rangeBetween(-sevenDaysNs, 0)
    Tables
      .events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("med_7d", round(percentile(col("value"), lit(0.5)).over(w), 6))
      .select(col("event_id"), col("user_id"), col("med_7d"))
  }

  /** #105 Event-gap detection (lag/lead audit): per user, pairs of
    * consecutive events more than `minGapSec` apart — the silence
    * audit behind session-boundary checks and sensor-dropout
    * monitoring. One window over the (user_id) partitioning; gap
    * arithmetic is integer nanoseconds end to end, so the oracle
    * replays it exactly (`epoch_ns` on the DuckDB side).
    */
  def eventGaps(spark: SparkSession, dir: String, minGapSec: Long = 86400L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables
      .events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("prev_event_id", lag("event_id", 1).over(w))
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .withColumn("gap_sec", expr("(ts - prev_ts) div 1000000000"))
      .filter(col("gap_sec") >= minGapSec)
      .select(
        col("user_id"),
        col("prev_event_id"),
        col("event_id"),
        col("gap_sec"))
  }

  /** #106 Discrete percentiles (percentile_disc parity): per
    * event_type, the ACTUAL data value at p ∈ {0.25, 0.5, 0.75,
    * 0.95} — defined explicitly as the row with row_number
    * ⌈p·n⌉ under the (value, event_id) total order, so both engines
    * pick the identical row with zero interpolation arithmetic
    * (interpolated percentiles are the cross-engine ulp hazard
    * winsorize has to round away; discrete ones are exact by
    * construction). One window pass + a 4-element probe array.
    */
  def percentileDisc(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    Tables
      .events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .withColumn("p", explode(typedlit(Seq(0.25, 0.5, 0.75, 0.95))))
      .filter(col("rn") === ceil(col("p") * col("n")))
      .select(col("event_type"), col("p"), round(col("value"), 2).as("value"))
  }

  /** #161 Theil–Sen robust trend: per customer, the MEDIAN of all
    * pairwise slopes (y_j−y_i)/(x_j−x_i) over x_j > x_i — the
    * outlier-immune companion to #159's OLS (one wild order skews the
    * mean-based slope, not the median-based one; breakdown point
    * 29%). Slopes on the e4 grid by toward-zero integer division; the
    * median is DISCRETE: the slope at rank ⌈m/2⌉ under a (slope,
    * pair-id) total order, zero interpolation. The pair join fans out
    * per KEY only — orders per customer is domain-bounded (≤ tens),
    * so the n² term is a constant per key and the shuffle stays
    * linear in the fact table, the same contract as the co-purchase
    * basket² shape. Customers whose orders all share one day have no
    * defined slope and drop out.
    */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("long").as("x"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("y"))
    val a = base.select(
      col("o_custkey"),
      col("o_orderkey").as("k1"),
      col("x").as("x1"),
      col("y").as("y1"))
    val b = base.select(
      col("o_custkey"),
      col("o_orderkey").as("k2"),
      col("x").as("x2"),
      col("y").as("y2"))
    val pairs = a
      .join(b, Seq("o_custkey"))
      .filter(col("x2") > col("x1"))
      .withColumn("slope_e4", expr("((y2 - y1) * 10000) div (x2 - x1)"))
    val w = Window.partitionBy("o_custkey").orderBy(col("slope_e4"), col("k1"), col("k2"))
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("m", count(lit(1)).over(Window.partitionBy("o_custkey")))
      .filter(col("rn") === expr("(m + 1) div 2"))
      .select(col("o_custkey"), col("m").cast("long").as("m"), col("slope_e4").as("ts_slope_e4"))
  }

  /** #160 Weighted discrete percentiles: per return flag, the price at
    * which a fraction p of total QUANTITY (not row count) is reached —
    * the inventory/value-at-risk percentile, where heavy rows count
    * proportionally. Fully discrete and all-integer: threshold
    * T = ⌈(num·W)/den⌉ = (num·W + den − 1) div den over exact
    * fractions p = num/den, winner = the row whose running quantity
    * interval (cum − w, cum] contains T under the (price, orderkey,
    * linenumber) total order. No interpolation arithmetic, exact
    * cross-engine like #106. At 100 TB the per-flag running sum uses
    * the hierarchical-cumsum construction (#118) since the group
    * cardinality is tiny.
    */
  def weightedPercentile(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window
      .partitionBy("l_returnflag")
      .orderBy(col("price_c"), col("l_orderkey"), col("l_linenumber"))
    Tables
      .lineitem(spark, dir)
      .select(
        col("l_returnflag"),
        col("l_orderkey"),
        col("l_linenumber"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("price_c"),
        expr("CAST(l_quantity AS BIGINT)").as("qty"))
      .withColumn(
        "cum",
        sum("qty").over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("wtot", sum("qty").over(Window.partitionBy("l_returnflag")))
      .withColumn(
        "pr",
        expr("explode(array(struct(1 AS num, 4 AS den), struct(1 AS num, 2 AS den), " +
          "struct(3 AS num, 4 AS den), struct(9 AS num, 10 AS den)))"))
      .withColumn("t", expr("(pr.num * wtot + pr.den - 1) div pr.den"))
      .filter(col("cum") - col("qty") < col("t") && col("t") <= col("cum"))
      .select(
        col("l_returnflag"),
        (col("pr.num").cast("double") / col("pr.den")).as("p"),
        col("price_c"))
  }

  /** #159 Per-key OLS trend: closed-form least-squares slope/intercept
    * of customer spend (cents) over order day — the per-entity trend
    * extractor (LTV trajectory, churn signal) as ONE partial-agg pass:
    * slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) over integer day index ×
    * integer cents, emitted on the e4 grid by integer division (both
    * engines truncate toward zero — verified, and Cauchy–Schwarz
    * bounds every intermediate under 2⁶³). Zero windows, zero joins:
    * five integer sums per key, then per-row arithmetic — the cheapest
    * possible distributed shape for a regression per key. Keys with
    * one order or a single distinct day carry no slope and are
    * excluded (denominator 0).
    */
  def olsTrend(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("long").as("x"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("y"))
    o.groupBy("o_custkey")
      .agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"),
        sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .filter(col("n") >= 2 && expr("n * sxx - sx * sx") > 0)
      .withColumn("slope_e4", expr("((n * sxy - sx * sy) * 10000) div (n * sxx - sx * sx)"))
      .withColumn("intercept_e4", expr("(sy * 10000 - slope_e4 * sx) div n"))
      .select(col("o_custkey"), col("n"), col("slope_e4"), col("intercept_e4"))
  }

  /** #156 Equi-depth histogram: per event_type, B rank-defined bins
    * over `value` — the optimizer/statistics histogram (equal ROW
    * counts per bin, data-adaptive boundaries) as opposed to #91's
    * fixed-width value bins. Bin of a row = ((rn−1)·B) div n + 1
    * under the (value, event_id) total order — all-integer, bin
    * populations equal ±1 by construction, no interpolation
    * arithmetic anywhere (the same discrete discipline as #106).
    * One window pass partitioned BY TYPE + a partial-agg rollup; at
    * 100 TB the per-type sort is the hierarchical-rank construction
    * (#86) if a single type outgrows a partition.
    */
  def equidepthHist(spark: SparkSession, dir: String, bins: Int = 8): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    Tables
      .events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .withColumn("bin", expr(s"CAST((rn - 1) * $bins div n AS BIGINT) + 1"))
      .groupBy("event_type", "bin")
      .agg(
        count(lit(1)).as("n_rows"),
        round(min("value"), 2).as("lo"),
        round(max("value"), 2).as("hi"))
  }

  /** #178 U-shape multi-touch attribution: each `purchase` event's
    * conversion credit split over the same user's non-purchase
    * touchpoints in the 24 hours before it — 40% to the first touch,
    * 40% to the last, 20% shared by the middles (the position-based
    * model marketing teams default to between last-touch (#35's
    * as-of) and data-driven Shapley). Credit lives in EXACT basis
    * points: 10000 per conversion, degenerate paths get 10000 (n=1)
    * or 5000/5000 (n=2), and the middle share is Hamilton-apportioned
    * (base = 2000 div (n−2), remainder +1 to the earliest middles) so
    * every conversion telescopes to exactly 10000 — no float leakage,
    * exact in any engine (the #150 apportionment discipline applied
    * to attribution).
    *
    * Join shape: conversions ⋈ touches on user then time-window
    * filter — per-user bounded fan-out, credit windows partition BY
    * CONVERSION (a path's touchpoints, never the table). Integer µs
    * time arithmetic throughout.
    */
  def attribution(spark: SparkSession, dir: String, windowHours: Int = 24): DataFrame = {
    val winUs = windowHours.toLong * 3600000000L
    val ev = Tables
      .events(spark, dir)
      .select(
        col("user_id"),
        expr("ts div 1000").as("ts_us"),
        col("event_id"),
        col("event_type"))
    val conv = ev
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("conv_us"), col("event_id").as("conv_id"))
    val touch = ev.filter(col("event_type") =!= "purchase")
    val j = conv
      .join(touch, "user_id")
      .filter(col("ts_us") >= col("conv_us") - winUs && col("ts_us") < col("conv_us"))
    val w = Window.partitionBy("conv_id")
    val r = j
      .withColumn("rn", row_number().over(w.orderBy(col("ts_us"), col("event_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn(
        "bp",
        expr("""CAST(CASE WHEN n = 1 THEN 10000
                          WHEN n = 2 THEN 5000
                          WHEN rn = 1 OR rn = n THEN 4000
                          ELSE 2000 div (n - 2)
                               + (CASE WHEN rn - 1 <= 2000 % (n - 2) THEN 1 ELSE 0 END)
                     END AS BIGINT)"""))
    r.groupBy("event_type")
      .agg(
        count(lit(1)).as("n_touch"),
        countDistinct(col("conv_id")).as("n_conversions"),
        sum("bp").as("credit_bp"))
  }

  /** #182 CUSUM changepoint detection: per event type, the day where
    * the cumulative deviation of daily volume from its mean peaks —
    * the classic single-changepoint locator (Page's CUSUM / binary
    * segmentation's first split): a level shift in event rate pulls
    * the cumulative sum into a V whose apex IS the shift day.
    * Monitoring teams run exactly this over daily metric series to
    * date a regression or a traffic-mix change.
    *
    * Division-free: instead of S_k = Σ(c_d − T/n) (a rational mean),
    * everything is scaled by n — S'_k = Σ(n·c_d − T) = n·S_k, which
    * preserves the argmax exactly and keeps the whole trajectory in
    * BIGINTs. Changepoint = (|S'| desc, day asc) winner per type.
    * Per-type day windows are bounded (the series length, never the
    * event table); one partial-agg pass builds the daily counts.
    */
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .events(spark, dir)
      .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("c"))
    val totals = daily
      .groupBy("event_type")
      .agg(sum("c").as("t"), count(lit(1)).as("n_days"))
    val w = Window.partitionBy("event_type").orderBy(col("day"))
    val cusum = daily
      .join(totals, "event_type")
      .withColumn(
        "s",
        sum(col("n_days") * col("c") - col("t"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("s_abs", abs(col("s")))
    cusum
      .withColumn(
        "rk",
        row_number().over(
          Window.partitionBy("event_type").orderBy(col("s_abs").desc, col("day"))))
      .filter(col("rk") === 1)
      .select(
        col("event_type"),
        col("n_days"),
        col("t").as("total_events"),
        col("day").as("cp_day_idx"),
        col("s").as("s_at_cp"),
        col("s_abs"))
  }

  /** #180 Gini coefficient of customer spend: the inequality summary
    * behind every "top x% of customers drive y% of revenue" deck, and
    * the distribution-level companion to the per-key skew diagnostic
    * (#99) — skew says which keys are heavy, Gini says how unequal
    * the whole distribution is. One row: customer count, total spend,
    * Gini on the e6 grid, and the top-1-customer revenue share.
    *
    * Exact: spend in whole dollars (per-row floor, integer sums), the
    * sorted-rank identity G = (2Σi·xᵢ − (n+1)Σxᵢ)/(n·Σxᵢ) with the
    * rank built hierarchically (monotone spend-range shard + offsets
    * ≡ global row_number — the #86 construction, no single-partition
    * data window). The e6 scaling runs through DECIMAL(38,0) because
    * (n·Σx)·10⁶ exceeds 2⁶³ already at test scale — the same decimal
    * path a 1000× corpus needs, exercised now, with DuckDB's HUGEINT
    * `//` agreeing exactly.
    */
  def gini(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val per = Tables
      .orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).as("x"))
    val bounds = per.agg(min("x").as("lo"), max("x").as("hi"))
    val sharded = per
      .crossJoin(broadcast(bounds))
      .withColumn("shard", expr(s"((x - lo) * $nShards) div (hi - lo + 1)"))
    val local = sharded.withColumn(
      "rn",
      row_number()
        .over(Window.partitionBy("shard").orderBy(col("x"), col("o_custkey")))
        .cast("long"))
    val offsets = sharded
      .groupBy("shard")
      .agg(count(lit(1)).as("c"))
      .withColumn(
        "off",
        coalesce(
          sum("c").over(Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("shard"), col("off"))
    local
      .join(broadcast(offsets), "shard")
      .withColumn("i", col("off") + col("rn"))
      .agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"),
        sum(col("i") * col("x")).as("six"),
        max("x").as("mx"))
      .select(
        col("n").as("n_customers"),
        col("sx").as("total_usd"),
        expr("""CAST((CAST(2 * six - (n + 1) * sx AS DECIMAL(38, 0)) * 1000000)
                 div CAST(n * sx AS DECIMAL(38, 0)) AS BIGINT)""").as("gini_e6"),
        expr("CAST((mx * 1000000) div sx AS BIGINT)").as("top1_share_e6"))
  }

  /** #179 Association rules by lift: the co-purchase pairs (#89)
    * promoted to the full market-basket rule metrics — support,
    * directed confidence, and lift = P(ab)/(P(a)P(b)), the measure
    * that separates genuinely-associated pairs from pairs that merely
    * contain popular parts (confidence alone always crowns the
    * bestsellers). Top-k by lift among pairs co-occurring ≥ minCount
    * times.
    *
    * All metrics live on the e6 integer grid (c_ab·10⁶ div N etc.) —
    * exact cross-engine, no float ratios. Counts come from ONE
    * distinct (order, part) projection: pair counts via the #89
    * basket² explode (never a fact self-join), item counts via one
    * partial agg, both joined at pair cardinality. The top-k rank is
    * a TakeOrdered on (lift, pair) — map-side bounded.
    */
  def basketLift(
      spark: SparkSession,
      dir: String,
      minCount: Int = 2,
      topK: Int = 25): DataFrame = {
    val bp = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
    val n = bp.select(col("l_orderkey")).distinct().agg(count(lit(1)).as("n_baskets"))
    val itemCounts = bp.groupBy(col("l_partkey")).agg(count(lit(1)).as("c_item"))
    val pairs = bp
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set("l_partkey")).as("parts"))
      .select(
        explode(
          expr(
            """flatten(transform(parts, (x, i) ->
                 transform(slice(parts, i + 2, size(parts)),
                   y -> named_struct('part_a', x, 'part_b', y))))"""))
          .as("p"))
      .select(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    pairs
      .join(itemCounts.select(col("l_partkey").as("part_a"), col("c_item").as("c_a")), "part_a")
      .join(itemCounts.select(col("l_partkey").as("part_b"), col("c_item").as("c_b")), "part_b")
      .crossJoin(broadcast(n))
      .withColumn("support_e6", expr("(c_ab * 1000000) div n_baskets"))
      .withColumn("conf_ab_e6", expr("(c_ab * 1000000) div c_a"))
      .withColumn("conf_ba_e6", expr("(c_ab * 1000000) div c_b"))
      .withColumn("lift_e6", expr("(c_ab * n_baskets * 1000000) div (c_a * c_b)"))
      .orderBy(col("lift_e6").desc, col("part_a"), col("part_b"))
      .limit(topK)
      .select(
        col("part_a"),
        col("part_b"),
        col("c_ab"),
        col("c_a"),
        col("c_b"),
        col("support_e6"),
        col("conf_ab_e6"),
        col("conf_ba_e6"),
        col("lift_e6"))
  }

  /** #176 Triangle count + global clustering coefficient over the
    * co-purchase graph — the graph-family capstone beside PageRank
    * (#124) and connected components (#166): triangles measure
    * community cohesion (parts bought together in CLOSED loops), and
    * the clustering coefficient 3T/W is the standard graph-health
    * statistic.
    *
    * Degree-oriented node-iterator (the MapReduce-classic shape):
    * orient every edge small→large under the (degree, id) total order
    * — the orientation is acyclic and bounds out-degree by O(√m), so
    * wedge fan-out is Σ outdeg² ≤ m^1.5, never Σ deg² (which a hub
    * node would blow up). Each triangle has exactly ONE source node
    * under the orientation ⇒ counted once, no division by 3. The
    * wedge-close is an EQUI-join on the ≺-ordered pair — hash join,
    * no OR predicate. Edges come from the #89 basket² explode
    * (co-occurrence ≥ minOrders), never a fact self-join.
    *
    * All-integer; one driver row: nodes, edges, oriented wedges,
    * triangles, and cc_e6 = (3T·10⁶) div W_open with
    * W_open = Σ deg(deg−1)/2 — exact in any engine.
    */
  def triangles(spark: SparkSession, dir: String, minOrders: Int = 2): DataFrame = {
    val baskets = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set("l_partkey")).as("parts"))
    val e = baskets
      .select(
        explode(
          expr(
            """flatten(transform(parts, (x, i) ->
                 transform(slice(parts, i + 2, size(parts)),
                   y -> named_struct('pa', x, 'pb', y))))"""))
          .as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minOrders)
      .select("pa", "pb")
    val deg = e
      .select(col("pa").as("node"))
      .unionAll(e.select(col("pb").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("deg"))
    val oe = e
      .join(deg.select(col("node").as("pa"), col("deg").as("da")), "pa")
      .join(deg.select(col("node").as("pb"), col("deg").as("db")), "pb")
      .select(
        when(struct(col("da"), col("pa")) < struct(col("db"), col("pb")), col("pa"))
          .otherwise(col("pb"))
          .as("u"),
        when(struct(col("da"), col("pa")) < struct(col("db"), col("pb")), col("pb"))
          .otherwise(col("pa"))
          .as("v"),
        when(struct(col("da"), col("pa")) < struct(col("db"), col("pb")), col("db"))
          .otherwise(col("da"))
          .as("dv"))
    val a = oe.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val b = oe.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val wedges = a
      .join(b, Seq("u"))
      .filter(col("x") < col("y"))
      .select(
        col("u"),
        when(struct(col("dx"), col("x")) < struct(col("dy"), col("y")), col("x"))
          .otherwise(col("y"))
          .as("lo"),
        when(struct(col("dx"), col("x")) < struct(col("dy"), col("y")), col("y"))
          .otherwise(col("x"))
          .as("hi"))
    val tri = wedges.join(
      oe.select(col("u").as("lo"), col("v").as("hi")),
      Seq("lo", "hi"),
      "left_semi")
    deg
      .agg(
        count(lit(1)).as("n_nodes"),
        expr("CAST(sum(deg * (deg - 1)) div 2 AS BIGINT)").as("open_wedges"))
      .crossJoin(broadcast(e.agg(count(lit(1)).as("n_edges"))))
      .crossJoin(broadcast(wedges.agg(count(lit(1)).as("n_wedges"))))
      .crossJoin(broadcast(tri.agg(count(lit(1)).as("n_triangles"))))
      .select(
        col("n_nodes"),
        col("n_edges"),
        col("open_wedges"),
        col("n_wedges"),
        col("n_triangles"),
        expr("CAST((3 * n_triangles * 1000000) div greatest(open_wedges, 1) AS BIGINT)")
          .as("cc_e6"))
  }

  /** #174 Event-type transition matrix: per-user Markov transitions
    * over the changelog — for each (from, to) event-type pair, how
    * often `to` directly follows `from` in a user's timeline, with the
    * per-from transition probability on the e6 integer grid. The
    * sequence-model companion to the funnel (#18) and session (#16)
    * operators: funnels check ONE prescribed path, the transition
    * matrix is the full first-order dynamics (what actually follows
    * what), the input to churn path mining and next-event prediction.
    *
    * One lag window per user (bounded partitions — a user's history,
    * never the table), one partial-agg count, margins joined back at
    * type-pair cardinality (tiny). p_e6 = (n_trans·10⁶) div n_from —
    * exact integer division in any engine.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = Tables
      .events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val fromTotals = trans
      .groupBy("from_type")
      .agg(sum("n_trans").as("n_from"))
    trans
      .join(fromTotals, "from_type")
      .withColumn("p_e6", expr("(n_trans * 1000000) div n_from"))
      .select(col("from_type"), col("to_type"), col("n_trans"), col("n_from"), col("p_e6"))
  }

  /** #168 Grouped weighted median: per nation, the customer account
    * balance at which half the nation's ORDER VOLUME is reached — each
    * customer weighted by lifetime order count, so a whale with 40
    * orders pulls the median 40× harder than a one-order account. The
    * segmentation median every pricing/credit team actually wants
    * (the row-median treats both customers equally and lies).
    *
    * Same all-integer discipline as the weighted percentiles (#160):
    * balances in cents, weights as exact BIGINT counts, lower weighted
    * median = the row whose running-weight interval (cum − w, cum]
    * contains T = ⌈W/2⌉ = (W+1) div 2 under the (bal_c, custkey)
    * total order. Zero interpolation, exact in any engine.
    *
    * Scale: one partial-agg pass for the weights, one broadcast-ready
    * join (weights frame = |customers| but two columns), one window
    * partitioned BY NATION — no global ordering anywhere; a nation
    * outgrowing a partition takes the hierarchical-cumsum
    * construction (#118) unchanged.
    */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = Tables
      .orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("w"))
    val c = Tables
      .customer(spark, dir)
      .select(
        col("c_custkey"),
        col("c_nationkey"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("bal_c"))
    val ord = Window.partitionBy("c_nationkey").orderBy(col("bal_c"), col("c_custkey"))
    c.join(w, c("c_custkey") === w("o_custkey"))
      .withColumn(
        "cum",
        sum("w").over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("wtot", sum("w").over(Window.partitionBy("c_nationkey")))
      .withColumn("t", expr("(wtot + 1) div 2"))
      .filter(col("cum") - col("w") < col("t") && col("t") <= col("cum"))
      .select(
        col("c_nationkey").cast("long").as("c_nationkey"),
        col("wtot").cast("long").as("w_total"),
        col("bal_c").as("median_bal_c"))
  }

  /** #189 Chi-square association audit: is order PRIORITY independent
    * of order STATUS? The contingency-table test every profiling
    * stage runs on categorical column pairs — a large statistic says
    * the pair carries joint structure (worth a composite feature or a
    * partition key), a small one says the columns are independent.
    * Per-cell contribution and the total statistic, both on the e6
    * integer grid: chi2 cell = (n*O - R*C)^2 / (n*R*C), computed as
    * DECIMAL(38,0) floor divisions (the squared term passes 2^63
    * already at test scale; DuckDB replays in HUGEINT — the #180
    * discipline). One count pass, two margin reductions broadcast
    * back, everything else arithmetic.
    */
  def chi2Assoc(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables
      .orders(spark, dir)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("o"))
    val rowm = cells.groupBy("o_orderstatus").agg(sum("o").as("r"))
    val colm = cells.groupBy("o_orderpriority").agg(sum("o").as("c"))
    val tot = cells.agg(sum("o").as("n"))
    val contrib = cells
      .join(broadcast(rowm), "o_orderstatus")
      .join(broadcast(colm), "o_orderpriority")
      .crossJoin(broadcast(tot))
      .select(
        col("o_orderstatus"),
        col("o_orderpriority"),
        col("o").as("n_cell"),
        expr("CAST((CAST(r AS DECIMAL(38,0)) * c * 1000000) div CAST(n AS DECIMAL(38,0)) AS BIGINT)")
          .as("expected_e6"),
        expr("""CAST((CAST(n * o - r * c AS DECIMAL(38,0)) * CAST(n * o - r * c AS DECIMAL(38,0))
                      * 1000000)
                 div (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)""")
          .as("contrib_e6"))
    contrib.withColumn(
      "chi2_total_e6",
      sum("contrib_e6").over(Window.partitionBy()))
  }

  /** #191 ABC / Pareto revenue classification: parts banded into the
    * classic inventory classes by cumulative revenue share — A while
    * the running share is ≤ 80%, B to 95%, C above — the "top x% of
    * SKUs drive y% of revenue" cut that decides stocking policy, and
    * the class-banded companion to #180's single-number Gini.
    *
    * Exact: whole-dollar per-row floors summed as BIGINTs (the #180
    * money grid), the descending revenue rank and its cumulative sum
    * built HIERARCHICALLY — monotone revenue-range shards, in-shard
    * windows, a shards-row offset table broadcast back (the #86/#180
    * construction; no single-partition window over the part dim,
    * which at warehouse scale is NOT small). The DuckDB oracle is the
    * FLAT global window, so the hash-MATCH proves the decomposition.
    * Share scaling runs DECIMAL(38,0) ↔ HUGEINT (cum·10⁶ > 2⁶³ at
    * scale). Class cuts compare integer e6 shares — no float ratios.
    */
  def abcPareto(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val (classed, tot) = abcClassed(spark, dir, nShards)
    classed
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_parts"), sum("rev").as("class_revenue_usd"))
      .crossJoin(broadcast(tot))
      .select(
        col("abc_class"),
        col("n_parts"),
        col("class_revenue_usd"),
        expr("CAST((CAST(class_revenue_usd AS DECIMAL(38,0)) * 1000000) div t AS BIGINT)")
          .as("class_share_e6"))
  }

  /** The per-part ABC classification shared by #191 and #257: the
    * hierarchical cumulative-revenue-share build (monotone rev-desc
    * shard + within-shard cumsum + ≤nShards-row carry — equal
    * revenues never span shards, so the shard index is monotone in
    * the (rev desc, partkey) total order) and the 80/95 class cut.
    * Returns the classed per-part frame plus the 1-row revenue total.
    */
  private def abcClassed(
      spark: SparkSession,
      dir: String,
      nShards: Int): (DataFrame, DataFrame) = {
    val rev = Tables
      .lineitem(spark, dir)
      .select(
        col("l_partkey"),
        expr("CAST(floor(l_extendedprice * (1.0d - l_discount)) AS BIGINT)").as("r"))
      .groupBy("l_partkey")
      .agg(sum("r").as("rev"))
    val bounds = rev.agg(min("rev").as("lo"), max("rev").as("hi"))
    val sharded = rev
      .crossJoin(broadcast(bounds))
      .withColumn("shard", expr(s"((hi - rev) * $nShards) div (hi - lo + 1)"))
    val ws = Window.partitionBy("shard").orderBy(col("rev").desc, col("l_partkey"))
    val local = sharded.withColumn("csum", sum("rev").over(ws))
    val offsets = sharded
      .groupBy("shard")
      .agg(sum("rev").as("s"))
      .withColumn(
        "roff",
        coalesce(
          sum("s").over(Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("shard"), col("roff"))
    val tot = rev.agg(sum("rev").as("t"))
    val classed = local
      .join(broadcast(offsets), "shard")
      .crossJoin(broadcast(tot))
      .withColumn(
        "share_e6",
        expr("CAST((CAST(roff + csum AS DECIMAL(38,0)) * 1000000) div t AS BIGINT)"))
      .withColumn(
        "abc_class",
        when(col("share_e6") <= 800000, "A")
          .when(col("share_e6") <= 950000, "B")
          .otherwise("C"))
    (classed, tot)
  }

  /** The per-part weekly-demand moment frame shared by #256/#257:
    * observed-week demand (qty summed per epoch-week a part actually
    * sold — the demand-history contract; structural zero weeks are a
    * documented non-goal, matching how interval-based inventory
    * models read a transaction log) with n, Σq, Σq² per part.
    */
  private def weeklyDemand(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .join(
        Tables.orders(spark, dir).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        "l_orderkey")
      .select(
        col("l_partkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) div 7")
          .as("week"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q"))
      .groupBy("l_partkey", "week")
      .agg(sum("q").as("qw"))
      .groupBy("l_partkey")
      .agg(
        count(lit(1)).as("n_weeks"),
        sum("qw").as("sq"),
        sum(expr("CAST(qw AS DECIMAL(38,0)) * qw")).as("sqq"))

  /** #256 Safety stock / reorder point: per part, the buffer a
    * service-level policy holds against demand variability over the
    * replenishment lead time — ss = z·√(L·Var) with z = 2 (~97.7%
    * one-sided) and L = 2 weeks, reorder = L·mean + ss. The standard
    * inventory-control read-out over the same demand history #212
    * allocates FIFO lots from. All-integer: weekly-demand moments in
    * DECIMAL(38,0), sample variance var = (nΣq² − (Σq)²) div
    * (n(n−1)), and the square root is the #226 one-ulp-clamp EXACT
    * integer sqrt (s₀ = floor(double sqrt), ±1 CASE corrections) of
    * z²·L·var — so ss = isqrt(4·2·var) exactly, identically in both
    * engines. Parts need ≥2 observed weeks (variance undefined
    * below). One join + two aggregate passes, linear, no windows.
    */
  def safetyStock(spark: SparkSession, dir: String): DataFrame =
    weeklyDemand(spark, dir)
      .filter(col("n_weeks") >= 2)
      .withColumn(
        "var_q",
        expr("""CAST((CAST(n_weeks AS DECIMAL(38,0)) * sqq - CAST(sq AS DECIMAL(38,0)) * sq)
                 div (CAST(n_weeks AS DECIMAL(38,0)) * (n_weeks - 1)) AS BIGINT)"""))
      .withColumn("mean_w", expr("sq div n_weeks"))
      .withColumn("s0", expr("CAST(floor(sqrt(CAST(8 * var_q AS DOUBLE))) AS BIGINT)"))
      .withColumn(
        "ss",
        expr("""s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= 8 * var_q THEN 1 ELSE 0 END)
                   - (CASE WHEN s0 * s0 > 8 * var_q THEN 1 ELSE 0 END)"""))
      .select(
        col("l_partkey"),
        col("n_weeks"),
        col("sq").as("total_qty"),
        col("mean_w").as("mean_weekly_qty"),
        col("var_q"),
        col("ss").as("safety_stock"),
        (lit(2L) * col("mean_w") + col("ss")).as("reorder_point"))

  /** #257 ABC-XYZ inventory matrix: the 9-cell planning grid every
    * S&OP process starts from — #191's ABC (revenue concentration)
    * crossed with XYZ demand-variability classes, cv² = Var/mean² on
    * the e6 grid as the SINGLE exact quotient cv²·10⁶ = (nΣq²−(Σq)²)
    * ·n·10⁶ div ((n−1)·(Σq)²) (X < 0.25·10⁶, Y < 10⁶, else Z — the
    * standard cv<0.5/cv<1 cuts, squared so no sqrt exists anywhere).
    * AX parts (high value, steady) get automated min-max; CZ parts
    * (low value, erratic) get make-to-order — the matrix is the
    * decision, which is why it is the deliverable rather than the
    * per-part frame. Parts with one observed week are class Z by
    * convention (variability unknowable). Reuses #191's hierarchical
    * share build verbatim; one join on the part key; output ≤ 9
    * rows.
    */
  def xyzMatrix(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val (classed, tot) = abcClassed(spark, dir, nShards)
    val xyz = weeklyDemand(spark, dir)
      .withColumn(
        "cv2_e6",
        expr("""CASE WHEN n_weeks < 2 THEN CAST(NULL AS BIGINT)
                 ELSE CAST((CAST(n_weeks AS DECIMAL(38,0)) * sqq
                            - CAST(sq AS DECIMAL(38,0)) * sq) * n_weeks * 1000000
                      div ((CAST(n_weeks AS DECIMAL(38,0)) - 1)
                           * CAST(sq AS DECIMAL(38,0)) * sq) AS BIGINT) END"""))
      .withColumn(
        "xyz_class",
        when(col("cv2_e6").isNull, "Z")
          .when(col("cv2_e6") < 250000, "X")
          .when(col("cv2_e6") < 1000000, "Y")
          .otherwise("Z"))
      .select(col("l_partkey"), col("xyz_class"))
    classed
      .join(xyz, "l_partkey")
      .groupBy("abc_class", "xyz_class")
      .agg(count(lit(1)).as("n_parts"), sum("rev").as("cell_revenue_usd"))
      .crossJoin(broadcast(tot))
      .select(
        col("abc_class"),
        col("xyz_class"),
        col("n_parts"),
        col("cell_revenue_usd"),
        expr("CAST((CAST(cell_revenue_usd AS DECIMAL(38,0)) * 1000000) div t AS BIGINT)")
          .as("cell_share_e6"))
  }

  /** #258 Nation basket similarity: Jaccard between every pair of
    * nations' DISTINCT-part purchase sets — "which markets buy the
    * same catalog", the assortment-overlap screen behind market
    * clustering and transfer-pricing comparisons. Built the
    * `text_sparse_sim` way (#171): an INVERTED INDEX on the part key
    * — per part, the nations buying it pair up — so intersection
    * counts come from a posting-list join whose fan-out per part is
    * nations-per-part², alphabet-bounded (≤25²), never parts². Union
    * by inclusion-exclusion from per-nation set sizes; e6 integer
    * Jaccard. One lineitem→customer join is the only data-scale
    * pass; everything after runs on (nation, part) distincts.
    */
  def nationSimilarity(spark: SparkSession, dir: String): DataFrame = {
    val np = Tables
      .lineitem(spark, dir)
      .join(
        Tables.orders(spark, dir).select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
        "l_orderkey")
      .join(
        Tables.customer(spark, dir).select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
        "o_custkey")
      .select(col("c_nationkey").cast("long").as("nation"), col("l_partkey"))
      .distinct()
      .localCheckpoint(eager = false)
    val sizes = np.groupBy("nation").agg(count(lit(1)).as("n_parts"))
    val inter = np
      .alias("a")
      .join(np.alias("b"), col("a.l_partkey") === col("b.l_partkey") &&
        col("a.nation") < col("b.nation"))
      .groupBy(col("a.nation").as("nation_a"), col("b.nation").as("nation_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select(col("nation").as("nation_a"), col("n_parts").as("na"))),
        "nation_a")
      .join(broadcast(sizes.select(col("nation").as("nation_b"), col("n_parts").as("nb"))),
        "nation_b")
      .select(
        col("nation_a"),
        col("nation_b"),
        col("na"),
        col("nb"),
        col("n_common"),
        expr("CAST(n_common * 1000000 div (na + nb - n_common) AS BIGINT)")
          .as("jaccard_e6"))
  }

  /** #259 Half-life discounted LTV: per customer, lifetime spend
    * where each order's cents are discounted by 2^(age in months) —
    * the recency-weighted value ranking CRM prioritization actually
    * uses (a $1000 order three half-lives ago counts $125; #14's
    * plain LTV treats them equally, #216's curve shows the raw
    * timing). DYADIC decay keeps it exact: cents div 2^age is a
    * right-shift, no float discounting, identical in any engine;
    * age = corpus max month − order month from a 1-row broadcast
    * clock. One aggregate pass; shift capped at 62 so the divisor
    * stays in BIGINT at any corpus span.
    */
  def discountedLtv(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        expr("CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT)")
          .as("m"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val clock = o.agg(max("m").as("mmax"))
    o.crossJoin(broadcast(clock))
      .select(
        col("o_custkey"),
        col("cents"),
        expr("least(mmax - m, CAST(62 AS BIGINT))").as("age"))
      .groupBy("o_custkey")
      .agg(
        count(lit(1)).as("n_orders"),
        sum("cents").as("raw_cents"),
        sum(expr("cents div CAST(pow(2, age) AS BIGINT)")).as("discounted_cents"))
  }

  /** #260 Burstiness / Fano factor: per event type, the
    * variance-to-mean ratio of daily event counts on the e6 grid —
    * the index-of-dispersion screen that separates Poisson-like
    * steady streams (≈10⁶) from bursty ones (≫10⁶), the one-number
    * triage before reaching for #182's changepoints or #223's
    * anomaly flags. Single exact quotient: Fano·10⁶ =
    * (nΣc²−(Σc)²)·10⁶ div ((n−1)·Σc) — variance AND mean share the
    * n denominator, so it cancels and no intermediate division
    * truncates. One day-keyed aggregate per type over the
    * calendar-bounded daily frame; DECIMAL(38,0) cross products.
    */
  def burstiness(spark: SparkSession, dir: String): DataFrame = {
    val nsPerDay = 86400L * 1000000000L
    Tables
      .events(spark, dir)
      .select(col("event_type"), expr(s"ts div ${nsPerDay}L").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("c"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_days"),
        sum("c").as("n_events"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("scc"))
      .filter(col("n_days") >= 2)
      .select(
        col("event_type"),
        col("n_days"),
        col("n_events"),
        expr("""CAST((CAST(n_days AS DECIMAL(38,0)) * scc
                      - CAST(n_events AS DECIMAL(38,0)) * n_events) * 1000000
                 div (CAST(n_days - 1 AS DECIMAL(38,0)) * n_events) AS BIGINT)""")
          .as("fano_e6"))
  }

  /** #192 Skyline / Pareto-frontier preference query: the parts no
    * other part beats on BOTH price and size (minimize `p_retailprice`,
    * minimize `p_size`) — the classic "best tradeoff set" operator
    * (Börzsönyi et al., ICDE 2001) that product search and
    * supplier-selection queries run at warehouse scale.
    *
    * Distributed shape: a fixed-width price grid (B bins) reduces to a
    * per-bin min-size STAIRCASE (one tiny aggregate); its strict
    * prefix-min, broadcast back, prunes every point dominated by a
    * strictly-cheaper bin — the surviving candidate set is
    * O(B + skyline), independent of the fact row count, so the exact
    * residual pass (a range-frame running min over survivors only)
    * never sees the full table. At 100 TB, raise B; the fact table is
    * touched once, map-side, against a broadcast staircase. Money on
    * the cent grid (BIGINT); dominance strict-somewhere, so exact
    * (price,size) duplicates are both retained — matching the oracle's
    * NOT EXISTS replay bit-for-bit.
    */
  def skyline(spark: SparkSession, dir: String, bins: Int = 64): DataFrame = {
    val pts = Tables
      .part(spark, dir)
      .select(
        col("p_partkey"),
        expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").as("price_c"),
        col("p_size").cast("long").as("p_size"))
    val bounds = pts.agg(min("price_c").as("lo"), max("price_c").as("hi"))
    val binned = pts
      .crossJoin(broadcast(bounds))
      .withColumn("bin", expr(s"((price_c - lo) * $bins) div (hi - lo + 1)"))
    // staircase: min size per price bin, then min over all strictly lower bins
    val stairs = binned
      .groupBy("bin")
      .agg(min("p_size").as("bin_min"))
      .withColumn(
        "pref_min",
        min("bin_min").over(
          Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("bin"), col("pref_min"))
    val survivors = binned
      .join(broadcast(stairs), "bin")
      .filter(col("pref_min").isNull || col("pref_min") > col("p_size"))
    // exact residual: dominated iff a strictly cheaper survivor is no
    // larger, or an equal-price survivor is strictly smaller
    val strictCheaper =
      Window.orderBy("price_c").rangeBetween(Window.unboundedPreceding, -1)
    val samePrice = Window.partitionBy("price_c")
    survivors
      .withColumn("run_min", min("p_size").over(strictCheaper))
      .withColumn("eq_min", min("p_size").over(samePrice))
      .filter(
        (col("run_min").isNull || col("run_min") > col("p_size")) &&
          col("p_size") === col("eq_min"))
      .select(col("p_partkey"), col("price_c"), col("p_size"))
  }

  /** #193 Rolling 7-day active users (sliding exact count-distinct):
    * for every active day, the number of DISTINCT users seen in the
    * trailing 7-day window — the rolling-MAU/WAU metric that naive
    * windowing cannot express (distinct does not decompose over a
    * sliding frame).
    *
    * Distributed shape: dedup to per-(day, user) presence, then each
    * presence row COVERS the next 7 target days (a bounded 7-way
    * explode — `sequence` + `explode`, map-side), and one hash
    * aggregate counts distinct users per covered day. O(7·presence)
    * rows shuffled on target_day — linear, no global window, no
    * per-day full rescan; window length w scales cost as O(w·n),
    * independent of the corpus day span. Target days restricted to
    * days with activity (inner join with the presence day set), so
    * the output domain is data-defined on both engines.
    */
  def rollingMau(spark: SparkSession, dir: String): DataFrame = {
    val nsPerDay = 86400L * 1000000000L
    val pres = Tables
      .events(spark, dir)
      .select(expr(s"ts div ${nsPerDay}L").as("day"), col("user_id"))
      .distinct()
    val days = pres.select(col("day").as("target_day")).distinct()
    val covered = pres
      .select(explode(expr("sequence(day, day + 6)")).as("target_day"), col("user_id"))
    covered
      .join(days, "target_day")
      .groupBy("target_day")
      .agg(countDistinct("user_id").as("n_active_7d"))
  }

  /** #195 Event-sequence pattern match (MATCH_RECOGNIZE shape): each
    * user's event history becomes an ordered symbol string
    * (signup→s, click→c, view→v, purchase→p, error→e) and a regex
    * counts the browse-to-buy runs `v[vc]*p` — a view followed by any
    * browsing that ends in a purchase. This is the SQL-2016
    * MATCH_RECOGNIZE / funnel-regex operator: sequence predicates no
    * join can express cheaply, compiled to one per-key aggregation.
    *
    * Shape: one hash exchange on `user_id`; `collect_list(struct)` +
    * `array_sort` orders by (ts, event_id) inside the aggregate —
    * per-key state is activity-bounded (the sessionization contract),
    * never a global sort. The regex runs codegen'd per key. Both
    * engines scan left-to-right non-overlapping with a greedy,
    * alternation-free pattern, so Java and RE2 agree exactly.
    */
  def eventRegex(spark: SparkSession, dir: String): DataFrame = {
    val sym = when(col("event_type") === "signup", "s")
      .when(col("event_type") === "click", "c")
      .when(col("event_type") === "view", "v")
      .when(col("event_type") === "purchase", "p")
      .otherwise("e")
    Tables
      .events(spark, dir)
      .select(
        col("user_id"),
        struct(col("ts"), col("event_id"), sym.as("ch")).as("ev"))
      .groupBy("user_id")
      .agg(
        array_join(expr("transform(array_sort(collect_list(ev)), x -> x.ch)"), "")
          .as("seq"))
      .select(
        col("user_id"),
        length(col("seq")).cast("long").as("n_events"),
        size(expr("regexp_extract_all(seq, 'v[vc]*p', 0)")).cast("long")
          .as("n_browse_to_buy"))
  }

  /** #207 Conversion-lag percentiles: per converting user, the time
    * from FIRST view to the first purchase after it, summarized as
    * discrete p50/p90/p99 order statistics — the funnel-latency
    * companion to #18 (which counts conversions; this measures how
    * long they take). µs lags via truncate-then-diff (each ns stamp
    * `div 1000` before subtracting — the classify() convention, so
    * both timestamp generations agree with `epoch_us` exactly).
    *
    * Percentile ranks are type-1 discrete (⌈q·n⌉ — the #106 zero-
    * interpolation discipline) over a global lag rank built
    * HIERARCHICALLY (#191 value-range shards + broadcast offsets —
    * converting users are NOT small at warehouse scale). One
    * events-table pass per leg, user_id exchanges only.
    */
  def conversionLag(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("us"))
    val firstView = ev
      .filter(col("event_type") === "view")
      .groupBy("user_id")
      .agg(min("us").as("v"))
    val lags = ev
      .filter(col("event_type") === "purchase")
      .join(firstView, "user_id")
      .filter(col("us") > col("v"))
      .groupBy("user_id", "v")
      .agg(min("us").as("p"))
      .select(col("user_id"), (col("p") - col("v")).as("lag_us"))
    val bounds = lags.agg(min("lag_us").as("lo"), max("lag_us").as("hi"))
    val sharded = lags
      .crossJoin(broadcast(bounds))
      .withColumn("shard", expr(s"((lag_us - lo) * $nShards) div (hi - lo + 1)"))
    val ws = Window.partitionBy("shard").orderBy(col("lag_us"), col("user_id"))
    val local = sharded.withColumn("lrank", row_number().over(ws))
    val offsets = sharded
      .groupBy("shard")
      .agg(count(lit(1)).as("cnt"))
      .withColumn(
        "roff",
        coalesce(
          sum("cnt").over(Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("shard"), col("roff"))
    val ranked = local
      .join(broadcast(offsets), "shard")
      .select(col("lag_us"), (col("roff") + col("lrank")).as("grank"))
    val total = lags.agg(count(lit(1)).as("n"))
    val targets = spark
      .createDataFrame(Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L)))
      .toDF("pctl", "num", "den")
    targets
      .crossJoin(broadcast(total))
      .withColumn("rank", expr("(n * num + den - 1) div den"))
      .join(ranked, col("rank") === col("grank"))
      .select(col("pctl"), col("rank"), col("lag_us"), col("n").as("n_converted"))
  }

  /** #200 K-core decomposition (convergence-adaptive peeling): the
    * maximal subgraph of the co-purchase graph in which every part
    * keeps degree ≥ k — the graph-density backbone extraction behind
    * community seeding and spam/anomaly filtering, the peeled
    * complement of #176's triangle census.
    *
    * Shape: each peel round is degree-count + two semi-joins
    * restricting edges to surviving nodes — all hash exchanges on
    * node ids. The loop exits early the first round that removes no
    * edge (the per-round edge count is both the convergence scalar
    * and the checkpoint materialization), capped at `maxRounds`; the
    * `converged` column records whether the peel fixpoint was reached
    * within the cap. Restriction is IDEMPOTENT at the fixpoint, so
    * the DuckDB oracle unrolls all `maxRounds` rounds and compares
    * bit-exactly to an early-exited run (the #166 replay
    * discipline); its converged flag is the same last-two-rounds
    * edge-count equality, computed in-data. Output: each core member
    * with its within-core degree.
    */
  def kcore(spark: SparkSession, dir: String, k: Int = 3, maxRounds: Int = 16): DataFrame =
    Lineage.checkpointReleasing(spark) { implicit scope =>
    val baskets = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set("l_partkey")).as("parts"))
    var edges = baskets
      .select(
        explode(
          expr(
            """flatten(transform(parts, (x, i) ->
                 transform(slice(parts, i + 2, size(parts)),
                   y -> named_struct('pa', x, 'pb', y))))"""))
          .as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 2)
      .select("pa", "pb")
      .cp(eager = false)
    def degrees(e: DataFrame): DataFrame =
      e.select(col("pa").as("node"))
        .unionAll(e.select(col("pb").as("node")))
        .groupBy("node")
        .agg(count(lit(1)).as("deg"))
    // peeling only removes edges, so count equality ⟺ fixpoint — one
    // bounded driver scalar per round, doubling as the materialization
    var nEdges = edges.count()
    var converged = false
    var round = 0
    while (round < maxRounds && !converged) {
      round += 1
      val keep = degrees(edges).filter(col("deg") >= k).select("node")
      edges = edges
        .join(keep.select(col("node").as("pa")), Seq("pa"), "left_semi")
        .join(keep.select(col("node").as("pb")), Seq("pb"), "left_semi")
        .select("pa", "pb")
        .cp(eager = true)
      val n = edges.count()
      converged = n == nEdges
      nEdges = n
    }
    (degrees(edges).select(
      col("node"),
      col("deg").as("core_deg"),
      lit(if (converged) 1L else 0L).as("converged")), Seq.empty)
  }

  /** #196 EWMA trailing smoothing (α = 1/2, 16-day horizon): the
    * exponentially-weighted moving average of each event type's daily
    * spend — the smoothing primitive behind anomaly baselines and
    * forecast seeds, beside #182's CUSUM (which detects) and #168's
    * OLS (which extrapolates).
    *
    * EWMA's recursion is inherently sequential; the distributed form
    * exploits that α = 1/2 truncated at 16 lags is EXACT dyadic
    * arithmetic: weight of lag i is 2^(15-i) on a 2^16 grid, so
    * num/den BIGINTs replace floats entirely. Each daily point COVERS
    * its next 16 target days (bounded explode, the #193 cover-join
    * shape), one hash agg sums weighted cents — O(16·days·keys)
    * rows, linear, no per-key sequential scan, no window at all.
    * Output carries the exact rational (num, den) plus the truncated
    * cents quotient (all inputs positive, so Spark `div` and DuckDB
    * `//` agree).
    */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    val nsPerDay = 86400L * 1000000000L
    val daily = Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        expr(s"ts div ${nsPerDay}L").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum("cents").as("c"))
    val present = daily.select(col("event_type"), col("day").as("target_day"))
    daily
      .select(
        col("event_type"),
        col("c"),
        col("day"),
        explode(expr("sequence(0, 15)")).as("off"))
      .select(
        col("event_type"),
        (col("day") + col("off")).as("target_day"),
        expr("c * shiftleft(CAST(1 AS BIGINT), 15 - off)").as("wc"),
        expr("shiftleft(CAST(1 AS BIGINT), 15 - off)").as("w"))
      .join(present, Seq("event_type", "target_day"))
      .groupBy("event_type", "target_day")
      .agg(sum("wc").as("num"), sum("w").as("den"))
      .select(
        col("event_type"),
        col("target_day").as("day"),
        col("num"),
        col("den"),
        expr("num div den").as("ewma_cents"))
  }

  /** #201 Quantile normalization across sources: each document's
    * length is replaced by the GLOBAL length at the same within-source
    * rank quantile — the distribution-alignment transform (classic in
    * batch-effect removal) that makes per-source features comparable
    * when sources were collected under different length regimes;
    * #190's KS measures the drift, this removes it.
    *
    * All-integer: within-source rank r_s of n_s maps to global
    * position ⌈r_s·N/n_s⌉ (type-1 discrete quantile — no
    * interpolation arithmetic), looked up by an equi-join against the
    * globally-ranked value table. The GLOBAL rank is built
    * HIERARCHICALLY (value-range shards + broadcast offset table —
    * the #191 construction; equal values cannot straddle shards, so
    * the shard index is monotone and no single-partition window ever
    * sees the corpus). Within-source windows partition on `source`;
    * at 100 TB a mega-source would get the same shard treatment.
    */
  def quantileNormalize(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars").as("len"))
    val bounds = docs.agg(min("len").as("lo"), max("len").as("hi"))
    val sharded = docs
      .crossJoin(broadcast(bounds))
      .withColumn("shard", expr(s"((len - lo) * $nShards) div (hi - lo + 1)"))
    val ws = Window.partitionBy("shard").orderBy(col("len"), col("doc_id"))
    val local = sharded.withColumn("lrank", row_number().over(ws))
    val offsets = sharded
      .groupBy("shard")
      .agg(count(lit(1)).as("cnt"))
      .withColumn(
        "roff",
        coalesce(
          sum("cnt").over(Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("shard"), col("roff"))
    val global = local
      .join(broadcast(offsets), "shard")
      .select(col("len").as("g_len"), (col("roff") + col("lrank")).as("grank"))
    val total = docs.agg(count(lit(1)).as("n"))
    val wsrc = Window.partitionBy("source").orderBy(col("len"), col("doc_id"))
    val ranked = docs
      .withColumn("srank", row_number().over(wsrc))
      .withColumn("n_s", count(lit(1)).over(Window.partitionBy("source")))
    ranked
      .crossJoin(broadcast(total))
      .withColumn("target", expr("(srank * n + n_s - 1) div n_s"))
      .join(global, col("target") === col("grank"))
      .select(col("doc_id"), col("source"), col("len"), col("g_len").as("norm_len"))
  }

  /** #221 Seasonal-trend decomposition (STL-lite, classical
    * decomposition): each event type's daily spend split into
    * trend + weekly seasonal + remainder — the additive model behind
    * seasonality-aware anomaly baselines, completing the time-series
    * family: #196 EWMA smooths, #182 CUSUM detects, #168 OLS
    * extrapolates, this EXPLAINS the weekly shape.
    *
    * All-integer classical decomposition: trend = centered 7-day
    * moving sum div 7 (cents positive, so Spark `div` ≡ DuckDB `//`),
    * kept only where the frame is FULL and GAP-FREE (7 rows spanning
    * exactly 6 days — a ROWS frame over a gappy calendar would span
    * more, so both guards are asserted in-data); seasonal(dow) =
    * per-weekday mean of the detrended series as a sign-factored
    * truncating quotient (detrended can be negative, where Spark div
    * truncates but DuckDB // floors — magnitudes divided, sign
    * re-applied, the #202 discipline); remainder closes the additive
    * identity cents = trend + seasonal + remainder exactly.
    *
    * Scale: one partial-agg pass to days (series × days rows), one
    * 7-row window partitioned BY SERIES (never global), one tiny
    * (series × 7) seasonal aggregate broadcast back. Linear, gap-safe,
    * exact in any engine.
    */
  def seasonalDecomp(spark: SparkSession, dir: String): DataFrame = {
    val nsPerDay = 86400L * 1000000000L
    val daily = Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        expr(s"ts div ${nsPerDay}L").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum("cents").as("c"))
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    val kept = daily
      .withColumn("wsum", sum("c").over(w))
      .withColumn("wcnt", count(lit(1)).over(w))
      .withColumn("wmin", min("day").over(w))
      .withColumn("wmax", max("day").over(w))
      .filter(col("wcnt") === 7 && col("wmax") - col("wmin") === 6)
      .select(
        col("event_type"),
        col("day"),
        col("c"),
        expr("wsum div 7").as("trend"),
        (col("c") - expr("wsum div 7")).as("det"),
        pmod(col("day"), lit(7)).as("dow"))
      .localCheckpoint(eager = false)
    val seasonal = kept
      .groupBy("event_type", "dow")
      .agg(sum("det").as("snum"), count(lit(1)).as("sn"))
      .select(
        col("event_type"),
        col("dow"),
        expr("CASE WHEN snum < 0 THEN -(abs(snum) div sn) ELSE snum div sn END").as("seasonal"))
    kept
      .join(broadcast(seasonal), Seq("event_type", "dow"))
      .select(
        col("event_type"),
        col("day"),
        col("dow"),
        col("c").as("cents"),
        col("trend").as("trend_cents"),
        col("seasonal").as("seasonal_cents"),
        (col("det") - col("seasonal")).as("remainder_cents"))
  }

  /** #299 Seasonal/trend strength (Hyndman's F-statistics): per
    * event-type series, how much of the detrended variance the weekly
    * seasonal explains — F_seasonal = max(0, 1 − Var(rem)/Var(det)) —
    * and how much of the deseasonalized variance the trend explains —
    * F_trend = max(0, 1 − Var(rem)/Var(cents − seasonal)). The
    * one-number summary of whether #221's decomposition (and #292's
    * seasonal state) is EARNING its complexity on this series: a
    * near-zero F_seasonal says use #250's Holt and stop. Exact: both
    * ratios computed on raw moment forms n·Σx² − (Σx)² (the shared n
    * cancels), cross products in DECIMAL(38,0)↔HUGEINT, denominators
    * floored at 1. One ≤|series|-row aggregate over the #221 frame.
    */
  def seasonalStrength(spark: SparkSession, dir: String): DataFrame =
    seasonalDecomp(spark, dir)
      .select(
        col("event_type"),
        (col("cents") - col("trend_cents")).as("det"),
        (col("cents") - col("seasonal_cents")).as("des"),
        col("remainder_cents").as("rem"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_days"),
        sum("det").as("sd"),
        sum(expr("CAST(det AS DECIMAL(38,0)) * det")).as("sdd"),
        sum("des").as("ss"),
        sum(expr("CAST(des AS DECIMAL(38,0)) * des")).as("sss"),
        sum("rem").as("sr"),
        sum(expr("CAST(rem AS DECIMAL(38,0)) * rem")).as("srr"))
      .select(
        col("event_type"),
        col("n_days"),
        expr("""CAST(greatest(CAST(n_days AS DECIMAL(38,0)) * sdd - CAST(sd AS DECIMAL(38,0)) * sd, 1)
                 AS DECIMAL(38,0))""").as("vd"),
        expr("""CAST(greatest(CAST(n_days AS DECIMAL(38,0)) * sss - CAST(ss AS DECIMAL(38,0)) * ss, 1)
                 AS DECIMAL(38,0))""").as("vs"),
        expr("""CAST(CAST(n_days AS DECIMAL(38,0)) * srr - CAST(sr AS DECIMAL(38,0)) * sr
                 AS DECIMAL(38,0))""").as("vr"))
      .select(
        col("event_type"),
        col("n_days"),
        expr("CAST(greatest(0, (vd - vr) * 1000000 div vd) AS BIGINT)")
          .as("f_seasonal_e6"),
        expr("CAST(greatest(0, (vs - vr) * 1000000 div vs) AS BIGINT)")
          .as("f_trend_e6"))

  /** #223 Seasonal-remainder anomaly flags: the capstone of the
    * time-series family — #221's decomposition explains trend and
    * weekly shape; what's left (the remainder) is where anomalies
    * live, and the robust threshold is the MAD rule (flag when
    * |remainder − median| > 3·MAD), immune to the anomalies' own
    * pull in a way that z-scores are not (#113's argument, applied to
    * the deseasonalized series rather than the raw one — a weekly
    * spike that is NORMAL for a Saturday no longer flags).
    *
    * All-integer: lower discrete medians via row_number at rank
    * (n+1) div 2 under the (value, day) total order — zero
    * interpolation, the #106 percentile_disc pattern; strict > on
    * the 3×MAD comparison so a zero-MAD series flags every nonzero
    * deviation. Per-series windows only; the median/MAD frames are
    * (series × 1) broadcasts.
    */
  def anomalyFlags(spark: SparkSession, dir: String): DataFrame = {
    val rem = seasonalDecomp(spark, dir)
      .select(col("event_type"), col("day"), col("remainder_cents").as("rem"))
      .localCheckpoint(eager = false)
    def lowerMedian(df: DataFrame, value: String, out: String): DataFrame = {
      val w = Window.partitionBy("event_type").orderBy(col(value), col("day"))
      df.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col(value).as(out))
    }
    val med = lowerMedian(rem, "rem", "med")
    val dev = rem
      .join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("rem") - col("med")))
    val mad = lowerMedian(dev, "adev", "mad")
    dev
      .join(broadcast(mad), "event_type")
      .select(
        col("event_type"),
        col("day"),
        col("rem").as("remainder_cents"),
        col("med").as("med_cents"),
        col("mad").as("mad_cents"),
        (col("adev") > col("mad") * 3).cast("long").as("is_anomaly"))
  }

  /** #202 Lag-1 autocorrelation per series (daily spend per event
    * type): the serial-dependence diagnostic behind seasonality
    * detection and forecast-model choice — #168's OLS fits the trend,
    * this measures whether residual day-to-day persistence exists at
    * all.
    *
    * Exact integer Pearson over consecutive-day pairs: one self-join
    * on (series, day+1), one aggregation collecting the five power
    * sums, then the correlation reported as exact BIGINT moments
    * (num, den_a, den_b) plus the signed squared correlation on the
    * e6 grid — cross products run DECIMAL(38,0) ↔ HUGEINT (the #189
    * discipline), zero floats, zero square roots. Gaps in the
    * calendar simply produce no pair (both engines agree by
    * construction).
    */
  def autocorr(spark: SparkSession, dir: String): DataFrame = {
    val nsPerDay = 86400L * 1000000000L
    val daily = Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        expr(s"ts div ${nsPerDay}L").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum("cents").as("c"))
      // tiny (series × days) frame read on both sides of the lag join —
      // barrier it so the events scan+agg runs once, not twice
      .localCheckpoint(eager = false)
    val pairs = daily
      .alias("a")
      .join(
        daily.alias("b"),
        col("a.event_type") === col("b.event_type") &&
          col("b.day") === col("a.day") + 1)
      .select(
        col("a.event_type").as("event_type"),
        col("a.c").as("x"),
        col("b.c").as("y"))
    pairs
      .groupBy("event_type")
      // power sums and moment cross products in DECIMAL(38,0) (↔ the
      // oracle's HUGEINT): raw 64-bit would wrap silently in Spark but
      // raise in DuckDB once x·y crosses 2^63 at larger SFs — same
      // discipline r2_signed_e6 below already applies
      .agg(
        count(lit(1)).as("m"),
        sum("x").as("sx"),
        sum("y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .select(
        col("event_type"),
        col("m"),
        expr("CAST(CAST(m AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS BIGINT)")
          .as("num"),
        expr("CAST(CAST(m AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS BIGINT)")
          .as("den_x"),
        expr("CAST(CAST(m AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS BIGINT)")
          .as("den_y"),
        // r² as a product of two e3-scaled quotients (|num|·10³ div den;
        // Cauchy-Schwarz bounds their PRODUCT ≤ 10⁶, not each factor):
        // num² would overflow DECIMAL(38) and HUGEINT past sf0.1, the
        // factored form never does.
        // Magnitudes divided (floor == trunc on both engines), sign
        // applied after in the integer domain.
        expr("""CAST(CASE WHEN m * sxy - sx * sy < 0 THEN -1 ELSE 1 END *
                 ((abs(CAST(m * sxy - sx * sy AS DECIMAL(38,0))) * 1000
                   div CAST(m * sxx - sx * sx AS DECIMAL(38,0)))
                  * (abs(CAST(m * sxy - sx * sy AS DECIMAL(38,0))) * 1000
                     div CAST(m * syy - sy * sy AS DECIMAL(38,0))))
                AS BIGINT)""").as("r2_signed_e6"))
  }

  /** #239 Local clustering coefficient: per-vertex triangle density
    * over the co-purchase graph — lcc(v) = 2·tri(v)·10⁶ div
    * (deg(v)·(deg(v)−1)) — the node-level refinement of #176's single
    * global coefficient. #176 says how clustered the GRAPH is; this
    * says which PARTS sit inside closed purchasing communities
    * (high lcc = ecosystem anchor, low lcc at high degree = bridge /
    * hub spanning otherwise-unrelated baskets — the classic
    * structural-role split the global number can't see).
    *
    * Same degree-oriented node-iterator as #176 (orientation bounds
    * wedge fan-out by Σ outdeg² ≤ m^1.5): each closed wedge yields one
    * triangle with corners (u, lo, hi); per-vertex counts are the
    * 3-way corner explode of that triangle frame — alphabet-3
    * fan-out, then one groupBy on the node key. Degrees ride the
    * existing degree frame; nodes in no triangle keep lcc = 0 via a
    * left join. All-integer: 2·tri·10⁶ < 2⁶³ needs deg ≲ 10⁹ — safe.
    */
  def localClustering(spark: SparkSession, dir: String, minOrders: Int = 2): DataFrame = {
    val baskets = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set("l_partkey")).as("parts"))
    val e = baskets
      .select(
        explode(
          expr(
            """flatten(transform(parts, (x, i) ->
                 transform(slice(parts, i + 2, size(parts)),
                   y -> named_struct('pa', x, 'pb', y))))"""))
          .as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minOrders)
      .select("pa", "pb")
    val deg = e
      .select(col("pa").as("node"))
      .unionAll(e.select(col("pb").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("deg"))
    val oe = e
      .join(deg.select(col("node").as("pa"), col("deg").as("da")), "pa")
      .join(deg.select(col("node").as("pb"), col("deg").as("db")), "pb")
      .select(
        when(struct(col("da"), col("pa")) < struct(col("db"), col("pb")), col("pa"))
          .otherwise(col("pb"))
          .as("u"),
        when(struct(col("da"), col("pa")) < struct(col("db"), col("pb")), col("pb"))
          .otherwise(col("pa"))
          .as("v"),
        when(struct(col("da"), col("pa")) < struct(col("db"), col("pb")), col("db"))
          .otherwise(col("da"))
          .as("dv"))
    val a = oe.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val b = oe.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val wedges = a
      .join(b, Seq("u"))
      .filter(col("x") < col("y"))
      .select(
        col("u"),
        when(struct(col("dx"), col("x")) < struct(col("dy"), col("y")), col("x"))
          .otherwise(col("y"))
          .as("lo"),
        when(struct(col("dx"), col("x")) < struct(col("dy"), col("y")), col("y"))
          .otherwise(col("x"))
          .as("hi"))
    val tri = wedges.join(
      oe.select(col("u").as("lo"), col("v").as("hi")),
      Seq("lo", "hi"),
      "left_semi")
    val perNode = tri
      .select(explode(array(col("u"), col("lo"), col("hi"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("n_tri"))
    deg
      .join(perNode, Seq("node"), "left")
      .select(
        col("node"),
        col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        expr("""CASE WHEN deg < 2 THEN CAST(0 AS BIGINT)
                 ELSE CAST((2 * coalesce(n_tri, 0) * 1000000)
                      div (deg * (deg - 1)) AS BIGINT) END""").as("lcc_e6"))
  }

  /** #240 Growth accounting: the day-over-day active-user ledger —
    * every active user on day d is exactly one of NEW (first-ever
    * activity), RETAINED (also active on d−1), or RESURRECTED (seen
    * before, but absent on d−1); CHURNED on day d counts users active
    * on d−1 who did not return — active(d) = new+retained+resurrected
    * and churned(d) = active(d−1) − retained(d) hold as integer
    * identities (both spec-pinned). This is the standard growth
    * decomposition under every DAU dashboard; #193's rolling MAU
    * counts heads, this explains the flux behind the count.
    *
    * One (user, day) distinct, one per-user lag window (single user_id
    * exchange), a day-keyed aggregate, then a day→day−1 self-join on
    * the CALENDAR-bounded daily frame — linear in events, never in
    * users × days.
    */
  def growthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val nsPerDay = 86400L * 1000000000L
    val ud = Tables
      .events(spark, dir)
      .select(col("user_id"), expr(s"ts div ${nsPerDay}L").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val flagged = ud
      .withColumn("prev_day", lag("day", 1).over(w))
      .select(
        col("day"),
        (col("prev_day").isNull).cast("long").as("is_new"),
        // <=> keeps the flag 0 (not NULL) on first-ever activity rows
        (col("prev_day") <=> (col("day") - 1)).cast("long").as("is_retained"),
        (col("prev_day").isNotNull && col("prev_day") < col("day") - 1)
          .cast("long")
          .as("is_resurrected"))
    val daily = flagged
      .groupBy("day")
      .agg(
        count(lit(1)).as("active"),
        sum("is_new").as("new_users"),
        sum("is_retained").as("retained"),
        sum("is_resurrected").as("resurrected"))
      .localCheckpoint(eager = false)
    daily
      .join(
        daily.select(col("day") + 1 as "day", col("active").as("active_prev")),
        Seq("day"),
        "left")
      .select(
        col("day"),
        col("active"),
        col("new_users"),
        col("retained"),
        col("resurrected"),
        (coalesce(col("active_prev"), lit(0L)) - col("retained")).as("churned"))
  }

  /** #241 Precision-recall curve at equi-depth thresholds: sweep 10
    * rank-defined thresholds over the DISTINCT order-value grid and
    * report the exact confusion row (tp/fp/fn) plus e6
    * precision/recall/F1 at each — the operating-point table #232's
    * single AUC number summarizes away (AUC says the score ranks;
    * this says what you get if you actually deploy a cutoff).
    *
    * Scale shape is #232's: rows collapse to per-distinct-score
    * (n_pos, n_neg) counts first, and BOTH global constructs — the
    * below-threshold prefix sums and the distinct-score rank that
    * defines the equi-depth bins — are built hierarchically (monotone
    * value-range shard + within-shard window + ≤nShards-row carry),
    * so no global data window exists. A threshold row is selected by
    * pure expression (its rank is the first in its bin:
    * ((rank−1)·B) div n ≠ ((rank−2)·B) div n), not by an extra
    * aggregate-join. tp = total_pos − pos_below since "predicted
    * positive" means value ≥ threshold. F1's 2pr/(p+r) stays in
    * BIGINT (p·r ≤ 10¹²).
    */
  def prCurve(spark: SparkSession, dir: String, nBins: Int = 10, nShards: Int = 8): DataFrame = {
    val byVal = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("v"),
        (col("o_orderstatus") === "F").cast("long").as("pos"))
      .groupBy("v")
      .agg(sum("pos").as("n_pos"), (count(lit(1)) - sum("pos")).as("n_neg"))
    val bounds = byVal.agg(
      min("v").as("lo"),
      max("v").as("hi"),
      count(lit(1)).as("nd"),
      sum("n_pos").as("tot_pos"),
      sum("n_neg").as("tot_neg"))
    val sharded = byVal
      .crossJoin(broadcast(bounds))
      .withColumn("shard", expr(s"((v - lo) * $nShards) div (hi - lo + 1)"))
      .localCheckpoint(eager = false)
    val wsh = Window.partitionBy("shard").orderBy("v")
    val local = sharded
      .withColumn("local_rn", row_number().over(wsh).cast("long"))
      .withColumn(
        "local_pos_below",
        coalesce(sum("n_pos").over(wsh.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn(
        "local_neg_below",
        coalesce(sum("n_neg").over(wsh.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val wcar = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded
      .groupBy("shard")
      .agg(count(lit(1)).as("c"), sum("n_pos").as("p"), sum("n_neg").as("g"))
      .withColumn("off_rn", coalesce(sum("c").over(wcar), lit(0L)))
      .withColumn("off_pos", coalesce(sum("p").over(wcar), lit(0L)))
      .withColumn("off_neg", coalesce(sum("g").over(wcar), lit(0L)))
      .select(col("shard"), col("off_rn"), col("off_pos"), col("off_neg"))
    local
      .join(broadcast(offsets), "shard")
      .withColumn("rank", col("off_rn") + col("local_rn"))
      .withColumn("pos_below", col("off_pos") + col("local_pos_below"))
      .withColumn("neg_below", col("off_neg") + col("local_neg_below"))
      .filter(expr(s"rank = 1 OR ((rank - 1) * $nBins) div nd > ((rank - 2) * $nBins) div nd"))
      .select(
        expr(s"((rank - 1) * $nBins) div nd").as("bin"),
        col("v").as("threshold_cents"),
        (col("tot_pos") - col("pos_below")).as("tp"),
        (col("tot_neg") - col("neg_below")).as("fp"),
        col("pos_below").as("fn"),
        expr("""CAST((tot_pos - pos_below) * 1000000
                 div greatest(tot_pos - pos_below + tot_neg - neg_below, 1) AS BIGINT)""")
          .as("precision_e6"),
        expr("CAST((tot_pos - pos_below) * 1000000 div greatest(tot_pos, 1) AS BIGINT)")
          .as("recall_e6"))
      .withColumn(
        "f1_e6",
        expr("CAST((2 * precision_e6 * recall_e6) div greatest(precision_e6 + recall_e6, 1) AS BIGINT)"))
  }

  /** #242 Mann-Kendall trend test per event-type daily series: the
    * nonparametric S statistic S = Σ_{i<j} sign(x_j − x_i) plus the
    * tie-corrected variance numerator — monotone-trend detection with
    * NO distributional assumption and NO slope model, the hypothesis
    * test that goes with #161's Theil-Sen estimate (Theil-Sen says how
    * steep; Mann-Kendall says whether the trend is real). All exact
    * integers: S, n, and var18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)
    * (18·Var(S) with tie groups t) — callers compare S² against
    * var18/18·z² without ever leaving the grid.
    *
    * The pairwise sweep is a per-type self-join on day_i < day_j —
    * CALENDAR-bounded (days², not rows²) exactly like #161's per-key
    * pair fan-out, over a lineage-cut daily aggregate frame; tie
    * groups are one groupBy on (type, cents). Linear in the fact
    * table, quadratic only in the bounded day dimension.
    */
  def mannKendall(spark: SparkSession, dir: String): DataFrame = {
    val nsPerDay = 86400L * 1000000000L
    val daily = Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        expr(s"ts div ${nsPerDay}L").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum("cents").as("c"))
      .localCheckpoint(eager = false)
    val s = daily
      .alias("a")
      .join(
        daily.alias("b"),
        col("a.event_type") === col("b.event_type") && col("a.day") < col("b.day"))
      .groupBy(col("a.event_type").as("event_type"))
      .agg(
        sum(signum(col("b.c") - col("a.c")).cast("long")).as("s_stat"),
        count(lit(1)).as("n_pairs"))
    val ties = daily
      .groupBy(col("event_type"), col("c"))
      .agg(count(lit(1)).as("t"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_distinct"),
        sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_term"),
        sum("t").as("n_days"))
    s.join(ties, "event_type")
      .select(
        col("event_type"),
        col("n_days"),
        col("n_pairs"),
        col("s_stat"),
        col("n_distinct"),
        expr("CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS BIGINT)")
          .as("var18"))
  }

  /** #243 Spearman rank correlation between customer account balance
    * and realized lifetime spend — "does the static attribute rank
    * customers the way their revenue does?", the monotone-association
    * screen that is immune to the cents-scale outliers Pearson (#41)
    * chases. Exact fractional tie ranks kept integer by DOUBLING:
    * rank2(v) = 2·|{below}| + t(v) + 1 (twice the average rank of
    * v's tie group), so moments run on the integer grid and the
    * signed factored r² quotient (#202's discipline) replays
    * bit-exactly in HUGEINT.
    *
    * Scale shape: both global rank constructions are the #232
    * hierarchical build — per-distinct-value counts, monotone
    * value-range shard, within-shard prefix window, ≤nShards-row
    * carry — then two value-keyed joins attach rank2x/rank2y back to
    * customers and one partial-agg pass takes the moments. No global
    * data window anywhere; customers with no orders enter at spend 0
    * (a genuine, heavily-tied rank group — exactly what the tie
    * doubling exists for).
    */
  def spearman(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val spend = Tables
      .orders(spark, dir)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("y"))
    val base = Tables
      .customer(spark, dir)
      .select(
        col("c_custkey"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("x"))
      .join(spend, Seq("c_custkey"), "left")
      .select(col("c_custkey"), col("x"), coalesce(col("y"), lit(0L)).as("y"))
      .localCheckpoint(eager = false)

    // rank2(v) = 2*below + cnt + 1 over the distinct-value grid,
    // built shard-hierarchically (#232) — returns (v, rank2)
    def rank2(values: DataFrame): DataFrame = {
      val byV = values.groupBy("v").agg(count(lit(1)).as("cnt"))
      val bounds = byV.agg(min("v").as("lo"), max("v").as("hi"))
      val sharded = byV
        .crossJoin(broadcast(bounds))
        .withColumn("shard", expr(s"((v - lo) * $nShards) div (hi - lo + 1)"))
        .localCheckpoint(eager = false)
      val wsh = Window.partitionBy("shard").orderBy("v")
      val local = sharded.withColumn(
        "local_below",
        coalesce(sum("cnt").over(wsh.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val offsets = sharded
        .groupBy("shard")
        .agg(sum("cnt").as("c"))
        .withColumn(
          "off",
          coalesce(
            sum("c").over(Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
        .select(col("shard"), col("off"))
      local
        .join(broadcast(offsets), "shard")
        .select(col("v"), (lit(2L) * (col("off") + col("local_below")) + col("cnt") + 1).as("rank2"))
    }

    val rx = rank2(base.select(col("x").as("v")))
    val ry = rank2(base.select(col("y").as("v")))
    val ranked = base
      .join(rx.select(col("v").as("x"), col("rank2").as("r2x")), "x")
      .join(ry.select(col("v").as("y"), col("rank2").as("r2y")), "y")
    ranked
      .agg(
        count(lit(1)).as("m"),
        sum("r2x").as("sx"),
        sum("r2y").as("sy"),
        sum(expr("CAST(r2x AS DECIMAL(38,0)) * r2y")).as("sxy"),
        sum(expr("CAST(r2x AS DECIMAL(38,0)) * r2x")).as("sxx"),
        sum(expr("CAST(r2y AS DECIMAL(38,0)) * r2y")).as("syy"))
      .select(
        col("m").as("n_customers"),
        expr("CAST(CAST(m AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DECIMAL(38,0))")
          .as("num"),
        expr("CAST(CAST(m AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DECIMAL(38,0))")
          .as("den_x"),
        expr("CAST(CAST(m AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS DECIMAL(38,0))")
          .as("den_y"))
      .select(
        col("n_customers"),
        // the factored e3*e3 signed rho^2 (num^2 would overflow; the
        // PRODUCT of the two |num|*1000 div den factors is <= 10^6 by
        // Cauchy-Schwarz — a single factor can exceed 10^3)
        expr("""CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END *
                 ((abs(num) * 1000 div den_x) * (abs(num) * 1000 div den_y))
                AS BIGINT)""").as("rho2_signed_e6"))
  }

  /** #250 Holt double-exponential smoothing per event-type daily
    * series: level + trend state with dyadic α = β = ¼, the
    * forecasting workhorse between #196's EWMA (level only — lags
    * every trend) and #139's seasonal model — plus the one-step-ahead
    * forecast l+b each day. All-integer: the dyadic gains make every
    * update a shift-scale sum, and division is SIGN-FACTORED
    * (−(−a div 4) for a<0) so Spark's truncating `div` and DuckDB's
    * flooring `//` replay the identical trajectory even when the
    * trend state goes negative (#221's cross-engine discipline).
    *
    * The fold is sequential BY DEFINITION, but the step table is
    * CALENDAR-bounded, so it runs inside one collected array scalar
    * per series via a codegen'd higher-order aggregate-over-slice —
    * the #234 Kaplan-Meier pattern (bounded model state, never a
    * per-row window over unbounded data). l_t appears twice in the
    * lambda (for itself and inside b_t) because SQL lambdas cannot
    * bind locals; both occurrences are the same expression, folded
    * once by codegen CSE.
    */
  def holt(spark: SparkSession, dir: String): DataFrame = {
    val nsPerDay = 86400L * 1000000000L
    // sign-factored truncating quarter: identical in both engines
    def q(a: String) = s"(CASE WHEN ($a) < 0 THEN -((-($a)) div 4) ELSE ($a) div 4 END)"
    val newL = q("s.y + 3 * (acc.l + acc.b)")
    val daily = Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        expr(s"ts div ${nsPerDay}L").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum("cents").as("y"))
    daily
      .groupBy("event_type")
      .agg(expr("sort_array(collect_list(named_struct('day', day, 'y', y)))").as("steps"))
      .select(
        col("event_type"),
        explode(
          expr(s"""transform(steps, (x, i) -> named_struct(
                     'day', x.day, 'cents', x.y,
                     'st', aggregate(slice(steps, 2, i),
                             named_struct('l', element_at(steps, 1).y, 'b', 0L),
                             (acc, s) -> named_struct(
                               'l', $newL,
                               'b', ${q(s"($newL - acc.l) + 3 * acc.b")}))))"""))
          .as("h"))
      .select(
        col("event_type"),
        col("h.day").as("day"),
        col("h.cents").as("cents"),
        col("h.st.l").as("level_c"),
        col("h.st.b").as("trend_c"),
        (col("h.st.l") + col("h.st.b")).as("forecast_next_c"))
  }

  /** #251 Top session paths: the k most common opening event-type
    * sequences (first 3 steps) across #16's sessions — the
    * "how do visits actually start" table product analytics reads
    * before designing a funnel (#18 checks ONE hypothesized path;
    * this discovers which paths exist, the empirical input to that
    * hypothesis). Paths use '>' separators and keep shorter sessions
    * as shorter paths, so 1-step bounces rank against 3-step flows.
    *
    * Same sessionization as #16 (30-min gaps, (ts, event_id) total
    * order) in one user_id exchange; the first-3 extraction is a
    * rank filter inside the session (WindowGroupLimit — each map
    * task keeps ≤3 rows per session before any exchange), the path
    * assembly one (user, session)-keyed aggregate, and the top-k a
    * rank-filtered count frame bounded by the type-alphabet³ path
    * space — never by sessions.
    */
  def topPaths(spark: SparkSession, dir: String, steps: Int = 3, topK: Int = 10): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000 * 1000
    val inSession =
      Window.partitionBy("user_id", "session_id").orderBy(col("ts"), col("event_id"))
    val paths = Tables
      .events(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn(
        "is_new",
        (col("prev_ts").isNull || (col("ts") - col("prev_ts") > gapUs)).cast("long"))
      .withColumn(
        "session_id",
        sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("step", row_number().over(inSession))
      .filter(col("step") <= steps)
      .groupBy("user_id", "session_id")
      .agg(
        array_join(expr("transform(array_sort(collect_list(struct(step, event_type))), x -> x.event_type)"), ">")
          .as("path"),
        count(lit(1)).as("n_steps"))
    paths
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"), min("n_steps").as("n_steps"))
      .withColumn(
        "rank",
        row_number()
          .over(Window.orderBy(col("n_sessions").desc, col("path")))
          .cast("long"))
      .filter(col("rank") <= topK)
  }

  /** #252 Two-proportion z-test (A/B test read-out): does order
    * completion rate differ between the BUILDING market segment and
    * the rest? — the experiment-analysis primitive behind every
    * conversion A/B dashboard, computed EXACTLY: z² is a rational in
    * the counts, z² = (c₁n₂ − c₂n₁)²·N div (n₁n₂C(N−C)) with
    * C = c₁+c₂, N = n₁+n₂ (the pooled-variance two-proportion
    * statistic with every float cancelled), published on the e6 grid
    * — compare against 3.841·10⁶ (χ²₁ at 95%) without ever leaving
    * integers. #189's chi² tests a full contingency table; this is
    * the 2×2 one-degree case every experiment actually reads, with
    * the direction sign and both rates alongside.
    *
    * One customer→orders equi-join + a 2-row aggregate + a 1-row
    * projection; cross products run in DECIMAL(38,0) ↔ HUGEINT. The
    * quotient is STAGED — q₁ = d² div (n₁n₂), then z²·10⁶ =
    * q₁·N·10⁶ div (C(N−C)) — because the single-quotient numerator
    * d²·N·10⁶ would overflow DECIMAL(38) near n ≈ 10⁸ per arm while
    * the staged form holds to ~2·10⁹ (d² ≤ (n₁n₂)² is the binding
    * term); the staged formula IS the published contract, replayed
    * verbatim by the oracle, so both engines agree bit-for-bit and
    * the ≤1-ulp-per-stage quantization is defined, not accidental.
    */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val arms = Tables
      .orders(spark, dir)
      .join(
        Tables.customer(spark, dir).select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "o_custkey")
      .select(
        (col("c_mktsegment") === "BUILDING").cast("long").as("arm_a"),
        (col("o_orderstatus") === "F").cast("long").as("conv"))
      .groupBy("arm_a")
      .agg(count(lit(1)).as("n"), sum("conv").as("c"))
    arms
      .agg(
        max(when(col("arm_a") === 1, col("n"))).as("n1"),
        max(when(col("arm_a") === 1, col("c"))).as("c1"),
        max(when(col("arm_a") === 0, col("n"))).as("n2"),
        max(when(col("arm_a") === 0, col("c"))).as("c2"))
      .select(
        col("n1"),
        col("c1"),
        col("n2"),
        col("c2"),
        expr("CAST(c1 * 1000000 div n1 AS BIGINT)").as("rate_a_e6"),
        expr("CAST(c2 * 1000000 div n2 AS BIGINT)").as("rate_b_e6"),
        expr("CAST(CASE WHEN c1 * n2 - c2 * n1 < 0 THEN -1 ELSE 1 END AS BIGINT)")
          .as("direction"),
        expr("""CAST(((CAST(c1 AS DECIMAL(38,0)) * n2 - CAST(c2 AS DECIMAL(38,0)) * n1)
                  * (CAST(c1 AS DECIMAL(38,0)) * n2 - CAST(c2 AS DECIMAL(38,0)) * n1)
                  div (CAST(n1 AS DECIMAL(38,0)) * n2))
                  * (n1 + n2) * 1000000
                 div (CAST(c1 + c2 AS DECIMAL(38,0))
                      * (n1 + n2 - c1 - c2)) AS BIGINT)""").as("z2_e6"))
  }

  /** #264 Rolling-origin forecast backtest: does #250's Holt model
    * actually beat the naive last-value forecast? — the evaluation
    * every forecasting deployment must publish before the model ships
    * (the time-series member of the #238/#244/#245 evaluation
    * family). For each day t ≥ 2 of each series, the one-step-ahead
    * Holt forecast issued at t−1 (level+trend, already a #250
    * column) and the naive forecast (y_{t−1}) are scored against the
    * realized y_t; the deliverable is the exact summed absolute
    * errors, their e6-mean MAEs, and the wins flag. All-integer; one
    * per-series lag window over the calendar-bounded daily frame on
    * top of the #250 fold.
    */
  def forecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    holt(spark, dir)
      .withColumn("prev_forecast", lag("forecast_next_c", 1).over(w))
      .withColumn("prev_cents", lag("cents", 1).over(w))
      .filter(col("prev_forecast").isNotNull)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_evaluated"),
        sum(abs(col("cents") - col("prev_forecast"))).as("holt_sae_c"),
        sum(abs(col("cents") - col("prev_cents"))).as("naive_sae_c"))
      .select(
        col("event_type"),
        col("n_evaluated"),
        col("holt_sae_c"),
        col("naive_sae_c"),
        expr("CAST(holt_sae_c div n_evaluated AS BIGINT)").as("holt_mae_c"),
        expr("CAST(naive_sae_c div n_evaluated AS BIGINT)").as("naive_mae_c"),
        (col("holt_sae_c") < col("naive_sae_c")).cast("long").as("holt_wins"))
  }

  /** #265 Linear gap interpolation: fill the missing calendar days of
    * each event-type daily series by exact integer linear
    * interpolation between the surrounding observations — the
    * imputation rung above #122's LOCF (LOCF freezes the last value
    * through a gap; this draws the line, which is what downstream
    * trend/seasonality fits assume). v(d) = v₀ + (v₁−v₀)(d−d₀) div
    * (d₁−d₀) with the division SIGN-FACTORED (#250's discipline) so
    * falling segments replay identically under Spark's truncating
    * div and DuckDB's flooring //. Gap days come from a bounded
    * `sequence()` explode between consecutive observations (gap
    * lengths are calendar-bounded); observed days pass through with
    * is_interpolated = 0. One per-series lead window, linear.
    */
  def interpolateGaps(spark: SparkSession, dir: String): DataFrame = {
    val nsPerDay = 86400L * 1000000000L
    val daily = Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        expr(s"ts div ${nsPerDay}L").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum("cents").as("c"))
    interpolateDaily(daily)
  }

  /** The #265 interpolation kernel over an (event_type, day, c)
    * frame — separated so the spec can plant gaps (the driver corpus
    * is gap-free at every SF, which exercises only the pass-through
    * path).
    */
  private[graft] def interpolateDaily(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    val withNext = daily
      .withColumn("next_day", lead("day", 1).over(w))
      .withColumn("next_c", lead("c", 1).over(w))
    val observed = withNext.select(
      col("event_type"),
      col("day"),
      col("c").as("cents"),
      lit(0L).as("is_interpolated"))
    val filled = withNext
      .filter(col("next_day").isNotNull && col("next_day") > col("day") + 1)
      .select(
        col("event_type"),
        explode(expr("sequence(day + 1, next_day - 1)")).as("d"),
        col("day"),
        col("c"),
        col("next_day"),
        col("next_c"))
      .select(
        col("event_type"),
        col("d").as("day"),
        expr("""c + (CASE WHEN (next_c - c) * (d - day) < 0
                     THEN -((-((next_c - c) * (d - day))) div (next_day - day))
                     ELSE ((next_c - c) * (d - day)) div (next_day - day) END)""")
          .as("cents"),
        lit(1L).as("is_interpolated"))
    observed.unionAll(filled)
  }

  /** #266 Experiment power analysis: the sample-size table a team
    * reads BEFORE launching the #252 A/B test — for a grid of
    * minimum detectable effects, the required n per arm
    * n = ⌈2·p̄(1−p̄)·(z_α/2+z_β)² / δ²⌉ at α=5%, power=80%. The z
    * constants are PRECOMPUTED e3 integers ((1960+842)² = the #211
    * Benford pattern — no engine-side normal quantiles), the
    * baseline rate p̄ comes from the corpus itself (the realistic
    * workflow: power against the rate you actually observe), and the
    * whole table is exact integer arithmetic: n = ceil-div of
    * 2·c·(t−c)·zsum² by (t²·δ²) after clearing denominators. 1-row
    * aggregate × a broadcast MDE grid; cross products in
    * DECIMAL(38,0) ↔ HUGEINT.
    */
  def powerAnalysis(spark: SparkSession, dir: String, zsumE3: Long = 2802L): DataFrame = {
    // zsumE3 = (z_{0.025} + z_{0.8})·10³ = 1960 + 842 — the caller
    // (SparkEntry) passes the same shared constant the oracle derives
    // its squared value from
    val tot = Tables
      .orders(spark, dir)
      .agg(
        count(lit(1)).as("t"),
        sum((col("o_orderstatus") === "F").cast("long")).as("c"))
    val mdes = spark
      .range(1, 11)
      .select((col("id") * 50L).as("mde_bp")) // 50..500 basis points
    mdes
      .crossJoin(broadcast(tot))
      .select(
        col("mde_bp"),
        expr("CAST(c * 1000000 div t AS BIGINT)").as("baseline_rate_e6"),
        // n = ceil( 2*c*(t-c)*zsum2 * 1e8 / (t^2 * mde_bp^2 * 1e6) )
        // cleared: num = 2*c*(t-c)*zsum2*1e8 ; den = t*t*mde_bp*mde_bp*1e6
        expr(s"""CAST((2 * CAST(c AS DECIMAL(38,0)) * (t - c) * ${zsumE3 * zsumE3}
                   * 100000000
                   + (CAST(t AS DECIMAL(38,0)) * t * mde_bp * mde_bp * 1000000) - 1)
                 div (CAST(t AS DECIMAL(38,0)) * t * mde_bp * mde_bp * 1000000)
                 AS BIGINT)""").as("n_per_arm"))
  }

  /** #267 Peak session concurrency: per day, the maximum number of
    * simultaneously open #16 sessions and the µs instant the peak is
    * first reached — the capacity-planning number (connection pools,
    * seat licenses, autoscaler floors) that neither session COUNTS
    * (#16) nor interval COVERAGE (#230) answers, because concurrency
    * is the running sum of a +1/−1 sweep, not a union length.
    *
    * The sweep needs a GLOBAL time order, built hierarchically: the
    * endpoint stream (+1 at session start, −1 after session end)
    * cumsums inside each CALENDAR day partition, and day-boundary
    * carries come from a ≤#days-row day aggregate — the #232 shard
    * construction with the natural day as the monotone shard key.
    * Tie order (ts, −delta) closes touching sessions before opening
    * new ones at the same µs, the standard half-open convention.
    */
  def peakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val usPerDay = 86400L * 1000000L
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000 * 1000
    val sessions = Tables
      .events(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("ts"), col("event_id"))
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn(
        "is_new",
        (col("prev_ts").isNull || (col("ts") - col("prev_ts") > gapUs)).cast("long"))
      .withColumn(
        "session_id",
        sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("s"), max("ts").as("e"))
    val endpoints = sessions
      .select(col("s").as("ts"), lit(1L).as("delta"))
      .unionAll(sessions.select((col("e") + 1).as("ts"), lit(-1L).as("delta")))
      .withColumn("day", expr(s"ts div ${usPerDay}L"))
      .localCheckpoint(eager = false)
    // (ts, delta) tie order: a −1 end sorts before a +1 start at the
    // same µs, so touching sessions never overlap (half-open + the
    // e+1 shift make ends land strictly after their own last event)
    val wd = Window.partitionBy("day").orderBy(col("ts"), col("delta"))
    val local = endpoints
      .withColumn(
        "run",
        sum("delta").over(wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // the calendar day is the monotone carry key of this hierarchical
    // build: the carry window rides the PER-DAY aggregate, bounded by
    // #calendar-days — a documented PlanDisciplineSpec exception (the
    // bound is data-shape, not plan structure)
    val carry = endpoints
      .select(col("day"), col("delta"))
      .groupBy("day")
      .agg(sum("delta").as("d"))
      .withColumn(
        "off",
        coalesce(
          sum("d").over(Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("day"), col("off"))
    local
      .join(broadcast(carry), "day")
      .withColumn("conc", col("off") + col("run"))
      .groupBy("day")
      .agg(
        max("conc").as("peak_concurrency"),
        max_by(col("ts"), struct(col("conc"), (-col("ts")).as("nts"))).as("peak_first_ts"))
      .select(col("day"), col("peak_concurrency"), col("peak_first_ts"))
  }

  /** #269 New-vs-repeat revenue split: per order month, revenue and
    * order counts split by whether the customer is in their FIRST
    * month or returning — the finance decomposition behind "is
    * growth acquisition or retention" (#240 runs this ledger on
    * USERS; this runs it on DOLLARS, where a handful of returning
    * whales can dominate a month that looks new-heavy by headcount).
    * A customer's whole first MONTH counts as new (the standard
    * monthly-cohort convention — a second order 10 days after the
    * first is not "repeat revenue"). Exact integer months and cents;
    * one per-customer min-month aggregate joined back on the
    * customer key, one month rollup — two linear exchanges.
    */
  def newVsRepeat(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        expr("CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT)")
          .as("m"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val firstM = o.groupBy("o_custkey").agg(min("m").as("m0"))
    o.join(firstM, "o_custkey")
      .withColumn("is_new", (col("m") === col("m0")).cast("long"))
      .groupBy(col("m").as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum("is_new").as("n_new_orders"),
        sum(when(col("is_new") === 1L, col("cents")).otherwise(0L)).as("new_cents"),
        sum(when(col("is_new") === 0L, col("cents")).otherwise(0L)).as("repeat_cents"))
      .withColumn(
        "repeat_share_e6",
        expr("CAST(repeat_cents * 1000000 div greatest(new_cents + repeat_cents, 1) AS BIGINT)"))
  }

  /** #270 DAU/WAU stickiness: per day, daily actives over trailing
    * 7-day actives on the e6 grid — the habit-formation ratio every
    * product review opens with (a 7d-MAU (#193) can grow while
    * stickiness collapses: users visiting once a week). Numerator =
    * one (day, user) distinct; denominator = #193's explode-covered
    * rolling distinct VERBATIM; one join on the calendar-bounded day
    * key. Exact integer quotient — dau ≤ wau by construction, so the
    * ratio lives in (0, 10⁶].
    */
  def stickiness(spark: SparkSession, dir: String): DataFrame = {
    val nsPerDay = 86400L * 1000000000L
    val pres = Tables
      .events(spark, dir)
      .select(expr(s"ts div ${nsPerDay}L").as("day"), col("user_id"))
      .distinct()
      .localCheckpoint(eager = false)
    val dau = pres.groupBy("day").agg(countDistinct("user_id").as("dau"))
    val days = pres.select(col("day").as("target_day")).distinct()
    val wau = pres
      .select(explode(expr("sequence(day, day + 6)")).as("target_day"), col("user_id"))
      .join(days, "target_day")
      .groupBy("target_day")
      .agg(countDistinct("user_id").as("wau_7d"))
    dau
      .join(wau.select(col("target_day").as("day"), col("wau_7d")), "day")
      .select(
        col("day"),
        col("dau"),
        col("wau_7d"),
        expr("CAST(dau * 1000000 div wau_7d AS BIGINT)").as("stickiness_e6"))
  }

  /** #271 Repurchase cycle: each repeat customer's median gap in
    * days between consecutive orders — the CRM cadence number that
    * sets reorder-reminder timing and the churn clock (a customer
    * 3 cycles past their own median is the actionable "overdue"
    * definition, far better than a global 90-day rule). Exact lower
    * discrete median of the per-customer gap list at rank
    * ⌈g/2⌉ under the (gap, order-date) total order — the #106/#161
    * integer machinery; gaps from one per-customer lag window
    * (single custkey exchange), the median from a per-customer rank
    * window on the same exchange. Output one row per repeat
    * customer, plus each customer's last-gap-vs-median overdue
    * ratio.
    */
  def repurchaseCycle(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("d"), col("o_orderkey"))
    val gaps = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("d"))
      .withColumn("prev_d", lag("d", 1).over(w))
      .filter(col("prev_d").isNotNull)
      .select(col("o_custkey"), col("o_orderkey"), col("d"), (col("d") - col("prev_d")).as("gap"))
    val wg = Window.partitionBy("o_custkey").orderBy(col("gap"), col("o_orderkey"))
    val ranked = gaps
      .withColumn("rn", row_number().over(wg).cast("long"))
      .withColumn("g", count(lit(1)).over(Window.partitionBy("o_custkey")))
    val med = ranked
      .filter(col("rn") === expr("(g + 1) div 2"))
      .select(col("o_custkey"), col("g").as("n_gaps"), col("gap").as("median_gap_days"))
    val lastGap = gaps
      .withColumn(
        "rl",
        row_number()
          .over(Window.partitionBy("o_custkey")
            .orderBy(col("d").desc, col("o_orderkey").desc))
          .cast("long"))
      .filter(col("rl") === 1)
      .select(col("o_custkey"), col("gap").as("last_gap_days"))
    med
      .join(lastGap, "o_custkey")
      .withColumn(
        "overdue_ratio_e6",
        expr("CAST(last_gap_days * 1000000 div greatest(median_gap_days, 1) AS BIGINT)"))
  }

  /** #274 Duplicate-payment screen: groups of orders sharing
    * (customer, exact cents, order date) — the first query every
    * payables audit runs (double-submitted invoices, replayed
    * payment batches, fat-fingered resubmissions), and the
    * TRANSACTION-level member of the forensic family beside #211's
    * distribution-level Benford screen. Exact-match grouping is the
    * deliberate contract: cents equality has no tolerance knob to
    * tune or defend. The driver corpus is clean, so duplicates are
    * PLANTED deterministically (every o_orderkey ≡ 0 mod 499
    * re-submitted — the #5 simulated-redelivery precedent, shared
    * verbatim with the oracle), and the spec pins exact recovery.
    * One groupBy + HAVING; the at-risk amount counts every copy
    * BEYOND the first (the legitimate one costs nothing).
    */
  def dupPayments(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        col("o_orderdate").cast("string").as("o_date"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    o.unionAll(o.filter(col("o_orderkey") % 499 === 0))
      .groupBy("o_custkey", "o_date", "cents")
      .agg(count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .withColumn("at_risk_cents", (col("n_copies") - 1) * col("cents"))
  }

  /** #275 Structuring screen: customers whose SAME-DAY orders each
    * sit below an approval threshold while together crossing it —
    * the split-ticket pattern (many small orders instead of one
    * reviewable large one) that procurement-fraud and AML controls
    * both test for; #274 catches identical copies, this catches
    * deliberately NON-identical splits, which is why both exist.
    * Threshold = the corpus's own p90 order value (rank-defined
    * ((n+1)·9) div 10 under the (cents, orderkey) total order, the
    * #106 discrete-percentile machinery — self-calibrating, no magic
    * dollar constant), computed on the hierarchical shard rank. The
    * driver corpus contains no structuring, so the pattern is
    * PLANTED (every o_orderkey ≡ 0 mod 977 re-entered as four
    * same-day quarter-value pieces under offset keys — each piece
    * below the threshold, the four together above it; the #274/#5
    * simulated-input precedent, shared verbatim with the oracle).
    * One (customer, day) aggregate over below-threshold orders.
    */
  def structuring(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val base = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        col("o_orderdate").cast("string").as("o_date"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val planted = base
      .filter(col("o_orderkey") % 977 === 0)
      .select(
        col("o_custkey"),
        explode(expr("sequence(1, 4)")).as("i"),
        col("o_orderkey"),
        col("o_date"),
        col("cents"))
      .select(
        col("o_custkey"),
        (col("o_orderkey") * 10 + col("i") + 100000000L).as("o_orderkey"),
        col("o_date"),
        expr("CASE WHEN i < 4 THEN cents div 4 ELSE cents - 3 * (cents div 4) END")
          .as("cents"))
    val o = base.unionAll(planted).localCheckpoint(eager = false)
    // p90 via hierarchical rank over the distinct-value grid
    val byV = o.groupBy(col("cents").as("v")).agg(count(lit(1)).as("cnt"))
    val bounds = byV.agg(min("v").as("lo"), max("v").as("hi"), sum("cnt").as("n"))
    val sharded = byV
      .crossJoin(broadcast(bounds))
      .withColumn("shard", expr(s"((v - lo) * $nShards) div (hi - lo + 1)"))
      .localCheckpoint(eager = false)
    val wsh = Window.partitionBy("shard").orderBy("v")
    val local = sharded.withColumn(
      "below",
      coalesce(sum("cnt").over(wsh.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val offs = sharded
      .groupBy("shard")
      .agg(sum("cnt").as("c"))
      .withColumn(
        "off",
        coalesce(
          sum("c").over(Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("shard"), col("off"))
    val p90 = local
      .join(broadcast(offs), "shard")
      .withColumn("cum", col("off") + col("below") + col("cnt"))
      .filter(col("cum") >= expr("((n + 1) * 9) div 10"))
      .agg(min("v").as("threshold_cents"))
    o.crossJoin(broadcast(p90))
      .filter(col("cents") < col("threshold_cents"))
      .groupBy("o_custkey", "o_date", "threshold_cents")
      .agg(count(lit(1)).as("n_small_orders"), sum("cents").as("day_total_cents"))
      .filter(col("n_small_orders") >= 3 && col("day_total_cents") >= col("threshold_cents"))
  }

  /** #277 Lag-feature generation: the feature-store frame a
    * forecasting model trains on — per (series, day): the value,
    * lag-1, lag-7, the trailing-7-day sum, and the day-of-week
    * index, every column exact integers. This is the
    * feature-engineering shape (point-in-time-correct lags over an
    * entity×time grid) that leaks when done wrong — here each
    * feature is strictly PAST-ONLY by window construction (lag and a
    * [-7,-1] rows frame), the property a feature store certifies.
    * One per-series sort powers all four features (a single window
    * spec family over one exchange); calendar-bounded frames.
    */
  def lagFeatures(spark: SparkSession, dir: String): DataFrame = {
    val nsPerDay = 86400L * 1000000000L
    val w = Window.partitionBy("event_type").orderBy("day")
    Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        expr(s"ts div ${nsPerDay}L").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum("cents").as("y"))
      .withColumn("lag1", lag("y", 1).over(w))
      .withColumn("lag7", lag("y", 7).over(w))
      .withColumn(
        "trail7_sum",
        coalesce(sum("y").over(w.rowsBetween(-7, -1)), lit(0L)))
      .withColumn("dow", expr("((day % 7) + 7) % 7"))
  }

  /** #278 Leave-one-out target encoding: each order's market segment
    * replaced by the smoothed completion rate of the OTHER orders in
    * that segment — enc = (c_seg − y_i + prior·m) div (n_seg − 1 + m)
    * with smoothing weight m = 20 and the corpus rate as prior — the
    * categorical-feature encoder gradient models actually ship with,
    * where the leave-one-out subtraction is precisely what stops the
    * feature from leaking its own label (the bug naive target
    * encoding always has). All-integer on the e6 grid: the prior
    * term is precomputed as prior_e6·m once, numerators stay in
    * BIGINT. One segment aggregate broadcast back over one scan.
    */
  def targetEncoding(spark: SparkSession, dir: String, m: Int = 20): DataFrame = {
    val o = Tables
      .orders(spark, dir)
      .join(
        Tables.customer(spark, dir).select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "o_custkey")
      .select(
        col("o_orderkey"),
        col("c_mktsegment"),
        (col("o_orderstatus") === "F").cast("long").as("y"))
    val seg = o.groupBy("c_mktsegment").agg(count(lit(1)).as("n_seg"), sum("y").as("c_seg"))
    val prior = o.agg(expr("CAST(sum(y) * 1000000 div count(1) AS BIGINT)").as("prior_e6"))
    o.join(broadcast(seg), "c_mktsegment")
      .crossJoin(broadcast(prior))
      .select(
        col("o_orderkey"),
        col("c_mktsegment"),
        col("y"),
        expr(s"""CAST(((c_seg - y) * 1000000 + prior_e6 * $m)
                  div (n_seg - 1 + $m) AS BIGINT)""").as("enc_e6"))
  }

  /** #279 Feature-hashing collision audit: for hash-table widths
    * D ∈ {256, 1024, 4096}, how many distinct (brand, type)
    * categories collide under the hashing trick — occupied buckets,
    * colliding categories, and the collision rate e6 — the
    * measurement that picks D before a model ships hashed features
    * (the birthday problem, measured on the real category set
    * instead of assumed). Hashing uses the cross-engine hash60
    * (#155 convention) so the oracle replays placement exactly; one
    * distinct-category aggregate, then a 3-width broadcast explode
    * over the CATEGORY frame (vocab-sized, not corpus-sized).
    */
  def hashCollisions(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val cats = Tables
      .part(spark, dir)
      .select(concat_ws("|", col("p_brand"), col("p_type")).as("cat"))
      .distinct()
      .localCheckpoint(eager = false)
    val widths = Seq(256L, 1024L, 4096L)
    import spark.implicits._
    val wdf = widths.toDF("width")
    cats
      .crossJoin(broadcast(wdf))
      .select(
        col("width"),
        pmod(Dedup.hash60(concat(lit("graft-fh-1:"), col("cat"))), col("width")).as("b"))
      .groupBy("width", "b")
      .agg(count(lit(1)).as("n_in_bucket"))
      .groupBy("width")
      .agg(
        sum("n_in_bucket").as("n_categories"),
        count(lit(1)).as("n_occupied"),
        sum(when(col("n_in_bucket") > 1, col("n_in_bucket")).otherwise(0L))
          .as("n_colliding"))
      .withColumn(
        "collision_rate_e6",
        expr("CAST(n_colliding * 1000000 div n_categories AS BIGINT)"))
  }

  /** #281 Catalog breadth: per order month — parts actively sold,
    * parts sold for the FIRST time, and the cumulative distinct
    * catalog — the assortment-growth triple merchandising reads
    * beside #269's revenue split (#269 says whether dollars are new;
    * this says whether the CATALOG is, and a flat cumulative curve
    * under growing active counts is concentration, not expansion).
    * First-sale month per part from one min-aggregate; cumulative
    * catalog = running sum of first-sales over the CALENDAR-bounded
    * month frame (the #210 day-cumsum discipline, month-grained);
    * active counts one (month, part) distinct. All exact integers.
    */
  def catalogBreadth(spark: SparkSession, dir: String): DataFrame = {
    val mp = Tables
      .lineitem(spark, dir)
      .join(
        Tables.orders(spark, dir).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        "l_orderkey")
      .select(
        // the calendar month is the monotone carry key: the cumsum
        // window rides the PER-MONTH aggregate, bounded by
        // #calendar-months — a documented PlanDisciplineSpec exception
        expr("CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT)")
          .as("month"),
        col("l_partkey"))
      .distinct()
      .localCheckpoint(eager = false)
    val active = mp.groupBy("month").agg(count(lit(1)).as("n_active_parts"))
    val firstSale = mp.groupBy("l_partkey").agg(min("month").as("month"))
    val news = firstSale.groupBy("month").agg(count(lit(1)).as("n_new_parts"))
    // complete the month frame FIRST (zero-new months included), then
    // cumsum — so no-new months inherit the running catalog naturally
    active
      .join(news, Seq("month"), "left")
      .select(
        col("month"),
        col("n_active_parts"),
        coalesce(col("n_new_parts"), lit(0L)).as("n_new_parts"))
      .withColumn(
        "cum_catalog",
        sum("n_new_parts").over(
          Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)))
      .select(
        col("month"),
        col("n_active_parts"),
        col("n_new_parts"),
        col("cum_catalog"))
  }

  /** #282 Ship-delay percentiles: per order priority — exact lower
    * discrete p50 and p90 of the order→ship delay in days, plus the
    * late-order share beyond 60 days — the SLA table an operations
    * review reads per service class (#111 counts late orders; this
    * shows the whole delay DISTRIBUTION per priority, where a fine
    * p50 with a fat p90 is precisely the story a mean hides). The
    * #106 rank-defined percentile machinery per priority: rank =
    * ⌈n/2⌉ and ⌈9n/10⌉ under the (delay, orderkey, linenumber)
    * total order, one priority-partitioned window — never global.
    */
  def shipDelay(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables
      .lineitem(spark, dir)
      .join(
        Tables
          .orders(spark, dir)
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        "l_orderkey")
      .select(
        col("o_orderpriority").as("priority"),
        col("l_orderkey"),
        col("l_linenumber"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE)) AS BIGINT)")
          .as("delay"))
    val w = Window.partitionBy("priority").orderBy(col("delay"), col("l_orderkey"), col("l_linenumber"))
    val ranked = d
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("priority")))
    ranked
      .groupBy("priority")
      .agg(
        max("n").as("n_lines"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("delay"))).as("p50_days"),
        max(when(col("rn") === expr("((n * 9) + 9) div 10"), col("delay"))).as("p90_days"),
        sum((col("delay") > 60).cast("long")).as("n_late"))
      .withColumn(
        "late_share_e6",
        expr("CAST(n_late * 1000000 div n_lines AS BIGINT)"))
  }

  /** #253 Markov stationary distribution: the long-run occupancy of
    * #174's event-type transition matrix — "where does the user
    * process asymptotically spend its time", the one-vector summary
    * that turns the transition table into a forecast (and the
    * discrete cousin of #124's PageRank without teleport). Exact
    * integer power iteration on the e6 grid: π₀ uniform, each round
    * π'(j) = Σᵢ π(i)·c(i,j) div c(i,·) — the same div-per-edge
    * contribution algebra as #124/#227/#247, so the 3-round
    * trajectory replays bit-exactly as unrolled CTEs. The matrix is
    * ALPHABET-bounded (types² cells): rounds are joins on a
    * broadcast-size frame, and the one data-scale pass is #174's
    * single user_id exchange building the counts.
    */
  def markovStationary(spark: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = Tables
      .events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
      .localCheckpoint(eager = false)
    val edges = trans
      .join(trans.groupBy("from_type").agg(sum("n_trans").as("n_from")), "from_type")
    val states = trans
      .select(col("from_type").as("state"))
      .unionAll(trans.select(col("to_type").as("state")))
      .distinct()
      .localCheckpoint(eager = false)
    val nDf = states.agg(count(lit(1)).as("k"))
    var pi = states
      .crossJoin(broadcast(nDf))
      .select(col("state"), expr("CAST(1000000 div k AS BIGINT)").as("pi_e6"))
    for (_ <- 1 to iters) {
      pi = states
        .join(
          edges
            .join(pi.select(col("state").as("from_type"), col("pi_e6")), "from_type")
            .select(col("to_type").as("state"), expr("pi_e6 * n_trans div n_from").as("c"))
            .groupBy("state")
            .agg(sum("c").as("p")),
          Seq("state"),
          "left")
        .select(col("state"), coalesce(col("p"), lit(0L)).as("pi_e6"))
    }
    pi.select(col("state"), col("pi_e6"))
  }

  /** #254 p-chart control limits (statistical process control): per
    * day, is the order-completion rate outside the ±3σ band around
    * the corpus rate? The Shewhart attribute chart ops teams run on
    * conversion/defect streams — and computable EXACTLY with no
    * square root: the 3σ test (p_d − p̄)² > 9·p̄(1−p̄)/n_d multiplies
    * out to (c_d·T − C·n_d)² > 9·C·(T−C)·n_d on the integer grid
    * (c_d, n_d per day; C, T corpus totals), so the flag, the
    * squared deviation, and the squared limit are all exact BIGINTs
    * — the #226 isqrt clamp isn't even needed when the INEQUALITY is
    * the deliverable. One day-keyed aggregate + a 1-row totals
    * broadcast; cross products in DECIMAL(38,0) ↔ HUGEINT.
    */
  def controlChart(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"),
        (col("o_orderstatus") === "F").cast("long").as("conv"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_d"), sum("conv").as("c_d"))
    val tot = byDay.agg(sum("n_d").as("t"), sum("c_d").as("ctot"))
    byDay
      .crossJoin(broadcast(tot))
      .select(
        col("day"),
        col("n_d"),
        col("c_d"),
        expr("CAST(c_d * 1000000 div n_d AS BIGINT)").as("rate_e6"),
        expr("""CAST((CAST(c_d AS DECIMAL(38,0)) * t - CAST(ctot AS DECIMAL(38,0)) * n_d)
                  * (CAST(c_d AS DECIMAL(38,0)) * t - CAST(ctot AS DECIMAL(38,0)) * n_d)
                 AS DECIMAL(38,0))""").as("dev_sq"),
        expr("CAST(9 * CAST(ctot AS DECIMAL(38,0)) * (t - ctot) * n_d AS DECIMAL(38,0))")
          .as("limit_sq"))
      .select(
        col("day"),
        col("n_d"),
        col("c_d"),
        col("rate_e6"),
        (col("dev_sq") > col("limit_sq")).cast("long").as("out_of_control"),
        // e6 ratio of squared deviation to squared limit: >1e6 = violation
        expr("CAST(dev_sq * 1000000 div limit_sq AS BIGINT)").as("dev_ratio_e6"))
  }

  /** #283 Link prediction by common neighbors: the non-adjacent
    * co-purchase pairs most likely to become edges — "parts never yet
    * bought together whose neighborhoods already overlap", the
    * assortment-recommendation read beside #179's realized-pair lift
    * (#179 ranks edges that EXIST; this ranks the holes). Score =
    * overlap Jaccard on the e6 grid: cn·10⁶ div (dx + dy − cn).
    *
    * Candidate generation enumerates wedges by CENTER, and caps the
    * center degree (≤ maxCenterDeg): a hub center contributes deg²
    * wedge fan-out but vanishing per-pair evidence (every pair shares
    * the bestseller), so the cap is both the scale bound — wedge
    * volume ≤ |E|·D instead of Σdeg² — and the standard
    * signal-quality move; the cap is part of the operator contract
    * and the oracle replays it. Endpoint degrees stay UNCAPPED. Edges
    * come from the #89 basket² explode; existing edges leave via one
    * LeftAnti; top-k is a TakeOrdered on the (score, cn, pair) total
    * order — map-side bounded, no global window.
    */
  /** Link-prediction contract constants — shared with the
    * q_link_prediction oracle builder so the replay can't drift.
    */
  val LinkPredMinOrders = 2
  val LinkPredMaxCenterDeg = 64
  val LinkPredTopK = 100

  def linkPrediction(
      spark: SparkSession,
      dir: String,
      minOrders: Int = LinkPredMinOrders,
      maxCenterDeg: Int = LinkPredMaxCenterDeg,
      topK: Int = LinkPredTopK): DataFrame = {
    val baskets = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set("l_partkey")).as("parts"))
    val e = baskets
      .select(
        explode(
          expr(
            """flatten(transform(parts, (x, i) ->
                 transform(slice(parts, i + 2, size(parts)),
                   y -> named_struct('pa', x, 'pb', y))))"""))
          .as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minOrders)
      .select("pa", "pb")
      .localCheckpoint(eager = false)
    val deg = e
      .select(col("pa").as("node"))
      .unionAll(e.select(col("pb").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("deg"))
    val adj = e
      .select(col("pa").as("u"), col("pb").as("v"))
      .unionAll(e.select(col("pb").as("u"), col("pa").as("v")))
      .join(
        deg.filter(col("deg") <= maxCenterDeg).select(col("node").as("u")),
        Seq("u"),
        "left_semi")
    val cn = adj
      .join(adj.select(col("u"), col("v").as("w")), Seq("u"))
      .filter(col("v") < col("w"))
      .groupBy(col("v").as("pa"), col("w").as("pb"))
      .agg(count(lit(1)).as("cn"))
      .join(e, Seq("pa", "pb"), "left_anti")
    cn.join(deg.select(col("node").as("pa"), col("deg").as("deg_a")), "pa")
      .join(deg.select(col("node").as("pb"), col("deg").as("deg_b")), "pb")
      .select(
        col("pa"),
        col("pb"),
        col("cn"),
        col("deg_a"),
        col("deg_b"),
        expr("CAST(cn * 1000000 div (deg_a + deg_b - cn) AS BIGINT)").as("jaccard_e6"))
      .orderBy(col("jaccard_e6").desc, col("cn").desc, col("pa"), col("pb"))
      .limit(topK)
  }

  /** #284 CUSUM drift chart: per day, the one-sided cumulative-sum
    * statistics C⁺/C⁻ of daily order revenue against the corpus mean
    * — the SPC chart that catches SUSTAINED small shifts the #254
    * p-chart's per-point 3σ test is blind to (ten days each 1σ high
    * never trip Shewhart; their accumulated sum trips CUSUM). Exact
    * without any recursion: C⁺_i = S_i − min_{j≤i} S_j and C⁻_i =
    * max_{j≤i} S_j − S_i where S is the prefix sum of (x_i − μ) with
    * S₀ = 0 — the recursive max(0, ·) fold has this closed form, so
    * two calendar-frame windows (cumsum + running extrema) over the
    * day-keyed aggregate replace any sequential pass. Threshold h =
    * 4σ of the daily series (the common CUSUM h ≈ 4–5σ), with σ via
    * the #226 one-ulp-clamp exact integer sqrt of the population
    * variance, moments in DECIMAL(38,0). The cumulative windows ride
    * the PER-DAY aggregate (≤ #calendar-days rows — a documented
    * PlanDisciplineSpec exception); all arithmetic whole cents.
    */
  def cusumChart(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("day")
      .agg(sum("c").as("x"))
    val tot = byDay.agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
    val mu = tot
      .select(
        col("n"),
        expr("sx div n").as("mu"),
        // population variance on the cents grid, DECIMAL cross products
        expr("""CAST((CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx)
                 div (CAST(n AS DECIMAL(38,0)) * n) AS DECIMAL(38,0))""").as("var_c"))
      .select(
        col("mu"),
        expr("CAST(floor(sqrt(CAST(var_c AS DOUBLE))) AS BIGINT)").as("s0"),
        col("var_c"))
      .select(
        col("mu"),
        expr("""s0 + (CASE WHEN (CAST(s0 AS DECIMAL(38,0)) + 1) * (s0 + 1) <= var_c THEN 1 ELSE 0 END)
                   - (CASE WHEN CAST(s0 AS DECIMAL(38,0)) * s0 > var_c THEN 1 ELSE 0 END)""")
          .as("sigma"))
    val wCum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    byDay
      .crossJoin(broadcast(mu))
      .withColumn("s", sum(col("x") - col("mu")).over(wCum))
      .withColumn("min_s", least(min("s").over(wCum), lit(0L)))
      .withColumn("max_s", greatest(max("s").over(wCum), lit(0L)))
      .select(
        col("day"),
        col("x").as("rev_cents"),
        (col("s") - col("min_s")).as("c_plus"),
        (col("max_s") - col("s")).as("c_minus"),
        (lit(4L) * col("sigma")).as("h_cents"),
        ((col("s") - col("min_s")) > lit(4L) * col("sigma")).cast("long").as("alarm_high"),
        ((col("max_s") - col("s")) > lit(4L) * col("sigma")).cast("long").as("alarm_low"))
  }

  /** #285 Lorenz curve by customer decile: the 10-point cumulative
    * revenue-share curve under #180's Gini — the deck-ready "bottom
    * 50% of customers contribute x%" table (Gini integrates this
    * curve to one number; auditors want the points). Deciles are
    * rank-defined, ((i−1)·10) div n under the (spend, custkey) total
    * order, with the global rank built hierarchically (#180's
    * monotone value-range shard + offsets — no single-partition data
    * window); the only unpartitioned windows ride the 8-row shard
    * offsets and the 10-row decile frame. Cumulative share runs
    * through DECIMAL(38,0) (cum_cents·10⁶ exceeds 2⁶³ at corpus
    * scale), exact in both engines.
    */
  def lorenzCurve(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val per = Tables
      .orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("x"))
    val bounds = per.agg(min("x").as("lo"), max("x").as("hi"))
    val sharded = per
      .crossJoin(broadcast(bounds))
      .withColumn("shard", expr(s"((x - lo) * $nShards) div (hi - lo + 1)"))
    val local = sharded.withColumn(
      "rn",
      row_number()
        .over(Window.partitionBy("shard").orderBy(col("x"), col("o_custkey")))
        .cast("long"))
    val offsets = sharded
      .groupBy("shard")
      .agg(count(lit(1)).as("c"))
      .withColumn(
        "off",
        coalesce(
          sum("c").over(Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("shard"), col("off"))
    val tot = per.agg(count(lit(1)).as("n"), sum("x").as("total_cents"))
    val deciles = local
      .join(broadcast(offsets), "shard")
      .crossJoin(broadcast(tot))
      .select(expr("((off + rn - 1) * 10) div n").as("decile"), col("x"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"), sum("x").as("decile_cents"))
    deciles
      .withColumn(
        "cum_cents",
        sum("decile_cents").over(
          Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot.select(col("total_cents"))))
      .select(
        col("decile"),
        col("n_customers"),
        col("decile_cents"),
        col("cum_cents"),
        expr("""CAST(CAST(cum_cents AS DECIMAL(38,0)) * 1000000
                 div CAST(total_cents AS DECIMAL(38,0)) AS BIGINT)""").as("cum_share_e6"))
  }

  /** #286 Promo diff-in-differences: the two-period × two-group
    * causal read-out — did PROMO parts' mean line revenue move
    * differently across the corpus midpoint than non-promo parts'?
    * The #233/#245 evaluation discipline applied to an intervention:
    * the control group's drift is the counterfactual, so
    * did = (T̄₂−T̄₁) − (C̄₂−C̄₁) isolates the treatment delta from
    * the common trend a naive before/after comparison absorbs. The
    * period split is data-derived (midpoint of the order-date span,
    * integer div — deterministic, no config date); means are floor
    * divisions on the cents grid; one broadcast bounds row + one
    * 4-cell aggregate folded to a single row, linear, no windows.
    */
  def diffInDiff(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables
      .lineitem(spark, dir)
      .join(
        Tables
          .orders(spark, dir)
          .select(
            col("o_orderkey").as("l_orderkey"),
            expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
              .as("day")),
        "l_orderkey")
      .join(
        broadcast(
          Tables
            .part(spark, dir)
            .select(
              col("p_partkey").as("l_partkey"),
              col("p_type").startsWith("PROMO").cast("long").as("treated"))),
        "l_partkey")
      .select(
        col("treated"),
        col("day"),
        expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)")
          .as("c"))
    val split = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"))
      .agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
    lines
      .crossJoin(broadcast(split))
      .select(col("treated"), (col("day") >= col("mid")).cast("long").as("period"), col("c"))
      .agg(
        sum(when(col("treated") === 1 && col("period") === 0, col("c"))).as("s_t0"),
        count(when(col("treated") === 1 && col("period") === 0, 1)).as("n_t0"),
        sum(when(col("treated") === 1 && col("period") === 1, col("c"))).as("s_t1"),
        count(when(col("treated") === 1 && col("period") === 1, 1)).as("n_t1"),
        sum(when(col("treated") === 0 && col("period") === 0, col("c"))).as("s_c0"),
        count(when(col("treated") === 0 && col("period") === 0, 1)).as("n_c0"),
        sum(when(col("treated") === 0 && col("period") === 1, col("c"))).as("s_c1"),
        count(when(col("treated") === 0 && col("period") === 1, 1)).as("n_c1"))
      .select(
        col("n_t0"),
        col("n_t1"),
        col("n_c0"),
        col("n_c1"),
        expr("s_t0 div n_t0").as("mean_t0_cents"),
        expr("s_t1 div n_t1").as("mean_t1_cents"),
        expr("s_c0 div n_c0").as("mean_c0_cents"),
        expr("s_c1 div n_c1").as("mean_c1_cents"))
      .withColumn(
        "did_cents",
        (col("mean_t1_cents") - col("mean_t0_cents"))
          - (col("mean_c1_cents") - col("mean_c0_cents")))
  }

  /** #288 Mann–Whitney U rank-sum test: do PROMO parts' line revenues
    * come from a different distribution than non-promo — the
    * NONPARAMETRIC companion to #286's difference of means (DiD moves
    * with outliers; rank-sum only with order). Everything integer:
    * midranks with ties live on the DOUBLED grid (2·midrank =
    * 2·cum_below + t + 1 — always a whole number), so U₁ ships as
    * u1_2x; effect size is the common-language CL = U₁/(n₁n₂) on e6
    * (P(random treated > random control)); z uses the tie-corrected
    * variance Var = n₁n₂((n+1)n(n−1) − Σ(t³−t)) / (12n(n−1)) with
    * cross products in DECIMAL(38,0) and σ via the #226 one-ulp-clamp
    * isqrt (divide A by B FIRST — the quotient ~n₁n₂(n+1)/12 keeps
    * √ inside the double-exactness domain through ~1000× this
    * corpus); z's sign is extracted before the div so truncation
    * semantics can't differ across engines. The global value rank is
    * the #180 hierarchical build (monotone value-range shard +
    * offsets) over the per-VALUE aggregate — ties collapse before any
    * window, so the windows ride |distinct values|, not rows.
    */
  /** The doubled-midrank promo-vs-rest U frame shared by #288 (which
    * adds the tie-corrected z) and #339 Cliff's delta (which reads the
    * effect size straight off U): 1 row (n1, n2, n, u1_2x, tie_t).
    */
  private def promoRankAgg(spark: SparkSession, dir: String, nShards: Int): DataFrame = {
    val lines = Tables
      .lineitem(spark, dir)
      .join(
        broadcast(
          Tables
            .part(spark, dir)
            .select(
              col("p_partkey").as("l_partkey"),
              col("p_type").startsWith("PROMO").cast("long").as("t"))),
        "l_partkey")
      .select(
        col("t"),
        expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)")
          .as("c"))
    val byVal = lines.groupBy("c").agg(count(lit(1)).as("cnt"), sum("t").as("cnt1"))
    val bounds = byVal.agg(min("c").as("lo"), max("c").as("hi"))
    val sharded = byVal
      .crossJoin(broadcast(bounds))
      .withColumn("shard", expr(s"((c - lo) * $nShards) div (hi - lo + 1)"))
    val offsets = sharded
      .groupBy("shard")
      .agg(sum("cnt").as("sc"))
      .withColumn(
        "off",
        coalesce(
          sum("sc").over(Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("shard"), col("off"))
    val cum = sharded
      .withColumn(
        "cum_local",
        coalesce(
          sum("cnt").over(
            Window.partitionBy("shard").orderBy("c").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .join(broadcast(offsets), "shard")
      .select(col("c"), col("cnt"), col("cnt1"), (col("off") + col("cum_local")).as("cum"))
    cum
      .agg(
        sum("cnt").as("n"),
        sum("cnt1").as("n1"),
        sum(expr("cnt1 * (2 * cum + cnt + 1)")).as("r1_2x"),
        sum(expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt")).as("tie_t"))
      .select(
        col("n1"),
        (col("n") - col("n1")).as("n2"),
        col("n"),
        (col("r1_2x") - col("n1") * (col("n1") + 1)).as("u1_2x"),
        col("tie_t"))
  }

  def mannWhitney(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    promoRankAgg(spark, dir, nShards)
      .withColumn(
        "cl_e6",
        expr("""CAST(CAST(u1_2x AS DECIMAL(38,0)) * 1000000
                 div (2 * CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)"""))
      .withColumn(
        "var_u",
        expr("""CAST(CAST(n1 AS DECIMAL(38,0)) * n2 *
                  (CAST(n + 1 AS DECIMAL(38,0)) * n * (n - 1) - tie_t)
                 div (12 * CAST(n AS DECIMAL(38,0)) * (n - 1)) AS DECIMAL(38,0))"""))
      .withColumn("s0", expr("CAST(floor(sqrt(CAST(var_u AS DOUBLE))) AS BIGINT)"))
      .withColumn(
        "sigma",
        expr("""s0 + (CASE WHEN (CAST(s0 AS DECIMAL(38,0)) + 1) * (s0 + 1) <= var_u THEN 1 ELSE 0 END)
                   - (CASE WHEN CAST(s0 AS DECIMAL(38,0)) * s0 > var_u THEN 1 ELSE 0 END)"""))
      .select(
        col("n1"),
        col("n2"),
        col("u1_2x"),
        col("cl_e6"),
        expr("""CAST(CASE WHEN u1_2x >= n1 * n2 THEN 1 ELSE -1 END
                 * (abs(CAST(u1_2x AS DECIMAL(38,0)) - CAST(n1 AS DECIMAL(38,0)) * n2) * 1000000
                    div (2 * sigma)) AS BIGINT)""").as("z_e6"))
  }

  /** #289 Wald–Wolfowitz runs test: is daily revenue's above/below-
    * median sequence RANDOM, or does it trend/cycle — the
    * sequential-independence screen beside #284 (CUSUM asks "did the
    * level shift"; runs asks "is the ordering itself non-random" —
    * too FEW runs = persistence/trend, too many = oscillation).
    * Median is the #106 rank-defined lower median over the day frame;
    * equal-to-median days drop (the standard convention); R counts
    * sign changes + 1 via one lag over the day order. Exact z with no
    * float: z = N div √(A div B) with N = R·n − n − 2n₁n₀,
    * A = 2n₁n₀(2n₁n₀−n), B = n−1 (the n² in Var's denominator cancels
    * into N), σ via the one-ulp-clamp isqrt, sign extracted before
    * the div. Every unpartitioned window rides the PER-DAY aggregate
    * (≤ #calendar-days rows) — a documented PlanDisciplineSpec
    * exception with an exact instance count.
    */
  def runsTest(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("day")
      .agg(sum("c").as("x"))
    val withMed = byDay
      .withColumn("rn", row_number().over(Window.orderBy(col("x"), col("day"))).cast("long"))
      .withColumn("nn", count(lit(1)).over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val med = withMed
      .agg(max(when(col("rn") === expr("(nn + 1) div 2"), col("x"))).as("med"))
    val signs = byDay
      .crossJoin(broadcast(med))
      .filter(col("x") =!= col("med"))
      .select(col("day"), (col("x") > col("med")).cast("long").as("s"))
      .withColumn("prev", lag("s", 1).over(Window.orderBy("day")))
      .select(
        col("s"),
        when(col("prev").isNull || col("prev") =!= col("s"), 1L).otherwise(0L).as("chg"))
    signs
      .agg(count(lit(1)).as("n"), sum("s").as("n1"), sum("chg").as("runs"))
      .crossJoin(broadcast(med))
      .select(
        col("n").as("n_days_used"),
        col("n1").as("n_above"),
        (col("n") - col("n1")).as("n_below"),
        col("med").as("median_cents"),
        col("runs"),
        expr("CAST(1000000 + 2 * n1 * (n - n1) * 1000000 div n AS BIGINT)").as("mu_e6"))
      .withColumn(
        "q",
        expr("2 * n_above * n_below * (2 * n_above * n_below - n_days_used) div (n_days_used - 1)"))
      .withColumn("s0", expr("CAST(floor(sqrt(CAST(q AS DOUBLE))) AS BIGINT)"))
      .withColumn(
        "sigma",
        expr("""s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= q THEN 1 ELSE 0 END)
                   - (CASE WHEN s0 * s0 > q THEN 1 ELSE 0 END)"""))
      .select(
        col("n_days_used"),
        col("n_above"),
        col("n_below"),
        col("median_cents"),
        col("runs"),
        col("mu_e6"),
        expr("""CAST(CASE WHEN runs * n_days_used - n_days_used - 2 * n_above * n_below >= 0
                    THEN 1 ELSE -1 END
                 * (abs(runs * n_days_used - n_days_used - 2 * n_above * n_below) * 1000000
                    div sigma) AS BIGINT)""").as("z_e6"))
  }

  /** #290 Day-of-week seasonality profile: per weekday, observed
    * days, revenue, floor-mean daily revenue, and the seasonal index
    * e6 vs the overall daily mean — the 7-row multiplicative profile
    * ops dashboards key staffing and campaign timing on, and the
    * descriptive companion to #221's seasonal decomposition (that
    * fits a model; this is the raw profile a reviewer sanity-checks
    * it against). Weekday from pure epoch-day arithmetic,
    * pmod(day+3, 7) with 0 = Monday — no engine dayofweek()
    * convention to disagree on. One day-keyed aggregate + one 7-row
    * rollup; index through DECIMAL(38,0).
    */
  /** #292 Holt–Winters additive triple smoothing per event-type daily
    * series: level + trend + a 7-slot weekly seasonal state — the
    * seasonal rung above #250's Holt (level+trend) and the
    * state-space counterpart of #221's decomposition, with the same
    * dyadic α = β = γ = ¼ and sign-factored truncating quarters so
    * Spark's `div` and DuckDB's `//` replay the identical integer
    * trajectory through negative states. The seasonal slot is indexed
    * by CALENDAR day-of-week (day mod 7), not step order, so day gaps
    * don't shear the season. Fold is sequential by definition; the
    * step table is calendar-bounded, so it runs inside one collected
    * array scalar per series (the #250/#234 bounded-model-state
    * pattern), seasonal state carried as a 7-element array rebuilt by
    * slice concatenation. Forecast = l + b + s[(day+1) mod 7] from
    * the post-update state.
    */
  def holtWinters(spark: SparkSession, dir: String): DataFrame = {
    val nsPerDay = 86400L * 1000000000L
    def q(a: String) = s"(CASE WHEN ($a) < 0 THEN -((-($a)) div 4) ELSE ($a) div 4 END)"
    val sOld = "element_at(acc.s, CAST(s.day % 7 AS INT) + 1)"
    val newL = q(s"(s.y - $sOld) + 3 * (acc.l + acc.b)")
    val newB = q(s"($newL - acc.l) + 3 * acc.b")
    val slot = q(s"(s.y - $newL) + 3 * $sOld")
    val daily = Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        expr(s"ts div ${nsPerDay}L").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum("cents").as("y"))
    daily
      .groupBy("event_type")
      .agg(expr("sort_array(collect_list(named_struct('day', day, 'y', y)))").as("steps"))
      .select(
        col("event_type"),
        explode(
          expr(s"""transform(steps, (x, i) -> named_struct(
                     'day', x.day, 'cents', x.y,
                     'st', aggregate(slice(steps, 2, i),
                             named_struct(
                               'l', element_at(steps, 1).y, 'b', 0L,
                               's', array(0L, 0L, 0L, 0L, 0L, 0L, 0L)),
                             (acc, s) -> named_struct(
                               'l', $newL,
                               'b', $newB,
                               's', concat(
                                 slice(acc.s, 1, CAST(s.day % 7 AS INT)),
                                 array($slot),
                                 slice(acc.s, CAST(s.day % 7 AS INT) + 2,
                                   6 - CAST(s.day % 7 AS INT)))))))"""))
          .as("h"))
      .select(
        col("event_type"),
        col("h.day").as("day"),
        col("h.cents").as("cents"),
        col("h.st.l").as("level_c"),
        col("h.st.b").as("trend_c"),
        expr("element_at(h.st.s, CAST(h.day % 7 AS INT) + 1)").as("season_c"),
        expr("h.st.l + h.st.b + element_at(h.st.s, CAST((h.day + 1) % 7 AS INT) + 1)")
          .as("forecast_next_c"))
  }

  /** #293 ABC class migration matrix: each part's revenue class
    * (#191's 80/95 cumulative-share A/B/C, or '-' when unsold) in the
    * first vs second half of the corpus, as a 4×4 transition matrix
    * with part counts and second-half revenue — the assortment-drift
    * read-out planners run quarter over quarter (#257 crosses ABC
    * with variability at one point in time; this shows the CLASS
    * ITSELF moving, "what was A and is now C"). The period split is
    * the #286 data-derived midpoint; within each period the class is
    * the #191 hierarchical cumulative-share build verbatim (reverse
    * value-range shard + offsets, share through DECIMAL(38,0)) — two
    * bounded-window builds + one full-outer join at part cardinality
    * + a ≤16-row rollup.
    */
  def abcMigration(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val lines = Tables
      .lineitem(spark, dir)
      .join(
        Tables
          .orders(spark, dir)
          .select(
            col("o_orderkey").as("l_orderkey"),
            expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
              .as("day")),
        "l_orderkey")
      .select(
        col("l_partkey"),
        col("day"),
        expr("CAST(floor(l_extendedprice * (1.0d - l_discount)) AS BIGINT)").as("r"))
    val split = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"))
      .agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
    val withPeriod = lines
      .crossJoin(broadcast(split))
      .select(col("l_partkey"), (col("day") >= col("mid")).cast("long").as("period"), col("r"))
      .localCheckpoint(eager = false)
    def classify(period: Long): DataFrame = {
      val rev = withPeriod
        .filter(col("period") === period)
        .groupBy("l_partkey")
        .agg(sum("r").as("rev"))
      val bounds = rev.agg(min("rev").as("lo"), max("rev").as("hi"))
      val sharded = rev
        .crossJoin(broadcast(bounds))
        .withColumn("shard", expr(s"((hi - rev) * $nShards) div (hi - lo + 1)"))
      val ws = Window.partitionBy("shard").orderBy(col("rev").desc, col("l_partkey"))
      val offsets = sharded
        .groupBy("shard")
        .agg(sum("rev").as("s"))
        .withColumn(
          "roff",
          coalesce(
            sum("s").over(Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
        .select(col("shard"), col("roff"))
      val tot = rev.agg(sum("rev").as("t"))
      sharded
        .withColumn("csum", sum("rev").over(ws))
        .join(broadcast(offsets), "shard")
        .crossJoin(broadcast(tot))
        .withColumn(
          "share_e6",
          expr("CAST((CAST(roff + csum AS DECIMAL(38,0)) * 1000000) div t AS BIGINT)"))
        .select(
          col("l_partkey"),
          when(col("share_e6") <= 800000, "A")
            .when(col("share_e6") <= 950000, "B")
            .otherwise("C")
            .as(s"class_p$period"),
          col("rev").as(s"rev_p$period"))
    }
    classify(0L)
      .join(classify(1L), Seq("l_partkey"), "full_outer")
      .select(
        coalesce(col("class_p0"), lit("-")).as("class_before"),
        coalesce(col("class_p1"), lit("-")).as("class_after"),
        coalesce(col("rev_p1"), lit(0L)).as("r1"))
      .groupBy("class_before", "class_after")
      .agg(count(lit(1)).as("n_parts"), sum("r1").as("after_revenue_usd"))
  }

  /** #294 Vintage revenue ramp: mean revenue per part-month by part
    * AGE (months since first sale) — the cold-start curve that says
    * how fast a new catalog item ramps to steady state, the
    * longitudinal companion to #281 (breadth counts new parts; this
    * tracks what a part EARNS in its nth month of life, the basis of
    * new-item forecasting baselines). Age from one min-aggregate
    * joined back at (part, month) grain; one ≤#months-row rollup.
    * All exact: whole-dollar revenue, floor-division means.
    */
  def vintageRamp(spark: SparkSession, dir: String): DataFrame = {
    val pm = Tables
      .lineitem(spark, dir)
      .join(
        Tables
          .orders(spark, dir)
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        "l_orderkey")
      .select(
        col("l_partkey"),
        expr("CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT)")
          .as("m"),
        expr("CAST(floor(l_extendedprice * (1.0d - l_discount)) AS BIGINT)").as("r"))
      .groupBy("l_partkey", "m")
      .agg(sum("r").as("rev"))
      .localCheckpoint(eager = false)
    val first = pm.groupBy("l_partkey").agg(min("m").as("m0"))
    pm.join(first, "l_partkey")
      .select((col("m") - col("m0")).as("age_months"), col("rev"))
      .groupBy("age_months")
      .agg(count(lit(1)).as("n_part_months"), sum("rev").as("revenue_usd"))
      .withColumn("mean_usd", expr("revenue_usd div n_part_months"))
  }

  /** #295 Monthly revenue bands: per calendar month, exact
    * rank-defined p25/p50/p75 of DAILY revenue — the banded seasonal
    * chart behind #290's weekday profile (that averages per weekday;
    * this shows each month's daily spread, where a widening p25–p75
    * band flags volatility a monthly total hides). The #106 lower
    * percentile machinery per month partition: rank ⌈n/4⌉, ⌈n/2⌉,
    * ⌈3n/4⌉ under the (value, day) total order — all windows
    * month-partitioned, the frame bounded by days-per-month.
    */
  def monthlyBands(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"),
        expr("CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT)")
          .as("month"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("month", "day")
      .agg(sum("c").as("x"))
    val w = Window.partitionBy("month").orderBy(col("x"), col("day"))
    daily
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("month")))
      .groupBy("month")
      .agg(
        max("n").as("n_days"),
        max(when(col("rn") === expr("(n + 3) div 4"), col("x"))).as("p25_cents"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("x"))).as("p50_cents"),
        max(when(col("rn") === expr("(3 * n + 3) div 4"), col("x"))).as("p75_cents"))
  }

  def dowSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("day")
      .agg(sum("c").as("x"))
    val byDow = daily
      .select(expr("pmod(day + 3, 7)").as("dow"), col("x"))
      .groupBy("dow")
      .agg(count(lit(1)).as("n_days"), sum("x").as("dow_cents"))
    val tot = byDow.agg(sum("n_days").as("td"), sum("dow_cents").as("tc"))
    byDow
      .crossJoin(broadcast(tot))
      .select(
        col("dow"),
        col("n_days"),
        col("dow_cents"),
        expr("dow_cents div n_days").as("mean_cents"),
        expr("""CAST(CAST(dow_cents div n_days AS DECIMAL(38,0)) * 1000000
                 div (tc div td) AS BIGINT)""").as("index_e6"))
  }

  /** #300 Economic order quantity: per part, the Wilson lot size
    * q* = √(2·D·S / h) that balances ordering cost against holding
    * cost — the classical inventory-policy read-out that completes
    * #256's WHEN (reorder point) with the HOW MUCH. D = corpus demand
    * (the same rounded-qty grid as #256), S = a 10 000-cent fixed
    * order cost, h = the part's retail price in cents (value-
    * proportional holding, the textbook convention). All-integer:
    * x = (2·D·S) div h on DECIMAL(38,0), then the #226 one-ulp-clamp
    * EXACT integer sqrt — identical in both engines. Implied order
    * count = D div q*. One aggregate + one dim join, linear, no
    * windows.
    */
  def eoq(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .select(col("l_partkey"), expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q"))
      .groupBy("l_partkey")
      .agg(sum("q").as("demand_qty"))
      .join(
        Tables
          .part(spark, dir)
          .select(
            col("p_partkey").as("l_partkey"),
            expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").as("h_cents")),
        "l_partkey")
      .filter(col("h_cents") >= 1 && col("demand_qty") >= 1)
      .withColumn(
        "x",
        expr("CAST((2 * CAST(demand_qty AS DECIMAL(38,0)) * 10000) div h_cents AS BIGINT)"))
      .withColumn("s0", expr("CAST(floor(sqrt(CAST(x AS DOUBLE))) AS BIGINT)"))
      .withColumn(
        "eoq_qty",
        expr("""s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= x THEN 1 ELSE 0 END)
                   - (CASE WHEN s0 * s0 > x THEN 1 ELSE 0 END)"""))
      .select(
        col("l_partkey"),
        col("demand_qty"),
        col("h_cents"),
        col("eoq_qty"),
        expr("CASE WHEN eoq_qty > 0 THEN demand_qty div eoq_qty ELSE NULL END")
          .as("n_orders_implied"))

  /** The (lifetime-month, at-risk, deaths) step table shared by #234
    * Kaplan-Meier, #301 Nelson-Aalen and #302 log-rank: per-customer
    * lifetimes in whole months with right-censoring inside the
    * `censorMonths` horizon, aggregated per lifetime t with the
    * at-risk suffix count n(t) = Σ_{u≥t} cnt(u). The suffix window is
    * global but rides a PER-LIFETIME-MONTH aggregate (≤ #calendar-
    * months rows) — the documented KM exception class in
    * PlanDisciplineSpec.
    */
  private def survivalSteps(spark: SparkSession, dir: String, censorMonths: Int): DataFrame = {
    val byCust = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").cast("long").as("m"))
      .groupBy("o_custkey")
      .agg(min("m").as("m0"), max("m").as("m1"))
    val corpusMax = byCust.agg(max("m1").as("mmax"))
    byCust
      .crossJoin(broadcast(corpusMax))
      .select(
        (col("m1") - col("m0")).as("t"),
        (col("m1") < col("mmax") - censorMonths).cast("long").as("death"))
      .groupBy("t")
      .agg(count(lit(1)).as("cnt"), sum("death").as("d"))
      .withColumn(
        "n",
        sum("cnt").over(
          Window.orderBy("t").rowsBetween(Window.currentRow, Window.unboundedFollowing)))
  }

  /** #301 Nelson–Aalen cumulative hazard: H(t) = Σ_{u≤t} d_u/n_u over
    * #234's step table — the estimator survival analysis reads when
    * the HAZARD (instantaneous churn intensity) is the quantity of
    * interest rather than the survival probability; its slope changes
    * are where retention interventions show up first. Exact/
    * deterministic: each increment is the e9-truncated quotient
    * (d·10⁹) div n, and the cumulative sum runs over those integers —
    * bit-identical in both engines (a float Σd/n would not be). The
    * prefix fold reuses #234's bounded-model-state shape: the
    * ≤ #calendar-months step table collapses to one array scalar and
    * the cumsum is a codegen'd `aggregate` over `slice` per step, so
    * the plan carries exactly ONE global window (the shared at-risk
    * suffix — the documented KM exception).
    */
  def nelsonAalen(spark: SparkSession, dir: String, censorMonths: Int = 2): DataFrame =
    survivalSteps(spark, dir, censorMonths)
      .select(col("t"), col("n"), col("d"))
      .agg(expr("sort_array(collect_list(named_struct('t', t, 'n', n, 'd', d)))").as("steps"))
      .select(
        explode(
          expr("""transform(steps, (x, i) -> named_struct(
                    't', x.t, 'n_risk', x.n, 'd', x.d,
                    'hazard_e9', (x.d * 1000000000L) div x.n,
                    'cum_hazard_e9', aggregate(slice(steps, 1, i + 1), 0L,
                                       (acc, y) -> acc + (y.d * 1000000000L) div y.n)))"""))
          .as("s"))
      .select(col("s.t"), col("s.n_risk"), col("s.d"), col("s.hazard_e9"), col("s.cum_hazard_e9"))

  /** #302 Log-rank test: is the survival experience of BUILDING-
    * segment customers different from everyone else's? The standard
    * two-sample censored-data test (Mantel 1966) behind every
    * retention A/B readout — at each death time the observed group-A
    * deaths are compared with the hypergeometric expectation
    * E = d·n_a/n, variance V = d·(n_a/n)·(n_b/n)·(n−d)/(n−1), and
    * χ² = (O−E)²/ΣV. Exact/deterministic: per-step E and V are
    * e9-truncated integer quotients through DECIMAL(38,0) (the #245
    * per-term-truncation discipline — summing floats would diverge
    * across engines), and the final χ² lands on the e6 grid via one
    * integer division chain. Steps with n ≤ 1 or d = 0 contribute
    * nothing, exactly as in the textbook statistic. Scale shape: one
    * per-customer aggregate, one ≤#months pivot, ONE global window
    * (both suffix sums share a frame) over the bounded step table —
    * the documented KM exception class.
    */
  def logRank(spark: SparkSession, dir: String, censorMonths: Int = 2): DataFrame = {
    val byCust = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").cast("long").as("m"))
      .groupBy("o_custkey")
      .agg(min("m").as("m0"), max("m").as("m1"))
      .join(
        Tables
          .customer(spark, dir)
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "o_custkey")
    val corpusMax = byCust.agg(max("m1").as("mmax"))
    val byT = byCust
      .crossJoin(broadcast(corpusMax))
      .select(
        (col("m1") - col("m0")).as("t"),
        (col("m1") < col("mmax") - censorMonths).cast("long").as("death"),
        (col("c_mktsegment") === "BUILDING").cast("long").as("is_a"))
      .groupBy("t")
      .agg(
        sum("is_a").as("cnt_a"),
        (count(lit(1)) - sum("is_a")).as("cnt_b"),
        sum(col("death") * col("is_a")).as("d_a"),
        sum(col("death") * (lit(1L) - col("is_a"))).as("d_b"))
    val wSuffix = Window.orderBy("t").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    byT
      .withColumn("n_a", sum("cnt_a").over(wSuffix))
      .withColumn("n_b", sum("cnt_b").over(wSuffix))
      .withColumn("dd", col("d_a") + col("d_b"))
      .withColumn("nn", col("n_a") + col("n_b"))
      .withColumn(
        "e_a_e9",
        expr("""CASE WHEN dd > 0 AND nn > 1
                 THEN CAST((CAST(dd AS DECIMAL(38,0)) * n_a * 1000000000) div nn AS BIGINT)
                 ELSE 0L END"""))
      .withColumn(
        "v_e9",
        expr("""CASE WHEN dd > 0 AND nn > 1
                 THEN CAST((CAST(dd AS DECIMAL(38,0)) * n_a * n_b * (nn - dd) * 1000000000)
                      div (CAST(nn AS DECIMAL(38,0)) * nn * (nn - 1)) AS BIGINT)
                 ELSE 0L END"""))
      .agg(
        sum("cnt_a").as("n_cust_a"),
        sum("cnt_b").as("n_cust_b"),
        sum("d_a").as("o_a"),
        sum("d_b").as("o_b"),
        sum("e_a_e9").as("e_a_e9"),
        sum("v_e9").as("v_e9"))
      .select(
        col("n_cust_a"),
        col("n_cust_b"),
        col("o_a"),
        col("o_b"),
        col("e_a_e9"),
        col("v_e9"),
        expr("""CASE WHEN v_e9 > 0 THEN
                 CAST((CAST(o_a AS DECIMAL(38,0)) * 1000000000 - e_a_e9)
                      * (CAST(o_a AS DECIMAL(38,0)) * 1000000000 - e_a_e9)
                      div v_e9 div 1000 AS BIGINT)
                ELSE NULL END""").as("chi2_e6"))
  }

  /** #303 Lift / gains table: order value as a propensity score for
    * order completion, read as the 10-decile lift chart every
    * targeting campaign is sized from — per decile the response rate,
    * lift over base rate, and cumulative gains ("the top 30% of
    * scores capture X% of responders"). Completes the evaluation
    * family's score tooling: #232 AUC says the score ranks, #233
    * calibration says the magnitude means something, this prices the
    * CUTOFF decision.
    *
    * Deciles are TIE-BLOCK deciles on the exact integer rank: rows
    * collapse per distinct score first, the strictly-above prefix is
    * built hierarchically (#232's monotone score-shard + within-shard
    * cumsum + ≤nShards offset carry — no global data window), and
    * decile = (rows_above·10) div N, so tied scores land in one
    * decile deterministically in both engines. Rates/lifts are e6
    * integer quotients through DECIMAL(38,0). The only global window
    * is the cumulative sum over the ≤10-row decile aggregate
    * (documented in PlanDisciplineSpec).
    */
  def liftTable(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val byVal = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("v"),
        (col("o_orderstatus") === "F").cast("long").as("pos"))
      .groupBy("v")
      .agg(count(lit(1)).as("n_rows"), sum("pos").as("n_pos"))
    val bounds = byVal.agg(min("v").as("lo"), max("v").as("hi"))
    val sharded = byVal
      .crossJoin(broadcast(bounds))
      .withColumn("shard", expr(s"((hi - v) * $nShards) div (hi - lo + 1)"))
      .localCheckpoint(eager = false)
    val local = sharded.withColumn(
      "local_above",
      coalesce(
        sum("n_rows").over(
          Window
            .partitionBy("shard")
            .orderBy(col("v").desc)
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val offsets = sharded
      .groupBy("shard")
      .agg(sum("n_rows").as("c"))
      .withColumn(
        "off",
        coalesce(
          sum("c").over(Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("shard"), col("off"))
    val tot = byVal.agg(sum("n_rows").as("nt"), sum("n_pos").as("pt"))
    val deciles = local
      .join(broadcast(offsets), "shard")
      .crossJoin(broadcast(tot))
      .withColumn("decile", expr("((off + local_above) * 10) div nt"))
      .groupBy("decile")
      .agg(
        count(lit(1)).as("n_scores"),
        sum("n_rows").as("n"),
        sum("n_pos").as("n_pos"),
        max("nt").as("nt"),
        max("pt").as("pt"))
    deciles
      .withColumn(
        "cum_n",
        sum("n").over(Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn(
        "cum_pos",
        sum("n_pos").over(Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)))
      .select(
        col("decile"),
        col("n"),
        col("n_pos"),
        expr("CAST(n_pos * 1000000 div n AS BIGINT)").as("rate_e6"),
        expr("CAST((CAST(n_pos AS DECIMAL(38,0)) * nt * 1000000) div (CAST(n AS DECIMAL(38,0)) * pt) AS BIGINT)")
          .as("lift_e6"),
        expr("CAST(cum_pos * 1000000 div pt AS BIGINT)").as("cum_gain_e6"),
        expr("""CAST((CAST(cum_pos AS DECIMAL(38,0)) * nt * 1000000)
                 div (CAST(cum_n AS DECIMAL(38,0)) * pt) AS BIGINT)""").as("cum_lift_e6"))
  }

  /** #304 Partition modularity of the co-purchase graph: does the
    * BRAND partition explain the basket network? Newman modularity
    * Q = Σ_c [m_c/m − (deg_c/2m)²] per community, the quality score
    * behind every community-detection readout — here scoring a GIVEN
    * business partition (brand) rather than a discovered one, the
    * assortment question "are same-brand parts actually bought
    * together". Exact: per-brand contribution on the e6 grid as the
    * signed quotient (4m·m_c − deg_c²)·10⁶ div (4m²) through
    * DECIMAL(38,0) (deg_c² crosses 2⁶³ at warehouse scale); Σ over
    * brands of the UNDIVIDED numerators is pinned to Q's exact
    * rational form in the spec. Scale shape: edges come from
    * per-order basket combinations (#89's bounded explode — never a
    * fact self-join), deduped once; m is a 1-row broadcast; degree
    * and intra-edge counts are two linear aggregates + one dim join.
    */
  def modularity(spark: SparkSession, dir: String): DataFrame = {
    val edges = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set("l_partkey")).as("parts"))
      .select(
        explode(
          expr(
            """flatten(transform(parts, (x, i) ->
                 transform(slice(parts, i + 2, size(parts)),
                   y -> named_struct('part_a', x, 'part_b', y))))"""))
          .as("p"))
      .select(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
      .distinct()
      .localCheckpoint(eager = false)
    val brand = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    val labeled = edges
      .join(brand.select(col("p_partkey").as("part_a"), col("p_brand").as("brand_a")), "part_a")
      .join(brand.select(col("p_partkey").as("part_b"), col("p_brand").as("brand_b")), "part_b")
    val m = labeled.agg(count(lit(1)).as("m"))
    val intra = labeled
      .filter(col("brand_a") === col("brand_b"))
      .groupBy(col("brand_a").as("p_brand"))
      .agg(count(lit(1)).as("intra_edges"))
    val deg = labeled
      .select(explode(array(
        struct(col("part_a").as("node"), col("brand_a").as("p_brand")),
        struct(col("part_b").as("node"), col("brand_b").as("p_brand")))).as("e"))
      .select(col("e.node"), col("e.p_brand"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("deg_sum"), countDistinct("node").as("n_parts"))
    deg
      .join(intra, Seq("p_brand"), "left")
      .na
      .fill(0L, Seq("intra_edges"))
      .crossJoin(broadcast(m))
      .select(
        col("p_brand"),
        col("n_parts"),
        col("intra_edges"),
        col("deg_sum"),
        expr("""CAST(4 * CAST(m AS DECIMAL(38,0)) * intra_edges
                     - CAST(deg_sum AS DECIMAL(38,0)) * deg_sum AS BIGINT)""").as("contrib_num"),
        expr("""CAST(CASE WHEN 4 * CAST(m AS DECIMAL(38,0)) * intra_edges
                          - CAST(deg_sum AS DECIMAL(38,0)) * deg_sum < 0 THEN -1 ELSE 1 END
                 * (abs(4 * CAST(m AS DECIMAL(38,0)) * intra_edges
                        - CAST(deg_sum AS DECIMAL(38,0)) * deg_sum) * 1000000
                    div (4 * CAST(m AS DECIMAL(38,0)) * m)) AS BIGINT)""").as("contrib_e6"))
  }

  /** #305 Discount elasticity: per brand, the OLS slope of line-item
    * quantity on the discount level — "does a deeper discount move
    * volume for this brand", the first-order pricing read every
    * promo analysis starts from (a near-zero slope says the discount
    * is subsidy, not stimulus). Same exact-integer OLS discipline as
    * #159/#231: x = discount on the e2 grid, y = rounded qty, slope
    * numerator n·Σxy − Σx·Σy and denominator n·Σx² − (Σx)² through
    * DECIMAL(38,0), slope on the e6 grid as a sign-factored
    * truncating quotient (`div` ↔ `//` replay identically through
    * negatives). One join + one aggregate per brand, linear, no
    * windows; brands with a degenerate x spread (den = 0) are
    * filtered as slope-undefined.
    */
  def discountElasticity(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .select(
        col("l_partkey"),
        expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("x"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("y"))
      .join(
        Tables.part(spark, dir).select(col("p_partkey").as("l_partkey"), col("p_brand")),
        "l_partkey")
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"),
        sum("y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
      .withColumn(
        "num",
        expr("CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS BIGINT)"))
      .withColumn(
        "den",
        expr("CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS BIGINT)"))
      .filter(col("den") > 0)
      .select(
        col("p_brand"),
        col("n"),
        col("num"),
        col("den"),
        expr("""CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END
                 * (abs(CAST(num AS DECIMAL(38,0))) * 1000000 div den) AS BIGINT)""")
          .as("slope_e6"))

  /** #306 Frequent triples (3-itemsets): the top part triples by
    * basket co-occurrence — one apriori rung above #89's pairs, the
    * bundle-building signal ("these THREE ship together") behind
    * cross-sell kits. Scale shape: the 3-combination fan-out happens
    * INSIDE each order's sorted distinct-part array (baskets are
    * small and bounded, ≤ C(|basket|,3) ≈ 35 structs per order at
    * TPC-H shape) — linear in orders, never a triple self-join of
    * the fact table, which is the classic itemset scale-killer. One
    * groupBy count + TakeOrdered top-k with the full-key tiebreak.
    */
  def itemsets3(spark: SparkSession, dir: String, topK: Int = 25): DataFrame =
    Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set("l_partkey")).as("parts"))
      .filter(size(col("parts")) >= 3)
      .select(
        explode(
          expr(
            """flatten(transform(parts, (x, i) ->
                 flatten(transform(slice(parts, i + 2, size(parts)), (y, j) ->
                   transform(slice(parts, i + j + 3, size(parts)),
                     z -> named_struct('part_a', x, 'part_b', y, 'part_c', z))))))"""))
          .as("t"))
      .select(col("t.part_a"), col("t.part_b"), col("t.part_c"))
      .groupBy("part_a", "part_b", "part_c")
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("part_a"), col("part_b"), col("part_c"))
      .limit(topK)

  /** #309 Kruskal–Wallis H test: do line revenues differ across the
    * six part-type families (first word of p_type) — the k-sample
    * generalization of #288's Mann–Whitney, the omnibus "is ANY group
    * different" gate run before pairwise rank tests. Everything on
    * #288's doubled-midrank grid: 2·midrank(v) = 2·cum_below + t + 1,
    * so the per-group rank sum ships as r_2x = 2·R_g and the centered
    * deviation dev_2x = r_2x − n_g(n+1) = 2·n_g·(r̄_g − r̄) is a whole
    * number. H = Σ_g 3·dev_2x² / (n_g·n·(n+1)) — per-group terms
    * e6-truncated through DECIMAL(38,0)↔HUGEINT (one combined
    * denominator, ONE truncation per group, order-independent sum);
    * tie correction H' = H·(n³−n)/(n³−n−Σ(t³−t)) as a second exact
    * integer quotient (NULL when every value ties). dev_2x² ≤ 4n⁴
    * bounds the cross product — inside DECIMAL(38,0) through ~10⁸
    * rows per test; beyond that collapse the cents grid first.
    *
    * Scale shape: ranks come from the per-VALUE aggregate (ties
    * collapse before any window) via the #180 hierarchical build —
    * monotone value-range shard + within-shard cumsum + ≤nShards
    * offset carry, no global data window; group totals are one
    * (group, value) join + k-row aggregate; H is a k-row fold.
    */
  def kruskalWallis(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val lines = Tables
      .lineitem(spark, dir)
      .join(
        broadcast(
          Tables
            .part(spark, dir)
            .select(
              col("p_partkey").as("l_partkey"),
              expr("split_part(p_type, ' ', 1)").as("type_family"))),
        "l_partkey")
      .select(
        col("type_family"),
        expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)")
          .as("c"))
    val byVal = lines.groupBy("c").agg(count(lit(1)).as("cnt"))
    val bounds = byVal.agg(min("c").as("lo"), max("c").as("hi"))
    val sharded = byVal
      .crossJoin(broadcast(bounds))
      .withColumn("shard", expr(s"((c - lo) * $nShards) div (hi - lo + 1)"))
    val offsets = sharded
      .groupBy("shard")
      .agg(sum("cnt").as("sc"))
      .withColumn(
        "off",
        coalesce(
          sum("sc").over(Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("shard"), col("off"))
    val cum = sharded
      .withColumn(
        "cum_local",
        coalesce(
          sum("cnt").over(
            Window.partitionBy("shard").orderBy("c").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .join(broadcast(offsets), "shard")
      .select(col("c"), col("cnt"), (col("off") + col("cum_local")).as("cum"))
    val tot = cum.agg(
      sum("cnt").as("n"),
      sum(expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt")).as("tie_t"))
    val perGroup = lines
      .groupBy("type_family", "c")
      .agg(count(lit(1)).as("cnt_g"))
      .join(cum, "c")
      .groupBy("type_family")
      .agg(sum("cnt_g").as("n_g"), sum(expr("cnt_g * (2 * cum + cnt + 1)")).as("r_2x"))
    val k = perGroup.agg(count(lit(1)).as("k_groups"))
    val terms = perGroup
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(k))
      .withColumn("dev_2x", expr("r_2x - n_g * (n + 1)"))
      .withColumn(
        "term_e6",
        expr("""CAST((3 * CAST(dev_2x AS DECIMAL(38,0)) * dev_2x * 1000000)
                 div (CAST(n_g AS DECIMAL(38,0)) * n * (n + 1)) AS BIGINT)"""))
    val h = terms
      .groupBy("n", "tie_t", "k_groups")
      .agg(sum("term_e6").as("h_e6"))
      .withColumn(
        "h_tie_e6",
        expr("""CASE WHEN CAST(n AS DECIMAL(38,0)) * n * n - n - tie_t > 0 THEN
                  CAST(CAST(h_e6 AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * n * n - n)
                    div (CAST(n AS DECIMAL(38,0)) * n * n - n - tie_t) AS BIGINT)
                ELSE NULL END"""))
      .select(col("h_e6"), col("h_tie_e6"))
    terms
      .crossJoin(broadcast(h))
      .select(
        col("type_family"),
        col("n_g"),
        col("r_2x"),
        expr("CAST(CAST(r_2x AS DECIMAL(38,0)) * 1000000 div (2 * n_g) AS BIGINT)")
          .as("mean_rank_e6"),
        col("term_e6"),
        col("k_groups"),
        col("n"),
        col("h_e6"),
        col("h_tie_e6"))
  }

  /** #310 Price indices: monthly Laspeyres, Paasche and Fisher
    * indices of realized unit prices over the base-month common
    * basket — the inflation-tracking read a revenue team runs to
    * split growth into price vs volume (Laspeyres freezes base-month
    * quantities, Paasche uses current ones, Fisher is their geometric
    * mean — the "ideal" index that cancels both substitution biases).
    * Unit price per (part, month) = revenue cents div quantity (one
    * truncation, replayable); basket = parts traded in BOTH the base
    * month and the month under read, so the ratio compares like with
    * like. L_e6 = Σp_m·q_0 ·10⁶ div Σp_0·q_0 and P_e6 analogously —
    * single truncating quotients through DECIMAL(38,0)↔HUGEINT;
    * Fisher = the #226 one-ulp-clamp EXACT isqrt of the e12 product,
    * so √ never meets a float. Base-month row is exactly 10⁶ on all
    * three. Scale shape: one (part, month) aggregate, one join on
    * part against the base-month frame (shuffle on the part key —
    * the basket is NOT assumed broadcast-small), one ≤#months-row
    * aggregate; no windows.
    */
  def priceIndex(spark: SparkSession, dir: String): DataFrame = {
    val pm = Tables
      .lineitem(spark, dir)
      .select(
        col("l_partkey"),
        expr("CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT)").as("m"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("rev"))
      .groupBy("l_partkey", "m")
      .agg(sum("q").as("qty"), sum("rev").as("rev"))
      .filter(col("qty") >= 1)
      .withColumn("p", expr("rev div qty"))
    val m0 = pm.agg(min("m").as("m0"))
    val base = pm
      .crossJoin(broadcast(m0))
      .filter(col("m") === col("m0"))
      .select(col("l_partkey"), col("p").as("p0"), col("qty").as("q0"))
    pm.join(base, "l_partkey")
      .groupBy("m")
      .agg(
        count(lit(1)).as("n_parts"),
        sum(expr("CAST(p AS DECIMAL(38,0)) * q0")).as("l_num"),
        sum(expr("CAST(p0 AS DECIMAL(38,0)) * q0")).as("l_den"),
        sum(expr("CAST(p AS DECIMAL(38,0)) * qty")).as("p_num"),
        sum(expr("CAST(p0 AS DECIMAL(38,0)) * qty")).as("p_den"))
      .withColumn("laspeyres_e6", expr("CAST(l_num * 1000000 div l_den AS BIGINT)"))
      .withColumn("paasche_e6", expr("CAST(p_num * 1000000 div p_den AS BIGINT)"))
      .withColumn(
        "x",
        expr("CAST(laspeyres_e6 AS DECIMAL(38,0)) * paasche_e6"))
      .withColumn("s0", expr("CAST(floor(sqrt(CAST(x AS DOUBLE))) AS BIGINT)"))
      .withColumn(
        "fisher_e6",
        expr("""s0 + (CASE WHEN (CAST(s0 AS DECIMAL(38,0)) + 1) * (s0 + 1) <= x THEN 1 ELSE 0 END)
                   - (CASE WHEN CAST(s0 AS DECIMAL(38,0)) * s0 > x THEN 1 ELSE 0 END)"""))
      .select(
        col("m"),
        col("n_parts"),
        col("laspeyres_e6"),
        col("paasche_e6"),
        col("fisher_e6"))
  }

  /** Newsvendor cost ratio: underage (lost margin) vs overage
    * (holding/salvage loss) — 3:1 puts the critical fractile at 3/4.
    * The oracle rank formula is generated from these constants
    * (KmCensorMonths precedent), so changing them breaks loudly.
    */
  val NewsvendorCu = 3
  val NewsvendorCo = 1

  /** #312 Newsvendor critical-fractile stocking: per part, the stock
    * level that balances underage against overage cost — order up to
    * the τ-quantile of daily demand with τ = cu/(cu+co), the
    * single-period stochastic-inventory answer that completes the
    * deterministic #256 (reorder point) / #300 (EOQ) pair with
    * demand-DISTRIBUTION-aware sizing. The quantile is the exact
    * ⌈τ·n⌉-th order statistic of the part's daily demand under the
    * (qty, day) total order (#106's rank-defined convention — no
    * interpolation, engine-independent); ⌈cu·n/(cu+co)⌉ =
    * (cu·n + cu+co − 1) div (cu+co) in integers. All windows are
    * part-partitioned (frame = the part's ship days, calendar-
    * bounded); one aggregate joins n back. Linear, no global windows.
    */
  def newsvendor(spark: SparkSession, dir: String): DataFrame = {
    val cuco = NewsvendorCu + NewsvendorCo
    val daily = Tables
      .lineitem(spark, dir)
      .select(
        col("l_partkey"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("d"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q"))
      .groupBy("l_partkey", "d")
      .agg(sum("q").as("qd"))
    val ranked = daily
      .withColumn(
        "rn",
        row_number()
          .over(Window.partitionBy("l_partkey").orderBy(col("qd"), col("d")))
          .cast("long"))
    val stats = daily
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_days"), sum("qd").as("total_qty"))
    ranked
      .join(stats, "l_partkey")
      .filter(col("rn") === expr(s"(${NewsvendorCu} * n_days + ${cuco - 1}) div $cuco"))
      .select(
        col("l_partkey"),
        col("n_days"),
        col("total_qty"),
        col("qd").as("q_star"),
        col("rn").as("rank_at"))
  }

  /** The #314 variable list on its integer grids (shared with the
    * oracle generator so both sides enumerate identical pairs):
    * name -> grid expression over lineitem.
    */
  val CorrMatrixVars: Seq[(String, String)] = Seq(
    "qty" -> "CAST(floor(l_quantity + 0.5) AS BIGINT)",
    "price_cents" -> "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)",
    "discount_bps" -> "CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)",
    "tax_bps" -> "CAST(floor(l_tax * 10000 + 0.5) AS BIGINT)")

  /** #314 Numeric correlation matrix: pairwise Pearson r² (signed)
    * across the four lineitem measures on their integer grids — the
    * profiling pass a feature-engineering pipeline runs before model
    * fitting to find redundant / leaking columns, generalizing #202's
    * single trend regression and #229's single graph correlation to
    * the all-pairs read. ONE partial-aggregate pass computes every
    * moment (n, 4 sums, 10 squares/cross-products in DECIMAL(38,0) —
    * the map-side-combine shape: d² cells shuffle, never rows), then
    * the 6 pairs unfold from the 1-row moment frame with the #229
    * sign-factored e3×e3 quotient. Cauchy–Schwarz bounds only the
    * PRODUCT of the two truncated factors (num² ≤ den_x·den_y ⇒
    * product ≤ 10⁶); one factor alone can exceed 10³ when
    * den_y ≫ den_x, so no per-factor bound may be relied on — the
    * e6 product stays bounded where num² would overflow; den=0
    * (constant column) yields NULL. The pair list is
    * shared with the oracle generator — adding a variable changes
    * both sides or neither.
    */
  def corrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val vars = CorrMatrixVars.map(_._1)
    val base = Tables
      .lineitem(spark, dir)
      .select(CorrMatrixVars.map { case (n, e) => expr(e).as(n) }: _*)
    val momentCols =
      vars.map(v => sum(col(v)).as(s"s_$v")) ++
        (for { i <- vars.indices; j <- i until vars.length } yield {
          val (a, b) = (vars(i), vars(j))
          sum(expr(s"CAST($a AS DECIMAL(38,0)) * $b")).as(s"s_${a}_${b}")
        })
    val moments = base.agg(count(lit(1)).as("n"), momentCols: _*)
    val pairStructs = (for {
      i <- vars.indices
      j <- (i + 1) until vars.length
    } yield {
      val (a, b) = (vars(i), vars(j))
      s"""named_struct(
            'var_x', '$a', 'var_y', '$b',
            'num', CAST(n AS DECIMAL(38,0)) * s_${a}_${b}
                     - CAST(s_$a AS DECIMAL(38,0)) * s_$b,
            'den_x', CAST(n AS DECIMAL(38,0)) * s_${a}_${a}
                     - CAST(s_$a AS DECIMAL(38,0)) * s_$a,
            'den_y', CAST(n AS DECIMAL(38,0)) * s_${b}_${b}
                     - CAST(s_$b AS DECIMAL(38,0)) * s_$b)"""
    }).mkString(", ")
    moments
      .select(col("n"), explode(expr(s"array($pairStructs)")).as("pair"))
      .select(
        col("pair.var_x"),
        col("pair.var_y"),
        col("n"),
        col("pair.num").as("num"),
        col("pair.den_x").as("den_x"),
        col("pair.den_y").as("den_y"))
      .select(
        col("var_x"),
        col("var_y"),
        col("n"),
        expr("""CASE WHEN den_x > 0 AND den_y > 0 THEN
                  CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END) *
                    ((abs(num) * 1000 div den_x)
                     * (abs(num) * 1000 div den_y)) AS BIGINT)
                ELSE NULL END""").as("r2_signed_e6"))
  }

  /** Per-edge triangle support on an oriented (pa < pb) edge set:
    * wedges a<b<c from two edge copies joined on the middle node,
    * closed by a semi-join on (a,c); each closed triangle credits all
    * three of its edges. Shared by #315's peel rounds and its final
    * read-out.
    */
  private def edgeSupport(e: DataFrame): DataFrame = {
    val ab = e.select(col("pa").as("a"), col("pb").as("b"))
    val bc = e.select(col("pa").as("b"), col("pb").as("c"))
    val tri = ab
      .join(bc, "b")
      .join(e.select(col("pa").as("a"), col("pb").as("c")), Seq("a", "c"), "left_semi")
    tri
      .select(col("a").as("pa"), col("b").as("pb"))
      .unionAll(tri.select(col("b").as("pa"), col("c").as("pb")))
      .unionAll(tri.select(col("a").as("pa"), col("c").as("pb")))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("support"))
  }

  /** #334 Sampled-source betweenness centrality (truncated Brandes):
    * which parts sit ON the shortest paths between other parts in the
    * co-purchase graph — the brokerage/bottleneck read PageRank's
    * flow-volume score misses (a low-traffic bridge between two dense
    * clusters is invisible to #124 and decisive here). Exact Brandes
    * over ALL sources is O(V·E) — never distributed-affordable — so
    * this is the standard k-SAMPLE estimator (Brandes & Pich 2007):
    * deterministic seed sources (part % seedMod = 1 among non-isolated
    * nodes — content-addressed, grows with the catalog), each source's
    * BFS truncated at `depth` hops (bounded-depth betweenness: paths
    * longer than `depth` contribute nothing — documented truncation,
    * the at-scale convention for small-diameter graphs).
    *
    * All-integer Brandes: BFS rounds accumulate exact BIGINT
    * path counts σ (σ(w) = Σ_pred σ(v), so σ(v) ≤ σ(w) — every
    * dependency quotient is bounded); dependency accumulation runs
    * level-by-level downward with the per-edge term
    * σ(v)·(10⁶ + δ(w)) div σ(w) — ONE truncating DECIMAL(38,0) ↔
    * HUGEINT division per edge, summed order-free, so the DuckDB
    * unrolled-CTE replay is bit-identical. δ at the truncation depth
    * is 0 by convention; the source's own row never enters the sum
    * (Brandes excludes v = s). Output: top-`topK` parts by (bc desc,
    * part) — rank-filtered, rides WindowGroupLimit.
    *
    * Scale shape: all sources advance TOGETHER — frames are keyed
    * (s, v), every round is one edge join shuffled on the node key +
    * one (s, v) aggregate, `depth` BFS rounds + `depth−1` dependency
    * rounds total regardless of graph size; per-round lineage cut
    * (eager localCheckpoint) with every intermediate released on exit
    * via [[Lineage.checkpointReleasing]]. Reference surface: none —
    * this extends the graph family (#124/#166/#200/#227/#315) with
    * the centrality real users ask for next (SURVEY §15.2 deferral,
    * cleared r7).
    */
  /** The ONE support-filtered co-purchase pair build the whole graph
    * family shares (betweenness, closeness, degreeDist, labelProp,
    * edgeEmbeddedness): distinct (order, part) incidences → oriented
    * part pairs per order (self-join on the order key, part_a <
    * part_b) → pair counts → support filter. Extracted so the
    * support threshold and orientation cannot silently drift between
    * operators that all claim to analyze the SAME graph; callers
    * symmetrize/rename/persist per their own loop shape. One
    * shuffle-heavy self-join keyed on l_orderkey + one pair
    * aggregate — built per operator (never shared-state), so each
    * caller's checkpoint/cache hygiene stays self-contained.
    */
  private def coPurchasePairs(spark: SparkSession, dir: String, minSupport: Int): DataFrame = {
    val po = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")).distinct()
    po.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(po.select(col("l_orderkey"), col("l_partkey").as("part_b")), "l_orderkey")
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minSupport)
  }

  def betweenness(
      spark: SparkSession,
      dir: String,
      seedMod: Int = 250,
      depth: Int = 3,
      topK: Int = 100): DataFrame = Lineage.checkpointReleasing(spark) { implicit scope =>
    val pairs = coPurchasePairs(spark, dir, minSupport = 2)
    val sym = pairs
      .select(col("part_a").as("src"), col("part_b").as("dst"))
      .unionAll(pairs.select(col("part_b").as("src"), col("part_a").as("dst")))
      .repartition(col("src"))
      .cache()
    val seeds = sym.select(col("src").as("v")).distinct().filter(col("v") % seedMod === 1)
    // ---- forward BFS: levels(r) = (s, v, sigma) at distance r ----
    var levels = Vector(
      seeds.select(col("v").as("s"), col("v"), lit(1L).as("sigma")).cp(eager = true))
    var visited = levels(0).select("s", "v")
    for (r <- 1 to depth) {
      val next = levels(r - 1)
        .join(sym.withColumnRenamed("src", "v"), "v")
        .select(col("s"), col("dst").as("v"), col("sigma"))
        .groupBy("s", "v")
        .agg(sum("sigma").as("sigma"))
        .join(visited, Seq("s", "v"), "left_anti")
        .cp(eager = true)
      levels = levels :+ next
      visited = visited.unionAll(next.select("s", "v")).cp(eager = true)
    }
    // ---- dependency accumulation, deepest level first; the r = 0
    // source rows are never needed (v = s is excluded from bc) ----
    var delta = levels(depth).select(col("s"), col("v"), lit(0L).as("delta"))
    var perLevel = Vector.empty[DataFrame]
    for (r <- (depth - 1) to 1 by -1) {
      val nextLvl = levels(r + 1)
        .join(delta, Seq("s", "v"))
        .select(col("s"), col("v").as("w"), col("sigma").as("sig_w"), col("delta").as("del_w"))
      val terms = levels(r)
        .join(sym.select(col("src").as("v"), col("dst").as("w")), "v")
        .join(nextLvl, Seq("s", "w"))
        .select(
          col("s"),
          col("v"),
          expr("CAST(CAST(sigma AS DECIMAL(38,0)) * (1000000 + del_w) div sig_w AS BIGINT)")
            .as("term"))
        .groupBy("s", "v")
        .agg(sum("term").as("dsum"))
      delta = levels(r)
        .join(terms, Seq("s", "v"), "left")
        .select(col("s"), col("v"), coalesce(col("dsum"), lit(0L)).as("delta"))
        .cp(eager = true)
      perLevel = perLevel :+ delta
    }
    val bc = perLevel
      .reduce(_ unionAll _)
      .groupBy(col("v").as("part"))
      .agg(expr("CAST(sum(CAST(delta AS DECIMAL(38,0))) AS BIGINT)").as("bc_e6"))
    val out = bc
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("bc_e6").desc, col("part"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("part"), col("bc_e6"), col("rank"))
    (out, Seq(sym))
  }

  /** #335 Betweenness estimator scorecard (the §15.4 approximation-
    * ships-with-its-scorecard invariant, applied to #334 in its birth
    * round): the production estimator's top-20/top-50 against a
    * DENSER reference — 5× the seed sample (part % 50 = 1) and one
    * hop deeper truncation. High overlap ⇒ the cheap sample already
    * ranks the bridges the expensive one finds; a collapse flags a
    * graph whose betweenness mass sits past the truncation horizon.
    * Overlap counts exact BIGINTs, recall as truncating e6 quotients,
    * scored-node coverage for both estimators; 1-row output, every
    * frame broadcast-sized.
    */
  def betweennessEval(
      spark: SparkSession,
      dir: String,
      seedMod: Int = 250,
      depth: Int = 3,
      refSeedMod: Int = 50,
      refDepth: Int = 4): DataFrame = {
    val a = betweenness(spark, dir, seedMod, depth, topK = Int.MaxValue)
    val b = betweenness(spark, dir, refSeedMod, refDepth, topK = Int.MaxValue)
    def top(df: DataFrame, k: Int) = df.filter(col("rank") <= k).select("part")
    val o20 = top(a, 20).join(top(b, 20), "part").agg(count(lit(1)).as("overlap_20"))
    val o50 = top(a, 50).join(top(b, 50), "part").agg(count(lit(1)).as("overlap_50"))
    val na = a.agg(count(lit(1)).as("n_scored"))
    val nb = b.agg(count(lit(1)).as("n_scored_ref"))
    o20
      .crossJoin(broadcast(o50))
      .crossJoin(broadcast(na))
      .crossJoin(broadcast(nb))
      .select(
        col("overlap_20"),
        col("overlap_50"),
        expr("overlap_20 * 1000000 div 20").as("recall20_e6"),
        expr("overlap_50 * 1000000 div 50").as("recall50_e6"),
        col("n_scored"),
        col("n_scored_ref"))
  }

  /** #336 Sampled harmonic closeness centrality: which parts are NEAR
    * everything — Σ over reached seeds of 10⁶ div d(s, v), the
    * harmonic form (Boldi & Vigna 2014) that handles unreachable
    * pairs by contributing zero instead of breaking the mean — from
    * the SAME truncated sampled BFS as #334 (betweenness scores
    * brokers ON paths; closeness scores endpoints NEAR everything —
    * the two ends of the centrality question). Distances are level
    * indices, so the whole score is exact integers; seed sampling and
    * truncation identical to #334 (documented estimator, not exact
    * closeness). Scale: `depth` BFS rounds of one edge join + one
    * (s, v) aggregate; top-k rides WindowGroupLimit.
    */
  def closeness(
      spark: SparkSession,
      dir: String,
      seedMod: Int = 250,
      depth: Int = 3,
      topK: Int = 100): DataFrame = Lineage.checkpointReleasing(spark) { implicit scope =>
    val pairs = coPurchasePairs(spark, dir, minSupport = 2)
    val sym = pairs
      .select(col("part_a").as("src"), col("part_b").as("dst"))
      .unionAll(pairs.select(col("part_b").as("src"), col("part_a").as("dst")))
      .repartition(col("src"))
      .cache()
    val seeds = sym.select(col("src").as("v")).distinct().filter(col("v") % seedMod === 1)
    var levels = Vector(
      seeds.select(col("v").as("s"), col("v"), lit(1L).as("sigma")).cp(eager = true))
    var visited = levels(0).select("s", "v")
    for (r <- 1 to depth) {
      val next = levels(r - 1)
        .join(sym.withColumnRenamed("src", "v"), "v")
        .select(col("s"), col("dst").as("v"), col("sigma"))
        .groupBy("s", "v")
        .agg(sum("sigma").as("sigma"))
        .join(visited, Seq("s", "v"), "left_anti")
        .cp(eager = true)
      levels = levels :+ next
      visited = visited.unionAll(next.select("s", "v")).cp(eager = true)
    }
    val harm = (1 to depth)
      .map(r => levels(r).select(col("v"), lit(1000000L / r).as("h")))
      .reduce(_ unionAll _)
      .groupBy(col("v").as("part"))
      .agg(sum("h").as("harmonic_e6"), count(lit(1)).as("n_seeds_reached"))
    val out = harm
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("harmonic_e6").desc, col("part"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("part"), col("harmonic_e6"), col("n_seeds_reached"), col("rank"))
    (out, Seq(sym))
  }

  /** #348 Degree distribution by octave: the co-purchase graph's
    * degree histogram folded into powers-of-two bins with the
    * octave-over-octave count ratio — the scale-free-or-not read
    * (#204's Zipf octave trick applied to graph degrees: a power law
    * is a straight ratio line, a random graph collapses past its
    * Poisson mean) that decides whether hub-aware partitioning /
    * skew salting is worth wiring before running the #124/#200
    * family at 100 TB. Octave = len(bin(deg)) − 1 — pure integer in
    * both engines, no log₂ float near a boundary; ratio one
    * truncating e6 quotient via a lag over the ≤64-row octave frame
    * (a documented PlanDisciplineSpec exception).
    */
  def degreeDist(spark: SparkSession, dir: String): DataFrame = {
    val pairs = coPurchasePairs(spark, dir, minSupport = 2)
    val deg = pairs
      .select(col("part_a").as("node"))
      .unionAll(pairs.select(col("part_b").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("deg"))
    deg
      .withColumn("octave", (length(expr("bin(deg)")) - 1).cast("long"))
      .groupBy("octave")
      .agg(count(lit(1)).as("n_nodes"), min("deg").as("min_deg"), max("deg").as("max_deg"))
      .withColumn("prev_n", lag("n_nodes", 1).over(Window.orderBy("octave")))
      .select(
        col("octave"),
        col("n_nodes"),
        col("min_deg"),
        col("max_deg"),
        expr("CASE WHEN prev_n IS NULL THEN NULL ELSE CAST(n_nodes * 1000000 div prev_n AS BIGINT) END")
          .as("ratio_prev_e6"))
  }

  /** #349 EWMA control chart: #196's exact dyadic EWMA (α = ½,
    * 16-day horizon) run on the single corpus-wide daily-revenue
    * series and wrapped with control limits — the smoothed SPC chart
    * that completes the monitor family (#254 flags single-day spikes,
    * #284/#331 cumulative shifts; EWMA charts catch SMALL sustained
    * shifts soonest, the textbook recommendation for drift under
    * ~1.5σ). Limits are exact integers: the asymptotic EWMA variance
    * multiplier λ/(2−λ) at λ=½ is ⅓, so ±3σ·√⅓ = √(3·Var) — ONE
    * #226 one-ulp-clamp isqrt of 3·population-variance (cents², the
    * #284 moment machinery). The EWMA itself is the #196 cover join:
    * each day covers its next 16 targets with dyadic weight 2^(15−i),
    * num/den exact BIGINTs, ewma = num div den — no recursion, no
    * window at all. Alarm = |ewma − μ| > limit, integer compare.
    */
  def ewmaChart(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("day")
      .agg(sum("c").as("x"))
      .localCheckpoint(eager = false)
    val mu = byDay
      .agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
      .select(
        expr("sx div n").as("mu"),
        expr("""CAST(3 * ((CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx)
                 div (CAST(n AS DECIMAL(38,0)) * n)) AS DECIMAL(38,0))""").as("v3"))
      .select(col("mu"), expr("CAST(floor(sqrt(CAST(v3 AS DOUBLE))) AS BIGINT)").as("s0"), col("v3"))
      .select(
        col("mu"),
        expr("""s0 + (CASE WHEN (CAST(s0 AS DECIMAL(38,0)) + 1) * (s0 + 1) <= v3 THEN 1 ELSE 0 END)
                   - (CASE WHEN CAST(s0 AS DECIMAL(38,0)) * s0 > v3 THEN 1 ELSE 0 END)""")
          .as("lim"))
    val covers = byDay
      .select(
        col("day").as("src"),
        col("x"),
        explode(expr("sequence(day, day + 15)")).as("t"))
      .select(
        col("t"),
        expr("shiftleft(1L, CAST(15 - (t - src) AS INT))").as("w"),
        expr("x * shiftleft(1L, CAST(15 - (t - src) AS INT))").as("wx"))
    covers
      .groupBy("t")
      .agg(sum("w").as("den"), sum("wx").as("num"))
      .join(byDay.select(col("day").as("t"), col("x")), "t")
      .crossJoin(broadcast(mu))
      .select(
        col("t").as("day"),
        col("x").as("cents"),
        expr("num div den").as("ewma_cents"),
        col("mu").as("mu_cents"),
        col("lim").as("limit_cents"),
        (abs(expr("num div den") - col("mu")) > col("lim")).cast("long").as("alarm"))
  }

  /** #400 Binary-segmentation split gain (offline changepoint
    * LOCALIZATION with effect size — #182's CUSUM V-apex DATES a
    * shift per event type; this scores every candidate split of the
    * daily-REVENUE series): the day that best splits the series
    * into two constant-mean segments, scored by the exact
    * variance-reduction gain Σ²_L/n_L + Σ²_R/n_R − Σ²/n (the Σx²
    * terms CANCEL between the split and no-split SSEs, so the score
    * needs only prefix sums — no squares of individual days). The SPC
    * family (#284 CUSUM, #331 PH, #349 EWMA) DETECTS drift online;
    * this LOCALIZES the shift offline — the "when exactly did the
    * level move" question asked after any monitor fires. Top-`topK`
    * candidate splits ship with both segment means so the analyst
    * reads the before/after levels directly.
    *
    * Exactness: segment means stay on the cents grid; the GAIN terms
    * first truncate the prefix sums to KILOCENTS (div 1000) — Σx is
    * 3.8e11 cents at sf0.01, so a cents-grid Σ²/n is ~6e19 and
    * overflows the BIGINT that Spark `div` returns even for DECIMAL
    * operands (the ANOVA lesson: rescale BEFORE the div, never
    * after) — then each Σ_k²/n term is ONE truncating
    * DECIMAL(38,0)↔HUGEINT division; at sf100 Σ_k² ≈ 1e23 still sits
    * inside DECIMAL38 and quotients stay ~1e19/n. Both engines
    * truncate the SAME sums in the same order, so the kilocents²
    * score replays bit-exactly; ties the coarser grid creates break
    * on split_day. Prefix sums ride ONE day-ordered window over the
    * ≤#calendar-days daily frame (the #369 documented
    * PlanDisciplineSpec exception); the total is a 1-row broadcast;
    * top-k rank-filtered.
    */
  def binsegSplit(spark: SparkSession, dir: String, topK: Int = 5): DataFrame = {
    val byDay = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("day")
      .agg(sum("c").as("x"))
      .localCheckpoint(eager = false)
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byDay.agg(count(lit(1)).as("n"), sum("x").as("sx"))
    val ranked = byDay
      .withColumn("nl", count(lit(1)).over(w))
      .withColumn("sxl", sum("x").over(w))
      .crossJoin(broadcast(tot))
      .filter(col("nl") < col("n"))
      .select(
        col("day").as("split_day"),
        col("nl").as("n_left"),
        (col("n") - col("nl")).as("n_right"),
        expr("sxl div nl").as("mean_left_cents"),
        expr("(sx - sxl) div (n - nl)").as("mean_right_cents"),
        // floor at 0: the exact-rational gain is non-negative (convexity),
        // but the per-term truncation can land the integer form at −1/−2 —
        // and a negative operand would split Spark div (toward zero) from
        // DuckDB // (floor). Kilocents rescale BEFORE the div: see doc.
        expr("""greatest(CAST(sxl div 1000 AS DECIMAL(38,0)) * (sxl div 1000) div nl
               + CAST((sx - sxl) div 1000 AS DECIMAL(38,0)) * ((sx - sxl) div 1000)
                 div (n - nl)
               - CAST(sx div 1000 AS DECIMAL(38,0)) * (sx div 1000) div n, 0L)""")
          .as("gain_kc2"))
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("gain_kc2").desc, col("split_day"))).cast("long"))
      .filter(col("rank") <= topK)
    ranked
  }

  /** #354 Inter-arrival percentiles per event type: exact lower
    * discrete p50/p90/p99 (plus floor mean) of the µs gap between a
    * user's consecutive events OF EACH TYPE — the arrival-process
    * read behind rate-limit sizing, session-gap calibration (#16's
    * 30-min gap is an assumption; this measures the distribution it
    * should come from) and #183's throttle interval. Gaps from one
    * per-(user, type) lag window (bounded partitions); percentiles
    * are the #282 rank-defined order statistics per type — the
    * type-partitioned window precedent, never global.
    */
  def interarrival(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ts_us"))
    val gaps = ev
      .withColumn(
        "prev",
        lag("ts_us", 1).over(Window.partitionBy("user_id", "event_type").orderBy("ts_us", "user_id")))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), (col("ts_us") - col("prev")).as("gap_us"))
    val w = Window.partitionBy("event_type").orderBy(col("gap_us"), col("event_type"))
    gaps
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(
        max("n").as("n_gaps"),
        expr("sum(gap_us) div max(n)").as("mean_us"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("gap_us"))).as("p50_us"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("gap_us"))).as("p90_us"),
        max(when(col("rn") === expr("(99 * n + 99) div 100"), col("gap_us"))).as("p99_us"))
  }

  /** #357 Decision-stump split gain: Gini impurity reduction of
    * thresholding order VALUE to predict completion (status F) at
    * each of 9 equal-width bin boundaries — the single-feature split
    * scoring a tree learner (or a feature-usefulness audit) runs
    * first; #303 prices a PROBABILITY cutoff, this scores a RAW
    * FEATURE cutoff, and a near-zero best gain says the feature is
    * noise before any model is fit. All-integer: bins from a 1-row
    * min/max broadcast (#319's strata machinery), prefix counts via a
    * cumulative sum over the ≤10-row bin aggregate, per-side Gini
    * 10⁶ − (pos²+neg²)·10⁶/n² through DECIMAL(38,0) with ONE
    * truncation per side, gain = parent − (n_l·g_l + n_r·g_r) div n.
    */
  def splitGain(spark: SparkSession, dir: String, nBins: Int = 10): DataFrame = {
    val ords = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("v"),
        (col("o_orderstatus") === "F").cast("long").as("y"))
    val bounds = ords.agg(min("v").as("lo"), max("v").as("hi"))
    val bins = ords
      .crossJoin(broadcast(bounds))
      .withColumn("bin", expr(s"((v - lo) * $nBins) div (hi - lo + 1)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_b"), sum("y").as("pos_b"))
    val tot = bins.agg(sum("n_b").as("n"), sum("pos_b").as("pos"))
    def gini(n: String, p: String): String =
      s"""CASE WHEN $n > 0 THEN
            1000000 - CAST((CAST($p AS DECIMAL(38,0)) * $p
                            + CAST($n - $p AS DECIMAL(38,0)) * ($n - $p)) * 1000000
                       div (CAST($n AS DECIMAL(38,0)) * $n) AS BIGINT)
          ELSE 0 END"""
    val wb = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    bins
      .withColumn("nl", sum("n_b").over(wb))
      .withColumn("pl", sum("pos_b").over(wb))
      .filter(col("bin") < nBins - 1)
      .crossJoin(broadcast(tot))
      .select(
        col("bin").as("threshold_bin"),
        col("nl").as("n_left"),
        col("pl").as("pos_left"),
        (col("n") - col("nl")).as("n_right"),
        (col("pos") - col("pl")).as("pos_right"),
        expr(gini("n", "pos")).as("gini_parent_e6"),
        expr(s"""CAST((CAST(nl AS DECIMAL(38,0)) * (${gini("nl", "pl")})
                   + CAST(n - nl AS DECIMAL(38,0)) * (${gini("(n - nl)", "(pos - pl)")}))
                  div n AS BIGINT)""").as("gini_split_e6"))
      .withColumn("gain_e6", col("gini_parent_e6") - col("gini_split_e6"))
      .withColumn(
        "is_best",
        (row_number().over(Window.orderBy(col("gain_e6").desc, col("threshold_bin"))) === 1)
          .cast("long"))
  }

  /** #358 Population Stability Index (PSI) drift monitor: per event
    * type, the industry-standard drift score of each week's VALUE
    * distribution against the first (baseline) week —
    * PSI = Σ_bins (p−q)·ln(p/q), read against the conventional
    * 0.10 (watch) / 0.25 (act) thresholds. The model-monitoring
    * counterpart of the text family's KL/JS/KS (#119/#311/#190):
    * those measure corpus drift, PSI is what an ML-ops dashboard
    * actually alarms on, thresholds included. 10 equal-width cent
    * bins from a 1-row min/max broadcast; add-half-count smoothing
    * (p = (c+½)/(n+B/2) as the integer ratio (2c+1)/(2n+B)) keeps
    * empty bins finite without dropping them; each term is a float
    * of INTEGER ratios e6-quantized before the order-free sum (#119
    * discipline). One (type, week, bin) aggregate + margins — linear,
    * no windows.
    */
  def psi(spark: SparkSession, dir: String, nBins: Int = 10): DataFrame = {
    val nsPerWeek = 7L * 86400L * 1000000000L
    val ev = Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        expr(s"ts div ${nsPerWeek}L").as("week"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
    val bounds = ev.agg(min("c").as("lo"), max("c").as("hi"), min("week").as("w0"))
    val binned = ev
      .crossJoin(broadcast(bounds))
      .select(
        col("event_type"),
        (col("week") - col("w0")).as("week_idx"),
        expr(s"((c - lo) * $nBins) div (hi - lo + 1)").as("bin"))
    val cells = binned
      .groupBy("event_type", "week_idx", "bin")
      .agg(count(lit(1)).as("cnt"))
    val weekTot = cells.groupBy("event_type", "week_idx").agg(sum("cnt").as("n_w"))
    // complete the (type, week) × bin grid so empty bins carry their
    // smoothed mass on BOTH sides of the ratio
    val grid = weekTot
      .crossJoin(spark.range(0, nBins).select(col("id").as("bin")))
      .join(cells, Seq("event_type", "week_idx", "bin"), "left")
      .select(
        col("event_type"),
        col("week_idx"),
        col("bin"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        col("n_w"))
    val base = grid
      .filter(col("week_idx") === 0)
      .select(
        col("event_type"),
        col("bin"),
        col("cnt").as("cnt0"),
        col("n_w").as("n_0"))
    grid
      .filter(col("week_idx") > 0)
      .join(base, Seq("event_type", "bin"))
      .withColumn(
        "term_e6",
        floor(
          (((col("cnt") * 2 + 1).cast("double") / (col("n_w") * 2 + nBins))
            - ((col("cnt0") * 2 + 1).cast("double") / (col("n_0") * 2 + nBins)))
            * log(
              ((col("cnt") * 2 + 1).cast("double") / (col("n_w") * 2 + nBins))
                / ((col("cnt0") * 2 + 1).cast("double") / (col("n_0") * 2 + nBins)))
            * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy("event_type", "week_idx")
      .agg(max("n_w").as("n_events"), sum("term_e6").as("psi_e6"))
      .select(
        col("event_type"),
        col("week_idx"),
        col("n_events"),
        col("psi_e6"),
        (col("psi_e6") > 100000L).cast("long").as("flag_watch"),
        (col("psi_e6") > 250000L).cast("long").as("flag_act"))
  }

  /** #361 Tukey-fence outlier profile: per order priority, the
    * 1.5·IQR box-plot rule — Q1/Q3 as #106 rank-defined lower
    * quartiles, fences Q1 − 3·IQR div 2 and Q3 + 3·IQR div 2 (the
    * ×1.5 exact as div 2 on cents), outlier counts and rates per
    * side. THE profiling vocabulary every BI tool draws; #88's MAD
    * flags by robust z-score, Tukey is the distribution-free box
    * rule reviewers actually read. One priority-partitioned rank
    * window + one aggregate; never global.
    */
  def tukeyFences(spark: SparkSession, dir: String): DataFrame = {
    val vals = Tables
      .orders(spark, dir)
      .select(
        col("o_orderpriority").as("g"),
        col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
    val w = Window.partitionBy("g").orderBy(col("c"), col("o_orderkey"))
    val q = vals
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy("g")))
      .groupBy("g")
      .agg(
        max("nn").as("n"),
        max(when(col("rn") === expr("(nn + 3) div 4"), col("c"))).as("q1"),
        max(when(col("rn") === expr("(3 * nn + 3) div 4"), col("c"))).as("q3"))
      .withColumn("iqr", col("q3") - col("q1"))
      .withColumn("lo_fence", expr("q1 - (3 * iqr) div 2"))
      .withColumn("hi_fence", expr("q3 + (3 * iqr) div 2"))
    vals
      .join(broadcast(q), "g")
      .groupBy(
        col("g").as("priority"),
        col("n"),
        col("q1"),
        col("q3"),
        col("iqr"),
        col("lo_fence"),
        col("hi_fence"))
      .agg(
        sum((col("c") < col("lo_fence")).cast("long")).as("n_below"),
        sum((col("c") > col("hi_fence")).cast("long")).as("n_above"))
      .withColumn(
        "outlier_rate_e6",
        expr("CAST((n_below + n_above) * 1000000 div n AS BIGINT)"))
  }

  /** #363 Month-over-month revenue bridge (the finance waterfall):
    * each month's GMV delta decomposed EXACTLY into new-part revenue,
    * churned-part revenue, price effect, volume effect and the cross
    * term — the "why did revenue move" slide every monthly review
    * opens with (#310's indices answer "how much is price overall";
    * the bridge attributes the delta part-by-part and adds the
    * assortment flows #332 only counts). On the reconstructed grid
    * rev' = p·q with p = rev div q per (part, month) — truncating
    * unit price, both engines — the identity
    * rev'₁ − rev'₀ = new − churned + Σ(p₁−p₀)q₀ + Σ(q₁−q₀)p₀ +
    * Σ(p₁−p₀)(q₁−q₀) telescopes EXACTLY (algebra, no rounding
    * slack; spec pins it). One (part, month) aggregate + one
    * adjacent-month full-outer join on part (never a set product) +
    * a ≤#months rollup. All BIGINT cents.
    */
  def revenueBridge(spark: SparkSession, dir: String): DataFrame = {
    val pm = Tables
      .lineitem(spark, dir)
      .select(
        col("l_partkey"),
        expr("CAST(year(CAST(l_shipdate AS DATE)) * 12 + month(CAST(l_shipdate AS DATE)) - 1 AS BIGINT)")
          .as("m"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("r"))
      .groupBy("l_partkey", "m")
      .agg(sum("q").as("q"), sum("r").as("r"))
      .filter(col("q") >= 1)
      .select(col("l_partkey"), col("m"), col("q"), expr("r div q").as("p"))
      .localCheckpoint(eager = false)
    val cur = pm.select(col("l_partkey"), col("m"), col("q").as("q1"), col("p").as("p1"))
    val prev = pm.select(col("l_partkey"), (col("m") + 1).as("m"), col("q").as("q0"), col("p").as("p0"))
    val joined = cur.join(prev, Seq("l_partkey", "m"), "full_outer")
    // months present in BOTH the current and previous frames — the
    // first month has no bridge
    val months = pm.select(col("m")).distinct()
    val validM = months
      .join(months.select((col("m") + 1).as("m")), Seq("m"), "left_semi")
    joined
      .join(validM, Seq("m"), "left_semi")
      .groupBy("m")
      .agg(
        sum(when(col("q0").isNull, lit(1L)).otherwise(0L)).as("n_new"),
        sum(when(col("q0").isNull, col("p1") * col("q1")).otherwise(0L)).as("new_rev"),
        sum(when(col("q1").isNull, lit(1L)).otherwise(0L)).as("n_churned"),
        sum(when(col("q1").isNull, col("p0") * col("q0")).otherwise(0L)).as("churned_rev"),
        sum(when(col("q0").isNotNull && col("q1").isNotNull,
          (col("p1") - col("p0")) * col("q0")).otherwise(0L)).as("price_effect"),
        sum(when(col("q0").isNotNull && col("q1").isNotNull,
          (col("q1") - col("q0")) * col("p0")).otherwise(0L)).as("volume_effect"),
        sum(when(col("q0").isNotNull && col("q1").isNotNull,
          (col("p1") - col("p0")) * (col("q1") - col("q0"))).otherwise(0L)).as("cross_effect"),
        sum(coalesce(col("p1") * col("q1"), lit(0L))).as("rev1"),
        sum(coalesce(col("p0") * col("q0"), lit(0L))).as("rev0"))
      .select(
        col("m").as("month"),
        (col("rev1") - col("rev0")).as("total_delta_cents"),
        col("n_new"),
        col("new_rev"),
        col("n_churned"),
        col("churned_rev"),
        col("price_effect"),
        col("volume_effect"),
        col("cross_effect"))
  }

  /** #315 K-truss decomposition (convergence-adaptive edge peeling):
    * the maximal subgraph of the co-purchase graph in which every
    * EDGE sits in ≥ k−2 triangles — one cohesion rung above #200's
    * k-core (degree is gameable by stars; triangle support is not),
    * the community-backbone extraction literature recommends when
    * k-core keeps too much periphery. Each round recomputes per-edge
    * triangle support on the SURVIVING subgraph (a removed edge
    * un-closes its triangles, so support only falls — peeling is
    * monotone) and drops edges below k−2; exits early the first
    * round that removes nothing (per-round edge count doubles as the
    * convergence scalar and the checkpoint materialization, the #200
    * protocol), capped at `maxRounds` with a `converged` column.
    * Removal is IDEMPOTENT at the fixpoint, so the DuckDB oracle
    * unrolls all rounds (every CTE MATERIALIZED — each round
    * references the previous three times) and compares bit-exactly
    * to an early-exited run. Per round: two self-joins on node keys
    * + one counting agg — all hash exchanges; wedge fan-out is the
    * #176 oriented bound Σ outdeg². Output: surviving edges with
    * their within-truss support. Default k = 3 (every surviving edge
    * triangle-supported): the synthetic support-2 co-purchase graph
    * holds NO 4-truss beyond sf0.001, and the 3-truss stays
    * non-vacuous at every test SF.
    */
  def ktruss(spark: SparkSession, dir: String, k: Int = 3, maxRounds: Int = 8): DataFrame =
    Lineage.checkpointReleasing(spark) { implicit scope =>
    val baskets = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set("l_partkey")).as("parts"))
    var edges = baskets
      .select(
        explode(
          expr(
            """flatten(transform(parts, (x, i) ->
                 transform(slice(parts, i + 2, size(parts)),
                   y -> named_struct('pa', x, 'pb', y))))"""))
          .as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 2)
      .select("pa", "pb")
      .cp(eager = true)
    var nEdges = edges.count()
    var converged = false
    var round = 0
    while (round < maxRounds && !converged) {
      round += 1
      val keep = edgeSupport(edges).filter(col("support") >= k - 2).select("pa", "pb")
      edges = edges
        .join(keep, Seq("pa", "pb"), "left_semi")
        .cp(eager = true)
      val n = edges.count()
      converged = n == nEdges
      nEdges = n
    }
    (edges
      .join(edgeSupport(edges), Seq("pa", "pb"))
      .select(
        col("pa"),
        col("pb"),
        col("support"),
        lit(if (converged) 1L else 0L).as("converged")), Seq.empty)
  }

  /** #316 Croston intermittent-demand smoothing: per part, the
    * two-track exponential state Croston (1972) built for series that
    * are mostly ZERO — separate smoothings of demand SIZE z and
    * inter-demand INTERVAL p, updated only on demand days, forecast
    * rate z/p — the spare-parts/slow-mover forecaster where #250's
    * Holt (which smooths the zeros in) systematically under-biases.
    * Completes the inventory family: #256 reorder point, #300 EOQ,
    * #312 newsvendor, and now the demand-RATE model they consume.
    *
    * All-integer dyadic α = ¼ with SIGN-FACTORED truncating division
    * (#250's cross-engine discipline); state init (z₁ = first demand,
    * p₁ = 1 day, documented convention) avoids lookahead; p ≥ 1 by
    * induction (gaps ≥ 1), so the rate quotient is always defined.
    * The fold is sequential by definition but runs inside one
    * collected array scalar per part (the #234/#250 bounded-model-
    * state pattern — demand-day count is calendar-bounded); the
    * DuckDB oracle replays the identical trajectory as a per-part
    * recursive CTE. One (part, day) aggregate + one part-keyed
    * collect; no windows over unbounded data.
    */
  def croston(spark: SparkSession, dir: String): DataFrame = {
    def q4(a: String) = s"(CASE WHEN ($a) < 0 THEN -((-($a)) div 4) ELSE ($a) div 4 END)"
    val daily = Tables
      .lineitem(spark, dir)
      .select(
        col("l_partkey"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q"))
      .groupBy("l_partkey", "day")
      .agg(sum("q").as("y"))
    daily
      .groupBy("l_partkey")
      .agg(expr("sort_array(collect_list(named_struct('day', day, 'y', y)))").as("steps"))
      .select(
        col("l_partkey"),
        explode(
          expr(s"""transform(steps, (x, i) -> named_struct(
                     'day', x.day, 'q', x.y,
                     'st', aggregate(slice(steps, 2, i),
                             named_struct('z', element_at(steps, 1).y, 'p', 1L,
                                          'd', element_at(steps, 1).day),
                             (acc, s) -> named_struct(
                               'z', acc.z + ${q4("s.y - acc.z")},
                               'p', acc.p + ${q4("(s.day - acc.d) - acc.p")},
                               'd', s.day))))"""))
          .as("h"))
      .select(
        col("l_partkey"),
        col("h.day").as("day"),
        col("h.q").as("demand_qty"),
        col("h.st.z").as("z_size"),
        col("h.st.p").as("p_interval"),
        expr("CAST(CAST(h.st.z AS DECIMAL(38,0)) * 1000 div h.st.p AS BIGINT)")
          .as("rate_e3"))
  }

  /** #317 Link-prediction backtest: does #283's common-neighbor
    * scorer actually PREDICT? Time-split holdout — train = orders
    * before the calendar midpoint (the #286 split), test = after;
    * score every non-edge of the TRAIN co-purchase graph with #283's
    * hub-capped common-neighbor Jaccard, take the top-K by the same
    * (jaccard, cn, pa, pb) total order, and measure precision@K
    * against pairs that NEWLY co-occur in test (≥1 shared test
    * order, not a train edge). Lift compares against the base rate
    * over ALL scored candidates — "is ranking by the score better
    * than drawing any candidate" — the scorecard-beside-the-
    * approximation pattern (#238/#245 discipline: a prediction
    * operator ships WITH its evaluation). All counts exact BIGINTs;
    * precision/lift e6 truncating quotients. Scale shape identical
    * to #283 (wedge fan-out hub-capped at Σ min(deg,cap)²) plus two
    * linear pair extractions; the summary is one row.
    */
  def linkPredBacktest(
      spark: SparkSession,
      dir: String,
      minOrders: Int = LinkPredMinOrders,
      maxCenterDeg: Int = LinkPredMaxCenterDeg,
      topK: Int = LinkPredTopK): DataFrame = {
    val ordDay = Tables
      .orders(spark, dir)
      .select(
        col("o_orderkey").as("l_orderkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"))
    val mid = ordDay.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
    val li = Tables
      .lineitem(spark, dir)
      .select("l_orderkey", "l_partkey")
      .join(ordDay, "l_orderkey")
      .crossJoin(broadcast(mid))
    def pairsOf(df: DataFrame): DataFrame =
      df.groupBy("l_orderkey")
        .agg(array_sort(collect_set("l_partkey")).as("parts"))
        .select(
          explode(
            expr(
              """flatten(transform(parts, (x, i) ->
                   transform(slice(parts, i + 2, size(parts)),
                     y -> named_struct('pa', x, 'pb', y))))"""))
            .as("p"))
        .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .groupBy("pa", "pb")
        .agg(count(lit(1)).as("n_orders"))
    val e = pairsOf(li.filter(col("day") < col("mid")))
      .filter(col("n_orders") >= minOrders)
      .select("pa", "pb")
      .localCheckpoint(eager = false)
    val testNew = pairsOf(li.filter(col("day") >= col("mid")))
      .select("pa", "pb")
      .join(e, Seq("pa", "pb"), "left_anti")
      .localCheckpoint(eager = false)
    val deg = e
      .select(col("pa").as("node"))
      .unionAll(e.select(col("pb").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("deg"))
    val adj = e
      .select(col("pa").as("u"), col("pb").as("v"))
      .unionAll(e.select(col("pb").as("u"), col("pa").as("v")))
      .join(
        deg.filter(col("deg") <= maxCenterDeg).select(col("node").as("u")),
        Seq("u"),
        "left_semi")
    val cand = adj
      .join(adj.select(col("u"), col("v").as("w")), Seq("u"))
      .filter(col("v") < col("w"))
      .groupBy(col("v").as("pa"), col("w").as("pb"))
      .agg(count(lit(1)).as("cn"))
      .join(e, Seq("pa", "pb"), "left_anti")
      .join(deg.select(col("node").as("pa"), col("deg").as("deg_a")), "pa")
      .join(deg.select(col("node").as("pb"), col("deg").as("deg_b")), "pb")
      .withColumn("jaccard_e6", expr("CAST(cn * 1000000 div (deg_a + deg_b - cn) AS BIGINT)"))
      .join(testNew.withColumn("is_new", lit(1L)), Seq("pa", "pb"), "left")
      .withColumn("is_new", coalesce(col("is_new"), lit(0L)))
      .localCheckpoint(eager = false)
    val top = cand
      .orderBy(col("jaccard_e6").desc, col("cn").desc, col("pa"), col("pb"))
      .limit(topK)
    val candAgg = cand.agg(
      count(lit(1)).as("n_candidates"),
      coalesce(sum("is_new"), lit(0L)).as("base_hits"))
    val trainAgg = e.agg(count(lit(1)).as("n_train_edges"))
    val testAgg = testNew.agg(count(lit(1)).as("n_test_new"))
    top
      .agg(count(lit(1)).as("k_used"), coalesce(sum("is_new"), lit(0L)).as("topk_hits"))
      .crossJoin(broadcast(trainAgg))
      .crossJoin(broadcast(testAgg))
      .crossJoin(broadcast(candAgg))
      .select(
        col("n_train_edges"),
        col("n_test_new"),
        col("n_candidates"),
        col("base_hits"),
        col("k_used"),
        col("topk_hits"),
        expr("""CASE WHEN k_used > 0
                THEN CAST(topk_hits * 1000000 div k_used AS BIGINT)
                ELSE NULL END""").as("precision_e6"),
        expr("""CASE WHEN base_hits > 0 AND k_used > 0 THEN
                  CAST(CAST(topk_hits AS DECIMAL(38,0)) * n_candidates * 1000000
                    div (CAST(k_used AS DECIMAL(38,0)) * base_hits) AS BIGINT)
                ELSE NULL END""").as("lift_e6"))
  }

  /** #318 Theil T index with nation decomposition: customer-revenue
    * inequality in nats, split EXACTLY (up to quantization) into
    * within-nation and between-nation components — the decomposition
    * #180's Gini famously lacks (Gini's between/within terms overlap;
    * Theil's are additive), so "is inequality a country story or a
    * within-country story" is answerable. T = Σ(xᵢ/X)·ln(xᵢ·n/X);
    * within-g replaces (X, n) with the group's; between is the
    * ≤|nations|-term Σ(X_g/X)·ln(X_g·n/(X·n_g)). Every float term is
    * a double of INTEGER ratios e6-quantized before the
    * order-independent sum (#119's discipline); shares are exact
    * integer quotients. Zero-revenue customers carry no mass
    * (x·ln x → 0) and are excluded by contract. One customer-grain
    * aggregate + one nation join + ≤|nations| rollups; no windows.
    * T = Σ s_g·T_g + T_between holds within per-term quantization —
    * spec-pinned with the matching slack.
    */
  def theil(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("o_custkey")
      .agg(sum("c").as("x"))
      .filter(col("x") >= 1)
      .join(
        Tables
          .customer(spark, dir)
          .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
        "o_custkey")
      .join(
        broadcast(
          Tables.nation(spark, dir).select(col("n_nationkey").as("c_nationkey"), col("n_name"))),
        "c_nationkey")
      .select(col("n_name"), col("x"))
    val groups = cust.groupBy("n_name").agg(count(lit(1)).as("n_g"), sum("x").as("x_g"))
    val total = groups.agg(sum("n_g").as("n"), sum("x_g").as("xt"))
    val terms = cust
      .join(broadcast(groups), "n_name")
      .crossJoin(broadcast(total))
      .withColumn(
        "t_term_e6",
        floor(
          (col("x").cast("double") / col("xt")) *
            log(col("x").cast("double") * col("n") / col("xt")) * lit(1e6) + lit(0.5))
          .cast("long"))
      .withColumn(
        "w_term_e6",
        floor(
          (col("x").cast("double") / col("x_g")) *
            log(col("x").cast("double") * col("n_g") / col("x_g")) * lit(1e6) + lit(0.5))
          .cast("long"))
    val byNation = terms
      .groupBy("n_name", "n_g", "x_g", "n", "xt")
      .agg(sum("t_term_e6").as("t_part_e6"), sum("w_term_e6").as("t_within_e6"))
    val tTotal = byNation
      .agg(sum("t_part_e6").as("t_total_e6"))
    byNation
      .crossJoin(broadcast(tTotal))
      .select(
        col("n_name"),
        col("n_g").as("n_cust"),
        col("x_g").as("revenue_cents"),
        expr("CAST(CAST(x_g AS DECIMAL(38,0)) * 1000000 div xt AS BIGINT)").as("share_e6"),
        col("t_within_e6"),
        floor(
          (col("x_g").cast("double") / col("xt")) *
            log(
              col("x_g").cast("double") * col("n") /
                (col("xt").cast("double") * col("n_g"))) * lit(1e6) + lit(0.5))
          .cast("long")
          .as("between_e6"),
        col("t_total_e6"))
  }

  /** #319 Propensity-stratified treatment effect: does carrying a
    * PROMO-part line associate with an order completing (status 'F'),
    * after stratifying on order value — the subclassification
    * estimator (Cochran 1968, Rosenbaum & Rubin's recommended 5–10
    * strata) that completes the causal shelf: #286 DiD removes time
    * confounding, this removes an OBSERVED covariate confounder
    * (order size correlates with both basket composition and
    * completion). Strata = 10 equal-width cents bins of o_totalprice
    * from a 1-row min/max broadcast (#233's binning); per stratum the
    * treated/control completion rates (e6 truncating), their
    * difference, and an `in_support` flag (both arms present —
    * off-support strata are excluded, the common-support rule);
    * ATE = Σ n_s·diff_s div N over supported strata — integer weights
    * on already-truncated diffs, deterministic in both engines. One
    * order-grain semi-join + two ≤10-row rollups; no windows.
    */
  def propensityStrata(spark: SparkSession, dir: String): DataFrame = {
    val promoParts = Tables
      .part(spark, dir)
      .filter(col("p_type").startsWith("PROMO"))
      .select(col("p_partkey").as("l_partkey"))
    val treatedOrders = Tables
      .lineitem(spark, dir)
      .join(broadcast(promoParts), Seq("l_partkey"), "left_semi")
      .select(col("l_orderkey").as("o_orderkey"))
      .distinct()
      .withColumn("treated", lit(1L))
    val ords = Tables
      .orders(spark, dir)
      .select(
        col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("bal"),
        (col("o_orderstatus") === "F").cast("long").as("outcome"))
      .join(treatedOrders, Seq("o_orderkey"), "left")
      .withColumn("treated", coalesce(col("treated"), lit(0L)))
    val bounds = ords.agg(min("bal").as("lo"), max("bal").as("hi"))
    val strata = ords
      .crossJoin(broadcast(bounds))
      .withColumn("stratum", expr("((bal - lo) * 10) div (hi - lo + 1)"))
      .groupBy("stratum")
      .agg(
        sum(when(col("treated") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("treated") === 1, col("outcome")).otherwise(0L)).as("y_t"),
        sum(when(col("treated") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("treated") === 0, col("outcome")).otherwise(0L)).as("y_c"))
      .withColumn("in_support", (col("n_t") >= 1 && col("n_c") >= 1).cast("long"))
      .withColumn(
        "rate_t_e6",
        expr("CASE WHEN n_t > 0 THEN CAST(y_t * 1000000 div n_t AS BIGINT) ELSE NULL END"))
      .withColumn(
        "rate_c_e6",
        expr("CASE WHEN n_c > 0 THEN CAST(y_c * 1000000 div n_c AS BIGINT) ELSE NULL END"))
      .withColumn(
        "diff_e6",
        expr("""CASE WHEN in_support = 1
                THEN rate_t_e6 - rate_c_e6 ELSE NULL END"""))
    val ate = strata
      .filter(col("in_support") === 1)
      .agg(
        sum(expr("n_t + n_c")).as("n_supported"),
        sum(expr("(n_t + n_c) * diff_e6")).as("wsum"))
      .select(
        col("n_supported"),
        expr("""CAST(CASE WHEN wsum < 0 THEN -1 ELSE 1 END
                 * (abs(CAST(wsum AS DECIMAL(38,0))) div n_supported) AS BIGINT)""")
          .as("ate_e6"))
    strata.crossJoin(broadcast(ate))
  }

  /** #320 Welch unequal-variance t test (squared form): do PROMO and
    * non-promo line revenues differ in MEAN — the parametric
    * counterpart to #288's rank test on the identical frame (rank
    * test moves only with order; this with magnitude — run both, and
    * disagreement itself is the skew/outlier diagnostic). Everything
    * staged integer quotients so no engine meets a float or a √:
    * aᵢ = s²ᵢ/nᵢ as ONE truncating division of DECIMAL(38,0) moment
    * forms (nᵢΣx²−S²ᵢ) by n²ᵢ(nᵢ−1); mean gap d in whole cents
    * (sign-factored); t² on the e6 grid as d²·10⁶ div (a₁+a₂) — the
    * #254 squared-statistic trick (compare t² to z²_crit, no sqrt
    * anywhere); Welch–Satterthwaite df on the e3 grid from the same
    * aᵢ via a second staged quotient. One partial-agg moment pass,
    * 1-row output, no windows.
    */
  def welchT(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .join(
        broadcast(
          Tables
            .part(spark, dir)
            .select(
              col("p_partkey").as("l_partkey"),
              col("p_type").startsWith("PROMO").cast("long").as("t"))),
        "l_partkey")
      .select(
        col("t"),
        expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)")
          .as("c"))
      .agg(
        sum(when(col("t") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("t") === 1, col("c")).otherwise(0L)).as("s1"),
        sum(when(col("t") === 1, expr("CAST(c AS DECIMAL(38,0)) * c")).otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("q1"),
        sum(when(col("t") === 0, 1L).otherwise(0L)).as("n2"),
        sum(when(col("t") === 0, col("c")).otherwise(0L)).as("s2"),
        sum(when(col("t") === 0, expr("CAST(c AS DECIMAL(38,0)) * c")).otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("q2"))
      .withColumn(
        "a1",
        expr("""(CAST(n1 AS DECIMAL(38,0)) * q1 - CAST(s1 AS DECIMAL(38,0)) * s1)
                 div (CAST(n1 AS DECIMAL(38,0)) * n1 * (n1 - 1))"""))
      .withColumn(
        "a2",
        expr("""(CAST(n2 AS DECIMAL(38,0)) * q2 - CAST(s2 AS DECIMAL(38,0)) * s2)
                 div (CAST(n2 AS DECIMAL(38,0)) * n2 * (n2 - 1))"""))
      .withColumn(
        "d_cents",
        expr("""CAST(CASE WHEN CAST(s1 AS DECIMAL(38,0)) * n2 - CAST(s2 AS DECIMAL(38,0)) * n1 < 0
                       THEN -1 ELSE 1 END
                 * (abs(CAST(s1 AS DECIMAL(38,0)) * n2 - CAST(s2 AS DECIMAL(38,0)) * n1)
                    div (CAST(n1 AS DECIMAL(38,0)) * n2)) AS BIGINT)"""))
      .select(
        col("n1"),
        col("n2"),
        expr("s1 div n1").as("mean1_cents"),
        expr("s2 div n2").as("mean2_cents"),
        col("d_cents"),
        expr("CAST(a1 AS BIGINT)").as("se2_1_c2"),
        expr("CAST(a2 AS BIGINT)").as("se2_2_c2"),
        expr("""CASE WHEN a1 + a2 >= 1 THEN
                  CAST(CAST(d_cents AS DECIMAL(38,0)) * d_cents * 1000000 div (a1 + a2) AS BIGINT)
                ELSE NULL END""").as("t2_e6"),
        expr("""CASE WHEN CAST(a1 AS DECIMAL(38,0)) * a1 div (n1 - 1)
                     + CAST(a2 AS DECIMAL(38,0)) * a2 div (n2 - 1) >= 1 THEN
                  CAST((CAST(a1 AS DECIMAL(38,0)) + a2) * (CAST(a1 AS DECIMAL(38,0)) + a2) * 1000
                    div (CAST(a1 AS DECIMAL(38,0)) * a1 div (n1 - 1)
                         + CAST(a2 AS DECIMAL(38,0)) * a2 div (n2 - 1)) AS BIGINT)
                ELSE NULL END""").as("df_e3"))

  /** #337 Kendall τ-b: rank correlation of daily order COUNT vs daily
    * REVENUE over the per-day frame — the tie-robust ordinal
    * association (are busy days rich days, monotonically?) beside
    * #243's Spearman (Spearman squares rank gaps and moves with tie
    * structure; τ-b counts pair inversions and corrects BOTH margins).
    * Everything exact: per day-pair a sign comparison (concordant /
    * discordant / tied-x / tied-y counted in one aggregate),
    * τ-b = (C−D)·10⁶ div √((n₀−Tx)(n₀−Ty)) with the √ via the #226
    * one-ulp-clamp exact isqrt (the product ≤ n₀² keeps it in the
    * double-exactness domain far past this corpus), sign factored out
    * first. The pair fan-out is (#days choose 2) — calendar-bounded,
    * never row-bounded; the day frame broadcasts so the pair join is
    * a broadcast NLJ, not a shuffle.
    */
  def kendallTau(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("day")
      .agg(count(lit(1)).as("x"), sum("c").as("y"))
    val pairs = byDay.alias("a")
      .join(broadcast(byDay.alias("b")), col("a.day") < col("b.day"))
      .select(
        expr("CAST(sign(b.x - a.x) AS BIGINT)").as("sx"),
        expr("CAST(sign(b.y - a.y) AS BIGINT)").as("sy"))
    pairs
      .agg(
        count(lit(1)).as("n0"),
        sum(when(expr("sx * sy = 1"), 1L).otherwise(0L)).as("n_c"),
        sum(when(expr("sx * sy = -1"), 1L).otherwise(0L)).as("n_d"),
        sum(when(col("sx") === 0, 1L).otherwise(0L)).as("tx"),
        sum(when(col("sy") === 0, 1L).otherwise(0L)).as("ty"))
      .withColumn(
        "den2",
        expr("CAST((n0 - tx) AS DECIMAL(38,0)) * (n0 - ty)"))
      .withColumn("s0", expr("CAST(floor(sqrt(CAST(den2 AS DOUBLE))) AS BIGINT)"))
      .withColumn(
        "den",
        expr("""s0 + (CASE WHEN (CAST(s0 AS DECIMAL(38,0)) + 1) * (s0 + 1) <= den2 THEN 1 ELSE 0 END)
                   - (CASE WHEN CAST(s0 AS DECIMAL(38,0)) * s0 > den2 THEN 1 ELSE 0 END)"""))
      .select(
        col("n0"),
        col("n_c"),
        col("n_d"),
        col("tx").as("ties_x"),
        col("ty").as("ties_y"),
        expr("""CASE WHEN den > 0 THEN
                  CAST(CASE WHEN n_c >= n_d THEN 1 ELSE -1 END
                    * (abs(CAST(n_c AS DECIMAL(38,0)) - n_d) * 1000000 div den) AS BIGINT)
                ELSE NULL END""").as("tau_b_e6"))
  }

  /** #338 Cohen's d / Hedges' g: the standardized mean difference of
    * promo vs non-promo line revenue — the EFFECT SIZE #320's Welch t
    * only tests (a significant t on a big corpus can be a trivial d;
    * reviews want the magnitude, not the p). Pooled SD from staged
    * integer quotients of the same DECIMAL(38,0) moment forms
    * ((nᵢ−1)s²ᵢ = (nᵢΣx²−S²ᵢ) div nᵢ, one truncation each), σ_pooled
    * via the #226 one-ulp-clamp exact isqrt, d = exact mean-gap
    * numerator (S₁n₂ − S₂n₁) over n₁n₂σ as one sign-factored e6
    * truncating quotient; Hedges' small-sample correction
    * g = d − 3d div (4(n₁+n₂)−9) stays on the grid. One partial-agg
    * moment pass, 1 row, no windows.
    */
  def cohensD(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .join(
        broadcast(
          Tables
            .part(spark, dir)
            .select(
              col("p_partkey").as("l_partkey"),
              col("p_type").startsWith("PROMO").cast("long").as("t"))),
        "l_partkey")
      .select(
        col("t"),
        expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)")
          .as("c"))
      .agg(
        sum(when(col("t") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("t") === 1, col("c")).otherwise(0L)).as("s1"),
        sum(when(col("t") === 1, expr("CAST(c AS DECIMAL(38,0)) * c"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("q1"),
        sum(when(col("t") === 0, 1L).otherwise(0L)).as("n2"),
        sum(when(col("t") === 0, col("c")).otherwise(0L)).as("s2"),
        sum(when(col("t") === 0, expr("CAST(c AS DECIMAL(38,0)) * c"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("q2"))
      // sp² = Σᵢ (nᵢΣx²−S²ᵢ) / (nᵢ(n₁+n₂−2)): dividing each group's
      // moment form by its FULL denominator first keeps every staged
      // quotient variance-sized (≈10¹³ cents²) at any SF — the interim
      // (nᵢ−1)s²ᵢ form crosses 2⁶³ (div lands on BIGINT) at ~sf1
      .withColumn(
        "v1",
        expr("""(CAST(n1 AS DECIMAL(38,0)) * q1 - CAST(s1 AS DECIMAL(38,0)) * s1)
                 div (CAST(n1 AS DECIMAL(38,0)) * (n1 + n2 - 2))"""))
      .withColumn(
        "v2",
        expr("""(CAST(n2 AS DECIMAL(38,0)) * q2 - CAST(s2 AS DECIMAL(38,0)) * s2)
                 div (CAST(n2 AS DECIMAL(38,0)) * (n1 + n2 - 2))"""))
      .withColumn("sp2", expr("v1 + v2"))
      .withColumn("s0", expr("CAST(floor(sqrt(CAST(sp2 AS DOUBLE))) AS BIGINT)"))
      .withColumn(
        "sp",
        expr("""s0 + (CASE WHEN (CAST(s0 AS DECIMAL(38,0)) + 1) * (s0 + 1) <= sp2 THEN 1 ELSE 0 END)
                   - (CASE WHEN CAST(s0 AS DECIMAL(38,0)) * s0 > sp2 THEN 1 ELSE 0 END)"""))
      .withColumn(
        "d_e6",
        expr("""CASE WHEN sp > 0 THEN
                  CAST(CASE WHEN CAST(s1 AS DECIMAL(38,0)) * n2 - CAST(s2 AS DECIMAL(38,0)) * n1 < 0
                         THEN -1 ELSE 1 END
                    * (abs(CAST(s1 AS DECIMAL(38,0)) * n2 - CAST(s2 AS DECIMAL(38,0)) * n1) * 1000000
                       div (CAST(n1 AS DECIMAL(38,0)) * n2 * sp)) AS BIGINT)
                ELSE NULL END"""))
      .select(
        col("n1"),
        col("n2"),
        col("sp").as("pooled_sd_cents"),
        col("d_e6"),
        expr("CAST(d_e6 - (3 * d_e6) div (4 * (n1 + n2) - 9) AS BIGINT)").as("g_e6"))

  /** #339 Cliff's delta: the ordinal effect size
    * δ = P(X₁ > X₂) − P(X₁ < X₂) of promo vs non-promo line revenue —
    * the magnitude companion to #288's Mann–Whitney exactly as #338
    * is to #320's t (U tests; δ sizes, robust to any monotone
    * transform). Reads straight off the SAME doubled-midrank frame:
    * δ = (u1_2x − n₁n₂)/(n₁n₂) — the doubled grid makes the numerator
    * whole — one sign-factored e6 truncating quotient; the standard
    * magnitude bands (0.147/0.33/0.474, Romano et al. 2006) label it.
    */
  def cliffsDelta(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame =
    promoRankAgg(spark, dir, nShards)
      .withColumn(
        "delta_e6",
        expr("""CAST(CASE WHEN u1_2x >= CAST(n1 AS DECIMAL(38,0)) * n2 THEN 1 ELSE -1 END
                 * (abs(CAST(u1_2x AS DECIMAL(38,0)) - CAST(n1 AS DECIMAL(38,0)) * n2) * 1000000
                    div (CAST(n1 AS DECIMAL(38,0)) * n2)) AS BIGINT)"""))
      .select(
        col("n1"),
        col("n2"),
        col("u1_2x"),
        col("delta_e6"),
        expr("""CASE WHEN abs(delta_e6) < 147000 THEN 'negligible'
                     WHEN abs(delta_e6) < 330000 THEN 'small'
                     WHEN abs(delta_e6) < 474000 THEN 'medium'
                     ELSE 'large' END""").as("magnitude"))

  /** #340 One-way ANOVA F: does mean order value differ across the
    * five order priorities — the parametric omnibus beside #309's
    * rank-based Kruskal–Wallis (run both; disagreement is the
    * skew/outlier diagnostic, the #320/#288 pairing at k groups).
    * Integer sums of squares with ONE truncation per group (the #309
    * discipline): SSB = Σ_g(S²_g div n_g) − S² div n,
    * SSW = Σx² − Σ_g(S²_g div n_g), F on e6 as one staged
    * DECIMAL(38,0) quotient (ssb·(n−k)·10⁶) div (ssw·(k−1)).
    * One partial-agg pass + a k-row fold, no windows. WHOLE-DOLLAR
    * grid, not cents: Σ_g S²_g div n_g crosses 2⁶³ on the cents grid
    * already at sf0.01 (`div` lands on BIGINT), and F is a ratio —
    * the 100× coarser grid costs nothing.
    */
  def anovaF(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables
      .orders(spark, dir)
      .select(
        col("o_orderpriority").as("g"),
        expr("CAST(floor(o_totalprice + 0.5) AS BIGINT)").as("c"))
      .groupBy("g")
      .agg(
        count(lit(1)).as("n_g"),
        sum("c").as("s_g"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("q_g"))
    per
      .agg(
        count(lit(1)).as("k"),
        sum("n_g").as("n"),
        sum("s_g").as("s"),
        sum("q_g").as("q"),
        sum(expr("CAST(CAST(s_g AS DECIMAL(38,0)) * s_g div n_g AS DECIMAL(38,0))"))
          .as("bsum"))
      .select(
        col("k"),
        col("n"),
        expr("CAST(bsum - CAST(s AS DECIMAL(38,0)) * s div n AS BIGINT)").as("ssb_d2"),
        expr("CAST(q - bsum AS BIGINT)").as("ssw_d2"),
        expr("""CASE WHEN q - bsum >= 1 THEN
                  CAST((bsum - CAST(s AS DECIMAL(38,0)) * s div n) * (n - k) * 1000000
                    div ((q - bsum) * (k - 1)) AS BIGINT)
                ELSE NULL END""").as("f_e6"))
  }

  /** #341 Brown–Forsythe Levene test: do order-value SPREADS differ
    * across priorities — variance homogeneity, the assumption #340's
    * F quietly makes (run this first; a fat W says trust #309's ranks
    * over #340's means). The robust median-centered form: per group
    * the #106 rank-defined lower median (one PARTITIONED window),
    * z = |x − med_g|, then the #340 one-truncation-per-group F
    * machinery verbatim on z. Group count is the bounded alphabet;
    * everything whole cents.
    */
  def levene(spark: SparkSession, dir: String): DataFrame = {
    val vals = Tables
      .orders(spark, dir)
      .select(
        col("o_orderpriority").as("g"),
        col("o_orderkey"),
        // whole dollars — the #340 overflow rationale, W is a ratio
        expr("CAST(floor(o_totalprice + 0.5) AS BIGINT)").as("c"))
    val w = Window.partitionBy("g").orderBy(col("c"), col("o_orderkey"))
    val med = vals
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy("g")))
      .groupBy("g")
      .agg(max(when(col("rn") === expr("(nn + 1) div 2"), col("c"))).as("med"))
    val per = vals
      .join(broadcast(med), "g")
      .select(col("g"), expr("abs(c - med)").as("z"))
      .groupBy("g")
      .agg(
        count(lit(1)).as("n_g"),
        sum("z").as("s_g"),
        sum(expr("CAST(z AS DECIMAL(38,0)) * z")).as("q_g"))
    per
      .agg(
        count(lit(1)).as("k"),
        sum("n_g").as("n"),
        sum("s_g").as("s"),
        sum("q_g").as("q"),
        sum(expr("CAST(CAST(s_g AS DECIMAL(38,0)) * s_g div n_g AS DECIMAL(38,0))"))
          .as("bsum"))
      .select(
        col("k"),
        col("n"),
        expr("CAST(bsum - CAST(s AS DECIMAL(38,0)) * s div n AS BIGINT)").as("ssb_z2"),
        expr("CAST(q - bsum AS BIGINT)").as("ssw_z2"),
        expr("""CASE WHEN q - bsum >= 1 THEN
                  CAST((bsum - CAST(s AS DECIMAL(38,0)) * s div n) * (n - k) * 1000000
                    div ((q - bsum) * (k - 1)) AS BIGINT)
                ELSE NULL END""").as("w_e6"))
  }

  /** #342 Ljung–Box whiteness test: is daily order revenue's
    * autocorrelation structure jointly zero over lags 1..10 —
    * the portmanteau gate a forecasting pipeline runs on model
    * RESIDUALS (and on the raw series before bothering with #250/#292
    * at all; #324 asks "which single lag dominates", this asks "is
    * there ANY structure"). Per-lag pairwise-complete r² on the e6
    * grid via the #229 factored quotient (the #324 construction
    * verbatim), Q = n(n+2)·Σ_k (r²_k div (n−k)) — one truncation per
    * lag, order-free sum, compare to the χ²₁₀ 95% point 18.307 on the
    * same grid. One day aggregate + a bounded lag self-join; 1 row.
    */
  def ljungBox(spark: SparkSession, dir: String, maxLag: Int = 10): DataFrame = {
    val daily = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("d"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("x"))
      .groupBy("d")
      .agg(sum("x").as("x"))
    val nDf = daily.agg(count(lit(1)).as("n"))
    val lags = spark.range(1, maxLag + 1).select(col("id").as("lag"))
    val pairs = broadcast(lags)
      .join(daily.alias("a"), expr("true"))
      .join(daily.alias("b"), expr("b.d = a.d + lag"))
      .select(col("lag"), col("a.x").as("x"), col("b.x").as("y"))
    val perLag = pairs
      .groupBy("lag")
      .agg(
        count(lit(1)).as("m"),
        sum("x").as("sx"),
        sum("y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .select(
        col("lag"),
        expr("CAST(m AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy").as("num"),
        expr("CAST(m AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx").as("den_x"),
        expr("CAST(m AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy").as("den_y"))
      .filter(col("den_x") > 0 && col("den_y") > 0)
      .select(
        col("lag"),
        expr("(abs(num) * 1000 div den_x) * (abs(num) * 1000 div den_y)").as("r2_e6"))
    perLag
      .crossJoin(broadcast(nDf))
      .select(col("n"), expr("r2_e6 div (n - lag)").as("term"))
      .groupBy("n")
      .agg(count(lit(1)).as("n_lags"), sum("term").as("tsum"))
      .select(
        col("n").as("n_days"),
        col("n_lags"),
        expr("CAST(CAST(n AS DECIMAL(38,0)) * (n + 2) * tsum AS BIGINT)").as("q_e6"),
        lit(18307000L).as("chi2_crit_e6"),
        expr("CAST(CAST(n AS DECIMAL(38,0)) * (n + 2) * tsum > 18307000 AS BIGINT)")
          .as("significant"))
  }

  /** #322 Order↔lineitem reconciliation audit: per order, the header
    * total against the recomputed Σ extendedprice·(1−disc)·(1+tax)
    * over its lines — the cross-entity consistency check every CDC
    * warehouse runs between a header feed and a detail feed (the
    * classic "two systems disagree about money" screen; #190's DQ
    * audit checks per-ROW invariants, this checks a cross-TABLE
    * identity). Reports exact-match and headerless/lineless counts,
    * the signed net drift in cents, and the p50/p90/p99 of per-order
    * relative error (e6) — exact rank-defined percentiles via the
    * #180 hierarchical build on the per-VALUE error frame (ties
    * collapse first; windows ride distinct error values, never
    * orders). On this synthetic corpus the header total is
    * independent of the lines, so the audit reports ~100% mismatch —
    * that IS the finding; the operator's value is the exact shape of
    * the discrepancy distribution.
    */
  def orderReconciliation(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val recomputed = Tables
      .lineitem(spark, dir)
      .select(
        col("l_orderkey"),
        expr("""CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5)
                 AS BIGINT)""").as("lc"))
      .groupBy("l_orderkey")
      .agg(sum("lc").as("recomputed"))
    val j = Tables
      .orders(spark, dir)
      .select(
        col("o_orderkey").as("l_orderkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("total"))
      .join(recomputed, Seq("l_orderkey"), "left")
    val errs = j
      .filter(col("recomputed").isNotNull && col("total") >= 1)
      .withColumn("rel_e6", expr("abs(recomputed - total) * 1000000 div total"))
    val summary = j.agg(
      count(lit(1)).as("n_orders"),
      sum(col("recomputed").isNull.cast("long")).as("n_lineless"),
      sum((col("recomputed") === col("total")).cast("long")).as("n_exact"),
      sum(expr("CASE WHEN recomputed IS NOT NULL THEN recomputed - total ELSE 0 END"))
        .as("net_drift_cents"))
    val byVal = errs.groupBy("rel_e6").agg(count(lit(1)).as("cnt"))
    val bounds = byVal.agg(min("rel_e6").as("lo"), max("rel_e6").as("hi"))
    val sharded = byVal
      .crossJoin(broadcast(bounds))
      .withColumn("shard", expr(s"((rel_e6 - lo) * $nShards) div (hi - lo + 1)"))
    val offsets = sharded
      .groupBy("shard")
      .agg(sum("cnt").as("sc"))
      .withColumn(
        "off",
        coalesce(
          sum("sc").over(Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("shard"), col("off"))
    val ranked = sharded
      .withColumn(
        "cum",
        coalesce(
          sum("cnt").over(
            Window.partitionBy("shard").orderBy("rel_e6")
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .join(broadcast(offsets), "shard")
      .select(col("rel_e6"), (col("off") + col("cum") + 1).as("first_rank"), col("cnt"))
    val total = errs.agg(count(lit(1)).as("n_errs"))
    val targets = spark
      .createDataFrame(Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L)))
      .toDF("pctl", "num", "den")
    targets
      .crossJoin(broadcast(total))
      .withColumn("rank", expr("(n_errs * num + den - 1) div den"))
      .join(
        ranked,
        col("rank") >= col("first_rank") && col("rank") < col("first_rank") + col("cnt"))
      .select(col("pctl"), col("rank"), col("rel_e6").as("rel_err_e6"))
      .crossJoin(broadcast(summary))
  }

  /** #323 Brier score with Murphy decomposition: the order-value
    * score's probabilistic forecast quality on a held-out calendar
    * half — train-half completion rate per value bin becomes the
    * forecast p_b, the test half scores it, and Murphy (1973) splits
    * the Brier mean-squared error into REliability (calibration
    * error), RESolution (how much the bins separate outcomes) and
    * UNCertainty (outcome variance — the no-skill floor):
    * Brier = REL − RES + UNC. Completes the score-evaluation family:
    * #232 AUC ranks, #233 calibration eyeballs, #303 prices the
    * cutoff — this scores the probability NUMBERS on held-out data.
    * All e12-grid integers: per-bin Brier mass expands exactly as
    * o_b·(10⁶−p_b)² + (n_b−o_b)·p_b² with p_b the e6 train rate;
    * REL/RES masses are n_b-weighted squared e6-rate gaps; each
    * component is ONE truncating div N through DECIMAL(38,0)↔HUGEINT
    * so the identity holds within per-bin quantization (spec-pinned
    * with slack). Bins from a 1-row min/max broadcast over BOTH
    * halves (stable bin edges); two linear passes + ≤10-row rollups.
    *
    * Unseen-bin EXCLUSION (explicit, not silent): a test bin with no
    * train rows has no forecast p_b and is dropped from n_test and
    * every Murphy component — with extreme-value bins this can
    * exclude held-out data and bias Brier/REL/RES toward the covered
    * bins. The exclusion is ACCOUNTED: `dropped_bins` /
    * `dropped_rows` in the output count the test-only bins and their
    * orders (0/0 when train covers every test bin, the usual case —
    * the stable shared bin edges make coverage gaps rare). The oracle
    * mirrors the same inner join, so parity holds by construction.
    */
  def brierDecomp(spark: SparkSession, dir: String, nBins: Int = 10): DataFrame = {
    val ords = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("v"),
        (col("o_orderstatus") === "F").cast("long").as("y"))
    val mid = ords.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
    val bounds = ords.agg(min("v").as("lo"), max("v").as("hi"))
    val binned = ords
      .crossJoin(broadcast(mid))
      .crossJoin(broadcast(bounds))
      .withColumn("bin", expr(s"((v - lo) * $nBins) div (hi - lo + 1)"))
      .select(col("bin"), col("y"), (col("day") < col("mid")).cast("long").as("is_train"))
    val train = binned
      .filter(col("is_train") === 1)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_train"), sum("y").as("y_train"))
      .withColumn("p_e6", expr("CAST(y_train * 1000000 div n_train AS BIGINT)"))
    val test = binned
      .filter(col("is_train") === 0)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_b"), sum("y").as("o_b"))
      .withColumn("obar_b_e6", expr("CAST(o_b * 1000000 div n_b AS BIGINT)"))
    val bins = test.join(train.select(col("bin"), col("n_train"), col("p_e6")), "bin")
    // the documented unseen-bin exclusion, accounted: test bins with no
    // train forecast (and their orders) — a 1-row broadcast frame
    val dropped = test
      .join(train.select("bin"), Seq("bin"), "left_anti")
      .agg(
        count(lit(1)).as("dropped_bins"),
        coalesce(sum("n_b"), lit(0L)).as("dropped_rows"))
    val tot = bins.agg(sum("n_b").as("n_test"), sum("o_b").as("o_test"))
    val withTot = bins
      .crossJoin(broadcast(tot))
      .withColumn("obar_e6", expr("CAST(o_test * 1000000 div n_test AS BIGINT)"))
      .withColumn(
        "brier_mass",
        expr("""CAST(o_b AS DECIMAL(38,0)) * (1000000 - p_e6) * (1000000 - p_e6)
                + CAST(n_b - o_b AS DECIMAL(38,0)) * p_e6 * p_e6"""))
      .withColumn(
        "rel_mass",
        expr("""CAST(n_b AS DECIMAL(38,0)) * (p_e6 - obar_b_e6) * (p_e6 - obar_b_e6)"""))
      .withColumn(
        "res_mass",
        expr("""CAST(n_b AS DECIMAL(38,0)) * (obar_b_e6 - obar_e6) * (obar_b_e6 - obar_e6)"""))
    val global = withTot
      .groupBy("n_test", "o_test", "obar_e6")
      .agg(
        sum("brier_mass").as("bm"),
        sum("rel_mass").as("rm"),
        sum("res_mass").as("sm"))
      .select(
        col("n_test"),
        col("obar_e6"),
        expr("CAST(bm div n_test AS BIGINT)").as("brier_e12"),
        expr("CAST(rm div n_test AS BIGINT)").as("rel_e12"),
        expr("CAST(sm div n_test AS BIGINT)").as("res_e12"),
        expr("CAST(CAST(obar_e6 AS DECIMAL(38,0)) * (1000000 - obar_e6) AS BIGINT)")
          .as("unc_e12"))
    withTot
      .select(
        col("bin"),
        col("n_train"),
        col("p_e6"),
        col("n_b"),
        col("o_b"),
        col("obar_b_e6"))
      .crossJoin(broadcast(global))
      .crossJoin(broadcast(dropped))
  }

  /** #324 Dominant-period detection: the lag-2..14 autocorrelation
    * table of daily order revenue with the winning lag — ACF-based
    * periodicity discovery, the data-driven gate BEFORE fitting a
    * seasonal model (#221/#292 assume a period; this asks whether one
    * exists — run it first, and a sub-threshold winner means "use
    * #250 Holt and stop"). Per lag the paired series (d, d+L over
    * days present in both) scores #229's sign-factored e3×e3 r²
    * through DECIMAL(38,0)↔HUGEINT; winner by (signed r² desc, lag
    * asc); the `significant` flag squares the classic |r| > 2/√m
    * white-noise band — r²·m > 4·10⁶ on the e6 grid, no sqrt (the
    * #254 trick). On this corpus NO lag clears the band (max |r| ≈
    * 0.04) — the honest "no dominant period" reading, the #321-kappa
    * class of finding. One day aggregate + one 13-way lag explode +
    * self-join on day; windows none.
    */
  def periodDetect(spark: SparkSession, dir: String, maxLag: Int = 14): DataFrame = {
    val daily = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("d"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("x"))
      .groupBy("d")
      .agg(sum("x").as("x"))
    val lagged = daily
      .select(col("d"), col("x"), explode(expr(s"sequence(2, $maxLag)")).as("lag"))
      .withColumn("d2", col("d") + col("lag"))
      .join(daily.select(col("d").as("d2"), col("x").as("y")), Seq("d2"))
    val perLag = lagged
      .groupBy("lag")
      .agg(
        count(lit(1)).as("m"),
        sum("x").as("sx"),
        sum("y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .select(
        col("lag").cast("long").as("lag"),
        col("m"),
        expr("CAST(m AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy").as("num"),
        expr("CAST(m AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx").as("den_x"),
        expr("CAST(m AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy").as("den_y"))
      .filter(col("den_x") > 0 && col("den_y") > 0)
      .select(
        col("lag"),
        col("m"),
        expr("""CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END *
                 ((abs(num) * 1000 div den_x) * (abs(num) * 1000 div den_y))
                AS BIGINT)""").as("r2_signed_e6"))
      .withColumn(
        "significant",
        expr("CAST(abs(r2_signed_e6) * m > 4000000 AS LONG)"))
    val best = perLag
      .orderBy(col("r2_signed_e6").desc, col("lag"))
      .limit(1)
      .select(col("lag").as("best_lag"), col("r2_signed_e6").as("best_r2_e6"))
    perLag.crossJoin(broadcast(best))
  }

  /** #326 Seasonal Mann–Kendall (Hirsch & Slack 1984,
    * independent-seasons form): #242's monotone-trend test computed
    * WITHIN each day-of-week season and summed — the trend test that
    * stays valid when the series carries weekly seasonality (#290's
    * profile), where plain MK's cross-weekday pairs read the seasonal
    * cycle as spurious trend. Per (type, season): the pairwise sign
    * sweep S_s and tie-corrected var18_s; the seasonal statistic sums
    * both across seasons (independence assumed — the standard form;
    * the serial-correlation correction is a documented non-goal).
    * Same exact-integer grid as #242; pair fan-out is (days/7)² per
    * season — 7× CHEAPER than plain MK's days². Callers compare
    * S_total² against var18_total/18·z² without leaving the grid.
    */
  def seasonalMannKendall(spark: SparkSession, dir: String): DataFrame = {
    val nsPerDay = 86400L * 1000000000L
    val daily = Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        expr(s"ts div ${nsPerDay}L").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum("cents").as("c"))
      .withColumn("season", pmod(col("day"), lit(7L)))
      .localCheckpoint(eager = false)
    val s = daily
      .alias("a")
      .join(
        daily.alias("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.season") === col("b.season") && col("a.day") < col("b.day"))
      .groupBy(col("a.event_type").as("event_type"))
      .agg(
        sum(signum(col("b.c") - col("a.c")).cast("long")).as("s_total"),
        count(lit(1)).as("n_pairs"))
    val ties = daily
      .groupBy(col("event_type"), col("season"), col("c"))
      .agg(count(lit(1)).as("t"))
      .groupBy("event_type", "season")
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_term"), sum("t").as("nd"))
      .withColumn("var18_s", expr("nd * (nd - 1) * (2 * nd + 5) - tie_term"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_seasons"),
        sum("nd").as("n_days"),
        sum("var18_s").as("var18_total"))
    s.join(ties, "event_type")
      .select(
        col("event_type"),
        col("n_days"),
        col("n_seasons"),
        col("n_pairs"),
        col("s_total"),
        col("var18_total"))
  }

  /** #327 Cramér's V for the status × priority association: the
    * normalized effect SIZE on [0,1] that completes the categorical-
    * association trio — #189's χ² tests significance (grows with n
    * even for trivial dependence), #313's MI sizes it in bits
    * (unbounded), V = √(χ²/(n·(min(r,c)−1))) puts it on the
    * comparable-across-tables unit scale every profiling report
    * wants. Same per-cell e6 χ² construction as #189 (one count pass
    * + broadcast margins), V² on the e12 grid as one further
    * truncating quotient, V on e6 via the #226 one-ulp-clamp EXACT
    * isqrt — no float ever. 1-row output.
    */
  def cramersV(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables
      .orders(spark, dir)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("o"))
    val rowm = cells.groupBy("o_orderstatus").agg(sum("o").as("r"))
    val colm = cells.groupBy("o_orderpriority").agg(sum("o").as("c"))
    val tot = cells.agg(
      sum("o").as("n"),
      countDistinct("o_orderstatus").as("n_rows"),
      countDistinct("o_orderpriority").as("n_cols"))
    cells
      .join(broadcast(rowm), "o_orderstatus")
      .join(broadcast(colm), "o_orderpriority")
      .crossJoin(broadcast(tot))
      .select(
        col("n"),
        col("n_rows"),
        col("n_cols"),
        expr("""CAST((CAST(n * o - r * c AS DECIMAL(38,0)) * CAST(n * o - r * c AS DECIMAL(38,0))
                      * 1000000)
                 div (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)""").as("contrib_e6"))
      .groupBy("n", "n_rows", "n_cols")
      .agg(sum("contrib_e6").as("chi2_e6"))
      .withColumn(
        "v2_e12",
        expr("""CAST(CAST(chi2_e6 AS DECIMAL(38,0)) * 1000000
                 div (CAST(n AS DECIMAL(38,0)) * (least(n_rows, n_cols) - 1)) AS BIGINT)"""))
      .withColumn("s0", expr("CAST(floor(sqrt(CAST(v2_e12 AS DOUBLE))) AS BIGINT)"))
      .withColumn(
        "v_e6",
        expr("""s0 + (CASE WHEN (CAST(s0 AS DECIMAL(38,0)) + 1) * (s0 + 1) <= v2_e12 THEN 1 ELSE 0 END)
                   - (CASE WHEN CAST(s0 AS DECIMAL(38,0)) * s0 > v2_e12 THEN 1 ELSE 0 END)"""))
      .select(col("n"), col("n_rows"), col("n_cols"), col("chi2_e6"), col("v2_e12"), col("v_e6"))
  }

  /** #330 Odds ratio / risk ratio of the 2×2 promo × completion
    * table: the epidemiology-standard effect sizes for a binary
    * exposure and outcome — OR = ad/bc (symmetric, the logistic-
    * regression coefficient's exponent), RR = [a/(a+b)]/[c/(c+d)]
    * (the interpretable one), and the risk DIFFERENCE — reading the
    * same exposure #319 stratifies: unadjusted here, stratum-adjusted
    * there, and the gap between the two numbers is itself the
    * confounding read. All exact: each ratio one truncating e6
    * DECIMAL(38,0)↔HUGEINT quotient, zero margins → NULL. One
    * order-grain semi-join + a 4-cell aggregate; 1-row output.
    */
  def oddsRatio(spark: SparkSession, dir: String): DataFrame = {
    val promoOrders = Tables
      .lineitem(spark, dir)
      .join(
        broadcast(
          Tables
            .part(spark, dir)
            .filter(col("p_type").startsWith("PROMO"))
            .select(col("p_partkey").as("l_partkey"))),
        Seq("l_partkey"),
        "left_semi")
      .select(col("l_orderkey").as("o_orderkey"))
      .distinct()
      .withColumn("treated", lit(1L))
    Tables
      .orders(spark, dir)
      .select(col("o_orderkey"), (col("o_orderstatus") === "F").cast("long").as("y"))
      .join(promoOrders, Seq("o_orderkey"), "left")
      .withColumn("treated", coalesce(col("treated"), lit(0L)))
      .agg(
        sum(expr("CASE WHEN treated = 1 AND y = 1 THEN 1 ELSE 0 END")).as("a"),
        sum(expr("CASE WHEN treated = 1 AND y = 0 THEN 1 ELSE 0 END")).as("b"),
        sum(expr("CASE WHEN treated = 0 AND y = 1 THEN 1 ELSE 0 END")).as("c"),
        sum(expr("CASE WHEN treated = 0 AND y = 0 THEN 1 ELSE 0 END")).as("d"))
      .select(
        col("a"),
        col("b"),
        col("c"),
        col("d"),
        expr("""CASE WHEN b > 0 AND c > 0 THEN
                  CAST(CAST(a AS DECIMAL(38,0)) * d * 1000000
                    div (CAST(b AS DECIMAL(38,0)) * c) AS BIGINT)
                ELSE NULL END""").as("odds_ratio_e6"),
        expr("""CASE WHEN a + b > 0 AND c > 0 THEN
                  CAST(CAST(a AS DECIMAL(38,0)) * (c + d) * 1000000
                    div (CAST(c AS DECIMAL(38,0)) * (a + b)) AS BIGINT)
                ELSE NULL END""").as("risk_ratio_e6"),
        expr("""CASE WHEN a + b > 0 AND c + d > 0 THEN
                  CAST(a * 1000000 div (a + b) - c * 1000000 div (c + d) AS BIGINT)
                ELSE NULL END""").as("risk_diff_e6"))
  }

  /** #331 Page–Hinkley drift chart: the third classic SPC monitor
    * beside #254's Shewhart (per-point spikes) and #284's CUSUM
    * (sustained shifts vs a FIXED mean) — Page–Hinkley tracks the
    * deviation against the RUNNING mean, so it self-calibrates as the
    * level drifts and flags CHANGES rather than excursions. Exact,
    * no recursion: m_t = Σ_{i≤t}(x_i − x̄_i) with x̄_i = S_i div i
    * (truncating prefix mean — deterministic both engines), and
    * PH⁺_t = m_t − min_{j≤t} m_j, PH⁻_t = max_{j≤t} m_j − m_t —
    * prefix-extrema closed forms (the #284 trick) over the
    * day-keyed aggregate (calendar-bounded frames); threshold
    * λ = 4σ via the #226 one-ulp-clamp exact isqrt of the
    * population variance, alarm flags integer comparisons.
    */
  def pageHinkley(spark: SparkSession, dir: String): DataFrame = {
    // every unpartitioned window below rides this PER-DAY aggregate
    // (<= #calendar-days rows) — a documented PlanDisciplineSpec
    // exception with an exact instance count, NOT a naming trick
    val byDay = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("day")
      .agg(sum("c").as("x"))
    val sig = byDay
      .agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
      .select(
        expr("""CAST((CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx)
                 div (CAST(n AS DECIMAL(38,0)) * n) AS DECIMAL(38,0))""").as("var_c"))
      .select(expr("CAST(floor(sqrt(CAST(var_c AS DOUBLE))) AS BIGINT)").as("s0"), col("var_c"))
      .select(
        expr("""s0 + (CASE WHEN (CAST(s0 AS DECIMAL(38,0)) + 1) * (s0 + 1) <= var_c THEN 1 ELSE 0 END)
                   - (CASE WHEN CAST(s0 AS DECIMAL(38,0)) * s0 > var_c THEN 1 ELSE 0 END)""")
          .as("sigma"))
    val wAll = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDay
      .withColumn("i", row_number().over(Window.orderBy("day")).cast("long"))
      .withColumn("s_pre", sum("x").over(wAll))
      .withColumn("dev", col("x") - expr("s_pre div i"))
      .withColumn("m", sum("dev").over(wAll))
      .withColumn("m_min", min("m").over(wAll))
      .withColumn("m_max", max("m").over(wAll))
      .crossJoin(broadcast(sig))
      .select(
        col("day"),
        col("x").as("cents"),
        expr("s_pre div i").as("mean_so_far"),
        col("m"),
        (col("m") - col("m_min")).as("ph_plus"),
        (col("m_max") - col("m")).as("ph_minus"),
        (lit(4L) * col("sigma")).as("lambda_c"),
        (col("m") - col("m_min") > lit(4L) * col("sigma")).cast("long").as("alarm_up"),
        (col("m_max") - col("m") > lit(4L) * col("sigma")).cast("long").as("alarm_down"))
  }

  /** #332 Assortment turnover: for each consecutive month pair, the
    * Jaccard overlap of the ACTIVE part sets plus added/dropped
    * counts — the catalog-churn read merchandising tracks (#281's
    * catalog breadth counts actives and cumulative novelty; this
    * measures month-over-month SET movement — a stable breadth can
    * hide a fully-rotating assortment). Exact: actives from one
    * DISTINCT (month, part) frame; |A∩B| by an equi-join on part
    * across adjacent months (never a set product), |A∪B| = |A|+|B|−∩;
    * Jaccard one truncating e6 quotient. Consecutive months via a
    * lag over the ≤#months frame; part-keyed joins shuffle on part.
    */
  def assortmentTurnover(spark: SparkSession, dir: String): DataFrame = {
    val mp = Tables
      .lineitem(spark, dir)
      .join(
        Tables.orders(spark, dir).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        "l_orderkey")
      .select(
        expr("CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)").as("m"),
        col("l_partkey"))
      .distinct()
      .localCheckpoint(eager = false)
    val sizes = mp.groupBy("m").agg(count(lit(1)).as("n_active"))
    val inter = mp
      .join(mp.select((col("m") - 1).as("m"), col("l_partkey").as("l_partkey")), Seq("m", "l_partkey"))
      .groupBy("m")
      .agg(count(lit(1)).as("n_common"))
    sizes
      .join(
        sizes.select((col("m") - 1).as("m"), col("n_active").as("n_next")),
        Seq("m"))
      .join(inter, Seq("m"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .select(
        col("m").as("month"),
        (col("m") + 1).as("next_month"),
        col("n_active"),
        col("n_next"),
        col("n_common"),
        (col("n_next") - col("n_common")).as("n_added"),
        (col("n_active") - col("n_common")).as("n_dropped"),
        expr("""CAST(n_common * 1000000 div (n_active + n_next - n_common) AS BIGINT)""")
          .as("jaccard_e6"))
  }

  /** #333 Supplier concentration per part: the HHI of each part's
    * supplier quantity shares — the single-source-risk screen
    * procurement runs (#246's HHI reads the whole market; this reads
    * EVERY part's supply base, and the top-concentrated multi-
    * supplier parts are the de-risking worklist). Shares on the e4
    * grid so the squared sum lands on e8 and a sole-source part is
    * exactly 10⁸; per-part HHI = Σ (q_s·10⁴ div q_tot)² — truncated
    * shares squared then summed, deterministic in both engines; top
    * 25 by (hhi desc, part) among parts with ≥2 suppliers (the
    * sole-source set is size-reported, not listed). One
    * (part, supplier) aggregate + part rollup; no windows beyond the
    * rank cut.
    */
  def supplierConcentration(spark: SparkSession, dir: String, topK: Int = 25): DataFrame = {
    val ps = Tables
      .lineitem(spark, dir)
      .select(
        col("l_partkey"),
        col("l_suppkey"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum("q").as("qs"))
    val perPart = ps
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_suppliers"), sum("qs").as("q_tot"))
      .filter(col("q_tot") >= 1)
    val hhi = ps
      .join(perPart, "l_partkey")
      .withColumn("share_e4", expr("qs * 10000 div q_tot"))
      .groupBy("l_partkey", "n_suppliers", "q_tot")
      .agg(sum(expr("share_e4 * share_e4")).as("hhi_e8"))
    val soleSource = hhi.agg(
      count(lit(1)).as("n_parts"),
      sum((col("n_suppliers") === 1).cast("long")).as("n_sole_source"))
    hhi
      .filter(col("n_suppliers") >= 2)
      .orderBy(col("hhi_e8").desc, col("l_partkey"))
      .limit(topK)
      .crossJoin(broadcast(soleSource))
  }

  /** Label-propagation contract constants — shared with the
    * q_label_prop / q_label_prop_eval oracle builders so the replay
    * can't drift from the operator.
    */
  val LabelPropRounds = 4
  val LabelPropMinSupport = 2

  /** #366 Weighted label-propagation communities (LPA — Raghavan,
    * Albert & Kumara 2007): community detection over the co-purchase
    * graph, the structure-DISCOVERY sibling of #166's connected
    * components (CC answers "reachable at all?"; LPA answers "which
    * densely-wired region?", splitting a bridged component along its
    * weak seam). Each of exactly [[LabelPropRounds]] synchronous
    * rounds relabels every vertex with the neighbor label carrying
    * the largest total edge weight (support counts — a 5-basket tie
    * outvotes 5 one-basket strangers), ties broken by smallest
    * label; isolated parts keep their own label. The FIXED round
    * count (no early exit) is the determinism contract: synchronous
    * LPA can oscillate on bipartite-ish seams, so "the labeling
    * after exactly R rounds" is the well-defined deliverable both
    * engines replay bit-exactly, and the spec's planted two-cliques-
    * and-a-bridge case shows R=4 already separates what CC cannot.
    *
    * Scale: per round one hash join against the dst-partitioned
    * cached edge list + one (vertex, label) aggregate + one per-
    * vertex rank — all keyed shuffles, linear in |E|; the argmax
    * window is PARTITIONED by vertex (never global); round frames
    * are eagerly lineage-cut and every block released on exit
    * (#124/#166 discipline). Rounds are O(1) by contract, so the
    * shape holds at any graph size.
    */
  def labelProp(
      spark: SparkSession,
      dir: String,
      rounds: Int = LabelPropRounds,
      minSupport: Int = LabelPropMinSupport): DataFrame =
    Lineage.checkpointReleasing(spark) { implicit scope =>
      val pairs = coPurchasePairs(spark, dir, minSupport).cache()
      val sym = pairs
        .select(col("part_a").as("src"), col("part_b").as("dst"), col("w"))
        .unionAll(pairs.select(col("part_b").as("src"), col("part_a").as("dst"), col("w")))
        .repartition(col("dst"))
        .cache()
      var labels = Tables
        .lineitem(spark, dir)
        .select(col("l_partkey").as("part"))
        .distinct()
        .select(col("part"), col("part").as("label"))
        .cp(eager = true)
      val byVertex = Window.partitionBy("part").orderBy(col("tw").desc, col("nl"))
      var r = 0
      while (r < rounds) {
        r += 1
        val best = sym
          .join(labels.select(col("part").as("dst"), col("label").as("nl")), "dst")
          .groupBy(col("src").as("part"), col("nl"))
          .agg(sum("w").as("tw"))
          .withColumn("rn", row_number().over(byVertex))
          .filter(col("rn") === 1)
          .select(col("part"), col("nl").as("bl"))
        labels = labels
          .join(best, Seq("part"), "left")
          .select(col("part"), coalesce(col("bl"), col("label")).as("label"))
          .cp(eager = true)
      }
      val sizes = labels.groupBy("label").agg(count(lit(1)).as("comm_size"))
      val out = labels
        .join(sizes, "label")
        .select(col("part"), col("label").as("community"), col("comm_size"))
      (out, Seq(pairs, sym))
    }

  /** #367 Label-propagation modularity scorecard (§15.4: every
    * discovered structure ships with its quality number in the same
    * round): Newman modularity Q of the #366 LPA partition versus Q
    * of the brand partition (#304's business baseline) on the SAME
    * support-filtered edge set — the one number that says whether
    * the discovered communities actually explain more basket wiring
    * than the catalog taxonomy does (LPA losing to brand would mean
    * the propagation found noise, the classic LPA failure no
    * per-community size readout can see). Same exact algebra as
    * #304: per-community numerator 4m·m_c − deg_c² in DECIMAL(38,0),
    * Q = sign·(|Σ num|·10⁶ div 4m²) with ONE final truncating
    * division per partition, so both engines land the identical
    * BIGINT. 1-row output; every post-fold frame is 1-row broadcast.
    *
    * Honest finding (the §15.5 convention): on the synthetic basket
    * graph both partitions score NEAR-ZERO modularity (sf0.01:
    * Q_lpa = 0.0071 vs Q_brand = 0.0022, lpa_wins = 1; at sf0.001
    * the order flips) — the corpus plants no community structure, so
    * the deliverable is the exact comparison mechanics, and the spec
    * pins the arithmetic, not a quality wish.
    */
  def labelPropEval(spark: SparkSession, dir: String): DataFrame = {
    val lpa = labelProp(spark, dir).select(col("part"), col("community"))
    val po =
      Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = po
      .select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(po.select(col("l_orderkey"), col("l_partkey").as("part_b")), "l_orderkey")
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= LabelPropMinSupport)
      .select("part_a", "part_b")
      .localCheckpoint(eager = false)
    val brand = Tables.part(spark, dir).select(col("p_partkey").as("part"), col("p_brand"))
    // modularity numerator fold for one vertex→community assignment:
    // Σ_c (4m·m_c − deg_c²), plus m and the community count
    def qFold(assign: DataFrame, labelCol: String): DataFrame = {
      val lab = assign.select(col("part"), col(labelCol).as("comm"))
      val e = edges
        .join(lab.select(col("part").as("part_a"), col("comm").as("ca")), "part_a")
        .join(lab.select(col("part").as("part_b"), col("comm").as("cb")), "part_b")
      val m = e.agg(count(lit(1)).as("m"))
      val intra = e
        .filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("comm"))
        .agg(count(lit(1)).as("mc"))
      val deg = e
        .select(explode(array(
          struct(col("part_a").as("node"), col("ca").as("comm")),
          struct(col("part_b").as("node"), col("cb").as("comm")))).as("x"))
        .groupBy(col("x.comm").as("comm"))
        .agg(count(lit(1)).as("degc"))
      deg
        .join(intra, Seq("comm"), "left")
        .na
        .fill(0L, Seq("mc"))
        .agg(
          count(lit(1)).as("n_comms"),
          sum(expr("CAST(mc AS DECIMAL(38,0))")).as("sum_mc"),
          sum(expr("CAST(degc AS DECIMAL(38,0)) * degc")).as("sum_deg2"))
        .crossJoin(broadcast(m))
        .select(
          col("n_comms"),
          expr("CAST(4 * CAST(m AS DECIMAL(38,0)) * sum_mc - sum_deg2 AS DECIMAL(38,0))")
            .as("q_num"),
          col("m"))
    }
    val ql = qFold(lpa, "community")
      .select(
        col("n_comms").as("n_comms_lpa"),
        col("q_num").as("q_num_lpa"),
        col("m"))
    val qb = qFold(brand, "p_brand")
      .select(col("n_comms").as("n_comms_brand"), col("q_num").as("q_num_brand"))
    ql.crossJoin(broadcast(qb))
      .select(
        col("m"),
        col("n_comms_lpa"),
        col("n_comms_brand"),
        expr("""CAST(CASE WHEN q_num_lpa < 0 THEN -1 ELSE 1 END
                 * (abs(q_num_lpa) * 1000000 div (4 * CAST(m AS DECIMAL(38,0)) * m))
                 AS BIGINT)""").as("q_lpa_e6"),
        expr("""CAST(CASE WHEN q_num_brand < 0 THEN -1 ELSE 1 END
                 * (abs(q_num_brand) * 1000000 div (4 * CAST(m AS DECIMAL(38,0)) * m))
                 AS BIGINT)""").as("q_brand_e6"),
        (col("q_num_lpa") > col("q_num_brand")).cast("long").as("lpa_wins"))
  }

  /** #368 Adamic–Adar link prediction: the #283 common-neighbors
    * ranking re-scored with the Adamic–Adar weight Σ_w 1/ln(deg w)
    * over shared neighbors — the standard refinement that discounts
    * evidence from promiscuous hubs (a shared niche accessory is a
    * stronger tie signal than a shared bestseller; plain CN counts
    * them equally, which is exactly the failure #317's backtest
    * measures). Same wedge enumeration and center-degree cap as
    * #283 (the cap is the Σdeg² → |E|·D scale bound AND part of the
    * oracle-replayed contract); each wedge contributes its CENTER's
    * precomputed term ⌊10⁶/ln(deg)+½⌋ — ln of an exact INTEGER
    * degree, one double op per distinct degree value, quantized per
    * term THEN summed (the order-free float recipe; deg ≥ 2 for any
    * wedge center, so ln > 0). Top-k by (aa_e6, cn, pair) is a
    * TakeOrdered — map-side bounded, no global window.
    */
  def adamicAdar(
      spark: SparkSession,
      dir: String,
      minOrders: Int = LinkPredMinOrders,
      maxCenterDeg: Int = LinkPredMaxCenterDeg,
      topK: Int = LinkPredTopK): DataFrame = {
    val baskets = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set("l_partkey")).as("parts"))
    val e = baskets
      .select(
        explode(
          expr(
            """flatten(transform(parts, (x, i) ->
                 transform(slice(parts, i + 2, size(parts)),
                   y -> named_struct('pa', x, 'pb', y))))"""))
          .as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minOrders)
      .select("pa", "pb")
      .localCheckpoint(eager = false)
    val deg = e
      .select(col("pa").as("node"))
      .unionAll(e.select(col("pb").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("deg"))
    val adj = e
      .select(col("pa").as("u"), col("pb").as("v"))
      .unionAll(e.select(col("pb").as("u"), col("pa").as("v")))
      .join(
        // deg >= 2: a deg-1 center forms no wedge (its self-join pair is
        // (v,v), killed by v < w) so dropping it is result-neutral — and
        // it keeps 1/ln(1) = Infinity out of the BIGINT cast, which
        // would throw under spark.sql.ansi.enabled
        deg
          .filter(col("deg") <= maxCenterDeg && col("deg") >= 2)
          .select(col("node").as("u"), col("deg")),
        Seq("u"))
      .withColumn("term_e6", expr("CAST(floor(1000000.0 / ln(CAST(deg AS DOUBLE)) + 0.5) AS BIGINT)"))
    adj
      .join(adj.select(col("u"), col("v").as("w")), Seq("u"))
      .filter(col("v") < col("w"))
      .groupBy(col("v").as("pa"), col("w").as("pb"))
      .agg(count(lit(1)).as("cn"), sum("term_e6").as("aa_e6"))
      .join(e, Seq("pa", "pb"), "left_anti")
      .orderBy(col("aa_e6").desc, col("cn").desc, col("pa"), col("pb"))
      .limit(topK)
  }

  /** #369 Individuals & moving-range (I-MR) control chart: the SPC
    * chart for UNGROUPED daily observations — the #254 p-chart needs
    * a defect fraction and the #349 EWMA/#284 CUSUM accumulate; I-MR
    * is the Shewhart baseline for a single-value-per-period series,
    * where σ is estimated from the average two-point moving range
    * (M̄R/d₂, d₂ = 1.128 at n = 2) because no within-period spread
    * exists. Both textbook tests, kept EXACT by cross-multiplying
    * the rational limits instead of materializing them: the
    * individuals test |xᵢ − x̄| > 3·M̄R/d₂ becomes
    * |xᵢ·n − Σx|·1128·n₁ > 3000·ΣMR·n, and the range test
    * mrᵢ > D₄·M̄R (D₄ = 3.267) becomes mrᵢ·1000·n₁ > 3267·ΣMR —
    * every product through DECIMAL(38,0) (xᵢ·n·1128·n₁ crosses 2⁶³
    * once daily revenue reaches ~10¹⁰ cents), both engines land the
    * identical comparison. One per-day aggregate, one day-ordered
    * lag for the moving range (≤ #calendar-days rows — a documented
    * PlanDisciplineSpec exception; the lag subtree is planned twice,
    * under the stats fold and under the output join), one 1-row
    * broadcast stats frame.
    */
  def imrChart(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("day")
      .agg(sum("c").as("x"))
    val withMr = byDay
      .withColumn("mr", abs(col("x") - lag("x", 1).over(Window.orderBy("day"))))
    val stats = withMr.agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"),
      count(col("mr")).as("n1"),
      sum("mr").as("smr"))
    withMr
      .crossJoin(broadcast(stats))
      .select(
        col("day"),
        col("x").as("x_c"),
        col("mr").as("mr_c"),
        col("n").as("n_days"),
        expr("""CAST(CASE WHEN abs(CAST(x AS DECIMAL(38,0)) * n - sx) * 1128 * n1
                          > 3000 * CAST(smr AS DECIMAL(38,0)) * n
                     THEN 1 ELSE 0 END AS BIGINT)""").as("x_ooc"),
        expr("""CAST(CASE WHEN mr IS NOT NULL
                          AND CAST(mr AS DECIMAL(38,0)) * 1000 * n1
                              > 3267 * CAST(smr AS DECIMAL(38,0))
                     THEN 1 ELSE 0 END AS BIGINT)""").as("mr_ooc"))
  }

  /** #370 X̄-R control chart: the GROUPED Shewhart sibling of #369's
    * I-MR — subgroups are epoch-aligned calendar weeks (day div 7) of
    * daily revenue, kept only when FULL (7 days present) because the
    * A₂/D₃/D₄ constants are tabulated per subgroup size (n = 7:
    * A₂ = 0.419, D₃ = 0.076, D₄ = 1.924); within-subgroup spread
    * exists here, so σ comes from the mean range R̄ instead of #369's
    * moving range. Both charts kept EXACT by cross-multiplying the
    * rational limits on the weekly SUM s = 7·X̄: the X̄ test
    * |X̄_w − X̿| > A₂·R̄ becomes |s·W − Σs|·1000 > 2933·ΣR (2933 =
    * 7·419), the range tests r > D₄·R̄ / r < D₃·R̄ become
    * r·1000·W > 1924·ΣR / r·1000·W < 76·ΣR — every product through
    * DECIMAL(38,0)↔HUGEINT. One day aggregate, one week aggregate,
    * one 1-row broadcast stats frame — NO windows at all, linear at
    * any scale.
    */
  def xbarRChart(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("day")
      .agg(sum("c").as("x"))
    val byWeek = byDay
      .groupBy(expr("day div 7").as("week"))
      .agg(count(lit(1)).as("nd"), sum("x").as("s"), (max("x") - min("x")).as("r"))
      .filter(col("nd") === 7)
    val stats = byWeek.agg(count(lit(1)).as("w"), sum("s").as("ss"), sum("r").as("sr"))
    byWeek
      .crossJoin(broadcast(stats))
      .select(
        col("week"),
        col("s").as("s_c"),
        col("r").as("r_c"),
        col("w").as("n_weeks"),
        expr("""CAST(CASE WHEN abs(CAST(s AS DECIMAL(38,0)) * w - ss) * 1000
                          > 2933 * CAST(sr AS DECIMAL(38,0))
                     THEN 1 ELSE 0 END AS BIGINT)""").as("xbar_ooc"),
        expr("""CAST(CASE WHEN CAST(r AS DECIMAL(38,0)) * 1000 * w
                          > 1924 * CAST(sr AS DECIMAL(38,0))
                     THEN 1 ELSE 0 END AS BIGINT)""").as("r_high_ooc"),
        expr("""CAST(CASE WHEN CAST(r AS DECIMAL(38,0)) * 1000 * w
                          < 76 * CAST(sr AS DECIMAL(38,0))
                     THEN 1 ELSE 0 END AS BIGINT)""").as("r_low_ooc"))
  }

  /** #371 Net / gross revenue retention (NRR / GRR): for each base
    * month m with a following month in the data, the revenue of m's
    * active customers re-measured in m+1 — NRR = their full m+1
    * revenue over their m revenue (expansion counts), GRR = the
    * contraction-only floor Σ min(rev_m, rev_m+1) over the same base
    * (expansion capped at 100%), plus the new-customer revenue the
    * retention ratios deliberately exclude. THE SaaS/recurring-
    * revenue health metric; #240's growth accounting counts HEADS,
    * this weighs DOLLARS, and the two disagree exactly when churn
    * concentrates in small accounts. Whole-cent BIGINT grid, ratios
    * single truncating e6 divisions through DECIMAL(38,0) (both
    * engines identical; base > 0 by construction — the base month is
    * in the data). One (customer, month) aggregate, one shifted
    * self-join on (customer, month), one ≤#months fold — linear, no
    * windows.
    */
  def nrr(spark: SparkSession, dir: String): DataFrame = {
    val cm = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        expr(
          "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT)")
          .as("m"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("o_custkey", "m")
      .agg(sum("c").as("rev0"))
    val nxt = cm.select(col("o_custkey"), (col("m") - 1).as("m"), col("rev0").as("rev1"))
    val months = cm.select("m").distinct()
    // base months = months whose successor month also appears
    val valid = months.join(
      months.select((col("m") - 1).as("m")),
      Seq("m"),
      "left_semi")
    cm.join(nxt, Seq("o_custkey", "m"), "full_outer")
      .join(valid, Seq("m"), "left_semi")
      .groupBy("m")
      .agg(
        count(col("rev0")).as("n_base"),
        count(when(col("rev0").isNotNull && col("rev1").isNotNull, lit(1))).as("n_retained"),
        coalesce(sum("rev0"), lit(0L)).as("base_c"),
        coalesce(sum(when(col("rev0").isNotNull, col("rev1"))), lit(0L)).as("retained_c"),
        // least() skips NULLs in both engines — guard to BOTH-active
        // rows or single-sided revenue leaks into the GRR floor
        coalesce(
          sum(when(col("rev0").isNotNull && col("rev1").isNotNull,
            least(col("rev0"), col("rev1")))),
          lit(0L)).as("min_c"),
        coalesce(sum(when(col("rev0").isNull, col("rev1"))), lit(0L)).as("new_c"))
      .select(
        col("m"),
        col("n_base"),
        col("n_retained"),
        col("base_c"),
        col("retained_c"),
        col("min_c"),
        col("new_c"),
        expr("CAST(CAST(retained_c AS DECIMAL(38,0)) * 1000000 div base_c AS BIGINT)")
          .as("nrr_e6"),
        expr("CAST(CAST(min_c AS DECIMAL(38,0)) * 1000000 div base_c AS BIGINT)")
          .as("grr_e6"))
  }

  /** #372 Heuristics-miner dependency measure (Weijters & van der
    * Aalst): for every ordered event-type pair, the dependency score
    * dep(a,b) = (|a>b| − |b>a|) / (|a>b| + |b>a| + 1) over the
    * directly-follows counts — the noise-robust edge weight the
    * heuristics miner thresholds to draw a process model. #174's
    * transition matrix reports raw first-order frequencies; the
    * dependency measure is the DIRECTIONAL read (near +1 = a truly
    * precedes b, near 0 = concurrent/noise — the distinction
    * frequency alone cannot make), with the +1 smoothing that keeps
    * one stray observation from claiming certainty. Length-1 loops
    * score the textbook |a>a| / (|a>a| + 1). Counts from one lag
    * window per user (bounded partitions) + one pair aggregate; the
    * mirror join runs at alphabet² cardinality; dep on the e6 grid
    * via the sign-factored truncating division (magnitudes only, so
    * Spark div ≡ DuckDB //).
    */
  def hmDependency(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val t = Tables
      .events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("a"), col("next_type").as("b"))
      .agg(count(lit(1)).as("n_ab"))
    val rev = t.select(col("b").as("a"), col("a").as("b"), col("n_ab").as("n_ba"))
    t.join(rev, Seq("a", "b"), "full_outer")
      .na
      .fill(0L, Seq("n_ab", "n_ba"))
      .select(
        col("a").as("from_type"),
        col("b").as("to_type"),
        col("n_ab"),
        col("n_ba"),
        expr("""CAST(CASE WHEN a = b THEN n_ab * 1000000 div (n_ab + 1)
                     ELSE (CASE WHEN n_ab < n_ba THEN -1 ELSE 1 END)
                          * (abs(n_ab - n_ba) * 1000000 div (n_ab + n_ba + 1))
                END AS BIGINT)""").as("dep_e6"))
  }

  /** #376 Next-event entropy per state: for each event type, the
    * Shannon entropy (bits) of its next-event distribution — the
    * predictability read on top of #174's transition matrix (a row
    * can be 90/10 or uniform at the same n_from; entropy is the one
    * number that says whether the next step is KNOWABLE, gating
    * whether a next-event model is worth training on this state).
    * Each term −p·log₂(p) is a float of the integer ratio
    * n_ab/n_from, e6-quantized BEFORE the order-independent sum
    * (#119's float-identity discipline — both engines evaluate log₂
    * of the same double, so the quantized terms agree bit-exactly);
    * h_max = log₂(k) quantized the same way, p = 1 rows contribute
    * exactly 0. One per-user lag window + one pair aggregate + one
    * per-state fold — linear, alphabet-bounded output.
    */
  def markovEntropy(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables
      .events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type"))
      .agg(count(lit(1)).as("n_ab"))
      .withColumn("n_from", sum("n_ab").over(Window.partitionBy("from_type")))
      .withColumn(
        "term_e6",
        expr("""CAST(floor(-(CAST(n_ab AS DOUBLE) / n_from)
                           * log2(CAST(n_ab AS DOUBLE) / n_from) * 1000000 + 0.5)
                AS BIGINT)"""))
      .groupBy(col("from_type"), col("n_from"))
      .agg(
        count(lit(1)).as("n_next_types"),
        sum("term_e6").as("h_e6"))
      .withColumn(
        "hmax_e6",
        expr("CAST(floor(log2(CAST(n_next_types AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"))
  }

  /** #377 Alpha-miner footprint matrix (van der Aalst's alpha
    * algorithm, step 1): the completed alphabet×alphabet grid of
    * ordering relations derived from the directly-follows counts —
    * `causal` (a>b observed, b>a never), `rev_causal`, `parallel`
    * (both observed) and `choice` (neither) — the footprint table
    * every discovered process model starts from, and the categorical
    * summary of #372's numeric dependency scores. Grid COMPLETION is
    * the point (absent cells are the `choice` relation, which the
    * observed-pairs frames cannot represent): alphabet from one
    * distinct aggregate, grid = broadcast alphabet² cross join, counts
    * left-joined and coalesced to 0. All counts exact; output
    * alphabet²-bounded.
    */
  def alphaFootprint(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val t = Tables
      .events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("a"), col("next_type").as("b"))
      .agg(count(lit(1)).as("n"))
    val alphabet = Tables
      .events(spark, dir)
      .select(col("event_type").as("a"))
      .distinct()
    val grid = broadcast(alphabet)
      .crossJoin(broadcast(alphabet.select(col("a").as("b"))))
    grid
      .join(t, Seq("a", "b"), "left")
      .na
      .fill(0L, Seq("n"))
      .join(
        t.select(col("b").as("a"), col("a").as("b"), col("n").as("n_rev")),
        Seq("a", "b"),
        "left")
      .na
      .fill(0L, Seq("n_rev"))
      .select(
        col("a").as("from_type"),
        col("b").as("to_type"),
        col("n").as("n_ab"),
        col("n_rev").as("n_ba"),
        expr("""CASE WHEN n > 0 AND n_rev = 0 THEN 'causal'
                     WHEN n = 0 AND n_rev > 0 THEN 'rev_causal'
                     WHEN n > 0 AND n_rev > 0 THEN 'parallel'
                     ELSE 'choice' END""").as("rel"))
  }

  /** #411 Hash-relabeling permutation test (the Monte-Carlo
    * permutation test — the assumption-free significance check the
    * parametric family (#320 Welch, #340 ANOVA) falls back to when
    * normality/variance assumptions die: is the BUILDING-segment mean
    * order value different from the rest, measured against the null
    * distribution of B = 200 random relabelings?). Determinism: each
    * relabeling b assigns orders by the HIGH BIT of the Knuth
    * multiplicative hash (orderkey·2654435761 + b·2246822519) mod 2³²
    * — pure codegen'd integer arithmetic (an md5-parity draft spent
    * 19 s at sf0.1 on 30M digest calls; this runs in ~2 s), binomial
    * label counts rather than a fixed-count shuffle, the standard
    * Monte-Carlo relaxation, documented; every statistic is exact
    * integer (means as
    * centi-cents via sum·100 div n, diffs absolute), so the DuckDB
    * replay reproduces the ENTIRE null distribution bit-exactly and
    * p = (1 + #{b: diff_b ≥ diff_obs}) / (B_valid + 1) on the e6
    * grid. Scale: the B-fold explode is embarrassingly parallel
    * (B·rows partial-aggregated map-side to 2B cells); nothing
    * driver-side.
    */
  def permutationTest(spark: SparkSession, dir: String, b: Int = 200): DataFrame = {
    val base = Tables
      .orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .join(
        broadcast(
          Tables
            .customer(spark, dir)
            .select(
              col("c_custkey").as("o_custkey"),
              (col("c_mktsegment") === "BUILDING").cast("long").as("g"))),
        "o_custkey")
      .select("o_orderkey", "c", "g")
      .localCheckpoint(eager = false)
    val obs = base
      .agg(
        sum(when(col("g") === 1, col("c"))).as("s1"),
        sum(when(col("g") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") === 0, col("c"))).as("s0"),
        sum(when(col("g") === 0, 1L).otherwise(0L)).as("n0"))
      .select(
        col("n1"),
        col("n0"),
        expr("abs(s1 * 100 div n1 - s0 * 100 div n0)").as("observed_diff"))
    val nulls = base
      .select(col("o_orderkey"), col("c"), explode(expr(s"sequence(0, ${b - 1})")).as("bi"))
      .withColumn(
        "gb",
        expr("""CAST((o_orderkey * 2654435761L + bi * 2246822519L) % 4294967296L
                     >= 2147483648L AS BIGINT)"""))
      .groupBy("bi")
      .agg(
        sum(when(col("gb") === 1, col("c"))).as("s1"),
        sum(when(col("gb") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("gb") === 0, col("c"))).as("s0"),
        sum(when(col("gb") === 0, 1L).otherwise(0L)).as("n0"))
      .filter(col("n1") > 0 && col("n0") > 0)
      .select(expr("abs(s1 * 100 div n1 - s0 * 100 div n0)").as("diff"))
    nulls
      .crossJoin(broadcast(obs))
      .agg(
        max("n1").as("n_building"),
        max("n0").as("n_rest"),
        max("observed_diff").as("observed_diff_cc"),
        count(lit(1)).as("b_valid"),
        sum(when(col("diff") >= col("observed_diff"), 1L).otherwise(0L)).as("n_ge"))
      .withColumn("p_e6", expr("(1 + n_ge) * 1000000 div (b_valid + 1)"))
  }

  /** #407 Markov next-event prediction scorecard (§15.4: the chain
    * family ships its evaluation): train the first-order
    * maximum-likelihood predictor — per state, the argmax next event
    * by transition count, ties on event name — and score its top-1
    * accuracy over the SAME log, per state, against the
    * state-independent majority baseline (always predict the
    * corpus-wide most common next event). #376 measures next-event
    * ENTROPY (how predictable in principle); this measures what a
    * 1-step predictor actually ACHIEVES and the per-state lift over
    * ignoring state — the go/no-go read before wiring next-action
    * prediction into a product. Training-set accuracy by design
    * (documented): the question here is model-family signal, not
    * generalization. Transition counts fold to the alphabet²-bounded
    * frame; two rank-1 windows on it; one broadcast of the global
    * argmax; accuracies truncating e6.
    */
  def markovPrediction(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = Tables
      .events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("b", lead("event_type", 1).over(w))
      .filter(col("b").isNotNull)
      .groupBy(col("event_type").as("a"), col("b"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false)
    val pred = trans
      .withColumn(
        "rn",
        row_number().over(Window.partitionBy("a").orderBy(col("n").desc, col("b"))))
      .filter(col("rn") === 1)
      .select(col("a"), col("b").as("predicted_next"))
    val global = trans
      .groupBy("b")
      .agg(sum("n").as("nb"))
      .orderBy(col("nb").desc, col("b"))
      .limit(1)
      .select(col("b").as("baseline_next"))
    trans
      .join(pred, "a")
      .crossJoin(broadcast(global))
      .groupBy(col("a").as("state"), col("predicted_next"), col("baseline_next"))
      .agg(
        sum("n").as("n_transitions"),
        sum(when(col("b") === col("predicted_next"), col("n")).otherwise(0L)).as("n_correct"),
        sum(when(col("b") === col("baseline_next"), col("n")).otherwise(0L))
          .as("n_baseline_correct"))
      .select(
        col("state"),
        col("predicted_next"),
        col("n_transitions"),
        col("n_correct"),
        expr("n_correct * 1000000 div n_transitions").as("accuracy_e6"),
        col("baseline_next"),
        col("n_baseline_correct"),
        expr("n_baseline_correct * 1000000 div n_transitions").as("baseline_acc_e6"))
  }

  /** #406 Weight-of-evidence / information-value scorecard (the
    * credit-scoring feature screen, Siddiqi 2006): for each candidate
    * categorical feature — customer market segment and customer
    * nation — against the binary target "order is high-priority"
    * (URGENT/HIGH), the per-bin WOE = ln(%pos/%neg) and IV
    * contribution (%pos − %neg)·WOE, the standard pre-model read of
    * which attributes separate the classes (IV < 0.02 useless,
    * > 0.3 strong) and in WHICH bins. #313's mutual information
    * scores association in bits corpus-wide; WOE/IV is the per-bin
    * DIRECTIONAL decomposition modelers act on.
    *
    * Floats of integer ratios only (the established recipe): WOE and
    * IV terms are doubles of exact BIGINT count ratios, e6-quantized
    * per bin with floor(x·10⁶ + 0.5), never summed before
    * quantization — bit-identical in DuckDB. Bins where either class
    * count is zero get NULL WOE and a 0 IV term (strict convention,
    * no smoothing — documented; smoothing constants are a modeling
    * choice, not an engine one). One orders⋈customer join (customer
    * side small → broadcast), two bin aggregates, 1-row totals
    * broadcast.
    */
  def woeIv(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        (col("o_orderpriority").isin("1-URGENT", "2-HIGH")).cast("long").as("pos"))
      .join(
        broadcast(
          Tables
            .customer(spark, dir)
            .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"), col("c_nationkey"))),
        "o_custkey")
      .select(
        col("pos"),
        col("c_mktsegment").as("seg"),
        col("c_nationkey").cast("string").as("nat"))
      .localCheckpoint(eager = false)
    val stacked = base
      .select(lit("mktsegment").as("feature"), col("seg").as("bin"), col("pos"))
      .unionAll(base.select(lit("nation").as("feature"), col("nat").as("bin"), col("pos")))
    val tot = base.agg(
      sum("pos").as("total_pos"),
      (count(lit(1)) - sum("pos")).as("total_neg"))
    stacked
      .groupBy("feature", "bin")
      .agg(sum("pos").as("n_pos"), (count(lit(1)) - sum("pos")).as("n_neg"))
      .crossJoin(broadcast(tot))
      .select(
        col("feature"),
        col("bin"),
        col("n_pos"),
        col("n_neg"),
        expr("n_pos * 1000000 div total_pos").as("pct_pos_e6"),
        expr("n_neg * 1000000 div total_neg").as("pct_neg_e6"),
        expr("""CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                  CAST(floor(ln((CAST(n_pos AS DOUBLE) * total_neg)
                               / (CAST(n_neg AS DOUBLE) * total_pos)) * 1e6 + 0.5) AS BIGINT)
                END""").as("woe_e6"),
        expr("""CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                  CAST(floor((CAST(n_pos AS DOUBLE) / total_pos
                            - CAST(n_neg AS DOUBLE) / total_neg)
                           * ln((CAST(n_pos AS DOUBLE) * total_neg)
                               / (CAST(n_neg AS DOUBLE) * total_pos)) * 1e6 + 0.5) AS BIGINT)
                ELSE 0L END""").as("iv_term_e6"))
  }

  /** Hill-estimator order-statistic count — shared with the oracle. */
  val HillK = 100

  /** #380 Hill tail-index estimator (Hill 1975): α̂ = 1/H with
    * H = (1/k)·Σᵢ₌₁..k ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the top-k customer
    * lifetime revenues — the heavy-tail diagnostic that says whether
    * revenue concentration is Pareto-like and HOW heavy (α ≤ 1 means
    * the mean is tail-dominated; #180's Gini and #285's Lorenz
    * measure inequality, Hill measures the tail LAW, which is what
    * capacity planning and whale-risk models consume). Exact
    * discipline: the top-(k+1) order statistics ride a rank-limited
    * global window (WindowGroupLimit — the #13 top-k shape, never a
    * full sort), the threshold x₍ₖ₊₁₎ is a 1-row broadcast, each
    * ln(xᵢ/thr) term is a float of the integer cent ratio
    * e6-quantized BEFORE the order-free sum (#119 discipline),
    * H = Σ div k and α̂_e6 = 10¹² div H_e6 are truncating integer
    * divisions — both engines land the identical BIGINTs.
    */
  def hillTail(spark: SparkSession, dir: String, k: Int = HillK): DataFrame = {
    val rev = Tables
      .orders(spark, dir)
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("rev"))
    val w = Window.orderBy(col("rev").desc, col("o_custkey"))
    val top = rev
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k + 1)
    val thr = top.filter(col("rank") === k + 1).select(col("rev").as("thr"))
    top
      .filter(col("rank") <= k)
      .crossJoin(broadcast(thr))
      .select(
        col("thr"),
        expr("CAST(floor(ln(CAST(rev AS DOUBLE) / thr) * 1000000 + 0.5) AS BIGINT)")
          .as("term_e6"))
      .groupBy("thr")
      .agg(count(lit(1)).as("k"), sum("term_e6").as("sum_e6"))
      .select(
        col("k"),
        col("thr").as("thr_c"),
        expr("CAST(sum_e6 div k AS BIGINT)").as("hill_e6"),
        expr("""CAST(CASE WHEN sum_e6 div k > 0
                     THEN 1000000000000 div (sum_e6 div k) ELSE 0 END AS BIGINT)""")
          .as("alpha_e6"))
  }

  /** #381 Top trace variants (the process-mining variant explorer):
    * each user's FULL ordered event-type sequence as one path string,
    * grouped and ranked — the view every conformance discussion
    * starts from ("80% of users follow 6 variants; the tail is the
    * interesting part"). #251 ranks session OPENINGS, this ranks
    * whole-journey variants. Sequence assembled inside one per-user
    * aggregate (collect_list of (ts, event_id, type) structs,
    * array_sort on the same total order as every sequence op, then a
    * transform+join — per-key state bounded by a user's activity, the
    * #195 contract); top-25 by (n_users desc, variant) is a
    * TakeOrdered, no global window.
    */
  /** #404 Footprint conformance / token-less trace fitness: replay
    * every trace against the NOISE-FILTERED dependency model the
    * heuristics miner (#372) would keep — a direct transition a→b
    * conforms iff its dependency measure (|a→b|−|b→a|)/(|a→b|+|b→a|+1)
    * clears the standard 0.5 threshold (self-loops score n/(n+1), so
    * any observed loop stays legal) — closing the process-mining loop:
    * #377/#372 DISCOVER the model, #381 counts variants, this scores
    * how much of the live log the discovered model explains and WHICH
    * variants deviate (the pm4py footprint-conformance shape; ping-
    * pong a↔b noise fails the threshold in both directions and
    * surfaces as the non-conforming steps). Per top-`topK` variant:
    * traces, steps, conforming steps, fitness on the e6 grid.
    *
    * Scale: one per-user lead window (bounded partitions), transition
    * counts fold to the alphabet²-bounded model frame (broadcast
    * back), variants one per-user aggregate — no global windows; the
    * dep threshold compares e3-truncated quotients (negative
    * numerators truncate differently per engine but can never cross
    * the +500 gate, so the edge SET is engine-identical).
    */
  def footprintConformance(spark: SparkSession, dir: String, topK: Int = 25): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = ev
      .withColumn("b", lead("event_type", 1).over(w))
      .filter(col("b").isNotNull)
      .select(col("user_id"), col("event_type").as("a"), col("b"))
    val counts = trans.groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
    val model = counts
      .join(
        counts.select(col("b").as("a"), col("a").as("b"), col("n_ab").as("n_ba")),
        Seq("a", "b"),
        "left")
      .na
      .fill(0L, Seq("n_ba"))
      .filter(
        expr("""CASE WHEN a = b THEN n_ab * 1000 div (n_ab + 1)
                     ELSE (n_ab - n_ba) * 1000 div (n_ab + n_ba + 1) END >= 500"""))
      .select(col("a"), col("b"), lit(1L).as("ok"))
    val perUser = trans
      .groupBy("user_id", "a", "b")
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(model), Seq("a", "b"), "left")
      .na
      .fill(0L, Seq("ok"))
      .groupBy("user_id")
      .agg(sum("cnt").as("steps"), sum(expr("cnt * ok")).as("ok_steps"))
    ev.groupBy("user_id")
      .agg(
        expr("""array_join(
                  transform(
                    array_sort(collect_list(struct(ts, event_id, event_type))),
                    x -> x.event_type),
                  '>')""").as("variant"))
      .join(perUser, "user_id") // 1-event traces have no transitions: fitness undefined, dropped
      .groupBy("variant")
      .agg(
        count(lit(1)).as("n_traces"),
        sum("steps").as("n_steps"),
        sum("ok_steps").as("n_conforming"))
      .withColumn("fitness_e6", expr("n_conforming * 1000000 div n_steps"))
      .orderBy(col("n_traces").desc, col("variant"))
      .limit(topK)
  }

  def traceVariants(spark: SparkSession, dir: String, topK: Int = 25): DataFrame =
    Tables
      .events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .groupBy("user_id")
      .agg(
        expr("""array_join(
                  transform(
                    array_sort(collect_list(struct(ts, event_id, event_type))),
                    x -> x.event_type),
                  '>')""").as("variant"),
        count(lit(1)).as("n_events"))
      .groupBy("variant")
      .agg(
        count(lit(1)).as("n_users"),
        max("n_events").as("max_events"))
      .orderBy(col("n_users").desc, col("variant"))
      .limit(topK)

  /** #382 Monthly customer-concentration ratios (CR4 / CR8): per
    * month, the revenue share of the top-4 and top-8 customers — the
    * antitrust-style concentration read beside #246's HHI (CRk is
    * what sales leadership actually quotes: "our top 4 accounts are
    * 31% of the month"), trended monthly so concentration CREEP is
    * visible. Top-8 per month rides a month-partitioned
    * WindowGroupLimit (the #13 top-k-per-group shape — never a full
    * within-month sort at any scale); month totals come from one
    * aggregate; shares are truncating e6 quotients through
    * DECIMAL(38,0). ≤#months output rows.
    */
  def crConcentration(spark: SparkSession, dir: String): DataFrame = {
    val cm = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        expr(
          "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT)")
          .as("m"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("m", "o_custkey")
      .agg(sum("c").as("rev"))
    val w = Window.partitionBy("m").orderBy(col("rev").desc, col("o_custkey"))
    val top = cm
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 8)
      .groupBy("m")
      .agg(
        sum(when(col("rank") <= 4, col("rev")).otherwise(0L)).as("top4_c"),
        sum(col("rev")).as("top8_c"))
    val tot = cm.groupBy("m").agg(sum("rev").as("total_c"), count(lit(1)).as("n_cust"))
    tot
      .join(top, "m")
      .select(
        col("m"),
        col("n_cust"),
        col("total_c"),
        col("top4_c"),
        col("top8_c"),
        expr("CAST(CAST(top4_c AS DECIMAL(38,0)) * 1000000 div total_c AS BIGINT)")
          .as("cr4_e6"),
        expr("CAST(CAST(top8_c AS DECIMAL(38,0)) * 1000000 div total_c AS BIGINT)")
          .as("cr8_e6"))
  }

  /** #383 Purchase-streak distribution (gaps-and-islands): per
    * customer, the longest run of CONSECUTIVE active months, rolled
    * up into a streak-length histogram — the habit-formation read
    * #270's stickiness ratio can't give (DAU/WAU is a point ratio;
    * streaks measure persistence, the strongest simple churn
    * predictor in subscription analytics). The classic SQL
    * construction kept exact: island id = month − dense_rank(month)
    * per customer (consecutive months share an island), streak = max
    * island size per customer. All windows partitioned BY CUSTOMER
    * (a customer's months, never the table); the histogram fold is
    * one ≤max-streak aggregate.
    */
  /** Markov-attribution contract constants — shared with the oracle
    * builder: fixed propagation rounds (the LPA-style determinism
    * contract) and the absorbing conversion state.
    */
  val MarkovAttrRounds = 6

  /** #384 Markov removal-effect attribution (Anderl et al. 2014 —
    * the data-driven multi-touch attribution standard): model user
    * journeys as a first-order chain START → events → absorption at
    * the first `purchase` (or NULL when the journey ends without
    * one); a channel's credit is its REMOVAL EFFECT — how much total
    * conversion probability dies when every path through that channel
    * is cut — normalized into attribution shares. The causal-flavored
    * answer to the heuristic #178 U-shape (which pays fixed
    * positional credit no matter what the paths actually needed).
    *
    * Exactness contract: journey truncation at the first purchase +
    * START/NULL framing happen inside one per-user aggregate (#195's
    * activity-bounded state); the chain is the integer edge count
    * matrix; propagation runs EXACTLY [[MarkovAttrRounds]] synchronous
    * rounds of massₑ₆·n div n_from (the #253 quantized-trajectory
    * recipe — both engines replay the identical integer trajectory),
    * absorbing states carry n = n_from = 1 self-loops so absorbed
    * mass is held exactly; conv = mass at `purchase` after the fixed
    * rounds. Removal redirects every edge INTO the channel to NULL
    * and drops the channel's outgoing edges — margins of surviving
    * edges unchanged, so removed-conv ≤ base-conv holds round-by-
    * round (monotonicity of truncating division; spec-pinned).
    *
    * Scale: the data-scale work is ONE per-user aggregate down to the
    * alphabet²-bounded edge-count matrix (≤ (types+3)² rows — the
    * whitelisted bounded-model-state pattern k-means training uses,
    * `Similarity.scala` collect sites); scenarios and all propagation
    * rounds fold driver-side on that matrix — distributing 6 rounds
    * of ≤64-row shuffles would be pure scheduler overhead (measured
    * 7.6 s distributed vs ~1.5 s folded at sf0.1).
    */
  /** #412 Shapley-value channel attribution (the cooperative-game
    * model Google Ads' data-driven attribution popularized; completes
    * the attribution trio — #178 positional U-shape, #384 Markov
    * removal-effect, this the axiomatic coalition split): journeys =
    * each user's path up to the FIRST purchase, touchset = the
    * distinct non-purchase channels in it; the coalition value v(S) =
    * number of conversions whose touchset ⊆ S ("the coalition alone
    * could have produced them"), and every channel's Shapley value is
    * computed by FULL coalition enumeration — φ_c = Σ_{S∌c}
    * |S|!(n−1−|S|)!·(v(S∪c)−v(S)) / n! — which is exact here because
    * the channel alphabet is tiny (2^n coalitions, n ≤ 5). Exact
    * integers end-to-end: touchsets encode as bitmasks, v() is a
    * masked count, the factorial weights keep φ as an integer
    * numerator over n! (emitted as `phi_num` + `denom`), shares on
    * the truncating e6 grid. For THIS value function game theory says
    * φ collapses to the closed form "each conversion splits 1/|T|
    * across its touchset" (a sum of unanimity games) — `ShapleySpec`
    * asserts the enumeration ≡ the closed form exactly, which both
    * validates the machinery and documents why v(S) with synergy
    * terms (where the closed form dies) would drop in unchanged.
    *
    * Scale: the ONLY data-scale work is one per-user path aggregate;
    * everything after lives on ≤2^n·n bounded frames (the #384
    * alphabet²-bounded discipline — explode of masks × channels, a
    * BroadcastNLJ-class grid, never a data-scale shuffle).
    */
  def shapleyAttribution(spark: SparkSession, dir: String): DataFrame = {
    val seqs = Tables
      .events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .groupBy("user_id")
      .agg(expr(
        "transform(array_sort(collect_list(struct(ts, event_id, event_type))), x -> x.event_type)")
        .as("t0"))
      .filter(expr("array_position(t0, 'purchase') > 0"))
      .select(
        expr("""array_sort(array_distinct(
                  slice(t0, 1, CAST(array_position(t0, 'purchase') AS INT) - 1)))""")
          .as("touchset"))
    val channels = Tables
      .events(spark, dir)
      .select(col("event_type").as("channel"))
      .filter(col("channel") =!= "purchase")
      .distinct()
      .withColumn("r", (row_number().over(Window.orderBy("channel")) - 1).cast("long"))
      .localCheckpoint(eager = false)
    val nc = channels.agg(count(lit(1)).as("nc"))
    // journey bitmask: Σ 2^rank over its touched channels (0 if empty)
    // DISTINCT touchsets first — building the mask over raw journeys
    // would sum each channel's bit once PER JOURNEY sharing the set
    val tmasks = seqs
      .select("touchset")
      .distinct()
      .select(explode_outer(col("touchset")).as("channel"), col("touchset"))
      .join(channels, Seq("channel"), "left")
      .groupBy("touchset")
      .agg(coalesce(sum(expr("shiftleft(1L, CAST(r AS INT))")), lit(0L)).as("tmask"))
    val tsCounts = seqs
      .join(tmasks, "touchset")
      .groupBy("tmask")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val masks = nc
      .select(col("nc"), explode(expr("sequence(0L, shiftleft(1L, CAST(nc AS INT)) - 1)")).as("m"))
    // grid-complete: masks no journey's touchset fits still need v=0
    // rows, or the v(S∪c) inner join silently drops their terms
    val vFrame = masks
      .join(
        masks
          .crossJoin(tsCounts)
          .filter(expr("(tmask & m) = tmask"))
          .groupBy("m")
          .agg(sum("cnt").as("v")),
        Seq("m"),
        "left")
      .na
      .fill(0L, Seq("v"))
      .localCheckpoint(eager = false)
    val terms = channels
      .crossJoin(vFrame)
      .filter(expr("(m >> CAST(r AS INT)) % 2 = 0"))
      .withColumn(
        "s",
        expr("aggregate(sequence(0, CAST(nc - 1 AS INT)), 0L, (a, j) -> a + (m >> j) % 2)"))
      .join(
        vFrame.select(col("m").as("m2"), col("v").as("v2")),
        expr("m2 = m + shiftleft(1L, CAST(r AS INT))"))
      .select(
        col("channel"),
        col("nc"),
        expr("CAST(factorial(CAST(s AS INT)) AS BIGINT) * CAST(factorial(CAST(nc - 1 - s AS INT)) AS BIGINT) * (v2 - v)")
          .as("term"))
    val phi = terms
      .groupBy("channel", "nc")
      .agg(sum("term").as("phi_num"))
      .withColumn("denom", expr("CAST(factorial(CAST(nc AS INT)) AS BIGINT)"))
    val tot = phi.agg(sum("phi_num").as("tot_num"))
    phi
      .crossJoin(broadcast(tot))
      .select(
        col("channel"),
        col("phi_num"),
        col("denom"),
        expr("phi_num * 1000 div denom").as("shapley_journeys_e3"),
        expr("CASE WHEN tot_num > 0 THEN phi_num * 1000000 div tot_num ELSE 0L END")
          .as("share_e6"))
  }

  def markovAttribution(
      spark: SparkSession,
      dir: String,
      rounds: Int = MarkovAttrRounds): DataFrame = {
    val seqs = Tables
      .events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .groupBy("user_id")
      .agg(expr(
        "transform(array_sort(collect_list(struct(ts, event_id, event_type))), x -> x.event_type)")
        .as("t0"))
      .select(expr("""CASE WHEN array_position(t0, 'purchase') > 0
                      THEN slice(t0, 1, CAST(array_position(t0, 'purchase') AS INT))
                      ELSE t0 END""").as("t1"))
      .select(expr("""concat(array('START'), t1,
                      CASE WHEN element_at(t1, -1) <> 'purchase'
                      THEN array('NULL') ELSE array() END)""").as("t"))
    // alphabet²-bounded model state: the chain's integer count matrix
    val edges = seqs
      .select(explode(expr(
        """transform(slice(t, 1, size(t) - 1),
             (x, i) -> named_struct('a', x, 'b', element_at(t, i + 2)))""")).as("e"))
      .groupBy(col("e.a").as("a"), col("e.b").as("b"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val channels = (edges.keys.flatMap { case (a, b) => Seq(a, b) }.toSet
      -- Set("START", "NULL", "purchase")).toSeq.sorted
    def convFor(removed: Option[String]): Long = {
      val redirected = edges.toSeq
        .filter { case ((a, _), _) => !removed.contains(a) }
        .map { case ((a, b), n) => ((a, if (removed.contains(b)) "NULL" else b), n) }
        .groupBy(_._1)
        .map { case (k, xs) => k -> xs.map(_._2).sum }
      val withLoops =
        redirected ++ Map(("purchase", "purchase") -> 1L, ("NULL", "NULL") -> 1L)
      val nFrom = withLoops.groupBy(_._1._1).map { case (a, xs) => a -> xs.values.sum }
      var mass = Map("START" -> 1000000L)
      for (_ <- 1 to rounds) {
        mass = withLoops.toSeq
          .flatMap { case ((a, b), n) => mass.get(a).map(m => b -> m * n / nFrom(a)) }
          .groupBy(_._1)
          .map { case (b, xs) => b -> xs.map(_._2).sum }
      }
      mass.getOrElse("purchase", 0L)
    }
    val base = convFor(None)
    val effects = channels.map(c => (c, base - convFor(Some(c))))
    val sumEff = effects.map(_._2).sum
    import spark.implicits._
    effects
      .map { case (c, eff) =>
        (c, base, base - eff, eff, if (sumEff > 0) eff * 1000000L / sumEff else 0L)
      }
      .toDF("channel", "base_conv_e6", "removed_conv_e6", "effect_e6", "attribution_e6")
  }

  /** #385 Edge embeddedness (Granovetter tie strength on the
    * co-purchase graph): for each support-2 edge, the Jaccard overlap
    * of its endpoints' neighborhoods — cn div (deg_a + deg_b − 2 −
    * cn), common neighbors over the union excluding the endpoints
    * themselves — the classic strong-tie/weak-tie score: embedded
    * edges live inside communities (#366's seams), zero-embeddedness
    * edges are the BRIDGES information actually crosses. #176 counts
    * triangles per graph, #283 scores NON-edges; this scores the
    * edges themselves. Common neighbors via the oriented wedge join
    * on the support-filtered edge set (Σdeg² bounded by the support
    * filter, the #176 shape); top-100 by (emb desc, pair) rides
    * WindowGroupLimit. Isolated edges (both endpoints degree 1) have
    * an empty union — scored 0 by convention, documented here.
    */
  def edgeEmbeddedness(spark: SparkSession, dir: String, topK: Int = 100): DataFrame = {
    val e = coPurchasePairs(spark, dir, minSupport = 2)
      .select(col("part_a").as("pa"), col("part_b").as("pb"))
      .localCheckpoint(eager = false)
    val adj = e
      .select(col("pa").as("u"), col("pb").as("v"))
      .unionAll(e.select(col("pb").as("u"), col("pa").as("v")))
    val deg = adj.groupBy("u").agg(count(lit(1)).as("deg"))
    val cn = adj
      .select(col("u"), col("v").as("x"))
      .join(adj.select(col("u"), col("v").as("y")), Seq("u"))
      .filter(col("x") < col("y"))
      .select(col("x").as("pa"), col("y").as("pb"))
      .join(e, Seq("pa", "pb"), "left_semi")
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("cn"))
    e.join(cn, Seq("pa", "pb"), "left")
      .na
      .fill(0L, Seq("cn"))
      .join(deg.select(col("u").as("pa"), col("deg").as("deg_a")), "pa")
      .join(deg.select(col("u").as("pb"), col("deg").as("deg_b")), "pb")
      .select(
        col("pa"),
        col("pb"),
        col("deg_a"),
        col("deg_b"),
        col("cn"),
        expr("""CAST(CASE WHEN deg_a + deg_b - 2 - cn > 0
                     THEN cn * 1000000 div (deg_a + deg_b - 2 - cn)
                     ELSE 0 END AS BIGINT)""").as("emb_e6"))
      .orderBy(col("emb_e6").desc, col("pa"), col("pb"))
      .limit(topK)
  }

  /** #393 AOV mix-shift decomposition (the BI "mix vs rate" analysis:
    * each month-over-month change in average order value split, per
    * market segment, into a MIX effect — the segment's order-share
    * moved — and a RATE effect — the segment's own AOV moved — the
    * first question asked whenever a topline average moves: "did the
    * business change, or did the mix?"; #363 decomposes revenue by
    * part price×volume, this decomposes the AVERAGE by segment
    * share×rate). Laspeyres-mix / current-weight-rate split, exact in
    * rationals: Δ(S_i/N) = (n1_i·N0 − n0_i·N1)·S0_i/(N0·N1·n0_i)
    * [mix] + (S1_i·n0_i − S0_i·n1_i)/(N1·n0_i) [rate] telescopes
    * with zero slack; on the e4 grid each term is ONE sign-factored
    * truncating division of a DECIMAL(38,0) product (the n·N·S·10⁴
    * numerator crosses 2⁶³ at sf0.1 already), so the only slack is
    * the documented ≤2-quanta truncation residual, emitted as its own
    * column and spec-pinned. Segments present in only one month carry
    * their whole contribution as status 'new'/'gone' (the #363
    * new/churned morphology; a base rate for them does not exist).
    * One (month, segment) aggregate + one shifted full-outer join +
    * two broadcast month-total joins; ≤months×segments rows.
    */
  def mixShift(spark: SparkSession, dir: String): DataFrame = {
    val cm = Tables
      .orders(spark, dir)
      .join(
        Tables.customer(spark, dir).select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "o_custkey")
      .select(
        col("c_mktsegment").as("segment"),
        expr(
          "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT)")
          .as("m"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("m", "segment")
      .agg(count(lit(1)).as("n"), sum("c").as("s"))
      .localCheckpoint(eager = false)
    val tot = cm.groupBy("m").agg(sum("n").as("nt"), sum("s").as("st"))
    val months = tot.select("m")
    val valid = months.join(months.select((col("m") - 1).as("m")), Seq("m"), "left_semi")
    val nxt = cm.select(
      col("segment"),
      (col("m") - 1).as("m"),
      col("n").as("n1"),
      col("s").as("s1"))
    cm.withColumnRenamed("n", "n0")
      .withColumnRenamed("s", "s0")
      .join(nxt, Seq("m", "segment"), "full_outer")
      .join(valid, Seq("m"), "left_semi")
      .join(broadcast(tot.select(col("m"), col("nt").as("nt0"), col("st").as("st0"))), "m")
      .join(
        broadcast(tot.select((col("m") - 1).as("m"), col("nt").as("nt1"))),
        "m")
      .na
      .fill(0L, Seq("n0", "n1", "s0", "s1"))
      .select(
        col("m"),
        col("segment"),
        col("n0"),
        col("n1"),
        col("s0").as("s0_c"),
        col("s1").as("s1_c"),
        expr("""CASE WHEN n0 > 0 AND n1 > 0 THEN 'both'
                     WHEN n0 = 0 THEN 'new' ELSE 'gone' END""").as("status"),
        // sign-factored truncating e4 terms; NULL outside 'both'
        expr("""CASE WHEN n0 > 0 AND n1 > 0 THEN
                  CAST((CASE WHEN (CAST(n1 AS DECIMAL(38,0)) * nt0 - CAST(n0 AS DECIMAL(38,0)) * nt1) * s0 < 0
                        THEN -1 ELSE 1 END)
                     * (abs((CAST(n1 AS DECIMAL(38,0)) * nt0 - CAST(n0 AS DECIMAL(38,0)) * nt1) * s0) * 10000
                        div (CAST(nt0 AS DECIMAL(38,0)) * nt1 * n0)) AS BIGINT)
                END""").as("mix_e4"),
        expr("""CASE WHEN n0 > 0 AND n1 > 0 THEN
                  CAST((CASE WHEN CAST(s1 AS DECIMAL(38,0)) * n0 - CAST(s0 AS DECIMAL(38,0)) * n1 < 0
                        THEN -1 ELSE 1 END)
                     * (abs(CAST(s1 AS DECIMAL(38,0)) * n0 - CAST(s0 AS DECIMAL(38,0)) * n1) * 10000
                        div (CAST(nt1 AS DECIMAL(38,0)) * n0)) AS BIGINT)
                END""").as("rate_e4"),
        expr("""CAST((CASE WHEN CAST(s1 AS DECIMAL(38,0)) * nt0 - CAST(s0 AS DECIMAL(38,0)) * nt1 < 0
                      THEN -1 ELSE 1 END)
                   * (abs(CAST(s1 AS DECIMAL(38,0)) * nt0 - CAST(s0 AS DECIMAL(38,0)) * nt1) * 10000
                      div (CAST(nt0 AS DECIMAL(38,0)) * nt1)) AS BIGINT)""")
          .as("dcontrib_e4"))
      .withColumn(
        "resid_e4",
        when(col("status") === "both",
          col("dcontrib_e4") - col("mix_e4") - col("rate_e4")))
  }

  /** #387 Syntetos–Boylan demand classification (the SBC quadrants —
    * Syntetos, Boylan & Croston 2005): each part classified smooth /
    * intermittent / erratic / lumpy from ADI (mean inter-demand
    * interval) vs the 1.32 cutoff and CV² (squared coefficient of
    * variation of daily demand sizes) vs 0.49 — the decision table
    * that says WHICH forecaster to run (#316's Croston only earns its
    * keep in the intermittent/lumpy quadrants; smooth parts belong to
    * #250's Holt). Both tests exact by cross-multiplication on the
    * integer grid: ADI = span/(n−1) < 1.32 becomes span·100 <
    * 132·(n−1), CV² = (nΣq²−S²)/S² < 0.49 becomes (nΣq²−S²)·100 <
    * 49·S², every product through DECIMAL(38,0)↔HUGEINT. One
    * (part, day) aggregate + one per-part moment fold + a ≤4-row
    * quadrant rollup (with total demand so the rollup shows where the
    * VOLUME sits, not just the part count); parts with a single
    * demand day have no interval — reported as their own
    * 'single_day' class rather than silently dropped.
    */
  def demandClasses(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .lineitem(spark, dir)
      .select(
        col("l_partkey"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q"))
      .groupBy("l_partkey", "day")
      .agg(sum("q").as("q"))
    val per = daily
      .groupBy("l_partkey")
      .agg(
        count(lit(1)).as("n"),
        (max("day") - min("day")).as("span"),
        sum("q").as("s"),
        sum(expr("CAST(q AS DECIMAL(38,0)) * q")).as("sq2"))
    per
      .select(
        col("l_partkey"),
        col("s"),
        expr("""CASE WHEN n < 2 THEN 'single_day'
                WHEN CAST(span AS DECIMAL(38,0)) * 100 < 132 * (n - 1) THEN
                  CASE WHEN (n * sq2 - CAST(s AS DECIMAL(38,0)) * s) * 100
                            < 49 * CAST(s AS DECIMAL(38,0)) * s
                       THEN 'smooth' ELSE 'erratic' END
                ELSE
                  CASE WHEN (n * sq2 - CAST(s AS DECIMAL(38,0)) * s) * 100
                            < 49 * CAST(s AS DECIMAL(38,0)) * s
                       THEN 'intermittent' ELSE 'lumpy' END END""").as("quadrant"))
      .groupBy("quadrant")
      .agg(count(lit(1)).as("n_parts"), sum("s").as("total_qty"))
  }

  def purchaseStreaks(spark: SparkSession, dir: String): DataFrame = {
    val cm = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        expr(
          "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT)")
          .as("m"))
      .distinct()
    val w = Window.partitionBy("o_custkey").orderBy("m")
    cm.withColumn("island", col("m") - dense_rank().over(w))
      .groupBy("o_custkey", "island")
      .agg(count(lit(1)).as("len"))
      .groupBy("o_custkey")
      .agg(max("len").as("longest"))
      .groupBy(col("longest").as("streak_months"))
      .agg(count(lit(1)).as("n_customers"))
  }
}
