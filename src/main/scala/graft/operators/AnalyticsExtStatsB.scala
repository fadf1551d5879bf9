package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Statistics operators, second part trait (the r10 file-size
  * discipline: AnalyticsExtStats sits at the ~2.9k-line cap, so new
  * stats members land here; the assembled [[AnalyticsExt]] object is
  * unchanged for call sites).
  */
private[graft] trait AnalyticsExtStatsB { this: AnalyticsExt.type =>

  /** #430 Wilcoxon signed-rank test (Wilcoxon 1945): PAIRED
    * location-shift test — does the same customer spend differently in
    * even vs odd calendar months? The paired member beside #288
    * Mann–Whitney (two independent samples) and #252's z (proportions):
    * pairing removes the between-customer spend variance that swamps
    * an unpaired comparison, and ranks make it robust to the heavy
    * right tail where a paired t would hand the answer to whales.
    *
    * Pairs: per customer, total order cents in odd months (x) vs even
    * months (y), customers active in both; d = y − x, zeros dropped
    * (the standard convention). Ranks of |d| with midrank ties on the
    * DOUBLED grid (2·avgrank = 2·below + t + 1 — integers, no halves),
    * computed distributively via the #288 sharded two-pass rank: per-
    * distinct-|d| counts, value-range shards, per-shard local prefix
    * sums + shard-carry offsets — no global window ever sees a row-
    * scale frame. z from the tie-corrected normal approximation,
    * Var(2W⁺) = (2n(n+1)(2n+1) − Σ(t³−t)) / 12, σ via the one-ulp-
    * clamp isqrt, sign factored before the truncating div (#289's
    * exact-z discipline).
    */
  def wilcoxonSignedRank(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val pairs = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        expr("CAST(month(CAST(o_orderdate AS DATE)) % 2 AS BIGINT)").as("par"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("o_custkey")
      .agg(
        sum(when(col("par") === 1, col("c"))).as("x"),
        sum(when(col("par") === 0, col("c"))).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .select((col("y") - col("x")).as("d"))
    val byVal = pairs
      .select(abs(col("d")).as("a"), (col("d") > 0).cast("long").as("pos"))
      .groupBy("a")
      .agg(count(lit(1)).as("cnt"), sum("pos").as("cnt_pos"))
    val bounds = byVal.agg(min("a").as("lo"), max("a").as("hi"))
    val sharded = byVal
      .crossJoin(broadcast(bounds))
      .withColumn("shard", expr(s"((a - lo) * $nShards) div (hi - lo + 1)"))
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
            Window.partitionBy("shard").orderBy("a").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .join(broadcast(offsets), "shard")
      .select(col("cnt"), col("cnt_pos"), (col("off") + col("cum_local")).as("cum"))
    cum
      .agg(
        sum("cnt").as("n"),
        sum(expr("cnt_pos * (2 * cum + cnt + 1)")).as("w_plus_2x"),
        sum(expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt")).as("tie_t"))
      .withColumn("mu_2x", expr("n * (n + 1) div 2"))
      .withColumn(
        "var_2x",
        expr("""CAST((2 * CAST(n AS DECIMAL(38,0)) * (n + 1) * (2 * n + 1) - tie_t)
                 div 12 AS DECIMAL(38,0))"""))
      .withColumn("s0", expr("CAST(floor(sqrt(CAST(var_2x AS DOUBLE))) AS BIGINT)"))
      .withColumn(
        "sigma",
        expr("""s0 + (CASE WHEN (CAST(s0 AS DECIMAL(38,0)) + 1) * (s0 + 1) <= var_2x
                       THEN 1 ELSE 0 END)
                   - (CASE WHEN CAST(s0 AS DECIMAL(38,0)) * s0 > var_2x THEN 1 ELSE 0 END)"""))
      .select(
        col("n").as("n_pairs"),
        col("w_plus_2x"),
        (col("n") * (col("n") + 1) - col("w_plus_2x")).as("w_minus_2x"),
        col("tie_t").cast("long").as("tie_t"),
        expr("""CAST((CASE WHEN w_plus_2x >= mu_2x THEN 1 ELSE -1 END)
                 * (abs(CAST(w_plus_2x AS DECIMAL(38,0)) - mu_2x) * 1000000
                    div sigma) AS BIGINT)""").as("z_e6"))
  }

  /** #431 CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013 —
    * the industry-standard experiment readout: regress the experiment-
    * period metric on its own PRE-period value and difference the
    * residuals, cutting the variance a t-test has to overcome by the
    * squared pre/post correlation). Units = event users; pre/post =
    * value sums (whole-unit grid) either side of the calendar midpoint
    * of the observed day span; arms = the #86 deterministic hash split
    * (`cuped:` salt — a null experiment, so the RAW diff is the noise
    * CUPED exists to shrink). θ = cov(x,y)/var(x) from exact integer
    * co-moments (n·Σxy − Σx·Σy over n·Σx² − (Σx)², the #314 corr
    * discipline), e6-floored with the sign factored out; the adjusted
    * diff subtracts θ·(arm pre-mean gap) on the same grid; ρ²_e6 —
    * the variance fraction removed — is the staged DECIMAL(38,0)
    * quotient num²·1e6 div (den_x·den_y). Whole-value-unit grid keeps
    * num² inside DECIMAL(38,0) through ~sf10; at larger corpora the
    * same fold runs on a coarser metric grid (the #400 kilocents
    * lesson). One per-user aggregate + one 1-row co-moment fold — no
    * windows, no driver state.
    */
  def cuped(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val nsPerDay = 86400L * 1000000000L
    val ev = Tables
      .events(spark, dir)
      .select(
        col("user_id"),
        expr(s"ts div ${nsPerDay}L").as("day"),
        expr("CAST(floor(value + 0.5) AS BIGINT)").as("v"))
    val split = ev.agg(expr("min(day) + (max(day) - min(day) + 1) div 2").as("split_day"))
    val perUser = ev
      .crossJoin(broadcast(split))
      .groupBy("user_id")
      .agg(
        coalesce(sum(when(col("day") < col("split_day"), col("v"))), lit(0L)).as("x"),
        coalesce(sum(when(col("day") >= col("split_day"), col("v"))), lit(0L)).as("y"))
      .withColumn("t", pmod(Dedup.hash60(concat(lit("cuped:"), col("user_id"))), lit(2L)))
    perUser
      .agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"),
        sum("y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum("t").as("n1"),
        sum(expr("t * x")).as("sx1"),
        sum(expr("t * y")).as("sy1"))
      .withColumn("n0", col("n") - col("n1"))
      .withColumn("sx0", col("sx") - col("sx1"))
      .withColumn("sy0", col("sy") - col("sy1"))
      .withColumn("num", expr("n * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("den_x", expr("n * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("den_y", expr("n * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      // every quotient carries the degenerate-corpus guard rho2_e6
      // always had (all-equal pre-period sums → den_x = 0; an empty
      // hash arm → n1·n0 = 0): non-ANSI Spark would yield NULL but
      // the DuckDB oracle would raise division-by-zero — the guard
      // makes both engines emit the same clean NULL row
      .withColumn(
        "theta_e6",
        expr("""CASE WHEN den_x > 0 THEN
                  CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
                   * (abs(num) * 1000000 div den_x) AS BIGINT)
                ELSE NULL END"""))
      .withColumn(
        "d_raw_e6",
        expr("""CASE WHEN n1 > 0 AND n0 > 0 THEN
                  CAST((CASE WHEN CAST(sy1 AS DECIMAL(38,0)) * n0 - CAST(sy0 AS DECIMAL(38,0)) * n1 < 0
                         THEN -1 ELSE 1 END)
                   * (abs(CAST(sy1 AS DECIMAL(38,0)) * n0 - CAST(sy0 AS DECIMAL(38,0)) * n1)
                      * 1000000 div (CAST(n1 AS DECIMAL(38,0)) * n0)) AS BIGINT)
                ELSE NULL END"""))
      .withColumn(
        "gap_x",
        expr("CAST(sx1 AS DECIMAL(38,0)) * n0 - CAST(sx0 AS DECIMAL(38,0)) * n1"))
      .withColumn(
        "adj_term_e6",
        expr("""CASE WHEN den_x > 0 AND n1 > 0 AND n0 > 0 THEN
                  CAST((CASE WHEN theta_e6 * gap_x < 0 THEN -1 ELSE 1 END)
                   * (abs(CAST(theta_e6 AS DECIMAL(38,0)) * gap_x)
                      div (CAST(n1 AS DECIMAL(38,0)) * n0)) AS BIGINT)
                ELSE NULL END"""))
      .select(
        col("n").as("n_users"),
        col("n1").as("n_treat"),
        col("n0").as("n_ctrl"),
        col("theta_e6"),
        col("d_raw_e6"),
        (col("d_raw_e6") - col("adj_term_e6")).as("d_cuped_e6"),
        expr("""CASE WHEN den_x > 0 AND den_y > 0 THEN
                  CAST(num * num * 1000000 div (den_x * den_y) AS BIGINT)
                ELSE NULL END""").as("rho2_e6"))
  }

  /** #439 Split-conformal prediction interval (Vovk's conformal
    * framework in the Lei et al. 2018 split form — the
    * distribution-free interval every forecast SLA wants: pick any
    * point model, compute |y − ŷ| nonconformity on a held-out
    * calibration set, and the ⌈(n+1)(1−α)⌉-th smallest score is a
    * width with finite-sample ≥ 1−α coverage under exchangeability).
    * Day thirds: TRAIN fits the model (per-weekday-slot mean of daily
    * order revenue — deliberately simple; conformal's point is that
    * the GUARANTEE never depends on the model), CALIBRATION supplies
    * the scores and q̂ at α = 0.1, TEST reports the honest empirical
    * coverage (time series are not exchangeable — the measured number
    * IS the finding, reported beside the 0.9 target). All cents-grid
    * integers: slot means by truncating div, q̂ by the exact rank
    * r = ⌈0.9·(n_cal+1)⌉ over the calibration day frame (≤
    * #calendar-days rows — documented PlanDisciplineSpec exception),
    * coverage e6-floored.
    */
  def conformal(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("day")
      .agg(sum("c").as("y"))
      .withColumn("slot", expr("day % 7"))
    val bounds = byDay.agg(
      expr("min(day) + (max(day) - min(day) + 1) div 3").as("t1"),
      expr("min(day) + 2 * ((max(day) - min(day) + 1) div 3)").as("t2"))
    // no mid-plan cut: the day aggregate is calendar-bounded and
    // cheap to re-plan per consumer, and an uncut plan keeps every
    // window visible to the PlanDisciplineSpec walker
    val phased = byDay.crossJoin(broadcast(bounds))
    val model = phased
      .filter(col("day") < col("t1"))
      .groupBy("slot")
      .agg(sum("y").as("sy"), count(lit(1)).as("ns"))
      .select(col("slot"), expr("sy div ns").as("yhat"))
    val cal = phased
      .filter(col("day") >= col("t1") && col("day") < col("t2"))
      .join(broadcast(model), "slot")
      .select(col("day"), abs(col("y") - col("yhat")).as("score"))
    val qhat = cal
      .withColumn("r", row_number().over(Window.orderBy(col("score"), col("day"))).cast("long"))
      .withColumn(
        "n_cal",
        count(lit(1)).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("r") === expr("least(n_cal, (9 * (n_cal + 1) + 9) div 10)"))
      .select(col("n_cal"), col("score").as("qhat"))
    phased
      .filter(col("day") >= col("t2"))
      .join(broadcast(model), "slot")
      .crossJoin(broadcast(qhat))
      .crossJoin(broadcast(
        phased.agg(sum((col("day") < col("t1")).cast("long")).as("n_train"))))
      .agg(
        max("n_train").as("n_train"),
        max("n_cal").as("n_cal"),
        count(lit(1)).as("n_test"),
        max("qhat").as("qhat"),
        sum((abs(col("y") - col("yhat")) <= col("qhat")).cast("long")).as("n_covered"))
      .select(
        col("n_train"),
        col("n_cal"),
        col("n_test"),
        col("qhat"),
        col("n_covered"),
        expr("CAST(n_covered * 1000000 div n_test AS BIGINT)").as("coverage_e6"),
        lit(900000L).as("target_e6"))
  }

  /** #447 G-test of independence (the log-likelihood-ratio
    * alternative to #189's Pearson χ² on the SAME status×priority
    * contingency table — G = 2·Σ O·ln(O·N/(R·C)) is additive across
    * partitions of the table (χ² is not), is what χ² approximates to
    * second order, and diverges from χ² exactly where expected counts
    * are small; running both on one table is the standard
    * approximation check). Per-cell e6 terms as floor(2·O·ln(O·N/
    * (R·C))·10⁶ + 0.5) — the ln of a ratio of EXACT integer products
    * (each ≪ 2⁵³, so the doubles are identical across engines — the
    * #376 float-identity discipline), observed-only cells (absent
    * cells contribute 0·ln0 = 0 by convention); the total rides the
    * same groupless-aggregate-anchored window as #189. One grouped
    * count + two margin rollups + a 1-row total.
    */
  def gTest(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables
      .orders(spark, dir)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("o"))
    val rowm = cells.groupBy("o_orderstatus").agg(sum("o").as("r"))
    val colm = cells.groupBy("o_orderpriority").agg(sum("o").as("c"))
    val tot = cells.agg(sum("o").as("n"))
    cells
      .join(broadcast(rowm), "o_orderstatus")
      .join(broadcast(colm), "o_orderpriority")
      .crossJoin(broadcast(tot))
      .select(
        col("o_orderstatus"),
        col("o_orderpriority"),
        col("o").as("n_cell"),
        expr("CAST((CAST(r AS DECIMAL(38,0)) * c * 1000000) div CAST(n AS DECIMAL(38,0)) AS BIGINT)")
          .as("expected_e6"),
        expr("""CAST(floor(2.0 * o * ln((CAST(o AS DOUBLE) * n) / (CAST(r AS DOUBLE) * c))
                     * 1000000 + 0.5) AS BIGINT)""").as("g_term_e6"))
      .withColumn("g_total_e6", sum("g_term_e6").over(Window.partitionBy()))
  }

  /** #442 Capture–recapture corpus-size estimate (Chapman 1951's
    * bias-corrected Lincoln–Petersen: N̂ = (nA+1)(nB+1)/(m+1) − 1) —
    * the two-sample answer to "how many DISTINCT documents exist"
    * when no crawl sees everything: two independent samples, the
    * overlap rate prices the coverage, the estimator inverts it. The
    * sample-based member beside #20's HLL (one full scan, hashes
    * everything) and #148's KMV overlap (sketch intersection): here
    * each crawl touches ~30% of the corpus and the estimate comes
    * from 2 sample scans — what an operator estimating a 100 TB
    * crawl frontier actually runs. Crawls are #86 hash draws
    * (`capA:`/`capB:` salts — independent by construction, the
    * assumption the estimator needs); the captured UNITS are distinct
    * content fingerprints (md5 of text), so cross-crawl duplicates
    * collapse exactly as they would in a dedup pass. Scorecard in the
    * same row (§15.4): N̂ vs the true distinct-fingerprint count,
    * signed error e6.
    */
  def captureRecapture(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val marked = docs
      .withColumn(
        "in_a",
        (pmod(Dedup.hash60(concat(lit("capA:"), col("doc_id"))), lit(100L)) < 30).cast("long"))
      .withColumn(
        "in_b",
        (pmod(Dedup.hash60(concat(lit("capB:"), col("doc_id"))), lit(100L)) < 30).cast("long"))
      .groupBy("fp")
      .agg(max("in_a").as("a"), max("in_b").as("b"))
    marked
      .agg(
        count(lit(1)).as("n_true"),
        sum("a").as("n_a"),
        sum("b").as("n_b"),
        sum(expr("a * b")).as("n_both"))
      .select(
        col("n_a"),
        col("n_b"),
        col("n_both"),
        expr("CAST((n_a + 1) * (n_b + 1) div (n_both + 1) - 1 AS BIGINT)").as("n_hat"),
        col("n_true"),
        expr("""CAST((CASE WHEN (n_a + 1) * (n_b + 1) div (n_both + 1) - 1 - n_true < 0
                       THEN -1 ELSE 1 END)
                 * (abs((n_a + 1) * (n_b + 1) div (n_both + 1) - 1 - n_true) * 1000000
                    div n_true) AS BIGINT)""").as("err_e6"))
  }

  /** #441 Cochran–Armitage trend test (Cochran 1954 / Armitage 1955):
    * does a binary rate TREND across ordered groups — the ordered
    * companion to #189's χ² (which sees association but is blind to
    * order: a V-shaped rate passes χ² loudly and CA silently, a
    * monotone drift does the reverse). Groups = the five 10-unit
    * lineitem quantity bands with scores w = 0..4, outcome = the
    * line was returned. Exact integer z²: A = N·Σwy − Y·Σwn,
    * z² = A²·N / (Y(N−Y)(N·Σnw² − (Σnw)²)) — every product staged
    * through DECIMAL(38,0), the #254 squared-statistic trick (no
    * sqrt), compared to the χ²₁ 95% point 3.841459 on the e6 grid.
    * One partial-agg pass + a 1-row fold; per-group rates reported
    * beside the statistic so the read is auditable.
    */
  def trendTest(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables
      .lineitem(spark, dir)
      .select(
        expr("least(4L, CAST(floor(l_quantity - 0.5) AS BIGINT) div 10)").as("w"),
        (col("l_returnflag") === "R").cast("long").as("y"))
      .groupBy("w")
      .agg(count(lit(1)).as("n"), sum("y").as("yy"))
    g.agg(
      count(lit(1)).as("n_groups"),
      sum("n").as("bign"),
      sum("yy").as("bigy"),
      sum(expr("w * yy")).as("swy"),
      sum(expr("w * n")).as("swn"),
      sum(expr("w * w * n")).as("sw2n"))
      .withColumn(
        "a",
        expr("CAST(bign AS DECIMAL(38,0)) * swy - CAST(bigy AS DECIMAL(38,0)) * swn"))
      .withColumn(
        "den",
        expr("""CAST(bigy AS DECIMAL(38,0)) * (bign - bigy) *
                 (CAST(bign AS DECIMAL(38,0)) * sw2n - CAST(swn AS DECIMAL(38,0)) * swn)"""))
      .select(
        col("n_groups"),
        col("bign").as("n_lines"),
        col("bigy").as("n_returned"),
        col("a").cast("long").as("t_num"),
        expr("""CASE WHEN den > 0 THEN
                  CAST(a * a * bign * 1000000 div den AS BIGINT)
                ELSE NULL END""").as("z2_e6"),
        expr("""CASE WHEN den > 0 AND a * a * bign * 1000000 div den >= 3841459
                  THEN 1L ELSE 0L END""").as("significant_95"))
  }

  /** #440 Isotonic calibration via the minimax closed form (PAVA's
    * fixed point, Ayer et al. 1955 / Robertson-Wright-Dykstra: the
    * isotonic fit at bin i equals max over j ≤ i of min over k ≥ i of
    * the pooled rate Σs/Σn on [j, k]) — the monotone recalibration
    * every score-producing model gets before deployment, and the
    * NONPARAMETRIC upgrade over #233's reliability read (that
    * DESCRIBES miscalibration per bin; this FIXES it under the
    * monotonicity assumption). The closed form is the point for a
    * distributed engine: the textbook pool-adjacent-violators loop is
    * sequential, but over b bins the minimax needs only the O(b²)
    * interval-pooled rates — all joins on the b-row aggregate,
    * corpus-independent, no iteration, no windows.
    *
    * Bins: 10 equal-width order-value bands (the shard idiom);
    * outcome = order status 'F'. Fraction ORDERING on the e15
    * truncated-quotient key (distinct pooled rates differ by ≥
    * 1/(N_a·N_b), so e15 resolves exactly through ~sf100; the e6
    * report is floor-of-floor = the direct e6 floor). Spec replays
    * the sequential PAVA driver-side and asserts the closed form
    * lands on the same pools — the two-formulation identity.
    */
  def isotonic(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"),
        (col("o_orderstatus") === "F").cast("long").as("y"))
    val bounds = base.agg(min("c").as("lo"), max("c").as("hi"))
    val bins = base
      .crossJoin(broadcast(bounds))
      .withColumn("bin", expr("least(9L, ((c - lo) * 10) div (hi - lo + 1))"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("s"))
    val ids = bins.select(col("bin"))
    val pairs = ids
      .select(col("bin").as("j"))
      .crossJoin(broadcast(ids.select(col("bin").as("k"))))
      .filter(col("j") <= col("k"))
    val intervals = pairs
      .join(broadcast(bins.select(col("bin").as("m"), col("n"), col("s"))),
        col("m") >= col("j") && col("m") <= col("k"))
      .groupBy("j", "k")
      .agg(sum("n").as("nn"), sum("s").as("ss"))
      .withColumn(
        "key15",
        expr("CAST(CAST(ss AS DECIMAL(38,0)) * 1000000000000000 div nn AS BIGINT)"))
    val cand = ids
      .select(col("bin").as("i"))
      .join(broadcast(intervals), col("j") <= col("i") && col("i") <= col("k"))
    val iso = cand
      .groupBy("i", "j")
      .agg(min("key15").as("mn"))
      .groupBy("i")
      .agg(max("mn").as("mx"))
      .select(col("i").as("bin"), expr("mx div 1000000000").as("rate_iso_e6"))
    bins
      .join(broadcast(iso), "bin")
      .select(
        col("bin"),
        col("n"),
        col("s"),
        expr("CAST(s * 1000000 div n AS BIGINT)").as("rate_raw_e6"),
        col("rate_iso_e6"))
  }

  /** #432 Yule–Walker AR(2) fit + one-step backtest: fit daily order
    * revenue's autoregressive structure from its first two
    * autocovariances (the method-of-moments solve every classical
    * ARIMA fit starts from) and price it against the naive
    * last-value forecast — the parametric member beside #159's OLS
    * trend (deterministic drift), #250/#292's exponential smoothers
    * (recency-weighted level), and #304 ACF (which reports the
    * correlations this op turns into a MODEL). φ₁ = c₁(c₀−c₂)/
    * (c₀²−c₁²), φ₂ = (c₀c₂−c₁²)/(c₀²−c₁²).
    *
    * Integer discipline: deviations on the n-scaled dollar grid
    * (v = (n·x − S) div n — sign-factored, both engines truncate
    * identically), co-moments c₀/c₁/c₂ as exact DECIMAL(38,0) sums of
    * v-products over the available-lag terms, and the φ quotients on
    * KILO-downscaled co-moments (each c-factor div 1e3 — num and den
    * shrink by 1e6 together, the ratio moves ~1e-11 relative, and
    * both den and the e6 quotient stay inside the LONG that Spark's
    * `div` casts to at any corpus scale). Backtest on the e6
    * grid: x̂ₜ = μ_e6 + φ₁·vₜ₋₁ + φ₂·vₜ₋₂ vs naive x̂ₜ = xₜ₋₁, MAE
    * ratio e6-floored. The lag-2 window rides the PER-DAY aggregate
    * (≤ #calendar-days rows — documented PlanDisciplineSpec
    * exception, 1 instance, the #284 CUSUM precedent).
    */
  def ar2Forecast(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Tables
      .orders(spark, dir)
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("day"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("day")
      .agg(expr("sum(c) div 100").as("x"))
    val tot = byDay.agg(count(lit(1)).as("n"), sum("x").as("s"))
    val lagged = byDay
      .withColumn("x1", lag("x", 1).over(Window.orderBy("day")))
      .withColumn("x2", lag("x", 2).over(Window.orderBy("day")))
      .crossJoin(broadcast(tot))
      // sign factored before the div: Spark `div` truncates toward
      // zero, DuckDB `//` floors — identical only on magnitudes
      .withColumn(
        "v",
        expr("(CASE WHEN n * x - s < 0 THEN -1 ELSE 1 END) * (abs(n * x - s) div n)"))
      .withColumn(
        "v1",
        expr("""CASE WHEN x1 IS NULL THEN NULL ELSE
                  (CASE WHEN n * x1 - s < 0 THEN -1 ELSE 1 END) * (abs(n * x1 - s) div n)
                END"""))
      .withColumn(
        "v2",
        expr("""CASE WHEN x2 IS NULL THEN NULL ELSE
                  (CASE WHEN n * x2 - s < 0 THEN -1 ELSE 1 END) * (abs(n * x2 - s) div n)
                END"""))
    val moments = lagged.agg(
      max("n").as("n"),
      max("s").as("s"),
      sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("c0"),
      sum(expr("CAST(v AS DECIMAL(38,0)) * v1")).as("c1"),
      sum(expr("CAST(v AS DECIMAL(38,0)) * v2")).as("c2"))
    // the phi quotients run on KILO-downscaled co-moments (sign-
    // factored abs-div, both engines identical): Spark's `div` casts
    // its result to LONG, so num·1e6 div den must keep BOTH the
    // intermediate quotient and den inside 2⁶³ — downscaling each
    // c-factor by 1e3 shrinks num and den by 1e6 together (the ratio
    // is unchanged to ~1e-11 relative) and the e6 quotient is a
    // small long at any corpus scale
    val phis = moments
      // `div` casts to LONG — widen back to DECIMAL(38,0) before the
      // squares or c0s*c0s overflows the long under ANSI
      .withColumn(
        "c0s",
        expr("CAST((CASE WHEN c0 < 0 THEN -1 ELSE 1 END) * (abs(c0) div 1000) AS DECIMAL(38,0))"))
      .withColumn(
        "c1s",
        expr("CAST((CASE WHEN c1 < 0 THEN -1 ELSE 1 END) * (abs(c1) div 1000) AS DECIMAL(38,0))"))
      .withColumn(
        "c2s",
        expr("CAST((CASE WHEN c2 < 0 THEN -1 ELSE 1 END) * (abs(c2) div 1000) AS DECIMAL(38,0))"))
      .withColumn("den", expr("c0s * c0s - c1s * c1s"))
      .withColumn(
        "phi1_e6",
        expr("""CASE WHEN den > 0 THEN
                  CAST((CASE WHEN c1s * (c0s - c2s) < 0 THEN -1 ELSE 1 END)
                    * (abs(c1s * (c0s - c2s)) * 1000000 div den) AS BIGINT)
                ELSE NULL END"""))
      .withColumn(
        "phi2_e6",
        expr("""CASE WHEN den > 0 THEN
                  CAST((CASE WHEN c0s * c2s - c1s * c1s < 0 THEN -1 ELSE 1 END)
                    * (abs(c0s * c2s - c1s * c1s) * 1000000 div den) AS BIGINT)
                ELSE NULL END"""))
      .select(col("n"), col("s"), col("c0"), col("c1"), col("c2"), col("phi1_e6"), col("phi2_e6"))
    lagged
      .filter(col("v1").isNotNull && col("v2").isNotNull)
      .select(col("x"), col("x1"), col("v1"), col("v2"))
      .crossJoin(broadcast(phis))
      .withColumn("mu_e6", expr("CAST(s AS DECIMAL(38,0)) * 1000000 div n"))
      .withColumn(
        "err_ar",
        expr("abs(CAST(x AS DECIMAL(38,0)) * 1000000 - (mu_e6 + phi1_e6 * v1 + phi2_e6 * v2))"))
      .withColumn("err_naive", expr("abs(CAST(x AS DECIMAL(38,0)) - x1) * 1000000"))
      .agg(
        max("n").as("n_days"),
        max("c0").cast("long").as("c0"),
        max("c1").cast("long").as("c1"),
        max("c2").cast("long").as("c2"),
        max("phi1_e6").as("phi1_e6"),
        max("phi2_e6").as("phi2_e6"),
        count(lit(1)).as("n_scored"),
        sum("err_ar").as("sum_err_ar"),
        sum("err_naive").as("sum_err_naive"))
      .select(
        col("n_days"),
        col("c0"),
        col("c1"),
        col("c2"),
        col("phi1_e6"),
        col("phi2_e6"),
        col("n_scored"),
        expr("CAST(sum_err_ar div (n_scored * 1000000) AS BIGINT)").as("mae_ar"),
        expr("CAST(sum_err_naive div (n_scored * 1000000) AS BIGINT)").as("mae_naive"),
        expr("""CASE WHEN sum_err_naive > 0 THEN
                  CAST(sum_err_ar * 1000000 div sum_err_naive AS BIGINT)
                ELSE NULL END""").as("mae_ratio_e6"))
  }

  /** Daily cents series per event type — the shared frame under the
    * r13 time-series diagnostics (#455–#458). One events scan → one
    * (type, day) aggregate; everything downstream runs on the tiny
    * (series × days) frame, so at 100 TB the only row-scale work is
    * the map-side daily rollup.
    */
  private def dailyCents(spark: SparkSession, dir: String): DataFrame = {
    val nsPerDay = 86400L * 1000000000L
    Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        expr(s"ts div ${nsPerDay}L").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum("cents").as("c"))
  }

  /** #463 Gumbel extreme-value fit on 30-day block maxima (Gumbel
    * 1958; method-of-moments: β = s·√6/π, μ = x̄ − γ·β with γ the
    * Euler–Mascheroni constant): per series, the return levels a
    * capacity planner reads — "the daily spend we should see exceeded
    * once a year (T=12 blocks) / once in five years (T=60)":
    * x_T = μ − β·ln(−ln(1−1/T)). Block maxima, not raw days, is what
    * makes the Fisher–Tippett limit apply; #331/#284 watch the mean,
    * this prices the TAIL.
    *
    * Blocks are pure integer windows (day div 2 on this corpus's
    * 30-day span; at production span the divisor widens — no calendar
    * dependence); block maxima and their two power sums are exact
    * integers; β/μ/return levels are one fixed scalar double chain
    * (#447 discipline, `pi()` agreeing bit-for-bit in both engines)
    * on the e2 (cent) grid. Two bounded aggregates.
    */
  def gumbelFit(spark: SparkSession, dir: String): DataFrame =
    dailyCents(spark, dir)
      .select(col("event_type"), expr("day div 2").as("blk"), col("c"))
      .groupBy("event_type", "blk")
      .agg(max("c").as("m"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_blocks"),
        sum("m").as("s1"),
        sum(expr("CAST(m AS DECIMAL(38,0)) * m")).as("s2"))
      .filter(expr(
        "n_blocks >= 12 AND CAST(n_blocks AS DECIMAL(38,0)) * s2 - CAST(s1 AS DECIMAL(38,0)) * s1 > 0"))
      .selectExpr(
        "event_type",
        "n_blocks",
        "CAST(s1 AS DOUBLE) / n_blocks AS mean",
        """(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_blocks)
           / (n_blocks - 1) AS var""")
      .selectExpr(
        "event_type",
        "n_blocks",
        "mean",
        "sqrt(6.0 * var) / pi() AS beta")
      .selectExpr(
        "event_type",
        "n_blocks",
        "mean - 0.5772156649015329 * beta AS mu",
        "beta")
      .selectExpr(
        "event_type",
        "n_blocks",
        "CAST(floor(mu * 100 + 0.5) AS BIGINT) AS mu_e2",
        "CAST(floor(beta * 100 + 0.5) AS BIGINT) AS beta_e2",
        // Gumbel quantiles -ln(-ln(1-1/T)) as full-precision literals:
        // engines' ln() may differ in the last ulp on folded constants
        """CAST(floor((mu + beta * 2.441716398881459) * 100 + 0.5)
           AS BIGINT) AS rl12_e2""",
        """CAST(floor((mu + beta * 4.085952773003955) * 100 + 0.5)
           AS BIGINT) AS rl60_e2""")

  /** #464 Transition handoff / waiting-time profile (the PERFORMANCE
    * view of #174's transition matrix — process mining's bottleneck
    * table: per (from→to) event-type handoff, how LONG the handoff
    * takes, not just how often it happens; #354 profiles within-type
    * inter-arrivals, this profiles the cross-type edges): count, mean
    * and max gap (µs), total wait, and the handoff's share of its
    * from-type's outflow.
    *
    * All-integer: gaps are exact ns-long differences on the (ts,
    * event_id)-ordered per-user timeline (the #174 ordering), reported
    * div 1000 on the µs grid; one user-partitioned lead window + one
    * alphabet²-bounded aggregate + the #174 broadcast margin join.
    */
  def handoffTimes(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = Tables
      .events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .withColumn("next_ts", lead("ts", 1).over(w))
      .filter(col("next_type").isNotNull)
      .select(
        col("event_type").as("from_type"),
        col("next_type").as("to_type"),
        // per-VALUE µs truncation (ts div 1000 ↔ epoch_us), not a
        // truncated ns difference — the oracle-parity convention
        expr("next_ts div 1000 - ts div 1000").as("gap_us"))
      .groupBy("from_type", "to_type")
      .agg(
        count(lit(1)).as("n_trans"),
        sum("gap_us").as("total_wait_us"),
        max("gap_us").as("max_gap_us"))
    val fromTotals = trans.groupBy("from_type").agg(sum("n_trans").as("n_from"))
    trans
      .join(broadcast(fromTotals), "from_type")
      .select(
        col("from_type"),
        col("to_type"),
        col("n_trans"),
        expr("total_wait_us div n_trans").as("mean_gap_us"),
        col("max_gap_us"),
        col("total_wait_us"),
        expr("(n_trans * 1000000) div n_from").as("share_e6"))
  }

  /** #466 Landmark-BFS reach profile / diameter lower bound (the
    * multi-source BFS primitive behind approximate-diameter and
    * closeness sketches, Palmer et al. 2002 ANF-style): from the 4
    * lowest-id vertices of the #166 co-purchase graph, run 4 rounds
    * of breadth-first expansion and report each landmark's reach
    * curve (vertices within d = 0..4) and capped eccentricity; the
    * max observed distance is a certified diameter LOWER bound —
    * small-world co-purchase graphs saturate fast, and the curve
    * says exactly how fast.
    *
    * Distributed shape: the #166 edge build (distinct basket pairs,
    * support ≥ 2, symmetrized), then per round one frontier⋈edges
    * join, an anti-join against visited, and an eager lineage cut —
    * frontier-bounded work, the same discipline as the components
    * loop. The oracle replays BFS as a recursive CTE with min-dist
    * dedup. Landmark count and rounds are constants, so the plan is a
    * fixed 4-join chain regardless of corpus size.
    */
  def landmarkBfs(
      spark: SparkSession,
      dir: String,
      nLandmarks: Int = 4,
      rounds: Int = 4): DataFrame = Lineage.checkpointReleasing(spark) { implicit scope =>
    import Lineage.CpOps
    val po = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = po
      .select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(po.select(col("l_orderkey"), col("l_partkey").as("part_b")), "l_orderkey")
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
      .cache()
    val edges = pairs
      .select(col("part_a").as("src"), col("part_b").as("dst"))
      .unionAll(pairs.select(col("part_b").as("src"), col("part_a").as("dst")))
      .repartition(col("src"))
      .cache()
    val landmarks = edges
      .select(col("src").as("node"))
      .distinct()
      .orderBy("node")
      .limit(nLandmarks)
      .cp(eager = true)
    var visited = landmarks.select(col("node").as("l"), col("node"), lit(0L).as("d"))
    var frontier = visited
    for (r <- 1 to rounds) {
      val next = frontier
        .join(edges, frontier("node") === edges("src"))
        .select(col("l"), col("dst").as("node"), lit(r.toLong).as("d"))
        .distinct()
        .join(visited.select(col("l").as("vl"), col("node").as("vn")),
          col("l") === col("vl") && col("node") === col("vn"), "left_anti")
        .cp(eager = true)
      visited = visited.unionAll(next).cp(eager = true)
      frontier = next
    }
    val out = visited
      .groupBy("l")
      .agg(
        count(lit(1)).as("n_reached"),
        sum(expr("CASE WHEN d <= 1 THEN 1 ELSE 0 END")).as("within_1"),
        sum(expr("CASE WHEN d <= 2 THEN 1 ELSE 0 END")).as("within_2"),
        sum(expr("CASE WHEN d <= 3 THEN 1 ELSE 0 END")).as("within_3"),
        max("d").as("ecc_capped"))
      .select(
        col("l").as("landmark"),
        col("n_reached"),
        col("within_1"),
        col("within_2"),
        col("within_3"),
        col("ecc_capped"))
    (out, Seq(pairs, edges))
  }

  /** #473 Hurst exponent by rescaled range (Hurst 1951 / Mandelbrot-
    * Wallis R/S analysis): per daily-cents series, mean R/S over
    * observation-blocks of w = 5/10/15 days, and H = the slope of
    * ln(R/S) on ln(w) — the long-memory diagnostic that separates
    * mean-reverting (H < ½), random-walk (H ≈ ½) and trending
    * (H > ½) series; the fractal complement to #456's lag-1 view
    * (DW sees one step back, H sees the whole dependence decay).
    *
    * Exactness: within a block of w days, the cumulative deviation at
    * step k is the INTEGER w·P_k − k·S (P = prefix sum) so the range
    * R·w is exact; R/S = Rw/√(w·S2 − S²) is one double chain per
    * block rounded onto the e9 grid BEFORE the per-(series, w) mean
    * (the #472 order-independence discipline); the 3-point log-log
    * slope is a fixed closed form over the three e9 means. Windows
    * are partitioned by (series) and (series, w, block) — bounded
    * frames, no global ordering.
    */
  def hurstRs(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyCents(spark, dir)
      .withColumn(
        "rn",
        row_number().over(Window.partitionBy("event_type").orderBy("day")).cast("long"))
      .localCheckpoint(eager = false)
    val sizes = daily.sparkSession
      .range(1)
      .select(explode(array(lit(5L), lit(10L), lit(15L))).as("w"))
    val blocks = daily
      .crossJoin(broadcast(sizes))
      .select(
        col("event_type"),
        col("w"),
        expr("(rn - 1) div w").as("blk"),
        expr("(rn - 1) % w + 1").as("k"),
        col("c"))
    val wB = Window.partitionBy("event_type", "w", "blk")
    val wOrd = wB.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perBlock = blocks
      .withColumn("nblk", count(lit(1)).over(wB))
      .filter(col("nblk") === col("w"))
      .withColumn("p", sum("c").over(wOrd))
      .withColumn("s1", sum("c").over(wB))
      .withColumn("s2", sum(expr("CAST(c AS DECIMAL(38,0)) * c")).over(wB))
      .withColumn("cd", expr("w * p - k * s1"))
      .groupBy("event_type", "w", "blk")
      .agg(
        max("cd").as("cdmax"),
        min("cd").as("cdmin"),
        max("s1").as("s1m"),
        max("s2").as("s2m"),
        max("w").as("wm"))
      .filter(expr(
        "CAST(wm AS DECIMAL(38,0)) * s2m - CAST(s1m AS DECIMAL(38,0)) * s1m > 0"))
      .selectExpr(
        "event_type",
        "w",
        """CAST(floor(CAST(cdmax - cdmin AS DOUBLE)
             / sqrt(CAST(wm AS DOUBLE) * CAST(s2m AS DOUBLE)
                    - CAST(s1m AS DOUBLE) * CAST(s1m AS DOUBLE))
             * 1000000000 + 0.5) AS BIGINT) AS rs_e9""")
    val meanRs = perBlock
      .groupBy("event_type", "w")
      .agg(count(lit(1)).as("n_blocks"), sum("rs_e9").as("srs"))
      .select(col("event_type"), col("w"), expr("srs div n_blocks").as("mrs_e9"))
    meanRs
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_sizes"),
        sum(expr("CASE WHEN w = 5 THEN mrs_e9 ELSE 0 END")).as("rs5_e9"),
        sum(expr("CASE WHEN w = 10 THEN mrs_e9 ELSE 0 END")).as("rs10_e9"),
        sum(expr("CASE WHEN w = 15 THEN mrs_e9 ELSE 0 END")).as("rs15_e9"))
      .filter(col("n_sizes") === 3 && col("rs5_e9") > 0 && col("rs10_e9") > 0 &&
        col("rs15_e9") > 0)
      .selectExpr(
        "event_type",
        "rs5_e9", "rs10_e9", "rs15_e9",
        // slope of ln(rs) on ln(w) at w = 5/10/15: with centered
        // ln(w) weights the closed form is (ln3-weighted) —
        // lw = (ln5, ln10, ln15), mean lw; slope = sum (lw-mean)*lr /
        // sum (lw-mean)^2; constants as full-precision literals
        """CAST(floor(
             ((-0.5972531564093522) * ln(CAST(rs5_e9 AS DOUBLE) / 1000000000.0)
              + (0.09589402415059345) * ln(CAST(rs10_e9 AS DOUBLE) / 1000000000.0)
              + (0.5013591322587576) * ln(CAST(rs15_e9 AS DOUBLE) / 1000000000.0))
             / 0.6172679762079831 * 1000000 + 0.5) AS BIGINT) AS hurst_e6""")
  }

  /** #474 Sequential probability ratio test (Wald 1945 SPRT, the
    * ancestor of every always-valid A/B monitor): the treatment arm's
    * daily completion outcomes drive a cumulative log-likelihood walk
    * between Bernoulli(p₀ = 0.485) and Bernoulli(p₁ = 0.515); the
    * walk decides REJECT-H₀ at ln((1−β)/α) or ACCEPT-H₀ at
    * ln(β/(1−α)) (α = β = 0.05) the FIRST day it crosses — the
    * peeking-safe alternative to #252's fixed-horizon z. Honest read:
    * the arms are a null hash split, so the walk hovers and the
    * decided flag prices how often a null experiment ends early.
    *
    * Exactness: per-day (s, n) are integers; the day's LLR increment
    * s·ln(p₁/p₀) + (n−s)·ln((1−p₁)/(1−p₀)) uses the two ln constants
    * as full-precision LITERALS (#463's folded-constant lesson),
    * rounded onto the e6 grid per day BEFORE the cumulative/extrema
    * windows (order-independent sums); all windows ride the
    * ≤ #calendar-days daily frame.
    */
  def sprt(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // ln(0.515/0.485), ln(0.485/0.515) at full double precision
    val lnPos = "0.06001800972625295"
    val lnNeg = "-0.06001800972625295"
    val aUp = 2944439L // floor(ln(19) * 1e6 + 0.5)
    val bDn = -2944439L
    val daily = Tables
      .orders(spark, dir)
      .withColumn(
        "t",
        pmod(Dedup.hash60(concat(lit("sprt:"), col("o_custkey"))), lit(2L)))
      .filter(col("t") === 1)
      .selectExpr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS day",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS f")
      .groupBy("day")
      .agg(count(lit(1)).as("n"), sum("f").as("s"))
      .selectExpr(
        "day", "n", "s",
        s"""CAST(floor((s * $lnPos + (n - s) * ($lnNeg)) * 1000000 + 0.5)
           AS BIGINT) AS llr_day_e6""")
    val wCum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("llr_cum_e6", sum("llr_day_e6").over(wCum))
      .withColumn("cum_max", max("llr_cum_e6").over(wCum))
      .withColumn("cum_min", min("llr_cum_e6").over(wCum))
      .select(
        col("day"),
        col("n"),
        col("s"),
        col("llr_day_e6"),
        col("llr_cum_e6"),
        expr(s"CAST(CASE WHEN cum_max >= $aUp THEN 1 ELSE 0 END AS BIGINT)")
          .as("rejected_h0"),
        expr(s"CAST(CASE WHEN cum_min <= $bDn THEN 1 ELSE 0 END AS BIGINT)")
          .as("accepted_h0"))
  }

  /** #467 McNemar paired-binary test (McNemar 1947, continuity-
    * corrected): does the same customer's "completed an order"
    * indicator CHANGE between odd and even calendar months? The
    * paired-binary member completing the test family — #252 compares
    * two INDEPENDENT proportions, #430 pairs CONTINUOUS spend; McNemar
    * reads only the discordant pairs b = (1,0), c = (0,1):
    * χ² = (|b−c|−1)²/(b+c), χ²(1).
    *
    * All-integer: per-customer parity indicators are two conditional
    * max-aggregates; b, c, and the e6 statistic are one bounded
    * aggregate + integer div (grids as in #430's z). Customers active
    * in both parities only — the paired-design requirement.
    */
  def mcnemar(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .selectExpr(
        "o_custkey",
        "CAST(month(CAST(o_orderdate AS DATE)) % 2 AS BIGINT) AS par",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS f")
      .groupBy("o_custkey")
      .agg(
        max(expr("CASE WHEN par = 1 THEN 1 ELSE 0 END")).as("has_odd"),
        max(expr("CASE WHEN par = 0 THEN 1 ELSE 0 END")).as("has_even"),
        max(expr("CASE WHEN par = 1 THEN f ELSE 0 END")).as("x"),
        max(expr("CASE WHEN par = 0 THEN f ELSE 0 END")).as("y"))
      .filter(col("has_odd") === 1 && col("has_even") === 1)
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(expr("CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END")).as("b"),
        sum(expr("CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END")).as("c"))
      .filter(expr("b + c > 0"))
      .selectExpr(
        "n_pairs",
        "b",
        "c",
        "(abs(b - c) - 1) * (abs(b - c) - 1) * 1000000 div (b + c) AS chi2_e6")
      .selectExpr(
        "n_pairs", "b", "c", "chi2_e6",
        // chi2(1) 5% critical 3.841459 on the e6 grid (the #430 pin)
        "CAST(CASE WHEN chi2_e6 > 3841459 THEN 1 ELSE 0 END AS BIGINT) AS significant_5pct")

  /** #468 Negative-binomial overdispersion fit (method of moments,
    * NB2: r = m²/(v−m), p = m/v): per event type's daily counts, the
    * COUNT MODEL #260's Fano factor only diagnoses — Poisson says
    * v = m; when v > m the NB's r says HOW clustered arrivals are
    * (small r = bursty), and (r, p) is what a simulator or anomaly
    * threshold actually parameterizes.
    *
    * Daily counts and their power sums are exact integers; m, v and
    * the (r, p) map are one fixed scalar double chain (#447
    * discipline) on the e6 grid; Poisson-compatible series (v ≤ m)
    * keep the dispersion read but NULL the NB parameters — the honest
    * model-applicability flag. One aggregate over the bounded daily
    * frame.
    */
  def negbinFit(spark: SparkSession, dir: String): DataFrame = {
    val nsPerDay = 86400L * 1000000000L
    Tables
      .events(spark, dir)
      .select(col("event_type"), expr(s"ts div ${nsPerDay}L").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("c"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_days"),
        sum("c").as("s1"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("s2"))
      .filter(expr("n_days >= 8"))
      .selectExpr(
        "event_type",
        "n_days",
        "CAST(s1 AS DOUBLE) / n_days AS m",
        """(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_days)
           / (n_days - 1) AS v""")
      .filter(expr("m > 0 AND v > 0"))
      .selectExpr(
        "event_type",
        "n_days",
        "CAST(floor(m * 1000000 + 0.5) AS BIGINT) AS mean_e6",
        "CAST(floor(v / m * 1000000 + 0.5) AS BIGINT) AS dispersion_e6",
        """CASE WHEN v > m THEN CAST(floor(m * m / (v - m) * 1000000 + 0.5) AS BIGINT)
           ELSE NULL END AS r_e6""",
        """CASE WHEN v > m THEN CAST(floor(m / v * 1000000 + 0.5) AS BIGINT)
           ELSE NULL END AS p_e6""",
        "CAST(CASE WHEN v > m THEN 1 ELSE 0 END AS BIGINT) AS overdispersed")
  }

  /** #469 Friedman rank test (Friedman 1937, tie-corrected): do the
    * four CALENDAR QUARTERS carry different spend, judged WITHIN each
    * customer? The k-sample paired member above #430's Wilcoxon
    * (k = 2) — blocking by customer removes the between-customer
    * spend variance, and ranks remove the whale tail, so quarterly
    * seasonality is read against each customer's own baseline.
    *
    * All-integer: each customer's 4 quarterly cent totals rank WITHIN
    * THE ROW on the doubled midrank grid (2·less + ties + 1 — a pure
    * array expression, no window, no shuffle beyond the customer
    * rollup); the tie-corrected statistic
    * χ² = (k−1)·Σ_j (R2_j − n(k+1))² / (Σ dr² − n·k·(k+1)²) is exact
    * integer arithmetic over the four doubled column sums, one double
    * div onto the e6 grid. χ²(3) 5% critical 7.814728.
    */
  def friedman(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables
      .orders(spark, dir)
      .selectExpr(
        "o_custkey",
        "CAST((month(CAST(o_orderdate AS DATE)) - 1) div 3 AS BIGINT) AS qtr",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
      .groupBy("o_custkey")
      .agg(
        sum(expr("CASE WHEN qtr = 0 THEN cents ELSE 0 END")).as("v0"),
        sum(expr("CASE WHEN qtr = 1 THEN cents ELSE 0 END")).as("v1"),
        sum(expr("CASE WHEN qtr = 2 THEN cents ELSE 0 END")).as("v2"),
        sum(expr("CASE WHEN qtr = 3 THEN cents ELSE 0 END")).as("v3"))
      .withColumn("vals", expr("array(v0, v1, v2, v3)"))
    val dr = (0 to 3).map(j =>
      expr(s"2 * size(filter(vals, x -> x < v$j)) + size(filter(vals, x -> x = v$j)) + 1")
        .cast("long")
        .as(s"dr$j"))
    q.select(dr: _*)
      .agg(
        count(lit(1)).as("n_blocks"),
        sum("dr0").as("r2_0"),
        sum("dr1").as("r2_1"),
        sum("dr2").as("r2_2"),
        sum("dr3").as("r2_3"),
        sum(expr(
          "CAST(dr0 AS DECIMAL(38,0)) * dr0 + CAST(dr1 AS DECIMAL(38,0)) * dr1 + " +
            "CAST(dr2 AS DECIMAL(38,0)) * dr2 + CAST(dr3 AS DECIMAL(38,0)) * dr3")).as("sdr2"))
      .filter(expr("sdr2 - CAST(n_blocks AS DECIMAL(38,0)) * 4 * 25 > 0"))
      .selectExpr(
        "n_blocks",
        "r2_0", "r2_1", "r2_2", "r2_3",
        """CAST(3 * (CAST(r2_0 - n_blocks * 5 AS DECIMAL(38,0)) * (r2_0 - n_blocks * 5)
                + CAST(r2_1 - n_blocks * 5 AS DECIMAL(38,0)) * (r2_1 - n_blocks * 5)
                + CAST(r2_2 - n_blocks * 5 AS DECIMAL(38,0)) * (r2_2 - n_blocks * 5)
                + CAST(r2_3 - n_blocks * 5 AS DECIMAL(38,0)) * (r2_3 - n_blocks * 5)) * 1000000
           div CAST(sdr2 - CAST(n_blocks AS DECIMAL(38,0)) * 4 * 25 AS DECIMAL(38,0))
           AS BIGINT) AS chi2_e6""")
      .selectExpr(
        "n_blocks", "r2_0", "r2_1", "r2_2", "r2_3", "chi2_e6",
        "CAST(CASE WHEN chi2_e6 > 7814728 THEN 1 ELSE 0 END AS BIGINT) AS significant_5pct")
  }

  /** #470 Bass diffusion fit (Bass 1969 discrete OLS: n_t = a +
    * b·C_{t−1} + c·C²_{t−1} over daily FIRST-ORDER adopters): the
    * product-adoption model behind launch forecasting — innovation
    * coefficient p, imitation q, market size m from (a, b, c) when
    * the curve is Bass-shaped (c < 0, positive discriminant). Honest
    * corpus read: this corpus's adoption is front-loaded (c > 0), so
    * the derived (m, p, q) are NULL and `bass_shaped` = 0 — the
    * machinery (3-regressor normal equations via Cramer determinants)
    * is what's verified, exactly the #440 isotonic convention.
    *
    * Exact: daily adopter counts and the cumulative C (a day-ordered
    * prefix sum over the ≤ #calendar-days adopter frame) are
    * integers; the six normal-equation sums run DECIMAL(38,0) (C⁴
    * ≲ 10³² per day holds through sf10); the Cramer solve and the
    * (m, p, q) map are one fixed scalar double chain (#447).
    */
  def bassDiffusion(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .orders(spark, dir)
      .groupBy("o_custkey")
      .agg(expr("min(CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT))")
        .as("d0"))
      .groupBy("d0")
      .agg(count(lit(1)).as("n"))
    val withC = daily
      .withColumn(
        "cprev",
        coalesce(
          sum("n").over(
            Window.orderBy("d0").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
    withC
      .agg(
        count(lit(1)).as("t"),
        sum("cprev").as("sc"),
        sum(expr("CAST(cprev AS DECIMAL(38,0)) * cprev")).as("sc2"),
        sum(expr("CAST(cprev AS DECIMAL(38,0)) * cprev * cprev")).as("sc3"),
        sum(expr("CAST(cprev AS DECIMAL(38,0)) * cprev * cprev * cprev")).as("sc4"),
        sum("n").as("sy"),
        sum(expr("CAST(cprev AS DECIMAL(38,0)) * n")).as("syc"),
        sum(expr("CAST(cprev AS DECIMAL(38,0)) * cprev * n")).as("syc2"))
      .filter(expr("t >= 12"))
      .selectExpr(
        "t",
        "CAST(t AS DOUBLE) AS m00", "CAST(sc AS DOUBLE) AS m01", "CAST(sc2 AS DOUBLE) AS m02",
        "CAST(sc3 AS DOUBLE) AS m12", "CAST(sc4 AS DOUBLE) AS m22",
        "CAST(sy AS DOUBLE) AS b0", "CAST(syc AS DOUBLE) AS b1", "CAST(syc2 AS DOUBLE) AS b2")
      .selectExpr(
        "t", "b0", "b1", "b2", "m00", "m01", "m02", "m12", "m22",
        """m00 * (m02 * m22 - m12 * m12) - m01 * (m01 * m22 - m12 * m02)
           + m02 * (m01 * m12 - m02 * m02) AS det""")
      .filter(expr("det <> 0.0"))
      .selectExpr(
        "t",
        """(b0 * (m02 * m22 - m12 * m12) - m01 * (b1 * m22 - m12 * b2)
            + m02 * (b1 * m12 - m02 * b2)) / det AS a""",
        """(m00 * (b1 * m22 - b2 * m12) - b0 * (m01 * m22 - m12 * m02)
            + m02 * (m01 * b2 - m02 * b1)) / det AS b""",
        """(m00 * (m02 * b2 - m12 * b1) - m01 * (m01 * b2 - m02 * b1)
            + b0 * (m01 * m12 - m02 * m02)) / det AS c""")
      .selectExpr(
        "t AS n_days",
        "CAST(floor(a * 1000000 + 0.5) AS BIGINT) AS a_e6",
        "CAST(floor(b * 1000000000 + 0.5) AS BIGINT) AS b_e9",
        "CAST(floor(c * 1000000000000 + 0.5) AS BIGINT) AS c_e12",
        "a", "b", "c",
        "b * b - 4.0 * a * c AS disc")
      .selectExpr(
        "n_days", "a_e6", "b_e9", "c_e12",
        "CAST(CASE WHEN c < 0.0 AND disc > 0.0 THEN 1 ELSE 0 END AS BIGINT) AS bass_shaped",
        """CASE WHEN c < 0.0 AND disc > 0.0 THEN
             CAST(floor((0.0 - b - sqrt(disc)) / (2.0 * c) * 100 + 0.5) AS BIGINT)
           ELSE NULL END AS m_e2""",
        """CASE WHEN c < 0.0 AND disc > 0.0 THEN
             CAST(floor(a / ((0.0 - b - sqrt(disc)) / (2.0 * c)) * 1000000000 + 0.5) AS BIGINT)
           ELSE NULL END AS p_e9""",
        """CASE WHEN c < 0.0 AND disc > 0.0 THEN
             CAST(floor((0.0 - c) * ((0.0 - b - sqrt(disc)) / (2.0 * c)) * 1000000000 + 0.5)
               AS BIGINT)
           ELSE NULL END AS q_e9""")
  }

  /** #459 Empirical-Bayes rate shrinkage (pseudo-count smoothing
    * toward the corpus rate, the Beta-prior posterior mean with fixed
    * prior strength K): per-customer order-completion rate
    * (x_i + K·ḡ)/(n_i + K) — the estimator every per-entity rate
    * table needs before ranking entities with tiny n (a 1/1 customer
    * must not outrank a 95/100 one), and the model-based fix for what
    * #278's leave-one-out encoding applies to features. Reported as
    * the top-N movers |shrunk − raw| — exactly the entities whose raw
    * rate was most misleading.
    *
    * Exact: shrunk = (x_i·N + K·R)·10⁶ div (N·(n_i+K)) with
    * (N, R) the global totals — one integer expression per customer
    * (x·N ≲ 10⁹ at sf1 — BIGINT-safe through sf100). One groupBy +
    * one broadcast global scalar + TakeOrdered(N) — no windows, no
    * second shuffle.
    */
  def ebShrinkage(spark: SparkSession, dir: String, k: Int = 20, topN: Int = 50): DataFrame = {
    val per = Tables
      .orders(spark, dir)
      .groupBy("o_custkey")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(expr("CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END")).as("n_complete"))
    val g = per.agg(sum("n_orders").as("tot_n"), sum("n_complete").as("tot_c"))
    per
      .crossJoin(broadcast(g))
      .select(
        col("o_custkey"),
        col("n_orders"),
        col("n_complete"),
        expr("n_complete * 1000000 div n_orders").as("raw_e6"),
        expr(s"(n_complete * tot_n + $k * tot_c) * 1000000 div (tot_n * (n_orders + $k))")
          .as("shrunk_e6"))
      .withColumn("delta_e6", col("shrunk_e6") - col("raw_e6"))
      .orderBy(abs(col("delta_e6")).desc, col("o_custkey"))
      .limit(topN)
  }

  /** #460 Restricted mean survival time (RMST, Royston & Parmar 2013's
    * recommended KM summary): ∫₀^τ S(t)dt over #234's Kaplan–Meier
    * curve at τ = 6/12/24 months — "expected customer lifetime within
    * the first τ months", the clinically-standard scalar when median
    * survival is undefined (here S stays above ½) and the number a
    * retention team can price. mean_frac_e6 = RMST/τ is average
    * survival over the horizon.
    *
    * Exact: the KM fold already lives on the e6 integer grid, so the
    * step-function integral Σ S(t_i)·(segment widths clipped to τ)
    * is ALL-integer — no doubles anywhere. One lead window over the
    * ≤ #calendar-months step table (the #234 boundedness argument)
    * and a 3-row τ explode.
    */
  def rmst(spark: SparkSession, dir: String): DataFrame = {
    val km = kaplanMeier(spark, dir).select(col("t"), col("surv_e6"))
    val steps = km.withColumn("t_next", lead("t", 1).over(Window.orderBy("t")))
    val taus = steps.sparkSession
      .range(1)
      .select(explode(array(lit(6L), lit(12L), lit(24L))).as("tau"))
    val body = steps
      .crossJoin(broadcast(taus))
      .select(
        col("tau"),
        expr("surv_e6 * (least(coalesce(t_next, tau), tau) - least(t, tau))").as("seg"))
      .groupBy("tau")
      .agg(sum("seg").as("body"))
    val head = km
      .agg(min("t").as("t_first"))
      .crossJoin(broadcast(taus))
      .select(col("tau"), expr("1000000 * least(t_first, tau)").as("head"))
    head
      .join(body, "tau")
      .select(
        col("tau").as("tau_months"),
        (col("head") + col("body")).as("rmst_e6_months"),
        expr("(head + body) div tau").as("mean_frac_e6"))
  }

  /** #462 Price elasticity of demand (log-log OLS per part brand:
    * ln Q_m = α + ε·ln P_m over ship months, ε the elasticity): the
    * pricing-team read of the catalog — which brands' volumes move
    * with price and which are inelastic. Monthly Q = Σ quantity
    * (exact cents grid), P = the month's average unit price
    * (Σ extended / Σ qty, a ratio of exact integers).
    *
    * Float-identity at OLS scale: ln of an exact integer (or of a
    * ratio of two exact integers) is ONE deterministic double per
    * month, immediately rounded onto the e9 integer grid — so the
    * OLS power sums are exact integer arithmetic (DECIMAL(38,0) ↔
    * HUGEINT) and the slope is one fixed double expression (#447
    * discipline). Brand dim broadcast into the fact scan; months
    * frame is bounded (brands × months).
    */
  def priceElasticity(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables
      .lineitem(spark, dir)
      .join(
        broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(
        col("p_brand"),
        expr("year(l_shipdate) * 12 + month(l_shipdate) - 1").cast("long").as("m"),
        expr("CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)").as("qc"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("ec"))
      .groupBy("p_brand", "m")
      .agg(sum("qc").as("sq"), sum("ec").as("se"))
      .filter(col("sq") > 0 && col("se") > 0)
      .select(
        col("p_brand"),
        expr("CAST(floor(ln(CAST(sq AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT)").as("lq"),
        expr("CAST(floor(ln(CAST(se AS DOUBLE) / CAST(sq AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT)")
          .as("lp"))
    monthly
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_months"),
        sum("lp").as("sp"),
        sum("lq").as("sq2"),
        sum(expr("CAST(lp AS DECIMAL(38,0)) * lq")).as("spq"),
        sum(expr("CAST(lp AS DECIMAL(38,0)) * lp")).as("spp"))
      .filter(expr(
        "n_months >= 12 AND CAST(n_months AS DECIMAL(38,0)) * spp - CAST(sp AS DECIMAL(38,0)) * sp > 0"))
      .selectExpr(
        "p_brand",
        "n_months",
        """CAST(floor((CAST(n_months AS DOUBLE) * CAST(spq AS DOUBLE)
              - CAST(sp AS DOUBLE) * CAST(sq2 AS DOUBLE))
             / (CAST(n_months AS DOUBLE) * CAST(spp AS DOUBLE)
                - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
             * 1000000 + 0.5) AS BIGINT) AS elasticity_e6""")
  }

  /** #455 Jarque–Bera normality test per daily-cents series (Jarque &
    * Bera 1980): JB = n/6·(g₁² + (g₂−3)²/4) from the sample skewness
    * g₁ = m₃/m₂^1.5 and kurtosis g₂ = m₄/m₂² — the standard
    * residual-diagnostic read BEFORE trusting any of the z/t-based
    * tests (#252/#286/#433) on a series, and the moment-based
    * complement to #289's runs test (randomness) and #242's
    * Mann–Kendall (trend).
    *
    * Exactness: the four raw power sums Σc..Σc⁴ are exact integers
    * (DECIMAL(38,0) ↔ HUGEINT; c⁴ ≲ 10³² per day keeps Σ under 38
    * digits through sf10), and the closed-form central-moment /
    * JB chain is ONE fixed scalar expression over those integers —
    * deterministic IEEE doubles, identical in both engines (the #447
    * G-test discipline), rounded once onto the e6 grid. Degenerate
    * series (n < 8 or zero variance) are filtered identically on both
    * sides. One aggregate over the bounded daily frame.
    */
  def jarqueBera(spark: SparkSession, dir: String): DataFrame =
    dailyCents(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_days"),
        sum("c").as("s1"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("s2"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c * c")).as("s3"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c * c * c")).as("s4"))
      .filter(expr(
        "n_days >= 8 AND CAST(n_days AS DECIMAL(38,0)) * s2 - CAST(s1 AS DECIMAL(38,0)) * s1 > 0"))
      .selectExpr(
        "event_type",
        "n_days",
        "CAST(s1 AS DOUBLE) / n_days AS m1",
        "CAST(s2 AS DOUBLE) / n_days AS r2",
        "CAST(s3 AS DOUBLE) / n_days AS r3",
        "CAST(s4 AS DOUBLE) / n_days AS r4")
      .selectExpr(
        "event_type",
        "n_days",
        "r2 - m1 * m1 AS m2",
        "r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1 AS m3",
        "r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2 - 3.0 * m1 * m1 * m1 * m1 AS m4")
      .selectExpr(
        "event_type",
        "n_days",
        "m3 / sqrt(m2 * m2 * m2) AS skew",
        "m4 / (m2 * m2) AS kurt")
      .selectExpr(
        "event_type",
        "n_days",
        "CAST(floor(skew * 1000000 + 0.5) AS BIGINT) AS skew_e6",
        "CAST(floor(kurt * 1000000 + 0.5) AS BIGINT) AS kurt_e6",
        """CAST(floor((CAST(n_days AS DOUBLE) / 6.0)
             * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0) * 1000000 + 0.5)
           AS BIGINT) AS jb_e6""")
      .selectExpr(
        "event_type", "n_days", "skew_e6", "kurt_e6", "jb_e6",
        // chi2(2) 5% critical value 5.991465 on the e6 grid
        "CAST(CASE WHEN jb_e6 > 5991465 THEN 1 ELSE 0 END AS BIGINT) AS reject_normal_5pct")

  /** #456 Durbin–Watson serial-correlation test on detrended daily
    * cents (Durbin & Watson 1950): DW = Σ(ê_t−ê_{t−1})²/Σê_t² over
    * the residuals of the per-series OLS day trend — the canonical
    * "are the residuals AR(1)?" gate that decides whether #159's OLS
    * standard errors (and #264's backtest read) can be trusted, and
    * the residual-side complement to #202's raw autocorrelation.
    *
    * Shape: residuals are never materialized — the numerator needs
    * only the successive-difference sums Σu², Σuv, Σv² (u = Δc,
    * v = Δday over observation-successive rows) because
    * ê_t−ê_{t−1} = u − b·v, and the denominator expands in the full-
    * series power sums; so the whole statistic is TWO aggregates over
    * the bounded daily frame plus one fixed scalar double expression
    * over exact integers (the #447 discipline). DW≈2(1−ρ̂₁); flag
    * positive serial correlation at the conventional DW < 1.5.
    */
  def durbinWatson(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyCents(spark, dir).localCheckpoint(eager = false)
    val full = daily
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("day").as("sd"),
        sum("c").as("sy"),
        sum(expr("CAST(day AS DECIMAL(38,0)) * day")).as("sdd"),
        sum(expr("CAST(day AS DECIMAL(38,0)) * c")).as("sdy"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("syy"))
      .filter(expr(
        "n >= 8 AND CAST(n AS DECIMAL(38,0)) * sdd - CAST(sd AS DECIMAL(38,0)) * sd > 0"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val diffs = daily
      .withColumn("cp", lag("c", 1).over(w))
      .withColumn("dp", lag("day", 1).over(w))
      .filter(col("cp").isNotNull)
      .select(
        col("event_type"),
        (col("c") - col("cp")).as("u"),
        (col("day") - col("dp")).as("v"))
      .groupBy("event_type")
      .agg(
        sum(expr("CAST(u AS DECIMAL(38,0)) * u")).as("suu"),
        sum(expr("CAST(u AS DECIMAL(38,0)) * v")).as("suv"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("svv"))
    full
      .join(diffs, "event_type")
      .selectExpr(
        "event_type",
        "n AS n_days",
        """(CAST(n AS DOUBLE) * CAST(sdy AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
           AS b""",
        "CAST(sd AS DOUBLE) AS sdf", "CAST(sy AS DOUBLE) AS syf",
        "CAST(sdd AS DOUBLE) AS sddf", "CAST(sdy AS DOUBLE) AS sdyf",
        "CAST(syy AS DOUBLE) AS syyf",
        "CAST(suu AS DOUBLE) AS suuf", "CAST(suv AS DOUBLE) AS suvf",
        "CAST(svv AS DOUBLE) AS svvf")
      .selectExpr(
        "event_type",
        "n_days",
        "(syf - b * sdf) / n_days AS a",
        "b", "sdf", "syf", "sddf", "sdyf", "syyf", "suuf", "suvf", "svvf")
      .selectExpr(
        "event_type",
        "n_days",
        "suuf - 2.0 * b * suvf + b * b * svvf AS num",
        """syyf - 2.0 * a * syf - 2.0 * b * sdyf
           + n_days * a * a + 2.0 * a * b * sdf + b * b * sddf AS den""")
      .filter(expr("den > 0"))
      .selectExpr(
        "event_type",
        "n_days",
        "CAST(floor(num / den * 1000000 + 0.5) AS BIGINT) AS dw_e6")
      .selectExpr(
        "event_type", "n_days", "dw_e6",
        "1000000 - dw_e6 div 2 AS rho_resid_e6",
        "CAST(CASE WHEN dw_e6 < 1500000 THEN 1 ELSE 0 END AS BIGINT) AS positive_autocorr")
  }

  /** #457 (Augmented) Dickey–Fuller unit-root test per daily-cents
    * series (Dickey & Fuller 1979, lag-0 form with constant):
    * Δc_t = α + ρ·c_{t−1} + ε, H₀: ρ = 0 (random walk). The
    * mean-reversion gate that decides whether #250's Holt / #433's
    * AR(2) levels are even estimable — a unit-root series makes every
    * trailing-window statistic (#17, #65) spurious. t(ρ̂) against the
    * −2.86 5% critical value (constant, no trend, n→∞ table).
    *
    * All moments are exact integers over observation-successive
    * (prev, Δ) pairs — one lag window on the bounded daily frame, one
    * aggregate — and ρ̂, SSE, and t(ρ̂) come from the centered-sum
    * closed forms evaluated as ONE fixed scalar double expression
    * (no residual row ever exists; the #447 discipline).
    */
  def adfTest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    dailyCents(spark, dir)
      .withColumn("cp", lag("c", 1).over(w))
      .filter(col("cp").isNotNull)
      .select(col("event_type"), col("cp").as("x"), (col("c") - col("cp")).as("d"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("m"),
        sum("x").as("sx"),
        sum("d").as("sd"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * d")).as("sxd"),
        sum(expr("CAST(d AS DECIMAL(38,0)) * d")).as("sdd"))
      .filter(expr(
        "m >= 10 AND CAST(m AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx > 0"))
      .selectExpr(
        "event_type",
        "m AS n_pairs",
        """CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS cxx""",
        """CAST(m AS DOUBLE) * CAST(sxd AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sd AS DOUBLE) AS cxd""",
        """CAST(m AS DOUBLE) * CAST(sdd AS DOUBLE)
           - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) AS cdd""")
      .filter(expr("cdd * cxx - cxd * cxd > 0"))
      .selectExpr(
        "event_type",
        "n_pairs",
        "CAST(floor(cxd / cxx * 1000000 + 0.5) AS BIGINT) AS rho_e6",
        """CAST(floor((cxd / cxx)
             * sqrt((CAST(n_pairs AS DOUBLE) - 2.0) * cxx / (cdd - cxd * cxd / cxx))
             * 1000000 + 0.5) AS BIGINT) AS t_stat_e6""")
      .selectExpr(
        "event_type", "n_pairs", "rho_e6", "t_stat_e6",
        // Dickey-Fuller 5% critical value (constant, no trend): -2.86
        "CAST(CASE WHEN t_stat_e6 < -2860000 THEN 1 ELSE 0 END AS BIGINT) AS unit_root_rejected")
  }

  /** #458 Partial autocorrelation function, lags 1–3, per daily-cents
    * series (Durbin–Levinson recursion on the sample ACF): the
    * AR-order identification tool — #202 gives r₁, #433 FITS an
    * AR(2); the PACF is what says whether AR(1), AR(2) or AR(3) is
    * the right order in the first place (φ_kk ≈ 0 beyond the true
    * order). Box–Jenkins identification, distributed.
    *
    * One window pass materializes lead-1/2/3 columns on the bounded
    * daily frame; one aggregate collects the exact integer lagged
    * cross-products and per-lag marginal sums; the ACF values
    * r_k = ĉ_k/ĉ_0 (full-series-mean convention, n-normalized) and
    * the Durbin–Levinson chain are one fixed scalar double expression
    * over those integers (#447 discipline). Calendar gaps: pairing is
    * observation-successive (the #433 convention).
    */
  def pacf(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    dailyCents(spark, dir)
      .withColumn("c1", lead("c", 1).over(w))
      .withColumn("c2", lead("c", 2).over(w))
      .withColumn("c3", lead("c", 3).over(w))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("c").as("sy"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("syy"),
        sum(expr("CASE WHEN c1 IS NOT NULL THEN c ELSE 0 END")).as("h1"),
        sum(expr("CASE WHEN c1 IS NOT NULL THEN c1 ELSE 0 END")).as("t1"),
        sum(expr("CASE WHEN c1 IS NOT NULL THEN CAST(c AS DECIMAL(38,0)) * c1 ELSE 0 END"))
          .as("p1"),
        count("c1").as("m1"),
        sum(expr("CASE WHEN c2 IS NOT NULL THEN c ELSE 0 END")).as("h2"),
        sum(expr("CASE WHEN c2 IS NOT NULL THEN c2 ELSE 0 END")).as("t2"),
        sum(expr("CASE WHEN c2 IS NOT NULL THEN CAST(c AS DECIMAL(38,0)) * c2 ELSE 0 END"))
          .as("p2"),
        count("c2").as("m2"),
        sum(expr("CASE WHEN c3 IS NOT NULL THEN c ELSE 0 END")).as("h3"),
        sum(expr("CASE WHEN c3 IS NOT NULL THEN c3 ELSE 0 END")).as("t3"),
        sum(expr("CASE WHEN c3 IS NOT NULL THEN CAST(c AS DECIMAL(38,0)) * c3 ELSE 0 END"))
          .as("p3"),
        count("c3").as("m3"))
      .filter(expr(
        "n >= 12 AND CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy > 0"))
      .selectExpr(
        "event_type",
        "n AS n_days",
        """CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(n AS DOUBLE) * CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS c0""",
        """(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(p1 AS DOUBLE)
           - CAST(n AS DOUBLE) * CAST(sy AS DOUBLE) * (CAST(h1 AS DOUBLE) + CAST(t1 AS DOUBLE))
           + CAST(m1 AS DOUBLE) * CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS c1n""",
        """(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(p2 AS DOUBLE)
           - CAST(n AS DOUBLE) * CAST(sy AS DOUBLE) * (CAST(h2 AS DOUBLE) + CAST(t2 AS DOUBLE))
           + CAST(m2 AS DOUBLE) * CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS c2n""",
        """(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(p3 AS DOUBLE)
           - CAST(n AS DOUBLE) * CAST(sy AS DOUBLE) * (CAST(h3 AS DOUBLE) + CAST(t3 AS DOUBLE))
           + CAST(m3 AS DOUBLE) * CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS c3n""")
      .selectExpr(
        "event_type", "n_days",
        "c1n / c0 AS r1", "c2n / c0 AS r2", "c3n / c0 AS r3")
      .filter(expr("1.0 - r1 * r1 <> 0.0"))
      .selectExpr(
        "event_type", "n_days", "r1", "r2", "r3",
        "(r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22")
      .selectExpr(
        "event_type", "n_days", "r1", "r2", "r3", "phi22",
        "r1 * (1.0 - phi22) AS phi21")
      .filter(expr("1.0 - phi21 * r1 - phi22 * r2 <> 0.0"))
      .selectExpr(
        "event_type",
        "n_days",
        "CAST(floor(r1 * 1000000 + 0.5) AS BIGINT) AS r1_e6",
        "CAST(floor(r2 * 1000000 + 0.5) AS BIGINT) AS r2_e6",
        "CAST(floor(r3 * 1000000 + 0.5) AS BIGINT) AS r3_e6",
        "CAST(floor(r1 * 1000000 + 0.5) AS BIGINT) AS pacf1_e6",
        "CAST(floor(phi22 * 1000000 + 0.5) AS BIGINT) AS pacf2_e6",
        """CAST(floor((r3 - phi21 * r2 - phi22 * r1)
             / (1.0 - phi21 * r1 - phi22 * r2) * 1000000 + 0.5) AS BIGINT) AS pacf3_e6""")
  }
}
