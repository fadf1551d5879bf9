package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sampling for training-data pipelines: deterministic hash-based
  * splits (reproducible across engines and runs — a content-addressed
  * split survives re-partitioning, re-ingestion, and backfills, unlike
  * random() tagging), stratified downsampling, and exact-k hash
  * samples. All per-row decisions — zero shuffles except the exact-k
  * top-n (WindowGroupLimit-style TakeOrdered).
  */
object Sampling {

  /** #54 Train/val/test split by content hash: bucket = first 4 hex
    * chars of md5 → 0..99; <80 train, <90 val, else test. Stable under
    * any re-ordering or re-partitioning of the corpus.
    */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        (conv(substring(md5(col("text").cast("binary")), 1, 4), 16, 10).cast("long") % 100)
          .as("bucket"))
      .select(
        col("doc_id"),
        col("bucket"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test")
          .as("split"))

  /** #55 Stratified sample: per-language fractions via DETERMINISTIC
    * hash-threshold Bernoulli — keep a row iff its salted content hash
    * mod 10000 falls under the stratum's threshold (en: 2500 = 25%,
    * tail languages kept whole). Replaces seeded `sampleBy`: an
    * engine-RNG sample changes under repartitioning and can't be
    * oracle-checked; a content-addressed sample is reproducible across
    * engines, runs, AND backfills (same properties as [[splitAssign]])
    * and is exactly replayed by the DuckDB oracle.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    // per-stratum keep-thresholds out of 10000
    val thresholds = Seq("en" -> 2500, "de" -> 10000, "fr" -> 10000, "es" -> 10000, "zh" -> 10000)
    val bucket =
      conv(substring(md5(concat(lit("graft-strat-1"), col("text")).cast("binary")), 1, 15), 16, 10)
        .cast("long") % 10000
    val threshold = thresholds
      .foldLeft(lit(0)) { case (acc, (lang, t)) => when(col("lang") === lang, lit(t)).otherwise(acc) }
    Tables
      .documents(spark, dir)
      .filter(bucket < threshold)
      .select(col("doc_id"), col("lang"))
  }

  /** Shared packing core: one windowed cumulative sum PER SHARD KEY.
    * Each shard packs independently, so no global total order is ever
    * required — the 100 TB-safe formulation of an inherently
    * sequential assignment. Shard columns become the window partition,
    * so shuffle volume is one exchange on the shard key.
    */
  private def packCore(
      spark: SparkSession,
      dir: String,
      ctxLen: Int,
      shardCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(shardCols.map(col): _*).orderBy("doc_id")
    val seqOf = (off: Column) => floor(off.cast("double") / ctxLen).cast("long")
    Tables
      .documents(spark, dir)
      .select(
        (col("doc_id") +: shardCols.map(col)) :+
          size(Dedup.toks(col("text"))).cast("long").as("n_tokens"): _*)
      .withColumn("start_off", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("seq_first", seqOf(col("start_off")))
      .withColumn("seq_last", seqOf(col("start_off") + col("n_tokens") - 1))
      .withColumn("crosses_boundary", (col("seq_first") =!= col("seq_last")).cast("int"))
  }

  /** #70 Sequence packing: concatenate-and-chunk assignment of docs
    * into fixed `ctxLen`-token training windows — the standard LLM
    * pretraining packing (concat the shard, slice every ctxLen
    * tokens). Shard key = `lang` (a file/partition id in production).
    * Emits each doc's token offset and first/last window ids plus a
    * boundary-crossing flag (the docs a loader must split).
    */
  def packSequences(spark: SparkSession, dir: String, ctxLen: Int = 4096): DataFrame =
    packCore(spark, dir, ctxLen, Seq("lang"))

  /** #75 Composite-shard packing: the same concat-and-chunk assignment
    * sharded by a COMPOSITE key (`lang`, `source`) — the shape of a
    * real pretraining layout where shards are (corpus, language,
    * shard-file) tuples. Finer shards mean more parallelism and
    * smaller per-shard state at 100 TB; the assignment inside each
    * shard is unchanged, so downstream loaders are agnostic to the
    * shard arity.
    */
  def packComposite(spark: SparkSession, dir: String, ctxLen: Int = 4096): DataFrame =
    packCore(spark, dir, ctxLen, Seq("lang", "source"))

  /** #76 Per-source document cap: keep at most `cap` docs per source,
    * chosen by salted content-hash rank — the crawl-pipeline policy
    * that stops any single domain/dump from dominating the training
    * mix. Deterministic (content-addressed, like [[splitAssign]]) and
    * engine-agnostic. The rank filter compiles to WindowGroupLimit:
    * each map task keeps only its local top-`cap` per source BEFORE
    * the exchange, so shuffle volume is `sources × cap`, not the
    * corpus — the property that makes a per-domain cap tractable at
    * 100 TB.
    */
  def sourceCap(spark: SparkSession, dir: String, cap: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        md5(concat(lit("graft-cap-1"), col("text")).cast("binary")).as("h"))
      .withColumn("rank_in_source", row_number().over(w).cast("long"))
      .filter(col("rank_in_source") <= cap)
      .select(col("doc_id"), col("source"), col("rank_in_source"))
  }

  /** #77 Source mixture weights: per-source token counts scaled by a
    * sampling temperature — weight ∝ n_tokens^alpha, normalized
    * (alpha < 1 upweights small sources, the standard multi-corpus /
    * multilingual rebalancing rule). One aggregation over the corpus;
    * the per-source table is tiny by construction (thousands of
    * sources at most), so the normalizing total is a broadcast 1-row
    * cross join, never a driver collect.
    */
  /** #175 Source-diversity diagnostics: the one-row mixture health
    * check a data-mixing pipeline alarms on — document and source
    * counts, Gini-Simpson concentration, and Shannon entropy of the
    * source distribution. Complements #77 (weights say how much to
    * TAKE per source) and #119 (drift says when a source's CONTENT
    * moved): diversity says when the MIXTURE itself collapsed (one
    * crawl swamping the corpus drops entropy before anything else
    * notices).
    *
    * Exact cross-engine: Simpson λ = Σ n_s(n_s−1) / (N(N−1)) lives on
    * the e6 integer grid by integer division; Shannon bits use the
    * #119 discipline — per-source contributions p·log2(1/p) quantized
    * to e6 integers BEFORE the sum, so the total is order-independent
    * and identical in any engine. One groupBy(source) partial-agg
    * pass; everything downstream is source-cardinality-sized.
    */
  def sourceDiversity(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables
      .documents(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_s"))
    val tot = per.agg(sum("n_s").as("n"), count(lit(1)).as("s"))
    val p = col("n_s").cast("double") / col("n")
    per
      .crossJoin(broadcast(tot))
      .withColumn("simpson_term", expr("n_s * (n_s - 1)"))
      .withColumn(
        "h_e6",
        floor(p * log2(col("n").cast("double") / col("n_s")) * lit(1e6) + lit(0.5))
          .cast("long"))
      .groupBy(col("n").as("n_docs"), col("s").as("n_sources"))
      .agg(
        expr("CAST((sum(simpson_term) * 1000000) div (max(n) * (max(n) - 1)) AS BIGINT)")
          .as("simpson_e6"),
        (sum("h_e6") / lit(1e6)).as("shannon_bits"))
  }

  def mixtureWeights(spark: SparkSession, dir: String, alpha: Double = 0.7): DataFrame = {
    val per = Tables
      .documents(spark, dir)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(Dedup.toks(col("text"))).cast("long")).as("n_tokens"))
      .withColumn("scaled", pow(col("n_tokens").cast("double"), alpha))
    val total = per.agg(sum("scaled").as("total"))
    per
      .crossJoin(broadcast(total))
      .select(
        col("source"),
        col("n_docs"),
        col("n_tokens"),
        round(col("scaled") / col("total"), 6).as("weight"))
  }

  /** #150 Token-budget allocation (largest-remainder apportionment):
    * turn per-source token masses into integer per-source quotas that
    * sum EXACTLY to a global training budget — the step between
    * mixture weights (#77) and the samplers: a data-mixing job needs
    * "how many tokens do I take from each source", and naive
    * floor(w·B) under-fills while rounding over-fills. Hamilton's
    * method, all-integer: base_i = (n_i·B) div N, then the R = B − Σ
    * base leftover seats go to the R largest remainders
    * ((n_i·B) mod N, source tiebreak) — exact in any engine, total
    * telescopes to B by construction. The rank-over-sources window is
    * bounded by source cardinality (20 here), never corpus size.
    */
  def tokenBudget(spark: SparkSession, dir: String, budget: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = Tables
      .documents(spark, dir)
      .groupBy("source")
      .agg(sum(size(Dedup.toks(col("text"))).cast("long")).as("n_tokens"))
    val total = per.agg(sum("n_tokens").as("n_total"))
    val based = per
      .crossJoin(broadcast(total))
      .withColumn("base", expr(s"(n_tokens * $budget) div n_total"))
      .withColumn("rem", expr(s"(n_tokens * $budget) % n_total"))
    val spare = based.agg((lit(budget) - sum("base")).as("r"))
    // bounded window: one row per source
    val wRem = Window.orderBy(col("rem").desc, col("source"))
    based
      .crossJoin(broadcast(spare))
      .withColumn("rrank", row_number().over(wRem).cast("long"))
      .select(
        col("source"),
        col("n_tokens"),
        col("base"),
        col("rem"),
        (col("base") + (col("rrank") <= col("r")).cast("long")).as("quota"))
  }

  /** #165 Length-bucketed batching: group sequences of similar token
    * length into fixed-size training batches so per-batch padding
    * (batch · max_len − Σ len) stays small — the dynamic-batching
    * schedule every seq2seq/packing-free trainer runs. Buckets are
    * 16-token bands (all-integer: bucket = (len+15) div 16); within a
    * bucket docs take a deterministic salted-hash order and
    * batch_idx = (rank−1) div B. The per-bucket rank is HIERARCHICAL
    * ([[ppsSample]]'s construction — (bucket, shard) local ranks +
    * broadcast shard offsets, shard-major order) because bucket
    * cardinality is tiny (~10) and a bucket-sized sort partition
    * would be the #1-style scale killer. Output is the batch manifest
    * with its padding accounting — the waste column IS the metric the
    * technique exists to minimize.
    */
  def lengthBatching(spark: SparkSession, dir: String, batch: Int = 8, nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        size(Dedup.toks(col("text"))).cast("long").as("len"),
        Dedup.hash60(concat(lit("graft-batch-1:"), col("doc_id"))).as("ord"))
      .withColumn("bucket_id", expr("(len + 15) div 16"))
      .withColumn("shard", pmod(col("ord"), lit(nShards.toLong)))
    val wLocal = Window.partitionBy("bucket_id", "shard").orderBy(col("ord"), col("doc_id"))
    val local = docs.withColumn("rn_local", row_number().over(wLocal).cast("long"))
    val counts = docs.groupBy("bucket_id", "shard").agg(count(lit(1)).as("c"))
    // bounded window: nShards rows per bucket
    val wOff = Window
      .partitionBy("bucket_id")
      .orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("off", coalesce(sum("c").over(wOff), lit(0L)))
      .select(col("bucket_id"), col("shard"), col("off"))
    local
      .join(broadcast(offsets), Seq("bucket_id", "shard"))
      .withColumn("batch_idx", expr(s"(off + rn_local - 1) div $batch"))
      .groupBy("bucket_id", "batch_idx")
      .agg(
        count(lit(1)).as("n_docs"),
        max("len").as("max_len"),
        sum("len").as("sum_len"))
      .withColumn("waste", col("n_docs") * col("max_len") - col("sum_len"))
  }

  /** #158 Quota filling: materialize the #150 token quotas into an
    * actual document selection — the final step of the mixture chain
    * (#77 weights → #150 integer quotas → the docs themselves). Per
    * source, documents are laid out in a deterministic salted-hash
    * order and taken until the running token total first reaches the
    * source's quota (the crossing doc included, so every quota is met,
    * never starved). The global budget is data-derived (total
    * tokens div `frac`), so the query scales with SF. The per-source
    * running total is built HIERARCHICALLY exactly like [[ppsSample]]:
    * cumsum within (source, shard) + per-shard offsets from the
    * sources×nShards totals table (broadcast) — the selection order is
    * shard-major pseudo-random, no source-sized sort partition
    * anywhere.
    */
  def quotaFill(spark: SparkSession, dir: String, frac: Int = 4, nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val tok = Tables
      .documents(spark, dir)
      .select(col("source"), col("doc_id"), size(Dedup.toks(col("text"))).cast("long").as("n_tok"))
    // bounded driver state: ONE row (the corpus token total)
    val nTotal = tok.agg(sum("n_tok")).head.getLong(0)
    val quotas = tokenBudget(spark, dir, nTotal / frac).select(col("source"), col("quota"))
    val ordered = tok
      .withColumn("ord", Dedup.hash60(concat(lit("graft-quota-1:"), col("doc_id"))))
      .withColumn("shard", pmod(col("ord"), lit(nShards.toLong)))
    val wLocal = Window
      .partitionBy("source", "shard")
      .orderBy(col("ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ordered.withColumn("cum_local", sum("n_tok").over(wLocal))
    val totals = ordered.groupBy("source", "shard").agg(sum("n_tok").as("shard_w"))
    // bounded window: nShards rows per source
    val wOff =
      Window.partitionBy("source").orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("off", coalesce(sum("shard_w").over(wOff), lit(0L)))
      .select(col("source"), col("shard"), col("off"))
    local
      .join(broadcast(offsets), Seq("source", "shard"))
      .withColumn("cum", col("off") + col("cum_local"))
      .join(broadcast(quotas), "source")
      .filter(col("cum") - col("n_tok") < col("quota"))
      .select(col("source"), col("doc_id"), col("n_tok"), col("cum"), col("quota"))
  }

  /** #153 Priority sampling (Duffield–Lund–Thorup, JACM 2007): per
    * source, a weight-sensitive k-sample that carries its own unbiased
    * subset-sum estimator — the sampler to use when downstream wants
    * "estimate any aggregate over the full corpus from the sample
    * alone". Priority q_i = w_i/u_i with u_i ∈ (0,1] a per-doc hash
    * draw; keep the k highest priorities; τ = the (k+1)-th priority;
    * the included docs' ŵ_i = max(w_i, τ) sum to an unbiased estimate
    * of Σw (exact when a source has ≤ k docs — then τ=0, ŵ=w). The
    * whole algorithm runs on a 2^20 fixed-point grid: u = (hash60 mod
    * 2^20)+1, prio = (w·2^20) div u — all-BIGINT (w ≤ 1e6 keeps every
    * product < 2^43), so both engines replay the sample AND the
    * estimator bit-exactly; ties broken by doc_id.
    *
    * Scale: one window partitioned BY SOURCE (never unpartitioned) with
    * an rn ≤ k+1 filter directly above it — WindowGroupLimit bounds it
    * map-side; τ is a per-source 1-row aggregate of that same k+1-row
    * frame, broadcast back. Shuffle volume = sources × (k+1), not the
    * corpus.
    */
  def prioritySample(spark: SparkSession, dir: String, k: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val scale = 1L << 20
    val wr = Window.partitionBy("source").orderBy(col("prio").desc, col("doc_id"))
    val top = Tables
      .documents(spark, dir)
      .select(
        col("source"),
        col("doc_id"),
        col("n_chars").cast("long").as("w"),
        (Dedup.hash60(concat(lit("graft-priority-1:"), col("doc_id"))) % scale + 1L).as("u"))
      .withColumn("prio", expr(s"(w * $scale) div u"))
      .withColumn("rn", row_number().over(wr))
      .filter(col("rn") <= k + 1)
      .localCheckpoint(eager = false)
    val tau = top
      .groupBy("source")
      .agg(coalesce(max(when(col("rn") === k + 1, col("prio"))), lit(0L)).as("tau"))
    top
      .filter(col("rn") <= k)
      .join(broadcast(tau), "source")
      .select(
        col("source"),
        col("doc_id"),
        col("w"),
        col("prio"),
        col("tau"),
        greatest(col("w") * scale, col("tau")).as("est_scaled"))
  }

  /** #86 Negative sampling for contrastive training: for each anchor
    * doc (every 11th), draw `k` deterministic pseudo-random negatives
    * by hashing (anchor, j) onto the dense row index — the
    * content-addressed analog of a seeded RNG draw, reproducible
    * across engines and backfills like every sampler here. Accidental
    * anchor==negative collisions are dropped (the standard in-batch
    * convention). The dense index is built HIERARCHICALLY, the
    * [[ppsSample]] construction: shard by a monotone range split of
    * `doc_id`, rank locally within each shard (one exchange on
    * `shard`, per-shard local sort), and add per-shard base offsets
    * from the nShards-row counts table — because the sharding is
    * monotone in `doc_id`, `offset + local_rank` IS the global dense
    * rank, bit-identical to a global row_number, with no
    * single-partition window anywhere in the plan.
    */
  def negSample(spark: SparkSession, dir: String, k: Int = 4, nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val bounds = docs.agg(
      min("doc_id").as("lo"),
      max("doc_id").as("hi"),
      count(lit(1)).as("n_docs"))
    // monotone integer range shard: 0 .. nShards-1, nondecreasing in
    // doc_id (skewed occupancy would cost balance, never correctness)
    val sharded = docs
      .crossJoin(broadcast(bounds))
      .withColumn(
        "shard",
        expr(s"((doc_id - lo) * $nShards) div (hi - lo + 1)"))
    val wLocal = Window.partitionBy("shard").orderBy("doc_id")
    val local = sharded
      .select(col("doc_id"), col("shard"))
      .withColumn("rn", row_number().over(wLocal).cast("long"))
    val shardCounts = sharded.groupBy("shard").agg(count(lit(1)).as("c"))
    // nShards rows: the single-partition window is bounded by design
    val wShard = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = shardCounts
      .withColumn("off", coalesce(sum("c").over(wShard), lit(0L)))
      .select(col("shard"), col("off"))
    val indexed = local
      .join(broadcast(offsets), "shard")
      .select(col("doc_id"), (col("off") + col("rn") - 1).as("idx"))
    // bounds already carries n_docs — broadcasting the SAME 1-row frame
    // (not a fresh count agg) lets exchange reuse collapse the second
    // scan+agg into a ReusedExchange of the first
    val draws = docs
      .filter(col("doc_id") % 11 === 0)
      .crossJoin(broadcast(bounds))
      .select(
        col("doc_id").as("anchor_id"),
        explode(sequence(lit(1), lit(k))).as("j"),
        col("n_docs"))
      .withColumn(
        "idx",
        pmod(
          Dedup.hash60(concat(lit("neg-1:"), col("anchor_id"), lit("-"), col("j"))),
          col("n_docs")))
    draws
      .join(indexed, "idx")
      .filter(col("doc_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("j").cast("long").as("j"), col("doc_id").as("neg_id"))
  }

  /** #56 Exact-k uniform sample by hash order: the k docs with the
    * smallest salted content hash — deterministic, engine-agnostic
    * (md5 hex strings sort identically everywhere), and unbiased for
    * any salt. Compiles to TakeOrderedAndProject (per-partition top-k,
    * no full sort).
    */
  def hashSample(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        md5(concat(lit("graft-sample-1"), col("text")).cast("binary")).as("h"))
      .orderBy(col("h"), col("doc_id"))
      .limit(k)

  /** #95 Deterministic training-order shuffle + sharding: every doc
    * gets a pseudo-random sort key from its salted id hash; shard =
    * key mod `nShards`; position = rank of the key INSIDE its shard.
    * This is the "global shuffle without a global sort" layout every
    * pretraining job needs: a loader that reads shards round-robin in
    * position order sees a uniform random permutation of the corpus,
    * yet the plan contains no total-order sort — one exchange on
    * `shard` and a per-shard local sort, each shard independent.
    * Content-addressed like every sampler here: the permutation is
    * reproducible across engines, runs, and backfills, and changing
    * the salt re-shuffles for the next epoch.
    */
  /** #118 PPS systematic sample (probability proportional to size):
    * draw ~`k` documents with inclusion probability proportional to
    * their length — the standard way to sample training data so TOKEN
    * budget, not document count, is uniformly covered. Classic
    * systematic PPS: lay every document's weight end-to-end along a
    * line in a pseudo-random (salted-hash) order, then take one pick
    * every `W/k` units; a document is picked `⌈⌉`-style each time the
    * grid line falls inside its segment (`n_picks` ≥ 2 possible for a
    * doc heavier than the stride — multiplicity is part of the
    * estimator). All arithmetic is INTEGER (`(cum·k) div W` jumps):
    * exact in any engine, and the pick count telescopes to exactly k.
    *
    * The global cumulative sum — normally a total-order sort, the
    * scale killer — is built hierarchically like [[shuffleOrder]]'s
    * permutation: cum-sum WITHIN each hash shard (one exchange on
    * `shard`, per-shard local sort), plus a per-shard base offset
    * computed from the nShards-row totals table (bounded driver-free
    * single-partition window over nShards rows, then broadcast back).
    * One linear shuffle total, independent shards, no global sort.
    */
  def ppsSample(spark: SparkSession, dir: String, k: Int = 100, nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("n_chars").as("w"),
        Dedup.hash60(concat(lit("graft-pps-1:"), col("doc_id"))).as("ord"))
      .withColumn("shard", pmod(col("ord"), lit(nShards.toLong)))
    val wLocal = Window
      .partitionBy("shard")
      .orderBy(col("ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = docs.withColumn("cum_local", sum("w").over(wLocal))
    val shardTotals = docs.groupBy("shard").agg(sum("w").as("shard_w"))
    // nShards rows: the single-partition window is bounded by design
    val wShard = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = shardTotals
      .withColumn("off", coalesce(sum("shard_w").over(wShard), lit(0L)))
      .select(col("shard"), col("off"))
    val total = shardTotals.agg(sum("shard_w").as("w_total"))
    local
      .join(broadcast(offsets), "shard")
      .crossJoin(broadcast(total))
      .withColumn("cum", col("off") + col("cum_local"))
      .withColumn(
        "n_picks",
        expr(s"(cum * $k) div w_total - ((cum - w) * $k) div w_total"))
      .filter(col("n_picks") > 0)
      .select(col("doc_id"), col("shard"), col("w"), col("cum"), col("n_picks"))
  }

  /** #167 Multi-epoch shuffle schedule: [[shuffleOrder]] extended
    * across training epochs — each epoch re-deals the corpus into a
    * FRESH deterministic permutation (seed string carries the epoch,
    * so epoch 0 is bit-identical to #95's output), because reusing
    * one order across epochs correlates batch composition and hurts
    * convergence. Cross-epoch decorrelation is a spec'd property:
    * the fraction of docs landing in the same shard two epochs in a
    * row ≈ 1/nShards (hash independence), not 1. Per-epoch cost is
    * #95's single exchange; epochs explode is bounded fan-out.
    */
  /** #226 Neyman-allocation stratified sampling: split a budget of
    * `b` sample rows across the order-priority strata OPTIMALLY —
    * n_h ∝ N_h·S_h (Neyman 1934: allocation proportional to stratum
    * size × stratum standard deviation minimizes the stratified
    * mean's variance at fixed budget) — then realize each stratum's
    * sample by deterministic hash rank. The survey-sampling answer to
    * "which sources deserve sample budget" that proportional
    * allocation (#55) gets wrong when strata differ in spread.
    *
    * All-integer end to end, including the standard deviation:
    * SS_h = N·Σy² − (Σy)² runs DECIMAL(38,0) ↔ HUGEINT (the #202
    * discipline — Σy² alone is ~4e20 at sf0.1, past 2^63), variance =
    * SS div N², and S_h = EXACT integer sqrt via the one-ulp-clamp
    * trick: s₀ = floor(sqrt(double v)), then ±1 CASE corrections —
    * double sqrt is correctly rounded so s₀ is within one of ⌊√v⌋,
    * and the clamps land it exactly, identically in both engines.
    * Budget apportionment is largest-remainder (Hamilton): base
    * share b·w_h div W each, the leftover seats to the largest
    * remainders (priority-name tiebreak) — Σ n_h = b exactly.
    * Realized sample: per-stratum hash-rank top n_h (md5 order, the
    * #56 exact-k pattern); output carries the allocation AND the
    * realized sampled-cents sum so both halves hash-compare.
    *
    * Scale: two aggregate passes (moments, then apportionment over a
    * 5-row frame) + one per-stratum rank window — never global.
    */
  def neymanAlloc(spark: SparkSession, dir: String, b: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val rows = Tables
      .orders(spark, dir)
      .select(
        col("o_orderpriority").as("stratum"),
        col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .localCheckpoint(eager = false)
    val moments = rows
      .groupBy("stratum")
      .agg(
        count(lit(1)).as("n_pop"),
        sum("cents").as("sy"),
        sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("syy"))
      // exact integer sqrt of the integer variance: double sqrt is
      // within one ulp, the two CASE clamps make it exact
      .withColumn(
        "var_c2",
        expr("""CAST((CAST(n_pop AS DECIMAL(38,0)) * syy
                      - CAST(sy AS DECIMAL(38,0)) * sy)
                     div (CAST(n_pop AS DECIMAL(38,0)) * n_pop) AS BIGINT)"""))
      .withColumn("s0", expr("CAST(floor(sqrt(CAST(var_c2 AS DOUBLE))) AS BIGINT)"))
      .withColumn(
        "s_cents",
        expr("""s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= var_c2 THEN 1 ELSE 0 END)
                   - (CASE WHEN s0 * s0 > var_c2 THEN 1 ELSE 0 END)"""))
      .select(col("stratum"), col("n_pop"), col("var_c2"), col("s_cents"))
    // largest-remainder apportionment of b over weights w_h = N_h·S_h
    // (5-row frame: the scalar attach + rank window are bounded)
    val weighted = moments.withColumn("w", col("n_pop") * col("s_cents"))
    val tot = weighted.agg(sum("w").as("wt"))
    val based = weighted
      .crossJoin(broadcast(tot))
      .withColumn("base", expr(s"(CAST($b AS BIGINT) * w) div wt"))
      .withColumn("rem", expr(s"(CAST($b AS BIGINT) * w) % wt"))
    val wRem = Window.orderBy(col("rem").desc, col("stratum"))
    val alloc = based
      .withColumn("seats_left", lit(b.toLong) - sum("base").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("rrank", row_number().over(wRem))
      .withColumn("alloc_n", col("base") + when(col("rrank") <= col("seats_left"), 1L).otherwise(0L))
      .select(col("stratum"), col("n_pop"), col("s_cents"), col("alloc_n"))
    // realized sample: per-stratum md5 rank, top alloc_n
    val wRank = Window.partitionBy("stratum").orderBy(col("ord"), col("o_orderkey"))
    rows
      .withColumn("ord", Dedup.hash60(concat(lit("graft-ney-1:"), col("o_orderkey"))))
      .withColumn("rn", row_number().over(wRank))
      .join(broadcast(alloc), "stratum")
      .filter(col("rn") <= col("alloc_n"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_sampled"), sum("cents").as("sampled_cents"))
      .join(broadcast(alloc), "stratum")
      .select(
        col("stratum"),
        col("n_pop"),
        col("s_cents"),
        col("alloc_n"),
        col("n_sampled"),
        col("sampled_cents"))
  }

  def multiEpochShuffle(
      spark: SparkSession,
      dir: String,
      epochs: Int = 3,
      nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val w = Window.partitionBy("epoch", "shard").orderBy(col("ord"), col("doc_id"))
    Tables
      .documents(spark, dir)
      .select(col("doc_id"))
      .withColumn("epoch", explode(sequence(lit(0), lit(epochs - 1))))
      .withColumn(
        "ord",
        Dedup.hash60(
          concat(lit("graft-shuffle-epoch"), col("epoch"), lit(":"), col("doc_id"))))
      .withColumn("shard", pmod(col("ord"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .select(col("doc_id"), col("epoch").cast("long").as("epoch"), col("shard"), col("pos"))
  }

  /** #300-family systematic sample: lay the corpus out in a salted-
    * hash pseudo-random order and take every stride-th document —
    * the classical systematic design (one random start, fixed step)
    * that guarantees an EVENLY SPACED draw through the permuted
    * corpus, the property plain Bernoulli sampling lacks (its gaps
    * are geometric). stride = max(1, N div k) for a ~k-doc sample.
    * Content-addressed and reproducible like every sampler here.
    *
    * Scale shape: the global position is never built with a global
    * sort — #95's layout verbatim: per-shard rank (partitioned
    * window) + the ≤nShards-row shard-size offset carry (whitelisted
    * shard-carry frame), so global_idx = offset(shard) + pos is a
    * true permutation index assembled from bounded pieces.
    */
  def systematicSample(spark: SparkSession, dir: String, k: Int = 200, nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val w = Window.partitionBy("shard").orderBy(col("ord"), col("doc_id"))
    val laid = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        Dedup.hash60(concat(lit("graft-systematic-1:"), col("doc_id"))).as("ord"))
      .withColumn("shard", pmod(col("ord"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
    val offsets = laid
      .groupBy("shard")
      .agg(count(lit(1)).as("c"))
      .withColumn(
        "off",
        coalesce(
          sum("c").over(Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("shard"), col("off"), col("c"))
    val tot = offsets.agg(sum("c").as("n"))
    laid
      .join(broadcast(offsets.select("shard", "off")), "shard")
      .crossJoin(broadcast(tot))
      .withColumn("idx", col("off") + col("pos"))
      .withColumn("stride", greatest(lit(1L), expr(s"n div $k")))
      .filter(expr("idx % stride = 0"))
      .select(col("doc_id"), col("idx"), col("stride"))
  }

  def shuffleOrder(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val w = Window.partitionBy("shard").orderBy(col("ord"), col("doc_id"))
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        Dedup.hash60(concat(lit("graft-shuffle-epoch0:"), col("doc_id"))).as("ord"))
      .withColumn("shard", pmod(col("ord"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** #360 Split-balance KS audit: for each pair of #54's content-hash
    * splits, the Kolmogorov–Smirnov distance between their doc-LENGTH
    * distributions — the companion gate to the leakage audit (#355):
    * leakage asks "do splits SHARE content", this asks "do splits
    * LOOK ALIKE" — a val set longer-skewed than train silently shifts
    * every eval metric. The #190 all-integer KS: D evaluated on the
    * cross-multiplied grid |ca·n_b − cb·n_a| over the pair's distinct
    * lengths (both sides' CDFs via pair-partitioned cumulative
    * windows — bounded by |distinct lengths|, never global),
    * D_e6 = max|·|·10⁶ div (n_a·n_b). 3 rows.
    */
  def splitBalance(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = splitAssign(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")), "doc_id")
      .select(col("split"), col("n_chars").cast("long").as("len"))
    val pairs = Seq(("train", "val"), ("train", "test"), ("val", "test"))
    val tagged = pairs
      .map { case (a, b) =>
        docs
          .filter(col("split") === a || col("split") === b)
          .select(
            lit(s"$a|$b").as("pair"),
            (col("split") === a).cast("long").as("is_a"),
            col("len"))
      }
      .reduce(_ unionAll _)
    val byLen = tagged
      .groupBy("pair", "len")
      .agg(sum("is_a").as("ca"), sum(lit(1L) - col("is_a")).as("cb"))
    val tot = byLen.groupBy("pair").agg(sum("ca").as("n_a"), sum("cb").as("n_b"))
    val wcum = Window
      .partitionBy("pair")
      .orderBy("len")
      .rowsBetween(Window.unboundedPreceding, 0)
    byLen
      .withColumn("cum_a", sum("ca").over(wcum))
      .withColumn("cum_b", sum("cb").over(wcum))
      .join(tot, "pair")
      .select(
        col("pair"),
        col("n_a"),
        col("n_b"),
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")).as("d_num"))
      .groupBy("pair", "n_a", "n_b")
      .agg(max("d_num").as("d_max"))
      .select(
        col("pair"),
        col("n_a"),
        col("n_b"),
        expr("""CAST(CAST(d_max AS DECIMAL(38,0)) * 1000000
                 div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)""").as("ks_e6"))
  }

  /** Temperature settings swept by [[alphaMixture]] (α·10, shared
    * with the oracle's VALUES table).
    */
  val AlphaPointsE1: Seq[Int] = Seq(3, 5, 7, 10)

  /** #386 Temperature-scaled mixture sweep (the multilingual/
    * multi-source LM sampling standard — mT5/XLM-R's p_i ∝ n_i^α):
    * per temperature α ∈ {0.3, 0.5, 0.7, 1.0}, each source's sampling
    * weight AND the mixture's effective source count (inverse Simpson
    * (Σr)²/Σr²) — the flattening CURVE behind #77's single-α pick:
    * α = 1 mirrors the corpus (head sources dominate), α → 0
    * approaches uniform (tail sources over-sampled into repetition),
    * and the effective-count column is the one number that says what
    * each α actually buys. Exactness: scale-free ratios r_i =
    * (n_i/n_max)^α as floats of integer token ratios, e6-quantized
    * per source BEFORE any normalization (#119 discipline — both
    * engines pow the same doubles; the n_max-relative form keeps
    * every r in (0,1] so ONE quantum fits all α); weights and
    * effective count are then pure integer truncating quotients of
    * the quantized r's. One per-source aggregate + ≤sources×α fold.
    */
  def alphaMixture(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables
      .documents(spark, dir)
      .groupBy("source")
      .agg(sum(size(Dedup.toks(col("text"))).cast("long")).as("n_tokens"))
    val mx = per.agg(max("n_tokens").as("n_max"))
    val alphas = AlphaPointsE1.map(a => a.toLong).toDF("alpha_e1")
    val r = per
      .crossJoin(broadcast(mx))
      .crossJoin(broadcast(alphas))
      .select(
        col("alpha_e1"),
        col("source"),
        col("n_tokens"),
        expr("""CAST(floor(pow(CAST(n_tokens AS DOUBLE) / n_max,
                               CAST(alpha_e1 AS DOUBLE) / 10) * 1000000 + 0.5)
                AS BIGINT)""").as("r_e6"))
    val tot = r
      .groupBy("alpha_e1")
      .agg(
        sum("r_e6").as("sum_r"),
        sum(expr("CAST(r_e6 AS DECIMAL(38,0)) * r_e6")).as("sum_r2"))
      .select(
        col("alpha_e1"),
        col("sum_r"),
        expr("""CAST(CAST(sum_r AS DECIMAL(38,0)) * sum_r * 1000000
                 div sum_r2 AS BIGINT)""").as("eff_sources_e6"))
    r.join(tot, "alpha_e1")
      .select(
        col("alpha_e1"),
        col("source"),
        col("n_tokens"),
        col("r_e6"),
        expr("CAST(CAST(r_e6 AS DECIMAL(38,0)) * 1000000 div sum_r AS BIGINT)")
          .as("weight_e6"),
        col("eff_sources_e6"))
  }

  /** #471 Universe (coordinated) sampling: ALL tables sample the same
    * ENTITY — keep a customer iff hash(custkey) lands under θ, and
    * every fact row inherits its customer's fate — so the sample of a
    * JOIN equals the join of the samples (the property per-table
    * Bernoulli sampling destroys: independently thinned sides
    * intersect at θ², orphaning θ(1−θ) of fact rows). This is how
    * warehouse engines (BigQuery/Snowflake TABLESAMPLE on a key,
    * join-synopsis literature: Acharya et al. 1999) make sampled
    * star-joins answerable; at 100 TB it is THE way to run a cheap
    * but join-correct pilot query.
    *
    * Content-addressed (the #54 discipline): θ = 12.5% on the
    * hash60 permil grid, identical in both engines. The report scales
    * the sampled revenue back by 1000/permil and prices the error
    * against the TRUE per-segment revenue; `orphan_orders` — sampled
    * orders whose customer did NOT survive — is the join-consistency
    * proof and is structurally 0 (same key, same hash). One extra
    * full-join pass computes the truth; the sampled path touches θ of
    * the data.
    */
  def universeSample(spark: SparkSession, dir: String, permil: Int = 125): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    def keep(c: Column): Column =
      pmod(Dedup.hash60(concat(lit("universe:"), c)), lit(1000L)) < lit(permil.toLong)
    val custS = Tables.customer(spark, dir).filter(keep(col("c_custkey")))
    val ordersS = Tables.orders(spark, dir).filter(keep(col("o_custkey")))
    val orphans = ordersS
      .join(custS, col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_orders"))
    val samp = ordersS
      .join(custS, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        countDistinct("c_custkey").as("n_cust_sampled"),
        count(lit(1)).as("n_orders_sampled"),
        sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("rev_sampled_c"))
    val tru = Tables
      .orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("rev_true_c"))
    samp
      .join(tru, col("c_mktsegment") === col("seg"))
      .crossJoin(broadcast(orphans))
      .select(
        col("c_mktsegment"),
        col("n_cust_sampled"),
        col("n_orders_sampled"),
        col("rev_sampled_c"),
        expr(s"rev_sampled_c * 1000 div $permil").as("est_rev_c"),
        col("rev_true_c"),
        expr(s"abs(rev_sampled_c * 1000 div $permil - rev_true_c) * 1000000 div rev_true_c")
          .as("err_e6"),
        col("orphan_orders"))
  }
}
