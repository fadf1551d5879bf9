package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Lineage.CpOps
import graft.functions.GraftFunctions

/** Deduplication for LLM-training-data pipelines over `documents`.
  *
  * The synthetic corpus has no duplicates, so each operator first
  * builds a deterministic duplicated corpus *inside the query* (exact
  * copies for exact dedup, token-truncated copies for near-dup) — the
  * detection pipeline then has real work to do and non-empty output.
  *
  * Scale design: near-dup candidate generation is always
  * explode(bands) → shuffle on (band, bucket) → within-bucket join —
  * shuffle volume is `bands × docs` (linear), never an O(n²) cross
  * join. Signatures are computed per-document as single codegen'd
  * expressions over the token array (no explode of shingles, no
  * per-shingle shuffle).
  */
object Dedup {

  private val MinhashSigSize = 32

  /** The LSH banding contract (b bands × r rows = signature size) —
    * public so the S-curve tuning table (and its oracle) derive from
    * the SAME constants the banding join actually uses.
    */
  val MinhashBands = 8
  val MinhashRowsPerBand: Int = MinhashSigSize / MinhashBands

  /** Pairs from the simhash band join survive at Hamming distance ≤ this
    * (of 64 bits) — shared by the plain and IDF-weighted variants.
    */
  private val SimhashMaxHamming = 6

  private[operators] def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  private[operators] def toks(c: Column): Column = split(normText(c), " ")

  /** Engine-portable 60-bit string hash: the first 15 hex digits of
    * md5, parsed base-16. Identical in any engine with md5 (the DuckDB
    * oracle computes `('0x' || substr(md5(s),1,15))::BIGINT`) — this is
    * what lets the whole minhash/simhash chain be hash-compared against
    * SQL instead of settling for a rows-only check. Nonnegative, so the
    * kernels' mod-P residues match plain SQL `%`. Computed by the
    * native [[graft.functions.Hash60]] kernel (digest bytes directly,
    * no hex-string round-trip); `GraftFunctionsSpec` pins it equal to
    * the composed conv/substring/md5 form.
    */
  private[operators] def hash60(c: Column): Column =
    call_function("hash60", c)

  /** k-token shingles of the normalized text; a doc shorter than k
    * tokens contributes its whole text as one shingle.
    */
  private[operators] def shingles(tok: Column, k: Int = 3): Column =
    when(size(tok) < k, array(concat_ws(" ", tok)))
      .otherwise(
        transform(
          sequence(lit(1), size(tok) - (k - 1)),
          i => concat_ws(" ", slice(tok, i, lit(k)))))

  /** The planted-dup corpus construction, shared by every site that
    * derives from it (corpus builders here, [[report]]'s source
    * attribution, and the DuckDB oracles' `src` CTEs in SparkEntry) —
    * one set of constants so the sites cannot silently drift.
    */
  private[operators] val NearDupEvery = 5
  private[operators] val NearDupOffset = 1000000L
  private[operators] val ExactDupEvery = 7
  private[operators] val ExactDupOffset = 2000000L

  /** Base docs ∪ exact copies of every [[ExactDupEvery]]th doc (ids
    * offset by [[ExactDupOffset]]).
    */
  private def corpusWithExactDups(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    docs.unionAll(
      docs
        .filter(col("doc_id") % ExactDupEvery === 0)
        .select((col("doc_id") + ExactDupOffset).as("doc_id"), col("text")))
  }

  /** Base docs ∪ near-copies of every [[NearDupEvery]]th doc (ids
    * offset by [[NearDupOffset]]): the copy keeps the first 80% of
    * tokens — a realistic truncation dup.
    */
  private def corpusWithNearDups(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val t = toks(col("text"))
    val keep = greatest(lit(1), floor(size(t) * 0.8).cast("int"))
    // fanOut (r13 opt round): every consumer tokenizes/shingles this
    // corpus, and the 2-branch union otherwise caps those kernels at
    // 2 tasks (single-row-group scan per branch)
    Tables.fanOut(
      docs.unionAll(
        docs
          .filter(col("doc_id") % NearDupEvery === 0)
          .select(
            (col("doc_id") + NearDupOffset).as("doc_id"),
            array_join(slice(t, lit(1), keep), " ").as("text"))))
  }

  /** #21 Exact dedup: group by content hash of the normalized text —
    * one hash-shuffle, the 100 TB-safe way to collapse byte-identical
    * docs.
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    corpusWithExactDups(spark, dir)
      .groupBy(md5(normText(col("text")).cast("binary")).as("content_md5"))
      .agg(
        min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies")
      )

  /** #22 Document fingerprint: content md5 + token/shingle counts —
    * the per-doc identity record downstream dedup stages key on.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        md5(normText(col("text")).cast("binary")).as("fp_md5"),
        size(t).cast("long").as("n_tokens"),
        when(size(t) < 3, 1L).otherwise((size(t) - 2).cast("long")).as("n_shingles")
      )
  }

  /** Per-doc MinHash signature over a `tok` column: each shingle is
    * string-hashed ONCE (codegen'd [[hash60]]), then the native
    * `minhash_sig` kernel derives all 32 family mins in a single
    * arithmetic pass — no explode, no shuffle, no re-hashing of
    * shingle strings per family.
    */
  private val minhashSignature: Column =
    call_function(
      "minhash_sig",
      transform(shingles(col("tok")), s => hash60(s)))

  /** One row per (band, signature slice) per input row — the LSH
    * banding join key every minhash consumer shares (and the oracle
    * CTE mirrors). The slice itself is the key — exact band equality
    * (a murmur bucket of the slice would admit one false candidate per
    * ~2³² pair-bands at 100 TB, and would not be reproducible by the
    * SQL oracle). All other columns ride through.
    */
  private def bandedBySig(sigs: DataFrame): DataFrame =
    sigs
      .withColumn("band", explode(sequence(lit(0), lit(MinhashBands - 1))))
      .withColumn(
        "bucket",
        slice(col("sig"), col("band") * MinhashRowsPerBand + 1, lit(MinhashRowsPerBand)))

  /** Banded candidate pairs: self-join of [[bandedBySig]] on (band,
    * slice). Carries the full signatures through for the similarity
    * estimate.
    */
  private def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val banded = bandedBySig(
      corpusWithNearDups(spark, dir)
        .withColumn("tok", toks(col("text")))
        .select(col("doc_id"), minhashSignature.as("sig")))
    val a = banded.select(
      col("doc_id").as("doc_a"), col("sig").as("sig_a"), col("band"), col("bucket"))
    val b = banded.select(
      col("doc_id").as("doc_b"), col("sig").as("sig_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket")).filter(col("doc_a") < col("doc_b"))
  }

  /** #23 MinHash + LSH near-dup: candidate pairs sharing ≥1 of 8 bands
    * (4 rows each), with the signature-overlap Jaccard estimate.
    */
  def minhash(spark: SparkSession, dir: String): DataFrame =
    minhashPairs(spark, dir)
      .select(
        col("doc_a"),
        col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / MinhashSigSize).as("est_jaccard")
      )
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared_bands"), round(min("est_jaccard"), 4).as("est_jaccard"))

  /** #74 Incremental (delta) dedup: a NEW ingest batch (the 1M-offset
    * near-copies, standing in for today's crawl) probed against the
    * EXISTING corpus index — never new×new, never a corpus self-join.
    * This is how dedup actually runs on a continuously ingested
    * 100 TB lake: the base side is the persisted banded index (write
    * it bucketed by (band, bucket) and the shuffle disappears — see
    * BucketingSpec); per-batch work is O(batch × bands), independent
    * of corpus size. Output: which new docs duplicate which existing
    * docs, with the signature-overlap estimate — same schema as
    * [[minhash]], so admission logic downstream is shared.
    */
  def incremental(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val sigs = corpusWithNearDups(spark, dir)
      .withColumn("tok", toks(col("text")))
      .select(col("doc_id"), minhashSignature.as("sig"))
    val index = bandedBySig(sigs.filter(col("doc_id") < 1000000L)).select(
      col("doc_id").as("doc_a"), col("sig").as("sig_a"), col("band"), col("bucket"))
    val fresh = bandedBySig(sigs.filter(col("doc_id") >= 1000000L)).select(
      col("doc_id").as("doc_b"), col("sig").as("sig_b"), col("band"), col("bucket"))
    index
      .join(fresh, Seq("band", "bucket"))
      .select(
        col("doc_a"),
        col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / MinhashSigSize).as("est_jaccard"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared_bands"), round(min("est_jaccard"), 4).as("est_jaccard"))
  }

  /** #24 SimHash near-dup: 64-bit per-doc signature (native
    * `simhash64` bit-vote over codegen'd token hashes), banded into
    * 4×16-bit chunks; pairs sharing a chunk are kept at Hamming
    * distance ≤ [[SimhashMaxHamming]].
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val sigs = corpusWithNearDups(spark, dir)
      .select(
        col("doc_id"),
        call_function("simhash64", transform(toks(col("text")), t => hash60(t))).as("sig"))
    val chunked = sigs.select(
      col("doc_id"),
      col("sig"),
      explode(sequence(lit(0), lit(3))).as("chunk"))
      .withColumn("chunk_val", expr("shiftrightunsigned(sig, chunk * 16) & 65535"))
    val a = chunked.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"), col("chunk"), col("chunk_val"))
    val b = chunked.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"), col("chunk"), col("chunk_val"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(
        col("doc_a"),
        col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long").as("hamming"))
      .groupBy("doc_a", "doc_b")
      .agg(min("hamming").as("hamming"))
      .filter(col("hamming") <= SimhashMaxHamming)
  }

  /** #61 IDF-weighted SimHash near-dup: per-token weights
    * round(1000·ln(N/df)) + 10 computed from the corpus df table (one
    * aggregation, joined back without a broadcast hint — vocab can be
    * web-scale), signature via the native `simhash64w` weighted
    * bit-vote. On a realistic Zipfian vocabulary, rare discriminative
    * tokens dominate the signature and ubiquitous filler stops
    * flipping bits; on this synthetic uniform-vocab corpus the IDF
    * weights are near-constant, so results track the unweighted
    * variant (verified by spec).
    *
    * Weights are INTEGER-VALUED doubles (1000× quantized ln, +10 ≈ the
    * former +0.01ε): integer bit-vote sums are exact and
    * order-independent, so the DuckDB oracle replays the signatures
    * bit-identically — raw float weights would make near-tied votes
    * depend on summation order. Quantization error vs. raw ln is
    * < 0.05% per weight, far below any vote that could matter.
    */
  def simhashIdf(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val corpus = corpusWithNearDups(spark, dir)
    val tokPos = corpus.select(
      col("doc_id"),
      posexplode(toks(col("text"))).as(Seq("pos", "token")))
    val df_ = tokPos
      .select(col("doc_id"), col("token"))
      .distinct()
      .groupBy("token")
      .agg(count(lit(1)).as("df"))
    val nDocs = corpus.agg(count(lit(1)).cast("double").as("n_docs"))
    val sigs = tokPos
      .join(df_, "token")
      .crossJoin(broadcast(nDocs)) // 1 row; keeps the plan fully lazy
      .withColumn("w", round(log(col("n_docs") / col("df")) * 1000) + lit(10.0))
      .withColumn("h", hash60(col("token")))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("h"), col("w")))).as("hw"))
      .select(
        col("doc_id"),
        expr("simhash64w(transform(hw, e -> e.h), transform(hw, e -> e.w))").as("sig"))
    val chunked = sigs
      .select(col("doc_id"), col("sig"), explode(sequence(lit(0), lit(3))).as("chunk"))
      .withColumn("chunk_val", expr("shiftrightunsigned(sig, chunk * 16) & 65535"))
    val a = chunked.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"), col("chunk"), col("chunk_val"))
    val b = chunked.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"), col("chunk"), col("chunk_val"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(
        col("doc_a"),
        col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long").as("hamming"))
      .groupBy("doc_a", "doc_b")
      .agg(min("hamming").as("hamming"))
      .filter(col("hamming") <= SimhashMaxHamming)
  }

  /** #25 Exact n-gram Jaccard verification of the MinHash candidates:
    * join candidate pairs back to per-doc shingle sets, compute exact
    * |∩|/|∪|. The verify stage runs only on LSH survivors — linear in
    * candidates, not corpus².
    */
  /** #163 Exact set-similarity join via prefix filtering (the
    * PPJoin/AllPairs family, Chaudhuri et al. 2006 / Xiao et al.
    * 2008): find all pairs with token-set Jaccard ≥ 0.6 EXACTLY — no
    * LSH recall loss, no probabilistic contract. The prefix-filter
    * theorem: order every doc's tokens by global rarity (df asc, token
    * tiebreak); if J(A,B) ≥ t, the first n−⌈t·n⌉+1 tokens of A and B
    * must share an element — so candidates come from joining ONLY on
    * prefix tokens, which are the RAREST tokens (tiny posting lists:
    * shuffle = Σ prefix lengths keyed on rare tokens, never corpus²).
    * Survivors get exact verification with the integer predicate
    * 5·|A∩B| ≥ 3·|A∪B| — zero float arithmetic end to end, so both
    * engines produce the identical pair set. The exact complement to
    * the MinHash (#23) estimate-then-verify path. Sets are 3-token
    * SHINGLES, not tokens: on a shared-vocabulary corpus every doc
    * pair overlaps heavily at the token level (measured: J ≥ 0.6 for
    * ~80% of ALL pairs here, exploding the join), while shingle sets
    * are near-unique across unrelated docs — so prefixes really are
    * rare and the candidate set collapses to true near-dups.
    */
  def prefixJoin(spark: SparkSession, dir: String): DataFrame = {
    val sets = corpusWithNearDups(spark, dir)
      .select(col("doc_id"), array_distinct(shingles(toks(col("text")))).as("ts"))
      .localCheckpoint(eager = false)
    val e = sets.select(col("doc_id"), explode(col("ts")).as("tok"))
    val dft = e.groupBy("tok").agg(count(lit(1)).as("df"))
    val pref = e
      .join(dft, "tok")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("st"))
      .select(col("doc_id"), expr("transform(st, s -> s.tok)").as("stoks"))
      .withColumn("n", size(col("stoks")).cast("long"))
      .select(
        col("doc_id"),
        col("n"),
        posexplode(expr("slice(stoks, 1, CAST(n - (3 * n + 4) div 5 + 1 AS INT))"))
          .as(Seq("pos", "tok")))
    // PPJoin's length filter: J >= 3/5 forces 3*n_a <= 5*n_b and
    // vice versa — and the POSITIONAL filter (Xiao et al. 2008 §3.2):
    // for a token matched at 0-based rarity-rank pos_a/pos_b, the
    // overlap is at most min(pos_a, pos_b) shared tokens strictly
    // before it, plus 1, plus min(remaining suffix lengths); J >= 3/5
    // needs overlap >= ceil(3(n_a+n_b)/8), so rows whose bound falls
    // short are pruned BEFORE the distinct + verify. Both are pure
    // pruning, the result set is invariant: the bound dominates the
    // true overlap, so every matching row of a qualifying pair
    // survives (and the exactness spec vs brute force pins it).
    val cand = pref
      .select(col("doc_id").as("doc_a"), col("n").as("n_a"), col("pos").as("pos_a"), col("tok"))
      .join(
        pref.select(col("doc_id").as("doc_b"), col("n").as("n_b"), col("pos").as("pos_b"), col("tok")),
        "tok")
      .filter(
        col("doc_a") < col("doc_b") &&
          col("n_a") * 3 <= col("n_b") * 5 && col("n_b") * 3 <= col("n_a") * 5)
      .filter(expr("""least(pos_a, pos_b) + 1
                      + least(n_a - pos_a - 1, n_b - pos_b - 1)
                      >= (3 * (n_a + n_b) + 7) div 8"""))
      .select("doc_a", "doc_b")
      .distinct()
    // fanOut: the exact verify below does heavy per-pair set algebra
    // and AQE coalesces the small distinct output onto ~2 tasks
    Tables
      .fanOut(cand)
      .join(sets.select(col("doc_id").as("doc_a"), col("ts").as("ts_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("ts").as("ts_b")), "doc_b")
      .withColumn("n_inter", size(array_intersect(col("ts_a"), col("ts_b"))).cast("long"))
      .withColumn(
        "n_union",
        (size(col("ts_a")) + size(col("ts_b"))).cast("long") - col("n_inter"))
      .filter(col("n_inter") * 5 >= col("n_union") * 3)
      .select(
        col("doc_a"),
        col("doc_b"),
        col("n_inter"),
        col("n_union"),
        expr("(n_inter * 10000) div n_union").as("jaccard_e4"))
  }

  def jaccardVerify(spark: SparkSession, dir: String): DataFrame = {
    // ONE tokenize/shingle/hash pass: the KB-scale shingle-hash set
    // rides along through the banding explode and the bucket self-join,
    // so candidates arrive with both sides' sets attached — no second
    // scan, no re-join against the corpus. Set algebra runs on 60-bit
    // hash60 values (exact for any realistic corpus, and replayed
    // verbatim by the DuckDB oracle); size(array_intersect) is
    // rewritten to the non-materializing intersect_card kernel by
    // RewriteSetCardinality.
    GraftFunctions.register(spark)
    val banded = bandedBySig(
      corpusWithNearDups(spark, dir)
        .withColumn("tok", toks(col("text")))
        .withColumn("sh", array_distinct(transform(shingles(col("tok")), s => hash60(s))))
        .select(col("doc_id"), col("sh"), call_function("minhash_sig", col("sh")).as("sig")))
      .drop("sig")
    val a = banded.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("band"), col("bucket"))
    val b = banded.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(first(col("sh_a")).as("sh_a"), first(col("sh_b")).as("sh_b"))
      .select(
        col("doc_a"),
        col("doc_b"),
        round(
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))),
          4).as("jaccard")
      )
      .filter(col("jaccard") >= 0.3)
  }

  /** #245 MinHash estimator evaluation: for every banded candidate
    * pair, the signature-overlap Jaccard ESTIMATE (#23's admission
    * statistic) side by side with the exact shingle Jaccard (#25's
    * verify statistic) and the signed error — the calibration audit
    * every production dedup pipeline publishes before trusting the
    * estimate to gate deletions (the dedup analog of #238/#244's ANN
    * evaluation family: #23 is the approximate index, #25 the ground
    * truth, this the scorecard). A biased-high estimator deletes
    * unique documents; biased-low floods the verify stage — the error
    * distribution is the knob-tuning evidence for bands × rows.
    *
    * One tokenize/shingle/hash pass (the #25 discipline): signature
    * AND shingle-hash set ride together through the banding explode
    * and bucket self-join, so both statistics come from the same
    * candidate row — no second scan. All-integer e6 grid:
    * est = matches·10⁶ div 32, exact = inter·10⁶ div union.
    */
  def estimatorEval(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val banded = bandedBySig(
      corpusWithNearDups(spark, dir)
        .withColumn("tok", toks(col("text")))
        .withColumn("sh", array_distinct(transform(shingles(col("tok")), s => hash60(s))))
        .select(col("doc_id"), col("sh"), call_function("minhash_sig", col("sh")).as("sig")))
    val a = banded.select(
      col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("sig").as("sig_a"),
      col("band"), col("bucket"))
    val b = banded.select(
      col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("sig").as("sig_b"),
      col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(
        first(col("sh_a")).as("sh_a"),
        first(col("sh_b")).as("sh_b"),
        first(col("sig_a")).as("sig_a"),
        first(col("sig_b")).as("sig_b"))
      .select(
        col("doc_a"),
        col("doc_b"),
        expr(s"""CAST((size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), p -> p))
                  * 1000000) div $MinhashSigSize AS BIGINT)""").as("est_e6"),
        expr("""CAST((size(array_intersect(sh_a, sh_b)) * CAST(1000000 AS BIGINT))
                 div size(array_union(sh_a, sh_b)) AS BIGINT)""").as("exact_e6"))
      .withColumn("err_signed_e6", col("est_e6") - col("exact_e6"))
  }

  /** #170 Sorted-neighborhood near-dup (SNM, Hernández–Stolfo): sort
    * the corpus by a blocking key (the 24-char normalized-text prefix),
    * slide a fixed window of `w` positions, and Jaccard-verify only
    * pairs within the window — the classic entity-resolution blocking
    * family, complementary to LSH banding (#23): SNM catches prefix-
    * preserving edits (truncation, suffix append) with ONE sort and
    * O(n·w) candidate pairs, no signature computation at all, and its
    * miss profile (prefix-destroying edits) is exactly what the
    * MinHash path covers — production dedup runs both.
    *
    * The global sort rank is built hierarchically (the #86/#118
    * discipline): a 2-char-prefix shard is monotone in the sort key,
    * so per-shard row_number + nShards-row cumulative offsets
    * reconstruct the global rank with no single-partition data window
    * (the oracle's plain row_number is provably identical). Window
    * pairs are EQUI-joins on rank+d (d ∈ 1..w) — never a range join.
    * At 100 TB the prefix shard comes from a range-partitioner sample
    * instead (the z-order scale-path construction); occupancy, not
    * correctness, is what moves.
    */
  def snm(
      spark: SparkSession,
      dir: String,
      w: Int = 4,
      keyLen: Int = 24): DataFrame =
    snmWindowPairs(spark, dir, w, keyLen)
      .select(
        col("doc_a"),
        col("doc_b"),
        col("dist"),
        round(
          size(array_intersect(col("sh_l"), col("sh_r"))).cast("double") /
            size(array_union(col("sh_l"), col("sh_r"))),
          4).as("jaccard"))
      .filter(col("jaccard") >= 0.3)

  /** The raw SNM window candidates (pre-verification): (doc_a, doc_b,
    * dist, sh_l, sh_r). [[snm]] Jaccard-verifies them; [[fsLinkage]]
    * reuses the blocking with its own Fellegi–Sunter scoring.
    */
  private def snmWindowPairs(
      spark: SparkSession,
      dir: String,
      w: Int = 4,
      keyLen: Int = 24): DataFrame = {
    GraftFunctions.register(spark)
    val docs = corpusWithNearDups(spark, dir)
      .withColumn("norm", normText(col("text")))
      .withColumn("k", substring(col("norm"), 1, keyLen))
      .withColumn("tok", split(col("norm"), " "))
      .withColumn("sh", array_distinct(transform(shingles(col("tok")), s => hash60(s))))
      .select(col("doc_id"), col("k"), col("sh"))
    val sharded = docs.withColumn(
      "shard",
      ascii(substring(col("k"), 1, 1)) * 256 + ascii(substring(col("k"), 2, 1)))
    val local = sharded.withColumn(
      "lrn",
      row_number()
        .over(Window.partitionBy("shard").orderBy(col("k"), col("doc_id")))
        .cast("long"))
    val offsets = sharded
      .groupBy("shard")
      .agg(count(lit(1)).as("c"))
      .withColumn(
        "off",
        coalesce(
          sum("c").over(
            Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("shard"), col("off"))
    val ranked = local
      .join(broadcast(offsets), "shard")
      .withColumn("rn", col("off") + col("lrn"))
      .select(col("rn"), col("doc_id"), col("sh"))
    val probes = ranked
      .select(
        col("rn"),
        col("doc_id").as("id_l"),
        col("sh").as("sh_l"),
        explode(sequence(lit(1), lit(w))).as("d"))
      .withColumn("rn_r", col("rn") + col("d"))
    probes
      .join(
        ranked.select(col("rn").as("rn_r"), col("doc_id").as("id_r"), col("sh").as("sh_r")),
        "rn_r")
      .select(
        least(col("id_l"), col("id_r")).as("doc_a"),
        greatest(col("id_l"), col("id_r")).as("doc_b"),
        col("d").cast("long").as("dist"),
        col("sh_l"),
        col("sh_r"))
  }

  /** #64 Near-dup clustering + keep-list: candidate pairs → connected
    * components (iterative min-label propagation — the alternating
    * small-star pattern; converges in O(log diameter) rounds, each one
    * self-join + aggregate) → one canonical doc per cluster. This is
    * the stage that actually REMOVES duplicates: the output marks
    * every doc keep/drop. The driver-side loop is iteration control
    * only (a count per round); all data stays distributed.
    */
  def clusters(spark: SparkSession, dir: String): DataFrame =
    Lineage.checkpointReleasing(spark) { implicit scope =>
    // edges is the only input reused every round — cache it for the loop
    // and unpersist on exit (round-1 leaked these into every later query
    // sharing the JVM). labels goes through localCheckpoint, not cache:
    // it truncates the per-round lineage (otherwise the plan doubles
    // every iteration) and lets the final result detach from the caches.
    val pairs = minhashPairs(spark, dir).select("doc_a", "doc_b").distinct()
    val edges = pairs
      .unionAll(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .cache()
    val docs = corpusWithNearDups(spark, dir).select(col("doc_id"))
    // LAZY checkpoints throughout: the convergence probe right after is
    // the round's single action and materializes the truncated lineage
    // as a side effect — eager would run a second full job per round
    // (measured ~2× the loop's wall time).
    var labels =
      docs.select(col("doc_id"), col("doc_id").as("label")).cp(eager = false)
    // convergence probe: a per-row changed flag computed inside the
    // round's own select, summed by the same action that materializes
    // the checkpoint. Unlike the earlier compare-two-sums probe this
    // detects the fixpoint IN the round that reaches it — one fewer
    // full propagation round per query (the r3 dedup_apply drift).
    var converged = false
    var iter = 0
    while (!converged && iter < 15) {
      val neighborMin = edges
        .join(labels.select(col("doc_id").as("doc_b"), col("label").as("n_label")), "doc_b")
        .groupBy("doc_a")
        .agg(min("n_label").as("min_n_label"))
      val next = labels
        .join(neighborMin.select(col("doc_a").as("doc_id"), col("min_n_label")), Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          least(col("label"), coalesce(col("min_n_label"), col("label"))).as("label"),
          coalesce(col("min_n_label") < col("label"), lit(false)).cast("long").as("chg"))
        .cp(eager = false)
      converged = next.agg(sum("chg")).head.getLong(0) == 0L
      labels = next.drop("chg")
      iter += 1
    }
    (labels
      .select(
        col("doc_id"),
        col("label").as("cluster_id"),
        (col("doc_id") === col("label")).cast("int").as("keep")), Seq(edges))
  }

  /** #69 Dedup apply / corpus compaction: the terminal stage of the
    * near-dup pipeline — exactly one canonical doc per cluster
    * survives, with per-cluster collapse stats. Downstream training
    * jobs read THIS, not the raw corpus. One aggregation over the
    * cluster labels; the heavy lifting happened in [[clusters]].
    */
  def applyKeepList(spark: SparkSession, dir: String): DataFrame =
    // the canonical doc IS the cluster label (min doc_id of the
    // component), so the keep-filter + size-join of the r3 version
    // collapses to ONE aggregation over the cluster labels — no
    // second shuffle, no join (the 1.61×-of-baseline drift the r3
    // bench flagged was exactly that extra pass)
    clusters(spark, dir)
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
      .select(
        col("cluster_id").as("doc_id"),
        col("cluster_id"),
        col("cluster_size"),
        (col("cluster_size") - 1).as("n_dropped"))

  /** #141 Per-source dedup report: duplication rate by source over the
    * near-dup cluster labels — the dashboard a pipeline owner watches
    * to spot a crawler or vendor feeding recycled content BEFORE it
    * skews the training mixture. Composes [[clusters]] wholesale
    * (a doc is a duplicate iff it is not its cluster's canonical) with
    * one join to the source map and one aggregation over the handful
    * of sources; the rate is an exact integer/integer division rounded
    * at output.
    */
  def report(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    // the dup-corpus source map: planted near-copies inherit their base
    // doc's source — same [[NearDupEvery]]/[[NearDupOffset]] constants
    // as corpusWithNearDups, so the attribution cannot drift from the
    // clusters it labels
    val src = docs.unionAll(
      docs
        .filter(col("doc_id") % NearDupEvery === 0)
        .select((col("doc_id") + NearDupOffset).as("doc_id"), col("source")))
    clusters(spark, dir)
      .join(src, "doc_id")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum((col("doc_id") =!= col("cluster_id")).cast("long")).as("n_dups"))
      .withColumn("dup_rate", round(col("n_dups").cast("double") / col("n_docs"), 4))
  }

  /** #26 Embedding-cosine near-dup: corpus ∪ perturbed copies, multi-
    * table random-hyperplane LSH buckets (bit count derived from corpus
    * size — `Similarity.numPlanes` — so bucket occupancy stays bounded
    * at any scale), within-bucket pairs scored by the native
    * `cosine_sim` kernel at ≥ 0.99. Near-identical vectors agree on
    * every hyperplane sign with probability ≈ (1−θ/π)^bits per table
    * (θ ≈ 0 here), so recall stays ~1 even at 22+ bits; two tables
    * square the residual miss probability.
    */
  def embedding(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val vecs = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    // near-copy: every 4th vector, elementwise ×(1 + 0.002·((i%5)-2)) — tiny angular jitter
    val perturbed = vecs
      .filter(col("vec_id") % 4 === 0)
      .select(
        (col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> CAST(x * (1.0 + 0.002 * ((i % 5) - 2)) AS FLOAT))")
          .as("embedding"))
    val corpus = vecs.unionAll(perturbed)
    // corpus = base + every-4th perturbed copy = 1.25× the base count
    val bits = Similarity.numPlanes((Tables.embeddings(spark, dir).count() * 5) / 4)
    val bucketed = Similarity.bandedBuckets(corpus, "embedding", bits)
    val a = bucketed.select(
      col("vec_id").as("vec_a"), col("embedding").as("emb_a"), col("t"), col("bucket"))
    val b = bucketed.select(
      col("vec_id").as("vec_b"), col("embedding").as("emb_b"), col("t"), col("bucket"))
    a.join(b, Seq("t", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(
        col("vec_a"),
        col("vec_b"),
        round(expr("cosine_sim(emb_a, emb_b)"), 4).as("cos"))
      .filter(col("cos") >= 0.99)
      .distinct()
  }

  /** #78 Duplicate-span removal (C4/CCNet-style exact span dedup):
    * chunk each doc into NON-overlapping `blockLen`-token blocks,
    * keep only the globally-first occurrence of every repeated block
    * — ordered by (doc_id, position), the deterministic analog of
    * "first seen wins" — and reassemble the surviving text. This is a
    * corpus REWRITE, not just a flag: the output is the cleaned text
    * a training job would read. Blocks shorter than 3 tokens (the
    * ragged tail of a doc) are always kept — deduping "the" across
    * the corpus is noise, not dedup.
    *
    * Scale shape: explode is linear (n_tokens/blockLen rows per doc),
    * the first-occurrence pick is one shuffle on the block hash with
    * the rank filter, and the reassembly is one shuffle back on
    * doc_id. No pairwise comparison ever happens — the standard
    * 100 TB exact-substring-dedup layout.
    */
  def spans(spark: SparkSession, dir: String, blockLen: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(spark)
    val nBlocks = expr(s"(size(tok) + ${blockLen - 1}) div $blockLen").cast("int")
    val blocks = Tables
      .documents(spark, dir)
      .select(col("doc_id"), toks(col("text")).as("tok"))
      .select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(1), nBlocks),
            i => array_join(slice(col("tok"), (i - lit(1)) * blockLen + 1, lit(blockLen)), " "))))
      .select(col("doc_id"), col("pos").cast("long").as("idx"), col("col").as("block"))
    val w = Window.partitionBy("h").orderBy("doc_id", "idx")
    val flagged = blocks
      .withColumn("participates", size(split(col("block"), " ")) >= 3)
      .withColumn("h", hash60(col("block")))
      .withColumn("rn", row_number().over(w))
      .withColumn("keep", !col("participates") || col("rn") === 1)
    flagged
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(col("keep").cast("long")).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("keep"), struct(col("idx"), col("block"))))),
            x => x.getField("block")),
          " ").as("cleaned_text"))
  }

  /** #219 Misaligned exact-substring dedup (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better"
    * suffix-array morphology, re-expressed as rolling windows):
    * detect every ≥`k`-token EXACT duplicate substring at ARBITRARY
    * token offsets. The aligned-block `spans` operator (#78) hashes
    * non-overlapping 8-token blocks, so a copy shifted by any
    * non-multiple of the block length changes every block string and
    * is invisible to it; here every stride-1 `k`-token window is
    * hashed with its position, so a shared run of ≥ k tokens matches
    * regardless of phase. Pipeline: rolling hash60 windows →
    * global first-occurrence ranking over the window hash (ordered
    * (doc_id, start) — "first seen wins", later occurrences flagged,
    * self-repetition included) → per-doc maximal-run merge of the
    * flagged windows (gaps-and-islands: a window whose start is
    * > k past the previous flagged start opens a new island, so
    * overlapping or back-to-back duplicate intervals coalesce into
    * one maximal span).
    *
    * The corpus plants misaligned copies: every 6th doc with ≥ 25
    * tokens re-emits tokens 6..n-5 (1-based) behind THREE doc-unique
    * junk tokens — the copied region sits at 0-based offset 5 in the
    * source but 3 in the copy, a relative shift of 2, so no aligned
    * 8-block ever matches (the spec proves that) while every interior
    * window does: the detected span is exactly [3, m+2] for m = n-10
    * copied tokens.
    *
    * Scale shape: windows are one linear explode (n_tokens rows per
    * doc, stride 1 — k× the block count of #78 but still linear),
    * ranking is one shuffle on the 60-bit window hash, islands one
    * shuffle back on doc_id. No pairwise comparison anywhere — the
    * same layout Lee et al. get from a suffix array, with the
    * distributed-join cost model instead of shared-memory LCP scans.
    */
  /** The shared front half of the misaligned-substring pair (#219 /
    * #220): the planted-copy corpus (doc_id, tok) and the flagged
    * duplicate windows (doc_id, 0-based start) — every stride-1
    * `k`-token window whose hash has a strictly earlier (doc_id,
    * start) occurrence.
    */
  private def substringDup(spark: SparkSession, dir: String, k: Int): (DataFrame, DataFrame) = {
    GraftFunctions.register(spark)
    val base = Tables
      .documents(spark, dir)
      .select(col("doc_id"), toks(col("text")).as("tok"))
    val planted = base
      .filter(col("doc_id") % 6 === 0 && size(col("tok")) >= 25)
      .select(
        (col("doc_id") + 6000000L).as("doc_id"),
        concat(
          array(
            concat(lit("zzq"), col("doc_id"), lit("a")),
            concat(lit("zzq"), col("doc_id"), lit("b")),
            concat(lit("zzq"), col("doc_id"), lit("c"))),
          expr("slice(tok, 6, size(tok) - 10)")).as("tok"))
    val corpus = base.unionAll(planted).localCheckpoint(eager = false)
    // guard BEFORE sequence(): sequence(1, n-k+1) with n < k would
    // generate a DESCENDING sequence, not an empty one
    val wins = corpus
      .withColumn("n", size(col("tok")))
      .filter(col("n") >= k)
      .select(
        col("doc_id"),
        posexplode(
          expr(s"transform(sequence(1, n - $k + 1), i -> hash60(array_join(slice(tok, i, $k), ' ')))"))
          .as(Seq("start", "h")))
      .select(col("doc_id"), col("start").cast("long").as("start"), col("h"))
    val firstSeen = Window.partitionBy("h").orderBy("doc_id", "start")
    val dup = wins
      .withColumn("rn", row_number().over(firstSeen))
      .filter(col("rn") > 1)
      .select("doc_id", "start")
    (corpus, dup)
  }

  def substringSpans(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val (_, dup) = substringDup(spark, dir, k)
    val byDoc = Window.partitionBy("doc_id").orderBy("start")
    dup
      .withColumn(
        "new_isl",
        when(col("start") - lag("start", 1).over(byDoc) <= k, 0L).otherwise(1L))
      .withColumn("isl", sum("new_isl").over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "isl")
      .agg(min("start").as("span_start"), max("start").as("max_start"), count(lit(1)).as("n_windows"))
      .select(
        col("doc_id"),
        col("span_start"),
        (col("max_start") + (k - 1)).as("span_end"),
        (col("max_start") + (k - 1) - col("span_start") + 1).as("span_len"),
        col("n_windows"))
  }

  /** #220 Misaligned-substring corpus REWRITE — the back half of the
    * Lee et al. 2022 procedure #219 only detects: physically remove
    * every token covered by a non-first-occurrence duplicate window
    * and reassemble the surviving text (what the training job reads).
    * A token survives iff NO flagged `k`-window covers it, so the
    * first occurrence of every substring stays intact corpus-wide and
    * later copies lose exactly their duplicated run (plus nothing
    * else — the doc-unique junk prefixes of #219's planted copies
    * survive verbatim, which the spec pins).
    *
    * Scale shape: covered positions are a bounded explode (k rows per
    * flagged window), the survivor pick is one left-anti hash join on
    * (doc_id, position), reassembly one shuffle back on doc_id — all
    * linear, the exact cost profile of the detection pass it extends.
    */
  def substringRewrite(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val (corpus, dup) = substringDup(spark, dir, k)
    val positions = corpus.select(
      col("doc_id"),
      posexplode(col("tok")).as(Seq("p", "t")))
    val covered = dup
      .select(col("doc_id"), explode(expr(s"sequence(start, start + ${k - 1})")).as("p"))
      .distinct()
    val survivors = positions
      .join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("p"), col("t")))), x => x.getField("t")),
          " ").as("cleaned_text"))
    // left join from the corpus: a FULLY-covered doc (e.g. a 10-token
    // doc equal to an earlier doc's window) must surface as n_kept=0
    // with empty text, not silently vanish
    corpus
      .select(col("doc_id"), size(col("tok")).cast("long").as("n_tokens"))
      .join(survivors, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /** #94 SemDeDup — semantic dedup by clustering then within-cluster
    * cosine pruning (Abbas et al. 2023, arXiv:2303.09540). Unlike the
    * hyperplane-LSH `embedding` operator above, the candidate scope is
    * a k-means-style cell: assign every vector to its nearest centroid
    * (here the per-label per-dimension means — the same deterministic
    * coarse quantizer `Similarity.centroidAssign` uses), then inside
    * each cell drop a vector when a near-duplicate (cosine ≥ `tau`)
    * exists that is FARTHER from the centroid — the paper's rule:
    * among semantic duplicates, keep the cluster outlier to preserve
    * diversity. Ties on centroid-cosine break by lower vec_id.
    *
    * The corpus is base + every-4th perturbed near-copy (same planted
    * schedule as `embedding`), so the prune has real work: exactly one
    * side of each planted pair is dropped.
    *
    * Scale shape: centroid table is k×d floats (broadcast); the
    * assignment is one broadcast-nested-loop pass; the prune joins on
    * `cell`, so pairwise work is bounded by cell occupancy — SemDeDup's
    * own contract is k ∝ n/target_cell_size, which keeps the
    * within-cell quadratic term constant per cell at 100 TB. No global
    * pairwise join exists in the plan.
    */
  def semantic(spark: SparkSession, dir: String, tau: Double = 0.99): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(spark)
    val base = Tables.embeddings(spark, dir)
    val vecs = base.select(col("vec_id"), col("embedding"))
    val perturbed = vecs
      .filter(col("vec_id") % 4 === 0)
      .select(
        (col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> CAST(x * (1.0 + 0.002 * ((i % 5) - 2)) AS FLOAT))")
          .as("embedding"))
    val corpus = vecs.unionAll(perturbed)
    val centroids = base
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(avg("x").as("mu"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("entries"))
      .select(
        col("label").as("cell"),
        expr("transform(entries, e -> CAST(e.mu AS FLOAT))").as("centroid"))
    val w = Window.partitionBy("vec_id").orderBy(col("ccos_e4").desc, col("cell"))
    // lazy localCheckpoint: the assignment feeds BOTH sides of the
    // cell self-join and the final flag join — without it the
    // broadcast-NLJ assignment subplan executes three times (the
    // two-phase "cluster, then prune" materialization SemDeDup
    // prescribes anyway)
    // centroid cosine in integer ten-thousandths via floor(x*1e4 +
    // 0.5), not round(x, 6): the centroid means are not bit-identical
    // across engines (summation order differs in the last ulp), so the
    // quantization must be coarse enough that an ulp never straddles a
    // bucket edge in practice — and floor of the same double never
    // splits a half-way tie the way round() does (the
    // Scale.madOutliers lesson). Verified straddle-free at all three
    // test SFs; ties the coarser grid creates break on vec_id, which
    // is engine-identical.
    val assigned = corpus
      .crossJoin(broadcast(centroids))
      .select(
        col("vec_id"),
        col("embedding"),
        col("cell"),
        floor(expr("cosine_sim(embedding, centroid)") * 10000d + lit(0.5)).as("ccos_e4"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .localCheckpoint(eager = false)
    val right = assigned.select(
      col("cell"),
      col("vec_id").as("o_id"),
      col("embedding").as("o_emb"),
      col("ccos_e4").as("o_ccos_e4"))
    val dropped = assigned
      .join(right, Seq("cell"))
      .filter(col("o_id") =!= col("vec_id"))
      .filter(
        floor(expr("cosine_sim(embedding, o_emb)") * 10000d + lit(0.5)) >=
          math.round(tau * 10000d))
      .filter(
        col("o_ccos_e4") < col("ccos_e4") ||
          (col("o_ccos_e4") === col("ccos_e4") && col("o_id") < col("vec_id")))
      .select("vec_id")
      .distinct()
    assigned
      .join(dropped.withColumn("is_dropped", lit(1)), Seq("vec_id"), "left_outer")
      .select(
        col("vec_id"),
        col("cell").cast("long").as("cell"),
        col("ccos_e4"),
        col("is_dropped").isNull.cast("int").as("keep"))
  }

  /** Planted-excerpt constants: every [[ExcerptEvery]]th doc gets a
    * contiguous 30% slice (tokens 20%..50%) as an "excerpt" variant,
    * id offset by [[ExcerptOffset]] — containment ≈ 1 by construction.
    */
  val ExcerptEvery = 8
  val ExcerptOffset = 4000000L

  /** #206 Containment join (asymmetric Jaccard): pairs where doc A's
    * shingle set is ≥ τ CONTAINED in doc B — the excerpt/quotation
    * detector symmetric near-dup misses (a paragraph lifted into a
    * long doc has tiny Jaccard but containment ≈ 1; the text-reuse
    * primitive behind quote attribution and contamination tracing).
    *
    * Exact, via the asymmetric prefix filter (PPJoin's containment
    * variant): order each A-set by global document frequency
    * (rarest-first); if A is τ-contained in ANY B, then among A's
    * ⌊(1−τ)·|A|⌋+1 RAREST shingles at least one is in B — so only
    * that prefix probes the inverted index, while the B side indexes
    * everything (no length filter: containers can be any size).
    * Candidates shuffle O(prefix·df); the exact verify intersects the
    * two bounded per-doc shingle arrays. The oracle is the all-pairs
    * ground truth, so the hash-MATCH proves the prefix filter
    * LOSSLESS, not just fast.
    */
  def containment(spark: SparkSession, dir: String, tauE6: Long = 800000L): DataFrame = {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val base = docs.select(col("doc_id"), toks(col("text")).as("tok"))
    val lo = expr("CAST(floor(size(tok) * 0.2) AS INT) + 1")
    val len =
      expr("greatest(1, CAST(floor(size(tok) * 0.5) AS INT) - CAST(floor(size(tok) * 0.2) AS INT))")
    val corpus = base
      .unionAll(
        base
          .filter(col("doc_id") % ExcerptEvery === 0)
          .select(
            (col("doc_id") + ExcerptOffset).as("doc_id"),
            slice(col("tok"), lo, len).as("tok")))
      .select(
        col("doc_id"),
        array_distinct(transform(shingles(col("tok")), s => hash60(s))).as("hs"))
      .localCheckpoint(eager = false)
    val post = corpus.select(col("doc_id"), explode(col("hs")).as("h"))
    val df = post.groupBy("h").agg(count(lit(1)).as("df"))
    // rarest-first order inside each set; prefix = floor((1-τ)|A|) + 1
    val aPref = post
      .join(df, "h")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("st"))
      .select(
        col("doc_id").as("doc_a"),
        expr("transform(st, s -> s.h)").as("sorted_h"),
        size(col("st")).as("na"))
      .select(
        col("doc_a"),
        col("na"),
        explode(
          expr(s"slice(sorted_h, 1, CAST((na * (1000000 - $tauE6)) div 1000000 AS INT) + 1)"))
          .as("h"))
    val cands = aPref
      .join(post.select(col("doc_id").as("doc_b"), col("h")), "h")
      .filter(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b", "na")
      .distinct()
    cands
      .join(corpus.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
      .join(corpus.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .withColumn("containment_e6", expr("(inter * 1000000) div na"))
      .filter(col("containment_e6") >= tauE6)
      .select(col("doc_a"), col("doc_b"), col("na").cast("long").as("n_shingles_a"),
        col("inter"), col("containment_e6"))
  }

  /** Truncating e6-grid power (p ≥ 1): repeated x·y div 10⁶ — the
    * integer formulation both the Spark column and the generated
    * oracle replay verbatim, so the table is exact cross-engine (the
    * float `pow` that kept this deferred never appears).
    */
  /** #355 Train/val/test split-leakage audit: near-dup pairs that
    * CROSS the content-hash split — the held-out-set contamination a
    * training pipeline must catch BEFORE eval numbers go out (#68
    * decontaminates against an external benchmark; this audits the
    * pipeline's own split: a val doc whose near-duplicate sits in
    * train inflates eval exactly like benchmark leakage). Pairs from
    * the #23 banded MinHash candidates; split buckets are #54's
    * md5-mod-100 rule applied to the CANONICAL (normalized) text — a
    * raw-vs-normalized whitespace difference must not separate two
    * copies of one document into different splits, which is the
    * failure this audit exists to find. Output: the split×split pair
    * matrix (lexicographic cell order) with per-cell counts, the
    * cross-split flag, and the corpus-level leak rate (e6) — the
    * number a data-quality gate thresholds on.
    */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val splits = corpusWithNearDups(spark, dir)
      .select(
        col("doc_id"),
        (conv(substring(md5(normText(col("text")).cast("binary")), 1, 4), 16, 10)
          .cast("long") % 100).as("bucket"))
      .select(
        col("doc_id"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test")
          .as("split"))
    val pairs = minhashPairs(spark, dir).select("doc_a", "doc_b").distinct()
    val cells = pairs
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .select(
        least(col("split_a"), col("split_b")).as("split_lo"),
        greatest(col("split_a"), col("split_b")).as("split_hi"))
      .groupBy("split_lo", "split_hi")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("is_leak", (col("split_lo") =!= col("split_hi")).cast("long"))
    val tot = cells.agg(
      sum("n_pairs").as("n_pairs_total"),
      coalesce(sum(when(col("is_leak") === 1, col("n_pairs"))), lit(0L)).as("n_leaked"))
    cells
      .crossJoin(broadcast(tot))
      .withColumn(
        "leak_rate_e6",
        expr("CAST(n_leaked * 1000000 div n_pairs_total AS BIGINT)"))
  }

  /** #362 Cluster-recovery scorecard (the §15.4 invariant applied to
    * the whole near-dup CLUSTERING pipeline, not just the MinHash
    * estimator #245 calibrates): the planted truth is known by
    * construction — every doc_id % NearDupEvery = 0 has a planted
    * 80%-prefix copy at +NearDupOffset — so recall = planted pairs
    * that landed in one cluster, precision = recovered planted pairs
    * over ALL same-cluster pairs (Σ C(size,2); a chain that glues
    * strangers shows up here and nowhere else). The end-to-end number
    * for the banding + propagation stack that per-stage metrics
    * can't see. 1 row, every comparison frame broadcast-sized.
    */
  def clusterEval(spark: SparkSession, dir: String): DataFrame = {
    val labels = clusters(spark, dir).select(col("doc_id"), col("cluster_id"))
    val planted = Tables
      .documents(spark, dir)
      .filter(col("doc_id") % NearDupEvery === 0)
      .select(col("doc_id").as("a"), (col("doc_id") + NearDupOffset).as("b"))
    val rec = planted
      .join(labels.select(col("doc_id").as("a"), col("cluster_id").as("ca")), "a")
      .join(labels.select(col("doc_id").as("b"), col("cluster_id").as("cb")), "b")
      .agg(
        count(lit(1)).as("n_planted"),
        sum((col("ca") === col("cb")).cast("long")).as("n_recovered"))
    val cp = labels
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("sz"))
      .agg(
        sum(expr("sz * (sz - 1) div 2")).as("n_cluster_pairs"),
        sum((col("sz") > 1).cast("long")).as("n_multi_clusters"))
    rec
      .crossJoin(broadcast(cp))
      .select(
        col("n_planted"),
        col("n_recovered"),
        expr("CAST(n_recovered * 1000000 div n_planted AS BIGINT)").as("recall_e6"),
        col("n_cluster_pairs"),
        col("n_multi_clusters"),
        expr("""CASE WHEN n_cluster_pairs > 0
                THEN CAST(n_recovered * 1000000 div n_cluster_pairs AS BIGINT)
                ELSE NULL END""").as("precision_e6"))
  }

  /** Fellegi–Sunter contract constants, shared with the oracle: the
    * field set (16-char normalized prefix, token-count bucket of 8,
    * last token, first-3-token head), the m-probability init the
    * single EM-style M-step starts from (Splink's default-init
    * discipline), and the lower decision threshold in ln-odds e6
    * (≥ 0 ⇒ match — positive posterior odds; ≥ −4e6 ⇒ possible_match
    * — within e⁴ of even odds; else non_match).
    */
  private[graft] val FsPrefixLen = 16
  private[graft] val FsLenBucket = 8
  private[graft] val FsMInitE6 = 900000L
  private[graft] val FsPossibleFloorE6 = -4000000L

  /** Per-doc comparison fields over the planted-dup corpus. */
  private def fsFields(spark: SparkSession, dir: String): DataFrame =
    corpusWithNearDups(spark, dir)
      .withColumn("norm", normText(col("text")))
      .withColumn("tok", split(col("norm"), " "))
      .select(
        col("doc_id"),
        substring(col("norm"), 1, FsPrefixLen).as("f_prefix"),
        expr(s"CAST(size(tok) div $FsLenBucket AS BIGINT)").as("f_len"),
        element_at(col("tok"), -1).as("f_last"),
        array_join(slice(col("tok"), 1, 3), " ").as("f_head"))

  private val FsFieldKeys = Seq("prefix", "len", "last", "head")

  /** #423 Fellegi–Sunter record linkage (Fellegi & Sunter 1969): score
    * every blocked candidate pair by the sum of per-field ln-odds
    * weights — agreement on field k contributes ln(m_k/u_k),
    * disagreement ln((1−m_k)/(1−u_k)) — and decide
    * match / possible_match / non_match by thresholds on the total,
    * the probabilistic upgrade over #170/#23's single-similarity
    * verdicts (a high-discrimination field agreeing counts for more
    * than a common one; structured disagreement subtracts evidence
    * instead of just diluting a Jaccard).
    *
    * Candidates: the union of the two existing blocking paths
    * (MinHash banding #23 ∪ SNM windows #170) — production linkage
    * scores whatever its blockers surface. Parameters are estimated,
    * not assumed: u_k from one deterministic hash-drawn partner per
    * base doc (the #86 draw discipline — the random-pair agreement
    * rate), m_k by a single EM-style M-step (score once from the
    * [[FsMInitE6]] init, take the score ≥ 0 pairs as the match class,
    * re-estimate m_k as their smoothed agreement rate) — both
    * Laplace-smoothed (x+1)/(n+2) on the e6 grid so no weight is ever
    * ±∞. Weights are e6-floored ln terms of exact integer ratios (the
    * #380 Hill discipline), summed exactly per pair.
    *
    * Scale: fields are one projection of the corpus; the u-draw is one
    * row per base doc; both weight tables are 1-row broadcast frames;
    * scoring is a constant-width expression over the blocked pairs —
    * the blockers' O(n·w + n·bands) candidate volume dominates, the
    * FS layer adds nothing super-linear. `FsLinkageSpec` replays the
    * whole estimate-score-decide fold and [[fsLinkageEval]] scores the
    * decisions against the planted truth (§15.4).
    */
  def fsLinkage(spark: SparkSession, dir: String): DataFrame =
    Lineage.checkpointReleasing(spark) { implicit scope =>
      GraftFunctions.register(spark)
      val fields = fsFields(spark, dir).cp(false)
      val cand = minhashPairs(spark, dir)
        .select("doc_a", "doc_b")
        .unionAll(snmWindowPairs(spark, dir).select("doc_a", "doc_b"))
        .distinct()
      val fa = fields.select(
        col("doc_id").as("doc_a"),
        col("f_prefix").as("pa"),
        col("f_len").as("la"),
        col("f_last").as("za"),
        col("f_head").as("ha"))
      val fb = fields.select(
        col("doc_id").as("doc_b"),
        col("f_prefix").as("pb"),
        col("f_len").as("lb"),
        col("f_last").as("zb"),
        col("f_head").as("hb"))
      val gammas = cand
        .join(fa, "doc_a")
        .join(fb, "doc_b")
        .select(
          col("doc_a"),
          col("doc_b"),
          (col("pa") === col("pb")).cast("long").as("g_prefix"),
          (col("la") === col("lb")).cast("long").as("g_len"),
          (col("za") === col("zb")).cast("long").as("g_last"),
          (col("ha") === col("hb")).cast("long").as("g_head"))
        .cp(false)
      // ---- u: agreement odds of a random pairing — one hash-drawn
      // partner per base doc on the dense doc_id range ----
      val base = fields.filter(col("doc_id") < NearDupOffset)
      val nBase = base.agg(count(lit(1)).as("n"))
      val uPairs = base
        .select(col("doc_id").as("doc_a"))
        .crossJoin(broadcast(nBase))
        .withColumn("draw", pmod(hash60(concat(lit("fsu:"), col("doc_a"))), col("n")))
        .withColumn(
          "doc_b",
          when(col("draw") === col("doc_a"), (col("draw") + 1) % col("n")).otherwise(col("draw")))
        .join(fa, "doc_a")
        .join(fb, "doc_b")
      val u = uPairs.agg(
        count(lit(1)).as("n_u"),
        sum((col("pa") === col("pb")).cast("long")).as("a_prefix"),
        sum((col("la") === col("lb")).cast("long")).as("a_len"),
        sum((col("za") === col("zb")).cast("long")).as("a_last"),
        sum((col("ha") === col("hb")).cast("long")).as("a_head"))
      val uE6 = u.select(
        FsFieldKeys.map(k =>
          expr(s"CAST((a_$k + 1) * 1000000 div (n_u + 2) AS BIGINT)").as(s"u_$k")): _*)
      // ---- pass 1: score from the m-init, take score >= 0 as the
      // match class (the E-step under the init) ----
      def lnW(numE6: String, denE6: String): String =
        s"CAST(floor(ln(CAST($numE6 AS DOUBLE) / CAST($denE6 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
      def scoreExpr(mOf: String => String): String =
        FsFieldKeys
          .map(k =>
            s"""CASE WHEN g_$k = 1 THEN ${lnW(mOf(k), s"u_$k")}
                ELSE ${lnW(s"(1000000 - ${mOf(k)})", s"(1000000 - u_$k)")} END""")
          .mkString(" + ")
      val pass1 = gammas
        .crossJoin(broadcast(uE6))
        .withColumn("score1", expr(scoreExpr(_ => FsMInitE6.toString)))
      // ---- M-step: m_k = smoothed agreement rate in the match class ----
      val m = pass1
        .filter(col("score1") >= 0)
        .agg(
          count(lit(1)).as("n_m"),
          sum("g_prefix").as("a_prefix"),
          sum("g_len").as("a_len"),
          sum("g_last").as("a_last"),
          sum("g_head").as("a_head"))
        .select(
          FsFieldKeys.map(k =>
            expr(s"CAST((a_$k + 1) * 1000000 div (n_m + 2) AS BIGINT)").as(s"m_$k")): _*)
      // ---- final score under (m, u); three-way decision ----
      val out = gammas
        .crossJoin(broadcast(uE6))
        .crossJoin(broadcast(m))
        .withColumn("score_e6", expr(scoreExpr(k => s"m_$k")))
        .select(
          col("doc_a"),
          col("doc_b"),
          expr("""concat(CAST(g_prefix AS STRING), CAST(g_len AS STRING),
                         CAST(g_last AS STRING), CAST(g_head AS STRING))""").as("gamma"),
          expr("g_prefix + g_len + g_last + g_head").as("n_agree"),
          col("score_e6"),
          when(col("score_e6") >= 0, "match")
            .when(col("score_e6") >= FsPossibleFloorE6, "possible_match")
            .otherwise("non_match")
            .as("decision"))
      (out, Seq.empty)
    }

  /** #424 Linkage scorecard (§15.4): [[fsLinkage]]'s decisions against
    * the planted truth — per decision class, how many pairs landed
    * there, how many are planted (a, a+1M) dups, that class's share
    * of all planted pairs (the match row's share IS the linkage
    * recall) and its planted purity (the match row's IS precision —
    * on this corpus the only true links are the planted ones).
    */
  def fsLinkageEval(spark: SparkSession, dir: String): DataFrame = {
    val scored = fsLinkage(spark, dir)
    val planted = Tables
      .documents(spark, dir)
      .filter(col("doc_id") % NearDupEvery === 0)
      .select(col("doc_id").as("doc_a"), (col("doc_id") + NearDupOffset).as("doc_b"))
    val tot = planted.agg(count(lit(1)).as("planted_total"))
    scored
      .join(planted.withColumn("is_planted", lit(1L)), Seq("doc_a", "doc_b"), "left")
      .na
      .fill(0L, Seq("is_planted"))
      .groupBy("decision")
      .agg(count(lit(1)).as("n_pairs"), sum("is_planted").as("n_planted"))
      .crossJoin(broadcast(tot))
      .select(
        col("decision"),
        col("n_pairs"),
        col("n_planted"),
        col("planted_total"),
        expr("CAST(n_planted * 1000000 div planted_total AS BIGINT)").as("planted_share_e6"),
        expr("CAST(n_planted * 1000000 div n_pairs AS BIGINT)").as("purity_e6"))
  }

  def powE6(base: String, p: Int): String =
    (2 to p).foldLeft(base)((acc, _) => s"(($acc) * ($base) div 1000000)")

  /** Grid resolution of [[scurveTable]] — shared with its oracle. */
  val ScurvePoints = 20

  /** #298 LSH band/row S-curve table: for Jaccard similarity s on an
    * e6 grid, the banding scheme's candidate probability
    * 1 − (1 − s^r)^b at the OPERATOR'S OWN (b, r) =
    * ([[MinhashBands]], [[MinhashRowsPerBand]]) — the tuning table
    * that justifies the banding choice (where the curve's jump sits
    * is the similarity threshold the dedup chain effectively
    * enforces; a reviewer reads this table before trusting #23's
    * recall). All arithmetic is truncating e6 products — each
    * truncation loses < 10⁻⁶ and is replayed bit-identically by the
    * oracle, so this is a hashable CONTRACT, not a float
    * approximation. 21 rows from a range — no data scan at all.
    */
  def scurveTable(spark: SparkSession, nPoints: Int = ScurvePoints): DataFrame = {
    val step = 1000000L / nPoints
    val sr = powE6("s_e6", MinhashRowsPerBand)
    spark
      .range(0, nPoints + 1)
      .select((col("id") * step).as("s_e6"))
      .withColumn("p_band_e6", expr(sr))
      .withColumn(
        "p_candidate_e6",
        expr(s"1000000 - ${powE6("(1000000 - p_band_e6)", MinhashBands)}"))
  }

  /** Banding-advisor contract constants: the Jaccard design threshold
    * (e6) and the (bands, rows) divisor pairs of the 32-hash
    * signature — shared with the oracle.
    */
  val BandingTauE6 = 500000L
  val BandingConfigs: Seq[(Int, Int)] =
    Seq((1, 32), (2, 16), (4, 8), (8, 4), (16, 2), (32, 1))

  /** #389 MinHash banding advisor: for every (b, r) factorization of
    * the 32-hash signature, the S-curve evaluated on the #298 e6 grid
    * — candidate probability AT the design threshold
    * [[BandingTauE6]], the false-positive area (Σ p(s) below τ — the
    * verification work wasted on non-dups under a uniform similarity
    * prior) and the false-negative area (Σ (1−p(s)) at/above τ — the
    * dups the bucketing never pairs), and the advisor's pick: the
    * config minimizing FP + FN (smallest b on ties). #298 plots the
    * curve the PRODUCTION config (8, 4) commits to; this is the table
    * that justifies choosing it — the step a 100 TB dedup owner runs
    * BEFORE burning a cluster-day on the wrong banding. Same
    * truncating-e6 power arithmetic as #298 ([[powE6]] — a hashable
    * contract, not a float approximation); the pick is a pure
    * aggregate compare (min over an area·64+b key — no window); 6
    * rows from a range, no data scan.
    */
  def bandingAdvisor(spark: SparkSession, nPoints: Int = ScurvePoints): DataFrame = {
    val step = 1000000L / nPoints
    val grid = spark.range(0, nPoints + 1).select((col("id") * step).as("s_e6"))
    val perConfig = BandingConfigs.map { case (b, r) =>
      grid
        .withColumn("p_band_e6", expr(powE6("s_e6", r)))
        .withColumn(
          "p_cand_e6",
          expr(s"1000000 - ${powE6("(1000000 - p_band_e6)", b)}"))
        .select(
          lit(b.toLong).as("b"),
          lit(r.toLong).as("r"),
          col("s_e6"),
          col("p_cand_e6"))
    }
    val curves = perConfig.reduce(_.unionAll(_))
    val areas = curves
      .groupBy("b", "r")
      .agg(
        max(when(col("s_e6") === lit(BandingTauE6), col("p_cand_e6")))
          .as("p_at_tau_e6"),
        expr(s"""CAST(sum(CASE WHEN s_e6 < $BandingTauE6
                          THEN p_cand_e6 * $step ELSE 0 END) div 1000000 AS BIGINT)""")
          .as("fp_area_e6"),
        expr(s"""CAST(sum(CASE WHEN s_e6 >= $BandingTauE6
                          THEN (1000000 - p_cand_e6) * $step ELSE 0 END) div 1000000
                 AS BIGINT)""").as("fn_area_e6"))
      .withColumn("total_e6", col("fp_area_e6") + col("fn_area_e6"))
    val best = areas.agg(min(expr("total_e6 * 64 + b")).as("best_key"))
    areas
      .crossJoin(broadcast(best))
      .select(
        col("b"),
        col("r"),
        col("p_at_tau_e6"),
        col("fp_area_e6"),
        col("fn_area_e6"),
        col("total_e6"),
        (expr("total_e6 * 64 + b") === col("best_key")).cast("long").as("is_best"))
  }

  /** #373 Cross-source duplication matrix: which sources duplicate
    * WHICH — for every source pair (diagonal included), the number of
    * near-dup clusters where both sides appear and the exact count of
    * duplicate PAIRS crossing that boundary (off-diagonal n_a·n_b per
    * shared cluster; within-source C(n,2)). #141's per-source report
    * says THAT a source recycles content; the matrix says FROM WHOM —
    * a vendor reselling another feed, a crawler re-crawling a mirror,
    * and in-source churn all look identical in the scalar rate but
    * land in different cells here. Composes [[clusters]] wholesale +
    * the same planted-copy source map as #141 (NearDupEvery /
    * NearDupOffset shared constants, so attribution cannot drift);
    * one (cluster, source) aggregate, then a within-cluster source
    * self-join — fan-out bounded by (distinct sources)² per cluster,
    * never cluster size² — and one ≤ sources² fold. All counts exact
    * BIGINTs; pair counts positive so div ≡ //.
    */
  def sourceMatrix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val src = docs.unionAll(
      docs
        .filter(col("doc_id") % NearDupEvery === 0)
        .select((col("doc_id") + NearDupOffset).as("doc_id"), col("source")))
    val cs = clusters(spark, dir)
      .join(src, "doc_id")
      .groupBy(col("cluster_id"), col("source"))
      .agg(count(lit(1)).as("n"))
    val off = cs
      .select(col("cluster_id"), col("source").as("source_a"), col("n").as("n_a"))
      .join(
        cs.select(col("cluster_id"), col("source").as("source_b"), col("n").as("n_b")),
        "cluster_id")
      .filter(col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"), (col("n_a") * col("n_b")).as("pairs"))
    val diag = cs
      .filter(col("n") >= 2)
      .select(
        col("source").as("source_a"),
        col("source").as("source_b"),
        expr("n * (n - 1) div 2").as("pairs"))
    off
      .unionAll(diag)
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_clusters"), sum("pairs").as("dup_pairs"))
  }
}
