package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text analysis for LLM-training-data pipelines, over the `documents`
  * table. Everything here is pure `functions._` column expressions —
  * no UDFs, fully inside WholeStageCodegen, zero shuffles (per-row
  * scoring embarrassingly parallel at 100 TB).
  *
  * Regex discipline: only ASCII-safe constructs that mean the same
  * thing in Java regex (Spark) and RE2 (DuckDB oracle): `\s \w`,
  * `\p{Punct}` ↔ `[[:punct:]]`.
  */
object TextOps {

  /** Whitespace tokens of the normalized text (empty text → 0 tokens). */
  private def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(c)), "\\s+"))

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** #30 Token counting: whitespace tokens + a BPE-ish segmentation
    * (maximal `\w+` runs and single non-word-non-space chars — the
    * shape of a byte-pair pre-tokenizer's coarse split).
    */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"), lit(0)))
          .cast("long")
          .as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars_actual")
      )

  /** #154 Document chunking with overlap: slide a `win`-token window
    * by `stride` tokens (overlap = win − stride) — the chunker that
    * feeds RAG indexing and fixed-context pretraining when documents
    * must not be split mid-context. Window starts are the multiples of
    * `stride` below the token count (an empty doc yields one empty
    * chunk row, so the output still covers the corpus), the final
    * window may be short, and `chunk_idx = start div stride` so the
    * index needs no ordinal explode. Purely per-row — an explode with
    * bounded fan-out (≤ n_tok/stride per doc) and ZERO shuffles: at
    * 100 TB this is a map-only stage whose output feeds the packers
    * (#70/#75) and the ANN indexers downstream.
    */
  def chunkDocs(spark: SparkSession, dir: String, win: Int = 32, stride: Int = 24): DataFrame = {
    require(stride > 0 && win >= stride, "need stride >= 1 and win >= stride")
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("tok"))
      .withColumn(
        "start_tok",
        explode(sequence(lit(0), greatest(size(col("tok")) - 1, lit(0)), lit(stride))))
      .select(
        col("doc_id"),
        expr(s"CAST(start_tok div $stride AS BIGINT)").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        size(slice(col("tok"), col("start_tok") + 1, lit(win))).cast("long").as("n_tok"),
        concat_ws(" ", slice(col("tok"), col("start_tok") + 1, lit(win))).as("chunk"))
  }

  /** #31 Quality scoring: length/punctuation/stopword signals + a
    * composite score — the heuristic pre-filter stage of a training-
    * data pipeline.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    qualityScoreOf(Tables.documents(spark, dir))

  /** Frame-based form of [[qualityScore]] so the #421 scorecard can
    * run the IDENTICAL signal over an augmented (planted) corpus —
    * scoring a copy of the logic would validate nothing.
    */
  private[operators] def qualityScoreOf(docs: DataFrame): DataFrame = {
    // aliased once: referencing the tokens expression from multiple
    // ratio columns would otherwise re-tokenize per reference
    val t = col("tok")
    val nTok = size(t).cast("double")
    val nChars = length(col("text")).cast("double")
    val nPunct = (length(col("text")) -
      length(regexp_replace(col("text"), "\\p{Punct}", ""))).cast("double")
    val stops = array(stopwords.map(lit): _*)
    val nStop = size(filter(t, x => array_contains(stops, x))).cast("double")
    val punctRatio = when(nChars === 0, 0.0).otherwise(nPunct / nChars)
    val stopRatio = when(nTok === 0, 0.0).otherwise(nStop / nTok)
    val avgTokLen = when(nTok === 0, 0.0)
      .otherwise(length(regexp_replace(col("text"), "\\s", "")).cast("double") / nTok)
    docs
      .withColumn("tok", tokens(col("text")))
      .select(
        col("doc_id"),
        nTok.cast("long").as("n_tokens"),
        round(punctRatio, 4).as("punct_ratio"),
        round(stopRatio, 4).as("stopword_ratio"),
        round(avgTokLen, 4).as("avg_token_len"),
        round(least(lit(1.0), nTok / 100.0) * (lit(1.0) - punctRatio), 4).as("quality_score")
      )
  }

  /** #151 Curriculum ordering: the corpus laid out easy→hard for
    * staged pretraining — exact quality DECILE (from the #31
    * composite score on the e4 integer grid) plus a deterministic
    * shuffle WITHIN each decile (salted-hash order, the #95 layout),
    * so a loader that walks deciles in order and shards round-robin
    * inside each sees quality-monotone batches with no intra-stage
    * ordering bias. The global quality rank is built hierarchically
    * (monotone range-shard on q_e4 → per-shard rank + offsets —
    * bit-identical to a global row_number, no single-partition data
    * window, the #86 construction); the within-decile windows
    * partition on (decile, shard), bounded at corpus/nShards/10.
    */
  def curriculum(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val rankShards = 8
    val t = col("tok")
    val nTok = size(t).cast("double")
    val nChars = length(col("text")).cast("double")
    val nPunct = (length(col("text")) -
      length(regexp_replace(col("text"), "\\p{Punct}", ""))).cast("double")
    val punctRatio = when(nChars === 0, 0.0).otherwise(nPunct / nChars)
    val qE4 = floor(
      least(lit(1.0), nTok / 100.0) * (lit(1.0) - punctRatio) * lit(10000.0) + lit(0.5))
      .cast("long")
    val docs = Tables
      .documents(spark, dir)
      .withColumn("tok", tokens(col("text")))
      .select(col("doc_id"), qE4.as("q_e4"))
    // hierarchical global rank on (q_e4, doc_id): q_e4 ∈ [0, 10000],
    // so a fixed monotone split of that range shards without a pass
    val sharded = docs.withColumn("rshard", expr(s"(q_e4 * $rankShards) div 10001"))
    val wLocal = Window.partitionBy("rshard").orderBy("q_e4", "doc_id")
    val local = sharded.withColumn("rn", row_number().over(wLocal).cast("long"))
    val counts = sharded.groupBy("rshard").agg(count(lit(1)).as("c"))
    val wShard = Window.orderBy("rshard").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("off", coalesce(sum("c").over(wShard), lit(0L)))
      .select(col("rshard"), col("off"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val ranked = local
      .join(broadcast(offsets), "rshard")
      .crossJoin(broadcast(total))
      .select(
        col("doc_id"),
        col("q_e4"),
        expr("((off + rn - 1) * 10) div n_docs").as("decile"),
        graft.operators.Dedup.hash60(concat(lit("graft-curr-1:"), col("doc_id"))).as("ord"))
    val wPos = Window.partitionBy("decile", "shard").orderBy("ord", "doc_id")
    ranked
      .withColumn("shard", pmod(col("ord"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(wPos).cast("long"))
      .select(col("doc_id"), col("q_e4"), col("decile"), col("shard"), col("pos"))
  }

  /** #172 Top-p (nucleus) corpus selection per source: keep the
    * smallest highest-quality prefix of each source whose TOKEN mass
    * reaches a fraction p of the source total — "the best 90% of
    * tokens per source", the mass-targeted counterpart of the
    * count-targeted per-source cap (#76): a mixing pipeline budgets
    * tokens, not documents, and a quality-ordered nucleus is how the
    * trash tail gets dropped without distorting source token budgets.
    *
    * All-integer: the #31 composite quality on the e4 grid orders docs
    * (q_e4 desc, doc_id), token masses are exact BIGINTs, and the cut
    * is the weighted-threshold construction (#160/#168): selected =
    * rows whose running-mass interval starts below T = ⌈p·W⌉ =
    * (num·W + den − 1) div den. Output is one row per source with the
    * selection accounting and the quality floor of the retained
    * nucleus. Windows partition BY SOURCE — bounded, no global
    * ordering; the per-source cumsum takes the hierarchical
    * construction (#118) if a source outgrows a partition.
    */
  def topPSelect(
      spark: SparkSession,
      dir: String,
      num: Int = 9,
      den: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = col("tok")
    val nChars = length(col("text")).cast("double")
    val nPunct = (length(col("text")) -
      length(regexp_replace(col("text"), "\\p{Punct}", ""))).cast("double")
    val punctRatio = when(nChars === 0, 0.0).otherwise(nPunct / nChars)
    val qE4 = floor(
      least(lit(1.0), size(t).cast("double") / 100.0) * (lit(1.0) - punctRatio) *
        lit(10000.0) + lit(0.5)).cast("long")
    val docs = Tables
      .documents(spark, dir)
      .withColumn("tok", tokens(col("text")))
      .select(
        col("doc_id"),
        col("source"),
        size(t).cast("long").as("ntok"),
        qE4.as("q_e4"))
    val ord = Window.partitionBy("source").orderBy(col("q_e4").desc, col("doc_id"))
    docs
      .withColumn(
        "cum",
        sum("ntok").over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("wtot", sum("ntok").over(Window.partitionBy("source")))
      .withColumn("ndocs", count(lit(1)).over(Window.partitionBy("source")))
      .filter(col("cum") - col("ntok") < expr(s"($num * wtot + $den - 1) div $den"))
      .groupBy("source")
      .agg(
        max("ndocs").as("n_docs"),
        count(lit(1)).as("n_sel"),
        max("wtot").as("tok_total"),
        sum("ntok").as("tok_sel"),
        min("q_e4").as("cut_q_e4"))
  }

  /** #32 Language ID: stopword-profile heuristic — score each language
    * by how many of its marker words appear; argmax wins, 'und' when
    * nothing matches. Rows-only (the heuristic, not the label, is under
    * test: the synthetic corpus is English-lexicon word salad).
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val markers: Map[String, Seq[String]] = Map(
      "en" -> Seq("the", "a", "of", "and", "is", "to"),
      "de" -> Seq("der", "die", "das", "und", "ist", "zu"),
      "fr" -> Seq("le", "la", "les", "et", "est", "de"),
      "es" -> Seq("el", "la", "los", "y", "es", "de"),
      "zh" -> Seq("的", "了", "是", "在", "和", "有")
    )
    val t = col("tok") // aliased once — 5 language scores reference it
    val scores = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(filter(t, x => array_contains(array(words.map(lit): _*), x))).as("score"),
        lit(lang).as("lang")
      )
    }
    // argmax by (score, lang) — deterministic tiebreak on lang name
    val best = array_max(array(scores: _*))
    Tables
      .documents(spark, dir)
      .withColumn("tok", tokens(col("text")))
      .select(
        col("doc_id"),
        col("lang").as("label_lang"),
        when(best.getField("score") > 0, best.getField("lang")).otherwise("und").as("pred_lang"),
        best.getField("score").cast("long").as("marker_hits")
      )
  }

  /** #107 Language-ID confusion audit: the (label, prediction) count
    * matrix of [[langId]] against the corpus's ground-truth `lang`
    * column — the accuracy report every heuristic classifier needs
    * before it gates a 100 TB corpus. One aggregation over the
    * classifier's output; the matrix is at most |langs|² rows.
    */
  def langConfusion(spark: SparkSession, dir: String): DataFrame =
    langId(spark, dir)
      .groupBy("label_lang", "pred_lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("is_correct", (col("label_lang") === col("pred_lang")).cast("int"))

  /** #67 Repetition-based quality filter (the Gopher/C4-family "mostly
    * repeated content" checks): per doc, the duplicate-trigram fraction
    * (1 − unique/total trigrams) and the most-frequent-token share of
    * all tokens; a doc is flagged repetitive past 20% on either. The
    * trigram stats are pure per-row array expressions; the top-token
    * share is one explode + (doc, token) aggregation — linear shuffle,
    * the standard shape at 100 TB.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    repetitionOf(Tables.documents(spark, dir))

  /** Frame-based form of [[repetition]] — see [[qualityScoreOf]]. */
  private[operators] def repetitionOf(docs: DataFrame): DataFrame = {
    val d = docs
      .withColumn("tok", Dedup.toks(col("text")))
      .withColumn("tri", Dedup.shingles(col("tok")))
    val base = d.select(
      col("doc_id"),
      size(col("tok")).cast("long").as("n_tokens"),
      size(col("tri")).cast("long").as("n_trigrams"),
      size(array_distinct(col("tri"))).cast("long").as("n_uniq"))
    val top = d
      .select(col("doc_id"), explode(col("tok")).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max("c").as("top_count"))
    val dupFrac = lit(1.0) - col("n_uniq").cast("double") / col("n_trigrams")
    val topRatio = col("top_count").cast("double") / col("n_tokens")
    base
      .join(top, "doc_id")
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(dupFrac, 4).as("dup_trigram_frac"),
        round(topRatio, 4).as("top_token_ratio"),
        (dupFrac > 0.2 || topRatio > 0.2).cast("int").as("is_repetitive"))
  }

  /** #79 PII redaction: scrub emails, IPv4 addresses, and phone
    * numbers from the corpus — counts per category plus the redacted
    * text (what a compliant training pipeline actually emits). Pure
    * per-row regexp expressions: embarrassingly parallel, zero
    * shuffles, fully codegen'd.
    *
    * The synthetic corpus contains no PII, so the query PLANTS a
    * deterministic PII suffix on a doc_id schedule (every 3rd doc an
    * email, every 5th an IP, every 7th a phone) — verification
    * scaffolding, clearly separated in [[plantPii]]; the DuckDB
    * oracle replays the same injection, so the hash compare validates
    * that the redaction regexes mean the same thing in both engines.
    * Regexes are RE2-safe (no backrefs/lookaround).
    */
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val PhoneRe = "\\+\\d{2}-\\d{3}-\\d{4}"

  private def plantPii(text: Column, id: Column): Column =
    concat(
      text,
      when(id % 3 === 0, concat(lit(" contact user"), id, lit("@example.com")))
        .otherwise(lit("")),
      when(id % 5 === 0, concat(lit(" host 10.0."), id % 256, lit(".17")))
        .otherwise(lit("")),
      when(id % 7 === 0, concat(lit(" call +49-555-0"), lpad((id % 1000).cast("string"), 3, "0")))
        .otherwise(lit("")))

  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), plantPii(col("text"), col("doc_id")).as("planted"))
      .select(
        col("doc_id"),
        regexp_count(col("planted"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("planted"), lit(Ipv4Re)).cast("long").as("n_ips"),
        regexp_count(col("planted"), lit(PhoneRe)).cast("long").as("n_phones"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("planted"), EmailRe, "<EMAIL>"),
            Ipv4Re,
            "<IP>"),
          PhoneRe,
          "<PHONE>").as("redacted"))
      .withColumn(
        "has_pii",
        (col("n_emails") + col("n_ips") + col("n_phones") > 0).cast("int"))

  /** #81 Unigram LM log-prob quality score (the CCNet-style LM filter
    * with a unigram model standing in for the LM): fit p(w) =
    * count(w)/N on the corpus itself, then score each doc by its
    * average token surprisal −log2 p(w). Low = common fluent language,
    * high = rare-token junk; pipelines bucket the corpus into
    * head/middle/tail on this score.
    *
    * Shape: one tokenize/explode pass feeding BOTH the vocab fit and
    * the per-doc score (same exchange-reuse trick as
    * [[contamination]]); the vocab table scales with vocabulary, not
    * corpus, so AQE broadcasts it (no hint). Using
    * avg(−log2 p) = log2 N − avg(log2 c) keeps the scalar N out of
    * the per-token join: it's applied once per DOC via a broadcast
    * 1-row cross join.
    */
  def unigramLogProb(spark: SparkSession, dir: String): DataFrame = {
    val exploded = Tables
      .documents(spark, dir)
      .select(col("doc_id"), explode(Dedup.toks(col("text"))).as("w"))
    val vocab = exploded.groupBy("w").agg(count(lit(1)).as("c"))
    val totalN = vocab.agg(sum("c").as("n_total"))
    val perDoc = exploded
      .join(vocab, "w")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        avg(log2(col("c"))).as("avg_log2_c"))
    perDoc
      .crossJoin(broadcast(totalN))
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(log2(col("n_total")) - col("avg_log2_c"), 4).as("avg_surprisal"))
      .withColumn("is_tail", (col("avg_surprisal") > 8.0).cast("int"))
  }

  /** #68 Benchmark decontamination: flag training docs whose 3-gram
    * hash sets overlap an evaluation benchmark (here: every 97th doc
    * stands in for the benchmark corpus). Shingle sets use the
    * engine-portable [[Dedup.hash60]]; membership is one left-semi
    * join on the hash — linear shuffle, and the benchmark side is
    * small enough that AQE broadcasts it (no hint: benchmark size
    * scales with the eval suite, not the corpus).
    */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark) // hash60 kernel
    // ONE tokenize/shingle/hash pass: both consumers of `exploded`
    // (per-hash benchmark flag, per-doc membership probe) shuffle on
    // `h` with identical subplans, so ReuseExchange materializes the
    // md5 pipeline once — a naive hs-array carry + join-back shape
    // recomputed it 3× (measured 10 s → 2.9 s at sf0.1)
    val exploded = Tables
      .documents(spark, dir)
      .withColumn("tok", Dedup.toks(col("text")))
      .select(
        col("doc_id"),
        explode(array_distinct(transform(Dedup.shingles(col("tok")), s => Dedup.hash60(s))))
          .as("h"))
    val byHash = exploded
      .groupBy("h")
      .agg(max((col("doc_id") % 97 === 0).cast("int")).as("in_bench"))
    val perDoc = exploded
      .join(byHash, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), sum("in_bench").as("n_contaminated"))
    val frac = col("n_contaminated").cast("double") / col("n_shingles")
    perDoc.select(
      col("doc_id"),
      col("n_shingles"),
      col("n_contaminated"),
      round(frac, 4).as("contamination_frac"),
      (col("doc_id") % 97 === 0).cast("int").as("is_benchmark"),
      (frac >= 0.5).cast("int").as("is_contaminated"))
  }

  /** #96 Corpus filter pipeline: the composed C4/Gopher-style keep/drop
    * decision — every heuristic filter stage ([[qualityScore]],
    * [[repetition]], [[contamination]], [[langId]]) joined into ONE
    * verdict per doc with per-rule flags and a first-failing `reason`
    * code. This is the operator a pipeline owner actually runs: the
    * signals individually are diagnostics; the join of them is the
    * training set.
    *
    * Precedence (drop reasons, most categorical first): `benchmark`
    * (eval docs are never training data), `contaminated` (≥50%
    * benchmark-shingle overlap), `too_short`, `low_quality`,
    * `repetitive`, `lang_unknown`; else `keep`.
    *
    * Scale shape: four signal subplans (each already linear — see
    * their docs) joined on `doc_id`; the joins shuffle on the same
    * key, so AQE coalesces them into co-partitioned exchanges. No new
    * shuffle class is introduced by composition.
    */
  def filterPipeline(
      spark: SparkSession,
      dir: String,
      minTokens: Int = 15,
      minQuality: Double = 0.2): DataFrame = {
    val q = qualityScore(spark, dir).select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val r = repetition(spark, dir).select(col("doc_id"), col("is_repetitive"))
    val c = contamination(spark, dir)
      .select(col("doc_id"), col("is_contaminated"), col("is_benchmark"))
    val l = langId(spark, dir).select(col("doc_id"), col("pred_lang"))
    val reason = when(col("is_benchmark") === 1, "benchmark")
      .when(col("is_contaminated") === 1, "contaminated")
      .when(col("n_tokens") < minTokens, "too_short")
      .when(col("quality_score") < minQuality, "low_quality")
      .when(col("is_repetitive") === 1, "repetitive")
      .when(col("pred_lang") === "und", "lang_unknown")
      .otherwise("keep")
    q.join(r, "doc_id")
      .join(c, "doc_id")
      .join(l, "doc_id")
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("quality_score"),
        col("is_repetitive"),
        col("is_contaminated"),
        col("is_benchmark"),
        col("pred_lang"),
        reason.as("reason"))
      .withColumn("keep", (col("reason") === "keep").cast("int"))
  }

  /** #117 Line-level boilerplate removal (the CCNet/RefinedWeb scrub):
    * drop every text block that appears in at least `dfThreshold`
    * DISTINCT documents — headers, footers, cookie banners, nav bars.
    * Unlike [[Dedup.spans]] (which keeps the globally-first occurrence
    * of a repeated block), boilerplate removal drops ALL occurrences:
    * a block shared by many documents is template chrome, not content,
    * and the first copy is as worthless as the last. "Lines" are
    * non-overlapping `blockLen`-token blocks (this corpus has no
    * newlines); ragged tails under 3 tokens never participate.
    *
    * Scale shape: explode is linear (n_tokens/blockLen rows per doc);
    * the df table and the probe join BOTH shuffle the same exploded
    * subplan on the block hash, so ReuseExchange materializes the
    * tokenize/explode once (the [[contamination]] lesson — the df
    * aggregation counts distinct docs per hash with a map-side
    * partial); reassembly is one shuffle back on doc_id. No pairwise
    * comparison anywhere. At 100 TB the df table is vocabulary-sized
    * (distinct blocks), and the df≥threshold slice of it — the only
    * part that changes the output — is tiny and AQE-broadcastable.
    */
  def boilerplate(
      spark: SparkSession,
      dir: String,
      blockLen: Int = 6,
      dfThreshold: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val nBlocks = expr(s"(size(tok) + ${blockLen - 1}) div $blockLen").cast("int")
    val blocks = Tables
      .documents(spark, dir)
      .select(col("doc_id"), Dedup.toks(col("text")).as("tok"))
      .select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(1), nBlocks),
            i => array_join(slice(col("tok"), (i - lit(1)) * blockLen + 1, lit(blockLen)), " "))))
      .select(col("doc_id"), col("pos").cast("long").as("idx"), col("col").as("block"))
      .withColumn("participates", size(split(col("block"), " ")) >= 3)
      .withColumn("h", Dedup.hash60(col("block")))
    // df over ALL blocks (non-participating ones counted as null →
    // excluded) so both join sides shuffle the identical subplan
    val dfTable = blocks
      .groupBy("h")
      .agg(count_distinct(when(col("participates"), col("doc_id"))).as("df"))
    blocks
      .join(dfTable, Seq("h"))
      .withColumn("boiler", col("participates") && col("df") >= dfThreshold)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(col("boiler").cast("long")).as("n_boiler"),
        array_join(
          transform(
            array_sort(collect_list(when(!col("boiler"), struct(col("idx"), col("block"))))),
            x => x.getField("block")),
          " ").as("cleaned_text"))
  }

  /** #291 Readability scoring: per document, the Flesch reading-ease
    * components — words, sentences ([.!?]+ runs, floored at 1),
    * syllable proxy (vowel-group runs [aeiouy]+, the standard
    * dictionary-free estimator) — and the score itself on the e3
    * integer grid: flesch_e3 = 206835 − 1015·w div s − 84600·sy div
    * w. The classic pipeline quality gate beside #31's heuristic
    * score (#31 mixes length/punct/stopword signals; this is the
    * standardized scale review boards quote). Word counting reuses
    * #30's whitespace convention verbatim; pattern counting the #79
    * regexp_count ↔ len(regexp_extract_all) parity. The synthetic
    * corpus carries no sentence punctuation, so the sentence floor
    * engages corpus-wide there (documented; the regexp path is live
    * and spec-planted punctuation exercises it) — scores still
    * separate docs through the words and syllables-per-word terms.
    * Pure per-row map over one scan: no shuffle at all.
    */
  def readability(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        when(length(trim(col("text"))) === 0, 0L)
          .otherwise(size(split(lower(trim(col("text"))), "\\s+")).cast("long"))
          .as("n_words"),
        greatest(regexp_count(col("text"), lit("[.!?]+")).cast("long"), lit(1L))
          .as("n_sentences"),
        greatest(regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long"), lit(1L))
          .as("n_syllables"))
      .select(
        col("doc_id"),
        col("n_words"),
        col("n_sentences"),
        col("n_syllables"),
        expr("n_words * 1000 div n_sentences").as("wps_e3"),
        expr("n_syllables * 1000 div greatest(n_words, 1)").as("spw_e3"),
        expr("""206835 - 1015 * n_words div n_sentences
                 - 84600 * n_syllables div greatest(n_words, 1)""").as("flesch_e3"))

  /** #345 Mean Segmental TTR (MSTTR-100): lexical diversity as the
    * mean type/token ratio over consecutive FULL 100-token segments —
    * the length-robust diversity standard (raw TTR falls with doc
    * length by Heaps' law (#272), so long docs always look "less
    * diverse"; fixed segments remove the length confound that #307's
    * corpus-level Simpson also inherits). Segment distinct counts are
    * computed INSIDE the token array (array_distinct over slices — no
    * per-token explode), msttr_e6 = Σdistinct·10⁶ div (seg·n_segs),
    * one truncation per doc. Docs under one full segment are excluded
    * by contract. Segment length 25 (not the literature's 100): the
    * synthetic docs run 10–99 tokens, and MSTTR only standardizes
    * when most docs hold ≥ 1 full segment — the parameter, not the
    * operator, is corpus-tuned. Linear, no windows, no shuffle
    * beyond the doc scan.
    */
  def msttr(spark: SparkSession, dir: String, segLen: Int = 25): DataFrame = {
    val t = col("tok")
    Tables
      .documents(spark, dir)
      .withColumn("tok", graft.operators.Dedup.toks(col("text")))
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("n_segments", expr(s"n_tokens div $segLen"))
      .filter(col("n_segments") >= 1)
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_segments"),
        explode(sequence(lit(0L), col("n_segments") - 1)).as("seg"),
        col("tok"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_segments"),
        expr(s"CAST(size(array_distinct(slice(tok, CAST(seg * $segLen + 1 AS INT), $segLen))) AS BIGINT)")
          .as("d_cnt"))
      .groupBy("doc_id", "n_tokens", "n_segments")
      .agg(sum("d_cnt").as("dsum"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_segments"),
        expr(s"dsum * 1000000 div ($segLen * n_segments)").as("msttr_e6"))
  }

  /** #421 Quality-filter scorecard (the §15.4 invariant applied to the
    * CONTENT filters #31/#67 and the #96 pipeline's thresholds): plant
    * three deterministic degenerate-document families — token-loop
    * spam ("repeat": the source doc's first 3 tokens looped 40×),
    * truncation stubs ("short": 2 tokens), and symbol noise ("symbol":
    * a punctuation run) — beside the untouched corpus, run the
    * IDENTICAL quality/repetition signals ([[qualityScoreOf]] /
    * [[repetitionOf]] — the filters themselves, not a copy) with the
    * #96 pipeline's thresholds and precedence, and report per family
    * the catch rate and which rule fired; the `clean` row is the
    * measured false-positive rate on genuine documents. (The #68
    * contamination and lang-id filters have their own planted probes —
    * this scorecard covers the three content rules.)
    *
    * Scale shape: planting is a 2%-of-corpus projection (doc_id ≡ 1
    * mod 50), the signals are the linear per-row/explode shapes they
    * already are, and the fold is one ≤4-row aggregation.
    */
  def filterEval(
      spark: SparkSession,
      dir: String,
      minTokens: Int = 15,
      minQuality: Double = 0.2): DataFrame = {
    val base = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val srcs = base.filter(col("doc_id") % 50 === 1).withColumn("tok", Dedup.toks(col("text")))
    val planted = srcs
      .select(
        (col("doc_id") + 2000000L).as("doc_id"),
        array_join(flatten(array_repeat(slice(col("tok"), 1, 3), 40)), " ").as("text"),
        lit("planted_repeat").as("kind"))
      .unionAll(srcs.select(
        (col("doc_id") + 3000000L).as("doc_id"),
        array_join(slice(col("tok"), 1, 2), " ").as("text"),
        lit("planted_short").as("kind")))
      .unionAll(srcs.select(
        (col("doc_id") + 4000000L).as("doc_id"),
        expr("repeat('#$%&!? ', 30)").as("text"),
        lit("planted_symbol").as("kind")))
    val corpus = base
      .select(col("doc_id"), col("text"), lit("clean").as("kind"))
      .unionAll(planted)
    val q = qualityScoreOf(corpus.select("doc_id", "text"))
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val r = repetitionOf(corpus.select("doc_id", "text"))
      .select(col("doc_id"), col("is_repetitive"))
    // the #96 pipeline's content rules in its precedence order
    val reason = when(col("n_tokens") < minTokens, "too_short")
      .when(col("quality_score") < minQuality, "low_quality")
      .when(col("is_repetitive") === 1, "repetitive")
      .otherwise("keep")
    corpus
      .join(q, "doc_id")
      .join(r, "doc_id")
      .select(col("kind"), reason.as("reason"))
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_docs"),
        sum((col("reason") =!= "keep").cast("long")).as("n_caught"),
        sum((col("reason") === "too_short").cast("long")).as("n_too_short"),
        sum((col("reason") === "low_quality").cast("long")).as("n_low_quality"),
        sum((col("reason") === "repetitive").cast("long")).as("n_repetitive"))
      .select(
        col("kind"),
        col("n_docs"),
        col("n_caught"),
        expr("n_caught * 1000000 div n_docs").as("catch_rate_e6"),
        col("n_too_short"),
        col("n_low_quality"),
        col("n_repetitive"))
  }
}
