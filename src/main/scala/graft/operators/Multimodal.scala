package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Encoder row types for the mapPartitions decode stage (top-level so
  * the generated deserializer can access them).
  */
case class MmPayload(doc_id: Long, modality: String, payload: Array[Byte])
case class MmFeatures(doc_id: Long, modality: String, n_bytes: Long, features: Array[Float])

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * with typed metadata. The container has no codec libraries, so the
  * decode step is a clearly-marked deterministic stub — but the
  * Spark-side plumbing (schema, binary columns, partition-preserving
  * mapPartitions, batch shape) is real and what a production pipeline
  * would keep when swapping in a real decoder.
  */
object Multimodal {

  /** #33 Binary payload manifest: each document's bytes as an opaque
    * payload with modality + size + content hash — the catalog row a
    * 100 TB multimodal lake partitions by modality. Pure column
    * expressions; payload bytes never leave the executor.
    */
  def manifest(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video")
          .as("modality"),
        octet_length(col("text").cast("binary")).cast("long").as("byte_len"),
        md5(col("text").cast("binary")).as("content_md5")
      )

  /** #34 Decode / feature-extract plumbing: partition-preserving
    * `mapPartitions` over batches of payloads → fixed-width feature
    * vectors. The decode itself is a STUB (deterministic byte
    * statistics standing in for pixel/sample decoding — the real
    * decoder would replace `stubDecode` only); batching (64/batch)
    * mirrors how a vectorized decoder amortizes setup per batch.
    */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = manifest(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("modality"), col("text").cast("binary").as("payload"))
      .as[MmPayload]
    payloads
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          // batch-shaped: a real decoder initializes once per batch here
          batch.iterator.map { p =>
            MmFeatures(p.doc_id, p.modality, p.payload.length.toLong, stubDecode(p.payload))
          }
        }
      }
      .toDF()
  }

  /** Driver-comparable projection of [[features]]: one (doc_id, pos, f)
    * row per vector element. Arrays stay in the operator (and its
    * specs); the flat shape is what the hash-compare harness can diff
    * against a DuckDB oracle, and is also the layout a columnar store
    * would shred the vector into anyway.
    */
  def featuresFlat(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir)
      .select(
        col("doc_id"),
        col("modality"),
        col("n_bytes"),
        posexplode(col("features")).as(Seq("pos", "f_raw")))
      .select(
        col("doc_id"),
        col("modality"),
        col("n_bytes"),
        col("pos").cast("long").as("pos"),
        round(col("f_raw").cast("double"), 4).as("f"))

  /** #53 Per-modality feature statistics: distributed array
    * aggregation (posexplode → per-dimension mean → re-assembled
    * vector) over the decoded features — the monitoring/QA stage of a
    * multimodal pipeline. One exchange on (modality, dim).
    */
  def featureStats(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir)
      .select(col("modality"), posexplode(col("features")).as(Seq("pos", "x")))
      .groupBy("modality", "pos")
      .agg(avg("x").as("mu"), count(lit(1)).as("n"))
      .groupBy("modality")
      .agg(
        (max("n")).as("n_docs"),
        array_sort(collect_list(struct(col("pos"), col("mu")))).as("entries"))
      .select(
        col("modality"),
        col("n_docs"),
        expr("transform(entries, e -> round(e.mu, 4))").as("mean_features"))

  /** Driver-comparable projection of [[featureStats]]: one
    * (modality, pos, mu) row per mean-vector element.
    */
  def featureStatsFlat(spark: SparkSession, dir: String): DataFrame =
    featureStats(spark, dir)
      .select(
        col("modality"),
        col("n_docs"),
        posexplode(col("mean_features")).as(Seq("pos", "mu")))
      .select(col("modality"), col("n_docs"), col("pos").cast("long").as("pos"), col("mu"))

  /** #85 Video frame-sample scheduling: for every video payload, emit
    * the frame indices a decoder should extract — one frame every
    * `everySec` seconds of content, from per-video metadata (synthetic
    * here: 4 bytes/frame, fps 25 or 30 by doc parity). This is the
    * scheduling half of video ingestion (the decode half is the
    * [[features]] stub): pure sequence/explode column expressions, so
    * the fan-out is linear in sampled frames and fully codegen'd —
    * the shape that lets a 100 TB video lake plan decode work without
    * touching a single payload byte.
    */
  def frameSample(spark: SparkSession, dir: String, everySec: Int = 2): DataFrame =
    manifest(spark, dir)
      .filter(col("modality") === "video")
      .select(
        col("doc_id"),
        (col("byte_len") / 4).cast("long").as("n_frames"),
        (lit(25) + (col("doc_id") % 2) * 5).cast("long").as("fps"))
      // degenerate payloads (< 1 frame): Spark's sequence(0, -1, step)
      // THROWS where the oracle's range() returns no rows — filter
      // before the explode so both engines emit nothing for them
      .filter(col("n_frames") > 0)
      .select(
        col("doc_id"),
        col("n_frames"),
        col("fps"),
        explode(sequence(lit(0L), col("n_frames") - 1, col("fps") * everySec))
          .as("frame_idx"))
      .withColumn("ts_sec", round(col("frame_idx").cast("double") / col("fps"), 2))

  /** STUB decode: 8 deterministic byte-histogram moments in [0,1) —
    * stands in for image resize / audio frame-sample feature
    * extraction (codec libs absent in this environment).
    */
  private def stubDecode(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](8)
    var i = 0
    while (i < bytes.length) {
      acc(i % 8) += (bytes(i) & 0xff)
      i += 1
    }
    acc.map(a => ((a % 1000L).toFloat / 1000.0f))
  }

  /** Every [[ReencEvery]]th payload gets a "re-encoded" variant (same
    * content length, the leading block perturbed — the header/metadata
    * change a transcode makes; id offset by [[ReencOffset]]) — the
    * planted artifact the perceptual-hash stage must catch.
    */
  val ReencEvery = 6
  val ReencOffset = 3000000L

  /** #208 Cross-modal retrieval top-k: for every "image"-modality
    * item, the k nearest "audio"-modality items in the SHARED
    * embedding space (the CLIP-style aligned-encoder retrieval a
    * multimodal lake runs for caption search and pair mining; here
    * modality is the #33 manifest convention `vec_id % 3`, the
    * encoders are the stub). Both sides bucket under the SAME
    * hyperplane family — valid because cross-modal alignment means
    * one space — so the probe is a bucket equi-join exactly like
    * same-modality ANN (#28): candidate volume O(queries ·
    * TargetBucket · tables), never queries × corpus; bits derived
    * from the AUDIO corpus size.
    */
  def crossModalTopK(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val vecs = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val audioCount = vecs.filter(col("vec_id") % 3 === 1).count()
    val bits = Similarity.numPlanes(audioCount)
    val corpus = Similarity.bandedBuckets(
      vecs.filter(col("vec_id") % 3 === 1), "embedding", bits)
    // cross-modal neighbors sit near hyperplane boundaries far more
    // often than same-item ANN, so the query side multi-probes its
    // bucket plus all 1-bit flips (the #60 shape) — still
    // bucket-bounded, ~(bits+1)× candidates
    val probes = (0 until bits).map(p => col("bucket").bitwiseXOR(lit(1 << p)))
    val queries = Similarity
      .bandedBuckets(
        vecs
          .filter(col("vec_id") % 3 === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
        "q_emb",
        bits)
      .withColumn("bucket", explode(array(col("bucket") +: probes: _*)))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    corpus
      .join(queries, Seq("t", "bucket"))
      .select(
        col("query_id"),
        col("vec_id"),
        round(expr("cosine_sim(embedding, q_emb)"), 6).as("cos"))
      .distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** #199 Perceptual-hash near-dup over binary payloads: a 60-bit
    * block-structured content hash — each payload is first NORMALIZED
    * to 15 equal-width blocks of its OWN length (the resolution
    * normalization a real pHash gets from the 32×32 resize, so hashes
    * are comparable across payload sizes), each block contributing one
    * 4-bit lane; local edits flip only the lanes they touch (the
    * per-block hash is the stub to swap for a DCT when codecs exist).
    * Banded 4×15 bits for LSH candidate generation, exact Hamming
    * verify (`bit_count(xor)` ≤ 12 of 60) on candidates only. The
    * multimodal twin of text MinHash banding: shuffle = 4 band rows
    * per payload, NEVER all-pairs; Hamming runs as two codegen'd
    * integer ops on the candidate set.
    */
  def phashNearDup(spark: SparkSession, dir: String, maxHamming: Int = 12): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val tokCol = split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")
    val base = docs.select(col("doc_id"), tokCol.as("tok"))
    // 60-bit block hash over 15 equal-width blocks of the payload's own
    // length. The 15 nibble lanes are UNROLLED as plain column
    // expressions (a Scala loop, not a higher-order `aggregate` — a
    // lambda under a Union trips Catalyst's constraint rewrite), so the
    // whole hash stays inside one codegen span with zero lambdas.
    def phExpr: Column =
      (0 until 15)
        .map { i =>
          val len = expr(s"(($i + 1) * size(tok)) div 15 - ($i * size(tok)) div 15")
          val block = array_join(
            slice(col("tok"), expr(s"($i * size(tok)) div 15 + 1"), len),
            " ")
          when(len === 0, lit(0L))
            .otherwise(
              Dedup
                .hash60(concat(lit("graft-ph:"), block))
                .bitwiseAND(lit(15L)) * lit(1L << (4 * i)))
        }
        .reduce(_ + _)
        .as("ph")
    val variant = base
      .filter(col("doc_id") % ReencEvery === 0)
      .select(
        (col("doc_id") + ReencOffset).as("doc_id"),
        concat(
          array(lit("reenc0")),
          slice(col("tok"), lit(2), size(col("tok")) - 1)).as("tok"))
    // lazy localCheckpoint: the 2-column (doc_id, ph) frame is tiny and
    // referenced on BOTH sides of the band self-join — without the
    // barrier Catalyst inlines the tokenizer into all 15 nibble lanes
    // twice per side (the TextStats re-split trap; measured 6 s → sub-s)
    val hashed = base
      .select(col("doc_id"), phExpr)
      .unionAll(variant.select(col("doc_id"), phExpr))
      .localCheckpoint(eager = false)
    val bands = hashed.select(
      col("doc_id"),
      col("ph"),
      explode(expr(
        "transform(sequence(0, 3), b -> struct(b AS b, (ph div shiftleft(CAST(1 AS BIGINT), b * 15)) % 32768 AS v))"))
        .as("band"))
      .select(col("doc_id"), col("ph"), col("band.b").as("b"), col("band.v").as("v"))
    bands
      .alias("a")
      .join(
        bands.alias("b"),
        col("a.b") === col("b.b") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        col("a.ph").as("ph_a"),
        col("b.ph").as("ph_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** #248 WebDataset-style shard packing: assign every payload to a
    * size-budgeted shard file per modality (the tar-shard layout
    * multimodal training loaders stream — Beaumont/webdataset
    * convention) and emit the per-shard manifest a dataloader
    * actually opens with: item count, byte total, doc-id span. The
    * assignment is the sequential tar-writer's: items in
    * deterministic (doc_id) order, shard = cumulative-bytes-before
    * div budget — a shard may overflow by at most its last item,
    * exactly like a real tar writer that never splits a member.
    * #70 packs TOKENS into fixed context windows; this packs BYTES
    * into fixed files — same concat-and-chunk algebra, different
    * resource.
    *
    * One per-modality window cumsum (the #70 packCore shape — the
    * modality key bounds each partition the way `lang` does there)
    * then a (modality, shard)-keyed aggregate; output cardinality =
    * shard count = corpus_bytes/budget, linear and bounded.
    */
  def shardPack(spark: SparkSession, dir: String, budgetBytes: Long = 262144L): DataFrame = {
    val w = Window.partitionBy("modality").orderBy("doc_id")
    manifest(spark, dir)
      .withColumn("cum_before", sum("byte_len").over(w) - col("byte_len"))
      .withColumn("shard_file", expr(s"cum_before div ${budgetBytes}L"))
      .groupBy("modality", "shard_file")
      .agg(
        count(lit(1)).as("n_items"),
        sum("byte_len").as("shard_bytes"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
  }

  /** #394 Shard-balance scorecard (§15.4 applied to #248's packer: a
    * training job reads shards in parallel, so the SLOWEST shard sets
    * the step time — skewed shards silently serialize the fleet and
    * no per-shard listing makes that visible; this is the one-row-
    * per-modality read that does). Per modality: shard count, exact
    * byte min/mean-by-division/max, CV² of shard sizes as the
    * sign-free integer form (n·Σb² − (Σb)²)·10⁶ div (Σb)² (same
    * moment algebra as #387's CV², DECIMAL(38,0) products), max/mean
    * straggler ratio max·n·10⁶ div Σb, and budget fill Σb·10⁶ div
    * (n·budget) — the same `budgetBytes` constant as the packer, so
    * the scorecard cannot drift from what it scores. Composes
    * [[shardPack]] wholesale + one ≤modalities-row fold.
    */
  def shardBalance(spark: SparkSession, dir: String, budgetBytes: Long = 262144L): DataFrame =
    shardPack(spark, dir, budgetBytes)
      .groupBy("modality")
      .agg(
        count(lit(1)).as("n_shards"),
        sum("shard_bytes").as("total_bytes"),
        min("shard_bytes").as("min_bytes"),
        max("shard_bytes").as("max_bytes"),
        sum(expr("CAST(shard_bytes AS DECIMAL(38,0)) * shard_bytes")).as("sb2"))
      .select(
        col("modality"),
        col("n_shards"),
        col("total_bytes"),
        col("min_bytes"),
        col("max_bytes"),
        expr("""CAST((n_shards * sb2 - CAST(total_bytes AS DECIMAL(38,0)) * total_bytes)
                 * 1000000 div (CAST(total_bytes AS DECIMAL(38,0)) * total_bytes)
                AS BIGINT)""").as("cv2_e6"),
        expr("""CAST(CAST(max_bytes AS DECIMAL(38,0)) * n_shards * 1000000
                 div total_bytes AS BIGINT)""").as("straggler_e6"),
        expr(s"""CAST(CAST(total_bytes AS DECIMAL(38,0)) * 1000000
                 div (n_shards * ${budgetBytes}L) AS BIGINT)""").as("fill_e6"))

  /** #356 Payload byte-entropy screen: Shannon entropy of each opaque
    * payload's BYTE distribution in bits — the binary-side quality
    * gate (an all-zero/truncated payload collapses toward 0; a
    * well-compressed or encrypted one saturates toward 8; plain text
    * sits in between) that needs no codec at all, so it runs BEFORE
    * decode and quarantines junk without spending decoder cycles.
    * Bytes via hex-pair explosion (hex(payload) then 2-char
    * substrings — deterministic in both engines; the payload never
    * leaves the executor as anything but its hex projection);
    * cnt·log₂(n/cnt) e6-quantized per byte value (#119), H = Σterm
    * div n, flags at the 0.5/7.5-bit decision thresholds.
    */
  /** #399 Content-defined chunking dedup (the Rabin/gear rolling-hash
    * storage primitive under every dedup filesystem and artifact
    * store: LBFS, restic, borg, data-lake blob dedup): each opaque
    * payload is split where a W=8-byte rolling window hash hits
    * `hash % 64 == 0` — boundaries follow CONTENT, so an insertion
    * shifts only the chunks it touches, unlike fixed-size blocks
    * where one inserted byte re-fingerprints the whole tail — then
    * chunks are fingerprinted and deduplicated ACROSS documents. The
    * one-row scorecard reports the chunk-level dup ratio and the byte
    * savings a content-addressed store would realize on this corpus —
    * the sizing number a 100 TB multimodal lake computes before
    * committing to a dedup store.
    *
    * Exact cross-engine: bytes via hex pairs (the [[byteEntropy]]
    * path), the window hash is Σ b·33^j over the last 8 bytes — pure
    * BIGINT, max ≈ 1.1e13, replayed in DuckDB as a list dot product
    * (double-exact below 2^53) — and every ratio a truncating e6
    * quotient. Pure content rule, no min/max clamp: a pathological
    * payload can yield one giant chunk (production CDC adds stateful
    * size clamps; a clamp is a sequential fold that would cost the
    * declarative replay — documented trade). Scale: one explode to
    * chunk rows + two aggregates; per-doc work linear in bytes × W.
    */
  def cdcChunks(spark: SparkSession, dir: String): DataFrame = {
    // the W=8 window hash Σ bs[i-7+j]·33^j, UNROLLED: a slice+zip_with
    // formulation allocates two arrays per byte position and ran ~15×
    // slower — flat element_at terms keep the filter allocation-free
    val powTerms = (0 to 7)
      .map(j => s"element_at(bs, CAST(i - ${7 - j} AS INT)) * ${math.pow(33, j).toLong}L")
      .mkString(" + ")
    // fanOut + ONE shared materialization (r13 opt round): the chunking
    // expression is ~5.5 s of per-doc rolling-hash work that (a) ran in
    // the scan's single task and (b) ran TWICE — once under each of the
    // two aggregate branches below (profiler: two 5.5 s single-task
    // stages). The lazy checkpoint computes it once; the aggregates
    // re-read bounded chunk rows.
    val chunks = Tables
      .fanOut(Tables
        .documents(spark, dir)
        .select(col("doc_id"), hex(col("text").cast("binary")).as("hx"))
        .filter(length(col("hx")) >= 2))
      .withColumn("n", expr("CAST(length(hx) div 2 AS BIGINT)"))
      .withColumn(
        "bs",
        expr("transform(sequence(1L, n), i -> CAST(conv(substring(hx, CAST(2*i - 1 AS INT), 2), 16, 10) AS BIGINT))"))
      .withColumn(
        "cuts",
        expr(s"""concat(
             CASE WHEN n < 9 THEN array()
                  ELSE filter(sequence(8L, n - 1), i ->
                    ($powTerms) % 64 = 0) END,
             array(n))"""))
      .withColumn(
        "starts",
        expr("concat(array(1L), transform(slice(cuts, 1, size(cuts) - 1), c -> c + 1))"))
      .select(col("doc_id"), col("hx"), explode(arrays_zip(col("starts"), col("cuts"))).as("z"))
      .select(
        col("doc_id"),
        md5(expr("substring(hx, CAST(2*z.starts - 1 AS INT), CAST(2*(z.cuts - z.starts + 1) AS INT))"))
          .as("fp"),
        expr("z.cuts - z.starts + 1").as("nb"))
      .localCheckpoint(eager = false)
    val tot = chunks.agg(
      countDistinct("doc_id").as("n_docs"),
      count(lit(1)).as("total_chunks"),
      countDistinct("fp").as("distinct_chunks"),
      sum("nb").as("total_bytes"))
    val uniq = chunks
      .groupBy("fp")
      .agg(max("nb").as("nb"))
      .agg(sum("nb").as("unique_bytes"))
    tot
      .crossJoin(broadcast(uniq))
      .select(
        col("n_docs"),
        col("total_chunks"),
        col("distinct_chunks"),
        col("total_bytes"),
        col("unique_bytes"),
        expr("(total_chunks - distinct_chunks) * 1000000 div total_chunks")
          .as("dup_chunk_ratio_e6"),
        expr("(total_bytes - unique_bytes) * 1000000 div total_bytes").as("savings_e6"),
        expr("total_bytes * 100 div total_chunks").as("avg_chunk_bytes_e2"))
  }

  def byteEntropy(spark: SparkSession, dir: String): DataFrame = {
    val payloads = manifest(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("modality"), hex(col("text").cast("binary")).as("hx"))
    // length(hx) >= 2 guard: an EMPTY payload would make the sequence
    // upper bound -1, and Spark's sequence(0, -1) is the DESCENDING
    // [0, -1] (two phantom '' bytes) while DuckDB's range(0, 0) is
    // empty — the empty doc must produce zero byte rows in BOTH
    // engines (and drop out of the result) rather than a phantom
    // n_bytes=2 row on one side only
    // fanOut (r13 opt round): the hex-pair explode otherwise runs in
    // the single-row-group scan's one task before the first exchange
    val bytes = Tables
      .fanOut(payloads.filter(length(col("hx")) >= 2))
      .select(
        col("doc_id"),
        col("modality"),
        explode(
          expr("transform(sequence(0, CAST(length(hx) div 2 - 1 AS INT)), i -> substring(hx, i * 2 + 1, 2))"))
          .as("b"))
    val perByte = bytes.groupBy("doc_id", "modality", "b").agg(count(lit(1)).as("cnt"))
    val perDoc = perByte.groupBy("doc_id").agg(sum("cnt").as("n"))
    perByte
      .join(perDoc, "doc_id")
      .withColumn(
        "term_e6",
        floor(
          col("cnt").cast("double")
            * log2(col("n").cast("double") / col("cnt").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long"))
      .groupBy("doc_id", "modality")
      .agg(
        max("n").as("n_bytes"),
        count(lit(1)).as("n_distinct_bytes"),
        sum("term_e6").as("tsum"))
      .select(
        col("doc_id"),
        col("modality"),
        col("n_bytes"),
        col("n_distinct_bytes"),
        expr("tsum div n_bytes").as("h_bits_e6"),
        expr("CAST(tsum div n_bytes < 500000 AS BIGINT)").as("flag_degenerate"),
        expr("CAST(tsum div n_bytes > 7500000 AS BIGINT)").as("flag_high_entropy"))
  }

  /** #465 Aspect-ratio bucketing (the SDXL/NovelAI training-batch
    * discipline: variable-aspect images snap to the nearest of 9
    * fixed-resolution buckets so every batch is shape-homogeneous —
    * random crop to a square wastes pixels, per-image shapes break
    * batching; this table IS the bucketing plan a 100 TB image lake
    * trains from): per bucket, member count, full batches at 32, the
    * stragglers, and the mean aspect distortion the snap cost.
    *
    * The decode being container-stubbed (#34), (w, h) are the
    * DETERMINISTIC FAKE dimensions derived from doc_id — the bucket
    * assignment, batch math and distortion accounting are the real
    * Spark-side plumbing a real decoder would feed. Assignment is one
    * integer array fold per row: the 9 buckets ride a constant array
    * encoded ae6·16+idx, the winner is array_min of
    * |a − ae6|·16 + idx (ties → lower-aspect bucket) — no explode, no
    * window, one groupBy(bucket).
    */
  def aspectBucket(spark: SparkSession, dir: String): DataFrame = {
    // 9 SDXL-style buckets, ae6 = w*1e6 div h, encoded ae6*16+idx
    val encoded = "array(6666656L, 9142849L, 10947362L, 12444435L, 16000004L, " +
      "20571429L, 23384614L, 28000007L, 38400008L)"
    val assigned = manifest(spark, dir)
      .filter(col("modality") === "image")
      .select(
        col("doc_id"),
        expr("256 + (doc_id * 7919) % 1281").as("w"),
        expr("256 + (doc_id * 104729) % 1281").as("h"))
      .withColumn("a_e6", expr("w * 1000000 div h"))
      .withColumn(
        "win",
        expr(s"array_min(transform($encoded, x -> abs(a_e6 - x div 16) * 16 + x % 16))"))
      .select(
        col("doc_id"),
        expr("win % 16").as("bucket_idx"),
        expr("win div 16").as("absdiff_e6"))
    assigned
      .groupBy("bucket_idx")
      .agg(
        count(lit(1)).as("n_images"),
        sum("absdiff_e6").as("sdiff"))
      .select(
        col("bucket_idx"),
        expr("""CASE bucket_idx WHEN 0 THEN 640 WHEN 1 THEN 768 WHEN 2 THEN 832
                WHEN 3 THEN 896 WHEN 4 THEN 1024 WHEN 5 THEN 1152 WHEN 6 THEN 1216
                WHEN 7 THEN 1344 ELSE 1536 END""").cast("long").as("bucket_w"),
        expr("""CASE bucket_idx WHEN 0 THEN 1536 WHEN 1 THEN 1344 WHEN 2 THEN 1216
                WHEN 3 THEN 1152 WHEN 4 THEN 1024 WHEN 5 THEN 896 WHEN 6 THEN 832
                WHEN 7 THEN 768 ELSE 640 END""").cast("long").as("bucket_h"),
        col("n_images"),
        expr("n_images div 32").as("n_full_batches"),
        expr("n_images % 32").as("leftover"),
        expr("sdiff div n_images").as("mean_absdiff_e6"))
  }
}
