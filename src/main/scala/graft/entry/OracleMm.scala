package graft

import graft.operators._

/** multimodal binary-payload operators — split verbatim out of SparkEntry.oracleSql
  * (r10 file-size refactor); the assembled map is identical.
  */
private[graft] trait OracleMm { this: SparkEntryOracleHelpers =>
  protected def oracleMm: Map[String, String] = Map(
    "mm_frame_sample" ->
      """WITH v AS (
           SELECT doc_id, CAST(strlen(text) // 4 AS BIGINT) AS n_frames,
             CAST(25 + (doc_id % 2) * 5 AS BIGINT) AS fps
           FROM documents WHERE doc_id % 3 = 2)
         SELECT doc_id, n_frames, fps, CAST(f AS BIGINT) AS frame_idx,
           round(CAST(f AS DOUBLE) / fps, 2) AS ts_sec
         FROM v CROSS JOIN LATERAL
           (SELECT unnest(range(0, n_frames, fps * 2)) AS f) r""",
    "mm_manifest" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS content_md5
         FROM documents""",
    // stubDecode replica: acc[i % 8] += byte[i]; f = (acc % 1000) / 1000
    // computed in FLOAT to mirror the Spark side bit-for-bit (documents
    // are ASCII, so ord(char) == utf-8 byte)
    "mm_features" ->
      """WITH idx AS (
           SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
           FROM documents),
         acc AS (
           SELECT doc_id, (i - 1) % 8 AS pos,
             sum(ord(substr(text, CAST(i AS INT), 1))) AS s
           FROM idx GROUP BY 1, 2)
         SELECT a.doc_id,
           CASE WHEN a.doc_id % 3 = 0 THEN 'image'
                WHEN a.doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           CAST(length(d.text) AS BIGINT) AS n_bytes,
           CAST(a.pos AS BIGINT) AS pos,
           round(CAST(CAST(s % 1000 AS FLOAT) / CAST(1000 AS FLOAT) AS DOUBLE), 4) AS f
         FROM acc a JOIN documents d USING (doc_id)""",
    "mm_feature_stats" ->
      """WITH idx AS (
           SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
           FROM documents),
         acc AS (
           SELECT doc_id, (i - 1) % 8 AS pos,
             sum(ord(substr(text, CAST(i AS INT), 1))) AS s
           FROM idx GROUP BY 1, 2),
         f AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS modality,
             pos,
             CAST(CAST(s % 1000 AS FLOAT) / CAST(1000 AS FLOAT) AS DOUBLE) AS x
           FROM acc)
         SELECT modality, count(DISTINCT doc_id) AS n_docs,
           CAST(pos AS BIGINT) AS pos, round(avg(x), 4) AS mu
         FROM f GROUP BY modality, pos""",
    // rolling-hash chunking replay: byte values from hex pairs, the
    // W=8 window hash as a list dot product (double-exact < 2^53),
    // boundaries where hash % 64 = 0, chunk fingerprints md5 of the
    // hex slice — identical content rule to the Spark side
    "mm_cdc_chunks" ->
      """WITH pay AS (
           SELECT doc_id, hex(text) AS hx,
             CAST(length(hex(text)) // 2 AS BIGINT) AS n
           FROM documents WHERE length(hex(text)) >= 2),
         pows AS (SELECT [1,33,1089,35937,1185921,39135393,1291467969,42618442977]::BIGINT[] AS pw),
         b AS (
           SELECT doc_id, hx, n,
             [ (strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1
               for i in range(1, CAST(n AS INT) + 1) ]::BIGINT[] AS bs
           FROM pay),
         cu AS (
           SELECT doc_id, hx, n,
             list_append(
               [ i for i in range(8, CAST(n AS INT))
                 if CAST(list_dot_product(bs[i-7:i]::DOUBLE[], pw::DOUBLE[]) AS BIGINT)
                    % 64 = 0 ],
               n) AS cuts
           FROM b, pows),
         se AS (
           SELECT doc_id, hx,
             list_prepend(CAST(1 AS BIGINT),
               [ CAST(cuts[i] + 1 AS BIGINT) for i in range(1, len(cuts)) ]) AS starts,
             cuts AS ends
           FROM cu),
         ch AS (SELECT doc_id, unnest(starts) AS s, unnest(ends) AS e, hx FROM se),
         fp AS (
           SELECT doc_id,
             md5(substr(hx, CAST(2*s - 1 AS INT), CAST(2*(e - s + 1) AS INT))) AS fp,
             e - s + 1 AS nb
           FROM ch),
         tot AS (
           SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS total_chunks,
             CAST(count(DISTINCT fp) AS BIGINT) AS distinct_chunks,
             CAST(sum(nb) AS BIGINT) AS total_bytes
           FROM fp),
         uq AS (
           SELECT CAST(sum(nb) AS BIGINT) AS unique_bytes
           FROM (SELECT fp, max(nb) AS nb FROM fp GROUP BY fp))
         SELECT n_docs, total_chunks, distinct_chunks, total_bytes, unique_bytes,
           CAST((total_chunks - distinct_chunks) * 1000000 // total_chunks AS BIGINT)
             AS dup_chunk_ratio_e6,
           CAST((total_bytes - unique_bytes) * 1000000 // total_bytes AS BIGINT)
             AS savings_e6,
           CAST(total_bytes * 100 // total_chunks AS BIGINT) AS avg_chunk_bytes_e2
         FROM tot, uq""",
    "mm_aspect_bucket" ->
      // deterministic fake dims from doc_id; winner = list_min over
      // the encoded (ae6*16+idx) bucket array, ties -> lower aspect
      """WITH img AS (
           SELECT doc_id,
             256 + (doc_id * 7919) % 1281 AS w,
             256 + (doc_id * 104729) % 1281 AS h
           FROM documents WHERE doc_id % 3 = 0),
         a AS (SELECT doc_id, w * 1000000 // h AS a_e6 FROM img),
         win AS (
           SELECT doc_id,
             list_min(list_transform(
               [6666656, 9142849, 10947362, 12444435, 16000004,
                20571429, 23384614, 28000007, 38400008],
               x -> abs(a_e6 - x // 16) * 16 + x % 16)) AS win
           FROM a),
         asg AS (SELECT doc_id, win % 16 AS bucket_idx, win // 16 AS absdiff_e6 FROM win),
         g AS (SELECT bucket_idx, CAST(count(*) AS BIGINT) AS n_images,
                 CAST(sum(absdiff_e6) AS BIGINT) AS sdiff
               FROM asg GROUP BY 1)
         SELECT CAST(bucket_idx AS BIGINT) AS bucket_idx,
           CAST(CASE bucket_idx WHEN 0 THEN 640 WHEN 1 THEN 768 WHEN 2 THEN 832
                WHEN 3 THEN 896 WHEN 4 THEN 1024 WHEN 5 THEN 1152 WHEN 6 THEN 1216
                WHEN 7 THEN 1344 ELSE 1536 END AS BIGINT) AS bucket_w,
           CAST(CASE bucket_idx WHEN 0 THEN 1536 WHEN 1 THEN 1344 WHEN 2 THEN 1216
                WHEN 3 THEN 1152 WHEN 4 THEN 1024 WHEN 5 THEN 896 WHEN 6 THEN 832
                WHEN 7 THEN 768 ELSE 640 END AS BIGINT) AS bucket_h,
           n_images,
           n_images // 32 AS n_full_batches,
           n_images % 32 AS leftover,
           sdiff // n_images AS mean_absdiff_e6
         FROM g""",
    "mm_byte_entropy" ->
      // hex-pair byte explosion (case-insensitive by construction:
      // byte VALUES never reach the output, only their counts)
      """WITH pay AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
             hex(text) AS hx
           FROM documents),
         bytes AS (
           SELECT doc_id, modality,
             unnest([substr(hx, i * 2 + 1, 2)
                     for i in range(0, CAST(length(hx) // 2 AS BIGINT))]) AS b
           FROM pay),
         pc AS (SELECT doc_id, modality, b, CAST(count(*) AS BIGINT) AS cnt
                FROM bytes GROUP BY 1, 2, 3),
         pd AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n FROM pc GROUP BY 1),
         terms AS (
           SELECT pc.doc_id, pc.modality, n,
             CAST(floor(CAST(cnt AS DOUBLE)
               * log2(CAST(n AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
               AS term_e6
           FROM pc JOIN pd USING (doc_id))
         SELECT doc_id, modality, CAST(max(n) AS BIGINT) AS n_bytes,
           CAST(count(*) AS BIGINT) AS n_distinct_bytes,
           CAST(sum(term_e6) // max(n) AS BIGINT) AS h_bits_e6,
           CAST(sum(term_e6) // max(n) < 500000 AS BIGINT) AS flag_degenerate,
           CAST(sum(term_e6) // max(n) > 7500000 AS BIGINT) AS flag_high_entropy
         FROM terms GROUP BY 1, 2""",
    "mm_phash_neardup" ->
      // Full relational replay of the block-hash → band → Hamming plan.
      """WITH toks0 AS (
           SELECT doc_id, regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         corpus AS (
           SELECT doc_id, tok FROM toks0
           UNION ALL
           SELECT doc_id + 3000000,
             list_concat(['reenc0'], tok[2:len(tok)])
           FROM toks0 WHERE doc_id % 6 = 0),
         ph AS (
           SELECT doc_id,
             CAST(list_sum([
               CASE WHEN ((i+1) * len(tok)) // 15 - (i * len(tok)) // 15 = 0 THEN 0
                 ELSE (('0x' || substr(md5('graft-ph:' || array_to_string(
                        tok[(i * len(tok)) // 15 + 1:((i+1) * len(tok)) // 15], ' ')),
                        1, 15))::BIGINT
                       & 15) * (CAST(1 AS BIGINT) << (i * 4))
               END for i in range(0, 15)]) AS BIGINT) AS ph
           FROM corpus),
         bands AS (
           SELECT doc_id, ph, r.b,
             (ph // (CAST(1 AS BIGINT) << (r.b * 15))) % 32768 AS v
           FROM ph, (SELECT unnest(range(0, 4)) AS b) r),
         cand AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.ph AS ph_a, b.ph AS ph_b
           FROM bands a
           JOIN bands b ON a.b = b.b AND a.v = b.v AND a.doc_id < b.doc_id)
         SELECT doc_a, doc_b,
           CAST(bit_count(xor(ph_a, ph_b)) AS BIGINT) AS hamming
         FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 12""",
    "mm_crossmodal_topk" -> {
      // image-modality queries probe audio-modality buckets under the
      // shared hyperplane family; bits from the audio corpus size
      s"""WITH ${lshBucketsCte(
        "embeddings",
        "SELECT count(*) FROM embeddings WHERE vec_id % 3 = 1")},
          qb AS (
            SELECT vec_id AS query_id, t,
              unnest(list_prepend(bucket,
                [xor(bucket, 1::BIGINT << p) for p in range(0, bits)])) AS bucket
            FROM bk, params WHERE vec_id % 3 = 0),
          cand AS (
            SELECT DISTINCT qb.query_id, c.vec_id
            FROM bk c JOIN qb ON c.t = qb.t AND c.bucket = qb.bucket
            WHERE c.vec_id % 3 = 1),
          scored AS (
            SELECT cand.query_id, cand.vec_id,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
            FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
                      JOIN embeddings eq ON eq.vec_id = cand.query_id)
          SELECT query_id, vec_id, cos, rank FROM (
            SELECT query_id, vec_id, cos,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
            FROM scored)
          WHERE rank <= 3"""
    },
    "mm_shard_pack" ->
      // sequential tar-writer assignment: shard = cum-bytes-before
      // div budget (shared MmShardBudgetBytes constant), then the
      // per-shard manifest aggregate
      s"""WITH m AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS modality,
             CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
           FROM documents),
         cum AS (
           SELECT modality, doc_id, byte_len,
             CAST(coalesce(sum(byte_len) OVER (PARTITION BY modality ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_before
           FROM m)
         SELECT modality, cum_before // $MmShardBudgetBytes AS shard_file,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(byte_len) AS BIGINT) AS shard_bytes,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM cum GROUP BY 1, 2""",
    "mm_shard_balance" ->
      // the packer replay rolled up per modality; moment-form CV2 and
      // straggler/fill quotients in HUGEINT
      s"""WITH m AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS modality,
             CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
           FROM documents),
         cum AS (
           SELECT modality, doc_id, byte_len,
             CAST(coalesce(sum(byte_len) OVER (PARTITION BY modality ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_before
           FROM m),
         sh AS (
           SELECT modality, cum_before // $MmShardBudgetBytes AS shard_file,
             CAST(sum(byte_len) AS BIGINT) AS shard_bytes
           FROM cum GROUP BY 1, 2),
         agg AS (
           SELECT modality, CAST(count(*) AS BIGINT) AS n_shards,
             CAST(sum(shard_bytes) AS BIGINT) AS total_bytes,
             CAST(min(shard_bytes) AS BIGINT) AS min_bytes,
             CAST(max(shard_bytes) AS BIGINT) AS max_bytes,
             sum(CAST(shard_bytes AS HUGEINT) * shard_bytes) AS sb2
           FROM sh GROUP BY 1)
         SELECT modality, n_shards, total_bytes, min_bytes, max_bytes,
           CAST((n_shards * sb2 - CAST(total_bytes AS HUGEINT) * total_bytes)
                * 1000000 // (CAST(total_bytes AS HUGEINT) * total_bytes)
             AS BIGINT) AS cv2_e6,
           CAST(CAST(max_bytes AS HUGEINT) * n_shards * 1000000 // total_bytes
             AS BIGINT) AS straggler_e6,
           CAST(CAST(total_bytes AS HUGEINT) * 1000000
                // (n_shards * $MmShardBudgetBytes) AS BIGINT) AS fill_e6
         FROM agg"""
  )
}
