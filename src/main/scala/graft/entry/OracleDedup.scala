package graft

import graft.operators._

/** LLM dedup family: exact/minhash/simhash/substring + scorecards — split verbatim out of SparkEntry.oracleSql
  * (r10 file-size refactor); the assembled map is identical.
  */
private[graft] trait OracleDedup { this: SparkEntryOracleHelpers =>
  protected def oracleDedup: Map[String, String] = Map(
    "dedup_spans" ->
      """WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         b AS (
           SELECT doc_id, CAST(i AS BIGINT) AS idx,
             array_to_string(tok[(i*8+1):(i*8+8)], ' ') AS block
           FROM t CROSS JOIN LATERAL
             (SELECT unnest(range(0, (len(tok)+7)//8)) AS i) r),
         h AS (
           SELECT doc_id, idx, block,
             len(string_split(block, ' ')) >= 3 AS participates,
             ('0x' || substr(md5(block), 1, 15))::BIGINT AS h
           FROM b),
         k AS (
           SELECT doc_id, idx, block,
             (NOT participates) OR
               (row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) = 1) AS keep
           FROM h)
         SELECT doc_id, count(*) AS n_blocks,
           CAST(sum(CAST(keep AS INT)) AS BIGINT) AS n_kept,
           coalesce(string_agg(block, ' ' ORDER BY idx) FILTER (WHERE keep), '')
             AS cleaned_text
         FROM k GROUP BY doc_id""",
    "dedup_substring" ->
      // stride-1 rolling 10-token windows + first-occurrence ranking +
      // gaps-and-islands maximal-run merge; the planted copies are
      // offset-shifted (source offset 5, copy offset 3) behind
      // doc-unique junk so no aligned 8-block ever matches them
      """WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         corpus AS (
           SELECT doc_id, tok FROM t
           UNION ALL
           SELECT doc_id + 6000000,
             list_concat(['zzq' || doc_id || 'a', 'zzq' || doc_id || 'b', 'zzq' || doc_id || 'c'],
                         tok[6 : len(tok) - 5])
           FROM t WHERE doc_id % 6 = 0 AND len(tok) >= 25),
         wins AS (
           SELECT doc_id, CAST(i AS BIGINT) AS start,
             ('0x' || substr(md5(array_to_string(tok[(i+1):(i+10)], ' ')), 1, 15))::BIGINT AS h
           FROM corpus CROSS JOIN LATERAL
             (SELECT unnest(range(0, len(tok) - 9)) AS i) r
           WHERE len(tok) >= 10),
         dup AS (
           SELECT doc_id, start FROM (
             SELECT doc_id, start,
               row_number() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn
             FROM wins) WHERE rn > 1),
         isl AS (
           SELECT doc_id, start,
             sum(CASE WHEN prev IS NULL OR start - prev > 10 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY start) AS g
           FROM (SELECT doc_id, start,
                   lag(start) OVER (PARTITION BY doc_id ORDER BY start) AS prev
                 FROM dup))
         SELECT doc_id, min(start) AS span_start, max(start) + 9 AS span_end,
           max(start) + 9 - min(start) + 1 AS span_len,
           CAST(count(*) AS BIGINT) AS n_windows
         FROM isl GROUP BY doc_id, g""",
    "dedup_substring_rewrite" ->
      // same corpus + flagged-window front half as dedup_substring;
      // then: covered = union of flagged [start, start+9] position
      // ranges, survivor = any position not covered, reassembled in
      // order; fully-covered docs surface as n_kept=0 / empty text
      """WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         corpus AS (
           SELECT doc_id, tok FROM t
           UNION ALL
           SELECT doc_id + 6000000,
             list_concat(['zzq' || doc_id || 'a', 'zzq' || doc_id || 'b', 'zzq' || doc_id || 'c'],
                         tok[6 : len(tok) - 5])
           FROM t WHERE doc_id % 6 = 0 AND len(tok) >= 25),
         wins AS (
           SELECT doc_id, CAST(i AS BIGINT) AS start,
             ('0x' || substr(md5(array_to_string(tok[(i+1):(i+10)], ' ')), 1, 15))::BIGINT AS h
           FROM corpus CROSS JOIN LATERAL
             (SELECT unnest(range(0, len(tok) - 9)) AS i) r
           WHERE len(tok) >= 10),
         dup AS (
           SELECT doc_id, start FROM (
             SELECT doc_id, start,
               row_number() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn
             FROM wins) WHERE rn > 1),
         covered AS (
           SELECT DISTINCT doc_id, CAST(start + o AS BIGINT) AS p
           FROM dup CROSS JOIN LATERAL (SELECT unnest(range(0, 10)) AS o) r),
         pos AS (
           SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, tok[i] AS tk
           FROM corpus CROSS JOIN LATERAL
             (SELECT unnest(range(1, len(tok) + 1)) AS i) r),
         kept AS (
           SELECT pos.doc_id, pos.p, pos.tk
           FROM pos LEFT JOIN covered c ON c.doc_id = pos.doc_id AND c.p = pos.p
           WHERE c.p IS NULL),
         agg AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             string_agg(tk, ' ' ORDER BY p) AS cleaned_text
           FROM kept GROUP BY doc_id)
         SELECT corpus.doc_id, CAST(len(tok) AS BIGINT) AS n_tokens,
           coalesce(n_kept, 0) AS n_kept,
           coalesce(cleaned_text, '') AS cleaned_text
         FROM corpus LEFT JOIN agg ON agg.doc_id = corpus.doc_id""",
    "dedup_exact" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 7 = 0)
         SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_md5,
           min(doc_id) AS canonical_id, count(*) AS n_copies
         FROM corpus GROUP BY 1""",
    "dedup_minhash" ->
      s"""${minhashCandidatesCte(recursive = false)}
         SELECT doc_a, doc_b, n_shared_bands,
           round(CAST(len([i for i in range(1, 33) if sig_a[i] = sig_b[i]]) AS DOUBLE) / 32, 4)
             AS est_jaccard
         FROM cand WHERE n_shared_bands >= 1""",
    "dedup_incremental" ->
      s"""${minhashCandidatesCte(recursive = false)}
         SELECT doc_a, doc_b, n_shared_bands,
           round(CAST(len([i for i in range(1, 33) if sig_a[i] = sig_b[i]]) AS DOUBLE) / 32, 4)
             AS est_jaccard
         FROM cand
         WHERE n_shared_bands >= 1 AND doc_a < 1000000 AND doc_b >= 1000000""",
    "dedup_jaccard" ->
      s"""${minhashCandidatesCte(recursive = false)}
         SELECT * FROM (
           SELECT doc_a, doc_b,
             round(CAST(len(list_intersect(hs_a, hs_b)) AS DOUBLE)
               / len(list_distinct(hs_a || hs_b)), 4) AS jaccard
           FROM cand WHERE n_shared_bands >= 1)
         WHERE jaccard >= 0.3""",
    "dedup_prefix_join" ->
      // prefix-filter exact Jaccard >= 3/5 join: rarity-ordered
      // prefixes, candidates share a prefix token, integer verify
      """WITH toks0 AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         corpus AS (
           SELECT doc_id, tok FROM toks0
           UNION ALL
           SELECT doc_id + 1000000,
             tok[1:greatest(1, CAST(floor(len(tok) * 0.8) AS INT))]
           FROM toks0 WHERE doc_id % 5 = 0),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                  ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)] END AS sh
           FROM corpus),
         sets AS (SELECT doc_id, list_distinct(sh) AS ts FROM sh),
         e AS (SELECT doc_id, unnest(ts) AS tok FROM sets),
         dft AS (SELECT tok, count(*) AS df FROM e GROUP BY tok),
         srt AS (
           SELECT e.doc_id, list(e.tok ORDER BY dft.df, e.tok) AS stoks
           FROM e JOIN dft USING (tok) GROUP BY e.doc_id),
         pref AS (
           SELECT doc_id,
             unnest(stoks[1 : len(stoks) - (3 * len(stoks) + 4) // 5 + 1]) AS tok
           FROM srt),
         cand AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM pref a JOIN pref b ON a.tok = b.tok AND a.doc_id < b.doc_id),
         v AS (
           SELECT doc_a, doc_b,
             CAST(len(list_intersect(sa.ts, sb.ts)) AS BIGINT) AS n_inter,
             CAST(len(sa.ts) + len(sb.ts) - len(list_intersect(sa.ts, sb.ts)) AS BIGINT) AS n_union
           FROM cand JOIN sets sa ON sa.doc_id = cand.doc_a
                     JOIN sets sb ON sb.doc_id = cand.doc_b)
         SELECT doc_a, doc_b, n_inter, n_union,
           (n_inter * 10000) // n_union AS jaccard_e4
         FROM v WHERE 5 * n_inter >= 3 * n_union""",
    // Fellegi-Sunter linkage: banding ∪ SNM candidates, hash-drawn u,
    // one EM M-step for m, ln-odds scoring, three-way decision
    "dedup_fs_linkage" ->
      s"""${minhashCandidatesCte(recursive = false)},
         $fsLinkageCtes
         SELECT doc_a, doc_b, gamma, n_agree, score_e6, decision FROM fscored""",
    "dedup_fs_eval" ->
      s"""${minhashCandidatesCte(recursive = false)},
         $fsLinkageCtes,
         planted AS MATERIALIZED (
           SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b
           FROM documents WHERE doc_id % 5 = 0),
         ptot AS (SELECT CAST(count(*) AS BIGINT) AS planted_total FROM planted)
         SELECT decision, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_planted,
           planted_total,
           CAST(sum(CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END)
                * 1000000 // planted_total AS BIGINT) AS planted_share_e6,
           CAST(sum(CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS purity_e6
         FROM fscored s LEFT JOIN planted p USING (doc_a, doc_b), ptot
         GROUP BY decision, planted_total""",
    "dedup_cluster_eval" ->
      s"""${minhashCandidatesCte(recursive = true)},
         edges AS (SELECT doc_a, doc_b FROM cand WHERE n_shared_bands >= 1),
         sym AS (SELECT doc_a AS a, doc_b AS b FROM edges
                 UNION SELECT doc_b, doc_a FROM edges),
         walk(a, b) AS (
           SELECT doc_id, doc_id FROM corpus
           UNION
           SELECT w.a, s.b FROM walk w JOIN sym s ON w.b = s.a),
         labels AS (SELECT a AS doc_id, min(b) AS cluster_id FROM walk GROUP BY a),
         planted AS (SELECT doc_id AS a, doc_id + 1000000 AS b
                     FROM documents WHERE doc_id % 5 = 0),
         rec AS (
           SELECT CAST(count(*) AS BIGINT) AS n_planted,
             CAST(sum(CASE WHEN la.cluster_id = lb.cluster_id THEN 1 ELSE 0 END) AS BIGINT)
               AS n_recovered
           FROM planted p
           JOIN labels la ON la.doc_id = p.a
           JOIN labels lb ON lb.doc_id = p.b),
         sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
                   FROM labels GROUP BY 1),
         cp AS (SELECT CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS n_cluster_pairs,
                  CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi_clusters
                FROM sizes)
         SELECT n_planted, n_recovered,
           CAST(n_recovered * 1000000 // n_planted AS BIGINT) AS recall_e6,
           n_cluster_pairs, n_multi_clusters,
           CASE WHEN n_cluster_pairs > 0
             THEN CAST(n_recovered * 1000000 // n_cluster_pairs AS BIGINT)
             ELSE NULL END AS precision_e6
         FROM rec, cp""",
    "dedup_clusters" ->
      s"""${minhashCandidatesCte(recursive = true)},
         edges AS (SELECT doc_a, doc_b FROM cand WHERE n_shared_bands >= 1),
         sym AS (SELECT doc_a AS a, doc_b AS b FROM edges
                 UNION SELECT doc_b, doc_a FROM edges),
         walk(a, b) AS (
           SELECT doc_id, doc_id FROM corpus
           UNION
           SELECT w.a, s.b FROM walk w JOIN sym s ON w.b = s.a)
         SELECT a AS doc_id, min(b) AS cluster_id,
           CAST(min(b) = a AS INT) AS keep
         FROM walk GROUP BY a""",
    "dedup_apply" ->
      s"""${minhashCandidatesCte(recursive = true)},
         edges AS (SELECT doc_a, doc_b FROM cand WHERE n_shared_bands >= 1),
         sym AS (SELECT doc_a AS a, doc_b AS b FROM edges
                 UNION SELECT doc_b, doc_a FROM edges),
         walk(a, b) AS (
           SELECT doc_id, doc_id FROM corpus
           UNION
           SELECT w.a, s.b FROM walk w JOIN sym s ON w.b = s.a),
         labels AS (SELECT a AS doc_id, min(b) AS cluster_id FROM walk GROUP BY a),
         sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY cluster_id)
         SELECT l.doc_id, l.cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(cluster_size - 1 AS BIGINT) AS n_dropped
         FROM labels l JOIN sizes USING (cluster_id)
         WHERE l.doc_id = l.cluster_id""",
    "dedup_report" ->
      s"""${minhashCandidatesCte(recursive = true)},
         edges AS (SELECT doc_a, doc_b FROM cand WHERE n_shared_bands >= 1),
         sym AS (SELECT doc_a AS a, doc_b AS b FROM edges
                 UNION SELECT doc_b, doc_a FROM edges),
         walk(a, b) AS (
           SELECT doc_id, doc_id FROM corpus
           UNION
           SELECT w.a, s.b FROM walk w JOIN sym s ON w.b = s.a),
         labels AS (SELECT a AS doc_id, min(b) AS cluster_id FROM walk GROUP BY a),
         src AS (SELECT doc_id, source FROM documents
                 UNION ALL
                 SELECT doc_id + 1000000, source FROM documents WHERE doc_id % 5 = 0)
         SELECT s.source, count(*) AS n_docs,
           CAST(sum(CAST(l.doc_id <> l.cluster_id AS INT)) AS BIGINT) AS n_dups,
           round(CAST(sum(CAST(l.doc_id <> l.cluster_id AS INT)) AS DOUBLE) / count(*), 4)
             AS dup_rate
         FROM labels l JOIN src s USING (doc_id)
         GROUP BY s.source""",
    "dedup_source_matrix" ->
      // per-cluster source counts, then within-cluster source pairs:
      // off-diagonal n_a*n_b, diagonal C(n,2); positive so // == div
      s"""${minhashCandidatesCte(recursive = true)},
         edges AS (SELECT doc_a, doc_b FROM cand WHERE n_shared_bands >= 1),
         sym AS (SELECT doc_a AS a, doc_b AS b FROM edges
                 UNION SELECT doc_b, doc_a FROM edges),
         walk(a, b) AS (
           SELECT doc_id, doc_id FROM corpus
           UNION
           SELECT w.a, s.b FROM walk w JOIN sym s ON w.b = s.a),
         labels AS (SELECT a AS doc_id, min(b) AS cluster_id FROM walk GROUP BY a),
         src AS (SELECT doc_id, source FROM documents
                 UNION ALL
                 SELECT doc_id + 1000000, source FROM documents WHERE doc_id % 5 = 0),
         cs AS (SELECT l.cluster_id, s.source, CAST(count(*) AS BIGINT) AS n
                FROM labels l JOIN src s USING (doc_id) GROUP BY 1, 2),
         pairs AS (
           SELECT a.source AS source_a, b.source AS source_b, a.n * b.n AS pairs
           FROM cs a JOIN cs b
             ON b.cluster_id = a.cluster_id AND a.source < b.source
           UNION ALL
           SELECT source, source, n * (n - 1) // 2 FROM cs WHERE n >= 2)
         SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(pairs) AS BIGINT) AS dup_pairs
         FROM pairs GROUP BY 1, 2""",
    "dedup_simhash" ->
      """WITH toks0 AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         corpus AS (
           SELECT doc_id, tok FROM toks0
           UNION ALL
           SELECT doc_id + 1000000,
             tok[1:greatest(1, CAST(floor(len(tok) * 0.8) AS INT))]
           FROM toks0 WHERE doc_id % 5 = 0),
         thash AS (
           SELECT doc_id, [('0x' || substr(md5(t), 1, 15))::BIGINT for t in tok] AS hs
           FROM corpus),
         -- per-bit majority vote; the 60-bit md5 hash never sets bits
         -- 60-63, so range(60) covers every bit that can win the vote
         ssig AS (
           SELECT doc_id,
             CAST(list_sum([CASE WHEN 2 * list_sum([(h >> bb) & 1 for h in hs]) > len(hs)
                                 THEN (1::BIGINT << bb) ELSE 0::BIGINT END
                            for bb in range(60)]) AS BIGINT) AS sig
           FROM thash),
         spair AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
           FROM ssig a JOIN ssig b ON a.doc_id < b.doc_id
           WHERE len([c for c in range(4)
                      if ((a.sig >> (c*16)) & 65535) = ((b.sig >> (c*16)) & 65535)]) >= 1)
         SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
         FROM spair WHERE bit_count(xor(sig_a, sig_b)) <= 6""",
    "dedup_simhash_idf" ->
      """WITH toks0 AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         corpus AS (
           SELECT doc_id, tok FROM toks0
           UNION ALL
           SELECT doc_id + 1000000,
             tok[1:greatest(1, CAST(floor(len(tok) * 0.8) AS INT))]
           FROM toks0 WHERE doc_id % 5 = 0),
         tokocc AS (SELECT doc_id, unnest(tok) AS token FROM corpus),
         df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tokocc GROUP BY token),
         n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM corpus),
         -- integer-quantized IDF weights: votes sum exactly, any order
         wtok AS (
           SELECT t.doc_id,
             ('0x' || substr(md5(t.token), 1, 15))::BIGINT AS h,
             round(ln(n.n_docs / d.df) * 1000) + 10 AS w
           FROM tokocc t JOIN df d ON t.token = d.token CROSS JOIN n),
         votes AS (
           SELECT doc_id, bb,
             sum(CASE WHEN (h >> bb) & 1 = 1 THEN w ELSE -w END) AS v
           FROM wtok CROSS JOIN (SELECT unnest(range(60)) AS bb)
           GROUP BY doc_id, bb),
         ssig AS (
           SELECT doc_id,
             CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bb) ELSE 0::BIGINT END) AS BIGINT) AS sig
           FROM votes GROUP BY doc_id),
         spair AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
           FROM ssig a JOIN ssig b ON a.doc_id < b.doc_id
           WHERE len([c for c in range(4)
                      if ((a.sig >> (c*16)) & 65535) = ((b.sig >> (c*16)) & 65535)]) >= 1)
         SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
         FROM spair WHERE bit_count(xor(sig_a, sig_b)) <= 6""",
    "dedup_semantic" -> {
      // Replays the whole SemDeDup pipeline: planted perturbed copies
      // (same float arithmetic — double multiply then FLOAT cast),
      // per-label mean centroids, nearest-centroid assignment, and the
      // keep-the-outlier prune, all on 6dp-rounded cosines.
      val terms = (1 to 64).map(i => s"CAST(avg(embedding[$i]) AS FLOAT)").mkString(", ")
      s"""WITH p AS (
            SELECT vec_id + 1000000 AS vec_id,
              [CAST(embedding[i]*(1.0 + 0.002*(((i-1)%5)-2)) AS FLOAT)
               for i in generate_series(1,64)] AS embedding
            FROM embeddings WHERE vec_id % 4 = 0),
          u AS (SELECT vec_id, embedding FROM embeddings
                UNION ALL SELECT vec_id, embedding FROM p),
          c AS (SELECT label, [$terms] AS centroid
                FROM embeddings GROUP BY label),
          a AS (SELECT vec_id, embedding, cell, ccos_e4 FROM (
              SELECT u.vec_id, u.embedding, c.label AS cell,
                CAST(floor(list_cosine_similarity(
                  u.embedding::DOUBLE[], c.centroid::DOUBLE[]) * 10000 + 0.5) AS BIGINT)
                  AS ccos_e4,
                row_number() OVER (PARTITION BY u.vec_id
                  ORDER BY CAST(floor(list_cosine_similarity(
                    u.embedding::DOUBLE[], c.centroid::DOUBLE[]) * 10000 + 0.5) AS BIGINT)
                    DESC, c.label) AS rn
              FROM u, c) WHERE rn = 1),
          d AS (SELECT DISTINCT x.vec_id
                FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id <> y.vec_id
                WHERE floor(list_cosine_similarity(
                    x.embedding::DOUBLE[], y.embedding::DOUBLE[]) * 10000 + 0.5) >= 9900
                  AND (y.ccos_e4 < x.ccos_e4
                       OR (y.ccos_e4 = x.ccos_e4 AND y.vec_id < x.vec_id)))
          SELECT a.vec_id, CAST(cell AS BIGINT) AS cell, ccos_e4,
            CAST(d.vec_id IS NULL AS INT) AS keep
          FROM a LEFT JOIN d USING (vec_id)"""
    },
    "dedup_embedding" -> {
      // planted perturbed corpus (same float arithmetic as the Spark
      // side: double multiply then FLOAT cast), replayed buckets, and
      // the ≥0.99 prune at 4dp
      s"""WITH pert AS (
            SELECT vec_id + 1000000 AS vec_id,
              [CAST(embedding[i]*(1.0 + 0.002*(((i-1)%5)-2)) AS FLOAT)
               for i in generate_series(1,64)] AS embedding
            FROM embeddings WHERE vec_id % 4 = 0),
          corpus AS (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL SELECT vec_id, embedding FROM pert),
          ${lshBucketsCte("corpus", "SELECT (count(*) * 5) // 4 FROM embeddings")},
          pairs AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM bk a JOIN bk b ON a.t = b.t AND a.bucket = b.bucket
            WHERE a.vec_id < b.vec_id)
          SELECT DISTINCT vec_a, vec_b, cos FROM (
            SELECT p.vec_a, p.vec_b,
              round(list_cosine_similarity(
                ca.embedding::DOUBLE[], cb.embedding::DOUBLE[]), 4) AS cos
            FROM pairs p JOIN corpus ca ON ca.vec_id = p.vec_a
                         JOIN corpus cb ON cb.vec_id = p.vec_b)
          WHERE cos >= 0.99"""
    },
    "dedup_fuzzy" ->
      """WITH d AS (
           SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
           FROM documents),
         t AS (SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b,
                 array_to_string(list_slice(regexp_split_to_array(norm, ' '), 1,
                   greatest(1, CAST(floor(len(regexp_split_to_array(norm, ' ')) * 0.8) AS INT))),
                   ' ') AS norm_b
               FROM d WHERE doc_id % 5 = 0)
         SELECT t.doc_a, t.doc_b,
           CAST(levenshtein(d.norm, t.norm_b) AS BIGINT) AS edit_dist,
           round(1.0 - CAST(levenshtein(d.norm, t.norm_b) AS DOUBLE) /
             greatest(length(d.norm), length(t.norm_b)), 4) AS edit_sim
         FROM t JOIN d ON t.doc_a = d.doc_id""",
    "dedup_split_leakage" ->
      // the #23 banded candidates; split buckets = #54's md5 rule on
      // the CANONICAL text (array_to_string of the normalized tokens)
      s"""${minhashCandidatesCte(recursive = false)},
         pairs AS (SELECT DISTINCT doc_a, doc_b FROM cand WHERE n_shared_bands >= 1),
         sp AS (
           SELECT doc_id,
             CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
           FROM (SELECT doc_id,
                   ('0x' || substr(md5(array_to_string(tok, ' ')), 1, 4))::BIGINT % 100 AS b
                 FROM corpus)),
         cells AS (
           SELECT least(a.split, b.split) AS split_lo, greatest(a.split, b.split) AS split_hi,
             CAST(count(*) AS BIGINT) AS n_pairs
           FROM pairs
           JOIN sp a ON a.doc_id = pairs.doc_a
           JOIN sp b ON b.doc_id = pairs.doc_b
           GROUP BY 1, 2),
         c2 AS (SELECT *, CAST(split_lo <> split_hi AS BIGINT) AS is_leak FROM cells),
         tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS n_pairs_total,
                   CAST(coalesce(sum(CASE WHEN is_leak = 1 THEN n_pairs END), 0) AS BIGINT)
                     AS n_leaked
                 FROM c2)
         SELECT split_lo, split_hi, n_pairs, is_leak, n_pairs_total, n_leaked,
           CAST(n_leaked * 1000000 // n_pairs_total AS BIGINT) AS leak_rate_e6
         FROM c2, tot""",
    "dedup_scurve" -> {
      // GENERATED from Dedup's own (b, r, grid) constants — truncating
      // e6 powers replayed verbatim (DuckDB // on positives ≡ div)
      def powSql(base: String, p: Int): String =
        (2 to p).foldLeft(base)((acc, _) => s"(($acc) * ($base) // 1000000)")
      val step = 1000000L / Dedup.ScurvePoints
      s"""WITH g AS (
            SELECT CAST(unnest(generate_series(0, ${Dedup.ScurvePoints})) * $step AS BIGINT)
              AS s_e6),
          p AS (SELECT s_e6,
                  CAST(${powSql("s_e6", Dedup.MinhashRowsPerBand)} AS BIGINT) AS p_band_e6
                FROM g)
          SELECT s_e6, p_band_e6,
            CAST(1000000 - ${powSql("(1000000 - p_band_e6)", Dedup.MinhashBands)} AS BIGINT)
              AS p_candidate_e6
          FROM p"""
    },
    "dedup_snm" ->
      // sorted-neighborhood replay: global rank under the 24-char
      // normalized-prefix key, window pairs at rank distance 1..4,
      // shingle-hash Jaccard >= 0.3 (the hierarchical Spark rank is
      // identical to the plain row_number by construction)
      """WITH toks0 AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         corpus AS (
           SELECT doc_id, tok FROM toks0
           UNION ALL
           SELECT doc_id + 1000000,
             tok[1:greatest(1, CAST(floor(len(tok) * 0.8) AS INT))]
           FROM toks0 WHERE doc_id % 5 = 0),
         keyed AS (
           SELECT doc_id,
             substr(array_to_string(tok, ' '), 1, 24) AS k,
             CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                  ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)] END AS sh
           FROM corpus),
         hs AS (
           SELECT doc_id, k,
             list_distinct([('0x' || substr(md5(s), 1, 15))::BIGINT for s in sh]) AS hs
           FROM keyed),
         rk AS (
           SELECT *, CAST(row_number() OVER (ORDER BY k, doc_id) AS BIGINT) AS rn
           FROM hs),
         pairs AS (
           SELECT a.doc_id AS id_l, b.doc_id AS id_r, d.d AS dist,
             a.hs AS hs_l, b.hs AS hs_r
           FROM rk a
           CROSS JOIN range(1, 5) d(d)
           JOIN rk b ON b.rn = a.rn + d.d)
         SELECT * FROM (
           SELECT least(id_l, id_r) AS doc_a, greatest(id_l, id_r) AS doc_b,
             dist,
             round(CAST(len(list_intersect(hs_l, hs_r)) AS DOUBLE)
               / len(list_distinct(hs_l || hs_r)), 4) AS jaccard
           FROM pairs)
         WHERE jaccard >= 0.3""",
    "dedup_containment" ->
      // ALL-PAIRS ground truth (no prefix filter): the hash-MATCH
      // proves the asymmetric prefix filter lossless, not just fast.
      """WITH toks0 AS (
           SELECT doc_id, regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         corpus AS (
           SELECT doc_id, tok FROM toks0
           UNION ALL
           SELECT doc_id + 4000000,
             tok[CAST(floor(len(tok) * 0.2) AS INT) + 1 :
                 CAST(floor(len(tok) * 0.2) AS INT) +
                 greatest(1, CAST(floor(len(tok) * 0.5) AS INT)
                             - CAST(floor(len(tok) * 0.2) AS INT))]
           FROM toks0 WHERE doc_id % 8 = 0),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                  ELSE [array_to_string(tok[i:i+2], ' ')
                        for i in range(1, len(tok) - 1)] END AS s
           FROM corpus),
         hs AS (
           SELECT doc_id,
             list_distinct([('0x' || substr(md5(x), 1, 15))::BIGINT for x in s]) AS hs
           FROM sh),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(a.hs) AS BIGINT) AS n_shingles_a,
             CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS inter
           FROM hs a JOIN hs b ON a.doc_id != b.doc_id)
         SELECT doc_a, doc_b, n_shingles_a, inter,
           (inter * 1000000) // n_shingles_a AS containment_e6
         FROM pairs
         WHERE (inter * 1000000) // n_shingles_a >= 800000""",
    "dedup_eval" -> {
      // the #23 estimate and the #25 exact statistic from the same
      // replayed candidate rows, both on the e6 grid, plus the error
      s"""${minhashCandidatesCte(recursive = false)}
         SELECT doc_a, doc_b,
           CAST(len([i for i in range(1, 33) if sig_a[i] = sig_b[i]]) * 1000000 // 32
             AS BIGINT) AS est_e6,
           CAST(len(list_intersect(hs_a, hs_b)) * 1000000
             // len(list_distinct(hs_a || hs_b)) AS BIGINT) AS exact_e6,
           CAST(len([i for i in range(1, 33) if sig_a[i] = sig_b[i]]) * 1000000 // 32
             - len(list_intersect(hs_a, hs_b)) * 1000000
               // len(list_distinct(hs_a || hs_b)) AS BIGINT) AS err_signed_e6
         FROM cand WHERE n_shared_bands >= 1"""
    },
    "dedup_banding_advisor" -> {
      // the #298 truncating-e6 powers per (b, r) factorization; areas
      // and the min-key pick replayed as pure integer folds
      def powSql(base: String, p: Int): String =
        (2 to p).foldLeft(base)((acc, _) => s"(($acc) * ($base) // 1000000)")
      val step = 1000000L / Dedup.ScurvePoints
      val tau = Dedup.BandingTauE6
      val curves = Dedup.BandingConfigs
        .map { case (b, r) =>
          s"""SELECT b, r, s_e6,
                CAST(1000000 - (${powSql("pb", b)}) AS BIGINT) AS p_cand_e6
              FROM (SELECT CAST($b AS BIGINT) AS b, CAST($r AS BIGINT) AS r, s_e6,
                      CAST(1000000 - (${powSql("s_e6", r)}) AS BIGINT) AS pb
                    FROM g)"""
        }
        .mkString("\n          UNION ALL\n          ")
      s"""WITH g AS (
            SELECT CAST(unnest(generate_series(0, ${Dedup.ScurvePoints})) * $step
              AS BIGINT) AS s_e6),
          curves AS ($curves),
          a AS (
            SELECT b, r,
              CAST(max(CASE WHEN s_e6 = $tau THEN p_cand_e6 END) AS BIGINT)
                AS p_at_tau_e6,
              CAST(sum(CASE WHEN s_e6 < $tau THEN p_cand_e6 * $step ELSE 0 END)
                   // 1000000 AS BIGINT) AS fp_area_e6,
              CAST(sum(CASE WHEN s_e6 >= $tau THEN (1000000 - p_cand_e6) * $step
                            ELSE 0 END) // 1000000 AS BIGINT) AS fn_area_e6
            FROM curves GROUP BY 1, 2),
          t AS (SELECT a.*, CAST(fp_area_e6 + fn_area_e6 AS BIGINT) AS total_e6 FROM a),
          bk2 AS (SELECT min(total_e6 * 64 + b) AS best_key FROM t)
          SELECT b, r, p_at_tau_e6, fp_area_e6, fn_area_e6, total_e6,
            CAST(total_e6 * 64 + b = best_key AS BIGINT) AS is_best
          FROM t, bk2"""
    }
  )
}
