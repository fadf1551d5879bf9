package graft

import graft.operators._

/** text analysis + corpus statistics — split verbatim out of SparkEntry.oracleSql
  * (r10 file-size refactor); the assembled map is identical.
  */
private[graft] trait OracleText { this: SparkEntryOracleHelpers =>
  protected def oracleText: Map[String, String] = Map(
    // #421: planted degenerates + the SAME quality/repetition CTE
    // bodies as the standalone oracles, folded per family
    "text_filter_eval" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
         srcs AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')
               AS tok
           FROM base WHERE doc_id % 50 = 1),
         planted AS (
           SELECT doc_id + 2000000 AS doc_id,
             array_to_string(flatten([tok[1:3] for i in range(40)]), ' ') AS text,
             'planted_repeat' AS kind
           FROM srcs
           UNION ALL
           SELECT doc_id + 3000000, array_to_string(tok[1:2], ' '), 'planted_short'
           FROM srcs
           UNION ALL
           SELECT doc_id + 4000000, repeat('#$%&!? ', 30), 'planted_symbol'
           FROM srcs),
         corpus AS (
           SELECT doc_id, text, 'clean' AS kind FROM base
           UNION ALL SELECT doc_id, text, kind FROM planted),
         qt AS (
           SELECT doc_id,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS toks,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
               AS n_punct
           FROM corpus),
         q AS (
           SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             round(least(1.0, len(toks) / 100.0) *
                   (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct / n_chars END), 4)
               AS quality_score
           FROM qt),
         rt AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM corpus),
         rtri AS (
           SELECT doc_id, len(tok) AS n_tok,
             CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                  ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)] END AS tri
           FROM rt),
         rbase AS (
           SELECT doc_id, n_tok, len(tri) AS n_tri, len(list_distinct(tri)) AS n_uniq FROM rtri),
         rtop AS (
           SELECT doc_id, max(c) AS topc FROM (
             SELECT doc_id, token, count(*) AS c
             FROM (SELECT doc_id, unnest(tok) AS token FROM rt) GROUP BY doc_id, token)
           GROUP BY doc_id),
         r AS (
           SELECT b.doc_id,
             CAST((1.0 - CAST(n_uniq AS DOUBLE) / n_tri) > 0.2
                  OR (CAST(topc AS DOUBLE) / n_tok) > 0.2 AS INT) AS is_repetitive
           FROM rbase b JOIN rtop USING (doc_id)),
         j AS (
           SELECT c.kind,
             CASE WHEN q.n_tokens < 15 THEN 'too_short'
                  WHEN q.quality_score < 0.2 THEN 'low_quality'
                  WHEN r.is_repetitive = 1 THEN 'repetitive'
                  ELSE 'keep' END AS reason
           FROM corpus c JOIN q USING (doc_id) JOIN r USING (doc_id))
         SELECT kind,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN reason <> 'keep' THEN 1 ELSE 0 END) AS BIGINT) AS n_caught,
           CAST(sum(CASE WHEN reason <> 'keep' THEN 1 ELSE 0 END) * 1000000
             // count(*) AS BIGINT) AS catch_rate_e6,
           CAST(sum(CASE WHEN reason = 'too_short' THEN 1 ELSE 0 END) AS BIGINT) AS n_too_short,
           CAST(sum(CASE WHEN reason = 'low_quality' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_quality,
           CAST(sum(CASE WHEN reason = 'repetitive' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repetitive
         FROM j GROUP BY kind""",
    "text_repetition" ->
      """WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         tri AS (
           SELECT doc_id, len(tok) AS n_tok,
             CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                  ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)] END AS tri
           FROM t),
         base AS (
           SELECT doc_id, n_tok, len(tri) AS n_tri, len(list_distinct(tri)) AS n_uniq FROM tri),
         top AS (
           SELECT doc_id, max(c) AS topc FROM (
             SELECT doc_id, token, count(*) AS c
             FROM (SELECT doc_id, unnest(tok) AS token FROM t) GROUP BY doc_id, token)
           GROUP BY doc_id)
         SELECT b.doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
           round(1.0 - CAST(n_uniq AS DOUBLE) / n_tri, 4) AS dup_trigram_frac,
           round(CAST(topc AS DOUBLE) / n_tok, 4) AS top_token_ratio,
           CAST((1.0 - CAST(n_uniq AS DOUBLE) / n_tri) > 0.2
                OR (CAST(topc AS DOUBLE) / n_tok) > 0.2 AS INT) AS is_repetitive
         FROM base b JOIN top USING (doc_id)""",
    // KMV overlap (#148): integer k-th-min thetas + integer-division
    // estimators — the estimates replay bit-exactly beside the exact
    // values they approximate.
    "text_kmv_overlap" ->
      """WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct([('0x' || substr(md5(s), 1, 15))::BIGINT for s in
               CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                    ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)] END])
             AS hs
           FROM t),
         e AS (SELECT doc_id, unnest(hs) AS h FROM sh),
         a AS MATERIALIZED (SELECT DISTINCT h FROM e WHERE doc_id % 97 <> 0),
         b AS MATERIALIZED (SELECT DISTINCT h FROM e WHERE doc_id % 97 = 0),
         ku AS MATERIALIZED (
           SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b)
           ORDER BY h LIMIT 64),
         vals AS (SELECT
           (SELECT max(h) FROM (SELECT h FROM a ORDER BY h LIMIT 64)) AS theta_a,
           (SELECT max(h) FROM (SELECT h FROM b ORDER BY h LIMIT 64)) AS theta_b,
           (SELECT CAST(count(*) AS BIGINT) FROM ku
             WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)) AS rho,
           (SELECT CAST(count(*) AS BIGINT) FROM a) AS exact_distinct_a,
           (SELECT CAST(count(*) AS BIGINT) FROM b) AS exact_distinct_b,
           (SELECT CAST(count(*) AS BIGINT) FROM a
             WHERE h IN (SELECT h FROM b)) AS exact_overlap)
         SELECT CAST(64 AS BIGINT) AS k, theta_a, theta_b,
           CAST((1152921504606846976 // theta_a) * 63 AS BIGINT) AS est_distinct_a,
           CAST((1152921504606846976 // theta_b) * 63 AS BIGINT) AS est_distinct_b,
           exact_distinct_a, exact_distinct_b, rho,
           CAST((rho * 10000) // 64 AS BIGINT) AS jaccard_est_bp,
           exact_overlap,
           CAST((exact_overlap * 10000) //
                (exact_distinct_a + exact_distinct_b - exact_overlap) AS BIGINT)
             AS jaccard_exact_bp
         FROM vals""",
    "text_contamination" ->
      """WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct([('0x' || substr(md5(s), 1, 15))::BIGINT for s in
               CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                    ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)] END])
             AS hs
           FROM t),
         e AS (SELECT doc_id, unnest(hs) AS h FROM sh),
         bench AS (SELECT DISTINCT h FROM e WHERE doc_id % 97 = 0),
         hits AS (SELECT e.doc_id, count(*) AS n_hits
                  FROM e JOIN bench USING (h) GROUP BY e.doc_id)
         SELECT s.doc_id, CAST(len(hs) AS BIGINT) AS n_shingles,
           CAST(coalesce(n_hits, 0) AS BIGINT) AS n_contaminated,
           round(CAST(coalesce(n_hits, 0) AS DOUBLE) / len(hs), 4) AS contamination_frac,
           CAST(s.doc_id % 97 = 0 AS INT) AS is_benchmark,
           CAST(CAST(coalesce(n_hits, 0) AS DOUBLE) / len(hs) >= 0.5 AS INT) AS is_contaminated
         FROM sh s LEFT JOIN hits USING (doc_id)""",
    "text_pii" ->
      """WITH p AS (
           SELECT doc_id,
             text ||
             CASE WHEN doc_id % 3 = 0
                  THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
             CASE WHEN doc_id % 5 = 0
                  THEN ' host 10.0.' || (doc_id % 256) || '.17' ELSE '' END ||
             CASE WHEN doc_id % 7 = 0
                  THEN ' call +49-555-0' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                  ELSE '' END AS planted
           FROM documents),
         c AS (
           SELECT doc_id,
             CAST(len(regexp_extract_all(planted, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))
               AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(planted, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
               AS BIGINT) AS n_ips,
             CAST(len(regexp_extract_all(planted, '\+\d{2}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
             regexp_replace(regexp_replace(regexp_replace(planted,
               '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
               '\+\d{2}-\d{3}-\d{4}', '<PHONE>', 'g') AS redacted
           FROM p)
         SELECT doc_id, n_emails, n_ips, n_phones, redacted,
           CAST(n_emails + n_ips + n_phones > 0 AS INT) AS has_pii
         FROM c""",
    "text_unigram_lp" ->
      """WITH t AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
               AS w
           FROM documents),
         v AS (SELECT w, count(*) AS c FROM t GROUP BY w),
         n AS (SELECT sum(c) AS n_total FROM v),
         d AS (SELECT doc_id, count(*) AS n_tokens, avg(log2(c)) AS alc
               FROM t JOIN v USING (w) GROUP BY doc_id)
         SELECT doc_id, n_tokens,
           round(log2(n_total) - alc, 4) AS avg_surprisal,
           CAST(round(log2(n_total) - alc, 4) > 8.0 AS INT) AS is_tail
         FROM d, n""",
    "text_fingerprint" ->
      """WITH t AS (
           SELECT doc_id,
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
             len(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS n_tok
           FROM documents)
         SELECT doc_id, md5(norm) AS fp_md5,
           CAST(n_tok AS BIGINT) AS n_tokens,
           CAST(CASE WHEN n_tok < 3 THEN 1 ELSE n_tok - 2 END AS BIGINT) AS n_shingles
         FROM t""",
    "text_chunks" ->
      // sliding win=32/stride=24 token windows; starts = multiples of
      // stride below the token count, final window may be short,
      // empty doc -> one empty chunk row
      """WITH t AS (
           SELECT doc_id,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS tok
           FROM documents),
         s AS (
           SELECT doc_id, tok,
             unnest(range(0, greatest(len(tok), 1), 24)) AS start_tok
           FROM t)
         SELECT doc_id,
           CAST(start_tok // 24 AS BIGINT) AS chunk_idx,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(len(tok[start_tok + 1 : start_tok + 32]) AS BIGINT) AS n_tok,
           array_to_string(tok[start_tok + 1 : start_tok + 32], ' ') AS chunk
         FROM s""",
    "text_tokens" ->
      """SELECT doc_id,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(lower(trim(text)), '\s+')) END AS BIGINT)
             AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_actual
         FROM documents""",
    // Curriculum ordering (#151): exact quality deciles on the e4
    // grid + salted-hash shuffle within each decile.
    "text_curriculum" ->
      """WITH t AS (
           SELECT doc_id, text,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS toks,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) AS n_punct
           FROM documents),
         q AS (
           SELECT doc_id,
             CAST(floor(least(1.0, len(toks) / 100.0) *
               (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct / n_chars END) *
               10000.0 + 0.5) AS BIGINT) AS q_e4
           FROM t),
         r AS (
           SELECT doc_id, q_e4,
             row_number() OVER (ORDER BY q_e4, doc_id) AS rk,
             ('0x' || substr(md5('graft-curr-1:' || doc_id), 1, 15))::BIGINT AS ord
           FROM q)
         SELECT doc_id, q_e4,
           CAST(((rk - 1) * 10) // (SELECT count(*) FROM q) AS BIGINT) AS decile,
           CAST(ord % 8 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY ((rk - 1) * 10) // (SELECT count(*) FROM q), ord % 8
             ORDER BY ord, doc_id) AS BIGINT) AS pos
         FROM r""",
    "text_quality" ->
      """WITH t AS (
           SELECT doc_id, text,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS toks,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) AS n_punct
           FROM documents)
         SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           round(CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct / n_chars END, 4) AS punct_ratio,
           round(CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(toks, x -> list_contains(
                   ['the','a','of','and','to','in','is','it','that','for'], x))) AS DOUBLE)
                   / len(toks) END, 4) AS stopword_ratio,
           round(CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / len(toks) END, 4)
             AS avg_token_len,
           round(least(1.0, len(toks) / 100.0) *
                 (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct / n_chars END), 4)
             AS quality_score
         FROM t""",
    "text_filter_pipeline" -> {
      // The composed filter stack: each signal CTE is the SAME SQL as
      // its standalone oracle (quality, repetition, contamination,
      // lang-id), joined into the one keep/reason verdict.
      val markers = Seq(
        "de" -> Seq("der", "die", "das", "und", "ist", "zu"),
        "en" -> Seq("the", "a", "of", "and", "is", "to"),
        "es" -> Seq("el", "la", "los", "y", "es", "de"),
        "fr" -> Seq("le", "la", "les", "et", "est", "de"),
        "zh" -> Seq("的", "了", "是", "在", "和", "有"))
      val structs = markers
        .map { case (l, ws) =>
          val list = ws.map(w => s"'$w'").mkString("[", ",", "]")
          s"struct_pack(lang := '$l', score := len(list_filter(toks, w -> list_contains($list, w))))"
        }
        .mkString(",\n             ")
      s"""WITH qt AS (
           SELECT doc_id,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS toks,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) AS n_punct
           FROM documents),
         q AS (
           SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             round(least(1.0, len(toks) / 100.0) *
                   (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct / n_chars END), 4)
               AS quality_score
           FROM qt),
         rt AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         tri AS (
           SELECT doc_id, len(tok) AS n_tok,
             CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                  ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)] END AS tri
           FROM rt),
         rbase AS (
           SELECT doc_id, n_tok, len(tri) AS n_tri, len(list_distinct(tri)) AS n_uniq FROM tri),
         rtop AS (
           SELECT doc_id, max(c) AS topc FROM (
             SELECT doc_id, token, count(*) AS c
             FROM (SELECT doc_id, unnest(tok) AS token FROM rt) GROUP BY doc_id, token)
           GROUP BY doc_id),
         r AS (
           SELECT b.doc_id,
             CAST((1.0 - CAST(n_uniq AS DOUBLE) / n_tri) > 0.2
                  OR (CAST(topc AS DOUBLE) / n_tok) > 0.2 AS INT) AS is_repetitive
           FROM rbase b JOIN rtop USING (doc_id)),
         sh AS (
           SELECT doc_id,
             list_distinct([('0x' || substr(md5(s), 1, 15))::BIGINT for s in
               CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                    ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)] END])
             AS hs
           FROM rt),
         e AS (SELECT doc_id, unnest(hs) AS h FROM sh),
         bench AS (SELECT DISTINCT h FROM e WHERE doc_id % 97 = 0),
         hits AS (SELECT e.doc_id, count(*) AS n_hits
                  FROM e JOIN bench USING (h) GROUP BY e.doc_id),
         con AS (
           SELECT s.doc_id,
             CAST(s.doc_id % 97 = 0 AS INT) AS is_benchmark,
             CAST(CAST(coalesce(n_hits, 0) AS DOUBLE) / len(hs) >= 0.5 AS INT) AS is_contaminated
           FROM sh s LEFT JOIN hits USING (doc_id)),
         ls AS (SELECT doc_id, u.s.lang AS lang, u.s.score AS score
               FROM qt, UNNEST([
             $structs
           ]) AS u(s)),
         lang AS (
           SELECT doc_id, CASE WHEN score > 0 THEN lang ELSE 'und' END AS pred_lang
           FROM (SELECT *, row_number() OVER
                   (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn FROM ls)
           WHERE rn = 1)
         SELECT q.doc_id, n_tokens, quality_score, is_repetitive, is_contaminated,
           is_benchmark, pred_lang,
           CASE WHEN is_benchmark = 1 THEN 'benchmark'
                WHEN is_contaminated = 1 THEN 'contaminated'
                WHEN n_tokens < 15 THEN 'too_short'
                WHEN quality_score < 0.2 THEN 'low_quality'
                WHEN is_repetitive = 1 THEN 'repetitive'
                WHEN pred_lang = 'und' THEN 'lang_unknown'
                ELSE 'keep' END AS reason,
           CAST(is_benchmark = 0 AND is_contaminated = 0 AND n_tokens >= 15
                AND quality_score >= 0.2 AND is_repetitive = 0
                AND pred_lang <> 'und' AS INT) AS keep
         FROM q JOIN r USING (doc_id) JOIN con USING (doc_id) JOIN lang USING (doc_id)"""
    },
    "text_top_terms" ->
      """WITH td AS (
           SELECT doc_id, unnest(list_distinct(regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))) AS term
           FROM documents)
         SELECT term, doc_freq, rank FROM (
           SELECT term, count(*) AS doc_freq,
             CAST(row_number() OVER (ORDER BY count(*) DESC, term) AS BIGINT) AS rank
           FROM td GROUP BY term)
         WHERE rank <= 25""",
    // quantile normalization: within-source rank mapped to the pooled
    // rank grid, single-doc sources to the pooled median index
    "text_qnorm" ->
      """WITH pool AS (
           SELECT n_chars AS pooled_value,
             CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS gidx
           FROM documents),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n_pool FROM documents),
         src AS (
           SELECT doc_id, source, n_chars,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
           FROM documents)
         SELECT doc_id, source, n_chars, pooled_value AS qnorm_chars
         FROM (SELECT doc_id, source, n_chars,
                 CASE WHEN n_src = 1 THEN (n_pool + 1) // 2
                      ELSE 1 + (rn - 1) * (n_pool - 1) // (n_src - 1) END AS gidx
               FROM src, n) m
         JOIN pool USING (gidx)""",
    // BM25 k1=1.2 b=0.75: per-term double of integer inputs,
    // e6-floored per term then summed; query = df-ranks 11..13
    "text_bm25" ->
      """WITH td AS (
           SELECT doc_id, unnest(regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                FROM td GROUP BY doc_id, term),
         dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM td GROUP BY doc_id),
         df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
         q AS (SELECT term, df FROM (
                 SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS r
                 FROM df) WHERE r BETWEEN 11 AND 13),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
         sc AS (
           SELECT tf.doc_id,
             CAST(floor(
               ln((n_docs - q.df + 0.5) / (q.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 0.3 + 0.9 * CAST(dl.dl AS DOUBLE) * n_docs / sum_dl)
               * 1e6 + 0.5) AS BIGINT) AS term_e6
           FROM tf JOIN q USING (term) JOIN dl USING (doc_id), tot)
         SELECT doc_id, score_e6, n_terms_hit, rank FROM (
           SELECT doc_id, CAST(sum(term_e6) AS BIGINT) AS score_e6,
             CAST(count(*) AS BIGINT) AS n_terms_hit,
             CAST(row_number() OVER (ORDER BY sum(term_e6) DESC, doc_id) AS BIGINT)
               AS rank
           FROM sc GROUP BY doc_id)
         WHERE rank <= 25""",
    "text_tfidf" ->
      """WITH td AS (
           SELECT doc_id, unnest(regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM td GROUP BY doc_id, term),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         n AS (SELECT count(*) AS n_docs FROM documents)
         SELECT doc_id, rank, term, tfidf FROM (
           SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df), 4) AS tfidf,
             CAST(row_number() OVER (PARTITION BY tf.doc_id
               ORDER BY tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df) DESC, tf.term)
               AS BIGINT) AS rank
           FROM tf JOIN df USING (term), n)
         WHERE rank <= 3""",
    "text_bigrams" ->
      """WITH t AS (
           SELECT regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tk
           FROM documents),
         b AS (SELECT unnest(list_transform(range(1, len(tk)),
                 i -> tk[i] || ' ' || tk[i + 1])) AS bigram FROM t)
         SELECT bigram, n, rank FROM (
           SELECT bigram, count(*) AS n,
             CAST(row_number() OVER (ORDER BY count(*) DESC, bigram) AS BIGINT) AS rank
           FROM b GROUP BY bigram)
         WHERE rank <= 25""",
    "text_phrase_search" ->
      // positional-index phrase replay: top-3 trigram queries, word-
      // level join proposing start = p - idx, hit iff all 3 distinct
      // idx arrived (repeat-word-safe)
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tk
           FROM documents),
         tris AS (
           SELECT unnest(list_transform(range(1, len(tk) - 1),
             i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS phrase
           FROM t WHERE len(tk) >= 3),
         topq AS (
           SELECT phrase FROM (
             SELECT phrase, row_number() OVER (ORDER BY count(*) DESC, phrase) AS rk
             FROM tris GROUP BY phrase)
           WHERE rk <= 3),
         pw AS (
           SELECT phrase, CAST(i - 1 AS BIGINT) AS idx, string_split(phrase, ' ')[i] AS w
           FROM topq CROSS JOIN LATERAL (SELECT unnest(range(1, 4)) AS i) r),
         pos AS (
           SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, tk[i] AS w
           FROM t CROSS JOIN LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) r),
         hits AS (
           SELECT pw.phrase, pos.doc_id, pos.p - pw.idx AS start
           FROM pos JOIN pw ON pw.w = pos.w
           GROUP BY 1, 2, 3 HAVING count(DISTINCT pw.idx) = 3)
         SELECT phrase, doc_id, CAST(count(*) AS BIGINT) AS n_hits,
           CAST(min(start) AS BIGINT) AS first_start
         FROM hits GROUP BY 1, 2""",
    "text_collocations" ->
      // Dice-ranked bigrams on the e6 integer grid, min count 5
      """WITH t AS (
           SELECT regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tk
           FROM documents),
         uc AS (
           SELECT w, count(*) AS c FROM (SELECT unnest(tk) AS w FROM t) GROUP BY w),
         pc AS (
           SELECT p.a AS a, p.b AS b, count(*) AS c_ab
           FROM (SELECT unnest(list_transform(range(1, len(tk)),
                   i -> {'a': tk[i], 'b': tk[i + 1]})) AS p FROM t)
           GROUP BY 1, 2 HAVING count(*) >= 5),
         d AS (
           SELECT a, b, c_ab, ua.c AS c_a, ub.c AS c_b,
             (2 * c_ab * 1000000) // (ua.c + ub.c) AS dice_e6
           FROM pc JOIN uc ua ON pc.a = ua.w JOIN uc ub ON pc.b = ub.w)
         SELECT rank, a, b, c_ab, c_a, c_b, dice_e6 FROM (
           SELECT CAST(row_number() OVER (ORDER BY dice_e6 DESC, a, b) AS BIGINT) AS rank, *
           FROM d) WHERE rank <= 25""",
    "text_lang_id" -> langIdOracle,
    "text_lang_confusion" ->
      // one aggregation over the (nested) lang-id replay
      s"""SELECT label_lang, pred_lang, count(*) AS n_docs,
            CAST(label_lang = pred_lang AS INT) AS is_correct
          FROM ($langIdOracle) GROUP BY label_lang, pred_lang""",
    "text_lang_kappa" ->
      // all-integer chance-corrected agreement over the same replayed
      // confusion frame: kappa = (N*D - E)/(N^2 - E) in HUGEINT
      s"""WITH conf AS (
           SELECT label_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
           FROM ($langIdOracle) GROUP BY 1, 2),
         rm AS (SELECT label_lang AS l, CAST(sum(n_docs) AS BIGINT) AS r FROM conf GROUP BY 1),
         cm AS (SELECT pred_lang AS l, CAST(sum(n_docs) AS BIGINT) AS c FROM conf GROUP BY 1),
         e AS (SELECT coalesce(sum(CAST(r AS HUGEINT) * c), 0) AS e_sum
               FROM rm JOIN cm USING (l)),
         d AS (SELECT CAST(coalesce(sum(n_docs), 0) AS BIGINT) AS diag
               FROM conf WHERE label_lang = pred_lang),
         t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_docs,
                 CAST(count(*) AS BIGINT) AS n_cells FROM conf)
         SELECT n_docs, n_cells, diag AS n_agree,
           CAST(CAST(diag AS HUGEINT) * 1000000 // n_docs AS BIGINT) AS po_e6,
           CAST(e_sum * 1000000 // (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT) AS pe_e6,
           CASE WHEN CAST(n_docs AS HUGEINT) * n_docs - e_sum > 0 THEN
             CAST((CASE WHEN CAST(n_docs AS HUGEINT) * diag - e_sum < 0 THEN -1 ELSE 1 END)
               * (abs(CAST(n_docs AS HUGEINT) * diag - e_sum) * 1000000
                  // (CAST(n_docs AS HUGEINT) * n_docs - e_sum)) AS BIGINT)
           ELSE NULL END AS kappa_e6
         FROM t, d, e""",
    "text_boilerplate" ->
      // the dedup_spans block CTE at blockLen=6 plus a distinct-doc df
      // table; boiler = participating block present in ≥3 docs
      """WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         b AS (
           SELECT doc_id, CAST(i AS BIGINT) AS idx,
             array_to_string(tok[(i*6+1):(i*6+6)], ' ') AS block
           FROM t CROSS JOIN LATERAL
             (SELECT unnest(range(0, (len(tok)+5)//6)) AS i) r),
         h AS (
           SELECT doc_id, idx, block,
             len(string_split(block, ' ')) >= 3 AS participates,
             ('0x' || substr(md5(block), 1, 15))::BIGINT AS h
           FROM b),
         df AS (
           SELECT h, count(DISTINCT doc_id) FILTER (WHERE participates) AS df
           FROM h GROUP BY h),
         k AS (
           SELECT x.doc_id, x.idx, x.block,
             x.participates AND df.df >= 3 AS boiler
           FROM h x JOIN df USING (h))
         SELECT doc_id, count(*) AS n_blocks,
           CAST(sum(CAST(boiler AS INT)) AS BIGINT) AS n_boiler,
           coalesce(string_agg(block, ' ' ORDER BY idx) FILTER (WHERE NOT boiler), '')
             AS cleaned_text
         FROM k GROUP BY doc_id""",
    "text_kl_drift" ->
      // per-term e6-quantized KL contributions summed as integers —
      // order-free, so the per-source drift is exact cross-engine
      """WITH tok AS (
           SELECT source,
             unnest(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
           FROM documents),
         cont AS (SELECT source, w, count(*) AS c_sw FROM tok GROUP BY source, w),
         bysrc AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s FROM cont GROUP BY source),
         bytok AS (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w FROM cont GROUP BY w),
         t AS (SELECT CAST(sum(c_sw) AS BIGINT) AS n_total FROM cont),
         terms AS (
           SELECT c.source, b.n_s,
             CAST(floor((CAST(c.c_sw AS DOUBLE) / b.n_s)
               * log2((CAST(c.c_sw AS DOUBLE) * CAST(t.n_total AS DOUBLE))
                      / (CAST(b.n_s AS DOUBLE) * CAST(x.c_w AS DOUBLE)))
               * 1000000 + 0.5) AS BIGINT) AS term_e6
           FROM cont c JOIN bysrc b USING (source) JOIN bytok x USING (w), t)
         SELECT source, n_s AS n_tokens, count(*) AS n_terms,
           CAST(sum(term_e6) AS BIGINT) / 1000000.0 AS kl_bits
         FROM terms GROUP BY source, n_s""",
    "text_js_drift" ->
      // present-pair float terms on the shared integer-product ratios
      // (e6-quantized per term), absent-token tail as the exact
      // closed-form quotient (n_total - cov) / (2 n_total)
      """WITH tok AS (
           SELECT source,
             unnest(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
           FROM documents),
         cont AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c_sw FROM tok GROUP BY source, w),
         bysrc AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s FROM cont GROUP BY source),
         bytok AS (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w FROM cont GROUP BY w),
         t AS (SELECT CAST(sum(c_sw) AS BIGINT) AS n_total FROM cont),
         terms AS (
           SELECT c.source, b.n_s, t.n_total, x.c_w,
             CAST(floor((
               (CAST(c.c_sw AS DOUBLE) / b.n_s)
                 * log2((2.0 * CAST(c.c_sw AS DOUBLE) * CAST(t.n_total AS DOUBLE))
                        / (CAST(c.c_sw AS DOUBLE) * CAST(t.n_total AS DOUBLE)
                           + CAST(x.c_w AS DOUBLE) * CAST(b.n_s AS DOUBLE)))
               + (CAST(x.c_w AS DOUBLE) / t.n_total)
                 * log2((2.0 * CAST(x.c_w AS DOUBLE) * CAST(b.n_s AS DOUBLE))
                        / (CAST(c.c_sw AS DOUBLE) * CAST(t.n_total AS DOUBLE)
                           + CAST(x.c_w AS DOUBLE) * CAST(b.n_s AS DOUBLE)))
             ) * 1000000 + 0.5) AS BIGINT) AS term_e6
           FROM cont c JOIN bysrc b USING (source) JOIN bytok x USING (w), t)
         SELECT source, n_s AS n_tokens, CAST(count(*) AS BIGINT) AS n_terms,
           CAST(CAST(sum(c_w) AS HUGEINT) * 1000000 // n_total AS BIGINT) AS coverage_e6,
           CAST(CAST(sum(term_e6) AS BIGINT) // 2
             + CAST(n_total - sum(c_w) AS HUGEINT) * 1000000 // (2 * n_total)
             AS BIGINT) AS js_e6
         FROM terms GROUP BY source, n_s, n_total""",
    "text_bigram_ppl" ->
      // self-trained add-one bigram LM; per-bigram surprisal
      // e6-quantized before the order-free per-doc sum
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tk
           FROM documents),
         db2 AS (
           SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
           FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
                 FROM t WHERE len(tk) >= 2)),
         c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM db2 GROUP BY 1, 2),
         c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
         v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
               FROM (SELECT unnest(tk) AS w FROM t)),
         terms AS (
           SELECT d.doc_id,
             CAST(floor(log2(CAST(c1.c1 + v.v AS DOUBLE) / CAST(c12.c12 + 1 AS DOUBLE))
               * 1e6 + 0.5) AS BIGINT) AS term_e6
           FROM db2 d JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(term_e6) // count(*) AS BIGINT) AS h_bits_e6
         FROM terms GROUP BY 1""",
    "text_char_entropy" ->
      // per-char cnt*log2(n/cnt) e6-quantized terms, one div per doc
      """WITH ch AS (
           SELECT doc_id, unnest(regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '')) AS ch
           FROM documents),
         pc AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS cnt
                FROM ch WHERE ch <> '' GROUP BY 1, 2),
         pd AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n FROM pc GROUP BY 1),
         terms AS (
           SELECT pc.doc_id, n,
             CAST(floor(CAST(cnt AS DOUBLE)
               * log2(CAST(n AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
               AS term_e6
           FROM pc JOIN pd USING (doc_id))
         SELECT doc_id, CAST(max(n) AS BIGINT) AS n_chars,
           CAST(count(*) AS BIGINT) AS n_distinct_chars,
           CAST(sum(term_e6) // max(n) AS BIGINT) AS h_bits_e6
         FROM terms GROUP BY 1""",
    "text_msttr" ->
      // full 25-token segments; distinct counts inside the array
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tk
           FROM documents),
         d AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
                 CAST(len(tk) // 25 AS BIGINT) AS n_segments, tk
               FROM t WHERE len(tk) >= 25),
         segs AS (SELECT doc_id, n_tokens, n_segments,
                    unnest(range(0, n_segments)) AS seg, tk FROM d),
         dc AS (SELECT doc_id, n_tokens, n_segments,
                  CAST(len(list_distinct(tk[seg * 25 + 1 : seg * 25 + 25])) AS BIGINT)
                    AS d_cnt
                FROM segs)
         SELECT doc_id, n_tokens, n_segments,
           CAST(sum(d_cnt) * 1000000 // (25 * n_segments) AS BIGINT) AS msttr_e6
         FROM dc GROUP BY 1, 2, 3""",
    "text_readability" ->
      // #30's whitespace-token convention + the #79 regexp_count <->
      // len(regexp_extract_all) parity; e3 Flesch grid
      """WITH base AS (
           SELECT doc_id,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(lower(trim(text)), '\s+')) END AS BIGINT)
               AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
               AS n_sentences,
             CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS BIGINT)
               AS n_syllables
           FROM documents)
         SELECT doc_id, n_words, n_sentences, n_syllables,
           n_words * 1000 // n_sentences AS wps_e3,
           n_syllables * 1000 // greatest(n_words, 1) AS spw_e3,
           206835 - 1015 * n_words // n_sentences
             - 84600 * n_syllables // greatest(n_words, 1) AS flesch_e3
         FROM base""",
    "text_heavy_hitters" ->
      // batch Misra-Gries merge replay: per-shard top-16 counters each
      // reduced by the shard's 17th count, summed, reduced once more by
      // the merged 17th — the oracle replays the merged counters
      // bit-exactly and emits the constant-1 contract flag the theorem
      // demands (Spark emits the measured check)
      """WITH tok AS (
           SELECT doc_id % 4 AS shard,
             unnest(regexp_split_to_array(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
           FROM documents),
         ps AS (SELECT shard, term, count(*) AS c FROM tok GROUP BY 1, 2),
         rk AS (SELECT *, row_number() OVER (PARTITION BY shard
                  ORDER BY c DESC, term) AS rk FROM ps),
         dec AS (SELECT shard, c AS dec FROM rk WHERE rk = 17),
         summ AS (
           SELECT r.shard, r.term, r.c - coalesce(d.dec, 0) AS cnt
           FROM rk r LEFT JOIN dec d ON r.shard = d.shard
           WHERE r.rk <= 16 AND r.c - coalesce(d.dec, 0) > 0),
         m0 AS (SELECT term, CAST(sum(cnt) AS BIGINT) AS m FROM summ GROUP BY 1),
         mr AS (SELECT *, row_number() OVER (ORDER BY m DESC, term) AS rk FROM m0),
         mdec AS (SELECT coalesce(max(m), 0) AS mdec FROM mr WHERE rk = 17),
         mf AS (SELECT term, m - mdec AS mg FROM mr, mdec
                WHERE rk <= 16 AND m - mdec > 0),
         ex AS (SELECT term, count(*) AS n_exact FROM tok GROUP BY 1),
         nt AS (SELECT count(*) AS n_total FROM tok),
         t10 AS (
           SELECT term, n_exact,
             CAST(row_number() OVER (ORDER BY n_exact DESC, term) AS BIGINT) AS rank
           FROM ex QUALIFY rank <= 10)
         SELECT rank, t10.term, n_exact, coalesce(mf.mg, 0) AS mg_count,
           CAST(n_exact * 17 > n_total AS INT) AS guaranteed,
           1 AS mg_ok
         FROM t10 LEFT JOIN mf ON t10.term = mf.term, nt""",
    "text_sparse_sim" ->
      // inverted-index cosine replay: integer tf dot products over the
      // df-pruned 3-token shingle vocabulary, one sqrt on the exact
      // integer norm product, rank on the raw double with
      // (doc_a, doc_b) tiebreak
      """WITH toks0 AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         td AS (
           SELECT doc_id,
             unnest(CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                    ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)]
                    END) AS term
           FROM toks0),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM td GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         kept AS (
           SELECT tf.doc_id, tf.term, tf.tf
           FROM tf JOIN df ON tf.term = df.term
           WHERE df.df BETWEEN 2 AND 100),
         norms AS (
           SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS nrm2
           FROM kept GROUP BY 1),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(sum(a.tf * b.tf) AS BIGINT) AS dot, count(*) AS n_shared
           FROM kept a JOIN kept b ON a.term = b.term AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         c AS (
           SELECT doc_a, doc_b, n_shared, dot,
             dot / sqrt(CAST(na.nrm2 * nb.nrm2 AS DOUBLE)) AS cr
           FROM pairs
           JOIN norms na ON doc_a = na.doc_id
           JOIN norms nb ON doc_b = nb.doc_id)
         SELECT doc_a, doc_b, n_shared, dot, round(cr, 6) AS cosine
         FROM c
         QUALIFY row_number() OVER (ORDER BY cr DESC, doc_a, doc_b) <= 50""",
    "text_novelty" ->
      // corpus-unique shingle fraction per document on the e6 grid
      """WITH toks0 AS (
           SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         sh AS (
           SELECT doc_id,
             unnest(list_distinct(
               CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
                    ELSE [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)]
               END)) AS s
           FROM toks0),
         df AS (SELECT s, count(*) AS df FROM sh GROUP BY 1)
         SELECT doc_id, count(*) AS n_shingles,
           CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
           CAST((sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT)
             AS novelty_e6
         FROM sh JOIN df ON sh.s = df.s
         GROUP BY doc_id""",
    // KS per source (the #190 grid) -> truncated Kolmogorov p (3
    // signed e6-floored terms, clamped) -> BH step-up with the
    // threshold compare cross-multiplied to exact integers
    "text_bh_fdr" ->
      """WITH cont AS (
           SELECT source, n_chars AS len, count(*) AS c_sl
           FROM documents GROUP BY 1, 2),
         bylen AS (SELECT len, CAST(sum(c_sl) AS BIGINT) AS c_l FROM cont GROUP BY 1),
         bysrc AS (SELECT source, CAST(sum(c_sl) AS BIGINT) AS n_s FROM cont GROUP BY 1),
         tot AS (SELECT CAST(sum(c_sl) AS BIGINT) AS n FROM cont),
         grid AS (
           SELECT s.source, l.len, s.n_s, l.c_l, COALESCE(c.c_sl, 0) AS c_sl
           FROM bysrc s CROSS JOIN bylen l
           LEFT JOIN cont c ON c.source = s.source AND c.len = l.len),
         cum AS (
           SELECT source, len, n_s,
             sum(c_sl) OVER (PARTITION BY source ORDER BY len) AS ca,
             sum(c_l) OVER (PARTITION BY source ORDER BY len) AS c_all
           FROM grid),
         scored AS (
           SELECT source, len, n_s, n - n_s AS nb,
             abs(CAST(ca AS HUGEINT) * (n - n_s)
                 - CAST(c_all - ca AS HUGEINT) * n_s) AS num
           FROM cum, tot),
         ks AS (
           SELECT source, n_s AS n_docs,
             CAST((num * 1000000) // (CAST(n_s AS HUGEINT) * nb) AS BIGINT) AS ks_e6
           FROM (SELECT *, row_number() OVER (PARTITION BY source
                   ORDER BY num DESC, len) AS rk FROM scored)
           WHERE rk = 1),
         mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ks),
         withp AS (
           SELECT source, n_docs, ks_e6,
             greatest(0, least(1000000,
                 CAST(floor(2 * exp(-2.0 * lam2) * 1e6 + 0.5) AS BIGINT)
               - CAST(floor(2 * exp(-8.0 * lam2) * 1e6 + 0.5) AS BIGINT)
               + CAST(floor(2 * exp(-18.0 * lam2) * 1e6 + 0.5) AS BIGINT))) AS p_e6
           FROM (SELECT source, n_docs, ks_e6,
                   (CAST(ks_e6 AS DOUBLE) / 1e6) * (CAST(ks_e6 AS DOUBLE) / 1e6)
                   * (CAST(n_docs AS DOUBLE) * (n - n_docs) / n) AS lam2
                 FROM ks, tot)),
         ranked AS (
           SELECT *, CAST(row_number() OVER (ORDER BY p_e6, source) AS BIGINT) AS bh_rank,
             CASE WHEN p_e6 * m <= CAST(row_number() OVER (ORDER BY p_e6, source) AS BIGINT)
                       * 50000 THEN 1 ELSE 0 END AS passes
           FROM withp, mm)
         SELECT source, n_docs, ks_e6, p_e6, bh_rank,
           CAST(bh_rank <= max(CASE WHEN passes = 1 THEN bh_rank ELSE 0 END) OVER ()
             AS BIGINT) AS rejected
         FROM ranked""",
    "text_ks_drift" ->
      // Cross-multiplied two-sample KS on the (source × distinct
      // length) grid; HUGEINT replays the DECIMAL(38,0) floor div.
      """WITH cont AS (
           SELECT source, n_chars AS len, count(*) AS c_sl
           FROM documents GROUP BY 1, 2),
         bylen AS (SELECT len, CAST(sum(c_sl) AS BIGINT) AS c_l FROM cont GROUP BY 1),
         bysrc AS (SELECT source, CAST(sum(c_sl) AS BIGINT) AS n_s FROM cont GROUP BY 1),
         tot AS (SELECT CAST(sum(c_sl) AS BIGINT) AS n FROM cont),
         grid AS (
           SELECT s.source, l.len, s.n_s, l.c_l, COALESCE(c.c_sl, 0) AS c_sl
           FROM bysrc s CROSS JOIN bylen l
           LEFT JOIN cont c ON c.source = s.source AND c.len = l.len),
         cum AS (
           SELECT source, len, n_s,
             sum(c_sl) OVER (PARTITION BY source ORDER BY len) AS ca,
             sum(c_l) OVER (PARTITION BY source ORDER BY len) AS c_all
           FROM grid),
         scored AS (
           SELECT source, len, n_s, n - n_s AS nb,
             abs(CAST(ca AS HUGEINT) * (n - n_s)
                 - CAST(c_all - ca AS HUGEINT) * n_s) AS num
           FROM cum, tot),
         best AS (
           SELECT source, len, n_s, nb, num,
             row_number() OVER (PARTITION BY source ORDER BY num DESC, len) AS rk
           FROM scored)
         SELECT source, n_s AS n_docs,
           CAST((num * 1000000) // (CAST(n_s AS HUGEINT) * nb) AS BIGINT) AS ks_e6,
           len AS at_len
         FROM best WHERE rk = 1""",
    "text_hapax" ->
      """WITH td AS (
           SELECT source, unnest(regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
           FROM documents),
         tc AS (SELECT source, term, count(*) AS c FROM td GROUP BY 1, 2)
         SELECT source, CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(count(*) FILTER (c = 1) AS BIGINT) AS n_hapax,
           CAST(count(*) FILTER (c = 2) AS BIGINT) AS n_dis,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST((count(*) FILTER (c = 1)) * 1000000 // count(*) AS BIGINT)
             AS hapax_rate_e6
         FROM tc GROUP BY 1""",
    "text_burstiness" ->
      // per-doc counts; VMR over ALL docs (zeros via N only) as one
      // truncating e6 HUGEINT quotient; (df desc, term) top-20
      """WITH tok AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
           FROM documents),
         pd AS (SELECT w, doc_id, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
         nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         st AS (
           SELECT w AS term, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c) AS BIGINT) AS total_count,
             sum(CAST(c AS HUGEINT) * c) AS q
           FROM pd GROUP BY 1)
         SELECT term, n_docs, df, total_count,
           CAST((CAST(n_docs AS HUGEINT) * q
                 - CAST(total_count AS HUGEINT) * total_count) * 1000000
             // (CAST(n_docs AS HUGEINT) * total_count) AS BIGINT) AS vmr_e6
         FROM st, nd
         ORDER BY df DESC, term
         LIMIT 20""",
    "text_cond_entropy" ->
      // e6-quantized entropy terms over unigram and bigram grids;
      // conditional = the exact difference on the published grid
      """WITH t AS (
           SELECT regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tk
           FROM documents),
         uni AS (SELECT unnest(tk) AS g FROM t),
         uc AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY 1),
         un AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uc),
         uh AS (
           SELECT max(n) AS n_tokens, CAST(count(*) AS BIGINT) AS vocab,
             CAST(sum(CAST(floor((CAST(c AS DOUBLE) / n)
               * log2(CAST(n AS DOUBLE) / CAST(c AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS h_unigram_e6
           FROM uc, un),
         bi AS (SELECT unnest(list_transform(range(1, len(tk)),
                  i -> tk[i] || ' ' || tk[i + 1])) AS g FROM t),
         bc AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM bi GROUP BY 1),
         bn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM bc),
         bh AS (
           SELECT max(n) AS n_bigrams, CAST(count(*) AS BIGINT) AS distinct_bigrams,
             CAST(sum(CAST(floor((CAST(c AS DOUBLE) / n)
               * log2(CAST(n AS DOUBLE) / CAST(c AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS h_bigram_e6
           FROM bc, bn)
         SELECT n_tokens, vocab, h_unigram_e6, n_bigrams, distinct_bigrams, h_bigram_e6,
           h_bigram_e6 - h_unigram_e6 AS h_cond_e6
         FROM uh, bh""",
    "text_zipf" ->
      """WITH td AS (
           SELECT source, unnest(regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
           FROM documents),
         tc AS (SELECT source, term, count(*) AS c FROM td GROUP BY 1, 2),
         rk AS (
           SELECT source, term, c,
             row_number() OVER (PARTITION BY source ORDER BY c DESC, term) AS r
           FROM tc),
         oct AS (
           SELECT source, c, r, CAST(log2(r) AS BIGINT) AS octave
           FROM rk WHERE (r & (r - 1)) = 0)
         SELECT source, octave, CAST(r AS BIGINT) AS rank, CAST(c AS BIGINT) AS freq,
           (c * 1000000) // (lag(c) OVER (PARTITION BY source ORDER BY r))
             AS octave_ratio_e6
         FROM oct""",
    "text_rake" ->
      """WITH toks0 AS (
           SELECT doc_id, regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         pos AS (
           SELECT doc_id, e.p, e.w,
             e.w IN ('the','a','of','and','to','in','is','it','that','for')
               AS is_stop
           FROM (SELECT doc_id,
                   unnest([{'p': i - 1, 'w': tok[i]}
                           for i in generate_series(1, len(tok))]) AS e
                 FROM toks0)),
         runs AS (
           SELECT doc_id, p, w, is_stop,
             CASE WHEN NOT is_stop AND coalesce(
                    lag(is_stop) OVER (PARTITION BY doc_id ORDER BY p), true)
                  THEN 1 ELSE 0 END AS run_start
           FROM pos),
         runid AS (
           SELECT doc_id, p, w, is_stop,
             CAST(sum(run_start) OVER (PARTITION BY doc_id ORDER BY p)
               AS BIGINT) AS run_id
           FROM runs),
         nr AS (SELECT doc_id, p, w, run_id FROM runid WHERE NOT is_stop),
         ph AS (
           SELECT doc_id, run_id, string_agg(w, ' ' ORDER BY p) AS phrase,
             CAST(count(*) AS BIGINT) AS len
           FROM nr GROUP BY 1, 2),
         ws AS (
           SELECT w,
             (CAST(sum(len) AS BIGINT) * 1000000) // count(*) AS wscore_e6
           FROM nr JOIN ph USING (doc_id, run_id) GROUP BY 1),
         psc AS (
           SELECT doc_id, run_id, CAST(sum(wscore_e6) AS BIGINT) AS score_e6
           FROM nr JOIN ws USING (w) GROUP BY 1, 2)
         SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
           min(len) AS n_words, CAST(min(score_e6) AS BIGINT) AS score_e6
         FROM ph JOIN psc USING (doc_id, run_id)
         GROUP BY 1 ORDER BY score_e6 DESC, phrase LIMIT 10""",
    "text_textrank" ->
      // window-2 co-occurrence graph + the #124 integer e8 trajectory
      // unrolled 2 rounds; vertices = edge endpoints; top-20
      """WITH toks0 AS (
           SELECT doc_id, regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         pos AS (
           SELECT doc_id, e.p, e.w
           FROM (SELECT doc_id,
                   unnest([{'p': i - 1, 'w': tok[i]}
                           for i in generate_series(1, len(tok))]) AS e
                 FROM toks0)
           WHERE e.w NOT IN ('the','a','of','and','to','in','is','it','that','for')),
         pc AS (
           SELECT least(a.w, b.w) AS w_lo, greatest(a.w, b.w) AS w_hi,
             CAST(count(*) AS BIGINT) AS cw
           FROM pos a JOIN pos b
             ON a.doc_id = b.doc_id AND b.p > a.p AND b.p <= a.p + 2
               AND a.w <> b.w
           GROUP BY 1, 2),
         e AS (
           SELECT w_lo AS src, w_hi AS dst, cw FROM pc
           UNION ALL SELECT w_hi, w_lo, cw FROM pc),
         ow AS (SELECT src, CAST(sum(cw) AS BIGINT) AS wout FROM e GROUP BY 1),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ow),
         r0 AS (SELECT src AS word, CAST(100000000 // n AS BIGINT) AS r FROM ow, nn),
         r1 AS (
           SELECT e.dst AS word,
             CAST(15 * 100000000 // (100 * n) + (85 * sum(r0.r * e.cw // ow.wout)) // 100
               AS BIGINT) AS r
           FROM e JOIN ow ON ow.src = e.src JOIN r0 ON r0.word = e.src, nn
           GROUP BY 1, n),
         r2 AS (
           SELECT e.dst AS word,
             CAST(15 * 100000000 // (100 * n) + (85 * sum(r1.r * e.cw // ow.wout)) // 100
               AS BIGINT) AS r
           FROM e JOIN ow ON ow.src = e.src JOIN r1 ON r1.word = e.src, nn
           GROUP BY 1, n)
         SELECT word, r AS tr_e8,
           CAST(row_number() OVER (ORDER BY r DESC, word) AS BIGINT) AS rank
         FROM r2 QUALIFY rank <= 20""",
    "text_kn_ppl" ->
      // interpolated Kneser-Ney D=0.75; e9-rounded per-bigram nll so
      // the instance-weighted sums are exact integers
      """WITH t AS (
           SELECT regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tk
           FROM documents),
         bg AS (SELECT unnest(list_transform(range(1, len(tk)),
                  i -> tk[i] || ' ' || tk[i + 1])) AS b FROM t),
         bi AS (SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2 FROM bg),
         c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bi GROUP BY 1, 2),
         byw1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
                    CAST(count(*) AS BIGINT) AS nsucc FROM c12 GROUP BY 1),
         byw2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS npred FROM c12 GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS bb, CAST(sum(c12) AS BIGINT) AS nn
                 FROM c12),
         terms AS (
           SELECT c12,
             CAST(floor((0.0 - ln((CAST(c12 AS DOUBLE) - 0.75) / CAST(c1 AS DOUBLE)
                 + (0.75 * CAST(nsucc AS DOUBLE) / CAST(c1 AS DOUBLE))
                   * (CAST(npred AS DOUBLE) / CAST(bb AS DOUBLE)))) * 1000000000 + 0.5)
               AS BIGINT) AS nll_kn_e9,
             CAST(floor((0.0 - ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)))
                 * 1000000000 + 0.5) AS BIGINT) AS nll_mle_e9,
             bb, nn
           FROM c12 JOIN byw1 USING (w1) JOIN byw2 USING (w2), tot),
         agg AS (
           SELECT CAST(max(nn) AS BIGINT) AS n_bigram_tokens,
             CAST(max(bb) AS BIGINT) AS n_distinct_bigrams,
             sum(CAST(c12 AS HUGEINT) * nll_kn_e9) AS skn,
             sum(CAST(c12 AS HUGEINT) * nll_mle_e9) AS smle
           FROM terms)
         SELECT n_bigram_tokens, n_distinct_bigrams,
           CAST(skn // n_bigram_tokens AS BIGINT) AS h_kn_e9,
           CAST(smle // n_bigram_tokens AS BIGINT) AS h_mle_e9,
           CAST((skn - smle) // n_bigram_tokens AS BIGINT) AS smoothing_cost_e9
         FROM agg""",
    "text_good_turing" ->
      // count-of-counts spectrum; r* and P0 as integer divs
      """WITH t AS (
           SELECT regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tk
           FROM documents),
         tf AS (SELECT unnest(list_transform(range(1, len(tk)),
                  i -> tk[i] || ' ' || tk[i + 1])) AS term FROM t),
         tc AS (SELECT term, CAST(count(*) AS BIGINT) AS r FROM tf GROUP BY 1),
         sp AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM tc GROUP BY 1),
         tot AS (SELECT CAST(sum(r) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS vocab FROM tc),
         n1 AS (SELECT CAST(coalesce(sum(CASE WHEN r = 1 THEN n_r END), 0) AS BIGINT)
                  AS nr1 FROM sp),
         j AS (
           SELECT a.r AS r, a.n_r AS n_r, COALESCE(b.n_r, 0) AS n_next,
             n_tokens, vocab, nr1
           FROM sp a LEFT JOIN sp b ON b.r = a.r + 1, tot, n1
           WHERE a.r <= 10)
         SELECT r, n_r, n_next, n_tokens, vocab,
           (r + 1) * n_next * 1000000 // n_r AS r_star_e6,
           (r + 1) * n_next * 1000000000 // (n_r * n_tokens) AS p_r_e9,
           nr1 * 1000000 // n_tokens AS p0_e6
         FROM j""",
    "text_heaps" ->
      // FLAT global doc-rank replay of the hierarchical build; the
      // doubling checkpoints derive from the corpus count
      """WITH docs AS (
           SELECT doc_id, regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tok
           FROM documents),
         n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM docs),
         cps AS (
           SELECT DISTINCT CAST(CASE WHEN pow(2, i) < c THEN pow(2, i) ELSE c END
             AS BIGINT) AS n_docs
           FROM generate_series(1, 40) g(i), n),
         rk AS (
           SELECT doc_id,
             CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rank,
             CAST(len(tok) AS BIGINT) AS n_tok
           FROM docs),
         fo AS (
           SELECT t.term, min(r.rank) AS first_rank
           FROM (SELECT doc_id, unnest(list_distinct(tok)) AS term FROM docs) t
           JOIN rk r ON r.doc_id = t.doc_id GROUP BY 1),
         v AS (
           SELECT n_docs, CAST(count(*) AS BIGINT) AS vocab_size
           FROM cps, fo WHERE first_rank <= n_docs GROUP BY 1),
         tk AS (
           SELECT n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
           FROM cps, rk WHERE rank <= n_docs GROUP BY 1)
         SELECT v.n_docs, tk.n_tokens, v.vocab_size
         FROM v JOIN tk ON tk.n_docs = v.n_docs""",
    "text_clumping" ->
      // per-(term, doc) counts -> per-term (cf, df); top-25 by
      // (clump desc, term)
      """WITH pd AS (
           SELECT term, doc_id, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT doc_id, unnest(regexp_split_to_array(
                   regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
                 FROM documents)
           GROUP BY 1, 2),
         t AS (
           SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c) AS BIGINT) AS cf, CAST(max(c) AS BIGINT) AS max_in_doc
           FROM pd GROUP BY 1)
         SELECT term, df, cf, max_in_doc,
           (cf * 1000000) // df AS clump_e6,
           CAST(row_number() OVER (ORDER BY (cf * 1000000) // df DESC, term)
             AS BIGINT) AS rank
         FROM t WHERE df >= 5
         QUALIFY rank <= 25""",
    "text_simpson" ->
      // #197's per-source term counts; both quotients single HUGEINT
      // divisions
      """WITH td AS (
           SELECT source, unnest(regexp_split_to_array(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
           FROM documents),
         tc AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c FROM td GROUP BY 1, 2),
         ag AS (
           SELECT source, CAST(count(*) AS BIGINT) AS vocab_size,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             sum(CAST(c AS HUGEINT) * (c - 1)) AS rep
           FROM tc GROUP BY 1)
         SELECT source, vocab_size, n_tokens, CAST(rep AS BIGINT) AS repeat_pairs,
           CAST((rep * 1000000000)
             // (CAST(n_tokens AS HUGEINT) * (n_tokens - 1)) AS BIGINT) AS simpson_e9,
           CASE WHEN rep > 0 THEN
             CAST((CAST(n_tokens AS HUGEINT) * (n_tokens - 1) * 1000) // rep AS BIGINT)
           ELSE NULL END AS inv_simpson_e3
         FROM ag WHERE n_tokens > 1""",
    "text_mutual_info" ->
      // per-cell e6-quantized MI terms on integer-product ratios;
      // marginal entropies likewise; NMI as a sign-factored quotient
      """WITH cont AS (
           SELECT lang, source, CAST(count(*) AS BIGINT) AS c_ij
           FROM documents GROUP BY 1, 2),
         bl AS (SELECT lang, CAST(sum(c_ij) AS BIGINT) AS r_i FROM cont GROUP BY 1),
         bs AS (SELECT source, CAST(sum(c_ij) AS BIGINT) AS c_j FROM cont GROUP BY 1),
         t AS (SELECT CAST(sum(c_ij) AS BIGINT) AS n_docs FROM cont),
         mi AS (
           SELECT CAST(count(*) AS BIGINT) AS n_cells, max(t.n_docs) AS n_docs,
             CAST(sum(CAST(floor(
               (CAST(c.c_ij AS DOUBLE) / t.n_docs)
                 * log2((CAST(c.c_ij AS DOUBLE) * CAST(t.n_docs AS DOUBLE))
                        / (CAST(bl.r_i AS DOUBLE) * CAST(bs.c_j AS DOUBLE)))
               * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS mi_e6
           FROM cont c JOIN bl USING (lang) JOIN bs USING (source), t),
         hl AS (
           SELECT CAST(count(*) AS BIGINT) AS n_langs,
             CAST(sum(CAST(floor(
               (CAST(r_i AS DOUBLE) / n_docs)
                 * log2(CAST(n_docs AS DOUBLE) / CAST(r_i AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS h_lang_e6
           FROM bl, t),
         hs AS (
           SELECT CAST(count(*) AS BIGINT) AS n_sources,
             CAST(sum(CAST(floor(
               (CAST(c_j AS DOUBLE) / n_docs)
                 * log2(CAST(n_docs AS DOUBLE) / CAST(c_j AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS h_source_e6
           FROM bs, t)
         SELECT n_docs, n_langs, n_sources, n_cells, mi_e6, h_lang_e6, h_source_e6,
           CASE WHEN least(h_lang_e6, h_source_e6) > 0 THEN
             CAST((CASE WHEN mi_e6 < 0 THEN -1 ELSE 1 END)
               * (abs(CAST(mi_e6 AS HUGEINT)) * 1000000
                  // least(h_lang_e6, h_source_e6)) AS BIGINT)
           ELSE NULL END AS nmi_e6
         FROM mi, hl, hs"""
  )
}
