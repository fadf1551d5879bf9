package graft

import graft.operators._

/** similarity search: brute force, LSH, IVF, PQ, graphs + recall curves — split verbatim out of SparkEntry.oracleSql
  * (r10 file-size refactor); the assembled map is identical.
  */
private[graft] trait OracleAnn { this: SparkEntryOracleHelpers =>
  protected def oracleAnn: Map[String, String] = Map(
    "ann_centroid_assign" -> {
      // 64 per-dimension avg terms, float-cast to mirror the Spark
      // side's float centroid arrays bit-for-bit
      val terms = (1 to 64).map(i => s"CAST(avg(embedding[$i]) AS FLOAT)").mkString(", ")
      s"""WITH c AS (SELECT label, [$terms] AS centroid
                     FROM embeddings GROUP BY label)
          SELECT vec_id, label, assigned_label, cos FROM (
            SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
              CAST(c.label AS BIGINT) AS assigned_label,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], c.centroid::DOUBLE[]), 6) AS cos,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY round(list_cosine_similarity(
                  e.embedding::DOUBLE[], c.centroid::DOUBLE[]), 6) DESC, c.label) AS rn
            FROM embeddings e, c)
          WHERE rn = 1"""
    },
    "ann_project" -> {
      // Same ±1 literals in the same textual order as the Spark plan
      // (both derived from Similarity.rpSign's public md5 parity), so
      // the signed double sums round identically.
      val k = 16
      val rows = (0 until k).map { j =>
        (0 until 64)
          .map(i =>
            s"${if (graft.operators.Similarity.rpSign(i, j) > 0) "+" else "-"} CAST(embedding[${i + 1}] AS DOUBLE)")
          .mkString(" ")
      }
      val ys = rows.map(t => s"round((0.0 $t) / sqrt(CAST($k AS DOUBLE)), 6)").mkString(", ")
      val poss = (0 until k).map(_.toString).mkString(", ")
      s"""SELECT vec_id, CAST(unnest([$poss]) AS BIGINT) AS pos,
            unnest([$ys]) AS y
          FROM embeddings"""
    },
    "ann_project_search" -> projectSearchOracle,
    // the materialized-index variant is bit-identical by construction
    // (same projection floats, same two-stage ranking) — same oracle
    "ann_project_indexed" -> projectSearchOracle,
    "ann_mmr" -> mmrOracle(k = 10, poolK = 50),
    "ann_binary_quant" ->
      // 1-bit lane packing, Hamming shortlist, exact-cosine rerank
      """WITH binbits AS (
            SELECT vec_id,
              CAST(sum(CASE WHEN embedding[i] >= 0 AND i <= 32
                   THEN (1::BIGINT << (i - 1)) ELSE 0 END) AS BIGINT) AS w_lo,
              CAST(sum(CASE WHEN embedding[i] >= 0 AND i > 32
                   THEN (1::BIGINT << (i - 33)) ELSE 0 END) AS BIGINT) AS w_hi
            FROM embeddings, generate_series(1, 64) AS g(i) GROUP BY 1),
          binq AS (SELECT vec_id AS query_id, w_lo AS q_lo, w_hi AS q_hi
                   FROM binbits WHERE vec_id < 10),
          binqe AS (SELECT vec_id AS query_id, embedding AS q_emb
                    FROM embeddings WHERE vec_id < 10),
          binham AS (
            SELECT q.query_id, b.vec_id,
              CAST(bit_count(xor(b.w_lo, q.q_lo)) + bit_count(xor(b.w_hi, q.q_hi)) AS BIGINT)
                AS hamming
            FROM binbits b, binq q WHERE b.vec_id <> q.query_id),
          binshort AS (
            SELECT query_id, vec_id, hamming FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY hamming, vec_id) AS hr
              FROM binham)
            WHERE hr <= 50),
          binrr AS (
            SELECT s.query_id, s.vec_id, s.hamming,
              round(list_cosine_similarity(e.embedding::DOUBLE[], qe.q_emb::DOUBLE[]), 6) AS cos
            FROM binshort s
            JOIN embeddings e ON e.vec_id = s.vec_id
            JOIN binqe qe ON qe.query_id = s.query_id),
          bintop AS (
            SELECT query_id, vec_id, hamming, cos,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
            FROM binrr)
          SELECT query_id, vec_id, hamming, cos, rank
          FROM bintop WHERE rank <= 10""",
    "ann_binary_recall" ->
      // the #346 pipeline vs the brute-force truth, one left join
      """WITH binbits AS (
            SELECT vec_id,
              CAST(sum(CASE WHEN embedding[i] >= 0 AND i <= 32
                   THEN (1::BIGINT << (i - 1)) ELSE 0 END) AS BIGINT) AS w_lo,
              CAST(sum(CASE WHEN embedding[i] >= 0 AND i > 32
                   THEN (1::BIGINT << (i - 33)) ELSE 0 END) AS BIGINT) AS w_hi
            FROM embeddings, generate_series(1, 64) AS g(i) GROUP BY 1),
          binq AS (SELECT vec_id AS query_id, w_lo AS q_lo, w_hi AS q_hi
                   FROM binbits WHERE vec_id < 10),
          binqe AS (SELECT vec_id AS query_id, embedding AS q_emb
                    FROM embeddings WHERE vec_id < 10),
          binham AS (
            SELECT q.query_id, b.vec_id,
              CAST(bit_count(xor(b.w_lo, q.q_lo)) + bit_count(xor(b.w_hi, q.q_hi)) AS BIGINT)
                AS hamming
            FROM binbits b, binq q WHERE b.vec_id <> q.query_id),
          binshort AS (
            SELECT query_id, vec_id, hamming FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY hamming, vec_id) AS hr
              FROM binham)
            WHERE hr <= 50),
          binrr AS (
            SELECT s.query_id, s.vec_id, s.hamming,
              round(list_cosine_similarity(e.embedding::DOUBLE[], qe.q_emb::DOUBLE[]), 6) AS cos
            FROM binshort s
            JOIN embeddings e ON e.vec_id = s.vec_id
            JOIN binqe qe ON qe.query_id = s.query_id),
          bintop AS (
            SELECT query_id, vec_id, hamming, cos,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
            FROM binrr),
          bq AS (SELECT query_id, vec_id, rank AS brank FROM bintop WHERE rank <= 10),
          bf AS (
            SELECT query_id, vec_id, rank FROM (
              SELECT q.query_id, e.vec_id,
                CAST(row_number() OVER (PARTITION BY q.query_id
                  ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC, e.vec_id)
                  AS BIGINT) AS rank
              FROM embeddings e, binqe q WHERE e.vec_id <> q.query_id)
            WHERE rank <= 10)
          SELECT bf.query_id,
            CAST(count(bq.brank) AS BIGINT) AS n_hits10,
            CAST(count(bq.brank) * 1000000 // 10 AS BIGINT) AS recall10_e6,
            CAST(max(CASE WHEN bf.rank = 1
                 THEN coalesce(1000000 // bq.brank, 0) END) AS BIGINT) AS rr_e6
          FROM bf LEFT JOIN bq
            ON bq.query_id = bf.query_id AND bq.vec_id = bf.vec_id
          GROUP BY bf.query_id""",
    "ann_recall_curve" -> {
      // the composed bf+lsh replay of ann_eval_recall, read at every
      // cutoff k = 1..10
      s"""WITH ${lshBucketsCte("embeddings", "SELECT count(*) FROM embeddings")},
          cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id
            FROM bk c JOIN bk q ON c.t = q.t AND c.bucket = q.bucket
            WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
          lscored AS (
            SELECT cand.query_id, cand.vec_id,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
            FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
                      JOIN embeddings eq ON eq.vec_id = cand.query_id),
          ls AS (
            SELECT query_id, vec_id, lrank FROM (
              SELECT query_id, vec_id,
                CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, vec_id) AS BIGINT) AS lrank
              FROM lscored)
            WHERE lrank <= 10),
          qs AS (SELECT vec_id AS query_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 10),
          bf AS (
            SELECT query_id, vec_id, rank FROM (
              SELECT q.query_id, e.vec_id,
                CAST(row_number() OVER (PARTITION BY q.query_id
                  ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC, e.vec_id)
                  AS BIGINT) AS rank
              FROM embeddings e, qs q WHERE e.vec_id <> q.query_id)
            WHERE rank <= 10),
          hits AS (SELECT bf.query_id, bf.rank, ls.lrank
                   FROM bf JOIN ls ON ls.query_id = bf.query_id AND ls.vec_id = bf.vec_id),
          nq AS (SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_q FROM bf),
          ks AS (SELECT unnest(range(1, 11)) AS k)
          SELECT k, CAST(count(h.query_id) AS BIGINT) AS n_hits,
            CAST(count(h.query_id) * 1000000 // (k * n_q) AS BIGINT) AS recall_e6
          FROM ks LEFT JOIN hits h ON h.rank <= ks.k AND h.lrank <= ks.k, nq
          GROUP BY k, n_q"""
    },
    "ann_eval_recall" -> {
      // lsh candidates + ranks and the brute-force ground truth, both
      // replayed as in their own oracles, compared with one left join
      s"""WITH ${lshBucketsCte("embeddings", "SELECT count(*) FROM embeddings")},
          cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id
            FROM bk c JOIN bk q ON c.t = q.t AND c.bucket = q.bucket
            WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
          lscored AS (
            SELECT cand.query_id, cand.vec_id,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
            FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
                      JOIN embeddings eq ON eq.vec_id = cand.query_id),
          ls AS (
            SELECT query_id, vec_id, lrank FROM (
              SELECT query_id, vec_id,
                CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, vec_id) AS BIGINT) AS lrank
              FROM lscored)
            WHERE lrank <= 10),
          qs AS (SELECT vec_id AS query_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 10),
          bf AS (
            SELECT query_id, vec_id, rank FROM (
              SELECT q.query_id, e.vec_id,
                CAST(row_number() OVER (PARTITION BY q.query_id
                  ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC, e.vec_id)
                  AS BIGINT) AS rank
              FROM embeddings e, qs q WHERE e.vec_id <> q.query_id)
            WHERE rank <= 10)
          SELECT bf.query_id,
            CAST(count(ls.lrank) AS BIGINT) AS n_hits10,
            CAST(count(ls.lrank) * 1000000 // 10 AS BIGINT) AS recall10_e6,
            CAST(max(CASE WHEN bf.rank = 1
                 THEN coalesce(1000000 // ls.lrank, 0) END) AS BIGINT) AS rr_e6
          FROM bf LEFT JOIN ls
            ON ls.query_id = bf.query_id AND ls.vec_id = bf.vec_id
          GROUP BY bf.query_id"""
    },
    "ann_ivf_nprobe_curve" -> {
      // shared ivfTrainCtes quantizer replay; ONE probe join at
      // max(nprobe) keeping each candidate's min probed-cell rank, so
      // every sweep point is a min_rn slice — same sweep list as
      // Similarity.NprobePoints
      val pvals = Similarity.NprobePoints.map(p => s"($p)").mkString(", ")
      val maxP = Similarity.NprobePoints.max
      s"""WITH ${ivfTrainCtes},
          q AS (SELECT vec_id AS query_id, embedding AS q_emb
                FROM embeddings WHERE vec_id < 10),
          qc AS (SELECT query_id, cell, rn FROM (
              SELECT q.query_id, c.cell,
                row_number() OVER (PARTITION BY q.query_id
                  ORDER BY floor(list_cosine_similarity(
                    q.q_emb::DOUBLE[], c.centroid::DOUBLE[]) * 10000 + 0.5)
                    DESC, c.cell) AS rn
              FROM q, c3 c) WHERE rn <= $maxP),
          cand AS (
            SELECT qc.query_id, a.vec_id, CAST(min(qc.rn) AS BIGINT) AS min_rn
            FROM acorp a JOIN qc ON a.cell = qc.cell
            WHERE a.vec_id <> qc.query_id
            GROUP BY 1, 2),
          scored AS (
            SELECT cand.query_id, cand.vec_id, cand.min_rn,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
            FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
                      JOIN embeddings eq ON eq.vec_id = cand.query_id),
          bf AS (
            SELECT query_id, vec_id FROM (
              SELECT q.query_id, e.vec_id,
                row_number() OVER (PARTITION BY q.query_id
                  ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC, e.vec_id)
                  AS rank
              FROM embeddings e, q WHERE e.vec_id <> q.query_id)
            WHERE rank <= 10),
          ps AS (SELECT CAST(p AS BIGINT) AS p FROM (VALUES $pvals) v(p)),
          ranked AS (
            SELECT ps.p, s.query_id, s.vec_id,
              row_number() OVER (PARTITION BY ps.p, s.query_id
                ORDER BY s.cos DESC, s.vec_id) AS rank
            FROM scored s, ps WHERE s.min_rn <= ps.p),
          hits AS (
            SELECT r.p, CAST(count(*) AS BIGINT) AS n_hits
            FROM ranked r
            JOIN bf ON bf.query_id = r.query_id AND bf.vec_id = r.vec_id
            WHERE r.rank <= 10 GROUP BY 1),
          cn AS (SELECT ps.p, CAST(count(*) AS BIGINT) AS n_candidates
                 FROM scored s, ps WHERE s.min_rn <= ps.p GROUP BY 1),
          nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM q)
          SELECT cn.p AS nprobe, nq.n_queries, cn.n_candidates,
            CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
            CAST(coalesce(h.n_hits, 0) * 1000000 // (nq.n_queries * 10) AS BIGINT)
              AS recall10_e6
          FROM cn LEFT JOIN hits h ON h.p = cn.p, nq"""
    },
    "ann_sq_recall" ->
      // the #52 int8 replay, exact-integer dot ranking (list products
      // of ints <= 127 are exact in DOUBLE), float brute-force truth
      """WITH n AS (
           SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding, x -> CAST(x * x AS DOUBLE)))) AS nrm
           FROM embeddings),
         qv AS (
           SELECT vec_id,
             [CAST(round(CASE WHEN nrm = 0 THEN 0
                  ELSE CAST(x AS DOUBLE) / nrm * 127 END) AS INT) for x in embedding]
               AS q
           FROM n),
         qq AS (SELECT vec_id AS query_id, q AS qvec FROM qv WHERE vec_id < 10),
         sq AS (
           SELECT query_id, vec_id, srank FROM (
             SELECT qq.query_id, qv.vec_id,
               CAST(row_number() OVER (PARTITION BY qq.query_id
                 ORDER BY CAST(list_dot_product(qv.q::DOUBLE[], qq.qvec::DOUBLE[])
                               AS BIGINT) DESC, qv.vec_id) AS BIGINT) AS srank
             FROM qv, qq WHERE qv.vec_id <> qq.query_id)
           WHERE srank <= 10),
         q AS (SELECT vec_id AS query_id, embedding AS q_emb
               FROM embeddings WHERE vec_id < 10),
         bf AS (
           SELECT query_id, vec_id, rank FROM (
             SELECT q.query_id, e.vec_id,
               CAST(row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(
                   e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC, e.vec_id)
                 AS BIGINT) AS rank
             FROM embeddings e, q WHERE e.vec_id <> q.query_id)
           WHERE rank <= 10)
         SELECT bf.query_id,
           CAST(count(sq.srank) AS BIGINT) AS n_hits10,
           CAST(count(sq.srank) * 1000000 // 10 AS BIGINT) AS recall10_e6,
           CAST(max(CASE WHEN bf.rank = 1
                THEN coalesce(1000000 // sq.srank, 0) END) AS BIGINT) AS rr_e6,
           CAST(max(CASE WHEN bf.rank = 1 AND sq.srank = 1
                THEN 1 ELSE 0 END) AS BIGINT) AS top1_match
         FROM bf LEFT JOIN sq
           ON sq.query_id = bf.query_id AND sq.vec_id = bf.vec_id
         GROUP BY bf.query_id""",
    "ann_eval_ndcg" -> {
      // same composed bf+lsh replay as ann_eval_recall, discounted by
      // the shared NdcgWeightsE6 constants as a VALUES table; IDCG is
      // derived from the same constants, never restated
      val wvals = NdcgWeightsE6.zipWithIndex
        .map { case (w, i) => s"(${i + 1}, $w)" }
        .mkString(", ")
      val idcg = NdcgWeightsE6.zipWithIndex.map { case (w, i) => (10L - i) * w }.sum
      s"""WITH ${lshBucketsCte("embeddings", "SELECT count(*) FROM embeddings")},
          cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id
            FROM bk c JOIN bk q ON c.t = q.t AND c.bucket = q.bucket
            WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
          lscored AS (
            SELECT cand.query_id, cand.vec_id,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
            FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
                      JOIN embeddings eq ON eq.vec_id = cand.query_id),
          ls AS (
            SELECT query_id, vec_id, lrank FROM (
              SELECT query_id, vec_id,
                CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, vec_id) AS BIGINT) AS lrank
              FROM lscored)
            WHERE lrank <= 10),
          qs AS (SELECT vec_id AS query_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 10),
          bf AS (
            SELECT query_id, vec_id, rank FROM (
              SELECT q.query_id, e.vec_id,
                CAST(row_number() OVER (PARTITION BY q.query_id
                  ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC, e.vec_id)
                  AS BIGINT) AS rank
              FROM embeddings e, qs q WHERE e.vec_id <> q.query_id)
            WHERE rank <= 10),
          wt(lrank, w) AS (VALUES $wvals)
          SELECT ls.query_id,
            CAST(count(bf.rank) AS BIGINT) AS n_relevant,
            CAST(sum(coalesce(11 - bf.rank, 0) * wt.w) AS BIGINT) AS dcg_e6,
            CAST(sum(coalesce(11 - bf.rank, 0) * wt.w) * 1000000 // $idcg AS BIGINT)
              AS ndcg_e6
          FROM ls
          LEFT JOIN bf ON bf.query_id = ls.query_id AND bf.vec_id = ls.vec_id
          JOIN wt ON wt.lrank = ls.lrank
          GROUP BY ls.query_id"""
    },
    "ann_rrf_fusion" -> {
      // compose the #28 and #72 replays (renamed CTEs), then the pure
      // integer fusion 1e6 // (60 + rank)
      s"""WITH ${lshBucketsCte("embeddings", "SELECT count(*) FROM embeddings")},
          lcand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id
            FROM bk c JOIN bk q ON c.t = q.t AND c.bucket = q.bucket
            WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
          lrank AS (SELECT query_id, vec_id, rank FROM (
              SELECT s.query_id, s.vec_id,
                CAST(row_number() OVER (PARTITION BY s.query_id
                  ORDER BY s.cos DESC, s.vec_id) AS BIGINT) AS rank
              FROM (SELECT lcand.query_id, lcand.vec_id,
                      round(list_cosine_similarity(
                        e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
                    FROM lcand JOIN embeddings e ON e.vec_id = lcand.vec_id
                               JOIN embeddings eq ON eq.vec_id = lcand.query_id) s)
            WHERE rank <= 10),
          ${ivfTrainCtes},
          q AS (SELECT vec_id AS query_id, embedding AS q_emb
                FROM embeddings WHERE vec_id < 10),
          iqc AS (SELECT query_id, cell FROM (
              SELECT q.query_id, c.cell,
                row_number() OVER (PARTITION BY q.query_id
                  ORDER BY floor(list_cosine_similarity(
                    q.q_emb::DOUBLE[], c.centroid::DOUBLE[]) * 10000 + 0.5)
                    DESC, c.cell) AS rn
              FROM q, c3 c) WHERE rn <= 2),
          icand AS (
            SELECT DISTINCT iqc.query_id, a.vec_id
            FROM acorp a JOIN iqc ON a.cell = iqc.cell
            WHERE a.vec_id <> iqc.query_id),
          irank AS (SELECT query_id, vec_id, rank FROM (
              SELECT s.query_id, s.vec_id,
                CAST(row_number() OVER (PARTITION BY s.query_id
                  ORDER BY s.cos DESC, s.vec_id) AS BIGINT) AS rank
              FROM (SELECT icand.query_id, icand.vec_id,
                      round(list_cosine_similarity(
                        e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
                    FROM icand JOIN embeddings e ON e.vec_id = icand.vec_id
                               JOIN embeddings eq ON eq.vec_id = icand.query_id) s)
            WHERE rank <= 10),
          fused AS (
            SELECT query_id, vec_id,
              CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf_e6,
              CAST(count(*) AS BIGINT) AS n_rankers
            FROM (SELECT * FROM lrank UNION ALL SELECT * FROM irank)
            GROUP BY query_id, vec_id)
          SELECT query_id, vec_id, rrf_e6, n_rankers, rank FROM (
            SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY rrf_e6 DESC, vec_id) AS BIGINT) AS rank FROM fused)
          WHERE rank <= 10"""
    },
    "ann_lsh" -> {
      // candidate set from the replayed buckets; scoring/ranking as in
      // ann_bruteforce (6dp cosine, vec_id tiebreak)
      s"""WITH ${lshBucketsCte("embeddings", "SELECT count(*) FROM embeddings")},
          cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id
            FROM bk c JOIN bk q ON c.t = q.t AND c.bucket = q.bucket
            WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
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
          WHERE rank <= 10"""
    },
    "ann_lsh_multiprobe" -> {
      // queries probe their own bucket plus the `bits` one-bit flips
      s"""WITH ${lshBucketsCte("embeddings", "SELECT count(*) FROM embeddings")},
          qb AS (
            SELECT vec_id AS query_id, t,
              unnest(list_prepend(bucket,
                [xor(bucket, 1::BIGINT << p) for p in range(0, bits)])) AS bucket
            FROM bk, params WHERE vec_id < 10),
          cand AS (
            SELECT DISTINCT qb.query_id, c.vec_id
            FROM bk c JOIN qb ON c.t = qb.t AND c.bucket = qb.bucket
            WHERE c.vec_id <> qb.query_id),
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
          WHERE rank <= 10"""
    },
    "ann_range_search" -> {
      // multiprobe bucket replay, threshold instead of rank
      s"""WITH ${lshBucketsCte("embeddings", "SELECT count(*) FROM embeddings")},
          qb AS (
            SELECT vec_id AS query_id, t,
              unnest(list_prepend(bucket,
                [xor(bucket, 1::BIGINT << p) for p in range(0, bits)])) AS bucket
            FROM bk, params WHERE vec_id < 10),
          cand AS (
            SELECT DISTINCT qb.query_id, c.vec_id
            FROM bk c JOIN qb ON c.t = qb.t AND c.bucket = qb.bucket
            WHERE c.vec_id <> qb.query_id)
          SELECT query_id, vec_id, cos FROM (
            SELECT cand.query_id, cand.vec_id,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
            FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
                      JOIN embeddings eq ON eq.vec_id = cand.query_id)
          WHERE cos >= 0.2"""
    },
    "ann_triplets" -> {
      // planted pos/neg corpus, multiprobe bucket replay, 4dp cosine
      // banding, deterministic per-anchor selection
      def jit(amp: String, offset: Long) =
        s"""SELECT vec_id + $offset AS vec_id,
              [CAST(embedding[i] * (1.0 + $amp * ((((i-1) % 11) - 5) / 5.0)) AS FLOAT)
               for i in generate_series(1, 64)] AS embedding
            FROM embeddings WHERE vec_id % 10 = 0"""
      s"""WITH corpus AS MATERIALIZED (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL ${jit("0.06", 1000000L)}
            UNION ALL ${jit("0.25", 2000000L)}),
          ${lshBucketsCte("corpus", "SELECT (count(*) * 12) // 10 FROM embeddings")},
          pb AS MATERIALIZED (
            SELECT vec_id, t,
              unnest(list_prepend(bucket,
                [xor(bucket, 1::BIGINT << p) for p in range(0, bits)])) AS bucket
            FROM bk, params),
          cand AS MATERIALIZED (
            SELECT DISTINCT a.vec_id AS anchor_id, c.vec_id AS cand_id
            FROM bk a JOIN pb c ON a.t = c.t AND a.bucket = c.bucket
            WHERE a.vec_id % 10 = 0 AND a.vec_id < 1000000
              AND a.vec_id <> c.vec_id),
          sc AS MATERIALIZED (
            SELECT cand.anchor_id, cand.cand_id,
              round(list_cosine_similarity(
                ca.embedding::DOUBLE[], cb.embedding::DOUBLE[]), 4) AS cos
            FROM cand JOIN corpus ca ON ca.vec_id = cand.anchor_id
                      JOIN corpus cb ON cb.vec_id = cand.cand_id),
          pos AS (
            SELECT anchor_id, cand_id AS pos_id, cos AS cos_pos FROM (
              SELECT anchor_id, cand_id, cos,
                row_number() OVER (PARTITION BY anchor_id ORDER BY cand_id) AS rn
              FROM sc WHERE cos >= 0.998) WHERE rn = 1),
          neg AS (
            SELECT anchor_id, cand_id AS neg_id, cos AS cos_neg FROM (
              SELECT anchor_id, cand_id, cos,
                row_number() OVER (PARTITION BY anchor_id
                  ORDER BY cos DESC, cand_id) AS rn
              FROM sc WHERE cos >= 0.97 AND cos < 0.998) WHERE rn = 1)
          SELECT pos.anchor_id, pos_id, cos_pos, neg_id, cos_neg
          FROM pos JOIN neg USING (anchor_id)"""
    },
    "ann_dbscan" -> {
      // full replay: planted-density corpus (family anti-jitter pairs
      // + sub-threshold pairs, identical float arithmetic), multiprobe
      // LSH candidate edges, 4dp cosine eps, degrees, roles, and the
      // three unrolled core-core min-label rounds
      def jit(sign: String, offset: Long, mod: Int) =
        s"""SELECT vec_id + $offset AS vec_id,
              [CAST(embedding[i] * (1.0 $sign ${graft.operators.Similarity.DbscanAmp} *
                    ((((i-1) % 11) - 5) / 5.0)) AS FLOAT)
               for i in generate_series(1, 64)] AS embedding
            FROM embeddings WHERE vec_id % 10 = $mod"""
      def lround(prev: String, out: String) =
        s"""$out AS MATERIALIZED (
              SELECT l.vec_id,
                least(min(l.label), coalesce(min(n.label), min(l.label))) AS label
              FROM $prev l
              LEFT JOIN ce ON ce.vec_a = l.vec_id
              LEFT JOIN $prev n ON n.vec_id = ce.vec_b
              GROUP BY l.vec_id)"""
      s"""WITH corpus AS MATERIALIZED (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL ${jit("+", 1000000L, 0)}
            UNION ALL ${jit("-", 2000000L, 0)}
            UNION ALL ${jit("+", 3000000L, 5)}),
          ${lshBucketsCte("corpus", "SELECT (count(*) * 13) // 10 FROM embeddings")},
          pb AS MATERIALIZED (
            SELECT vec_id, t,
              unnest(list_prepend(bucket,
                [xor(bucket, 1::BIGINT << p) for p in range(0, bits)])) AS bucket
            FROM bk, params),
          cand AS MATERIALIZED (
            SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b
            FROM bk a JOIN pb c ON a.t = c.t AND a.bucket = c.bucket
            WHERE a.vec_id < c.vec_id),
          ed AS MATERIALIZED (
            SELECT vec_a, vec_b FROM (
              SELECT cand.vec_a, cand.vec_b,
                round(list_cosine_similarity(
                  ca.embedding::DOUBLE[], cb.embedding::DOUBLE[]), 4) AS cos
              FROM cand JOIN corpus ca ON ca.vec_id = cand.vec_a
                        JOIN corpus cb ON cb.vec_id = cand.vec_b)
            WHERE cos >= ${graft.operators.Similarity.DbscanEps}),
          sym AS MATERIALIZED (SELECT vec_a, vec_b FROM ed
                  UNION ALL SELECT vec_b, vec_a FROM ed),
          dg AS MATERIALIZED (
            SELECT c.vec_id, coalesce(d.degree, CAST(0 AS BIGINT)) AS degree
            FROM corpus c LEFT JOIN (
              SELECT vec_a AS vec_id, CAST(count(*) AS BIGINT) AS degree
              FROM sym GROUP BY 1) d USING (vec_id)),
          core AS MATERIALIZED (SELECT vec_id FROM dg WHERE degree >= 2),
          ce AS MATERIALIZED (SELECT s.vec_a, s.vec_b FROM sym s
                 JOIN core a ON s.vec_a = a.vec_id
                 JOIN core b ON s.vec_b = b.vec_id),
          l0 AS MATERIALIZED (SELECT vec_id, vec_id AS label FROM core),
          ${lround("l0", "l1")}, ${lround("l1", "l2")}, ${lround("l2", "l3")},
          bo AS MATERIALIZED (
            SELECT s.vec_a AS vec_id, min(l.label) AS cluster_id
            FROM sym s JOIN core c ON s.vec_b = c.vec_id
                       JOIN l3 l ON l.vec_id = s.vec_b
            WHERE s.vec_a NOT IN (SELECT vec_id FROM core)
            GROUP BY s.vec_a)
          SELECT dg.vec_id, 'core' AS role, l3.label AS cluster_id, dg.degree
          FROM dg JOIN l3 ON l3.vec_id = dg.vec_id
          UNION ALL
          SELECT bo.vec_id, 'border', bo.cluster_id, dg.degree
          FROM bo JOIN dg USING (vec_id)
          UNION ALL
          SELECT dg.vec_id, 'noise', CAST(-1 AS BIGINT), dg.degree
          FROM dg
          WHERE dg.vec_id NOT IN (SELECT vec_id FROM l3)
            AND dg.vec_id NOT IN (SELECT vec_id FROM bo)"""
    },
    "ann_ivf" -> {
      // Full replay of the 3-round Lloyd train (e4-quantized means and
      // assignment cosines — see Similarity.trainCentroids), the
      // corpus cell assignment, the nprobe=2 query probe, and the
      // final 6dp-cosine rank.
      s"""WITH ${ivfTrainCtes},
          q AS (SELECT vec_id AS query_id, embedding AS q_emb
                FROM embeddings WHERE vec_id < 10),
          qc AS (SELECT query_id, cell FROM (
              SELECT q.query_id, c.cell,
                row_number() OVER (PARTITION BY q.query_id
                  ORDER BY floor(list_cosine_similarity(
                    q.q_emb::DOUBLE[], c.centroid::DOUBLE[]) * 10000 + 0.5)
                    DESC, c.cell) AS rn
              FROM q, c3 c) WHERE rn <= 2),
          cand AS (
            SELECT DISTINCT qc.query_id, a.vec_id
            FROM acorp a JOIN qc ON a.cell = qc.cell
            WHERE a.vec_id <> qc.query_id),
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
          WHERE rank <= 10"""
    },
    "ann_kmeanspar" -> {
      val k = graft.operators.KmeansPar.FinalK
      val rows = (1 to k)
        .map(r =>
          s"""SELECT CAST($r AS BIGINT) AS sel_rank,
               (SELECT vec_id FROM g$r) AS vec_id,
               (SELECT w FROM g$r) AS weight,
               (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates""")
        .mkString("\n          UNION ALL ")
      s"""WITH $kmeansParCtes
          $rows"""
    },
    "ann_kmeanspar_eval" -> {
      val d = EmbeddingDim
      val k = graft.operators.KmeansPar.FinalK
      def costCte(name: String, seedSet: String) =
        s"""c_$name AS (SELECT CAST(sum(md) AS BIGINT) AS c FROM (
             SELECT a.vec_id,
               min(list_sum([(a.q[i] - s.q[i]) * (a.q[i] - s.q[i])
                 for i in generate_series(1, $d)])) AS md
             FROM e a, $seedSet s GROUP BY 1))"""
      val selUnion = (1 to k).map(i => s"SELECT vec_id, q FROM g$i").mkString(" UNION ALL ")
      s"""WITH $kmeansParCtes,
          sel AS MATERIALIZED ($selUnion),
          unif AS MATERIALIZED (
            SELECT vec_id, q FROM e
            ORDER BY ('0x' || substr(md5('kmunif:' || vec_id), 1, 15))::BIGINT
              % 1000000000000, vec_id
            LIMIT $k),
          fk AS MATERIALIZED (SELECT vec_id, q FROM e ORDER BY vec_id LIMIT $k),
          ${costCte("sel", "sel")},
          ${costCte("unif", "unif")},
          ${costCte("fk", "fk")}
          SELECT 'kmeans_par' AS seeding, CAST($k AS BIGINT) AS n_seeds,
            c_sel.c AS cost,
            CAST(CAST(c_sel.c AS HUGEINT) * 1000000 // c_unif.c AS BIGINT)
              AS ratio_vs_uniform_e6
          FROM c_sel, c_unif
          UNION ALL
          SELECT 'uniform', CAST($k AS BIGINT), c_unif.c,
            CAST(1000000 AS BIGINT)
          FROM c_unif
          UNION ALL
          SELECT 'first_k', CAST($k AS BIGINT), c_fk.c,
            CAST(CAST(c_fk.c AS HUGEINT) * 1000000 // c_unif.c AS BIGINT)
          FROM c_fk, c_unif"""
    },
    "ann_filtered" -> {
      // the #72 replay with the label predicate pushed into the probe
      s"""WITH ${ivfTrainCtes},
          q AS (SELECT vec_id AS query_id, embedding AS q_emb,
                  CAST(label AS BIGINT) AS q_label
                FROM embeddings WHERE vec_id < 10),
          qc AS (SELECT query_id, q_label, cell FROM (
              SELECT q.query_id, q.q_label, c.cell,
                row_number() OVER (PARTITION BY q.query_id
                  ORDER BY floor(list_cosine_similarity(
                    q.q_emb::DOUBLE[], c.centroid::DOUBLE[]) * 10000 + 0.5)
                    DESC, c.cell) AS rn
              FROM q, c3 c) WHERE rn <= 2),
          cand AS (
            SELECT DISTINCT qc.query_id, a.vec_id
            FROM acorp a JOIN qc ON a.cell = qc.cell
                 JOIN embeddings el ON el.vec_id = a.vec_id
            WHERE a.vec_id <> qc.query_id
              AND CAST(el.label AS BIGINT) = qc.q_label),
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
          WHERE rank <= 10"""
    },
    "ann_filtered_recall" -> {
      // shared train CTEs; pre/post/truth as top-10 sets, two
      // aggregate rows
      s"""WITH ${ivfTrainCtes},
          q AS (SELECT vec_id AS query_id, embedding AS q_emb,
                  CAST(label AS BIGINT) AS q_label
                FROM embeddings WHERE vec_id < 10),
          qc AS (SELECT query_id, q_label, cell FROM (
              SELECT q.query_id, q.q_label, c.cell,
                row_number() OVER (PARTITION BY q.query_id
                  ORDER BY floor(list_cosine_similarity(
                    q.q_emb::DOUBLE[], c.centroid::DOUBLE[]) * 10000 + 0.5)
                    DESC, c.cell) AS rn
              FROM q, c3 c) WHERE rn <= 2),
          candf AS (
            SELECT DISTINCT qc.query_id, a.vec_id
            FROM acorp a JOIN qc ON a.cell = qc.cell
                 JOIN embeddings el ON el.vec_id = a.vec_id
            WHERE a.vec_id <> qc.query_id
              AND CAST(el.label AS BIGINT) = qc.q_label),
          candu AS (
            SELECT DISTINCT qc.query_id, a.vec_id
            FROM acorp a JOIN qc ON a.cell = qc.cell
            WHERE a.vec_id <> qc.query_id),
          pre AS (SELECT query_id, vec_id FROM (
              SELECT c.query_id, c.vec_id,
                row_number() OVER (PARTITION BY c.query_id
                  ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) DESC,
                  c.vec_id) AS rank
              FROM candf c JOIN embeddings e ON e.vec_id = c.vec_id
                           JOIN embeddings eq ON eq.vec_id = c.query_id)
            WHERE rank <= 10),
          post0 AS (SELECT query_id, vec_id FROM (
              SELECT c.query_id, c.vec_id,
                row_number() OVER (PARTITION BY c.query_id
                  ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) DESC,
                  c.vec_id) AS rank
              FROM candu c JOIN embeddings e ON e.vec_id = c.vec_id
                           JOIN embeddings eq ON eq.vec_id = c.query_id)
            WHERE rank <= 10),
          post AS (
            SELECT p.query_id, p.vec_id
            FROM post0 p JOIN embeddings el ON el.vec_id = p.vec_id
                 JOIN q ON q.query_id = p.query_id
            WHERE CAST(el.label AS BIGINT) = q.q_label),
          truth AS (SELECT query_id, vec_id FROM (
              SELECT q.query_id, e.vec_id,
                row_number() OVER (PARTITION BY q.query_id
                  ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC,
                  e.vec_id) AS rank
              FROM embeddings e, q
              WHERE e.vec_id <> q.query_id
                AND CAST(e.label AS BIGINT) = q.q_label)
            WHERE rank <= 10)
          SELECT 'prefilter' AS strategy,
            (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
            (SELECT CAST(count(*) AS BIGINT) FROM pre) AS n_returned,
            (SELECT CAST(count(*) AS BIGINT) FROM pre JOIN truth
               USING (query_id, vec_id)) AS n_hits,
            CAST((SELECT count(*) FROM pre JOIN truth USING (query_id, vec_id))
              * 1000000 // (SELECT count(*) FROM truth) AS BIGINT) AS recall_e6
          UNION ALL
          SELECT 'postfilter',
            (SELECT CAST(count(*) AS BIGINT) FROM truth),
            (SELECT CAST(count(*) AS BIGINT) FROM post),
            (SELECT CAST(count(*) AS BIGINT) FROM post JOIN truth
               USING (query_id, vec_id)),
            CAST((SELECT count(*) FROM post JOIN truth USING (query_id, vec_id))
              * 1000000 // (SELECT count(*) FROM truth) AS BIGINT)"""
    },
    "ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
                    FROM embeddings WHERE vec_id < 10)
         SELECT query_id, vec_id, cos, rank FROM (
           SELECT q.query_id, e.vec_id,
             round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6)
               AS cos,
             CAST(row_number() OVER (PARTITION BY q.query_id
               ORDER BY round(list_cosine_similarity(
                 e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC, e.vec_id)
               AS BIGINT) AS rank
           FROM embeddings e, q WHERE e.vec_id <> q.query_id)
         WHERE rank <= 10""",
    "ann_matryoshka_recall" -> {
      // one top-10 CTE per truncation dim, all scored against the
      // full-dim truth — mirror of the Spark sweep
      def top10(name: String, d: Int) =
        s"""$name AS (SELECT query_id, vec_id FROM (
             SELECT q.query_id, e.vec_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(
                   e.embedding[1:$d]::DOUBLE[], q.q_emb[1:$d]::DOUBLE[]), 6) DESC,
                 e.vec_id) AS rank
             FROM embeddings e, q WHERE e.vec_id <> q.query_id)
           WHERE rank <= 10)"""
      val dims = Seq(64, 32, 16, 8)
      val ctes = dims.map(d => top10(s"d$d", d)).mkString(",\n         ")
      val rows = dims
        .map(d => s"""SELECT CAST($d AS BIGINT) AS dim,
             (SELECT CAST(count(*) AS BIGINT) FROM d64) AS n_truth,
             (SELECT CAST(count(*) AS BIGINT) FROM d$d t
              JOIN d64 USING (query_id, vec_id)) AS n_hits,
             (SELECT CAST(count(*) AS BIGINT) FROM d$d t
              JOIN d64 USING (query_id, vec_id)) * 1000000
               // (SELECT count(*) FROM d64) AS recall_e6""")
        .mkString("\n         UNION ALL\n         ")
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
                     FROM embeddings WHERE vec_id < 10),
         $ctes
         $rows"""
    },
    "ann_exact_knn_graph" ->
      """SELECT src, dst, cos, rank FROM (
           SELECT a.vec_id AS src, b.vec_id AS dst,
             round(list_cosine_similarity(b.embedding::DOUBLE[], a.embedding::DOUBLE[]), 6)
               AS cos,
             CAST(row_number() OVER (PARTITION BY a.vec_id
               ORDER BY round(list_cosine_similarity(
                 b.embedding::DOUBLE[], a.embedding::DOUBLE[]), 6) DESC, b.vec_id)
               AS BIGINT) AS rank
           FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id)
         WHERE rank <= 10""",
    // unrolled 4-hop greedy walk over the exact k-NN graph: beam_h =
    // top-10 of (beam ∪ out-neighbors) by rounded cosine; result =
    // top-10 of everything visited, self excluded — the Spark loop's
    // exact replay
    "ann_nsw_search" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
               FROM embeddings WHERE vec_id < 10),
         g AS (SELECT src, dst FROM (
                 SELECT a.vec_id AS src, b.vec_id AS dst,
                   row_number() OVER (PARTITION BY a.vec_id
                     ORDER BY round(list_cosine_similarity(b.emb, a.emb), 6) DESC,
                       b.vec_id) AS rnk
                 FROM e a, e b WHERE a.vec_id <> b.vec_id)
               WHERE rnk <= 10),
         entry AS (SELECT min(vec_id) AS vec_id FROM e),
         b0 AS (SELECT q.query_id, entry.vec_id FROM q, entry),
         v0 AS (SELECT query_id, vec_id FROM b0),
         c1 AS (SELECT DISTINCT query_id, vec_id FROM (
                 SELECT query_id, vec_id FROM b0
                 UNION ALL
                 SELECT b.query_id, g.dst AS vec_id FROM b0 b JOIN g ON g.src = b.vec_id)),
         s1 AS (SELECT c.query_id, c.vec_id,
                  round(list_cosine_similarity(e.emb, q.q_emb), 6) AS cos
                FROM c1 c JOIN e ON e.vec_id = c.vec_id
                          JOIN q ON q.query_id = c.query_id),
         b1 AS (SELECT query_id, vec_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, vec_id) AS rnk FROM s1)
                WHERE rnk <= 10),
         v1 AS (SELECT DISTINCT query_id, vec_id FROM (
                 SELECT query_id, vec_id FROM v0
                 UNION ALL SELECT query_id, vec_id FROM c1)),
         c2 AS (SELECT DISTINCT query_id, vec_id FROM (
                 SELECT query_id, vec_id FROM b1
                 UNION ALL
                 SELECT b.query_id, g.dst AS vec_id FROM b1 b JOIN g ON g.src = b.vec_id)),
         s2 AS (SELECT c.query_id, c.vec_id,
                  round(list_cosine_similarity(e.emb, q.q_emb), 6) AS cos
                FROM c2 c JOIN e ON e.vec_id = c.vec_id
                          JOIN q ON q.query_id = c.query_id),
         b2 AS (SELECT query_id, vec_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, vec_id) AS rnk FROM s2)
                WHERE rnk <= 10),
         v2 AS (SELECT DISTINCT query_id, vec_id FROM (
                 SELECT query_id, vec_id FROM v1
                 UNION ALL SELECT query_id, vec_id FROM c2)),
         c3 AS (SELECT DISTINCT query_id, vec_id FROM (
                 SELECT query_id, vec_id FROM b2
                 UNION ALL
                 SELECT b.query_id, g.dst AS vec_id FROM b2 b JOIN g ON g.src = b.vec_id)),
         s3 AS (SELECT c.query_id, c.vec_id,
                  round(list_cosine_similarity(e.emb, q.q_emb), 6) AS cos
                FROM c3 c JOIN e ON e.vec_id = c.vec_id
                          JOIN q ON q.query_id = c.query_id),
         b3 AS (SELECT query_id, vec_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, vec_id) AS rnk FROM s3)
                WHERE rnk <= 10),
         v3 AS (SELECT DISTINCT query_id, vec_id FROM (
                 SELECT query_id, vec_id FROM v2
                 UNION ALL SELECT query_id, vec_id FROM c3)),
         c4 AS (SELECT DISTINCT query_id, vec_id FROM (
                 SELECT query_id, vec_id FROM b3
                 UNION ALL
                 SELECT b.query_id, g.dst AS vec_id FROM b3 b JOIN g ON g.src = b.vec_id)),
         v4 AS (SELECT DISTINCT query_id, vec_id FROM (
                 SELECT query_id, vec_id FROM v3
                 UNION ALL SELECT query_id, vec_id FROM c4))
         SELECT query_id, vec_id, cos, rank FROM (
           SELECT f.query_id, f.vec_id,
             round(list_cosine_similarity(e.emb, q.q_emb), 6) AS cos,
             CAST(row_number() OVER (PARTITION BY f.query_id
               ORDER BY round(list_cosine_similarity(e.emb, q.q_emb), 6) DESC, f.vec_id)
               AS BIGINT) AS rank
           FROM v4 f JOIN e ON e.vec_id = f.vec_id
                     JOIN q ON q.query_id = f.query_id
           WHERE f.vec_id <> f.query_id)
         WHERE rank <= 10""",
    // incremental graph fold: base directed lists + per-delta beam
    // walk insertion + reverse updates; eval scores the fold against
    // the full-corpus exact rebuild per node kind
    "ann_graph_insert" -> graphInsertOracle(
      k = 10,
      beam = operators.Similarity.GraphInsertBeam,
      hops = operators.Similarity.GraphInsertHops),
    "ann_graph_insert_eval" -> graphInsertEvalOracle(
      k = 10,
      beam = operators.Similarity.GraphInsertBeam,
      hops = operators.Similarity.GraphInsertHops),
    // #448-#450: the same three builds with the exact n² layer-0
    // swapped for the cell-bounded #296 build (quantizer replay +
    // within-cell top-k), symmetrized — the registered scale path
    "ann_nsw_scalable" -> nswScalableOracle(
      kNbrs = operators.Similarity.ScalableG0Degree, beam = 10, hops = 4),
    "ann_hnsw_scalable" -> hnswScalableOracle(
      kNbrs = operators.Similarity.ScalableG0Degree),
    "ann_graph_insert_scalable" -> graphInsertOracle(
      k = 10,
      beam = operators.Similarity.GraphInsertBeam,
      hops = operators.Similarity.GraphInsertHops,
      cellBounded = true),
    // NN-Descent: hash-draw init + two unrolled local-join rounds;
    // the recall oracle scores every round's state against the exact
    // graph truth
    "ann_nndescent" -> nnDescentOracle(k = 10, rounds = 3),
    "ann_nndescent_recall" -> nnDescentRecallOracle(k = 10, rounds = 3),
    // HNSW: the same unrolled walk as ann_nsw_search, preceded by the
    // level/upper-graph CTEs and the 4-hop greedy descent to a
    // per-query entry; the recall oracle replays three beam widths
    "ann_vamana" ->
      s"""WITH $vamanaCtes
         SELECT src, dst, cos_e6, rank FROM vgf""",
    "ann_vamana_recall" -> vamanaRecallOracle,
    "ann_hnsw_search" -> hnswSearchOracle,
    "ann_hnsw_recall" -> hnswRecallOracle,
    "ann_quantize" ->
      """WITH n AS (
           SELECT vec_id, CAST(label AS BIGINT) AS label, embedding,
             sqrt(list_sum(list_transform(embedding, x -> CAST(x * x AS DOUBLE)))) AS nrm
           FROM embeddings)
         SELECT vec_id, label, round(nrm, 6) AS l2_norm,
           unnest(range(len(embedding))) AS pos,
           CAST(round(CASE WHEN nrm = 0 THEN 0
                ELSE CAST(unnest(embedding) AS DOUBLE) / nrm * 127 END) AS INT) AS q
         FROM n""",
    "ann_pq_codes" ->
      s"""WITH $pqCtes
         SELECT vec_id, CAST(s AS BIGINT) AS s, CAST(code AS BIGINT) AS code,
           dist AS dist_e8
         FROM af""",
    "ann_pq_distortion" ->
      // <= M-row rollup over the same replayed assignment frame
      s"""WITH $pqCtes
         SELECT CAST(s AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(dist) // count(*) AS BIGINT) AS mean_dist_e8,
           CAST(max(dist) AS BIGINT) AS max_dist_e8,
           CAST(count(DISTINCT code) AS BIGINT) AS n_codes_used
         FROM af GROUP BY 1""",
    "ann_embedding_drift" ->
      // e6-quantize BEFORE summation (order-free integer sums); the
      // per-dim mean is SIGN-FACTORED (negative sums: Spark div
      // truncates, DuckDB // floors)
      """WITH cells AS (
           SELECT label, vec_id % 2 AS side, i - 1 AS pos,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS v_e6
           FROM embeddings, generate_series(1, 64) AS g(i)),
         dims AS (SELECT label, side, pos, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(v_e6) AS BIGINT) AS s
                  FROM cells GROUP BY 1, 2, 3),
         d2 AS (SELECT label, side, pos, n,
                  CASE WHEN s < 0 THEN -((-s) // n) ELSE s // n END AS m
                FROM dims),
         pr AS (SELECT a.label, a.pos, a.n AS n_a, a.m AS ma, b.n AS n_b, b.m AS mb
                FROM d2 a JOIN d2 b ON b.label = a.label AND b.pos = a.pos
                WHERE a.side = 0 AND b.side = 1)
         SELECT label, CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
           CAST(sum(CAST(ma - mb AS HUGEINT) * (ma - mb)) AS BIGINT) AS shift_l2sq_e12,
           CASE WHEN sum(CAST(ma AS HUGEINT) * ma) > 0
                 AND sum(CAST(mb AS HUGEINT) * mb) > 0 THEN
             CAST((CASE WHEN sum(CAST(ma AS HUGEINT) * mb) < 0 THEN -1 ELSE 1 END)
               * ((abs(sum(CAST(ma AS HUGEINT) * mb)) * 1000
                   // sum(CAST(ma AS HUGEINT) * ma))
                  * (abs(sum(CAST(ma AS HUGEINT) * mb)) * 1000
                     // sum(CAST(mb AS HUGEINT) * mb))) AS BIGINT)
           ELSE NULL END AS cos2_signed_e6
         FROM pr GROUP BY 1""",
    "ann_knn_graph" ->
      // shared ivfTrainCtes quantizer replay, then within-cell
      // pairwise 6dp cosine, top-5 per vector
      s"""WITH ${ivfTrainCtes}
         SELECT vec_id, nbr_id, cos, rank FROM (
           SELECT a.vec_id, b.vec_id AS nbr_id,
             round(list_cosine_similarity(
               a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos,
             CAST(row_number() OVER (PARTITION BY a.vec_id
               ORDER BY round(list_cosine_similarity(
                 a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) DESC,
               b.vec_id) AS BIGINT) AS rank
           FROM acorp a JOIN acorp b
             ON a.cell = b.cell AND a.vec_id <> b.vec_id)
         WHERE rank <= 5""",
    "ann_rvq_codes" ->
      s"""WITH $rvqCtes
         SELECT a1.vec_id, CAST(a1.code AS BIGINT) AS code1,
           CAST(a2.code AS BIGINT) AS code2,
           a1.dist AS dist1_e8, a2.dist AS dist2_e8
         FROM r1af a1 JOIN r2af a2 USING (vec_id)""",
    "ann_rvq_eval" ->
      s"""WITH $rvqCtes, $pqCtes,
         pqtot AS (SELECT vec_id, CAST(sum(dist) AS BIGINT) AS d FROM af GROUP BY 1)
         SELECT 'rvq_stage1' AS quantizer, CAST(4 AS BIGINT) AS bits_per_vec,
           CAST(sum(dist) // count(*) AS BIGINT) AS mean_dist_e8,
           CAST(max(dist) AS BIGINT) AS max_dist_e8,
           CAST(count(DISTINCT code) AS BIGINT) AS n_codes_used
         FROM r1af
         UNION ALL
         SELECT 'rvq_cascade', CAST(8 AS BIGINT),
           CAST(sum(a2.dist) // count(*) AS BIGINT),
           CAST(max(a2.dist) AS BIGINT),
           CAST(count(DISTINCT (a1.code || ':' || a2.code)) AS BIGINT)
         FROM r1af a1 JOIN r2af a2 USING (vec_id)
         UNION ALL
         SELECT 'pq_m4_k16', CAST(16 AS BIGINT),
           CAST((SELECT sum(d) FROM pqtot) // (SELECT count(*) FROM pqtot) AS BIGINT),
           CAST((SELECT max(d) FROM pqtot) AS BIGINT),
           CAST((SELECT count(DISTINCT (s || ':' || code)) FROM af) AS BIGINT)""",
    "ann_pq_search" -> pqSearchOracle(pqCtes),
    "ann_opq_search" -> opqSearchOracle,
    "ann_ivfadc" -> ivfAdcOracle,
    "ann_ivfadc_indexed" -> ivfAdcOracle,
    "ann_gram_matrix" ->
      // the Spark side is dimension-agnostic (driven by size(embedding));
      // the oracle's series bound comes from EmbeddingDim so a testdata
      // dimension change fails the dim-guard in `Similarity.gramMatrix`'s
      // spec loudly instead of silently truncating the oracle
      s"""WITH q AS (
           SELECT [CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)
                   for i in generate_series(1, $EmbeddingDim)] AS q
           FROM embeddings),
         cells AS (
           SELECT i.i - 1 AS i, j.j - 1 AS j, q[i.i] * q[j.j] AS p
           FROM q, generate_series(1, $EmbeddingDim) i(i),
                   generate_series(1, $EmbeddingDim) j(j)
           WHERE j.j >= i.i)
         SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           CAST(sum(p) AS BIGINT) AS sum_e12,
           CAST(count(*) AS BIGINT) AS n_vecs
         FROM cells GROUP BY 1, 2""",
    "ann_fps" -> fpsOracle(FpsK),
    // sensitivity-sampling coreset: e4 elements, integer mean, exact
    // d², e12 sensitivity with HUGEINT headroom, hash-draw inclusion
    "ann_coreset" ->
      s"""WITH el AS MATERIALIZED (
           SELECT vec_id,
             unnest([{'p': i - 1,
                      'x': CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000.0) AS BIGINT)}
                     for i in generate_series(1, 64)]) AS e
           FROM embeddings),
         mu AS MATERIALIZED (
           SELECT e.p AS pos, CAST(floor(avg(CAST(e.x AS DOUBLE)) + 0.5) AS BIGINT) AS mu
           FROM el GROUP BY 1),
         d2 AS MATERIALIZED (
           SELECT vec_id, CAST(sum((e.x - mu) * (e.x - mu)) AS BIGINT) AS d2
           FROM el JOIN mu ON mu.pos = e.p GROUP BY 1),
         tot AS (SELECT CAST(sum(d2) AS BIGINT) AS sum_d2,
                   CAST(count(*) AS BIGINT) AS n FROM d2),
         sc AS MATERIALIZED (
           SELECT vec_id, d2,
             CAST(1000000000000 // (2 * n)
                  + d2::HUGEINT * 1000000000000 // (2 * sum_d2) AS BIGINT) AS q_e12
           FROM d2, tot)
         SELECT vec_id, d2, q_e12,
           least(1000000000000, ${operators.Similarity.CoresetM} * q_e12) AS p_e12,
           CAST(1000000000000000000
                // least(1000000000000, ${operators.Similarity.CoresetM} * q_e12) AS BIGINT)
             AS weight_e6
         FROM sc
         WHERE ('0x' || substr(md5('coreset:' || vec_id), 1, 15))::BIGINT % 1000000000000
               < least(1000000000000, ${operators.Similarity.CoresetM} * q_e12)""",
    "ann_cell_balance" -> {
      // composed #29 assignment replay + <= k-row balance rollup
      val terms = (1 to 64).map(i => s"CAST(avg(embedding[$i]) AS FLOAT)").mkString(", ")
      s"""WITH c AS (SELECT label, [$terms] AS centroid
                     FROM embeddings GROUP BY label),
          a AS (
            SELECT vec_id, label, assigned_label FROM (
              SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
                CAST(c.label AS BIGINT) AS assigned_label,
                row_number() OVER (PARTITION BY e.vec_id
                  ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], c.centroid::DOUBLE[]), 6) DESC, c.label) AS rn
              FROM embeddings e, c)
            WHERE rn = 1),
          byc AS (
            SELECT assigned_label AS cell, CAST(count(*) AS BIGINT) AS n_vecs,
              CAST(sum(CASE WHEN label = assigned_label THEN 1 ELSE 0 END) AS BIGINT)
                AS n_pure
            FROM a GROUP BY 1),
          t AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS t, CAST(max(n_vecs) AS BIGINT) AS mx,
                  CAST(count(*) AS BIGINT) AS nc FROM byc)
          SELECT cell, n_vecs,
            CAST(n_vecs * 1000000 // t AS BIGINT) AS share_e6,
            CAST(n_pure * 1000000 // n_vecs AS BIGINT) AS purity_e6,
            CAST((mx * nc * 1000000) // t AS BIGINT) AS max_over_mean_e6
          FROM byc, t"""
    },
    "ann_lsh_tables_curve" -> {
      // buckets built once at max(tables); each candidate keeps its
      // min table index, so "T tables" is the min_t < T slice — same
      // sweep list as Similarity.TablesPoints
      val tvals = Similarity.TablesPoints.map(t => s"($t)").mkString(", ")
      val maxT = Similarity.TablesPoints.max
      s"""WITH ${lshBucketsCte("embeddings", "SELECT count(*) FROM embeddings", maxT)},
          cand AS (
            SELECT q.vec_id AS query_id, c.vec_id, CAST(min(c.t) AS BIGINT) AS min_t
            FROM bk c JOIN bk q ON c.t = q.t AND c.bucket = q.bucket
            WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
            GROUP BY 1, 2),
          scored AS (
            SELECT cand.query_id, cand.vec_id, cand.min_t,
              round(list_cosine_similarity(
                e.embedding::DOUBLE[], eq.embedding::DOUBLE[]), 6) AS cos
            FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
                      JOIN embeddings eq ON eq.vec_id = cand.query_id),
          q AS (SELECT vec_id AS query_id, embedding AS q_emb
                FROM embeddings WHERE vec_id < 10),
          bf AS (
            SELECT query_id, vec_id FROM (
              SELECT q.query_id, e.vec_id,
                row_number() OVER (PARTITION BY q.query_id
                  ORDER BY round(list_cosine_similarity(
                    e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) DESC, e.vec_id)
                  AS rank
              FROM embeddings e, q WHERE e.vec_id <> q.query_id)
            WHERE rank <= 10),
          ts AS (SELECT CAST(tc AS BIGINT) AS tc FROM (VALUES $tvals) v(tc)),
          ranked AS (
            SELECT ts.tc, s.query_id, s.vec_id,
              row_number() OVER (PARTITION BY ts.tc, s.query_id
                ORDER BY s.cos DESC, s.vec_id) AS rank
            FROM scored s, ts WHERE s.min_t < ts.tc),
          hits AS (
            SELECT r.tc, CAST(count(*) AS BIGINT) AS n_hits
            FROM ranked r
            JOIN bf ON bf.query_id = r.query_id AND bf.vec_id = r.vec_id
            WHERE r.rank <= 10 GROUP BY 1),
          cn AS (SELECT ts.tc, CAST(count(*) AS BIGINT) AS n_candidates
                 FROM scored s, ts WHERE s.min_t < ts.tc GROUP BY 1),
          nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM q)
          SELECT cn.tc AS n_tables, nq.n_queries, cn.n_candidates,
            CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
            CAST(coalesce(h.n_hits, 0) * 1000000 // (nq.n_queries * 10) AS BIGINT)
              AS recall10_e6
          FROM cn LEFT JOIN hits h ON h.tc = cn.tc, nq"""
    }
  )
}
