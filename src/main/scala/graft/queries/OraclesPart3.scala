package graft
package queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, CacheRegistry, Cdc, Dedup, Eval, Events, Graph, HllStore, Index, Linkage, Multimodal, Pq, Quantiles, Sampling, Similarity, SketchStore, Sketches, TextAnalysis, Tfidf}
import OracleCtes._
import QueryShared._

/** Oracle-SQL registry, part 3 of 4 (original SparkEntry order;
  * SparkEntry.oracleSql concatenates the parts, duplicate keys fail).
  */
private[graft] object OraclesPart3 {
  val m: Map[String, String] = Map(


    // bigram TF-IDF cosine pairs: decimal dot/norm sums (order-free),
    // sqrt/÷ correctly rounded — the whole chain replays exactly; the
    // min(1% of D, 1000) generation cap binds on both sides identically
    "q_sparse_cosine" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), grams AS (
           SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
             THEN list_transform(range(1, len(tk)), i -> array_to_string(tk[i:i+1], ' '))
             ELSE [] END) AS term
           FROM toks
         ), tfc AS (
           SELECT doc_id, term, count(*) AS tf FROM grams GROUP BY 1, 2
         ), dft AS (
           SELECT term, count(*) AS df FROM tfc GROUP BY 1
         ), n AS (SELECT count(*) AS n FROM documents),
         v AS (
           SELECT tfc.doc_id, tfc.term,
             CAST(round(tfc.tf * (n.n + 1.0) / (dft.df + 1.0), 4) AS DECIMAL(18,4)) AS w
           FROM tfc JOIN dft ON tfc.term = dft.term CROSS JOIN n
         ), norms AS (
           SELECT doc_id, sqrt(CAST(sum(w * w) AS DOUBLE)) AS norm FROM v GROUP BY 1
         ), d AS (SELECT count(DISTINCT doc_id) AS d FROM v),
         gen AS (
           SELECT v.doc_id, v.term FROM v JOIN dft ON v.term = dft.term CROSS JOIN d
           WHERE dft.df <= least(floor(d.d * 0.01), 1000)
         ), cand AS (
           SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM gen a JOIN gen b ON a.term = b.term AND a.doc_id < b.doc_id
         ), dots AS (
           SELECT c.da, c.db, CAST(sum(va.w * vb.w) AS DOUBLE) AS dot
           FROM cand c
           JOIN v va ON va.doc_id = c.da
           JOIN v vb ON vb.doc_id = c.db AND vb.term = va.term
           GROUP BY 1, 2
         )
         SELECT da AS doc_id_a, db AS doc_id_b, cos_sim FROM (
           SELECT d2.da, d2.db, round(d2.dot / (na.norm * nb.norm), 4) AS cos_sim
           FROM dots d2
           JOIN norms na ON na.doc_id = d2.da
           JOIN norms nb ON nb.doc_id = d2.db) t
         WHERE cos_sim >= 0.05
         ORDER BY doc_id_a, doc_id_b""",

    // chain pairs close transitively into their whole normalized-text
    // group, so the expected labeling is simply the per-group min — no
    // recursion needed; the Spark side must reproduce it by actual
    // multi-round star contraction over the chain edges
    "q_cc_star" ->
      """SELECT doc_id,
           min(doc_id) OVER (
             PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
           ) AS canonical_id
         FROM documents ORDER BY doc_id""",

    // IVF is deterministic end-to-end (pseudo-codebook = the 32 lowest
    // vec_ids — fixed size at any corpus scale; 6dp-rounded assignment,
    // 4dp-rounded scoring) so the whole assign→probe→rank pipeline is
    // SQL-expressible
    "q_ivf_topk" ->
      """WITH ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         c AS (SELECT vec_id AS centroid_id, e FROM ec WHERE vec_id < 32),
         ca AS (
           SELECT vec_id, e, centroid_id FROM (
             SELECT x.vec_id, x.e, c.centroid_id,
               row_number() OVER (PARTITION BY x.vec_id
                 ORDER BY round(list_cosine_similarity(x.e, c.e), 6) DESC, c.centroid_id) AS rn
             FROM ec x CROSS JOIN c) WHERE rn = 1),
         qa AS (SELECT vec_id AS query_id, e, centroid_id FROM ca WHERE vec_id < 5)
         SELECT query_id, vec_id, cos_sim, rank FROM (
           SELECT q.query_id, a.vec_id,
             round(list_cosine_similarity(q.e, a.e), 4) AS cos_sim,
             row_number() OVER (PARTITION BY q.query_id
               ORDER BY round(list_cosine_similarity(q.e, a.e), 4) DESC, a.vec_id) AS rank
           FROM ca a JOIN qa q ON a.centroid_id = q.centroid_id AND a.vec_id <> q.query_id) t
         WHERE rank <= 3 ORDER BY query_id, rank""",

    // the q_ivf_topk chain at nprobe=2 — the index path changes WHERE
    // the rows are read (pruned partitions), not what they score
    "q_ivf_indexed" ->
      """WITH ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         c AS (SELECT vec_id AS centroid_id, e FROM ec WHERE vec_id < 32),
         ca AS (
           SELECT vec_id, e, centroid_id FROM (
             SELECT x.vec_id, x.e, c.centroid_id,
               row_number() OVER (PARTITION BY x.vec_id
                 ORDER BY round(list_cosine_similarity(x.e, c.e), 6) DESC, c.centroid_id) AS rn
             FROM ec x CROSS JOIN c) WHERE rn = 1),
         qa AS (
           SELECT vec_id AS query_id, e, centroid_id FROM (
             SELECT x.vec_id, x.e, c.centroid_id,
               row_number() OVER (PARTITION BY x.vec_id
                 ORDER BY round(list_cosine_similarity(x.e, c.e), 6) DESC, c.centroid_id) AS rn
             FROM ec x CROSS JOIN c WHERE x.vec_id < 5) WHERE rn <= 2)
         SELECT query_id, vec_id, cos_sim, rank FROM (
           SELECT q.query_id, a.vec_id,
             round(list_cosine_similarity(q.e, a.e), 4) AS cos_sim,
             row_number() OVER (PARTITION BY q.query_id
               ORDER BY round(list_cosine_similarity(q.e, a.e), 4) DESC, a.vec_id) AS rank
           FROM ca a JOIN qa q ON a.centroid_id = q.centroid_id AND a.vec_id <> q.query_id) t
         WHERE rank <= 3 ORDER BY query_id, rank""",

    // the q_ivf_topk assignment + the q_quantize code chain, composed:
    // approx score = (scale_a·scale_q)·intdot (exact integer dot, two
    // pinned IEEE multiplies), survivors = top k·4 by approx, final rank
    // by the exact 4dp cosine among survivors only
    "q_ivf_quantized" ->
      """WITH ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         c AS (SELECT vec_id AS centroid_id, e FROM ec WHERE vec_id < 32),
         ca AS (
           SELECT vec_id, e, centroid_id FROM (
             SELECT x.vec_id, x.e, c.centroid_id,
               row_number() OVER (PARTITION BY x.vec_id
                 ORDER BY round(list_cosine_similarity(x.e, c.e), 6) DESC, c.centroid_id) AS rn
             FROM ec x CROSS JOIN c) WHERE rn = 1),
         qa AS (
           SELECT vec_id AS query_id, e, centroid_id FROM (
             SELECT x.vec_id, x.e, c.centroid_id,
               row_number() OVER (PARTITION BY x.vec_id
                 ORDER BY round(list_cosine_similarity(x.e, c.e), 6) DESC, c.centroid_id) AS rn
             FROM ec x CROSS JOIN c WHERE x.vec_id < 5) WHERE rn <= 2),
         qz AS (
           SELECT vec_id, scale,
             list_transform(d, x ->
               greatest(-127, least(127, CAST(floor(x / scale + 0.5) AS BIGINT)))) AS qs
           FROM (
             SELECT vec_id, d, CASE WHEN m > 0 THEN m / 127.0 ELSE 1.0 END AS scale
             FROM (SELECT vec_id, e AS d, list_max(list_transform(e, x -> abs(x))) AS m
                   FROM ec) t0) t1),
         nz AS (
           SELECT vec_id, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
           FROM ec),
         scored AS (
           SELECT q.query_id, a.vec_id, q.e AS qe, a.e AS ae,
             round(((za.scale * zq.scale) * CAST(list_sum(
               list_transform(range(1, len(za.qs) + 1), i -> za.qs[i] * zq.qs[i]))
               AS DOUBLE)) / (na.nrm * nq.nrm), 6) AS approx_sim
           FROM ca a JOIN qa q ON a.centroid_id = q.centroid_id AND a.vec_id <> q.query_id
           JOIN qz za ON za.vec_id = a.vec_id
           JOIN qz zq ON zq.vec_id = q.query_id
           JOIN nz na ON na.vec_id = a.vec_id
           JOIN nz nq ON nq.vec_id = q.query_id),
         surv AS (
           SELECT query_id, vec_id, qe, ae, approx_sim FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY approx_sim DESC, vec_id) AS ar
             FROM scored) WHERE ar <= 12)
         SELECT query_id, vec_id, cos_sim, approx_sim, rank FROM (
           SELECT query_id, vec_id, approx_sim,
             round(list_cosine_similarity(qe, ae), 4) AS cos_sim,
             row_number() OVER (PARTITION BY query_id
               ORDER BY round(list_cosine_similarity(qe, ae), 4) DESC, vec_id) AS rank
           FROM surv) WHERE rank <= 3 ORDER BY query_id, rank""",

    // the q_ivf_topk chain extended with probe ranks: per-nprobe top-k is
    // a filter over ONE scored candidate table, recall joins against the
    // q_embed_topk brute-force truth; the final ratio is a single IEEE
    // division of two BIGINTs (bit-exact in both engines)
    // the two-stage prefix retriever replayed: 16-component slice
    // cosine ranks k·4 survivors, full-dim exact cosine re-ranks them
    "q_trunc_topk" ->
      """WITH ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         q AS (SELECT vec_id AS query_id, e FROM ec WHERE vec_id < 5),
         surv AS (
           SELECT query_id, vec_id, prefix_sim FROM (
             SELECT q.query_id, c.vec_id,
               round(list_cosine_similarity(q.e[1:16], c.e[1:16]), 4) AS prefix_sim,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(q.e[1:16], c.e[1:16]), 4) DESC,
                   c.vec_id) AS pr
             FROM ec c CROSS JOIN q WHERE c.vec_id <> q.query_id)
           WHERE pr <= 12),
         rer AS (
           SELECT s.query_id, s.vec_id, s.prefix_sim,
             round(list_cosine_similarity(q.e, c.e), 4) AS cos_sim
           FROM surv s JOIN ec c ON s.vec_id = c.vec_id
                       JOIN q ON s.query_id = q.query_id)
         SELECT query_id, vec_id, prefix_sim, cos_sim, CAST(rank AS INT) AS rank FROM (
           SELECT query_id, vec_id, prefix_sim, cos_sim,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos_sim DESC, vec_id) AS rank
           FROM rer) WHERE rank <= 3
         ORDER BY query_id, rank""",

    // Gonzalez farthest-point replay: seed = min id, then five unrolled
    // argmax steps, each a least() fold of 1 − round(cos, 6) against the
    // one new center — ties to the smallest id exactly as the engine's
    // struct-max breaks them
    "q_kcenter" -> {
      val steps = (2 to 6).map { i =>
        s"""p$i AS (
           SELECT vec_id, md FROM d${i - 1} ORDER BY md DESC, vec_id ASC LIMIT 1),
         c$i AS (SELECT b.vec_id, b.e FROM base b JOIN p$i USING (vec_id)),
         d$i AS (
           SELECT d.vec_id, d.e,
             least(d.md, 1.0 - round(list_cosine_similarity(d.e, c.e), 6)) AS md
           FROM d${i - 1} d CROSS JOIN c$i c
           WHERE d.vec_id <> c.vec_id)"""
      }.mkString(",\n         ")
      val sel = (2 to 6).map(i =>
        s"SELECT $i AS rank, vec_id, md AS dist_to_selected FROM p$i")
        .mkString(" UNION ALL ")
      s"""WITH ec AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
               x -> x * x))) AS nrm
           FROM embeddings),
         base AS (SELECT vec_id, e FROM ec WHERE nrm > 0),
         s1 AS (SELECT vec_id FROM base ORDER BY vec_id LIMIT 1),
         c1 AS (SELECT b.vec_id, b.e FROM base b JOIN s1 USING (vec_id)),
         d1 AS (
           SELECT b.vec_id, b.e,
             1.0 - round(list_cosine_similarity(b.e, c.e), 6) AS md
           FROM base b CROSS JOIN c1 c WHERE b.vec_id <> c.vec_id),
         $steps
         SELECT CAST(rank AS INT) AS rank, vec_id, dist_to_selected FROM (
           SELECT 1 AS rank, s1.vec_id, CAST(NULL AS DOUBLE) AS dist_to_selected
           FROM s1
           UNION ALL $sel)
         ORDER BY rank"""
    },

    // the full-dim exact top-1 truth joined to the dim-16 prefix
    // ranking; each query's reciprocal rank floor(1e12/rank + 0.5)
    // summed as HUGEINT — the engine's quantized-mean discipline
    "q_mrr" ->
      """WITH ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         q AS (SELECT vec_id AS query_id, e FROM ec WHERE vec_id < 50),
         truth AS (
           SELECT query_id, vec_id FROM (
             SELECT q.query_id, c.vec_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(q.e, c.e), 4) DESC,
                   c.vec_id) AS rn
             FROM ec c CROSS JOIN q WHERE c.vec_id <> q.query_id)
           WHERE rn = 1),
         surv AS (
           SELECT query_id, vec_id, prefix_sim FROM (
             SELECT q.query_id, c.vec_id,
               round(list_cosine_similarity(q.e[1:16], c.e[1:16]), 4) AS prefix_sim,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(q.e[1:16], c.e[1:16]), 4) DESC,
                   c.vec_id) AS pr
             FROM ec c CROSS JOIN q WHERE c.vec_id <> q.query_id)
           WHERE pr <= 5),
         sys AS (
           SELECT query_id, vec_id, rank FROM (
             SELECT s.query_id, s.vec_id,
               row_number() OVER (PARTITION BY s.query_id
                 ORDER BY round(list_cosine_similarity(q.e, c.e), 4) DESC,
                   s.vec_id) AS rank
             FROM surv s JOIN ec c ON s.vec_id = c.vec_id
                         JOIN q ON s.query_id = q.query_id)
           WHERE rank <= 5),
         j AS (
           SELECT t.query_id,
             CASE WHEN s.rank IS NOT NULL AND s.rank <= 5
               THEN CAST(s.rank AS BIGINT) ELSE CAST(0 AS BIGINT) END AS rk
           FROM truth t LEFT JOIN sys s
             ON s.query_id = t.query_id AND s.vec_id = t.vec_id)
         SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN rk > 0 THEN 1 ELSE 0 END) AS BIGINT) AS hits,
           round(CAST(sum(CASE WHEN rk > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS hit_rate,
           round(CAST(CAST(sum(CASE WHEN rk > 0
                 THEN CAST(floor(1e12 / rk + 0.5) AS BIGINT)
                 ELSE 0 END) AS HUGEINT) AS DOUBLE)
             / count(*) / 1e12, 6) AS mrr
         FROM j""",

    // the q_ivf_topk retrieval chain (first-32 centroids, nprobe=1)
    // graded by the q_mrr scoring chain against the exact top-1 truth
    // — one composed replay of the whole retrieve-then-score lineage
    "q_retrieval_eval" ->
      """WITH ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         c AS (SELECT vec_id AS centroid_id, e FROM ec WHERE vec_id < 32),
         ca AS (
           SELECT vec_id, e, centroid_id FROM (
             SELECT x.vec_id, x.e, c.centroid_id,
               row_number() OVER (PARTITION BY x.vec_id
                 ORDER BY round(list_cosine_similarity(x.e, c.e), 6) DESC, c.centroid_id) AS rn
             FROM ec x CROSS JOIN c) WHERE rn = 1),
         qa AS (SELECT vec_id AS query_id, e, centroid_id FROM ca WHERE vec_id < 50),
         q AS (SELECT vec_id AS query_id, e FROM ec WHERE vec_id < 50),
         truth AS (
           SELECT query_id, vec_id FROM (
             SELECT q.query_id, c2.vec_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(q.e, c2.e), 4) DESC,
                   c2.vec_id) AS rn
             FROM ec c2 CROSS JOIN q WHERE c2.vec_id <> q.query_id)
           WHERE rn = 1),
         sys AS (
           SELECT query_id, vec_id, rank FROM (
             SELECT qq.query_id, a.vec_id,
               row_number() OVER (PARTITION BY qq.query_id
                 ORDER BY round(list_cosine_similarity(qq.e, a.e), 4) DESC, a.vec_id) AS rank
             FROM ca a JOIN qa qq ON a.centroid_id = qq.centroid_id AND a.vec_id <> qq.query_id) t
           WHERE rank <= 5),
         j AS (
           SELECT t.query_id,
             CASE WHEN s.rank IS NOT NULL AND s.rank <= 5
               THEN CAST(s.rank AS BIGINT) ELSE CAST(0 AS BIGINT) END AS rk
           FROM truth t LEFT JOIN sys s
             ON s.query_id = t.query_id AND s.vec_id = t.vec_id)
         SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN rk > 0 THEN 1 ELSE 0 END) AS BIGINT) AS hits,
           round(CAST(sum(CASE WHEN rk > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS hit_rate,
           round(CAST(CAST(sum(CASE WHEN rk > 0
                 THEN CAST(floor(1e12 / rk + 0.5) AS BIGINT)
                 ELSE 0 END) AS HUGEINT) AS DOUBLE)
             / count(*) / 1e12, 6) AS mrr
         FROM j""",

    // BQ replayed via the +-1 inner-product identity: hamming =
    // (dim - <sa, sb>) / 2 — exact integers, so DuckDB needs no bit
    // packing to agree with the engine's bit_count(xor) popcount
    "q_binary_topk" ->
      """WITH ec AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CASE WHEN x >= 0 THEN 1.0 ELSE -1.0 END) AS sg
           FROM embeddings),
         q AS (SELECT vec_id AS query_id, e, sg FROM ec WHERE vec_id < 5),
         cand AS (
           SELECT q.query_id, c.vec_id,
             CAST(64 - CAST(list_inner_product(c.sg, q.sg) AS BIGINT) AS BIGINT) // 2 AS hamming,
             round(list_cosine_similarity(q.e, c.e), 4) AS cos_sim
           FROM ec c CROSS JOIN q WHERE c.vec_id <> q.query_id),
         surv AS (
           SELECT query_id, vec_id, hamming, cos_sim FROM (
             SELECT cand.*, row_number() OVER (PARTITION BY query_id
               ORDER BY hamming, vec_id) AS hr
             FROM cand) WHERE hr <= 12)
         SELECT query_id, vec_id, hamming, cos_sim, CAST(rank AS INT) AS rank FROM (
           SELECT query_id, vec_id, hamming, cos_sim,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos_sim DESC, vec_id) AS rank
           FROM surv) WHERE rank <= 3
         ORDER BY query_id, rank""",

    // the BQ sweep: one scored CTE carries BOTH rankings (hamming
    // candidate rank, exact cosine rank); each rf is a filter over it
    "q_binary_recall" ->
      """WITH ec AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CASE WHEN x >= 0 THEN 1.0 ELSE -1.0 END) AS sg
           FROM embeddings),
         q AS (SELECT vec_id AS query_id, e, sg FROM ec WHERE vec_id < 5),
         cand AS (
           SELECT q.query_id, c.vec_id,
             CAST(64 - CAST(list_inner_product(c.sg, q.sg) AS BIGINT) AS BIGINT) // 2 AS hamming,
             round(list_cosine_similarity(q.e, c.e), 4) AS cos_sim
           FROM ec c CROSS JOIN q WHERE c.vec_id <> q.query_id),
         ranked AS (
           SELECT cand.*,
             row_number() OVER (PARTITION BY query_id
               ORDER BY hamming, vec_id) AS hr,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos_sim DESC, vec_id) AS er
           FROM cand),
         exact AS (SELECT query_id, vec_id FROM ranked WHERE er <= 3),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS exact_pairs FROM exact),
         rfs AS (SELECT unnest([1, 2, 4]) AS rf),
         bin AS (
           SELECT rf, query_id, vec_id FROM (
             SELECT f.rf, r.query_id, r.vec_id,
               row_number() OVER (PARTITION BY f.rf, r.query_id
                 ORDER BY r.cos_sim DESC, r.vec_id) AS rank
             FROM ranked r JOIN rfs f ON r.hr <= 3 * f.rf)
           WHERE rank <= 3)
         SELECT CAST(b.rf AS INT) AS rf, tot.exact_pairs,
           CAST(count(*) AS BIGINT) AS bin_pairs,
           CAST(count(e.query_id) AS BIGINT) AS hit_pairs,
           CAST(count(e.query_id) AS DOUBLE) / CAST(tot.exact_pairs AS DOUBLE) AS recall_at_k
         FROM bin b LEFT JOIN exact e
           ON b.query_id = e.query_id AND b.vec_id = e.vec_id, tot
         GROUP BY b.rf, tot.exact_pairs ORDER BY rf""",

    // reciprocal top-1: the q_embed_topk ranking contract at rank 1 in
    // both directions, joined on mutual agreement
    "q_mutual_nn" ->
      """WITH ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         t1 AS (
           SELECT query_id, vec_id, cos_sim FROM (
             SELECT q.vec_id AS query_id, c.vec_id,
               round(list_cosine_similarity(q.e, c.e), 4) AS cos_sim,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(q.e, c.e), 4) DESC,
                   c.vec_id) AS r
             FROM ec c CROSS JOIN ec q WHERE c.vec_id <> q.vec_id)
           WHERE r = 1)
         SELECT f.query_id AS vec_id_a, f.vec_id AS vec_id_b, f.cos_sim
         FROM t1 f JOIN t1 b ON f.query_id = b.vec_id AND f.vec_id = b.query_id
         WHERE f.query_id < f.vec_id
         ORDER BY vec_id_a, vec_id_b""",

    // the IVF-blocked replay: nprobe=4 assignment for EVERY vector (the
    // q_ivf_indexed CTE), candidates join on a shared probed centroid,
    // per-side top-1 over candidates, then the same mutual join. A pair
    // sharing both probes ranks its identical duplicate rows adjacent —
    // row_number picks one, same as the engine's k-slot collapse.
    "q_mutual_nn_ivf" ->
      """WITH ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         c AS (SELECT vec_id AS centroid_id, e FROM ec WHERE vec_id < 32),
         a2 AS (
           SELECT vec_id, e, centroid_id FROM (
             SELECT x.vec_id, x.e, c.centroid_id,
               row_number() OVER (PARTITION BY x.vec_id
                 ORDER BY round(list_cosine_similarity(x.e, c.e), 6) DESC, c.centroid_id) AS rn
             FROM ec x CROSS JOIN c) WHERE rn <= 4),
         t1 AS (
           SELECT query_id, vec_id, cos_sim FROM (
             SELECT q.vec_id AS query_id, a.vec_id,
               round(list_cosine_similarity(q.e, a.e), 4) AS cos_sim,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(q.e, a.e), 4) DESC,
                   a.vec_id) AS r
             FROM a2 a JOIN a2 q
               ON a.centroid_id = q.centroid_id AND a.vec_id <> q.vec_id)
           WHERE r = 1)
         SELECT f.query_id AS vec_id_a, f.vec_id AS vec_id_b, f.cos_sim
         FROM t1 f JOIN t1 b ON f.query_id = b.vec_id AND f.vec_id = b.query_id
         WHERE f.query_id < f.vec_id
         ORDER BY vec_id_a, vec_id_b""",

    // link prediction replayed over the co-purchase projection:
    // capped-center wedges, anti-join against the edge set, decimal RA sum
    "q_link_predict" ->
      """WITH li AS (
           SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem
           WHERE l_orderkey % 10 = 0
         ), gok AS (
           SELECT g FROM (SELECT g, count(*) AS ni FROM li GROUP BY g)
           WHERE ni > 1 AND ni <= 64
         ), lik AS (
           SELECT li.g, li.i FROM li JOIN gok USING (g)
         ), p AS (
           SELECT DISTINCT a.i AS src, b.i AS dst
           FROM lik a JOIN lik b ON a.g = b.g AND a.i < b.i
         ), e AS (
           SELECT src, dst FROM p UNION ALL SELECT dst AS src, src AS dst FROM p
         ), deg AS (
           SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
         ), ctr AS (
           SELECT node, deg FROM deg WHERE deg <= 64
         ), w AS (
           SELECT e1.dst AS x, e2.dst AS y, ct.deg AS dz
           FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
           JOIN ctr ct ON ct.node = e1.src
         ), na AS (
           SELECT w.x, w.y, w.dz FROM w
           LEFT JOIN p ON w.x = p.src AND w.y = p.dst
           WHERE p.src IS NULL
         ), sc AS (
           SELECT x, y, CAST(count(*) AS BIGINT) AS common_neighbors,
             CAST(sum(CAST(floor(CAST(1e12 AS DOUBLE) / dz + 0.5) AS BIGINT)) AS BIGINT) AS ra
           FROM na GROUP BY x, y HAVING count(*) >= 2)
         SELECT sc.x AS node_a, sc.y AS node_b, sc.common_neighbors,
           round(CAST(sc.common_neighbors AS DOUBLE)
             / (da.deg + db.deg - sc.common_neighbors), 4) AS jaccard,
           round(CAST(sc.ra AS DOUBLE) / 1e12, 6) AS resource_alloc
         FROM sc JOIN deg da ON da.node = sc.x JOIN deg db ON db.node = sc.y
         ORDER BY node_a, node_b""",

    // basket statistics replay: capped baskets drop from the WHOLE
    // analysis (consistent denominators); ratios are single IEEE
    // divisions over exact counts, 6dp
    "q_assoc_rules" ->
      """WITH bi AS (
           SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
           WHERE l_orderkey % 10 = 0
         ), ok AS (
           SELECT b FROM (SELECT b, count(*) AS ni FROM bi GROUP BY 1)
           WHERE ni <= 64
         ), s AS (SELECT bi.* FROM bi JOIN ok USING (b)),
         n AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS nb FROM s),
         ic AS (SELECT i, CAST(count(*) AS BIGINT) AS n_i FROM s GROUP BY 1),
         p AS (
           SELECT a.i AS item_a, b.i AS item_b, CAST(count(*) AS BIGINT) AS n_ab
           FROM s a JOIN s b ON a.b = b.b AND a.i < b.i GROUP BY 1, 2
           HAVING count(*) >= 1)
         SELECT item_a, item_b, ia.n_i AS n_a, ib.n_i AS n_b, n_ab,
           round(CAST(n_ab AS DOUBLE) / nb, 6) AS support,
           round(CAST(n_ab AS DOUBLE) / ia.n_i, 6) AS conf_a_b,
           round(CAST(n_ab AS DOUBLE) / ib.n_i, 6) AS conf_b_a,
           round(CAST(n_ab AS DOUBLE) * nb / CAST(ia.n_i * ib.n_i AS DOUBLE), 6) AS lift
         FROM p JOIN ic ia ON p.item_a = ia.i JOIN ic ib ON p.item_b = ib.i
         CROSS JOIN n
         ORDER BY item_a, item_b""",

    // discrete medians (quantile_disc = the engine's cum-count order
    // statistic), one IEEE multiply for the fence — no stddev, no logs
    "q_mad_outliers" ->
      """WITH v AS (
           SELECT event_type AS stratum, value AS v FROM events
           WHERE value IS NOT NULL
         ), med AS (
           SELECT stratum, quantile_disc(v, 0.5) AS med FROM v GROUP BY stratum
         ), dev AS (
           SELECT v.stratum, v.v, m.med, abs(v.v - m.med) AS d
           FROM v JOIN med m USING (stratum)
         ), mad AS (
           SELECT stratum, quantile_disc(d, 0.5) AS mad FROM dev GROUP BY stratum)
         SELECT dev.stratum, CAST(count(*) AS BIGINT) AS n,
           first(dev.med) AS med, first(mad.mad) AS mad,
           CAST(sum(CASE WHEN mad.mad > 0 AND dev.d > CAST(3.0 AS DOUBLE) * mad.mad
             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(CAST(sum(CASE WHEN mad.mad > 0 AND dev.d > CAST(3.0 AS DOUBLE) * mad.mad
             THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS outlier_share
         FROM dev JOIN mad USING (stratum)
         GROUP BY dev.stratum ORDER BY stratum""",

    "q_kanon" ->
      """SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n,
         round(CAST(1.0 AS DOUBLE) / count(*), 6) AS risk,
         count(*) < 10 AS violates
         FROM customer GROUP BY c_nationkey, c_mktsegment
         ORDER BY c_nationkey, c_mktsegment""",

    "q_ldiversity" ->
      """SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT c_acctbal) AS BIGINT) AS n_sensitive,
         count(DISTINCT c_acctbal) < 5 AS violates
         FROM customer GROUP BY c_nationkey, c_mktsegment
         ORDER BY c_nationkey, c_mktsegment""",

    // per-(class, value) terms as HUGEINT cross-products, 9dp-quantized
    // DECIMAL(19,9) sums (the chi_term discipline), absent mass via the
    // 1 − Σ_present p_g closed form, one 6dp division at the boundary
    "q_tcloseness" ->
      """WITH r AS (
           SELECT lang, source FROM documents WHERE source IS NOT NULL
         ), cv AS (
           SELECT lang, source, CAST(count(*) AS BIGINT) AS cvc
           FROM r GROUP BY lang, source
         ), v AS (
           SELECT source, CAST(count(*) AS BIGINT) AS cvv
           FROM r GROUP BY source
         ), c AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n FROM r GROUP BY lang
         ), tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM r),
         terms AS (
           SELECT cv.lang, c.n,
             CAST(round(CAST(abs(CAST(cv.cvc AS HUGEINT) * tot.nn
                 - CAST(v.cvv AS HUGEINT) * c.n) AS DOUBLE)
               / (CAST(c.n AS DOUBLE) * CAST(tot.nn AS DOUBLE)), 9)
               AS DECIMAL(19,9)) AS term,
             CAST(round(CAST(v.cvv AS DOUBLE) / tot.nn, 9)
               AS DECIMAL(19,9)) AS pg
           FROM cv JOIN v USING (source) JOIN c USING (lang), tot
         )
         SELECT lang, n,
           round((CAST(sum(term) AS DOUBLE)
             + (1.0 - CAST(sum(pg) AS DOUBLE))) / 2.0, 6) AS tvd,
           round((CAST(sum(term) AS DOUBLE)
             + (1.0 - CAST(sum(pg) AS DOUBLE))) / 2.0, 6) > 0.15 AS violates
         FROM terms GROUP BY lang, n
         ORDER BY lang""",

    "q_skew_keys" ->
      """WITH counts AS (
           SELECT user_id AS key, CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY user_id
         ), g AS (
           SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys FROM counts
         ), top AS (
           SELECT key, cnt, rank FROM (
             SELECT key, cnt,
               row_number() OVER (ORDER BY cnt DESC, key NULLS LAST) AS rank
             FROM counts) WHERE rank <= 20)
         SELECT CAST(top.rank AS INT) AS rank, top.key, top.cnt,
           g.n_rows, g.n_keys,
           round(CAST(top.cnt AS DOUBLE) / g.n_rows, 6) AS share,
           round(CAST(top.cnt AS DOUBLE)
             / (CAST(g.n_rows AS DOUBLE) / g.n_keys), 4) AS skew_ratio
         FROM top, g ORDER BY rank""",

    // centroid drift replayed with the q_pagerank fixed-point trick:
    // 2^20 integer dim sums (order-free), cosine on the sums themselves
    "q_centroid_drift" ->
      """WITH fx AS (
           SELECT label AS grp, pos,
             CAST(floor(x * CAST(1048576 AS DOUBLE) + 0.5) AS BIGINT) AS fx
           FROM (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
                   generate_subscripts(embedding, 1) AS pos
                 FROM embeddings)
         ), bg AS (
           SELECT grp, pos, CAST(sum(fx) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
           FROM fx GROUP BY grp, pos
         ), ga AS (
           SELECT grp, max(n) AS n, list(CAST(s AS DOUBLE) ORDER BY pos) AS v
           FROM bg GROUP BY grp
         ), gg AS (
           SELECT CAST(max(nt) AS BIGINT) AS gn,
             list(CAST(gs AS DOUBLE) ORDER BY pos) AS gv
           FROM (SELECT pos, CAST(sum(s) AS BIGINT) AS gs,
                   CAST(sum(n) AS BIGINT) AS nt
                 FROM bg GROUP BY pos))
         SELECT grp AS label, n,
           round(list_cosine_similarity(v, gv), 4) AS cos_to_global,
           round((sqrt(list_inner_product(v, v)) / n)
             / (sqrt(list_inner_product(gv, gv)) / gn), 4) AS norm_ratio
         FROM ga, gg ORDER BY label""",

    // NULL counts as a distinct rhs state (the engine's null-aware
    // n_distinct): count(DISTINCT) + 1 if any NULL appears in the group
    "q_fd_check" ->
      """SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT l_suppkey)
           + max(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_distinct
         FROM lineitem GROUP BY l_partkey
         HAVING count(DISTINCT l_suppkey)
           + max(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) > 1
         ORDER BY l_partkey""",

    // the digit comes from floor(log10) used only to integer precision;
    // expected shares are 12dp DOUBLE literals, never engine logs
    "q_benford" ->
      """WITH v AS (
           SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
           WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0
         ), d AS (
           SELECT CAST(least(greatest(
             floor(v / power(10, floor(log10(v)))), 1), 9) AS INT) AS digit
           FROM v
         ), t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM v),
         e AS (
           SELECT digit, CAST(count(*) AS BIGINT) AS n,
             round(CAST(count(*) AS DOUBLE) / t.tot, 6) AS share,
             CASE digit
               WHEN 1 THEN CAST(0.301029995664 AS DOUBLE)
               WHEN 2 THEN CAST(0.176091259056 AS DOUBLE)
               WHEN 3 THEN CAST(0.124938736608 AS DOUBLE)
               WHEN 4 THEN CAST(0.096910013008 AS DOUBLE)
               WHEN 5 THEN CAST(0.079181246048 AS DOUBLE)
               WHEN 6 THEN CAST(0.066946789631 AS DOUBLE)
               WHEN 7 THEN CAST(0.057991946978 AS DOUBLE)
               WHEN 8 THEN CAST(0.051152522447 AS DOUBLE)
               ELSE CAST(0.045757490561 AS DOUBLE) END AS expected
           FROM d, t GROUP BY digit, t.tot)
         SELECT digit, n, share, expected,
           round(abs(share - expected), 6) AS deviation
         FROM e ORDER BY digit""",

    // per-cell chi-square contributions + the decimal-summed statistic
    "q_chisq" ->
      """WITH cells AS (
           SELECT lang AS a, source AS b, CAST(count(*) AS BIGINT) AS n
           FROM documents
           WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2
         ), rt AS (SELECT a, CAST(sum(n) AS BIGINT) AS ra FROM cells GROUP BY a),
         ct AS (SELECT b, CAST(sum(n) AS BIGINT) AS rb FROM cells GROUP BY b),
         g AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
         sc AS (
           SELECT cells.a, cells.b, cells.n,
             CAST(rt.ra AS DOUBLE) * ct.rb / g.nn AS e
           FROM cells JOIN rt USING (a) JOIN ct USING (b), g
         ), sc2 AS (
           SELECT a, b, n, e, round((n - e) * (n - e) / e, 6) AS chi_term
           FROM sc
         ), tot AS (
           SELECT CAST(sum(CAST(chi_term AS DECIMAL(18,6))) AS DOUBLE) AS chi2_total,
             CAST((SELECT count(DISTINCT a) FROM cells) - 1 AS BIGINT)
               * CAST((SELECT count(DISTINCT b) FROM cells) - 1 AS BIGINT) AS dof
           FROM sc2)
         SELECT sc2.a, sc2.b, sc2.n, round(sc2.e, 6) AS expected,
           sc2.chi_term, tot.chi2_total, tot.dof
         FROM sc2, tot ORDER BY a, b""",

    // decimal power sums, double-first cross-multiplies (the q_corr
    // convention), per-group terms 6dp-quantized before the decimal sum
    "q_anova" ->
      """WITH v AS (
           SELECT CAST(n_chars AS DECIMAL(18,4)) AS x, lang AS g
           FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL
         ), a AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n, sum(x) AS s,
             sum(x * x) AS q
           FROM v GROUP BY g
         ), b AS (
           SELECT g, n, q, s,
             CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n, 6)
               AS DECIMAL(18,6)) AS t
           FROM a
         ), c AS (
           SELECT CAST(sum(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
             sum(q) AS qq, sum(t) AS tt, sum(s) AS ss
           FROM b
         ), d AS (
           SELECT n, k,
             CAST(tt AS DOUBLE)
               - round(CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / n, 6) AS ssb,
             CAST(qq AS DOUBLE) - CAST(tt AS DOUBLE) AS ssw
           FROM c)
         SELECT n, k, round(ssb, 6) AS ss_between, round(ssw, 6) AS ss_within,
           CASE WHEN ssb + ssw <= 0 THEN NULL
             ELSE round(ssb / (ssb + ssw), 6) END AS eta_sq,
           CASE WHEN k < 2 OR n <= k OR ssw <= 0 THEN NULL
             ELSE round((ssb / (k - 1)) / (ssw / (n - k)), 6) END AS f_stat
         FROM d""",

    // the pc1 projection CTE feeding the same ANOVA chain — the
    // unsupervised axis graded against the held labels
    "q_anova_pc1" -> (pcaCte + """
         , sc AS (
           SELECT q.vec_id,
             round(CAST(sum(CAST(q.qv AS HUGEINT) * vf.v) AS DOUBLE)
               / (1048576 * 1e12), 6) AS pc1_score
           FROM q JOIN vfin vf ON vf.i = q.pos GROUP BY q.vec_id
         ), v AS (
           SELECT CAST(sc.pc1_score AS DECIMAL(18,4)) AS x, e.label AS g
           FROM sc JOIN embeddings e ON e.vec_id = sc.vec_id
           WHERE sc.pc1_score IS NOT NULL AND e.label IS NOT NULL
         ), a AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n, sum(x) AS s,
             sum(x * x) AS q
           FROM v GROUP BY g
         ), b AS (
           SELECT g, n, q, s,
             CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n, 6)
               AS DECIMAL(18,6)) AS t
           FROM a
         ), c AS (
           SELECT CAST(sum(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
             sum(q) AS qq, sum(t) AS tt, sum(s) AS ss
           FROM b
         ), d AS (
           SELECT n, k,
             CAST(tt AS DOUBLE)
               - round(CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / n, 6) AS ssb,
             CAST(qq AS DOUBLE) - CAST(tt AS DOUBLE) AS ssw
           FROM c)
         SELECT n, k, round(ssb, 6) AS ss_between, round(ssw, 6) AS ss_within,
           CASE WHEN ssb + ssw <= 0 THEN NULL
             ELSE round(ssb / (ssb + ssw), 6) END AS eta_sq,
           CASE WHEN k < 2 OR n <= k OR ssw <= 0 THEN NULL
             ELSE round((ssb / (k - 1)) / (ssw / (n - k)), 6) END AS f_stat
         FROM d"""),

    // the matryoshka sweep replayed with list slicing: per-dim prefix
    // cosine (4dp + vec_id ties, the brute-force contract) vs the
    // full-dim exact top-k
    "q_dim_recall" ->
      """WITH ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         dims AS (SELECT unnest([8, 16, 32]) AS dim),
         tc AS (SELECT d.dim, x.vec_id, x.e[1:d.dim] AS e FROM ec x CROSS JOIN dims d),
         tq AS (SELECT dim, vec_id AS query_id, e FROM tc WHERE vec_id < 5),
         tt AS (
           SELECT dim, query_id, vec_id FROM (
             SELECT c.dim, q.query_id, c.vec_id,
               row_number() OVER (PARTITION BY c.dim, q.query_id
                 ORDER BY round(list_cosine_similarity(q.e, c.e), 4) DESC, c.vec_id) AS rank
             FROM tc c JOIN tq q ON c.dim = q.dim AND c.vec_id <> q.query_id)
           WHERE rank <= 3),
         exact AS (
           SELECT query_id, vec_id FROM (
             SELECT q.vec_id AS query_id, c2.vec_id AS vec_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(q.e, c2.e), 4) DESC, c2.vec_id) AS rank
             FROM ec c2 CROSS JOIN (SELECT * FROM ec WHERE vec_id < 5) q
             WHERE c2.vec_id <> q.vec_id) t WHERE rank <= 3),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS exact_pairs FROM exact)
         SELECT CAST(t.dim AS INT) AS dim,
           tot.exact_pairs,
           CAST(count(*) AS BIGINT) AS trunc_pairs,
           CAST(count(e.query_id) AS BIGINT) AS hit_pairs,
           CAST(count(e.query_id) AS DOUBLE) / CAST(tot.exact_pairs AS DOUBLE) AS recall_at_k
         FROM tt t
         LEFT JOIN exact e ON t.query_id = e.query_id AND t.vec_id = e.vec_id, tot
         GROUP BY t.dim, tot.exact_pairs
         ORDER BY dim""",

    "q_ivf_recall" ->
      """WITH ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         c AS (SELECT vec_id AS centroid_id, e FROM ec WHERE vec_id < 32),
         ca AS (
           SELECT vec_id, e, centroid_id FROM (
             SELECT x.vec_id, x.e, c.centroid_id,
               row_number() OVER (PARTITION BY x.vec_id
                 ORDER BY round(list_cosine_similarity(x.e, c.e), 6) DESC, c.centroid_id) AS rn
             FROM ec x CROSS JOIN c) WHERE rn = 1),
         qa AS (
           SELECT vec_id AS query_id, e, centroid_id, rn AS probe_rank FROM (
             SELECT x.vec_id, x.e, c.centroid_id,
               row_number() OVER (PARTITION BY x.vec_id
                 ORDER BY round(list_cosine_similarity(x.e, c.e), 6) DESC, c.centroid_id) AS rn
             FROM ec x CROSS JOIN c WHERE x.vec_id < 5) WHERE rn <= 4),
         scored AS (
           SELECT q.query_id, a.vec_id, q.probe_rank,
             round(list_cosine_similarity(q.e, a.e), 4) AS cos_sim
           FROM ca a JOIN qa q ON a.centroid_id = q.centroid_id AND a.vec_id <> q.query_id),
         np AS (SELECT unnest([1, 2, 4]) AS nprobe),
         ivf AS (
           SELECT nprobe, query_id, vec_id FROM (
             SELECT np.nprobe, s.query_id, s.vec_id,
               row_number() OVER (PARTITION BY np.nprobe, s.query_id
                 ORDER BY s.cos_sim DESC, s.vec_id) AS rank
             FROM np CROSS JOIN scored s
             WHERE s.probe_rank <= np.nprobe) WHERE rank <= 3),
         exact AS (
           SELECT query_id, vec_id FROM (
             SELECT q.vec_id AS query_id, c2.vec_id AS vec_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(q.e, c2.e), 4) DESC, c2.vec_id) AS rank
             FROM ec c2 CROSS JOIN (SELECT * FROM ec WHERE vec_id < 5) q
             WHERE c2.vec_id <> q.vec_id) t WHERE rank <= 3),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS exact_pairs FROM exact)
         SELECT CAST(i.nprobe AS INT) AS nprobe,
           tot.exact_pairs,
           CAST(count(*) AS BIGINT) AS ivf_pairs,
           CAST(count(e.query_id) AS BIGINT) AS hit_pairs,
           CAST(count(e.query_id) AS DOUBLE) / CAST(tot.exact_pairs AS DOUBLE) AS recall_at_k
         FROM ivf i
         LEFT JOIN exact e ON i.query_id = e.query_id AND i.vec_id = e.vec_id, tot
         GROUP BY i.nprobe, tot.exact_pairs
         ORDER BY nprobe""",

    // the full PQ chain replayed: subvector slices, pseudo-codebooks,
    // nearest-sub-centroid codes (6dp ‖x−c‖² with the pinned
    // xx − 2xc + cc expression shape), fixed-point ADC lookup sums,
    // exact-cosine re-rank of the 12 survivors
    "q_pq_topk" ->
      """WITH ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         ss AS (SELECT unnest(range(0, 4)) AS subspace),
         sv AS (
           SELECT vec_id, subspace, e[subspace*16 + 1 : subspace*16 + 16] AS sub
           FROM ec CROSS JOIN ss),
         cb AS (SELECT subspace, vec_id AS centroid_id, sub AS c_sub
                FROM sv WHERE vec_id < 16),
         enc AS (
           SELECT vec_id, subspace, centroid_id AS code FROM (
             SELECT v.vec_id, v.subspace, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id, v.subspace ORDER BY
                 round(list_sum(list_transform(range(1, 17), i -> v.sub[i] * v.sub[i]))
                   - 2 * list_sum(list_transform(range(1, 17), i -> v.sub[i] * c.c_sub[i]))
                   + list_sum(list_transform(range(1, 17), i -> c.c_sub[i] * c.c_sub[i])), 6) ASC,
                 c.centroid_id ASC) AS rn
             FROM sv v JOIN cb c USING (subspace)) WHERE rn = 1),
         lut AS (
           SELECT q.vec_id AS query_id, q.subspace, c.centroid_id AS code,
             CAST(floor(round(list_sum(list_transform(range(1, 17),
               i -> q.sub[i] * c.c_sub[i])), 6) * 1099511627776 + 0.5) AS BIGINT) AS ipq
           FROM sv q JOIN cb c USING (subspace) WHERE q.vec_id < 5),
         approx AS (
           SELECT query_id, vec_id,
             round(CAST(CAST(sum(ipq) AS BIGINT) AS DOUBLE) / 1099511627776, 6) AS approx_ip
           FROM enc JOIN lut USING (subspace, code)
           WHERE vec_id <> query_id
           GROUP BY query_id, vec_id),
         surv AS (
           SELECT query_id, vec_id, approx_ip FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY approx_ip DESC, vec_id ASC) AS ar
             FROM approx) WHERE ar <= 12)
         SELECT query_id, vec_id, cos_sim, approx_ip, rank FROM (
           SELECT s.query_id, s.vec_id, s.approx_ip,
             round(list_cosine_similarity(q.e, v.e), 4) AS cos_sim,
             row_number() OVER (PARTITION BY s.query_id
               ORDER BY round(list_cosine_similarity(q.e, v.e), 4) DESC, s.vec_id ASC) AS rank
           FROM surv s
           JOIN ec v ON v.vec_id = s.vec_id
           JOIN ec q ON q.vec_id = s.query_id) t
         WHERE rank <= 3 ORDER BY query_id, rank""",

    // IVFADC: the q_pq_topk ADC chain restricted to the q_ivf_indexed
    // probe sets — a candidate participates iff its IVF centroid is
    // among the query's nprobe=2 probes; everything else (codes, LUT,
    // fixed-point sums, exact re-rank of the 12 survivors) is the
    // identical pinned arithmetic
    "q_ivf_pq" -> ivfPqChainSql(),

    // seed-index + appendIvfPq + probe (q_ivf_pq_append): encoding is a
    // pure per-row function of the FROZEN codebooks, so the maintenance
    // chain (cold build over the seed, frozen-codebook append of the
    // rest, guarded re-append of the same batch as a pinned no-op) must
    // reproduce the cold chain over the union bit-for-bit — the oracle
    // IS the cold replay; any append-path divergence (re-trained
    // codebook, duplicated codes doubling an ADC sum, dropped rows)
    // hash-mismatches here
    "q_ivf_pq_append" -> ivfPqChainSql(),

    // takedown replay, IVFADC: the identical pinned chain with the CODE
    // side restricted to surviving vectors — frozen codebooks and the
    // query/rerank arithmetic stay corpus-wide, exactly the engine's
    // tombstone semantics (codes hidden, trained geometry untouched)
    "q_forget_ivf" -> ivfPqChainSql(" WHERE v.vec_id % 7 <> 3"),

    // retrain-and-swap: the whole chain (codebook draws included) over
    // the survivor corpus — the retrained index never saw the forgotten
    // vectors, unlike q_forget_ivf's corpus-wide frozen books
    "q_ivf_retrain" -> ivfPqChainSql(ecWhere = " WHERE vec_id % 7 <> 3"),

    // generational retrain: the SAME survivor cold chain — the pointer
    // flip changes where the bytes live, never what serves
    "q_ivf_retrain_gen" -> ivfPqChainSql(ecWhere = " WHERE vec_id % 7 <> 3"),

    // drift policy: the fired retrain's post-state is the survivor cold
    // chain (a non-firing policy would have served the frozen-codebook
    // q_forget_ivf answers instead — the oracle distinguishes them)
    "q_retrain_policy" -> ivfPqChainSql(ecWhere = " WHERE vec_id % 7 <> 3"),

    // trained retrain: the k-means chain (q_kmeans arithmetic at k=32,
    // 2 iterations) feeding the IVFADC probe replay — codebook
    // training, encoding, partition-pruned ADC, and exact re-rank as
    // ONE cross-engine statement
    "q_ivf_retrain_trained" -> ivfPqChainSql(trainedK = Some((32, 2))),

    // filtered-search replay: the same restricted chain with the
    // predicate as the code-side filter — pre-ADC filtering must equal
    // the unfiltered algorithm on the allowed sub-corpus
    "q_ivf_filtered" -> ivfPqChainSql(" WHERE v.vec_id % 3 = 1"),

    // drift replay: seed assignment feeds the store counts, batch
    // assignment carries round-half-up 6dp fixed-point cosines whose
    // LONG sum makes the mean engine-exact; unhit centroids read the
    // -1.0 sentinel, never NULL
    "q_ivf_drift" ->
      """WITH ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         c AS (SELECT vec_id AS centroid_id, e FROM ec WHERE vec_id < 32),
         seed AS (SELECT vec_id, e FROM ec WHERE vec_id < 32 OR vec_id % 2 = 0),
         batch AS (SELECT vec_id, e FROM ec WHERE vec_id >= 32 AND vec_id % 2 = 1),
         sa AS (
           SELECT vec_id, centroid_id FROM (
             SELECT x.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY x.vec_id
                 ORDER BY round(list_cosine_similarity(x.e, c.e), 6) DESC, c.centroid_id) AS rn
             FROM seed x CROSS JOIN c) WHERE rn = 1),
         ba AS (
           SELECT vec_id, centroid_id,
             CAST(floor(cos6 * 1000000 + 0.5) AS BIGINT) AS c6
           FROM (
             SELECT x.vec_id, c.centroid_id,
               round(list_cosine_similarity(x.e, c.e), 6) AS cos6,
               row_number() OVER (PARTITION BY x.vec_id
                 ORDER BY round(list_cosine_similarity(x.e, c.e), 6) DESC, c.centroid_id) AS rn
             FROM batch x CROSS JOIN c) WHERE rn = 1),
         ns AS (
           SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_store
           FROM sa GROUP BY 1),
         nb AS (
           SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_batch,
             round(sum(c6) / 1000000.0 / count(*), 6) AS mean_cos_batch
           FROM ba GROUP BY 1)
         SELECT c.centroid_id,
           CAST(coalesce(ns.n_store, 0) AS BIGINT) AS n_store,
           CAST(coalesce(nb.n_batch, 0) AS BIGINT) AS n_batch,
           coalesce(nb.mean_cos_batch, -1.0) AS mean_cos_batch
         FROM c LEFT JOIN ns USING (centroid_id) LEFT JOIN nb USING (centroid_id)
         ORDER BY c.centroid_id""",

    // q_ivf_pq with residual codes: res subtracts each vector's assigned
    // centroid IN DOUBLE, the PQ chain (codebooks, encode, LUT) runs on
    // residual slices, and approx adds the fixed-point q·centroid base
    // term — ⟨q, c + r̂⟩ = q·c + Σ LUT, every term through the same 2^40
    // quantization so the integer sum stays engine-exact
    "q_ivf_pq_res" ->
      """WITH ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         c AS (SELECT vec_id AS centroid_id, e FROM ec WHERE vec_id < 32),
         ca AS (
           SELECT vec_id, centroid_id FROM (
             SELECT x.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY x.vec_id
                 ORDER BY round(list_cosine_similarity(x.e, c.e), 6) DESC, c.centroid_id) AS rn
             FROM ec x CROSS JOIN c) WHERE rn = 1),
         qa AS (
           SELECT vec_id AS query_id, centroid_id FROM (
             SELECT x.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY x.vec_id
                 ORDER BY round(list_cosine_similarity(x.e, c.e), 6) DESC, c.centroid_id) AS rn
             FROM ec x CROSS JOIN c WHERE x.vec_id < 5) WHERE rn <= 2),
         res AS (
           SELECT x.vec_id, list_transform(range(1, 65), i -> x.e[i] - ce.e[i]) AS r
           FROM ec x
           JOIN ca a ON a.vec_id = x.vec_id
           JOIN c ce ON ce.centroid_id = a.centroid_id),
         ss AS (SELECT unnest(range(0, 4)) AS subspace),
         rsv AS (
           SELECT vec_id, subspace, r[subspace*16 + 1 : subspace*16 + 16] AS sub
           FROM res CROSS JOIN ss),
         qsv AS (
           SELECT vec_id, subspace, e[subspace*16 + 1 : subspace*16 + 16] AS sub
           FROM ec CROSS JOIN ss WHERE vec_id < 5),
         cb AS (SELECT subspace, vec_id - 32 AS centroid_id, sub AS c_sub
                FROM rsv WHERE vec_id >= 32 AND vec_id < 48),
         enc AS (
           SELECT vec_id, subspace, centroid_id AS code FROM (
             SELECT v.vec_id, v.subspace, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id, v.subspace ORDER BY
                 round(list_sum(list_transform(range(1, 17), i -> v.sub[i] * v.sub[i]))
                   - 2 * list_sum(list_transform(range(1, 17), i -> v.sub[i] * c.c_sub[i]))
                   + list_sum(list_transform(range(1, 17), i -> c.c_sub[i] * c.c_sub[i])), 6) ASC,
                 c.centroid_id ASC) AS rn
             FROM rsv v JOIN cb c USING (subspace)) WHERE rn = 1),
         lut AS (
           SELECT q.vec_id AS query_id, q.subspace, c.centroid_id AS code,
             CAST(floor(round(list_sum(list_transform(range(1, 17),
               i -> q.sub[i] * c.c_sub[i])), 6) * 1099511627776 + 0.5) AS BIGINT) AS ipq
           FROM qsv q JOIN cb c USING (subspace)),
         qc AS (
           SELECT q.query_id, q.centroid_id,
             CAST(floor(round(list_sum(list_transform(range(1, 65),
               i -> qe.e[i] * ce.e[i])), 6) * 1099511627776 + 0.5) AS BIGINT) AS qcq
           FROM qa q
           JOIN ec qe ON qe.vec_id = q.query_id
           JOIN c ce ON ce.centroid_id = q.centroid_id),
         approx AS (
           SELECT l.query_id, n.vec_id,
             round(CAST(qc.qcq + CAST(sum(l.ipq) AS BIGINT) AS DOUBLE) / 1099511627776, 6) AS approx_ip
           FROM enc n
           JOIN lut l ON l.subspace = n.subspace AND l.code = n.code
           JOIN ca a ON a.vec_id = n.vec_id
           JOIN qa q ON q.query_id = l.query_id AND q.centroid_id = a.centroid_id
           JOIN qc ON qc.query_id = l.query_id AND qc.centroid_id = a.centroid_id
           WHERE n.vec_id <> l.query_id
           GROUP BY l.query_id, n.vec_id, qc.qcq),
         surv AS (
           SELECT query_id, vec_id, approx_ip FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY approx_ip DESC, vec_id ASC) AS ar
             FROM approx) WHERE ar <= 12)
         SELECT query_id, vec_id, cos_sim, approx_ip, rank FROM (
           SELECT s.query_id, s.vec_id, s.approx_ip,
             round(list_cosine_similarity(q.e, v.e), 4) AS cos_sim,
             row_number() OVER (PARTITION BY s.query_id
               ORDER BY round(list_cosine_similarity(q.e, v.e), 4) DESC, s.vec_id ASC) AS rank
           FROM surv s
           JOIN ec v ON v.vec_id = s.vec_id
           JOIN ec q ON q.vec_id = s.query_id) t
         WHERE rank <= 3 ORDER BY query_id, rank""",

    // the q_ivf_pq chain swept over nprobe: candidates carry the probe
    // rank of the centroid they arrived through, shallower nprobes are
    // FILTERS over one scored table (q_ivf_recall's contract), and the
    // recall joins the q_embed_topk brute-force truth
    "q_ivf_pq_recall" -> ivfPqRecallSql(),

    // the filtered sweep replayed: enc (codes) and the exact truth both
    // restricted to the allowed sub-corpus, frozen codebooks corpus-wide
    "q_ivf_filtered_recall" -> ivfPqRecallSql(
      storeWhere = " WHERE v.vec_id % 3 = 1",
      exactAnd = " AND c2.vec_id % 3 = 1"),

    // the whole 6-round BPE chain replayed: per-round pair argmax
    // (count DESC, binary string tie-break) and the delimited-string
    // replace whose left-to-right non-overlapping semantics IS greedy
    // merge application — identical in both engines
    "q_bpe" -> {
      val rounds = 6
      val finals = (0 until rounds).map(r =>
        s"""SELECT CAST($r AS INT) AS round, w1 AS left_sym, w2 AS right_sym,
            w1 || w2 AS merged, cnt AS pair_count FROM b$r""")
        .mkString("\n         UNION ALL ")
      s"""WITH ${bpeCtes(rounds)}
         $finals
         ORDER BY round"""
    },

    // the q_bpe chain's FINAL symbol state s6 is the segmented
    // vocabulary; per-doc counts are one word join + aggregate on top
    "q_bpe_tokens" -> {
      val rounds = 6
      s"""WITH ${bpeCtes(rounds)},
         segn AS (
           SELECT word,
             CAST(len(string_split(substring(s, 2, length(s) - 2), '  ')) AS BIGINT) AS n_subwords
           FROM s$rounds),
         words AS (SELECT doc_id, unnest(tk) AS word FROM toks),
         pd AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(n_subwords) AS BIGINT) AS n_subwords
           FROM words JOIN segn USING (word) GROUP BY 1)
         SELECT d.doc_id,
           coalesce(pd.n_words, 0) AS n_words,
           coalesce(pd.n_subwords, 0) AS n_subwords
         FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
         ORDER BY d.doc_id"""
    },

    // two q_lm_score chains (raw inner-join form + target LEFT-join form
    // with unseen-bigram zeros), the ratio weight, and the md5-bucket
    // membership filter — the full importance-resampling replay
    "q_dsir" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), bi AS (
           SELECT doc_id, u.b.w1 AS w1, u.b.w2 AS w2 FROM (
             SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
               THEN list_transform(range(2, len(tk) + 1), i -> {'w1': tk[i-1], 'w2': tk[i]})
               ELSE [] END) AS b
             FROM toks) u
         ), bc AS (
           SELECT w1, w2, count(*) AS bcnt FROM bi GROUP BY 1, 2
         ), uc AS (
           SELECT w1, CAST(sum(bcnt) AS BIGINT) AS ucnt FROM bc GROUP BY 1
         ), scored_r AS (
           SELECT bi.doc_id,
             round(CAST(sum(CAST(round(CAST(bc.bcnt AS DOUBLE) / uc.ucnt, 6) AS DECIMAL(18,6))) AS DOUBLE)
               / count(*), 4) AS lm_score
           FROM bi JOIN bc ON bi.w1 = bc.w1 AND bi.w2 = bc.w2
           JOIN uc ON bi.w1 = uc.w1
           GROUP BY 1
         ), tgt AS (
           SELECT doc_id FROM documents WHERE lang = 'de'
         ), tbc AS (
           SELECT w1, w2, count(*) AS tbcnt FROM bi JOIN tgt USING (doc_id) GROUP BY 1, 2
         ), tuc AS (
           SELECT w1, CAST(sum(tbcnt) AS BIGINT) AS tucnt FROM tbc GROUP BY 1
         ), scored_t AS (
           SELECT bi.doc_id,
             round(CAST(sum(CAST(coalesce(round(CAST(tbc.tbcnt AS DOUBLE) / tuc.tucnt, 6), 0.0) AS DECIMAL(18,6))) AS DOUBLE)
               / count(*), 4) AS lm_score
           FROM bi LEFT JOIN tbc ON bi.w1 = tbc.w1 AND bi.w2 = tbc.w2
           LEFT JOIN tuc ON bi.w1 = tuc.w1
           GROUP BY 1
         ), w AS (
           SELECT d.doc_id,
             coalesce(st.lm_score, 0.0) AS lm_target,
             coalesce(sr.lm_score, 0.0) AS lm_raw
           FROM documents d
           LEFT JOIN scored_t st ON d.doc_id = st.doc_id
           LEFT JOIN scored_r sr ON d.doc_id = sr.doc_id
         ), ww AS (
           SELECT doc_id, lm_target, lm_raw,
             round(CASE WHEN lm_raw > 0 THEN lm_target / lm_raw
               ELSE CAST(0.0 AS DOUBLE) END * CAST(1.0 AS DOUBLE), 6) AS weight
           FROM w)
         SELECT doc_id, lm_target, lm_raw, weight FROM ww
         WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000
               < floor(least(greatest(weight, 0.0), 1.0) * 10000)
         ORDER BY doc_id""",

    // the q_pq_topk ADC chain extended with approx ranks: per-rf top-k
    // filters ONE scored table, recall joins the brute-force truth
    "q_pq_recall" ->
      """WITH ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         ss AS (SELECT unnest(range(0, 4)) AS subspace),
         sv AS (
           SELECT vec_id, subspace, e[subspace*16 + 1 : subspace*16 + 16] AS sub
           FROM ec CROSS JOIN ss),
         cb AS (SELECT subspace, vec_id AS centroid_id, sub AS c_sub
                FROM sv WHERE vec_id < 16),
         enc AS (
           SELECT vec_id, subspace, centroid_id AS code FROM (
             SELECT v.vec_id, v.subspace, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id, v.subspace ORDER BY
                 round(list_sum(list_transform(range(1, 17), i -> v.sub[i] * v.sub[i]))
                   - 2 * list_sum(list_transform(range(1, 17), i -> v.sub[i] * c.c_sub[i]))
                   + list_sum(list_transform(range(1, 17), i -> c.c_sub[i] * c.c_sub[i])), 6) ASC,
                 c.centroid_id ASC) AS rn
             FROM sv v JOIN cb c USING (subspace)) WHERE rn = 1),
         lut AS (
           SELECT q.vec_id AS query_id, q.subspace, c.centroid_id AS code,
             CAST(floor(round(list_sum(list_transform(range(1, 17),
               i -> q.sub[i] * c.c_sub[i])), 6) * 1099511627776 + 0.5) AS BIGINT) AS ipq
           FROM sv q JOIN cb c USING (subspace) WHERE q.vec_id < 5),
         ranked AS (
           SELECT query_id, vec_id, approx_ip,
             row_number() OVER (PARTITION BY query_id
               ORDER BY approx_ip DESC, vec_id ASC) AS ar
           FROM (
             SELECT query_id, vec_id,
               round(CAST(CAST(sum(ipq) AS BIGINT) AS DOUBLE) / 1099511627776, 6) AS approx_ip
             FROM enc JOIN lut USING (subspace, code)
             WHERE vec_id <> query_id
             GROUP BY query_id, vec_id)),
         rf AS (SELECT unnest([1, 2, 4]) AS rerank_factor),
         pq AS (
           SELECT rerank_factor, query_id, vec_id FROM (
             SELECT f.rerank_factor, r.query_id, r.vec_id,
               row_number() OVER (PARTITION BY f.rerank_factor, r.query_id
                 ORDER BY round(list_cosine_similarity(q.e, v.e), 4) DESC, r.vec_id ASC) AS rank
             FROM ranked r
             CROSS JOIN rf f
             JOIN ec v ON v.vec_id = r.vec_id
             JOIN ec q ON q.vec_id = r.query_id
             WHERE r.ar <= f.rerank_factor * 3) WHERE rank <= 3),
         exact AS (
           SELECT query_id, vec_id FROM (
             SELECT q.vec_id AS query_id, c2.vec_id AS vec_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(q.e, c2.e), 4) DESC, c2.vec_id) AS rank
             FROM ec c2 CROSS JOIN (SELECT * FROM ec WHERE vec_id < 5) q
             WHERE c2.vec_id <> q.vec_id) t WHERE rank <= 3),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS exact_pairs FROM exact)
         SELECT CAST(p.rerank_factor AS INT) AS rerank_factor,
           tot.exact_pairs,
           CAST(count(*) AS BIGINT) AS pq_pairs,
           CAST(count(e.query_id) AS BIGINT) AS hit_pairs,
           CAST(count(e.query_id) AS DOUBLE) / CAST(tot.exact_pairs AS DOUBLE) AS recall_at_k
         FROM pq p
         LEFT JOIN exact e ON p.query_id = e.query_id AND p.vec_id = e.vec_id, tot
         GROUP BY p.rerank_factor, tot.exact_pairs
         ORDER BY rerank_factor""",

    // the q_pq_topk ADC chain with cb := the Lloyd's-trained cb2 from
    // pqTrainCtes — training replayed via fixed-point CTE iterations
    "q_pq_trained" ->
      s"""WITH ${pqTrainCtes(2)},
         enc AS (
           SELECT vec_id, subspace, centroid_id AS code FROM (
             SELECT v.vec_id, v.subspace, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id, v.subspace ORDER BY
                 round(list_sum(list_transform(range(1, 17), i -> v.sub[i] * v.sub[i]))
                   - 2 * list_sum(list_transform(range(1, 17), i -> v.sub[i] * c.c_sub[i]))
                   + list_sum(list_transform(range(1, 17), i -> c.c_sub[i] * c.c_sub[i])), 6) ASC,
                 c.centroid_id ASC) AS rn
             FROM sv v JOIN cb2 c USING (subspace)) WHERE rn = 1),
         lut AS (
           SELECT q.vec_id AS query_id, q.subspace, c.centroid_id AS code,
             CAST(floor(round(list_sum(list_transform(range(1, 17),
               i -> q.sub[i] * c.c_sub[i])), 6) * 1099511627776 + 0.5) AS BIGINT) AS ipq
           FROM sv q JOIN cb2 c USING (subspace) WHERE q.vec_id < 5),
         approx AS (
           SELECT query_id, vec_id,
             round(CAST(CAST(sum(ipq) AS BIGINT) AS DOUBLE) / 1099511627776, 6) AS approx_ip
           FROM enc JOIN lut USING (subspace, code)
           WHERE vec_id <> query_id
           GROUP BY query_id, vec_id),
         surv AS (
           SELECT query_id, vec_id, approx_ip FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY approx_ip DESC, vec_id ASC) AS ar
             FROM approx) WHERE ar <= 12)
         SELECT query_id, vec_id, cos_sim, approx_ip, rank FROM (
           SELECT s.query_id, s.vec_id, s.approx_ip,
             round(list_cosine_similarity(q.e, v.e), 4) AS cos_sim,
             row_number() OVER (PARTITION BY s.query_id
               ORDER BY round(list_cosine_similarity(q.e, v.e), 4) DESC, s.vec_id ASC) AS rank
           FROM surv s
           JOIN ec v ON v.vec_id = s.vec_id
           JOIN ec q ON q.vec_id = s.query_id) t
         WHERE rank <= 3 ORDER BY query_id, rank""",

    // MERGE INTO replay: latest row-image per key (unique seq =
    // o_orderkey), deletes drop, anti-join passthrough of untouched keys
    "q_cdc_apply" ->
      """WITH ch AS (
           SELECT o_custkey AS c_custkey,
             'upd-' || CAST(o_orderkey AS VARCHAR) AS c_name,
             CAST(o_orderkey % 25 AS INT) AS c_nationkey,
             o_totalprice AS c_acctbal,
             o_orderpriority AS c_mktsegment,
             CASE WHEN o_orderkey % 10 <= 5 THEN 'U'
                  WHEN o_orderkey % 10 <= 7 THEN 'I'
                  ELSE 'D' END AS op,
             o_orderkey AS seq
           FROM orders),
         latest AS (
           SELECT * FROM (
             SELECT *, row_number() OVER (PARTITION BY c_custkey
               ORDER BY seq DESC, op ASC) AS rn
             FROM ch) WHERE rn = 1)
         SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
         FROM customer
         WHERE c_custkey NOT IN (SELECT c_custkey FROM latest)
         UNION ALL
         SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
         FROM latest WHERE op <> 'D'
         ORDER BY c_custkey""",

    // SCD2 replay: the same changelog, one lead() window per key over
    // ALL ops, deletes dropped after bounding their predecessor
    "q_scd2" ->
      """WITH ch AS (
           SELECT o_custkey AS c_custkey,
             'upd-' || CAST(o_orderkey AS VARCHAR) AS c_name,
             CAST(o_orderkey % 25 AS INT) AS c_nationkey,
             o_totalprice AS c_acctbal,
             o_orderpriority AS c_mktsegment,
             CASE WHEN o_orderkey % 10 <= 5 THEN 'U'
                  WHEN o_orderkey % 10 <= 7 THEN 'I'
                  ELSE 'D' END AS op,
             o_orderkey AS seq
           FROM orders),
         h AS (
           SELECT *, seq AS valid_from,
             lead(seq) OVER (PARTITION BY c_custkey ORDER BY seq ASC, op ASC) AS valid_to
           FROM ch)
         SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           op, seq, valid_from, valid_to,
           (valid_to IS NULL AND op <> 'D') AS is_current
         FROM h WHERE op <> 'D'
         ORDER BY c_custkey, valid_from""",

    // capture replay: the merged snapshot re-derived, then the same
    // null-safe full-outer diff back to I/U/D row images
    "q_cdc_diff" ->
      """WITH ch AS (
           SELECT o_custkey AS c_custkey,
             'upd-' || CAST(o_orderkey AS VARCHAR) AS c_name,
             CAST(o_orderkey % 25 AS INT) AS c_nationkey,
             o_totalprice AS c_acctbal,
             o_orderpriority AS c_mktsegment,
             CASE WHEN o_orderkey % 10 <= 5 THEN 'U'
                  WHEN o_orderkey % 10 <= 7 THEN 'I'
                  ELSE 'D' END AS op,
             o_orderkey AS seq
           FROM orders),
         latest AS (
           SELECT * FROM (
             SELECT *, row_number() OVER (PARTITION BY c_custkey
               ORDER BY seq DESC, op ASC) AS rn
             FROM ch) WHERE rn = 1),
         merged AS (
           SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
           FROM customer
           WHERE c_custkey NOT IN (SELECT c_custkey FROM latest)
           UNION ALL
           SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
           FROM latest WHERE op <> 'D'),
         d AS (
           SELECT o.c_custkey AS ok, n.c_custkey AS nk,
             o.c_name AS on_, n.c_name AS nn,
             o.c_nationkey AS onk, n.c_nationkey AS nnk,
             o.c_acctbal AS ob, n.c_acctbal AS nb,
             o.c_mktsegment AS os, n.c_mktsegment AS ns,
             CASE WHEN o.c_custkey IS NULL THEN 'I'
                  WHEN n.c_custkey IS NULL THEN 'D'
                  WHEN NOT (o.c_name IS NOT DISTINCT FROM n.c_name
                        AND o.c_nationkey IS NOT DISTINCT FROM n.c_nationkey
                        AND o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal
                        AND o.c_mktsegment IS NOT DISTINCT FROM n.c_mktsegment)
                    THEN 'U' END AS op
           FROM customer o FULL OUTER JOIN merged n ON o.c_custkey = n.c_custkey)
         SELECT CASE WHEN op = 'D' THEN ok ELSE nk END AS c_custkey,
           CASE WHEN op = 'D' THEN on_ ELSE nn END AS c_name,
           CASE WHEN op = 'D' THEN onk ELSE nnk END AS c_nationkey,
           CASE WHEN op = 'D' THEN ob ELSE nb END AS c_acctbal,
           CASE WHEN op = 'D' THEN os ELSE ns END AS c_mktsegment,
           op
         FROM d WHERE op IS NOT NULL
         ORDER BY c_custkey""",

    // incremental-maintenance identity: the oracle aggregates the MERGED
    // snapshot from scratch — a hash match proves base+delta == rescan
    "q_incr_agg" ->
      """WITH ch AS (
           SELECT o_custkey AS c_custkey,
             'upd-' || CAST(o_orderkey AS VARCHAR) AS c_name,
             CAST(o_orderkey % 25 AS INT) AS c_nationkey,
             o_totalprice AS c_acctbal,
             o_orderpriority AS c_mktsegment,
             CASE WHEN o_orderkey % 10 <= 5 THEN 'U'
                  WHEN o_orderkey % 10 <= 7 THEN 'I'
                  ELSE 'D' END AS op,
             o_orderkey AS seq
           FROM orders),
         latest AS (
           SELECT * FROM (
             SELECT *, row_number() OVER (PARTITION BY c_custkey
               ORDER BY seq DESC, op ASC) AS rn
             FROM ch) WHERE rn = 1),
         merged AS (
           SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
           WHERE c_custkey NOT IN (SELECT c_custkey FROM latest)
           UNION ALL
           SELECT c_custkey, c_mktsegment, c_acctbal FROM latest WHERE op <> 'D')
         SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS value_sum
         FROM merged GROUP BY 1 ORDER BY 1""",

    // blocked linkage replay: within-nation pairs, the same three
    // agreement rules, the same left-folded double score
    "q_linkage" ->
      """SELECT id_a, id_b, same_segment, close_balance, name_suffix, score,
           CASE WHEN score >= 4.5 THEN 'match' ELSE 'possible' END AS tier
         FROM (
           SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             a.c_mktsegment = b.c_mktsegment AS same_segment,
             abs(a.c_acctbal - b.c_acctbal) < 50.0 AS close_balance,
             right(a.c_name, 2) = right(b.c_name, 2) AS name_suffix,
             CASE WHEN a.c_mktsegment = b.c_mktsegment
               THEN CAST(2.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
             + CASE WHEN abs(a.c_acctbal - b.c_acctbal) < 50.0
               THEN CAST(2.5 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
             + CASE WHEN right(a.c_name, 2) = right(b.c_name, 2)
               THEN CAST(1.5 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS score
           FROM customer a JOIN customer b
             ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey) t
         WHERE score >= 3.5
         ORDER BY id_a, id_b""",

    // the engine's native Jaro-Winkler against the oracle's own
    // implementation — same boost threshold (0.7), prefix cap (4) and
    // empty-string convention; 4dp rounding before the cut on BOTH sides
    "q_fuzzy_pairs" ->
      """WITH p AS (SELECT p_partkey, p_brand, p_name FROM part),
         ok AS (
           SELECT p_brand FROM (SELECT p_brand, count(*) AS n FROM p GROUP BY 1)
           WHERE n <= 4096
         ), s AS (SELECT p.* FROM p JOIN ok USING (p_brand))
         SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           round(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS jw
         FROM s a JOIN s b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
         WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 4) >= 0.9
         ORDER BY id_a, id_b""",

    // sorted-neighborhood replay: the global rank is one row_number over
    // the SAME total order (p_name, p_partkey) the distributed two-level
    // rank computes; neighbor pairs are rank deltas in [1, w-1]
    "q_snm_pairs" ->
      """WITH r AS (
           SELECT p_partkey AS id, p_name AS name,
                  row_number() OVER (ORDER BY p_name, p_partkey) AS rn
           FROM part
         )
         SELECT a.id AS id_a, b.id AS id_b,
           round(jaro_winkler_similarity(a.name, b.name), 4) AS jw
         FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 7
         WHERE round(jaro_winkler_similarity(a.name, b.name), 4) >= 0.9
         ORDER BY id_a, id_b""",

    // HyperANF replay: per-node single-item registers (the q_hll_store
    // md5Token60 arithmetic at p=8 — idx = h>>52, rho = 53−bitlen), three
    // unrolled max-merge hops along the symmetrized span-pair edges,
    // per-hop harmonic finalize — registers are exact integers, so the
    // whole propagation is bit-replayable; est is one IEEE division
    "q_hyperanf" -> {
      val c = graft.operators.Sketches.hllConstant(8)
      val rounds = (0 until 3).map { i =>
        s"""r${i + 1} AS (
           SELECT node, idx, max(mrho) AS mrho FROM (
             SELECT node, idx, mrho FROM r$i
             UNION ALL
             SELECT e.src AS node, r.idx, r.mrho
             FROM e JOIN r$i r ON e.dst = r.node
           ) GROUP BY node, idx)"""
      }.mkString(",\n         ")
      val finals = (1 to 3).map { i =>
        s"""SELECT CAST($i AS INT) AS h, node,
           CAST(count(*) AS BIGINT) AS n_registers_used,
           CAST(sum(CAST(1 AS BIGINT) << CAST(53 - mrho AS INT)) AS BIGINT)
             + (256 - CAST(count(*) AS BIGINT)) * (CAST(1 AS BIGINT) << 53)
             AS s_fixed
           FROM r$i GROUP BY node"""
      }.mkString(" UNION ALL ")
      s"""WITH $spanPairCte, e AS (
           SELECT src, dst FROM p UNION SELECT dst AS src, src AS dst FROM p
         ), nodes AS (SELECT DISTINCT src AS node FROM e),
         r0 AS (
           SELECT node, h >> 52 AS idx,
             CASE WHEN (h & ((CAST(1 AS BIGINT) << 52) - 1)) = 0 THEN 53
               ELSE 53 - length(ltrim(bin(h & ((CAST(1 AS BIGINT) << 52) - 1)), '0'))
             END AS mrho
           FROM (SELECT node,
               CAST(concat('0x', substr(md5(CAST(node AS VARCHAR)), 1, 15)) AS BIGINT) AS h
             FROM nodes)
         ),
         $rounds,
         f AS ($finals)
         SELECT h, node, n_registers_used, s_fixed,
           $c / CAST(s_fixed AS DOUBLE) AS est_reach
         FROM f ORDER BY h, node"""
    },

    // PageRank replay: the q_dupspans span substrate → distinct pair
    // edges both directions → three iterations with 2^40 fixed-point
    // contribution sums (exact integer addition in any order) and the
    // pinned (1.0-0.85)/n + 0.85*(S/Q + dang/n/Q) rank expression
    "q_pagerank" -> {
      val iters = 3
      val Q = 1L << 40
      val iterCtes = (0 until iters).map { i =>
        s"""d$i AS (
           SELECT CAST(coalesce(sum(CAST(floor(rank * $Q + 0.5) AS BIGINT)), 0) AS BIGINT) AS dang
           FROM r$i WHERE node NOT IN (SELECT src FROM od)),
         c$i AS (
           SELECT e.dst, CAST(sum(CAST(floor(r.rank / od.deg * $Q + 0.5) AS BIGINT)) AS BIGINT) AS s
           FROM e JOIN r$i r ON e.src = r.node JOIN od ON e.src = od.src
           GROUP BY e.dst),
         r${i + 1} AS (
           SELECT n.node,
             (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
             + CAST(0.85 AS DOUBLE) * (CAST(coalesce(c.s, 0) AS DOUBLE) / $Q
               + CAST(d.dang AS DOUBLE) / nn.n / $Q) AS rank
           FROM nodes n LEFT JOIN c$i c ON n.node = c.dst, d$i d, nn)"""
      }.mkString(",\n         ")
      s"""WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS tk
           FROM documents
         ), c AS (
           SELECT doc_id, tk,
             unnest(range(0, CAST(ceil(greatest(len(tk) - 32, 0) / 16.0) AS INT) + 1)) AS cid
           FROM toks
         ), sp0 AS (
           SELECT doc_id, md5(array_to_string(tk[cid*16 + 1 : cid*16 + 32], ' ')) AS span_md5
           FROM c WHERE len(tk[cid*16 + 1 : cid*16 + 32]) = 32
         ), sp AS (
           SELECT DISTINCT doc_id, span_md5 FROM sp0
         ), linking AS (
           SELECT span_md5 FROM (
             SELECT span_md5, count(*) AS nd FROM sp GROUP BY span_md5)
           WHERE nd > 1 AND nd <= 64
         ), spl AS (
           SELECT sp.doc_id, sp.span_md5 FROM sp JOIN linking USING (span_md5)
         ), p AS (
           SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
           FROM spl a JOIN spl b ON a.span_md5 = b.span_md5 AND a.doc_id < b.doc_id
         ), e AS (
           SELECT src, dst FROM p UNION ALL SELECT dst AS src, src AS dst FROM p
         ), nodes AS (
           SELECT DISTINCT node FROM (
             SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)
         ), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         od AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
         r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM nodes, nn),
         $iterCtes
         SELECT node, rank FROM r$iters ORDER BY node"""
    },

    // personalized PageRank replayed over the span pair graph: teleport
    // share 1/|even nodes| on seeds (0 elsewhere) carried through the
    // base term AND the dangling redistribution, same 2^40 fixed-point
    // contribution sums and pinned IEEE rank expression as q_pagerank
    "q_ppr" -> {
      val iters = 3
      val Q = 1L << 40
      val iterCtes = (0 until iters).map { i =>
        s"""d$i AS (
           SELECT CAST(coalesce(sum(CAST(floor(rank * $Q + 0.5) AS BIGINT)), 0) AS BIGINT) AS dang
           FROM r$i WHERE node NOT IN (SELECT src FROM od)),
         c$i AS (
           SELECT e.dst, CAST(sum(CAST(floor(r.rank / od.deg * $Q + 0.5) AS BIGINT)) AS BIGINT) AS s
           FROM e JOIN r$i r ON e.src = r.node JOIN od ON e.src = od.src
           GROUP BY e.dst),
         r${i + 1} AS (
           SELECT n.node, n.share,
             (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * n.share
             + CAST(0.85 AS DOUBLE) * (CAST(coalesce(c.s, 0) AS DOUBLE) / $Q
               + CAST(d.dang AS DOUBLE) / $Q * n.share) AS rank
           FROM nodes n LEFT JOIN c$i c ON n.node = c.dst, d$i d)"""
      }.mkString(",\n         ")
      s"""WITH $spanPairCte,
         e AS (
           SELECT src, dst FROM p UNION ALL SELECT dst AS src, src AS dst FROM p
         ), nodes0 AS (
           SELECT DISTINCT node FROM (
             SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)
         ), sn AS (
           SELECT CAST(count(*) AS BIGINT) AS ns FROM nodes0 WHERE node % 2 = 0
         ), nodes AS (
           SELECT node, CASE WHEN node % 2 = 0 THEN CAST(1.0 AS DOUBLE) / sn.ns
                        ELSE CAST(0.0 AS DOUBLE) END AS share
           FROM nodes0, sn
         ), od AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
         r0 AS (SELECT node, share, share AS rank FROM nodes),
         $iterCtes
         SELECT node, rank FROM r$iters ORDER BY node"""
    },

    // triangles replayed by the literal ascending 3-join over the span
    // pair graph (src < dst makes x < y < z automatic) — the engine's
    // (deg, id) orientation enumerates the SAME triangle set, counted
    // once either way; zero-participant nodes kept via the left join
    "q_triangles" ->
      s"""WITH $spanPairCte,
         nodes AS (
           SELECT DISTINCT node FROM (
             SELECT src AS node FROM p UNION ALL SELECT dst AS node FROM p)
         ), cnt AS (
           SELECT node, count(*) AS c FROM (
             SELECT x AS node FROM tri
             UNION ALL SELECT y AS node FROM tri
             UNION ALL SELECT z AS node FROM tri)
           GROUP BY node
         )
         SELECT n.node, CAST(coalesce(c.c, 0) AS BIGINT) AS triangles
         FROM nodes n LEFT JOIN cnt c USING (node) ORDER BY node""",

    // the maintenance law replayed as set algebra: per-node union-graph
    // triangle counts MINUS old-subgraph counts (the engine enumerates
    // through the batch's edges instead — identical by the law)
    "q_triangle_delta" ->
      s"""WITH $spanPairCte,
         po AS (SELECT src, dst FROM p WHERE (src + dst) % 3 <> 0),
         trio AS (
           SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
           FROM po e1
           JOIN po e2 ON e2.src = e1.dst
           JOIN po e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         cu AS (
           SELECT node, count(*) AS c FROM (
             SELECT x AS node FROM tri UNION ALL SELECT y AS node FROM tri
             UNION ALL SELECT z AS node FROM tri) GROUP BY node),
         co AS (
           SELECT node, count(*) AS c FROM (
             SELECT x AS node FROM trio UNION ALL SELECT y AS node FROM trio
             UNION ALL SELECT z AS node FROM trio) GROUP BY node)
         SELECT cu.node AS node, CAST(cu.c - coalesce(co.c, 0) AS BIGINT) AS new_triangles
         FROM cu LEFT JOIN co ON cu.node = co.node
         WHERE cu.c - coalesce(co.c, 0) > 0
         ORDER BY cu.node""",

    // the 2-core peel unrolled 12 rounds (measured depth ≤ 3 at the
    // oracle scales; converged rounds are no-ops) — monotone set
    // operation, unique fixpoint, no floats anywhere
    "q_kcore" ->
      s"""WITH $spanPairCte,
         ${kcoreCtes(2, 12)}
         SELECT node, CAST(deg AS BIGINT) AS deg FROM d12
         WHERE deg >= 2 ORDER BY node""",

    // synchronous LPA replay: 3 unrolled rounds, each one neighbor-label
    // count + (count desc, label asc) argmax — all-integer, no floats
    "q_lpa" -> {
      val iters = 3
      val roundCtes = (0 until iters).map { i =>
        s"""cn$i AS (
           SELECT adj.v AS node, r$i.label, count(*) AS c
           FROM adj JOIN r$i ON adj.u = r$i.node GROUP BY 1, 2
         ), r${i + 1} AS (
           SELECT n.node, coalesce(w.label, n.label) AS label
           FROM r$i n LEFT JOIN (
             SELECT node, label FROM (
               SELECT node, label, row_number() OVER (PARTITION BY node
                 ORDER BY c DESC, label) AS rn FROM cn$i) WHERE rn = 1) w
           ON w.node = n.node)"""
      }.mkString(",\n         ")
      s"""WITH $spanPairCte,
         adj AS (
           SELECT src AS u, dst AS v FROM p
           UNION ALL SELECT dst AS u, src AS v FROM p
         ), r0 AS (SELECT DISTINCT u AS node, u AS label FROM adj),
         $roundCtes
         SELECT node, label FROM r$iters ORDER BY node"""
    },

    // weighted Bellman-Ford unroll: d_{i+1} = min(d_i, relax(d_i)) over
    // the WEIGHTED span pairs (the q_pagerank_w edge recipe); integer
    // costs make every round exact, and a fixed unroll >= the engine's
    // early exit replays the frontier loop verbatim
    "q_sssp" -> {
      val rounds = 4
      val iterCtes = (0 until rounds).map { i =>
        s"""c$i AS (
           SELECT adj.v AS node, min(d$i.cost + adj.w) AS cost
           FROM adj JOIN d$i ON adj.u = d$i.node GROUP BY 1
         ), d${i + 1} AS (
           SELECT node, CAST(min(cost) AS BIGINT) AS cost FROM (
             SELECT node, cost FROM d$i UNION ALL SELECT node, cost FROM c$i)
           GROUP BY node)"""
      }.mkString(",\n         ")
      s"""WITH $spanPairWeightedCte, adj AS (
           SELECT src AS u, dst AS v, w FROM p
           UNION ALL SELECT dst AS u, src AS v, w FROM p
         ), d0 AS (
           SELECT DISTINCT d.doc_id AS node, CAST(0 AS BIGINT) AS cost
           FROM documents d
           JOIN (SELECT DISTINCT u FROM adj) g ON g.u = d.doc_id
           WHERE d.doc_id % 10 = 0
         ),
         $iterCtes
         SELECT node, cost FROM d$rounds ORDER BY node"""
    },

    // BFS replay: 4 unrolled frontier-relaxation rounds — an empty
    // frontier makes later rounds no-ops, exactly the engine's early
    // exit, so the fixed unroll replays the loop
    "q_bfs" -> {
      val depth = 4
      val rounds = (0 until depth).map { i =>
        s"""n$i AS (
           SELECT adj.v AS node, min(f$i.dist) + 1 AS dist
           FROM adj JOIN f$i ON adj.u = f$i.node GROUP BY 1
         ), x$i AS (
           SELECT n$i.node, n$i.dist FROM n$i LEFT JOIN s$i ON s$i.node = n$i.node
           WHERE s$i.node IS NULL
         ), s${i + 1} AS (SELECT * FROM s$i UNION ALL SELECT * FROM x$i),
         f${i + 1} AS (SELECT * FROM x$i)"""
      }.mkString(",\n         ")
      s"""WITH $spanPairCte,
         adj AS (
           SELECT src AS u, dst AS v FROM p
           UNION ALL SELECT dst AS u, src AS v FROM p
         ), s0 AS (
           SELECT DISTINCT d.doc_id AS node, 0 AS dist FROM documents d
           JOIN (SELECT DISTINCT u FROM adj) g ON g.u = d.doc_id
           WHERE d.doc_id % 10 = 0
         ), f0 AS (SELECT * FROM s0),
         $rounds
         SELECT node, dist FROM s$depth ORDER BY node"""
    },

    // closure summary over the same graph: integer counts (// is DuckDB
    // integer division — exact like Spark's DIV) and the one pinned
    // (3.0 · T) / wedges IEEE division
    "q_triangle_stats" ->
      s"""WITH $spanPairCte,
         deg AS (
           SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
             SELECT src AS node FROM p UNION ALL SELECT dst AS node FROM p)
           GROUP BY node
         ), s AS (
           SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
             (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_edges,
             (SELECT CAST(coalesce(sum(deg * (deg - 1) // 2), 0) AS BIGINT) FROM deg) AS n_wedges,
             (SELECT CAST(count(*) AS BIGINT) FROM tri) AS n_triangles
         )
         SELECT n_nodes, n_edges, n_wedges, n_triangles,
           CASE WHEN n_wedges = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE CAST(3.0 AS DOUBLE) * n_triangles / n_wedges END AS global_clustering
         FROM s""",

    // rolling hash (base 257 mod 2^64) replayed byte-for-byte in DuckDB via
    // HUGEINT list_reduce; valid because the corpus is ASCII (ord == byte) —
    // the two's-complement fold at the end maps back to Spark's signed long
    "q_fingerprint" ->
      """SELECT doc_id,
         CAST(CASE WHEN h >= 9223372036854775808 THEN h - 18446744073709551616 ELSE h END AS BIGINT) AS fingerprint,
         CAST(CASE WHEN hn >= 9223372036854775808 THEN hn - 18446744073709551616 ELSE hn END AS BIGINT) AS fingerprint_normalized
         FROM (
           SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS HUGEINT),
               list_transform(range(1, length(text) + 1), i -> CAST(ord(text[i]) AS HUGEINT))),
               (acc, b) -> (acc * 257 + b) % 18446744073709551616) AS h,
             list_reduce(list_prepend(CAST(0 AS HUGEINT),
               list_transform(range(1, length(nt) + 1), i -> CAST(ord(nt[i]) AS HUGEINT))),
               (acc, b) -> (acc * 257 + b) % 18446744073709551616) AS hn
           FROM (SELECT doc_id, text, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
                 FROM documents)) t
         ORDER BY doc_id"""
  )
}
