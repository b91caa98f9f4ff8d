package graft
package queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, CacheRegistry, Cdc, Dedup, Eval, Events, Graph, HllStore, Index, Linkage, Multimodal, Pq, Quantiles, Sampling, Similarity, SketchStore, Sketches, TextAnalysis, Tfidf}
import OracleCtes._
import QueryShared._

/** Oracle-SQL registry, part 2 of 4 (original SparkEntry order;
  * SparkEntry.oracleSql concatenates the parts, duplicate keys fail).
  */
private[graft] object OraclesPart2 {
  val m: Map[String, String] = Map(


    "q_langid" -> {
      // keep marker lists in lockstep with TextAnalysis.langMarkers
      def occ(w: String) =
        s"CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' $w ', ''))) / ${w.length + 2} AS BIGINT)"
      val scoreDefs = TextAnalysis.langMarkers.map { case (l, ws) =>
        ws.map(occ).mkString(" + ") + s" AS score_$l"
      }.mkString(",\n           ")
      s"""SELECT doc_id, lang_label, score_en, score_de, score_fr, score_es,
         CASE WHEN score_en > 0 AND score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
              WHEN score_de > 0 AND score_de >= score_fr AND score_de >= score_es THEN 'de'
              WHEN score_fr > 0 AND score_fr >= score_es THEN 'fr'
              WHEN score_es > 0 THEN 'es'
              ELSE 'und' END AS lang_pred
         FROM (SELECT doc_id, lang AS lang_label,
           $scoreDefs
           FROM documents) t
         ORDER BY doc_id"""
    },

    "q_embed_neardup" ->
      """SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
         FROM embeddings a JOIN embeddings b
           ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) >= 0.4
         ORDER BY vec_id_a, vec_id_b""",

    "q_embed_topk" ->
      """SELECT query_id, vec_id, cos_sim, rank FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 4) AS cos_sim,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 4) DESC, c.vec_id) AS rank
           FROM embeddings c
           CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
           WHERE c.vec_id <> q.vec_id) t
         WHERE rank <= 3 ORDER BY query_id, rank""",

    // q_embed_topk's proven rounded-cosine ranking with the label
    // inequality replacing the self-exclusion (same label ⊃ self)
    "q_hard_negatives" ->
      """SELECT query_id, vec_id, cos_sim, rank FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 4) AS cos_sim,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 4) DESC, c.vec_id) AS rank
           FROM embeddings c
           CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
           WHERE c.label <> q.label) t
         WHERE rank <= 5 ORDER BY query_id, rank""",

    // both rank lists replayed with their own proven conventions (decimal
    // tfidf dot, rounded dense cosine), then the RRF sum as the identical
    // fixed-order double expression; rank 0 = absent from that list
    "q_rrf_hybrid" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), tfc AS (
           SELECT doc_id, term, count(*) AS tf
           FROM (SELECT doc_id, unnest(tk) AS term FROM toks) GROUP BY 1, 2
         ), dft AS (
           SELECT term, count(*) AS df FROM tfc GROUP BY 1
         ), n AS (SELECT count(*) AS n FROM documents),
         v AS (
           SELECT tfc.doc_id, tfc.term,
             CAST(round(tfc.tf * (n.n + 1.0) / (dft.df + 1.0), 4) AS DECIMAL(18,4)) AS w
           FROM tfc JOIN dft ON tfc.term = dft.term CROSS JOIN n
         ), norms AS (
           SELECT doc_id, sqrt(CAST(sum(w * w) AS DOUBLE)) AS norm FROM v GROUP BY 1
         ), qd AS (
           SELECT doc_id AS query_id, term, w AS qw FROM v WHERE doc_id < 3
         ), dots AS (
           SELECT q.query_id, v.doc_id, CAST(sum(q.qw * v.w) AS DOUBLE) AS dot
           FROM v JOIN qd q ON v.term = q.term AND v.doc_id <> q.query_id
           GROUP BY 1, 2
         ), sparse AS (
           SELECT query_id, doc_id AS item_id, rk AS rank_sparse FROM (
             SELECT d.query_id, d.doc_id,
               row_number() OVER (PARTITION BY d.query_id
                 ORDER BY round(d.dot / (nq.norm * nd.norm), 4) DESC, d.doc_id) AS rk
             FROM dots d
             JOIN norms nq ON nq.doc_id = d.query_id
             JOIN norms nd ON nd.doc_id = d.doc_id) t
           WHERE rk <= 20
         ), ec AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
         ), dense AS (
           SELECT query_id, vec_id AS item_id, rk AS rank_dense FROM (
             SELECT q.vec_id AS query_id, c.vec_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(q.e, c.e), 4) DESC, c.vec_id) AS rk
             FROM ec c CROSS JOIN (SELECT * FROM ec WHERE vec_id < 3) q
             WHERE c.vec_id <> q.vec_id) t
           WHERE rk <= 20
         ), fused AS (
           SELECT coalesce(s.query_id, d.query_id) AS query_id,
             coalesce(s.item_id, d.item_id) AS item_id,
             coalesce(s.rank_sparse, 0) AS rank_sparse,
             coalesce(d.rank_dense, 0) AS rank_dense,
             coalesce(CAST(1.0 AS DOUBLE) / (60 + s.rank_sparse), 0.0) +
               coalesce(CAST(1.0 AS DOUBLE) / (60 + d.rank_dense), 0.0) AS rrf
           FROM sparse s FULL OUTER JOIN dense d
             ON s.query_id = d.query_id AND s.item_id = d.item_id
         )
         SELECT query_id, item_id, rank_sparse, rank_dense,
           round(rrf, 6) AS rrf_score, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY rrf DESC, item_id) AS rank FROM fused) t
         WHERE rank <= 10 ORDER BY query_id, rank""",

    // the q_bm25 chain as the 20-deep lexical list, the q_rrf_hybrid
    // dense chain, the identical fixed-order RRF fold
    "q_rrf_bm25" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), pos AS (
           SELECT doc_id, unnest(tk) AS term FROM toks
         ), tfc AS (
           SELECT doc_id, term, count(*) AS tf FROM pos GROUP BY 1, 2
         ), dl AS (
           SELECT doc_id, count(*) AS dl FROM pos GROUP BY 1
         ), st AS (
           SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
           FROM dl
         ), dfx AS (
           SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tfc GROUP BY 1
         ), q AS (
           SELECT DISTINCT doc_id AS query_id, term FROM tfc WHERE doc_id < 3
         ), contrib AS (
           SELECT q.query_id, t.doc_id,
             CAST(round(
               ((((SELECT n FROM st) - dfx.df) + 0.5) / (dfx.df + 0.5)) *
               ((CAST(t.tf AS DOUBLE) * 2.25) /
                (CAST(t.tf AS DOUBLE) + (0.3125 + 0.9375 *
                  (CAST(dl.dl AS DOUBLE) / (SELECT avgdl FROM st)))))
             , 6) AS DECIMAL(18,6)) AS c
           FROM tfc t
           JOIN q ON t.term = q.term
           JOIN dfx ON t.term = dfx.term
           JOIN dl ON t.doc_id = dl.doc_id
           WHERE t.doc_id <> q.query_id
         ), bscored AS (
           SELECT query_id, doc_id,
             round(CAST(sum(c) AS DOUBLE), 4) AS bm25
           FROM contrib GROUP BY 1, 2
         ), sparse AS (
           SELECT query_id, doc_id AS item_id, rk AS rank_sparse FROM (
             SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY bm25 DESC, doc_id) AS rk
             FROM bscored) t
           WHERE rk <= 20
         ), ec AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
         ), dense AS (
           SELECT query_id, vec_id AS item_id, rk AS rank_dense FROM (
             SELECT q.vec_id AS query_id, c.vec_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(q.e, c.e), 4) DESC, c.vec_id) AS rk
             FROM ec c CROSS JOIN (SELECT * FROM ec WHERE vec_id < 3) q
             WHERE c.vec_id <> q.vec_id) t
           WHERE rk <= 20
         ), fused AS (
           SELECT coalesce(s.query_id, d.query_id) AS query_id,
             coalesce(s.item_id, d.item_id) AS item_id,
             coalesce(s.rank_sparse, 0) AS rank_sparse,
             coalesce(d.rank_dense, 0) AS rank_dense,
             coalesce(CAST(1.0 AS DOUBLE) / (60 + s.rank_sparse), 0.0) +
               coalesce(CAST(1.0 AS DOUBLE) / (60 + d.rank_dense), 0.0) AS rrf
           FROM sparse s FULL OUTER JOIN dense d
             ON s.query_id = d.query_id AND s.item_id = d.item_id
         )
         SELECT query_id, item_id, rank_sparse, rank_dense,
           round(rrf, 6) AS rrf_score, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY rrf DESC, item_id) AS rank FROM fused) t
         WHERE rank <= 10 ORDER BY query_id, rank""",

    // the q_bm25_prf two-pass chain (queries doc_id < 3, 20 deep) as
    // the lexical leg, the q_rrf_hybrid dense chain, the identical
    // fixed-order RRF fold
    "q_rrf_prf" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), pos AS (
           SELECT doc_id, unnest(tk) AS term FROM toks
         ), tfc AS (
           SELECT doc_id, term, count(*) AS tf FROM pos GROUP BY 1, 2
         ), dl AS (
           SELECT doc_id, count(*) AS dl FROM pos GROUP BY 1
         ), st AS (
           SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
           FROM dl
         ), dfx AS (
           SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tfc GROUP BY 1
         ), q AS (
           SELECT DISTINCT doc_id AS query_id, term FROM tfc WHERE doc_id < 3
         ), contrib1 AS (
           SELECT q.query_id, t.doc_id,
             CAST(round(
               ((((SELECT n FROM st) - dfx.df) + 0.5) / (dfx.df + 0.5)) *
               ((CAST(t.tf AS DOUBLE) * 2.25) /
                (CAST(t.tf AS DOUBLE) + (0.3125 + 0.9375 *
                  (CAST(dl.dl AS DOUBLE) / (SELECT avgdl FROM st)))))
             , 6) AS DECIMAL(18,6)) AS c
           FROM tfc t
           JOIN q ON t.term = q.term
           JOIN dfx ON t.term = dfx.term
           JOIN dl ON t.doc_id = dl.doc_id
           WHERE t.doc_id <> q.query_id
         ), scored1 AS (
           SELECT query_id, doc_id,
             round(CAST(sum(c) AS DOUBLE), 4) AS bm25
           FROM contrib1 GROUP BY 1, 2
         ), fb AS (
           SELECT query_id, doc_id FROM (
             SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
               ORDER BY bm25 DESC, doc_id) AS rk
             FROM scored1) WHERE rk <= 5
         ), rm AS (
           SELECT fb.query_id, t.term,
             sum(CAST(round(CAST(t.tf AS DOUBLE) / CAST(dl.dl AS DOUBLE), 6)
               AS DECIMAL(18,6))) AS w
           FROM fb
           JOIN tfc t ON t.doc_id = fb.doc_id
           JOIN dl ON dl.doc_id = fb.doc_id
           GROUP BY 1, 2
         ), rmx AS (
           SELECT rm.query_id, rm.term, rm.w FROM rm
           WHERE NOT EXISTS (SELECT 1 FROM q
             WHERE q.query_id = rm.query_id AND q.term = rm.term)
         ), expn AS (
           SELECT query_id, term FROM (
             SELECT query_id, term, row_number() OVER (PARTITION BY query_id
               ORDER BY w DESC, term) AS rk
             FROM rmx) WHERE rk <= 10
         ), q2 AS (
           SELECT query_id, term, CAST(1.0 AS DOUBLE) AS w FROM q
           UNION ALL
           SELECT query_id, term, CAST(0.5 AS DOUBLE) AS w FROM expn
         ), contrib2 AS (
           SELECT q2.query_id, t.doc_id,
             CAST(round(
               ((((SELECT n FROM st) - dfx.df) + 0.5) / (dfx.df + 0.5)) *
               ((CAST(t.tf AS DOUBLE) * 2.25) /
                (CAST(t.tf AS DOUBLE) + (0.3125 + 0.9375 *
                  (CAST(dl.dl AS DOUBLE) / (SELECT avgdl FROM st)))))
               * q2.w
             , 6) AS DECIMAL(18,6)) AS c
           FROM tfc t
           JOIN q2 ON t.term = q2.term
           JOIN dfx ON t.term = dfx.term
           JOIN dl ON t.doc_id = dl.doc_id
           WHERE t.doc_id <> q2.query_id
         ), scored2 AS (
           SELECT query_id, doc_id,
             round(CAST(sum(c) AS DOUBLE), 4) AS bm25
           FROM contrib2 GROUP BY 1, 2
         ), sparse AS (
           SELECT query_id, doc_id AS item_id, rk AS rank_sparse FROM (
             SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY bm25 DESC, doc_id) AS rk
             FROM scored2) t
           WHERE rk <= 20
         ), ec AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
         ), dense AS (
           SELECT query_id, vec_id AS item_id, rk AS rank_dense FROM (
             SELECT q.vec_id AS query_id, c.vec_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(q.e, c.e), 4) DESC, c.vec_id) AS rk
             FROM ec c CROSS JOIN (SELECT * FROM ec WHERE vec_id < 3) q
             WHERE c.vec_id <> q.vec_id) t
           WHERE rk <= 20
         ), fused AS (
           SELECT coalesce(s.query_id, d.query_id) AS query_id,
             coalesce(s.item_id, d.item_id) AS item_id,
             coalesce(s.rank_sparse, 0) AS rank_sparse,
             coalesce(d.rank_dense, 0) AS rank_dense,
             coalesce(CAST(1.0 AS DOUBLE) / (60 + s.rank_sparse), 0.0) +
               coalesce(CAST(1.0 AS DOUBLE) / (60 + d.rank_dense), 0.0) AS rrf
           FROM sparse s FULL OUTER JOIN dense d
             ON s.query_id = d.query_id AND s.item_id = d.item_id
         )
         SELECT query_id, item_id, rank_sparse, rank_dense,
           round(rrf, 6) AS rrf_score, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY rrf DESC, item_id) AS rank FROM fused) t
         WHERE rank <= 10 ORDER BY query_id, rank""",

    // the greedy loop unrolled as chained CTEs (the kmeans convention):
    // rel/pair sims once, then per step an argmax over
    // λ·rel − (1−λ)·max-sim-to-selected with the Scala-interpolated
    // (1−λ) double so both engines subtract the identical constant
    "q_mmr" -> {
      val lambda = 0.7; val k = 3
      val lam = lambda.toString
      val oneMinus = (1.0 - lambda).toString
      val steps = (2 to k).map { i =>
        val prev = if (i == 2) "s1" else s"sel${i - 1}"
        s""", p$i AS (
           SELECT r.query_id, r.vec_id,
             round(CAST($lam AS DOUBLE) * r.rel - CAST($oneMinus AS DOUBLE) * p.pen, 6) AS mmr_score
           FROM rel r
           JOIN (SELECT ps.query_id, ps.va AS vec_id, max(ps.sim) AS pen
                 FROM ps JOIN $prev s ON s.query_id = ps.query_id AND s.vec_id = ps.vb
                 GROUP BY 1, 2) p
             ON p.query_id = r.query_id AND p.vec_id = r.vec_id
           WHERE NOT EXISTS (SELECT 1 FROM $prev s2
                             WHERE s2.query_id = r.query_id AND s2.vec_id = r.vec_id)
         ), s$i AS (
           SELECT query_id, vec_id, mmr_score, $i AS mmr_rank FROM (
             SELECT query_id, vec_id, mmr_score,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY mmr_score DESC, vec_id) AS rk
             FROM p$i) t WHERE rk = 1
         ), sel$i AS (SELECT * FROM $prev UNION ALL SELECT * FROM s$i)"""
      }.mkString
      s"""WITH ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         rel AS (
           SELECT query_id, vec_id, cos_sim AS rel FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               round(list_cosine_similarity(q.e, c.e), 4) AS cos_sim,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(q.e, c.e), 4) DESC, c.vec_id) AS rk
             FROM ec c CROSS JOIN (SELECT * FROM ec WHERE vec_id < 3) q
             WHERE c.vec_id <> q.vec_id) t
           WHERE rk <= 10
         ), ps AS (
           SELECT a.query_id, a.vec_id AS va, b.vec_id AS vb,
             round(list_cosine_similarity(ea.e, eb.e), 4) AS sim
           FROM rel a JOIN rel b ON a.query_id = b.query_id AND a.vec_id <> b.vec_id
           JOIN ec ea ON ea.vec_id = a.vec_id
           JOIN ec eb ON eb.vec_id = b.vec_id
         ), s1 AS (
           SELECT query_id, vec_id,
             round(CAST($lam AS DOUBLE) * rel, 6) AS mmr_score, 1 AS mmr_rank FROM (
             SELECT query_id, vec_id, rel,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY rel DESC, vec_id) AS rk
             FROM rel) t WHERE rk = 1
         )$steps
         SELECT query_id, vec_id, mmr_score, mmr_rank FROM sel$k
         ORDER BY query_id, mmr_rank"""
    },

    // the ENTIRE iterative k-means chain replayed as chained CTEs: same
    // init, same rounded-cosine assignment, same fixed-point means (exact
    // integer sums in any order), same float32 storage of centroids
    "q_kmeans" -> {
      val k = 8; val iters = 2
      s"""WITH ${kmeansCtes(k, iters)}
         SELECT c AS centroid_id, coalesce(n.cnt, 0) AS n_assigned,
           e[1] AS c0, e[2] AS c1, e[3] AS c2, e[4] AS c3
         FROM cents$iters
         LEFT JOIN (SELECT c AS cf, CAST(count(*) AS BIGINT) AS cnt
                    FROM a${iters - 1} GROUP BY c) n ON c = n.cf
         ORDER BY centroid_id"""
    },

    // train → final assignment → within-cluster prune, all in one chain:
    // the kmeans CTEs end at cents2, the assignment CTE reuses the exact
    // rounded-cosine/tie-break comparison, and the pair prune is the
    // q_embed_neardup-proven round(,4) cosine cut with cluster blocking
    "q_semantic_dedup" -> {
      val iters = 1
      s"""WITH ${kmeansCtes(16, iters)},
         af AS (
           SELECT vec_id, c FROM (
             SELECT e.vec_id, c.c,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(e.d, c.e), 6) DESC, c.c) AS rn
             FROM ev e CROSS JOIN cents$iters c) t WHERE rn = 1
         ), joined AS (
           SELECT a.vec_id, a.c, ev.d FROM af a JOIN ev ON a.vec_id = ev.vec_id
         ), p AS (
           SELECT b.vec_id AS vb
           FROM joined a JOIN joined b ON a.c = b.c AND a.vec_id < b.vec_id
           WHERE round(list_cosine_similarity(a.d, b.d), 4) >= 0.4
         )
         SELECT j.vec_id, j.c AS cluster_id,
           j.vec_id NOT IN (SELECT vb FROM p) AS keep
         FROM joined j ORDER BY vec_id"""
    },

    // trained-centroid assignment (the q_kmeans chain) + outlier cut on
    // the 6dp-ROUNDED cosine — ulp-safe membership on both engines
    "q_embed_outliers" -> {
      val iters = 2
      s"""WITH ${kmeansCtes(8, iters)},
         af AS (
           SELECT vec_id, c, cosr FROM (
             SELECT e.vec_id, c.c,
               round(list_cosine_similarity(e.d, c.e), 6) AS cosr,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(e.d, c.e), 6) DESC, c.c) AS rn
             FROM ev e CROSS JOIN cents$iters c) t WHERE rn = 1
         )
         SELECT vec_id, c AS cluster_id, cosr AS cos_centroid,
           cosr < 0.1 AS is_outlier
         FROM af ORDER BY vec_id"""
    },

    // float32→double widening, abs-max, and floor-plus-half are all
    // bit-deterministic IEEE ops — the unrounded scale doubles hash-match
    "q_quantize" ->
      """WITH e AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS d FROM embeddings
         ), s AS (
           SELECT vec_id, d,
             CASE WHEN m > 0 THEN m / 127.0 ELSE 1.0 END AS scale
           FROM (SELECT vec_id, d, list_max(list_transform(d, x -> abs(x))) AS m FROM e) t
         ), q AS (
           SELECT vec_id, scale,
             list_transform(d, x ->
               greatest(-127, least(127, CAST(floor(x / scale + 0.5) AS BIGINT)))) AS qs
           FROM s
         )
         SELECT vec_id, scale, CAST(list_sum(qs) AS BIGINT) AS q_sum,
           qs[1] AS q0, qs[2] AS q1, qs[3] AS q2, qs[4] AS q3
         FROM q ORDER BY vec_id""",

    "q_mm_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS payload_bytes,
         CAST(16 + n_chars % 64 AS INT) AS width,
         CAST(16 + (n_chars * 7) % 64 AS INT) AS height,
         CAST(n_chars // 500 + 1 AS INT) AS frames
         FROM documents ORDER BY doc_id""",

    // global top-k vocabulary; count() is BIGINT in DuckDB (no HUGEINT
    // coercion), ties broken on the token so the cut is identical
    "q_vocab_topk" ->
      """SELECT token, count(*) AS occurrences,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
         FROM (SELECT doc_id,
                 unnest(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS token
               FROM documents)
         GROUP BY token ORDER BY occurrences DESC, token LIMIT 100""",

    // chunk windows replayed with list slicing (1-based inclusive bounds
    // == Spark slice(start, length) with DuckDB's automatic clamping)
    "q_chunks" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), c AS (
           SELECT doc_id, tk,
             unnest(range(0, CAST(ceil(greatest(len(tk) - 64, 0) / 48.0) AS INT) + 1)) AS cid
           FROM toks
         )
         SELECT doc_id, CAST(cid AS INT) AS chunk_id,
           CAST(len(tk[cid*48 + 1 : cid*48 + 64]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(tk[cid*48 + 1 : cid*48 + 64], ' ') AS chunk_text
         FROM c ORDER BY doc_id, chunk_id""",

    // Bloom verdict replayed bit-for-bit: same md5-60 positions
    // (md5("i:key") % 16384, i = 0..4), maybe_seen = every position lands
    // in the history's position set; is_new = the exact anti-join verdict
    "q_incr_dedup" ->
      """WITH keyed AS (
           SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g'))) AS key
           FROM documents
         ), seen AS (
           SELECT DISTINCT key FROM keyed WHERE doc_id % 3 = 0
         ), ii AS (
           SELECT unnest(range(5)) AS i
         ), seen_pos AS (
           SELECT DISTINCT (CAST(concat('0x', substr(md5(key), 1, 14)) AS BIGINT)
             + i * CAST(concat('0x', substr(md5(key), 17, 14)) AS BIGINT)) % 16384 AS pos
           FROM seen CROSS JOIN ii
         ), inc_pos AS (
           SELECT doc_id, key,
             (CAST(concat('0x', substr(md5(key), 1, 14)) AS BIGINT)
              + i * CAST(concat('0x', substr(md5(key), 17, 14)) AS BIGINT)) % 16384 AS pos
           FROM keyed CROSS JOIN ii WHERE doc_id % 3 <> 0
         ), flg AS (
           SELECT q.doc_id, q.key, bool_and(p.pos IS NOT NULL) AS maybe_seen
           FROM inc_pos q LEFT JOIN seen_pos p ON q.pos = p.pos
           GROUP BY q.doc_id, q.key
         )
         SELECT f.doc_id, f.maybe_seen,
           CASE WHEN NOT f.maybe_seen THEN TRUE ELSE (s.key IS NULL) END AS is_new
         FROM flg f LEFT JOIN seen s ON f.key = s.key
         ORDER BY doc_id""",

    // count-min replayed exactly with the Kirsch–Mitzenmacher index
    // family: ONE md5 per token split into 56-bit halves a/b, counter
    // idx_j = (a + j·b) % 4096 for depth rows j = 0..3, est = min over j
    // (0 when never filled)
    "q_cms_topk" ->
      """WITH t AS (
           SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS token
           FROM documents
         ), h AS (
           SELECT CAST(concat('0x', substr(md5(token), 1, 14)) AS BIGINT) AS a,
                  CAST(concat('0x', substr(md5(token), 17, 14)) AS BIGINT) AS b
           FROM t
         ), jj AS (
           SELECT unnest(range(4)) AS j
         ), cms AS (
           SELECT j, (a + j * b) % 4096 AS idx, count(*) AS cnt
           FROM h CROSS JOIN jj GROUP BY j, idx
         ), truth AS (
           SELECT token, count(*) AS occurrences FROM t GROUP BY token
           ORDER BY occurrences DESC, token LIMIT 10
         ), probe AS (
           SELECT token, occurrences, j,
             (CAST(concat('0x', substr(md5(token), 1, 14)) AS BIGINT)
              + j * CAST(concat('0x', substr(md5(token), 17, 14)) AS BIGINT)) % 4096 AS idx
           FROM truth CROSS JOIN jj
         )
         SELECT p.token, p.occurrences, min(coalesce(c.cnt, 0)) AS est_count
         FROM probe p
         LEFT JOIN cms c ON p.j = c.j AND p.idx = c.idx
         GROUP BY p.token, p.occurrences
         ORDER BY p.occurrences DESC, p.token""",

    // the exact GROUP BY/HAVING the MG candidate pass replaces — the
    // hash match IS the exactness proof for the two-pass plan
    "q_heavy_hitters" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
         FROM events GROUP BY event_type
         HAVING count(*) >= CEIL(0.2 * (SELECT count(*) FROM events))
         ORDER BY event_type""",

    // certified superspreaders replay as the plain exact ranking — the
    // hash match proves the HLL candidate cut lost nothing
    "q_superspreaders" ->
      """WITH c AS (
           SELECT user_id, CAST(count(DISTINCT value) AS BIGINT) AS n_distinct
           FROM events
           WHERE user_id IS NOT NULL AND value IS NOT NULL
           GROUP BY user_id),
         r AS (
           SELECT user_id, n_distinct,
             row_number() OVER (ORDER BY n_distinct DESC, user_id) AS rk
           FROM c)
         SELECT CAST(rk AS INT) AS rank, user_id, n_distinct
         FROM r WHERE rk <= 10 ORDER BY rk""",

    // certified exact top-k: plain frequency ranking, (cnt desc, token)
    // ties — the hash match proves the candidate cut lost nothing
    "q_topk_tokens" ->
      """WITH t AS (
           SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS token
           FROM documents
         ), c AS (
           SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY token
         )
         SELECT token, cnt,
           CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS rank
         FROM c
         ORDER BY cnt DESC, token
         LIMIT 10""",

    // per-group certified top-k replay: plain per-language frequency
    // ranking — the hash match proves no group's candidate cut lost a
    // top-5 token
    "q_topk_by_lang" ->
      """WITH t AS (
           SELECT lang, unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS token
           FROM documents
         ), c AS (
           SELECT lang, token, CAST(count(*) AS BIGINT) AS cnt
           FROM t GROUP BY lang, token
         )
         SELECT lang, token, cnt, CAST(rn AS INT) AS rank FROM (
           SELECT *, row_number() OVER (
             PARTITION BY lang ORDER BY cnt DESC, token) AS rn
           FROM c) WHERE rn <= 5
         ORDER BY lang, rank""",

    // per-group exact heavy hitters: threshold is each LANGUAGE's own
    // ceil(minFrac * token count) — same tokenizer recipe as q_cms_topk
    "q_heavy_tokens" ->
      """WITH t AS (
           SELECT lang, unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS token
           FROM documents
         ), n AS (SELECT lang, count(*) AS n FROM t GROUP BY lang)
         SELECT t.lang AS lang, token, CAST(count(*) AS BIGINT) AS cnt
         FROM t JOIN n ON t.lang = n.lang
         GROUP BY t.lang, token, n.n
         HAVING count(*) >= CEIL(0.02 * n.n)
         ORDER BY lang, token""",

    "q_heavy_supp" ->
      """SELECT l_suppkey, CAST(count(*) AS BIGINT) AS cnt
         FROM lineitem GROUP BY l_suppkey
         HAVING count(*) >= CEIL(0.0105 * (SELECT count(*) FROM lineitem))
         ORDER BY l_suppkey""",

    // HLL replayed exactly: register idx = top 10 bits of md5_60, rho from
    // the binary length of the 50-bit remainder (string op, no libm), the
    // harmonic sum in exact fixed point 2^(51-rho); the single double
    // constant is Sketches.hllConstant(10) interpolated verbatim so the
    // one float division is the same IEEE op on both engines
    "q_hll_distinct" -> {
      val c = graft.operators.Sketches.hllConstant(10)
      s"""WITH it AS (
           SELECT concat(CAST(doc_id AS VARCHAR), ':', token) AS item
           FROM (SELECT doc_id,
                   unnest(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')) AS token
                 FROM documents)
         ), r AS (
           SELECT h >> 50 AS idx, h & ((CAST(1 AS BIGINT) << 50) - 1) AS rem
           FROM (SELECT CAST(concat('0x', substr(md5(item), 1, 15)) AS BIGINT) AS h FROM it)
         ), reg AS (
           SELECT idx,
             max(CASE WHEN rem = 0 THEN 51 ELSE 51 - length(ltrim(bin(rem), '0')) END) AS mrho
           FROM r GROUP BY idx
         ), agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n_registers_used,
             coalesce(CAST(sum(CAST(1 AS BIGINT) << CAST(51 - mrho AS INT)) AS BIGINT), CAST(0 AS BIGINT)) AS s_used
           FROM reg
         )
         SELECT n_registers_used,
           s_used + (1024 - n_registers_used) * (CAST(1 AS BIGINT) << 51) AS s_fixed,
           $c / CAST(s_used + (1024 - n_registers_used) * (CAST(1 AS BIGINT) << 51) AS DOUBLE) AS est_distinct,
           (SELECT CAST(count(DISTINCT item) AS BIGINT) FROM it) AS exact_distinct
         FROM agg"""
    },

    // the SINGLE-PASS sketch: equality with Spark's merged-shard path is
    // the point of the gate (merge-by-max == union registers)
    "q_hll_merge" -> {
      val c = graft.operators.Sketches.hllConstant(10)
      s"""WITH it AS (
           SELECT concat(CAST(doc_id AS VARCHAR), ':', token) AS item, source
           FROM (SELECT doc_id, source,
                   unnest(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')) AS token
                 FROM documents)
         ), r AS (
           SELECT h >> 50 AS idx, h & ((CAST(1 AS BIGINT) << 50) - 1) AS rem
           FROM (SELECT CAST(concat('0x', substr(md5(item), 1, 15)) AS BIGINT) AS h FROM it)
         ), reg AS (
           SELECT idx,
             max(CASE WHEN rem = 0 THEN 51 ELSE 51 - length(ltrim(bin(rem), '0')) END) AS mrho
           FROM r GROUP BY idx
         ), agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n_registers_used,
             coalesce(CAST(sum(CAST(1 AS BIGINT) << CAST(51 - mrho AS INT)) AS BIGINT), CAST(0 AS BIGINT)) AS s_used
           FROM reg
         )
         SELECT n_registers_used,
           s_used + (1024 - n_registers_used) * (CAST(1 AS BIGINT) << 51) AS s_fixed,
           $c / CAST(s_used + (1024 - n_registers_used) * (CAST(1 AS BIGINT) << 51) AS DOUBLE) AS est_distinct,
           (SELECT CAST(count(DISTINCT item) AS BIGINT) FROM it) AS exact_distinct,
           (SELECT CAST(count(DISTINCT source) AS BIGINT) FROM it) AS n_shards
         FROM agg"""
    },

    "q_hll_by_lang" -> {
      val c = graft.operators.Sketches.hllConstant(10)
      s"""WITH it AS (
           SELECT lang, concat(CAST(doc_id AS VARCHAR), ':', token) AS item
           FROM (SELECT lang, doc_id,
                   unnest(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')) AS token
                 FROM documents)
         ), r AS (
           SELECT lang, h >> 50 AS idx, h & ((CAST(1 AS BIGINT) << 50) - 1) AS rem
           FROM (SELECT lang, CAST(concat('0x', substr(md5(item), 1, 15)) AS BIGINT) AS h FROM it)
         ), reg AS (
           SELECT lang, idx,
             max(CASE WHEN rem = 0 THEN 51 ELSE 51 - length(ltrim(bin(rem), '0')) END) AS mrho
           FROM r GROUP BY 1, 2
         ), agg AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n_registers_used,
             coalesce(CAST(sum(CAST(1 AS BIGINT) << CAST(51 - mrho AS INT)) AS BIGINT), CAST(0 AS BIGINT)) AS s_used
           FROM reg GROUP BY 1
         ), ex AS (
           SELECT lang, CAST(count(DISTINCT item) AS BIGINT) AS exact_distinct FROM it GROUP BY 1
         )
         SELECT agg.lang, n_registers_used,
           s_used + (1024 - n_registers_used) * (CAST(1 AS BIGINT) << 51) AS s_fixed,
           $c / CAST(s_used + (1024 - n_registers_used) * (CAST(1 AS BIGINT) << 51) AS DOUBLE) AS est_distinct,
           ex.exact_distinct
         FROM agg JOIN ex ON agg.lang = ex.lang
         ORDER BY agg.lang"""
    },

    // KMV replayed exactly: same 3-token shingles as q_ngram_jaccard, same
    // md5-60 hash as the HLL family, k=64 minima per source via QUALIFY,
    // union-rank + membership flags for the pair estimator. Integer until
    // the final round(·/·, 4).
    "q_kmv_overlap" ->
      """WITH toks AS (
           SELECT source, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), sh AS (
           SELECT source, unnest(CASE WHEN len(tk) >= 3 THEN
               list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))
             ELSE [array_to_string(tk, ' ')] END) AS item
           FROM toks
         ), hvs AS (
           SELECT DISTINCT source, CAST(concat('0x', substr(md5(item), 1, 15)) AS BIGINT) AS hv
           FROM sh
         ), sk AS (
           SELECT source, hv FROM (
             SELECT source, hv, row_number() OVER (PARTITION BY source ORDER BY hv) AS rank
             FROM hvs) WHERE rank <= 64
         ), pairs AS (
           SELECT a.source AS group_a, b.source AS group_b
           FROM (SELECT DISTINCT source FROM documents) a
           JOIN (SELECT DISTINCT source FROM documents) b ON a.source < b.source
         ), un AS (
           SELECT p.group_a, p.group_b, s.hv,
             max(CASE WHEN s.source = p.group_a THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN s.source = p.group_b THEN 1 ELSE 0 END) AS in_b
           FROM pairs p JOIN sk s ON s.source IN (p.group_a, p.group_b)
           GROUP BY 1, 2, 3
         ), ranked AS (
           SELECT group_a, group_b, in_a, in_b FROM (
             SELECT *, row_number() OVER (PARTITION BY group_a, group_b ORDER BY hv) AS r
             FROM un) WHERE r <= 64
         )
         SELECT group_a, group_b, count(*) AS n_union_k,
           CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
           round(CAST(sum(in_a * in_b) AS DOUBLE) / count(*), 4) AS jaccard_est
         FROM ranked GROUP BY 1, 2 ORDER BY 1, 2""",

    // per-source KMV distinct estimate: (k−1)·2⁶⁰ / h_k — 63·2⁶⁰ is a
    // 6-significant-bit double, so the division replays bit-for-bit
    "q_kmv_distinct" ->
      """WITH toks AS (
           SELECT source, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), sh AS (
           SELECT source, unnest(CASE WHEN len(tk) >= 3 THEN
               list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))
             ELSE [array_to_string(tk, ' ')] END) AS item
           FROM toks
         ), hvs AS (
           SELECT DISTINCT source, CAST(concat('0x', substr(md5(item), 1, 15)) AS BIGINT) AS hv
           FROM sh
         ), sk AS (
           SELECT source, hv FROM (
             SELECT source, hv, row_number() OVER (PARTITION BY source ORDER BY hv) AS rank
             FROM hvs) WHERE rank <= 64
         )
         SELECT source,
           CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                ELSE 63.0 * 1152921504606846976.0 / CAST(max(hv) AS DOUBLE) END AS distinct_est
         FROM sk GROUP BY source ORDER BY source""",

    // the shuffle key is pure md5 arithmetic; the two-level rank must
    // equal a flat global row_number over the same (key, id) order
    "q_shuffle" ->
      """SELECT doc_id,
         md5(concat('7:', CAST(doc_id AS VARCHAR))) AS shuffle_key,
         CAST(row_number() OVER (
           ORDER BY md5(concat('7:', CAST(doc_id AS VARCHAR))), doc_id) - 1
           AS BIGINT) AS shuffle_rank
         FROM documents ORDER BY shuffle_rank""",

    // stage-major rank: easy length deciles first, the seed-3 epoch key
    // within a stage — one window replay
    "q_curriculum" ->
      """SELECT doc_id, n_chars // 100 AS stage,
         md5(concat('3:', CAST(doc_id AS VARCHAR))) AS shuffle_key,
         CAST(row_number() OVER (
           ORDER BY n_chars // 100,
             md5(concat('3:', CAST(doc_id AS VARCHAR))), doc_id) - 1
           AS BIGINT) AS curriculum_rank
         FROM documents WHERE n_chars IS NOT NULL
         ORDER BY doc_id""",

    // greedy prefix of the seed-5 shuffle order under a 10k-token budget:
    // exclusive running token sum replayed with a flat window
    "q_token_budget" ->
      """WITH t AS (
           SELECT doc_id,
             md5(concat('5:', CAST(doc_id AS VARCHAR))) AS k,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
           FROM documents
         ), c AS (
           SELECT doc_id, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (
               ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS token_offset
           FROM t
         )
         SELECT doc_id, token_offset, n_tokens FROM c
         WHERE token_offset < 10000 ORDER BY token_offset, doc_id""",

    // the split assignment is pure md5 arithmetic — replayed exactly
    "q_split" ->
      """SELECT doc_id,
         CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
         FROM (SELECT doc_id,
                 CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS b
               FROM documents)
         ORDER BY doc_id""",

    // leakage-safe split replay: the q_split bucket arithmetic plus the
    // portable-MinHash pair set; non-train docs with any partner move
    // to train (the one-pass-closed quarantine)
    "q_split_quarantine" ->
      s"""WITH ${lshCandidateCtes(16, 4)},
         p AS (
           SELECT doc_id_a, doc_id_b FROM est WHERE est_jaccard >= 0.5
         ), parts AS (
           SELECT doc_id_b AS doc_id FROM p
           UNION ALL
           SELECT doc_id_a AS doc_id FROM p
         ), np AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_partners
           FROM parts GROUP BY doc_id
         ), raw AS (
           SELECT doc_id,
             CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val'
               ELSE 'test' END AS split_raw
           FROM (SELECT doc_id,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS b
                 FROM documents)
         )
         SELECT r.doc_id, r.split_raw,
           CAST(coalesce(np.n_dup_partners, 0) AS BIGINT) AS n_dup_partners,
           (r.split_raw <> 'train' AND coalesce(np.n_dup_partners, 0) > 0)
             AS moved,
           CASE WHEN r.split_raw <> 'train' AND coalesce(np.n_dup_partners, 0) > 0
             THEN 'train' ELSE r.split_raw END AS split
         FROM raw r LEFT JOIN np USING (doc_id)
         ORDER BY r.doc_id""",

    // the bucketed range join must equal the plain inequality join
    "q_range_join" ->
      """SELECT l.event_id, l.user_id, epoch_ms(l.ts) AS ts_ms,
         r.event_id AS err_event_id
         FROM (SELECT * FROM events WHERE event_type = 'click') l
         JOIN (SELECT * FROM events WHERE event_type = 'error') r
           ON l.user_id = r.user_id
          AND l.ts >= r.ts AND l.ts <= r.ts + INTERVAL 4 HOUR
         ORDER BY l.event_id, r.event_id""",

    // plain inequality join replays the bucket-blocked overlap join;
    // arithmetic on epoch_ns BIGINTs so the overlap duration is exact
    // integer math on both sides (floor-div of positive values)
    "q_interval_join" ->
      """WITH v AS (
           SELECT event_id AS view_id, user_id, epoch_ns(ts) AS v_start,
             epoch_ns(ts) + 3600000000000 AS v_end
           FROM events WHERE event_type = 'view'
         ), e AS (
           SELECT event_id AS err_id, user_id, epoch_ns(ts) - 1800000000000 AS e_start,
             epoch_ns(ts) + 1800000000000 AS e_end
           FROM events WHERE event_type = 'error'
         )
         SELECT v.view_id, e.err_id, v.user_id,
           CAST((least(v.v_end, e.e_end) - greatest(v.v_start, e.e_start)) // 1000000 AS BIGINT) AS overlap_ms
         FROM v JOIN e ON v.user_id = e.user_id
           AND v.v_start <= e.e_end AND e.e_start <= v.v_end
         ORDER BY view_id, err_id""",

    // DuckDB's native ASOF JOIN replays the union+window implementation:
    // same inclusive >= match, nanosecond source timestamps
    "q_asof_join" ->
      """SELECT l.event_id, l.user_id, epoch_ms(l.ts) AS ts_ms,
         r.event_id AS matched_event_id, r.value AS matched_value
         FROM (SELECT * FROM events WHERE event_type = 'click') l
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
           ON l.user_id = r.user_id AND l.ts >= r.ts
         ORDER BY l.event_id""",

    // closed-form replay of the synthesized-media generation parameters
    // (Multimodal.synthesizeOne): the Spark side writes REAL PPM/BMP/WAV
    // bytes and decodes them back, so a match here gates the whole codec
    // round trip. Integer-only arithmetic — exact in both engines.
    "q_mm_features" ->
      """WITH p AS (
           SELECT doc_id, doc_id % 3 AS kind,
             16 + n_chars % 48 AS w,
             16 + (7 * n_chars) % 48 AS h,
             256 + n_chars % 512 AS n,
             1 + n_chars % 2 AS ch
           FROM documents
         )
         SELECT doc_id,
           CASE kind WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp' ELSE 'wav' END AS format,
           CAST(CASE WHEN kind < 2 THEN w ELSE 0 END AS INT) AS width,
           CAST(CASE WHEN kind < 2 THEN h ELSE 0 END AS INT) AS height,
           CAST(CASE WHEN kind < 2 THEN 3 ELSE ch END AS INT) AS channels,
           CAST(CASE WHEN kind = 2 THEN 8000 ELSE 0 END AS INT) AS sample_rate,
           CAST(CASE WHEN kind < 2 THEN w * h ELSE n END AS BIGINT) AS n_units,
           CAST(CASE WHEN kind < 2
             THEN w * list_sum(list_transform(range(0, h), y -> (doc_id + y) % 256))
             ELSE list_sum(list_transform(range(0, n * ch), i ->
               CASE WHEN i % ch = 0 THEN (7 * doc_id + 13 * i) % 2048 - 1024 ELSE 0 END))
           END AS BIGINT) AS c0_sum,
           CAST(CASE WHEN kind < 2
             THEN w * list_sum(list_transform(range(0, h), y -> (doc_id + y + 85) % 256))
             WHEN ch > 1 THEN list_sum(list_transform(range(0, n * ch), i ->
               CASE WHEN i % ch = 1 THEN (7 * doc_id + 13 * i) % 2048 - 1024 ELSE 0 END))
             ELSE 0 END AS BIGINT) AS c1_sum,
           CAST(CASE WHEN kind < 2
             THEN w * list_sum(list_transform(range(0, h), y -> (doc_id + y + 170) % 256))
             ELSE 0 END AS BIGINT) AS c2_sum
         FROM p ORDER BY doc_id""",

    // closed-form replay of the frame-stream generation parameters
    // (Multimodal.synthesizeStreamOne) with the stride-2 sampling applied
    // in list space: f = 2·i for i < ceil(F/2). Integer-only.
    "q_mm_frames" ->
      """WITH p AS (
           SELECT doc_id, 2 + doc_id % 6 AS f,
             16 + n_chars % 32 AS w,
             16 + (3 * n_chars) % 32 AS h
           FROM documents
         )
         SELECT doc_id,
           CAST(f AS INT) AS n_frames,
           CAST((f + 1) // 2 AS INT) AS n_sampled,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(w * list_sum(list_transform(range(0, (f + 1) // 2), i ->
             list_sum(list_transform(range(0, h), y ->
               (doc_id + 31 * (2 * i) + y) % 256)))) AS BIGINT) AS c0_sum,
           CAST(w * list_sum(list_transform(range(0, (f + 1) // 2), i ->
             list_sum(list_transform(range(0, h), y ->
               (doc_id + 31 * (2 * i) + y + 85) % 256)))) AS BIGINT) AS c1_sum,
           CAST(w * list_sum(list_transform(range(0, (f + 1) // 2), i ->
             list_sum(list_transform(range(0, h), y ->
               (doc_id + 31 * (2 * i) + y + 170) % 256)))) AS BIGINT) AS c2_sum
         FROM p ORDER BY doc_id""",

    // nearest-neighbor thumbnail replay: source row of output row y' is
    // floor(y'·H/8); the synthesized pixel value is constant across x, so
    // each 8x8 channel sum is 8 · Σ_y' value(srcY(y')). Audio docs
    // (doc_id % 3 = 2) are absent on both sides.
    "q_mm_resize" ->
      """WITH p AS (
           SELECT doc_id, doc_id % 3 AS kind,
             16 + (7 * n_chars) % 48 AS h
           FROM documents WHERE doc_id % 3 < 2
         )
         SELECT doc_id,
           CASE kind WHEN 0 THEN 'ppm' ELSE 'bmp' END AS format,
           CAST(8 AS INT) AS width,
           CAST(8 AS INT) AS height,
           CAST(8 * list_sum(list_transform(range(0, 8), y ->
             (doc_id + (y * h) // 8) % 256)) AS BIGINT) AS c0_sum,
           CAST(8 * list_sum(list_transform(range(0, 8), y ->
             (doc_id + (y * h) // 8 + 85) % 256)) AS BIGINT) AS c1_sum,
           CAST(8 * list_sum(list_transform(range(0, 8), y ->
             (doc_id + (y * h) // 8 + 170) % 256)) AS BIGINT) AS c2_sum
         FROM p ORDER BY doc_id""",

    // the aHash fingerprints replayed in closed form from the generation
    // parameters — any codec/resize/pack bug flips the 64-bit value
    "q_mm_phash" ->
      s"""WITH $aHashCte
         SELECT doc_id, phash FROM ph ORDER BY doc_id""",

    // the banded blocking replayed: band keys from the UNSIGNED value
    // ((u // 2^16i) % 2^16 == the engine's >>> i·16 & 0xFFFF), bucket
    // cap 64 ACTIVE at the oracle scales, exact hamming verify
    "q_mm_phash_pairs" ->
      s"""WITH $aHashCte,
         bk AS (
           SELECT doc_id, phash, i AS band,
             CAST((u // CASE i WHEN 0 THEN 1 WHEN 1 THEN 65536
               WHEN 2 THEN 4294967296 ELSE 281474976710656 END) % 65536 AS BIGINT) AS key
           FROM ph, unnest(range(0, 4)) AS t(i)),
         open_ AS (SELECT band, key FROM bk GROUP BY band, key HAVING count(*) <= 64),
         slim AS (SELECT bk.* FROM bk JOIN open_ USING (band, key)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.phash AS pa, b.phash AS pb
           FROM slim a JOIN slim b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         SELECT id_a, id_b, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
         FROM cand WHERE bit_count(xor(pa, pb)) <= 3
         ORDER BY id_a, id_b""",

    // phash families closed by the recursive min-label reach over the
    // SAME capped banded pair set — singleton images keep themselves
    "q_mm_phash_clusters" ->
      s"""WITH RECURSIVE $aHashCte,
         bk AS (
           SELECT doc_id, phash, i AS band,
             CAST((u // CASE i WHEN 0 THEN 1 WHEN 1 THEN 65536
               WHEN 2 THEN 4294967296 ELSE 281474976710656 END) % 65536 AS BIGINT) AS key
           FROM ph, unnest(range(0, 4)) AS t(i)),
         open_ AS (SELECT band, key FROM bk GROUP BY band, key HAVING count(*) <= 64),
         slim AS (SELECT bk.* FROM bk JOIN open_ USING (band, key)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.phash AS pa, b.phash AS pb
           FROM slim a JOIN slim b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         pairs AS (SELECT id_a, id_b FROM cand WHERE bit_count(xor(pa, pb)) <= 3),
         edges AS (
           SELECT id_a AS src, id_b AS dst FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
         reach(id, lbl) AS (
           SELECT doc_id, doc_id FROM img
           UNION
           SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id)
         SELECT id AS doc_id, min(lbl) AS canonical_id FROM reach
         GROUP BY id ORDER BY doc_id""",

    // the audio energy signature replayed sample-by-sample in closed form
    // — any RIFF chunk-walk / fmt / de-interleave bug flips the hash
    "q_mm_audiohash" ->
      s"""WITH $audioHashCte
         SELECT doc_id, ehash FROM ph ORDER BY doc_id""",

    // banding replay over the audio hashes — identical contract to
    // q_mm_phash_pairs, proving the blocking is hash-agnostic
    "q_mm_audiohash_pairs" ->
      s"""WITH $audioHashCte,
         bk AS (
           SELECT doc_id, ehash, i AS band,
             CAST((u // CASE i WHEN 0 THEN 1 WHEN 1 THEN 65536
               WHEN 2 THEN 4294967296 ELSE 281474976710656 END) % 65536 AS BIGINT) AS key
           FROM ph, unnest(range(0, 4)) AS t(i)),
         open_ AS (SELECT band, key FROM bk GROUP BY band, key HAVING count(*) <= 64),
         slim AS (SELECT bk.* FROM bk JOIN open_ USING (band, key)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.ehash AS pa, b.ehash AS pb
           FROM slim a JOIN slim b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         SELECT id_a, id_b, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
         FROM cand WHERE bit_count(xor(pa, pb)) <= 3
         ORDER BY id_a, id_b""",

    // exact n-gram jaccard, independently recomputed from the raw text with
    // DuckDB list ops (string shingles, no hashing — proves the Spark side's
    // hashed prefix-filter pipeline loses nothing)
    "q_ngram_jaccard" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), sh AS (
           SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))
             ELSE [array_to_string(tk, ' ')] END AS s
           FROM toks
         )
         SELECT doc_id_a, doc_id_b, jaccard FROM (
           SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                   (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
         WHERE jaccard >= 0.8
         ORDER BY doc_id_a, doc_id_b""",

    // connected components of the >=0.8 jaccard graph, replayed in DuckDB
    // as a recursive min-label closure over the same pair set
    "q_dedup_clusters" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), sh AS (
           SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))
             ELSE [array_to_string(tk, ' ')] END AS s
           FROM toks
         ), pairs AS (
           SELECT doc_id_a, doc_id_b FROM (
             SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
             FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
           WHERE jaccard >= 0.8
         ), edges AS (
           SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
           UNION ALL SELECT doc_id_b, doc_id_a FROM pairs
         ), reach(id, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
         )
         SELECT id AS doc_id, min(lbl) AS canonical_id FROM reach
         GROUP BY id ORDER BY doc_id""",

    // the same recursive closure folded into the family-size histogram
    "q_cluster_sizes" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), sh AS (
           SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))
             ELSE [array_to_string(tk, ' ')] END AS s
           FROM toks
         ), pairs AS (
           SELECT doc_id_a, doc_id_b FROM (
             SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
             FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
           WHERE jaccard >= 0.8
         ), edges AS (
           SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
           UNION ALL SELECT doc_id_b, doc_id_a FROM pairs
         ), reach(id, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
         ), canon AS (
           SELECT id, min(lbl) AS c FROM reach GROUP BY id
         ), sizes AS (
           SELECT c, CAST(count(*) AS BIGINT) AS cluster_size FROM canon GROUP BY c)
         SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
         FROM sizes GROUP BY 1 ORDER BY 1""",

    // the recursive closure folded per source: non-canonical docs are
    // the duplicates
    "q_dup_rate_by_source" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), sh AS (
           SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))
             ELSE [array_to_string(tk, ' ')] END AS s
           FROM toks
         ), prs AS (
           SELECT doc_id_a, doc_id_b FROM (
             SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
             FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
           WHERE jaccard >= 0.8
         ), edges AS (
           SELECT doc_id_a AS src, doc_id_b AS dst FROM prs
           UNION ALL SELECT doc_id_b, doc_id_a FROM prs
         ), reach(id, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
         ), lab AS (
           SELECT id AS doc_id, min(lbl) AS canonical_id FROM reach GROUP BY id)
         SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN l.doc_id <> l.canonical_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dups,
           round(CAST(sum(CASE WHEN l.doc_id <> l.canonical_id THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*), 6) AS dup_rate
         FROM lab l JOIN documents d USING (doc_id)
         GROUP BY d.source ORDER BY d.source""",

    // the dup-rate recursive closure joined to the per-doc quality
    // replay, folded to one row per source — exact DECIMAL ratio sums,
    // one double division each, the fixed-point mean convention
    "q_datasheet" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), sh AS (
           SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))
             ELSE [array_to_string(tk, ' ')] END AS s
           FROM toks
         ), prs AS (
           SELECT doc_id_a, doc_id_b FROM (
             SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
             FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
           WHERE jaccard >= 0.8
         ), edges AS (
           SELECT doc_id_a AS src, doc_id_b AS dst FROM prs
           UNION ALL SELECT doc_id_b, doc_id_a FROM prs
         ), reach(id, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
         ), lab AS (
           SELECT id AS doc_id, min(lbl) AS canonical_id FROM reach GROUP BY id
         ), qm AS (
           SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE length(string_split_regex(trim(text), '\s+')) END AS n_tokens,
             CASE WHEN trim(text) = '' THEN 0.0 ELSE
               round(CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                   t -> list_contains(['the','a','and','of','to'], t))) AS DOUBLE)
                 / length(string_split_regex(trim(text), '\s+')), 4) END AS stopword_ratio,
             CASE WHEN length(text) = 0 THEN 0.0 ELSE
               round(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                 / length(text), 4) END AS alpha_ratio
           FROM documents
         )
         SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(qm.n_tokens) AS BIGINT) AS n_tokens,
           round(CAST(sum(qm.n_tokens) AS DOUBLE) / count(*), 4) AS avg_tokens,
           CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs,
           round(CAST(sum(CAST(qm.alpha_ratio AS DECIMAL(18,4))) AS DOUBLE)
             / count(*), 4) AS mean_alpha,
           round(CAST(sum(CAST(qm.stopword_ratio AS DECIMAL(18,4))) AS DOUBLE)
             / count(*), 4) AS mean_stopword,
           CAST(sum(CASE WHEN l.doc_id <> l.canonical_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dups,
           round(CAST(sum(CASE WHEN l.doc_id <> l.canonical_id THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*), 6) AS dup_rate
         FROM documents d
         JOIN lab l USING (doc_id)
         JOIN qm USING (doc_id)
         GROUP BY d.source ORDER BY d.source""",

    // the same recursive closure joined to the md5 split replay: multi-
    // doc families and how many splits they straddle
    "q_split_leakage" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), sh AS (
           SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))
             ELSE [array_to_string(tk, ' ')] END AS s
           FROM toks
         ), prs AS (
           SELECT doc_id_a, doc_id_b FROM (
             SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
             FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
           WHERE jaccard >= 0.8
         ), edges AS (
           SELECT doc_id_a AS src, doc_id_b AS dst FROM prs
           UNION ALL SELECT doc_id_b, doc_id_a FROM prs
         ), reach(id, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
         ), lab AS (
           SELECT id AS doc_id, min(lbl) AS canonical_id FROM reach GROUP BY id
         ), sp AS (
           SELECT doc_id,
             CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
           FROM (SELECT doc_id,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS b
                 FROM documents))
         SELECT l.canonical_id, CAST(count(*) AS BIGINT) AS cluster_size,
           CAST(count(DISTINCT s.split) AS BIGINT) AS n_splits,
           count(DISTINCT s.split) > 1 AS leaks
         FROM lab l JOIN sp s USING (doc_id)
         GROUP BY l.canonical_id HAVING count(*) > 1
         ORDER BY l.canonical_id""",

    // cluster-keyed split: md5 over the family label, every member
    // rides its family
    "q_cluster_split" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), sh AS (
           SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))
             ELSE [array_to_string(tk, ' ')] END AS s
           FROM toks
         ), prs AS (
           SELECT doc_id_a, doc_id_b FROM (
             SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
             FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
           WHERE jaccard >= 0.8
         ), edges AS (
           SELECT doc_id_a AS src, doc_id_b AS dst FROM prs
           UNION ALL SELECT doc_id_b, doc_id_a FROM prs
         ), reach(id, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
         ), lab AS (
           SELECT id AS doc_id, min(lbl) AS canonical_id FROM reach GROUP BY id)
         SELECT doc_id,
           CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
         FROM (SELECT doc_id,
                 CAST(concat('0x', substr(md5(CAST(canonical_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS b
               FROM lab)
         ORDER BY doc_id""",

    // the q_dupspans window-fingerprint chain, projected to distinct
    // (span, source); fan-out per span is bounded by the source count
    "q_cross_dup" ->
      """WITH toks AS (
           SELECT doc_id, source,
             list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), c AS (
           SELECT doc_id, source, tk,
             unnest(range(0, CAST(ceil(greatest(len(tk) - 32, 0) / 16.0) AS INT) + 1)) AS cid
           FROM toks
         ), k AS (
           SELECT DISTINCT source,
             md5(array_to_string(tk[cid*16 + 1 : cid*16 + 32], ' ')) AS span_md5
           FROM c WHERE len(tk[cid*16 + 1 : cid*16 + 32]) = 32
         )
         SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared_spans
         FROM k a JOIN k b ON a.span_md5 = b.span_md5 AND a.source < b.source
         GROUP BY 1, 2 ORDER BY 1, 2""",

    // the q_dedup_clusters recursive closure + the q_quality ranking keys
    // + one window: the representative is the cluster's argmax
    // (alpha_ratio, n_chars, lowest id) — all 4dp-exact columns
    "q_dedup_best" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), sh AS (
           SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))
             ELSE [array_to_string(tk, ' ')] END AS s
           FROM toks
         ), pairs AS (
           SELECT doc_id_a, doc_id_b FROM (
             SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
             FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
           WHERE jaccard >= 0.8
         ), edges AS (
           SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
           UNION ALL SELECT doc_id_b, doc_id_a FROM pairs
         ), reach(id, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
         ), labels AS (
           SELECT id AS doc_id, min(lbl) AS canonical_id FROM reach GROUP BY id
         ), qual AS (
           SELECT doc_id,
             CASE WHEN length(text) = 0 THEN 0.0 ELSE
               round(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                 / length(text), 4) END AS alpha_ratio,
             length(text) AS n_chars_measured
           FROM documents
         ), ranked AS (
           SELECT l.doc_id, l.canonical_id,
             row_number() OVER (PARTITION BY l.canonical_id
               ORDER BY q.alpha_ratio DESC, q.n_chars_measured DESC, l.doc_id) AS rn
           FROM labels l JOIN qual q ON q.doc_id = l.doc_id
         ), reps AS (
           SELECT canonical_id, doc_id AS rep_id FROM ranked WHERE rn = 1
         )
         SELECT r.doc_id, r.canonical_id, p.rep_id, r.doc_id = p.rep_id AS keep
         FROM ranked r JOIN reps p ON p.canonical_id = r.canonical_id
         ORDER BY r.doc_id""",

    // compaction is content-preserving: the read-back rows must hash-
    // match the source table, and the layout claims are pinned literals
    // (2 output files, 0 within-file sort violations)
    "q_compact" ->
      """SELECT doc_id, text, lang, source, n_chars,
         CAST(2 AS BIGINT) AS n_files, CAST(0 AS BIGINT) AS disorder
         FROM documents ORDER BY doc_id""",

    // Morton-spread replay: five shift-and-mask steps per dimension on
    // 31-bit values — every intermediate stays positive, so signed-64
    // engines (DuckDB raises on bigint shift overflow) replay exactly
    "q_zorder" ->
      """WITH s1 AS (
           SELECT l_orderkey, l_linenumber,
             (CAST(l_partkey AS BIGINT) & 2147483647) AS va,
             (CAST(l_suppkey AS BIGINT) & 2147483647) AS vb
           FROM lineitem
         ), t1 AS (
           SELECT *, ((va | (va << 16)) & 281470681808895) AS a1,
                     ((vb | (vb << 16)) & 281470681808895) AS b1 FROM s1
         ), t2 AS (
           SELECT *, ((a1 | (a1 << 8)) & 71777214294589695) AS a2,
                     ((b1 | (b1 << 8)) & 71777214294589695) AS b2 FROM t1
         ), t3 AS (
           SELECT *, ((a2 | (a2 << 4)) & 1085102592571150095) AS a3,
                     ((b2 | (b2 << 4)) & 1085102592571150095) AS b3 FROM t2
         ), t4 AS (
           SELECT *, ((a3 | (a3 << 2)) & 3689348814741910323) AS a4,
                     ((b3 | (b3 << 2)) & 3689348814741910323) AS b4 FROM t3
         ), t5 AS (
           SELECT *, ((a4 | (a4 << 1)) & 6148914691236517205) AS a5,
                     ((b4 | (b4 << 1)) & 6148914691236517205) AS b5 FROM t4
         )
         SELECT l_orderkey, l_linenumber, ((a5 << 1) | b5) AS z_key
         FROM t5 ORDER BY z_key, l_orderkey, l_linenumber""",

    // ANALYZE replay: min/max on native types cast to VARCHAR (identical
    // rendering for ints/strings in any engine) + the p=12 HLL register
    // math per column
    "q_column_profile" -> {
      s"""WITH prof AS (
           SELECT 'l_orderkey' AS "column", count(*) AS n_rows, count(l_orderkey) AS n_non_null,
             CAST(min(l_orderkey) AS VARCHAR) AS min_value, CAST(max(l_orderkey) AS VARCHAR) AS max_value FROM lineitem
           UNION ALL
           SELECT 'l_partkey', count(*), count(l_partkey),
             CAST(min(l_partkey) AS VARCHAR), CAST(max(l_partkey) AS VARCHAR) FROM lineitem
           UNION ALL
           SELECT 'l_suppkey', count(*), count(l_suppkey),
             CAST(min(l_suppkey) AS VARCHAR), CAST(max(l_suppkey) AS VARCHAR) FROM lineitem
           UNION ALL
           SELECT 'l_returnflag', count(*), count(l_returnflag),
             min(l_returnflag), max(l_returnflag) FROM lineitem
         ), vals AS (
           SELECT 'l_orderkey' AS "column", CAST(l_orderkey AS VARCHAR) AS v FROM lineitem WHERE l_orderkey IS NOT NULL
           UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem WHERE l_partkey IS NOT NULL
           UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem WHERE l_suppkey IS NOT NULL
           UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem WHERE l_returnflag IS NOT NULL
         ), r AS (
           SELECT "column", h >> 48 AS idx, h & ((CAST(1 AS BIGINT) << 48) - 1) AS rem
           FROM (SELECT "column", CAST(concat('0x', substr(md5(v), 1, 15)) AS BIGINT) AS h FROM vals)
         ), reg AS (
           SELECT "column", idx,
             max(CASE WHEN rem = 0 THEN 49 ELSE 49 - length(ltrim(bin(rem), '0')) END) AS mrho
           FROM r GROUP BY 1, 2
         ), agg AS (
           SELECT "column", CAST(count(*) AS BIGINT) AS n_used,
             coalesce(CAST(sum(CAST(1 AS BIGINT) << CAST(49 - mrho AS INT)) AS BIGINT), CAST(0 AS BIGINT)) AS s_used
           FROM reg GROUP BY 1
         )
         SELECT prof."column", prof.n_rows, prof.n_non_null, prof.min_value,
           prof.max_value, coalesce(agg.n_used, CAST(0 AS BIGINT)) AS n_registers_used
         FROM prof LEFT JOIN agg ON prof."column" = agg."column"
         ORDER BY prof."column" """
    },

    "q_fixed_sample" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5(concat('7:', CAST(doc_id AS VARCHAR))), doc_id) AS rk
           FROM documents) t
         WHERE rk <= 25 ORDER BY doc_id""",

    // bigram-LM replay: conditional probs 6dp-rounded into DECIMAL before
    // the per-doc sum (order-free exact), one double division at the end
    "q_lm_score" ->
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
         ), scored AS (
           SELECT bi.doc_id, count(*) AS n_bigrams,
             round(CAST(sum(CAST(round(CAST(bc.bcnt AS DOUBLE) / uc.ucnt, 6) AS DECIMAL(18,6))) AS DOUBLE)
               / count(*), 4) AS lm_score
           FROM bi JOIN bc ON bi.w1 = bc.w1 AND bi.w2 = bc.w2
           JOIN uc ON bi.w1 = uc.w1
           GROUP BY 1
         )
         SELECT d.doc_id, coalesce(s.n_bigrams, 0) AS n_bigrams,
           coalesce(s.lm_score, 0.0) AS lm_score
         FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
         ORDER BY d.doc_id""",

    "q_term_stats" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), pos AS (
           SELECT doc_id, unnest(tk) AS term FROM toks
         ), pd AS (
           SELECT term, doc_id, count(*) AS tf FROM pos GROUP BY 1, 2
         )
         SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM pd GROUP BY term ORDER BY term""",

    // positional intersection replay: word i's positions shifted by -i
    // must meet word 0's exactly
    "q_phrase" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), pos AS (
           SELECT doc_id, unnest(tk) AS term,
             generate_subscripts(tk, 1) - 1 AS pos FROM toks
         ), a AS (
           SELECT doc_id, pos FROM pos WHERE term = 'order'
         ), b AS (
           SELECT doc_id, pos - 1 AS pos FROM pos WHERE term = 'fast'
         )
         SELECT a.doc_id, count(*) AS n_matches
         FROM a JOIN b ON a.doc_id = b.doc_id AND a.pos = b.pos
         GROUP BY 1 ORDER BY a.doc_id""",

    // rational-idf TF-IDF replay: tf·(N+1)/(df+1) is +,·,/ on doubles
    // only (no log), identical bits in any IEEE engine
    "q_tfidf" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), tfc AS (
           SELECT doc_id, term, count(*) AS tf
           FROM (SELECT doc_id, unnest(tk) AS term FROM toks) GROUP BY 1, 2
         ), dft AS (
           SELECT term, count(*) AS df FROM tfc GROUP BY 1
         ), n AS (SELECT count(*) AS n FROM documents)
         SELECT tfc.doc_id, tfc.term,
           round(tfc.tf * (n.n + 1.0) / (dft.df + 1.0), 4) AS tfidf
         FROM tfc JOIN dft ON tfc.term = dft.term CROSS JOIN n
         ORDER BY tfc.doc_id, tfc.term"""
  )
}
