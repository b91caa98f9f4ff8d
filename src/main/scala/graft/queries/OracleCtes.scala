package graft
package queries

/** The DuckDB-oracle CTE builders shared across the Oracles*.scala
  * registry files (split out of SparkEntry, r18 verdict task 8).
  */
private[graft] object OracleCtes {


  // the full IVFADC cold-chain replay (centroid draw, nprobe=2 probe
  // sets, PQ codebooks/encode/LUT, fixed-point ADC sums, exact re-rank)
  // — shared verbatim by q_ivf_pq and q_ivf_pq_append: seed-then-append
  // over frozen codebooks is row-identical to the cold build, so both
  // operators gate against the same pinned arithmetic
  /** The span-duplication pair graph as a reusable CTE body (`toks` →
    * `p`): distinct doc pairs (src < dst) sharing ≥1 span fingerprint,
    * sharing degree capped at 64 — the exact q_dupspans substrate the
    * q_pagerank oracle replays inline. Shared by the triangle oracles so
    * the three graph queries provably run over ONE graph.
    */
  val spanPairCte: String =
    """toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
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
         ), tri AS (
           SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
           FROM p e1
           JOIN p e2 ON e2.src = e1.dst
           JOIN p e3 ON e3.src = e1.src AND e3.dst = e2.dst
         )"""

  /** [[spanPairCte]]'s WEIGHTED sibling: same tokenize/chunk/md5/df-cap
    * recipe, but `p` carries w = shared-span count (the
    * [[Graph.spanLinkEdgesWeighted]] definition). ONE copy shared by
    * q_pagerank_w and q_sssp so a recipe change (stride, span width,
    * the nd ≤ 64 cap) cannot desynchronize one weighted oracle from the
    * engine. Plain (non-interpolated) literal: interpolated consumers
    * splice it in as a VALUE, which the s-interpolator does not
    * re-escape.
    */
  val spanPairWeightedCte: String =
    """toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
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
           SELECT a.doc_id AS src, b.doc_id AS dst, CAST(count(*) AS BIGINT) AS w
           FROM spl a JOIN spl b ON a.span_md5 = b.span_md5 AND a.doc_id < b.doc_id
           GROUP BY 1, 2
         )"""

  /** Unrolled k-core peel over the `p` pair CTE ([[spanPairCte]]):
    * round i keeps nodes with deg ≥ k in round i−1's subgraph and
    * re-derives edges/degrees. Peeling is monotone with a unique
    * fixpoint, so any unroll ≥ the graph's peel depth replays the
    * engine's converge-to-fixpoint loop exactly; `rounds` carries
    * comfortable margin over the measured depth at the oracle scales
    * (a converged round is a no-op for every later round).
    */
  def kcoreCtes(k: Int, rounds: Int): String = {
    // AS MATERIALIZED: each round references its predecessor three times
    // (degree filter + both endpoint semi-joins); DuckDB's default CTE
    // inlining would expand the chain 3^rounds-fold
    val iter = (1 to rounds).map { i =>
      s"""k$i AS MATERIALIZED (SELECT node FROM d${i - 1} WHERE deg >= $k),
         e$i AS MATERIALIZED (
           SELECT e.src, e.dst FROM e${i - 1} e
           JOIN k$i sa ON e.src = sa.node
           JOIN k$i sb ON e.dst = sb.node),
         d$i AS MATERIALIZED (
           SELECT node, count(*) AS deg FROM (
             SELECT src AS node FROM e$i UNION ALL SELECT dst AS node FROM e$i)
           GROUP BY node)"""
    }.mkString(",\n         ")
    s"""e0 AS MATERIALIZED (SELECT src, dst FROM p),
         d0 AS MATERIALIZED (
           SELECT node, count(*) AS deg FROM (
             SELECT src AS node FROM e0 UNION ALL SELECT dst AS node FROM e0)
           GROUP BY node),
         $iter"""
  }

  /** The closed-form aHash replay shared by q_mm_phash and
    * q_mm_phash_pairs: the synthesized images are row-gradient (channel
    * value constant across x), so the 8×8 thumbnail's 64 pixels reduce to
    * 8 row grays — gray(y) = ⌊Σc (doc_id + ⌊y·h/8⌋ + 85c) % 256 / 3⌋ —
    * and the engine's all-integer 64·gray ≥ Σgray test becomes
    * 8·gray(y) ≥ Σy gray. Bits pack MSB-first (row y fills byte 7−y:
    * 255·2^(56−8y), INTEGER literals — DuckDB's ** returns DOUBLE and
    * would round the high bytes), HUGEINT-summed, two's-complement
    * folded to the engine's signed long (the q_fingerprint pattern).
    */
  val aHashCte: String =
    """img AS (SELECT doc_id, 16 + (7 * n_chars) % 48 AS h
           FROM documents WHERE doc_id % 3 < 2),
         g AS (
           SELECT doc_id, y,
             (((doc_id + (y * h) // 8) % 256) + ((doc_id + (y * h) // 8 + 85) % 256)
               + ((doc_id + (y * h) // 8 + 170) % 256)) // 3 AS gray
           FROM img, unnest(range(0, 8)) AS t(y)),
         tot AS (SELECT doc_id, sum(gray) AS s FROM g GROUP BY doc_id),
         bits AS (
           SELECT g.doc_id, g.y, CASE WHEN 8 * g.gray >= t.s THEN 1 ELSE 0 END AS b
           FROM g JOIN tot t USING (doc_id)),
         hu AS (
           SELECT doc_id, sum(CAST(b AS HUGEINT) * 255 * CASE y
               WHEN 0 THEN 72057594037927936 WHEN 1 THEN 281474976710656
               WHEN 2 THEN 1099511627776 WHEN 3 THEN 4294967296
               WHEN 4 THEN 16777216 WHEN 5 THEN 65536 WHEN 6 THEN 256 ELSE 1 END) AS u
           FROM bits GROUP BY doc_id),
         ph AS (
           SELECT doc_id,
             CAST(CASE WHEN u >= 9223372036854775808 THEN u - 18446744073709551616
                  ELSE u END AS BIGINT) AS phash, u
           FROM hu)"""

  /** Closed-form audio energy-hash replay (q_mm_audiohash[_pairs]): the
    * synthesized WAV's interleaved stream is s(i) = (7·doc_id + 13·i) %
    * 2048 − 1024 over n = ch·frames samples, so per-window energies are
    * exact integer sums; bits pack MSB-first via two 32-bit halves
    * (hi·2^32 + lo — BIGINT shifts stay inside the signed range; a
    * single 1<<63 would overflow) then two's-complement fold.
    */
  val audioHashCte: String =
    """wav AS (
           SELECT doc_id, (1 + n_chars % 2) * (256 + n_chars % 512) AS n
           FROM documents WHERE doc_id % 3 = 2),
         samp AS (
           SELECT doc_id, n, i, (7*doc_id + 13*i) % 2048 - 1024 AS s
           FROM wav, unnest(range(0, CAST(n AS INT))) AS t(i)),
         en AS (
           SELECT doc_id, (i * 64) // n AS w, sum(s * s) AS e
           FROM samp GROUP BY doc_id, (i * 64) // n),
         tot AS (SELECT doc_id, sum(e) AS te FROM en GROUP BY doc_id),
         ebits AS (
           SELECT en.doc_id, en.w, CASE WHEN 64 * en.e >= t.te THEN 1 ELSE 0 END AS b
           FROM en JOIN tot t USING (doc_id)),
         parts AS (
           SELECT doc_id,
             sum(CASE WHEN w < 32 THEN b * (CAST(1 AS BIGINT) << CAST(31 - w AS INT)) ELSE 0 END) AS hi,
             sum(CASE WHEN w >= 32 THEN b * (CAST(1 AS BIGINT) << CAST(63 - w AS INT)) ELSE 0 END) AS lo
           FROM ebits GROUP BY doc_id),
         ph AS (
           SELECT doc_id,
             CAST(CASE WHEN u >= 9223372036854775808 THEN u - 18446744073709551616
                  ELSE u END AS BIGINT) AS ehash, u
           FROM (SELECT doc_id, CAST(hi AS HUGEINT) * 4294967296 + lo AS u FROM parts))"""

  /** `storeWhere` restricts the CODE-TABLE side only (e.g. `" WHERE
    * v.vec_id % 7 <> 3"` replays a tombstone takedown): queries, frozen
    * codebooks, and the exact-rerank corpus fetch stay corpus-wide,
    * mirroring the engine where forget touches serving code rows and
    * nothing else. `ecWhere` instead restricts the WHOLE chain's corpus
    * — codebook draws, codes, queries, and rerank alike — replaying a
    * RETRAIN, where the rebuilt index (codebooks included) never saw
    * the removed vectors. The defaults emit byte-identical SQL to the
    * historical unfiltered form.
    */
  def ivfPqChainSql(storeWhere: String = "",
      ecWhere: String = "",
      trainedK: Option[(Int, Int)] = None): String = {
    // trainedK = Some((k, iters)) swaps the pseudo centroid draw for the
    // q_kmeans-proven fixed-point k-means chain (cents$iters) — the
    // trained-retrain replay; the default emits byte-identical SQL to
    // the historical pseudo form
    val (trainPrefix, centroidCte) = trainedK match {
      case None =>
        ("", "c AS (SELECT vec_id AS centroid_id, e FROM ec WHERE vec_id < 32)")
      case Some((k, iters)) =>
        (kmeansCtes(k, iters) + ",\n         ",
          s"c AS (SELECT c AS centroid_id, e FROM cents$iters)")
    }
    s"""WITH ${trainPrefix}ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings$ecWhere),
         $centroidCte,
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
             FROM sv v JOIN cb c USING (subspace)$storeWhere) WHERE rn = 1),
         lut AS (
           SELECT q.vec_id AS query_id, q.subspace, c.centroid_id AS code,
             CAST(floor(round(list_sum(list_transform(range(1, 17),
               i -> q.sub[i] * c.c_sub[i])), 6) * 1099511627776 + 0.5) AS BIGINT) AS ipq
           FROM sv q JOIN cb c USING (subspace) WHERE q.vec_id < 5),
         approx AS (
           SELECT l.query_id, n.vec_id,
             round(CAST(CAST(sum(l.ipq) AS BIGINT) AS DOUBLE) / 1099511627776, 6) AS approx_ip
           FROM enc n
           JOIN lut l ON l.subspace = n.subspace AND l.code = n.code
           JOIN ca a ON a.vec_id = n.vec_id
           JOIN qa q ON q.query_id = l.query_id AND q.centroid_id = a.centroid_id
           WHERE n.vec_id <> l.query_id
           GROUP BY l.query_id, n.vec_id),
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
         WHERE rank <= 3 ORDER BY query_id, rank"""
  }

  /** Shared PCA replay prefix: quantized components, exact integer
    * moment/Gram sums, 9dp covariance, and the fixed-8-round power
    * iteration as a recursive CTE — the same integer/pinned-double
    * arithmetic [[operators.Pca]] runs (Q=2^20, CQ=10^9, VQ=10^12,
    * downshift 2^40; `//` on positives only, so trunc ≡ floor).
    */
  val pcaCte: String =
    """WITH RECURSIVE q AS (
         SELECT vec_id, unnest(range(len(embedding))) AS pos,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1048576 + 0.5) AS BIGINT) AS qv
         FROM embeddings WHERE embedding IS NOT NULL
       ), m AS (
         SELECT pos, CAST(sum(qv) AS HUGEINT) AS s, CAST(count(*) AS BIGINT) AS n
         FROM q GROUP BY pos
       ), g AS (
         SELECT a.pos AS i, b.pos AS j,
           CAST(sum(CAST(a.qv AS HUGEINT) * b.qv) AS HUGEINT) AS s_qq
         FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY 1, 2
       ), cv AS (
         SELECT g.i, g.j,
           round(CAST(ma.n * g.s_qq - ma.s * mb.s AS DOUBLE)
             / (CAST(ma.n AS DOUBLE) * ma.n * 1048576 * 1048576), 9) AS cov
         FROM g JOIN m ma ON ma.pos = g.i JOIN m mb ON mb.pos = g.j
       ), cq AS (
         SELECT i, j, CAST(floor(cov * 1e9 + 0.5) AS HUGEINT) AS c FROM cv
       ), dims AS (SELECT DISTINCT pos AS i FROM q
       ), pw(iter, i, v) AS (
         SELECT 0, i, CAST(CASE WHEN i = 0 THEN 1000000000000 ELSE 0 END AS HUGEINT)
         FROM dims
         UNION ALL
         SELECT iter + 1, i, v FROM (
           WITH w AS (
             SELECT p.iter AS it, c.i AS wi, CAST(sum(c.c * p.v) AS HUGEINT) AS wv
             FROM pw p JOIN cq c ON c.j = p.i
             WHERE p.iter < 8 GROUP BY 1, 2
           ), wq AS (
             SELECT it, wi,
               CASE WHEN wv < 0 THEN -CAST((-wv) // 1099511627776 AS HUGEINT)
                    ELSE CAST(wv // 1099511627776 AS HUGEINT) END AS wqv
             FROM w
           ), nrm AS (
             SELECT it, sqrt(CAST(sum(wqv * wqv) AS DOUBLE)) AS nv FROM wq GROUP BY it
           )
           SELECT wq.it AS iter, wq.wi AS i,
             CAST(floor(CAST(wq.wqv * 1000000000000 AS DOUBLE) / nrm.nv + 0.5) AS HUGEINT) AS v
           FROM wq JOIN nrm ON nrm.it = wq.it
         )
       ), vfin AS (SELECT i, v FROM pw WHERE iter = 8)"""

  /** The q_ivf_pq_recall replay, parameterized like [[ivfPqChainSql]]:
    * `storeWhere` restricts the CODE side, `exactAnd` restricts the
    * brute-force truth's corpus — together they replay the FILTERED
    * recall sweep; defaults emit byte-identical SQL to the historical
    * unfiltered form.
    */
  def ivfPqRecallSql(storeWhere: String = "",
      exactAnd: String = ""): String =
    s"""WITH ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         c AS (SELECT vec_id AS centroid_id, e FROM ec WHERE vec_id < 32),
         ca AS (
           SELECT vec_id, centroid_id FROM (
             SELECT x.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY x.vec_id
                 ORDER BY round(list_cosine_similarity(x.e, c.e), 6) DESC, c.centroid_id) AS rn
             FROM ec x CROSS JOIN c) WHERE rn = 1),
         qa AS (
           SELECT vec_id AS query_id, centroid_id, rn AS probe_rank FROM (
             SELECT x.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY x.vec_id
                 ORDER BY round(list_cosine_similarity(x.e, c.e), 6) DESC, c.centroid_id) AS rn
             FROM ec x CROSS JOIN c WHERE x.vec_id < 5) WHERE rn <= 4),
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
             FROM sv v JOIN cb c USING (subspace)$storeWhere) WHERE rn = 1),
         lut AS (
           SELECT q.vec_id AS query_id, q.subspace, c.centroid_id AS code,
             CAST(floor(round(list_sum(list_transform(range(1, 17),
               i -> q.sub[i] * c.c_sub[i])), 6) * 1099511627776 + 0.5) AS BIGINT) AS ipq
           FROM sv q JOIN cb c USING (subspace) WHERE q.vec_id < 5),
         approx AS (
           SELECT l.query_id, n.vec_id, q.probe_rank,
             round(CAST(CAST(sum(l.ipq) AS BIGINT) AS DOUBLE) / 1099511627776, 6) AS approx_ip
           FROM enc n
           JOIN lut l ON l.subspace = n.subspace AND l.code = n.code
           JOIN ca a ON a.vec_id = n.vec_id
           JOIN qa q ON q.query_id = l.query_id AND q.centroid_id = a.centroid_id
           WHERE n.vec_id <> l.query_id
           GROUP BY l.query_id, n.vec_id, q.probe_rank),
         np AS (SELECT unnest([1, 2, 4]) AS nprobe),
         surv AS (
           SELECT nprobe, query_id, vec_id, approx_ip FROM (
             SELECT np.nprobe, a.query_id, a.vec_id, a.approx_ip,
               row_number() OVER (PARTITION BY np.nprobe, a.query_id
                 ORDER BY a.approx_ip DESC, a.vec_id ASC) AS ar
             FROM np CROSS JOIN approx a
             WHERE a.probe_rank <= np.nprobe) WHERE ar <= 12),
         ivfpq AS (
           SELECT nprobe, query_id, vec_id FROM (
             SELECT s.nprobe, s.query_id, s.vec_id,
               row_number() OVER (PARTITION BY s.nprobe, s.query_id
                 ORDER BY round(list_cosine_similarity(q.e, v.e), 4) DESC, s.vec_id ASC) AS rank
             FROM surv s
             JOIN ec v ON v.vec_id = s.vec_id
             JOIN ec q ON q.vec_id = s.query_id) t
           WHERE rank <= 3),
         exact AS (
           SELECT query_id, vec_id FROM (
             SELECT q.vec_id AS query_id, c2.vec_id AS vec_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(q.e, c2.e), 4) DESC, c2.vec_id) AS rank
             FROM ec c2 CROSS JOIN (SELECT * FROM ec WHERE vec_id < 5) q
             WHERE c2.vec_id <> q.vec_id$exactAnd) t WHERE rank <= 3),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS exact_pairs FROM exact)
         SELECT CAST(i.nprobe AS INT) AS nprobe,
           tot.exact_pairs,
           CAST(count(*) AS BIGINT) AS ivf_pairs,
           CAST(count(e.query_id) AS BIGINT) AS hit_pairs,
           CAST(count(e.query_id) AS DOUBLE) / CAST(tot.exact_pairs AS DOUBLE) AS recall_at_k
         FROM ivfpq i
         LEFT JOIN exact e ON i.query_id = e.query_id AND i.vec_id = e.vec_id, tot
         GROUP BY i.nprobe, tot.exact_pairs
         ORDER BY nprobe"""



  /** q_langid Scala-side marker lists and SQL must agree; keep both derived
    * from [[TextAnalysis.langMarkers]].
    */

  /** Shared oracle CTE chain replaying the portable LSH candidate path
    * (Dedup.minHashNearDupPortable): toks → shingle sets → md5 a/b halves →
    * wide signatures → band buckets → distinct collision pairs → `est`
    * (doc_id_a, doc_id_b, est_jaccard). Callers append their own final
    * SELECT over `est`.
    */
  /** The exact iterative k-means replay (Similarity.trainCodebook) as
    * chained CTEs: ev (DOUBLE[] embeddings), qv (2^20 fixed-point
    * components), cents0 (k lowest-id init), then per iteration j the
    * assignment a{j}, fixed-point means m{j}, and cents{j+1}. Shared by
    * q_kmeans (reads cents{iters} + a{iters-1}) and q_semantic_dedup
    * (assigns against cents{iters}).
    */
  def kmeansCtes(k: Int, iters: Int): String = {
    val q = 1L << 20
    val head = s"""ev AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS d FROM embeddings
         ), qv AS (
           SELECT vec_id, pos, floor(d[pos] * $q + 0.5) AS qq
           FROM (SELECT vec_id, d, unnest(range(1, len(d) + 1)) AS pos FROM ev) t
         ), cents0 AS (
           SELECT vec_id AS c, d AS e FROM ev ORDER BY vec_id LIMIT $k
         )"""
    val steps = (0 until iters).map { j =>
      s"""a$j AS (
           SELECT vec_id, c FROM (
             SELECT e.vec_id, c.c,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(e.d, c.e), 6) DESC, c.c) AS rn
             FROM ev e CROSS JOIN cents$j c) t WHERE rn = 1
         ), m$j AS (
           SELECT a.c, qv.pos,
             CAST(CAST(CAST(sum(qv.qq) AS DOUBLE) / (count(*) * $q.0) AS FLOAT) AS DOUBLE) AS mv,
             count(*) AS cnt
           FROM a$j a JOIN qv ON a.vec_id = qv.vec_id
           GROUP BY a.c, qv.pos
         ), cents${j + 1} AS (
           SELECT p.c, CASE WHEN n.e IS NULL THEN p.e ELSE n.e END AS e
           FROM cents$j p LEFT JOIN (
             SELECT c, list(mv ORDER BY pos) AS e FROM m$j GROUP BY c) n ON p.c = n.c
         )"""
    }.mkString(",\n         ")
    s"$head,\n         $steps"
  }

  /** DuckDB replay of [[graft.operators.Pq.pqCodebooksTrained]]: sv
    * (inlined subvectors), qsv (2^20 fixed-point components), cb0 (the
    * pseudo init), then per iteration j the per-(vec,subspace)
    * assignment a{j}, fixed-point means m{j}, and cb{j+1}. The caller's
    * chain reads cb{iters}. Pinned constants mirror the Spark side:
    * m=4, ksub=16, sub=16, Q=2^20.
    */
  def pqTrainCtes(iters: Int): String = {
    val q = 1L << 20
    val head = s"""ec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         ss AS (SELECT unnest(range(0, 4)) AS subspace),
         sv AS (
           SELECT vec_id, subspace, e[subspace*16 + 1 : subspace*16 + 16] AS sub
           FROM ec CROSS JOIN ss),
         qsv AS (
           SELECT vec_id, subspace, pos, floor(sub[pos] * $q + 0.5) AS qq
           FROM (SELECT vec_id, subspace, sub, unnest(range(1, 17)) AS pos FROM sv) t),
         cb0 AS (SELECT subspace, vec_id AS centroid_id, sub AS c_sub
                 FROM sv WHERE vec_id < 16)"""
    val steps = (0 until iters).map { j =>
      s"""a$j AS (
           SELECT vec_id, subspace, centroid_id AS code FROM (
             SELECT v.vec_id, v.subspace, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id, v.subspace ORDER BY
                 round(list_sum(list_transform(range(1, 17), i -> v.sub[i] * v.sub[i]))
                   - 2 * list_sum(list_transform(range(1, 17), i -> v.sub[i] * c.c_sub[i]))
                   + list_sum(list_transform(range(1, 17), i -> c.c_sub[i] * c.c_sub[i])), 6) ASC,
                 c.centroid_id ASC) AS rn
             FROM sv v JOIN cb$j c USING (subspace)) WHERE rn = 1),
         m$j AS (
           SELECT a.subspace, a.code, q.pos,
             CAST(CAST(CAST(sum(q.qq) AS DOUBLE) / (count(*) * $q.0) AS FLOAT) AS DOUBLE) AS mv
           FROM a$j a JOIN qsv q ON a.vec_id = q.vec_id AND a.subspace = q.subspace
           GROUP BY a.subspace, a.code, q.pos),
         cb${j + 1} AS (
           SELECT p.subspace, p.centroid_id,
             CASE WHEN n.e IS NULL THEN p.c_sub ELSE n.e END AS c_sub
           FROM cb$j p LEFT JOIN (
             SELECT subspace, code, list(mv ORDER BY pos) AS e
             FROM m$j GROUP BY subspace, code) n
           ON p.subspace = n.subspace AND p.centroid_id = n.code)"""
    }.mkString(",\n         ")
    s"$head,\n         $steps"
  }

  /** DuckDB replay of [[graft.operators.Classifier.linearProbe]]'s FULL
    * training loop: presence features (md5 bucket hash + bias `dim`),
    * all-zero integer weights w0, then per gradient step j the integer
    * doc scores z{j}, residuals r{j}, per-feature gradients g{j}, and
    * the float-collapsed update w{j+1}. Every sum is integer (exact,
    * order-free); the only double arithmetic is the identical
    * floor(lr2·g/F + 0.5) expression per feature per step (F = total
    * presence rows — the step normalizer that keeps GD stable across
    * corpus shapes). The caller's chain reads zf (scores under
    * w{iters}) and y.
    */
  def clfCtes(dim: Int, iters: Int, lr2: String): String = {
    val q = 1L << 20
    val head = s"""toks AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')) AS tok
           FROM documents
         ), feats AS (
           SELECT DISTINCT doc_id,
             CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % $dim AS feat
           FROM toks
           UNION ALL SELECT doc_id, $dim AS feat FROM documents
         ), y AS (
           SELECT doc_id,
             CASE WHEN text LIKE '%vector%' THEN CAST(1 AS BIGINT) ELSE 0 END AS y
           FROM documents
         ), nn AS (SELECT count(*) AS n FROM feats),
         w0 AS (SELECT CAST(unnest(range(${dim + 1})) AS BIGINT) AS feat,
                  CAST(0 AS BIGINT) AS qw)"""
    val steps = (0 until iters).map { j =>
      s"""z$j AS (
           SELECT f.doc_id, sum(w.qw) AS z
           FROM feats f JOIN w$j w USING (feat) GROUP BY 1
         ), r$j AS (
           SELECT y.doc_id, coalesce(z.z, 0) - $q * y.y AS r
           FROM y LEFT JOIN z$j z USING (doc_id)
         ), g$j AS (
           SELECT f.feat, sum(r.r) AS g
           FROM feats f JOIN r$j r USING (doc_id) GROUP BY 1
         ), w${j + 1} AS (
           SELECT w.feat,
             w.qw - CAST(floor($lr2 * CAST(coalesce(g.g, 0) AS DOUBLE) / n.n + 0.5) AS BIGINT) AS qw
           FROM w$j w LEFT JOIN g$j g USING (feat) CROSS JOIN nn n
         )"""
    }.mkString(",\n         ")
    val tail = s"""zf AS (
           SELECT f.doc_id, sum(w.qw) AS z
           FROM feats f JOIN w$iters w USING (feat) GROUP BY 1
         )"""
    s"$head,\n         $steps,\n         $tail"
  }

  /** `docWhere` restricts the corpus the signature/band chain runs over
    * (e.g. a tombstone takedown's survivors) — empty means all docs; the
    * default emits byte-identical SQL to the historical unfiltered form,
    * so existing oracle hashes are untouched.
    */
  def lshCandidateCtes(n: Int, bands: Int,
      docWhere: String = ""): String = {
    val rows = n / bands
    val scols = (0 until n)
      .map(p => s"CAST(min(a + $p * b) AS BIGINT) AS s$p")
      .mkString(",\n           ")
    val bsel = (0 until bands).map { b =>
      val vals = (b * rows until (b + 1) * rows)
        .map(i => s"CAST(s$i AS VARCHAR)").mkString(", ")
      s"SELECT doc_id, md5(concat_ws('_', '$b', $vals)) AS bucket FROM sig"
    }.mkString("\n           UNION ALL ")
    val mexpr = (0 until n)
      .map(i => s"CASE WHEN x.s$i = y.s$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS tk
           FROM documents$docWhere
         ), shs AS (
           SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))
             ELSE [array_to_string(tk, ' ')] END AS s
           FROM toks
         ), e AS (
           SELECT doc_id, unnest(s) AS sh FROM shs
         ), ab AS (
           SELECT doc_id,
             CAST(concat('0x', substr(md5(sh), 1, 14)) AS BIGINT) AS a,
             CAST(concat('0x', substr(md5(sh), 17, 14)) AS BIGINT) AS b
           FROM e
         ), sig AS (
           SELECT doc_id, $scols
           FROM ab GROUP BY doc_id
         ), banded AS (
           $bsel
         ), cand AS (
           SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
           FROM banded a JOIN banded b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
         ), est AS (
           SELECT doc_id_a, doc_id_b,
             round(($mexpr) / $n.0, 4) AS est_jaccard
           FROM cand JOIN sig x ON x.doc_id = cand.doc_id_a JOIN sig y ON y.doc_id = cand.doc_id_b
         )"""
  }
}
