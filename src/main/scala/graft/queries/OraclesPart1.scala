package graft
package queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, CacheRegistry, Cdc, Dedup, Eval, Events, Graph, HllStore, Index, Linkage, Multimodal, Pq, Quantiles, Sampling, Similarity, SketchStore, Sketches, TextAnalysis, Tfidf}
import OracleCtes._
import QueryShared._

/** Oracle-SQL registry, part 1 of 4 (original SparkEntry order;
  * SparkEntry.oracleSql concatenates the parts, duplicate keys fail).
  */
private[graft] object OraclesPart1 {
  val m: Map[String, String] = Map(

    // the sum-vector identity replayed over quantized unit components:
    // HUGEINT ‖S‖² − Σqn², two double divisions
    "q_isotropy" ->
      """WITH e AS (
           SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * x))) AS nrm
           FROM embeddings WHERE embedding IS NOT NULL
         ), f AS (SELECT * FROM e WHERE nrm > 0
         ), q AS (
           SELECT CAST(floor(round(CAST(unnest(embedding) AS DOUBLE) / nrm, 6)
               * 1e6 + 0.5) AS BIGINT) AS qn,
             unnest(range(len(embedding))) AS pos
           FROM f
         ), d AS (SELECT pos, CAST(sum(qn) AS HUGEINT) AS s FROM q GROUP BY pos
         ), s2 AS (SELECT CAST(sum(s * s) AS HUGEINT) AS v FROM d
         ), t AS (SELECT CAST(sum(CAST(qn AS HUGEINT) * qn) AS HUGEINT) AS v FROM q
         ), c AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST((SELECT count(*) FROM e) AS BIGINT) AS total,
             CAST(sum(CAST(floor(nrm * 1e6 + 0.5) AS BIGINT)) AS HUGEINT) AS sn
           FROM f)
         SELECT c.n AS n_vectors, c.total - c.n AS n_zero_norm,
           round(CAST(c.sn AS DOUBLE) / c.n / 1e6, 6) AS mean_norm,
           CASE WHEN c.n < 2 THEN NULL
             ELSE round(CAST(s2.v - t.v AS DOUBLE)
               / (CAST(c.n AS DOUBLE) * (c.n - 1)) / 1e12, 6) END
             AS mean_pairwise_cos
         FROM c, s2, t""",

    // the grouped sum-vector identity: per-label HUGEINT dim sums,
    // ||S_g||^2 - T_g within, S_g . (S - S_g) across
    "q_label_cohesion" ->
      """WITH e AS (
           SELECT label AS g, embedding,
             sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * x))) AS nrm
           FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL
         ), f AS (SELECT * FROM e WHERE nrm > 0
         ), q AS (
           SELECT g, unnest(range(len(embedding))) AS pos,
             CAST(floor(round(CAST(unnest(embedding) AS DOUBLE) / nrm, 6)
               * 1e6 + 0.5) AS BIGINT) AS qn
           FROM f
         ), ld AS (
           SELECT g, pos, CAST(sum(qn) AS HUGEINT) AS s,
             CAST(sum(CAST(qn AS HUGEINT) * qn) AS HUGEINT) AS t
           FROM q GROUP BY g, pos
         ), gd AS (SELECT pos, CAST(sum(s) AS HUGEINT) AS sg FROM ld GROUP BY pos
         ), pl AS (
           SELECT ld.g, CAST(sum(ld.s * ld.s) AS HUGEINT) AS s2,
             CAST(sum(ld.t) AS HUGEINT) AS tt,
             CAST(sum(ld.s * (gd.sg - ld.s)) AS HUGEINT) AS x
           FROM ld JOIN gd ON gd.pos = ld.pos GROUP BY ld.g
         ), c AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY g
         ), tot AS (SELECT CAST(sum(n) AS BIGINT) AS nall FROM c)
         SELECT c.g AS label, c.n,
           CASE WHEN c.n < 2 THEN NULL
             ELSE round(CAST(pl.s2 - pl.tt AS DOUBLE)
               / (CAST(c.n AS DOUBLE) * (c.n - 1)) / 1e12, 6) END
             AS mean_within_cos,
           CASE WHEN tot.nall = c.n THEN NULL
             ELSE round(CAST(pl.x AS DOUBLE)
               / (CAST(c.n AS DOUBLE) * (tot.nall - c.n)) / 1e12, 6) END
             AS mean_cross_cos
         FROM pl JOIN c USING (g) CROSS JOIN tot ORDER BY label""",

    "q_pca_cov" -> (pcaCte + """
         SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j, cov
         FROM cv WHERE i <= j ORDER BY i, j"""),

    "q_pca_power" -> (pcaCte + """
         , mv AS (
           SELECT c.i, CAST(sum(c.c * vf.v) AS HUGEINT) AS wv
           FROM cq c JOIN vfin vf ON vf.i = c.j GROUP BY 1
         ), ray AS (
           SELECT
             CAST((SELECT sum(mv.wv * vf2.v) FROM mv JOIN vfin vf2 ON vf2.i = mv.i) AS DOUBLE)
             / CAST((SELECT sum(v * v) FROM vfin) AS DOUBLE) AS raw)
         SELECT CAST(vf.i AS INT) AS pos,
           round(CAST(vf.v AS DOUBLE) / 1e12, 9) AS pc1,
           round(ray.raw / 1e9, 9) AS eigval,
           round(ray.raw
             / CAST((SELECT sum(c) FROM cq WHERE i = j) AS DOUBLE), 6)
             AS var_explained
         FROM vfin vf CROSS JOIN ray ORDER BY pos"""),

    "q_pca2" -> (pcaCte + """
         , mv AS (
           SELECT c.i, CAST(sum(c.c * vf.v) AS HUGEINT) AS wv
           FROM cq c JOIN vfin vf ON vf.i = c.j GROUP BY 1
         ), ray AS (
           SELECT
             CAST((SELECT sum(mv.wv * vf2.v) FROM mv JOIN vfin vf2 ON vf2.i = mv.i) AS DOUBLE)
             / CAST((SELECT sum(v * v) FROM vfin) AS DOUBLE) AS raw
         ), cq2 AS (
           SELECT a.i AS i, b.i AS j,
             COALESCE(c.c, 0)
               - CAST(floor(ray.raw * CAST(a.v * b.v AS DOUBLE) / 1e24 + 0.5)
                   AS HUGEINT) AS c
           FROM vfin a CROSS JOIN vfin b CROSS JOIN ray
           LEFT JOIN cq c ON c.i = a.i AND c.j = b.i
         ), pw2(iter, i, v) AS (
           SELECT 0, i, CAST(CASE WHEN i = 0 THEN 1000000000000 ELSE 0 END AS HUGEINT)
           FROM dims
           UNION ALL
           SELECT iter + 1, i, v FROM (
             WITH w AS (
               SELECT p.iter AS it, c.i AS wi, CAST(sum(c.c * p.v) AS HUGEINT) AS wv
               FROM pw2 p JOIN cq2 c ON c.j = p.i
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
         ), vfin2 AS (SELECT i, v FROM pw2 WHERE iter = 8
         ), mv2 AS (
           SELECT c.i, CAST(sum(c.c * vf.v) AS HUGEINT) AS wv
           FROM cq2 c JOIN vfin2 vf ON vf.i = c.j GROUP BY 1
         ), ray2 AS (
           SELECT
             CAST((SELECT sum(mv2.wv * vf2.v) FROM mv2 JOIN vfin2 vf2 ON vf2.i = mv2.i) AS DOUBLE)
             / CAST((SELECT sum(v * v) FROM vfin2) AS DOUBLE) AS raw
         ), tr AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM cq WHERE i = j)
         SELECT 1 AS component, CAST(vf.i AS INT) AS pos,
           round(CAST(vf.v AS DOUBLE) / 1e12, 9) AS loading,
           round(ray.raw / 1e9, 9) AS eigval,
           round(ray.raw / tr.t, 6) AS var_explained
         FROM vfin vf CROSS JOIN ray CROSS JOIN tr
         UNION ALL
         SELECT 2, CAST(vf.i AS INT),
           round(CAST(vf.v AS DOUBLE) / 1e12, 9),
           round(ray2.raw / 1e9, 9), round(ray2.raw / tr.t, 6)
         FROM vfin2 vf CROSS JOIN ray2 CROSS JOIN tr
         ORDER BY component, pos"""),

    "q_pca_scores" -> (pcaCte + """
         SELECT q.vec_id,
           round(CAST(sum(CAST(q.qv AS HUGEINT) * vf.v) AS DOUBLE)
             / (1048576 * 1e12), 6) AS pc1_score
         FROM q JOIN vfin vf ON vf.i = q.pos
         GROUP BY q.vec_id ORDER BY q.vec_id"""),

    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
         l_extendedprice * (1 - l_discount) AS net_price
         FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 30
         ORDER BY l_orderkey, l_linenumber""",

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
         round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_qty,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q_listgroups_events" ->
      """SELECT event_type, count(*) AS entry_count,
         min(epoch_ms(ts)) AS first_seen, max(epoch_ms(ts)) AS last_seen,
         CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS high_value_count,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
         FROM events GROUP BY event_type
         ORDER BY first_seen, event_type""",

    "q_bygroup" ->
      """SELECT doc_id, source, lang FROM documents
         WHERE lower(CASE WHEN source = '' THEN '<no group>' ELSE source END) LIKE '%rc1%'
         ORDER BY doc_id""",

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice AS total_price
         FROM (SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
         ORDER BY o_orderkey""",

    "q_tail" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms, event_type
         FROM (SELECT * FROM events ORDER BY ts DESC, event_id DESC LIMIT 20)
         ORDER BY event_id""",

    "q_seek" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms, event_type, value
         FROM events ORDER BY event_id LIMIT 50 OFFSET 100""",

    "q_carryforward" ->
      """SELECT event_id, user_id,
         coalesce(last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS last_signup_event
         FROM events ORDER BY event_id""",

    // integer day buckets over epoch-ms (floor division replays exactly);
    // DuckDB's // on BIGINT is floor division like Spark's floor(/)
    "q_retention" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS p FROM events),
         f AS (SELECT user_id, min(p) AS cohort FROM e GROUP BY user_id),
         a AS (SELECT DISTINCT user_id, p FROM e)
         SELECT f.cohort, a.p - f.cohort AS period_offset,
           CAST(count(*) AS BIGINT) AS n_active
         FROM a JOIN f ON a.user_id = f.user_id
         GROUP BY f.cohort, period_offset
         ORDER BY cohort, period_offset""",

    // stage tables chained on (user, strictly-later min ts); epoch_ns
    // replays Spark's nanosAsLong ts exactly
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS tsn FROM events),
         s0 AS (SELECT user_id, min(tsn) AS t FROM e
                WHERE event_type = 'view' GROUP BY user_id),
         s1 AS (SELECT e.user_id, min(tsn) AS t FROM e
                JOIN s0 ON e.user_id = s0.user_id
                WHERE e.event_type = 'click' AND e.tsn > s0.t GROUP BY e.user_id),
         s2 AS (SELECT e.user_id, min(tsn) AS t FROM e
                JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'purchase' AND e.tsn > s1.t GROUP BY e.user_id),
         c AS (
           SELECT CAST(0 AS INT) AS stage_idx, 'view' AS stage,
             CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_users
           UNION ALL SELECT CAST(1 AS INT), 'click',
             CAST((SELECT count(*) FROM s1) AS BIGINT)
           UNION ALL SELECT CAST(2 AS INT), 'purchase',
             CAST((SELECT count(*) FROM s2) AS BIGINT))
         SELECT stage_idx, stage, n_users,
           CASE WHEN lag(n_users) OVER (ORDER BY stage_idx) IS NULL
                  OR lag(n_users) OVER (ORDER BY stage_idx) = 0 THEN 1.0
                ELSE CAST(n_users AS DOUBLE) /
                     CAST(lag(n_users) OVER (ORDER BY stage_idx) AS DOUBLE) END
             AS conv_from_prev,
           CASE WHEN first_value(n_users) OVER (ORDER BY stage_idx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 0 THEN 1.0
                ELSE CAST(n_users AS DOUBLE) /
                     CAST(first_value(n_users) OVER (ORDER BY stage_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) END
             AS conv_from_first
         FROM c ORDER BY stage_idx""",

    // json_extract_string ≡ get_json_object for scalar number fields;
    // integer aggregates only
    "q_json_extract" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(k) AS BIGINT) AS k_sum, CAST(max(k) AS BIGINT) AS k_max,
         CAST(count(CASE WHEN k >= 50 THEN 1 END) AS BIGINT) AS n_high
         FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
               FROM events) t
         GROUP BY event_type ORDER BY event_type""",

    "q_join_star" ->
      """SELECT n_name,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name ORDER BY n_name""",

    // bucketing changes the physical plan, not the result: the oracle is
    // the plain join over the raw parquet
    "q_bucketed_join" ->
      """SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",

    "q_window_topn" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
           SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, rn""",

    "q_sessionize" ->
      """SELECT event_id, user_id,
         CAST(sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ms, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         FROM (SELECT event_id, user_id, epoch_ms(ts) AS ms,
                 lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_ms
               FROM events) t
         ORDER BY event_id""",

    // per-user z outliers: DECIMAL(18,4) power sums (order-free), the
    // q_corr pinned closed form, membership cut on the 4dp-ROUNDED z
    "q_anomaly" ->
      """WITH v AS (
           SELECT event_id, user_id, value, CAST(value AS DECIMAL(18,4)) AS x
           FROM events WHERE value IS NOT NULL
         ), st AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx,
             sum(CAST(value AS DECIMAL(19,4)) * CAST(value AS DECIMAL(19,4))) AS sxx
           FROM v GROUP BY user_id
         )
         SELECT event_id, user_id, value, z FROM (
           SELECT v.event_id, v.user_id, v.value,
             round((CAST(v.x AS DOUBLE)
                 - CAST(st.sx AS DOUBLE) / CAST(st.n AS DOUBLE))
               / (sqrt(CAST(st.n AS DOUBLE) * CAST(st.sxx AS DOUBLE)
                   - CAST(st.sx AS DOUBLE) * CAST(st.sx AS DOUBLE))
                 / CAST(st.n AS DOUBLE)), 4) AS z,
             st.n AS n,
             CAST(st.n AS DOUBLE) * CAST(st.sxx AS DOUBLE)
               - CAST(st.sx AS DOUBLE) * CAST(st.sx AS DOUBLE) AS varnum
           FROM v JOIN st USING (user_id)) t
         WHERE n >= 8 AND varnum > 0.0 AND abs(z) > 3.0
         ORDER BY event_id""",

    // online variant: the same pinned closed form over RUNNING window
    // sums (sequential in-frame decimal accumulation — engine-identical)
    "q_anomaly_online" ->
      """WITH v AS (
           SELECT event_id, user_id, ts, value, CAST(value AS DECIMAL(18,4)) AS x
           FROM events WHERE value IS NOT NULL
         ), r AS (
           SELECT event_id, user_id, value,
             CAST(count(*) OVER w AS BIGINT) AS n,
             sum(x) OVER w AS sx,
             sum(CAST(value AS DECIMAL(19,4)) * CAST(value AS DECIMAL(19,4))) OVER w AS sxx,
             CAST(x AS DOUBLE) AS xd
           FROM v
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         )
         SELECT event_id, user_id, value, z FROM (
           SELECT event_id, user_id, value,
             round((xd - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE)), 4) AS z,
             n,
             CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varnum
           FROM r) t
         WHERE n >= 8 AND varnum > 0.0 AND abs(z) > 3.0
         ORDER BY event_id""",

    "q_moving_agg" ->
      """SELECT event_id, user_id,
         CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
           ORDER BY epoch_ns(ts), event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
         CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
           ORDER BY epoch_ns(ts), event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum_3,
         CAST(count(*) OVER (PARTITION BY user_id
           ORDER BY epoch_ns(ts), event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_window
         FROM events ORDER BY event_id""",

    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         coalesce(l_linestatus, 'ALL') AS linestatus,
         count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY returnflag, linestatus""",

    // the full CUBE lattice (every grouping-set combination) under the
    // q_rollup conventions: ALL sentinels for the set-level nulls, exact
    // DECIMAL sums
    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         coalesce(l_linestatus, 'ALL') AS linestatus,
         count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY returnflag, linestatus""",

    // pivoted conditional aggregation — identical semantics in any
    // engine when the pivot values are enumerated explicitly
    "q_pivot" ->
      """SELECT l_returnflag,
         CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_F,
         CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_O
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_percentile" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
         round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // the order statistic the refinement loop selects, replayed as a
    // rank: k-th smallest at k = ceil(p*n) — the VALUE is tie-order
    // independent, and both engines read the identical parquet double
    "q_exact_quantile" ->
      """WITH v AS (
           SELECT l_extendedprice AS x FROM lineitem
           WHERE l_extendedprice IS NOT NULL
         ), r AS (
           SELECT x, row_number() OVER (ORDER BY x) AS rn FROM v
         ), n AS (SELECT count(*) AS n FROM v)
         SELECT
           (SELECT x FROM r, n WHERE rn = CEIL(0.5 * n)) AS p50,
           (SELECT x FROM r, n WHERE rn = CEIL(0.95 * n)) AS p95,
           (SELECT x FROM r, n WHERE rn = CEIL(0.99 * n)) AS p99""",

    // the per-group descent, replayed as a per-group rank: the k_g-th
    // smallest at k_g = ceil(p*n_g) — value identical whatever the tie
    // order; n_g counts the group's non-null values
    "q_exact_quantile_by" ->
      """WITH v AS (
           SELECT l_returnflag AS g, l_extendedprice AS x FROM lineitem
           WHERE l_extendedprice IS NOT NULL
         ), r AS (
           SELECT g, x,
             row_number() OVER (PARTITION BY g ORDER BY x) AS rn,
             count(*) OVER (PARTITION BY g) AS n
           FROM v
         )
         SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n, x AS quantile
         FROM r WHERE rn = CEIL(0.95 * n) ORDER BY g""",

    // replay of the log-histogram sketch: every bucket edge is integer
    // arithmetic (floor-quantize, bit-length via bin(), power-of-two
    // width) — no log() whose last ulp could differ between runtimes —
    // so the walk and the estimates hash-match bit-for-bit; ceil's
    // argument is cast to DOUBLE to pin DuckDB's decimal literal to
    // Spark's double multiply
    "q_loghist_quantile" ->
      """WITH v AS (
           SELECT l_returnflag AS g,
                  CAST(floor(l_extendedprice * 100) AS BIGINT) AS nq
           FROM lineitem WHERE l_extendedprice IS NOT NULL
         ), k AS (
           SELECT g, nq, abs(nq) AS an, length(bin(abs(nq))) AS e FROM v
         ), w AS (
           SELECT g, nq, an,
             CASE WHEN e <= 6 THEN 1.0
                  ELSE pow(2, CAST(e - 6 AS DOUBLE)) END AS wd
           FROM k
         ), b AS (
           SELECT g,
             CASE WHEN nq = 0 THEN 0.0
                  WHEN nq > 0 THEN floor(CAST(an AS DOUBLE) / wd) * wd
                  ELSE -(floor(CAST(an AS DOUBLE) / wd) * wd + wd)
             END AS lo,
             count(*) AS c
           FROM w GROUP BY 1, 2
         ), cum AS (
           SELECT g, lo,
             sum(c) OVER (PARTITION BY g ORDER BY lo) AS cum,
             sum(c) OVER (PARTITION BY g) AS n
           FROM b
         )
         SELECT g AS l_returnflag, CAST(max(n) AS BIGINT) AS n,
           min(CASE WHEN cum >= ceil(0.5 * CAST(n AS DOUBLE)) THEN lo END) / 100.0 AS p50_est,
           min(CASE WHEN cum >= ceil(0.95 * CAST(n AS DOUBLE)) THEN lo END) / 100.0 AS p95_est,
           min(CASE WHEN cum >= ceil(0.99 * CAST(n AS DOUBLE)) THEN lo END) / 100.0 AS p99_est
         FROM cum GROUP BY g ORDER BY g""",

    // the windowed walk: identical bucket arithmetic partitioned by the
    // integer-epoch window start + type (epoch_ms(ts) truncation is the
    // q_event_windows-pinned twin of Spark's ts div 1000000)
    "q_window_quantile" ->
      """WITH v AS (
           SELECT (epoch_ms(ts) // 3600000) * 3600000 AS w_ms,
                  event_type AS g2,
                  CAST(floor(value * 100) AS BIGINT) AS nq
           FROM events WHERE value IS NOT NULL
         ), k AS (
           SELECT w_ms, g2, nq, abs(nq) AS an,
                  length(bin(abs(nq))) AS e
           FROM v
         ), w AS (
           SELECT w_ms, g2, nq, an,
             CASE WHEN e <= 6 THEN 1.0
                  ELSE pow(2, CAST(e - 6 AS DOUBLE)) END AS wd
           FROM k
         ), b AS (
           SELECT w_ms, g2,
             CASE WHEN nq = 0 THEN 0.0
                  WHEN nq > 0 THEN floor(CAST(an AS DOUBLE) / wd) * wd
                  ELSE -(floor(CAST(an AS DOUBLE) / wd) * wd + wd)
             END AS lo,
             count(*) AS c
           FROM w GROUP BY 1, 2, 3
         ), cum AS (
           SELECT w_ms, g2, lo,
             sum(c) OVER (PARTITION BY w_ms, g2 ORDER BY lo) AS cum,
             sum(c) OVER (PARTITION BY w_ms, g2) AS n
           FROM b
         )
         SELECT w_ms AS window_start_ms, g2 AS event_type,
           CAST(max(n) AS BIGINT) AS n,
           min(CASE WHEN cum >= ceil(0.5 * CAST(n AS DOUBLE)) THEN lo END) / 100.0 AS p50_est,
           min(CASE WHEN cum >= ceil(0.95 * CAST(n AS DOUBLE)) THEN lo END) / 100.0 AS p95_est,
           min(CASE WHEN cum >= ceil(0.99 * CAST(n AS DOUBLE)) THEN lo END) / 100.0 AS p99_est
         FROM cum GROUP BY 1, 2 ORDER BY 1, 2""",

    // store-served range percentiles ≡ the plain per-group walk over
    // the raw events whose WINDOW lands in [Jan 8, Jan 15) — merging
    // window partials by addition is exactly restricting the input
    "q_loghist_store" ->
      """WITH v AS (
           SELECT event_type AS g,
                  CAST(floor(value * 100) AS BIGINT) AS nq
           FROM events
           WHERE value IS NOT NULL
             AND (epoch_ms(ts) // 3600000) * 3600000 >= 1704672000000
             AND (epoch_ms(ts) // 3600000) * 3600000 < 1705276800000
         ), k AS (
           SELECT g, nq, abs(nq) AS an, length(bin(abs(nq))) AS e FROM v
         ), w AS (
           SELECT g, nq, an,
             CASE WHEN e <= 6 THEN 1.0
                  ELSE pow(2, CAST(e - 6 AS DOUBLE)) END AS wd
           FROM k
         ), b AS (
           SELECT g,
             CASE WHEN nq = 0 THEN 0.0
                  WHEN nq > 0 THEN floor(CAST(an AS DOUBLE) / wd) * wd
                  ELSE -(floor(CAST(an AS DOUBLE) / wd) * wd + wd)
             END AS lo,
             count(*) AS c
           FROM w GROUP BY 1, 2
         ), cum AS (
           SELECT g, lo,
             sum(c) OVER (PARTITION BY g ORDER BY lo) AS cum,
             sum(c) OVER (PARTITION BY g) AS n
           FROM b
         )
         SELECT g AS event_type, CAST(max(n) AS BIGINT) AS n,
           min(CASE WHEN cum >= ceil(0.5 * CAST(n AS DOUBLE)) THEN lo END) / 100.0 AS p50_est,
           min(CASE WHEN cum >= ceil(0.95 * CAST(n AS DOUBLE)) THEN lo END) / 100.0 AS p95_est,
           min(CASE WHEN cum >= ceil(0.99 * CAST(n AS DOUBLE)) THEN lo END) / 100.0 AS p99_est
         FROM cum GROUP BY g ORDER BY g""",

    // the q_loghist_store serving replay over the retained range, plus
    // the expired-partition count recomputed from the raw events'
    // day-window ends — equal iff the sweep dropped exactly the expired
    // windows and serving never read them
    "q_store_retention" ->
      """WITH v AS (
           SELECT event_type AS g,
                  CAST(floor(value * 100) AS BIGINT) AS nq
           FROM events
           WHERE value IS NOT NULL
             AND (epoch_ms(ts) // 3600000) * 3600000 >= 1704672000000
             AND (epoch_ms(ts) // 3600000) * 3600000 < 1705276800000
         ), k AS (
           SELECT g, nq, abs(nq) AS an, length(bin(abs(nq))) AS e FROM v
         ), w AS (
           SELECT g, nq, an,
             CASE WHEN e <= 6 THEN 1.0
                  ELSE pow(2, CAST(e - 6 AS DOUBLE)) END AS wd
           FROM k
         ), b AS (
           SELECT g,
             CASE WHEN nq = 0 THEN 0.0
                  WHEN nq > 0 THEN floor(CAST(an AS DOUBLE) / wd) * wd
                  ELSE -(floor(CAST(an AS DOUBLE) / wd) * wd + wd)
             END AS lo,
             count(*) AS c
           FROM w GROUP BY 1, 2
         ), cum AS (
           SELECT g, lo,
             sum(c) OVER (PARTITION BY g ORDER BY lo) AS cum,
             sum(c) OVER (PARTITION BY g) AS n
           FROM b
         ), exp AS (
           SELECT CAST(count(DISTINCT (epoch_ms(ts) // 86400000) * 86400000)
             AS BIGINT) AS n_dropped
           FROM events
           WHERE value IS NOT NULL
             AND (epoch_ms(ts) // 86400000) * 86400000 + 86400000 <= 1704672000000
         )
         SELECT g AS event_type, CAST(max(n) AS BIGINT) AS n,
           min(CASE WHEN cum >= ceil(0.5 * CAST(n AS DOUBLE)) THEN lo END) / 100.0 AS p50_est,
           min(CASE WHEN cum >= ceil(0.95 * CAST(n AS DOUBLE)) THEN lo END) / 100.0 AS p95_est,
           min(CASE WHEN cum >= ceil(0.99 * CAST(n AS DOUBLE)) THEN lo END) / 100.0 AS p99_est,
           (SELECT n_dropped FROM exp) AS n_dropped_windows
         FROM cum GROUP BY g ORDER BY g""",

    // store-served range distinct counts ≡ the register walk over the
    // raw events in the range, each event ONCE — the md5-60 idx/rho
    // split at p=12 (restBits=48), per-(group, idx) MAX, raw harmonic
    // finalize with the folded hllConstant(12) literal. The Spark side
    // ingested the even half TWICE; max-merge must make that invisible
    "q_hll_store" -> {
      val c = graft.operators.Sketches.hllConstant(12)
      s"""WITH it AS (
           SELECT event_type, CAST(user_id AS VARCHAR) AS item
           FROM events
           WHERE user_id IS NOT NULL
             AND (epoch_ms(ts) // 3600000) * 3600000 >= 1704672000000
             AND (epoch_ms(ts) // 3600000) * 3600000 < 1705276800000
         ), r AS (
           SELECT event_type, h >> 48 AS idx,
                  h & ((CAST(1 AS BIGINT) << 48) - 1) AS rem
           FROM (SELECT event_type,
                   CAST(concat('0x', substr(md5(item), 1, 15)) AS BIGINT) AS h
                 FROM it)
         ), reg AS (
           SELECT event_type, idx,
             max(CASE WHEN rem = 0 THEN 49
                 ELSE 49 - length(ltrim(bin(rem), '0')) END) AS mrho
           FROM r GROUP BY 1, 2
         ), agg AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_registers_used,
             coalesce(CAST(sum(CAST(1 AS BIGINT) << CAST(49 - mrho AS INT)) AS BIGINT),
               CAST(0 AS BIGINT)) AS s_used
           FROM reg GROUP BY 1
         )
         SELECT event_type, n_registers_used,
           s_used + (4096 - n_registers_used) * (CAST(1 AS BIGINT) << 49) AS s_fixed,
           $c / CAST(s_used + (4096 - n_registers_used) * (CAST(1 AS BIGINT) << 49) AS DOUBLE) AS est_distinct
         FROM agg ORDER BY event_type"""
    },

    // the pair-matrix walk: same register CTE (each event ONCE), per-idx
    // MAX across each group pair = the union's registers, three raw
    // harmonic finalizes, inclusion–exclusion left-associated exactly as
    // the Spark column expression evaluates
    "q_hll_overlap" -> {
      val c = graft.operators.Sketches.hllConstant(12)
      s"""WITH it AS (
           SELECT event_type, CAST(user_id AS VARCHAR) AS item
           FROM events
           WHERE user_id IS NOT NULL
             AND (epoch_ms(ts) // 3600000) * 3600000 >= 1704672000000
             AND (epoch_ms(ts) // 3600000) * 3600000 < 1705276800000
         ), r AS (
           SELECT event_type, h >> 48 AS idx,
                  h & ((CAST(1 AS BIGINT) << 48) - 1) AS rem
           FROM (SELECT event_type,
                   CAST(concat('0x', substr(md5(item), 1, 15)) AS BIGINT) AS h
                 FROM it)
         ), reg AS (
           SELECT event_type, idx,
             max(CASE WHEN rem = 0 THEN 49
                 ELSE 49 - length(ltrim(bin(rem), '0')) END) AS mrho
           FROM r GROUP BY 1, 2
         ), gs AS (
           SELECT DISTINCT event_type FROM reg
         ), pr AS (
           SELECT a.event_type AS ga, b.event_type AS gb
           FROM gs a, gs b WHERE a.event_type < b.event_type
         ), ur AS (
           SELECT pr.ga, pr.gb, g.idx, max(g.mrho) AS mrho
           FROM pr JOIN reg g
             ON g.event_type = pr.ga OR g.event_type = pr.gb
           GROUP BY 1, 2, 3
         ), fu AS (
           SELECT ga, gb, CAST(count(*) AS BIGINT) AS nu,
             coalesce(CAST(sum(CAST(1 AS BIGINT) << CAST(49 - mrho AS INT)) AS BIGINT),
               CAST(0 AS BIGINT)) AS su
           FROM ur GROUP BY 1, 2
         ), fg AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
             coalesce(CAST(sum(CAST(1 AS BIGINT) << CAST(49 - mrho AS INT)) AS BIGINT),
               CAST(0 AS BIGINT)) AS sg
           FROM reg GROUP BY 1
         ), eg AS (
           SELECT event_type,
             $c / CAST(sg + (4096 - ng) * (CAST(1 AS BIGINT) << 49) AS DOUBLE) AS est
           FROM fg
         ), eu AS (
           SELECT ga, gb,
             $c / CAST(su + (4096 - nu) * (CAST(1 AS BIGINT) << 49) AS DOUBLE) AS est_union
           FROM fu
         )
         SELECT eu.ga AS group_a, eu.gb AS group_b,
           ea.est AS est_a, eb.est AS est_b, eu.est_union,
           ea.est + eb.est - eu.est_union AS est_overlap
         FROM eu
         JOIN eg ea ON ea.event_type = eu.ga
         JOIN eg eb ON eb.event_type = eu.gb
         ORDER BY 1, 2"""
    },

    // the bracket walk: rebuild the centered buckets over the range
    // (each event once), recover each bucket's covered quantized span
    // from its edge (positive: bitlength(lo); negative:
    // bitlength(|lo|−1)), then the two bounded sums per threshold
    "q_loghist_cdf" ->
      """WITH v AS (
           SELECT event_type AS g,
             CAST(floor((value - 250.0) * 100) AS BIGINT) AS nq
           FROM events
           WHERE value IS NOT NULL
             AND (epoch_ms(ts) // 3600000) * 3600000 >= 1704672000000
             AND (epoch_ms(ts) // 3600000) * 3600000 < 1705276800000
         ), k AS (
           SELECT g, nq, abs(nq) AS an, length(bin(abs(nq))) AS e FROM v
         ), w AS (
           SELECT g, nq, an,
             CASE WHEN e <= 6 THEN 1.0
                  ELSE pow(2, CAST(e - 6 AS DOUBLE)) END AS wd
           FROM k
         ), b AS (
           SELECT g,
             CASE WHEN nq = 0 THEN 0.0
                  WHEN nq > 0 THEN floor(CAST(an AS DOUBLE) / wd) * wd
                  ELSE -(floor(CAST(an AS DOUBLE) / wd) * wd + wd)
             END AS lo,
             count(*) AS c
           FROM w GROUP BY 1, 2
         ), cls AS (
           SELECT g, c, lo,
             CASE WHEN e2 <= 6 THEN 1.0
                  ELSE pow(2, CAST(e2 - 6 AS DOUBLE)) END AS w2
           FROM (
             SELECT g, c, lo,
               CASE WHEN lo > 0 THEN length(bin(CAST(lo AS BIGINT)))
                    WHEN lo < 0 THEN length(bin(CAST(abs(lo) - 1 AS BIGINT)))
                    ELSE 6 END AS e2
             FROM b)
         ), fl AS (
           SELECT g, c,
             CASE WHEN lo >= 0 THEN lo ELSE lo + 1 END AS f,
             CASE WHEN lo > 0 THEN lo + w2 - 1
                  WHEN lo < 0 THEN lo + w2 ELSE 0.0 END AS l
           FROM cls
         )
         SELECT g AS event_type, CAST(sum(c) AS BIGINT) AS n,
           CAST(sum(CASE WHEN l <= floor(-100.0 * 100) THEN c ELSE 0 END) AS DOUBLE) / sum(c) AS le_m100_0_lo,
           CAST(sum(CASE WHEN f <= floor(-100.0 * 100) THEN c ELSE 0 END) AS DOUBLE) / sum(c) AS le_m100_0_hi,
           CAST(sum(CASE WHEN l <= floor(0.0 * 100) THEN c ELSE 0 END) AS DOUBLE) / sum(c) AS le_0_0_lo,
           CAST(sum(CASE WHEN f <= floor(0.0 * 100) THEN c ELSE 0 END) AS DOUBLE) / sum(c) AS le_0_0_hi,
           CAST(sum(CASE WHEN l <= floor(150.0 * 100) THEN c ELSE 0 END) AS DOUBLE) / sum(c) AS le_150_0_lo,
           CAST(sum(CASE WHEN f <= floor(150.0 * 100) THEN c ELSE 0 END) AS DOUBLE) / sum(c) AS le_150_0_hi
         FROM fl GROUP BY g ORDER BY g""",

    // the weighted walk: identical bucket arithmetic at quantScale=1,
    // counts replaced by per-bucket weight sums (n = total weight)
    "q_loghist_weighted" ->
      """WITH v AS (
           SELECT lang AS g,
                  CAST(floor(CAST(n_chars AS DOUBLE) * 1.0) AS BIGINT) AS nq,
                  CAST(n_chars AS BIGINT) AS wt
           FROM documents WHERE n_chars IS NOT NULL
         ), k AS (
           SELECT g, nq, wt, abs(nq) AS an, length(bin(abs(nq))) AS e FROM v
         ), w AS (
           SELECT g, nq, wt, an,
             CASE WHEN e <= 6 THEN 1.0
                  ELSE pow(2, CAST(e - 6 AS DOUBLE)) END AS wd
           FROM k
         ), b AS (
           SELECT g,
             CASE WHEN nq = 0 THEN 0.0
                  WHEN nq > 0 THEN floor(CAST(an AS DOUBLE) / wd) * wd
                  ELSE -(floor(CAST(an AS DOUBLE) / wd) * wd + wd)
             END AS lo,
             sum(coalesce(wt, 0)) AS c
           FROM w GROUP BY 1, 2
         ), cum AS (
           SELECT g, lo,
             sum(c) OVER (PARTITION BY g ORDER BY lo) AS cum,
             sum(c) OVER (PARTITION BY g) AS n
           FROM b
         )
         SELECT g AS lang, CAST(max(n) AS BIGINT) AS n,
           min(CASE WHEN cum >= ceil(0.5 * CAST(n AS DOUBLE)) THEN lo END) / 1.0 AS p50_est,
           min(CASE WHEN cum >= ceil(0.95 * CAST(n AS DOUBLE)) THEN lo END) / 1.0 AS p95_est,
           min(CASE WHEN cum >= ceil(0.99 * CAST(n AS DOUBLE)) THEN lo END) / 1.0 AS p99_est
         FROM cum GROUP BY g ORDER BY g""",

    // replay of the fixed-width histogram walk: identical IEEE double
    // expression order on both sides (bin edge = mn + bin*(mx-mn)/1024.0),
    // so the estimates hash-match bit-for-bit
    "q_binned_quantile" ->
      """WITH s AS (
           SELECT l_returnflag, min(l_extendedprice) AS mn,
                  max(l_extendedprice) AS mx, count(*) AS n
           FROM lineitem GROUP BY l_returnflag
         ), b AS (
           SELECT l.l_returnflag,
             CASE WHEN s.mx = s.mn THEN 0
                  ELSE least(CAST(floor((l.l_extendedprice - s.mn) / (s.mx - s.mn) * 1024) AS BIGINT), 1023) END AS bin,
             count(*) AS c, max(s.mn) AS mn, max(s.mx) AS mx, max(s.n) AS n
           FROM lineitem l JOIN s ON l.l_returnflag IS NOT DISTINCT FROM s.l_returnflag
           GROUP BY 1, 2
         ), c AS (
           SELECT l_returnflag, bin, mn, mx, n,
             CAST(sum(c) OVER (PARTITION BY l_returnflag ORDER BY bin) AS BIGINT) AS cum
           FROM b
         )
         SELECT l_returnflag, max(n) AS n,
           min(CASE WHEN cum >= ceil(0.5 * n) THEN mn + bin * (mx - mn) / 1024.0 END) AS p50_est,
           min(CASE WHEN cum >= ceil(0.95 * n) THEN mn + bin * (mx - mn) / 1024.0 END) AS p95_est
         FROM c GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_sqrt_mix" ->
      """WITH c AS (
           SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY lang
         ), m AS (SELECT min(n_docs) AS mn FROM c)
         SELECT stratum, n_docs,
           sqrt(CAST(mn AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS keep_frac,
           CAST(floor(CAST(n_docs AS DOUBLE) *
             sqrt(CAST(mn AS DOUBLE) / CAST(n_docs AS DOUBLE))) AS BIGINT) AS target_docs
         FROM c, m ORDER BY stratum""",

    // DECIMAL power sums are exact rationals in both engines; the closed
    // form multiplies/subtracts/sqrts/divides in the SAME pinned order
    // (mul binds before sub in both grammars), so corr replays unrounded
    "q_corr" ->
      """WITH a AS (
           SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(l_quantity AS DECIMAL(18,4))) AS sx,
             sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS sy,
             sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS sxx,
             sum(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS syy,
             sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS sxy
           FROM lineitem GROUP BY l_returnflag
         )
         SELECT l_returnflag, n,
           CAST(sx AS DOUBLE) AS sum_x, CAST(sy AS DOUBLE) AS sum_y,
           CASE WHEN sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                 AND sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
             THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             END AS corr
         FROM a ORDER BY l_returnflag""",

    "q_distinct" ->
      """SELECT l_returnflag,
         count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // the salt is plumbing, not semantics: the oracle is the PLAIN join
    "q_salted_join" ->
      """SELECT o.o_orderkey, o.o_custkey AS c_custkey, o.o_totalprice,
           c.c_mktsegment
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         ORDER BY o.o_orderkey""",

    "q_exact_dedup" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_dupes FROM documents
         GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
         ORDER BY doc_id""",

    "q_token_stats" ->
      """SELECT doc_id, length(text) AS n_chars_measured,
         CASE WHEN trim(text) = '' THEN 0
              ELSE length(string_split_regex(trim(text), '\s+')) END AS n_tokens,
         length(list_filter(
           regexp_extract_all(text, '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'),
           t -> NOT regexp_matches(t, '^\s+$'))) AS n_bpe_tokens
         FROM documents ORDER BY doc_id""",

    // the q_token_stats per-doc counts folded per language with the
    // fixed-point ratio convention
    "q_fertility" ->
      """WITH t AS (
           SELECT doc_id, lang, length(text) AS n_chars,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE length(string_split_regex(trim(text), '\s+')) END AS n_words,
             length(list_filter(
               regexp_extract_all(text, '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'),
               x -> NOT regexp_matches(x, '^\s+$'))) AS n_bpe
           FROM documents
         )
         SELECT lang AS stratum,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           CASE WHEN sum(n_chars) > 0 THEN
             round(CAST(sum(n_bpe) AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE), 4)
             ELSE 0.0 END AS bpe_per_char,
           CASE WHEN sum(n_words) > 0 THEN
             round(CAST(sum(n_bpe) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE), 4)
             ELSE 0.0 END AS bpe_per_word
         FROM t GROUP BY lang ORDER BY lang""",

    // the textbook NOT-EXISTS skyline — O(n²) is fine at sf, and it is
    // the semantics the distributed prefix-max cover must reproduce
    "q_pareto" ->
      """WITH s AS (
           SELECT doc_id, n_chars,
             CAST(len(list_distinct(list_filter(
               string_split_regex(trim(text), '\s+'), t -> t <> '')))
               AS BIGINT) AS n_distinct_tokens
           FROM documents
           WHERE n_chars IS NOT NULL AND text IS NOT NULL)
         SELECT p.doc_id, p.n_chars, p.n_distinct_tokens FROM s AS p
         WHERE NOT EXISTS (
           SELECT 1 FROM s AS q
           WHERE q.n_chars >= p.n_chars
             AND q.n_distinct_tokens >= p.n_distinct_tokens
             AND (q.n_chars > p.n_chars
               OR q.n_distinct_tokens > p.n_distinct_tokens))
         ORDER BY p.doc_id""",

    // per-group NOT-EXISTS: dominance only within the same language
    "q_pareto_by" ->
      """WITH s AS (
           SELECT doc_id, lang, n_chars,
             CAST(len(list_distinct(list_filter(
               string_split_regex(trim(text), '\s+'), t -> t <> '')))
               AS BIGINT) AS n_distinct_tokens
           FROM documents
           WHERE n_chars IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL)
         SELECT p.doc_id, p.lang, p.n_chars, p.n_distinct_tokens FROM s AS p
         WHERE NOT EXISTS (
           SELECT 1 FROM s AS q
           WHERE q.lang = p.lang
             AND q.n_chars >= p.n_chars
             AND q.n_distinct_tokens >= p.n_distinct_tokens
             AND (q.n_chars > p.n_chars
               OR q.n_distinct_tokens > p.n_distinct_tokens))
         ORDER BY p.doc_id""",

    "q_quality" ->
      """SELECT doc_id,
         length(text) AS n_chars_measured,
         CASE WHEN trim(text) = '' THEN 0
              ELSE length(string_split_regex(trim(text), '\s+')) END AS n_tokens,
         CASE WHEN trim(text) = '' THEN 0.0 ELSE
           round(CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'), t -> length(t))) AS DOUBLE)
             / length(string_split_regex(trim(text), '\s+')), 4) END AS avg_token_len,
         CASE WHEN trim(text) = '' THEN 0.0 ELSE
           round(CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
               t -> list_contains(['the','a','and','of','to'], t))) AS DOUBLE)
             / length(string_split_regex(trim(text), '\s+')), 4) END AS stopword_ratio,
         CASE WHEN length(text) = 0 THEN 0.0 ELSE
           round(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
             / length(text), 4) END AS alpha_ratio
         FROM documents ORDER BY doc_id""",

    // the trained linear probe replayed END-TO-END: same presence
    // features, same integer fixed-point gradient sums, same
    // float-collapsed step per iteration — TRAINING is part of the
    // verified surface, not just the final scoring pass
    "q_quality_clf" ->
      s"""WITH ${clfCtes(64, 3, "1.0")}
         SELECT d.doc_id, y.y,
           round(CAST(coalesce(zf.z, 0) AS DOUBLE) / ${1L << 20}, 6) AS score
         FROM documents d
         JOIN y USING (doc_id)
         LEFT JOIN zf USING (doc_id)
         ORDER BY d.doc_id""",

    // Mann–Whitney with mid-rank ties as a histogram + strictly-below
    // cumulative: AUC = Σ pos_s·(2·negBelow_s + neg_s) / (2·nPos·nNeg).
    // DuckDB's BIGINT sums promote to HUGEINT — the same 128-bit
    // arithmetic the Spark side runs as decimal(38,0)
    "q_roc_auc" ->
      """WITH h AS (
           SELECT CAST(n_chars AS DOUBLE) AS s,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS neg
           FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
         ), c AS (
           SELECT pos, neg,
             coalesce(sum(neg) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
           FROM h
         )
         SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(neg) AS BIGINT) AS n_neg,
           CASE WHEN sum(pos) = 0 OR sum(neg) = 0 THEN NULL
             ELSE round(CAST(sum(pos * (2 * nb + neg)) AS DOUBLE)
               / (2.0 * sum(pos) * sum(neg)), 6) END AS auc
         FROM c""",

    // identical walk over the binned key floor(n_chars · 0.01)
    "q_roc_auc_binned" ->
      """WITH h AS (
           SELECT floor(CAST(n_chars AS DOUBLE) * 0.01) AS s,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS neg
           FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
         ), c AS (
           SELECT pos, neg,
             coalesce(sum(neg) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
           FROM h
         )
         SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(neg) AS BIGINT) AS n_neg,
           CASE WHEN sum(pos) = 0 OR sum(neg) = 0 THEN NULL
             ELSE round(CAST(sum(pos * (2 * nb + neg)) AS DOUBLE)
               / (2.0 * sum(pos) * sum(neg)), 6) END AS auc
         FROM c""",

    // the grouped walk: identical arithmetic, the cumulative partitioned
    // per source
    "q_roc_auc_by" ->
      """WITH h AS (
           SELECT source, CAST(n_chars AS DOUBLE) AS s,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS neg
           FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
         ), c AS (
           SELECT source, pos, neg,
             coalesce(sum(neg) OVER (PARTITION BY source ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
           FROM h
         )
         SELECT source, CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(neg) AS BIGINT) AS n_neg,
           CASE WHEN sum(pos) = 0 OR sum(neg) = 0 THEN NULL
             ELSE round(CAST(sum(pos * (2 * nb + neg)) AS DOUBLE)
               / (2.0 * sum(pos) * sum(neg)), 6) END AS auc
         FROM c GROUP BY source ORDER BY source""",

    // observed vs marginal-expected agreement; Σ n_a(c)·n_b(c) is an
    // exact integer (HUGEINT ≡ decimal(38,0)), the three divisions are
    // fixed double expressions
    "q_kappa" ->
      """WITH r AS (
           SELECT lang AS a,
             CASE WHEN doc_id % 7 = 0 THEN 'zz' ELSE lang END AS b
           FROM documents WHERE lang IS NOT NULL
         ), base AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
           FROM r
         ), m AS (
           SELECT cat, sum(ca) AS na, sum(cb) AS nb
           FROM (SELECT a AS cat, 1 AS ca, 0 AS cb FROM r
                 UNION ALL SELECT b, 0, 1 FROM r)
           GROUP BY cat
         ), e AS (
           SELECT sum(na * nb) AS es FROM m
         )
         SELECT n,
           round(CAST(agree AS DOUBLE) / n, 6) AS po,
           round(CAST(es AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6) AS pe,
           CASE WHEN CAST(es AS DOUBLE) / (CAST(n AS DOUBLE) * n) = 1.0 THEN NULL
             ELSE round((CAST(agree AS DOUBLE) / n
                 - CAST(es AS DOUBLE) / (CAST(n AS DOUBLE) * n))
               / (1.0 - CAST(es AS DOUBLE) / (CAST(n AS DOUBLE) * n)), 6)
           END AS kappa
         FROM base, e""",

    // the PR walk at tie-collapsed thresholds: descending inclusive
    // cumulatives, precision snapped to the 10⁻¹² grid, integer term sum
    // (HUGEINT ≡ the Spark side's decimal(38,0))
    "q_avg_prec" ->
      """WITH h AS (
           SELECT CAST(n_chars AS DOUBLE) AS s,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS neg
           FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
         ), c AS (
           SELECT pos, neg,
             sum(pos) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
             sum(pos + neg) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca
           FROM h
         ), t AS (
           SELECT pos, neg,
             CAST(floor(1000000000000.0 * (CAST(cp AS DOUBLE) / CAST(ca AS DOUBLE)) + 0.5) AS BIGINT) AS ps
           FROM c
         )
         SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(neg) AS BIGINT) AS n_neg,
           CASE WHEN sum(pos) = 0 THEN NULL
             ELSE round(CAST(sum(pos * ps) AS DOUBLE)
               / (1000000000000.0 * sum(pos)), 6) END AS avg_prec
         FROM t""",

    // decile reliability bands: bin = min(floor(s·10), 9); the mean is
    // the floor(s·10⁶ + 0.5) integer sum divided once — the exact
    // fixed-point the Spark side accumulates
    "q_calibration" ->
      """WITH sc AS (
           SELECT (n_chars % 997) / 996.0 AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM documents WHERE n_chars IS NOT NULL
         )
         SELECT least(CAST(floor(s * 10) AS BIGINT), 9) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS frac_pos,
           round(CAST(sum(CAST(floor(s * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / (1000000.0 * count(*)), 6) AS mean_score
         FROM sc GROUP BY 1 ORDER BY 1""",

    // Brier on the 3dp grid: Σ (⌊s·1000+0.5⌋ − 1000·y)² / (10⁶·n)
    "q_brier" ->
      """WITH sc AS (
           SELECT lang, (n_chars % 997) / 996.0 AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM documents WHERE n_chars IS NOT NULL
         ), t AS (
           SELECT lang,
             CAST(floor(s * 1000 + 0.5) AS BIGINT) - 1000 * y AS d
           FROM sc
         )
         SELECT lang, CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(d * d) AS DOUBLE) / (1000000.0 * count(*)), 6) AS brier
         FROM t GROUP BY lang ORDER BY lang""",

    // count-table cumulative walk replay: the 4dp score domain keeps the
    // per-stratum count table tiny; nearest-rank value = smallest v whose
    // cumulative count reaches floor((n-1)p)+1; DECIMAL-quantized clipped
    // mean, one rounded division
    "q_winsorize" ->
      """WITH q AS (
           SELECT lang AS stratum,
             CASE WHEN length(text) = 0 THEN 0.0 ELSE
               round(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                 / length(text), 4) END AS v
           FROM documents
         ), c AS (
           SELECT stratum, v, CAST(count(*) AS BIGINT) AS c FROM q GROUP BY stratum, v
         ), cc AS (
           SELECT stratum, v, c,
             sum(c) OVER (PARTITION BY stratum ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(c) OVER (PARTITION BY stratum) AS n
           FROM c
         ), b AS (
           SELECT stratum,
             min(CASE WHEN cum >= floor((n - 1) * 5 / 100) + 1 THEN v END) AS lo,
             min(CASE WHEN cum >= floor((n - 1) * 95 / 100) + 1 THEN v END) AS hi
           FROM cc GROUP BY stratum
         )
         SELECT q.stratum, CAST(count(*) AS BIGINT) AS n, b.lo, b.hi,
           CAST(sum(CASE WHEN q.v < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
           CAST(sum(CASE WHEN q.v > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
           round(CAST(sum(CAST(least(greatest(q.v, b.lo), b.hi) AS DECIMAL(18,4))) AS DOUBLE)
             / count(*), 6) AS mean_winsorized
         FROM q JOIN b USING (stratum)
         GROUP BY q.stratum, b.lo, b.hi ORDER BY stratum"""
  )
}
