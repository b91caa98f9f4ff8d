package graft
package queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, CacheRegistry, Cdc, Dedup, Eval, Events, Graph, HllStore, Index, Linkage, Multimodal, Pq, Quantiles, Sampling, Similarity, SketchStore, Sketches, TextAnalysis, Tfidf}
import OracleCtes._
import QueryShared._

/** Oracle-SQL registry, part 4 of 4 (original SparkEntry order;
  * SparkEntry.oracleSql concatenates the parts, duplicate keys fail).
  */
private[graft] object OraclesPart4 {
  val m: Map[String, String] = Map(


    // robust winnowing replay: the (hash, rightmost-pos) selection is ONE
    // integer min over the folded key h*2^20 + (2^20-1-pos); 40-bit
    // md5-prefix hash, per-doc window of 4, short docs keep their overall
    // min (pos >= least(3, maxpos))
    "q_winnow" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), shs AS (
           SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))
             ELSE [array_to_string(tk, ' ')] END AS s
           FROM toks
         ), e AS (
           SELECT doc_id, unnest(s) AS sh, generate_subscripts(s, 1) - 1 AS pos FROM shs
         ), keyed AS (
           SELECT doc_id, pos,
             CAST(concat('0x', substr(md5(sh), 1, 10)) AS BIGINT) * 1048576
               + (1048575 - pos) AS key
           FROM e
         ), m AS (
           SELECT doc_id, pos,
             min(key) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mk,
             max(pos) OVER (PARTITION BY doc_id) AS mp
           FROM keyed)
         SELECT DISTINCT doc_id,
           CAST(1048575 - (mk % 1048576) AS BIGINT) AS fp_pos,
           CAST(mk // 1048576 AS BIGINT) AS fp_hash
         FROM m WHERE pos >= least(3, mp)
         ORDER BY doc_id, fp_pos""",

    "q_winnow_pairs" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), shs AS (
           SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))
             ELSE [array_to_string(tk, ' ')] END AS s
           FROM toks
         ), e AS (
           SELECT doc_id, unnest(s) AS sh, generate_subscripts(s, 1) - 1 AS pos FROM shs
         ), keyed AS (
           SELECT doc_id, pos,
             CAST(concat('0x', substr(md5(sh), 1, 10)) AS BIGINT) * 1048576
               + (1048575 - pos) AS key
           FROM e
         ), m AS (
           SELECT doc_id, pos,
             min(key) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mk,
             max(pos) OVER (PARTITION BY doc_id) AS mp
           FROM keyed
         ), fp AS (
           SELECT DISTINCT doc_id, CAST(mk // 1048576 AS BIGINT) AS h
           FROM m WHERE pos >= least(3, mp)
         ), link AS (
           SELECT h FROM (SELECT h, count(*) AS nd FROM fp GROUP BY h)
           WHERE nd > 1 AND nd <= 64
         ), sl AS (
           SELECT fp.doc_id, fp.h FROM fp JOIN link USING (h)
         )
         SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           CAST(count(*) AS BIGINT) AS n_shared
         FROM sl a JOIN sl b ON a.h = b.h AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 2
         ORDER BY doc_id_a, doc_id_b""",
    // the portable simhash is replayed bit-for-bit: same md5-hex-prefix
    // token hash (60 bits), same per-bit majority vote, same bit assembly
    "q_simhash_md5" ->
      """WITH t AS (
           SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS tok
           FROM documents
         ), h AS (
           SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM t
         ), v AS (
           SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
           FROM h CROSS JOIN (SELECT unnest(range(60)) AS i) bits
           GROUP BY doc_id, i
         ), s AS (
           SELECT doc_id,
             CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END) AS BIGINT) AS sh
           FROM v GROUP BY doc_id
         )
         SELECT d.doc_id, CAST(coalesce(s.sh, 0) AS BIGINT) AS simhash
         FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
         ORDER BY d.doc_id""",

    // portable MinHash signatures replayed exactly: same string shingles
    // as the jaccard oracle, one md5 per shingle split into two 56-bit
    // halves a/b, permutation p = min(a + p*b) (Kirsch–Mitzenmacher)
    "q_minhash_md5" -> {
      val scols = (0 until 8).map(p =>
        s"""CAST(min(a + $p * b) AS BIGINT) AS s$p""")
        .mkString(",\n           ")
      s"""WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS tk
           FROM documents
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
         )
         SELECT doc_id,
           $scols
         FROM ab GROUP BY doc_id ORDER BY doc_id"""
    },

    // the FULL portable LSH candidate path replayed: same md5 a+p*b
    // signatures as q_minhash_md5, band bucket = md5 of band id + the
    // band's signature values as decimal strings, candidates = bucket
    // collisions (a < b, distinct), estimate = matching-permutation
    // fraction. est values are k/16 — exact binary fractions, so the
    // round(,4) is engine-safe.
    "q_minhash_neardup" ->
      s"""WITH ${lshCandidateCtes(16, 4)}
         SELECT doc_id_a, doc_id_b, est_jaccard FROM est
         WHERE est_jaccard >= 0.5
         ORDER BY doc_id_a, doc_id_b""",

    // seed-store + append + store read-back (q_lsh_append): bucketing and
    // signatures are pure per-row functions of the doc, so the engine's
    // incremental chain must equal the cold candidate path over the whole
    // table — the SAME replay as q_minhash_neardup is the truth
    "q_lsh_append" ->
      s"""WITH ${lshCandidateCtes(16, 4)}
         SELECT doc_id_a, doc_id_b, est_jaccard FROM est
         WHERE est_jaccard >= 0.5
         ORDER BY doc_id_a, doc_id_b""",

    // takedown replay, near-dup store: the q_minhash_neardup candidate
    // chain over SURVIVORS only — the engine's forget→compact must
    // leave a store whose pair set equals this cold rebuild without
    // the forgotten docs (no pair with a forgotten endpoint survives)
    "q_forget_lsh" ->
      s"""WITH ${lshCandidateCtes(16, 4, " WHERE doc_id % 7 <> 3")}
         SELECT doc_id_a, doc_id_b, est_jaccard FROM est
         WHERE est_jaccard >= 0.5
         ORDER BY doc_id_a, doc_id_b""",

    // ingest-dedup replay: the union pair set at the 0.5 cut, read from
    // each odd doc's side — store partners are even ids, smaller-id
    // batch partners implement keep-first; a doc survives (in_store)
    // iff it drew neither kind of partner, which is exactly what the
    // engine reads back from the post-append sigs sidecar
    "q_ingest_dedup" ->
      s"""WITH ${lshCandidateCtes(16, 4)},
         p AS (
           SELECT doc_id_a, doc_id_b FROM est WHERE est_jaccard >= 0.5
         ), sym AS (
           SELECT doc_id_b AS doc_id, doc_id_a AS partner FROM p
           UNION ALL
           SELECT doc_id_a AS doc_id, doc_id_b AS partner FROM p
         ), flags AS (
           SELECT doc_id,
             CAST(sum(CASE WHEN partner % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_store_dups,
             CAST(sum(CASE WHEN partner % 2 = 1 AND partner < doc_id
               THEN 1 ELSE 0 END) AS BIGINT) AS n_batch_dups
           FROM sym WHERE doc_id % 2 = 1 GROUP BY doc_id
         )
         SELECT d.doc_id,
           CAST(coalesce(f.n_store_dups, 0) AS BIGINT) AS n_store_dups,
           CAST(coalesce(f.n_batch_dups, 0) AS BIGINT) AS n_batch_dups,
           (coalesce(f.n_store_dups, 0) > 0 OR coalesce(f.n_batch_dups, 0) > 0)
             AS dropped,
           (coalesce(f.n_store_dups, 0) = 0 AND coalesce(f.n_batch_dups, 0) = 0)
             AS in_store
         FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
         LEFT JOIN flags f USING (doc_id)
         ORDER BY d.doc_id""",

    // the LSH candidate path AND the exact-jaccard truth in one chain:
    // recall/precision are counts of their join — the two CTE families
    // are the proven q_minhash_neardup and q_ngram_jaccard machinery
    "q_lsh_recall" ->
      s"""WITH ${lshCandidateCtes(16, 4)},
         found AS (
           SELECT doc_id_a, doc_id_b FROM est WHERE est_jaccard >= 0.5
         ), exactp AS (
           SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
           FROM shs a JOIN shs b ON a.doc_id < b.doc_id
           WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) >= 0.5
         ), c AS (
           SELECT
             (SELECT count(*) FROM exactp) AS exact_pairs,
             (SELECT count(*) FROM found) AS lsh_pairs,
             (SELECT count(*) FROM found f JOIN exactp e
                ON f.doc_id_a = e.doc_id_a AND f.doc_id_b = e.doc_id_b) AS hit_pairs
         )
         SELECT CAST(exact_pairs AS BIGINT) AS exact_pairs,
           CAST(lsh_pairs AS BIGINT) AS lsh_pairs,
           CAST(hit_pairs AS BIGINT) AS hit_pairs,
           CASE WHEN exact_pairs > 0
             THEN CAST(hit_pairs AS DOUBLE) / CAST(exact_pairs AS DOUBLE)
             ELSE 1.0 END AS recall,
           CASE WHEN lsh_pairs > 0
             THEN CAST(hit_pairs AS DOUBLE) / CAST(lsh_pairs AS DOUBLE)
             ELSE 1.0 END AS lsh_precision
         FROM c""",

    // same candidate path at the lower 0.25 cut, verified with integer
    // Levenshtein — the classic DP, bit-identical in every engine
    "q_edit_neardup" ->
      s"""WITH ${lshCandidateCtes(16, 4)}
         SELECT doc_id_a, doc_id_b,
           CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
         FROM est
         JOIN documents da ON da.doc_id = doc_id_a
         JOIN documents db ON db.doc_id = doc_id_b
         WHERE est_jaccard >= 0.25
           AND levenshtein(da.text, db.text) <= 64
         ORDER BY doc_id_a, doc_id_b""",

    "q_repetition" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), bg AS (
           SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bg
           FROM toks WHERE len(tk) >= 2
         ), m AS (
           SELECT doc_id, max(c) AS mx, CAST(sum(c) AS BIGINT) AS total FROM (
             SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg) t
           GROUP BY doc_id
         )
         SELECT t.doc_id AS doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
           CASE WHEN len(tk) > 0
                THEN round(1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 4)
                ELSE 0.0 END AS dup_token_frac,
           coalesce(round(CAST(m.mx AS DOUBLE) / m.total, 4), 0.0) AS top_bigram_frac
         FROM toks t LEFT JOIN m ON t.doc_id = m.doc_id
         ORDER BY doc_id""",

    // same planted-pii augmentation as the Spark side; patterns are the
    // shared Java/RE2 subset from operators.Pii
    "q_pii" -> {
      import operators.Pii.{EmailRe, Ipv4Re, PhoneRe}
      s"""WITH aug AS (
           SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN
               text || ' contact user' || CAST(doc_id AS VARCHAR) ||
               '@example.com or 555-123-4567 at 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
             ELSE text END AS text
           FROM documents
         )
         SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
             '$EmailRe', '<EMAIL>', 'g'),
             '$Ipv4Re', '<IP>', 'g'),
             '$PhoneRe', '<PHONE>', 'g') AS text_redacted,
           CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT) AS n_ips
         FROM aug ORDER BY doc_id"""
    },

    // same md5-bucket arithmetic as q_split, with a per-stratum cut
    "q_stratified" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS b,
             CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2500 WHEN 'fr' THEN 1000
                       ELSE 10000 END AS cut
           FROM documents) t
         WHERE b < cut ORDER BY doc_id""",

    // chunk windows as q_chunks, then one global ordered prefix sum — the
    // oracle's single window replays the engine's two-level distributed scan
    "q_pack" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), c AS (
           SELECT doc_id, tk,
             unnest(range(0, CAST(ceil(greatest(len(tk) - 64, 0) / 48.0) AS INT) + 1)) AS cid
           FROM toks
         ), ch AS (
           SELECT doc_id, CAST(cid AS INT) AS chunk_id,
             CAST(len(tk[cid*48 + 1 : cid*48 + 64]) AS BIGINT) AS n_chunk_tokens
           FROM c
         ), o AS (
           SELECT doc_id, chunk_id, n_chunk_tokens,
             coalesce(CAST(sum(n_chunk_tokens) OVER (ORDER BY doc_id, chunk_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS global_offset
           FROM ch
         )
         SELECT doc_id, chunk_id, n_chunk_tokens, global_offset,
           CAST(global_offset // 256 AS BIGINT) AS seq_id
         FROM o ORDER BY doc_id, chunk_id""",

    // shard export replayed: same exclusive token-offset scan, shard =
    // offset // ceil(total/8), manifest digests as bit_xor over each
    // doc's 56-bit md5 half — byte-equal iff the engine's assignment,
    // write, and read-back all preserved the corpus exactly
    "q_publish_shards" ->
      """WITH t AS (
           SELECT doc_id, text,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
           FROM documents
         ), tot AS (
           SELECT sum(n_tokens) AS total FROM t
         ), c AS (
           SELECT doc_id, text, n_tokens,
             coalesce(CAST(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum
           FROM t
         ), a AS (
           SELECT doc_id, text, n_tokens,
             CAST(least(cum // ((total + 7) // 8), 7) AS INT) AS shard_id
           FROM c, tot
         )
         SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           bit_xor(CAST(concat('0x', substr(md5(text), 1, 14)) AS BIGINT)) AS digest
         FROM a GROUP BY shard_id ORDER BY shard_id""",

    // incremental publish replayed: seed assignment = the clamped
    // q_publish_shards scan over doc_id < 250 (budget frozen from the
    // SEED total), appended docs ride their own prefix scan shifted by
    // (max seed shard + 1) · budget — byte-equal iff the engine froze
    // the budget, never rewrote a published shard, and the append
    // landed exactly at the next free shard id
    "q_publish_append" ->
      """WITH t AS (
           SELECT doc_id, text,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
           FROM documents
         ), seed AS (SELECT * FROM t WHERE doc_id < 250
         ), tot AS (SELECT sum(n_tokens) AS total FROM seed
         ), bud AS (SELECT (total + 7) // 8 AS b FROM tot
         ), c1 AS (
           SELECT doc_id, text, n_tokens,
             coalesce(CAST(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum
           FROM seed
         ), a1 AS (
           SELECT doc_id, text, n_tokens,
             CAST(least(cum // (SELECT b FROM bud), 7) AS INT) AS shard_id
           FROM c1
         ), pad AS (
           SELECT (max(shard_id) + 1) * (SELECT b FROM bud) AS p FROM a1
         ), rest AS (SELECT * FROM t WHERE doc_id >= 250
         ), rtot AS (SELECT sum(n_tokens) AS rt FROM rest
         ), c2 AS (
           SELECT doc_id, text, n_tokens,
             coalesce(CAST(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum
           FROM rest
         ), a2 AS (
           SELECT doc_id, text, n_tokens,
             CAST(least(((SELECT p FROM pad) + cum) // (SELECT b FROM bud),
               ((SELECT p FROM pad) + greatest((SELECT rt FROM rtot) - 1, 0))
                 // (SELECT b FROM bud)) AS INT) AS shard_id
           FROM c2
         ), a AS (SELECT * FROM a1 UNION ALL SELECT * FROM a2)
         SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           bit_xor(CAST(concat('0x', substr(md5(text), 1, 14)) AS BIGINT)) AS digest
         FROM a GROUP BY shard_id ORDER BY shard_id""",

    // publish-then-forget: the original q_publish_shards assignment
    // with the forgotten docs removed AFTER assignment — survivors keep
    // their shard ids (the loader-checksum contract), so the replay is
    // the full-corpus prefix scan filtered at the very end
    "q_publish_forget" ->
      """WITH t AS (
           SELECT doc_id, text,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
           FROM documents
         ), tot AS (
           SELECT sum(n_tokens) AS total FROM t
         ), c AS (
           SELECT doc_id, text, n_tokens,
             coalesce(CAST(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum
           FROM t
         ), a AS (
           SELECT doc_id, text, n_tokens,
             CAST(least(cum // ((total + 7) // 8), 7) AS INT) AS shard_id
           FROM c, tot
         )
         SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           bit_xor(CAST(concat('0x', substr(md5(text), 1, 14)) AS BIGINT)) AS digest
         FROM a WHERE doc_id % 11 <> 5
         GROUP BY shard_id ORDER BY shard_id""",

    // the q_pack chain folded into the per-sequence fill report
    "q_pack_stats" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), c AS (
           SELECT doc_id, tk,
             unnest(range(0, CAST(ceil(greatest(len(tk) - 64, 0) / 48.0) AS INT) + 1)) AS cid
           FROM toks
         ), ch AS (
           SELECT doc_id, CAST(cid AS INT) AS chunk_id,
             CAST(len(tk[cid*48 + 1 : cid*48 + 64]) AS BIGINT) AS n_chunk_tokens
           FROM c
         ), o AS (
           SELECT doc_id, chunk_id, n_chunk_tokens,
             coalesce(CAST(sum(n_chunk_tokens) OVER (ORDER BY doc_id, chunk_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS global_offset
           FROM ch
         ), packed AS (
           SELECT n_chunk_tokens, CAST(global_offset // 256 AS BIGINT) AS seq_id FROM o)
         SELECT seq_id, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(n_chunk_tokens) AS BIGINT) AS tokens_used,
           round(CAST(CAST(sum(n_chunk_tokens) AS BIGINT) AS DOUBLE) / 256, 4) AS fill_rate
         FROM packed GROUP BY 1 ORDER BY 1""",

    // hour buckets replayed as integer floor-division on epoch-ms (Spark's
    // window() aligns "1 hour" windows to the epoch)
    "q_event_windows" ->
      """SELECT (epoch_ms(ts) // 3600000) * 3600000 AS window_start_ms,
         event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    // arithmetic mirrored op-for-op; the double constants are interpolated
    // from the SAME Scala computations the operator uses, so the parsed
    // SQL literals are bit-identical doubles
    "q_keyword_scores" -> {
      val terms = Seq("spark", "data", "table")
      val k1 = 1.2; val b = 0.75
      val c1 = (k1 + 1.0).toString; val c2 = (1.0 - b).toString
      val tfcols = terms.map(t =>
        s"CAST(len(list_filter(tk, x -> x = '$t')) AS BIGINT) AS tf_$t")
        .mkString(",\n           ")
      val dfcols = terms.map(t =>
        s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t")
        .mkString(",\n           ")
      val scores = terms.map(t =>
        s"""round((CAST(N AS DOUBLE) - df_$t + 0.5) / (CAST(df_$t AS DOUBLE) + 0.5)
             * (CAST(tf_$t AS DOUBLE) * $c1)
             / (CAST(tf_$t AS DOUBLE) + $k1 * ($c2 + $b * len_ / avg_)), 4) AS score_$t""")
        .mkString(",\n           ")
      s"""WITH perdoc AS (
           SELECT doc_id, CAST(len(tk) AS BIGINT) AS len_,
           $tfcols
           FROM (SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS tk
                 FROM documents) t
         ), stats AS (
           SELECT count(*) AS N, CAST(sum(len_) AS DOUBLE) / count(*) AS avg_,
           $dfcols
           FROM perdoc
         )
         SELECT doc_id,
           $scores
         FROM perdoc CROSS JOIN stats ORDER BY doc_id"""
    },

    "q_corpus_stats" ->
      """SELECT stratum, count(*) AS n_docs,
         CAST(sum(nt) AS BIGINT) AS total_tokens,
         round(CAST(sum(nt) AS DOUBLE) / count(*), 4) AS avg_tokens,
         CAST(sum(CASE WHEN nt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
         FROM (SELECT lang AS stratum,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE length(string_split_regex(trim(text), '\s+')) END AS nt
               FROM documents) t
         GROUP BY stratum ORDER BY stratum""",

    // water-filling arithmetic over per-stratum BIGINT counts — identical
    // double ops in both engines
    "q_mixture_plan" ->
      """WITH counts AS (
           SELECT lang AS stratum, count(*) AS n_docs,
             CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.2 WHEN 'fr' THEN 0.2
                       WHEN 'es' THEN 0.1 ELSE 0.0 END AS target_weight
           FROM documents GROUP BY lang
         ), t AS (
           SELECT min(CAST(n_docs AS DOUBLE) / target_weight) AS tt
           FROM counts WHERE target_weight > 0
         )
         SELECT stratum, n_docs, target_weight,
           round(CASE WHEN target_weight > 0 THEN target_weight * tt / n_docs
                      ELSE 0.0 END, 6) AS keep_frac
         FROM counts CROSS JOIN t ORDER BY stratum""",

    // the integer water level: cross-multiplied cut + floor +
    // largest-remainder — every decision integer, Σ allocation = budget
    "q_waterfill" ->
      """WITH c AS (
           SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n
           FROM documents WHERE lang IS NOT NULL GROUP BY 1
         ), r AS (
           SELECT stratum, n,
             CAST(row_number() OVER (ORDER BY n, stratum) AS BIGINT) AS idx,
             CAST(coalesce(sum(n) OVER (ORDER BY n, stratum
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below,
             CAST((SELECT count(*) FROM c) AS BIGINT) AS k
           FROM c
         ), cut AS (
           SELECT min(idx) AS cut, arg_min(below, idx) AS cb
           FROM r WHERE n * (k - idx + 1) > 400 - below
         ), alloc AS (
           SELECT r.stratum, r.n,
             CASE WHEN cut.cut IS NULL OR r.idx < cut.cut THEN r.n
               ELSE (400 - cut.cb) // (r.k - cut.cut + 1)
                 + CASE WHEN r.idx - cut.cut < (400 - cut.cb) % (r.k - cut.cut + 1)
                     THEN 1 ELSE 0 END END AS a
           FROM r CROSS JOIN cut)
         SELECT stratum, n AS n_docs, CAST(a AS BIGINT) AS allocation,
           a < n AS capped,
           round(CAST(a AS DOUBLE) / n, 6) AS keep_frac
         FROM alloc ORDER BY stratum""",

    // span windows replayed like q_chunks (stride 16, full 32-token
    // windows only), fingerprint = md5 of the window text
    "q_dupspans" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), c AS (
           SELECT doc_id, tk,
             unnest(range(0, CAST(ceil(greatest(len(tk) - 32, 0) / 16.0) AS INT) + 1)) AS cid
           FROM toks
         ), sp AS (
           SELECT doc_id, CAST(cid AS INT) AS chunk_id,
             md5(array_to_string(tk[cid*16 + 1 : cid*16 + 32], ' ')) AS span_md5
           FROM c WHERE len(tk[cid*16 + 1 : cid*16 + 32]) = 32
         ), d AS (
           SELECT span_md5, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_sharing
           FROM sp GROUP BY span_md5 HAVING count(DISTINCT doc_id) > 1
         )
         SELECT doc_id, chunk_id, span_md5, n_docs_sharing
         FROM sp JOIN d USING (span_md5)
         ORDER BY doc_id, chunk_id""",

    // exact-substring spans: stride-1 16-token window md5s, cross-doc
    // buckets, gaps-and-islands merge (break where p - lag(p) > 16) —
    // the verification step is engine-side only (min==max text proof);
    // the oracle's md5 equality is the same statement
    "q_dupspans_exact" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), w AS (
           SELECT doc_id, tk, unnest(range(0, len(tk) - 15)) AS p
           FROM toks WHERE len(tk) >= 16
         ), sp AS (
           SELECT doc_id, CAST(p AS BIGINT) AS p,
             md5(array_to_string(tk[p + 1 : p + 16], ' ')) AS span_md5
           FROM w
         ), d AS (
           SELECT span_md5, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
           FROM sp GROUP BY span_md5 HAVING count(DISTINCT doc_id) > 1
         ), c AS (
           SELECT sp.doc_id, sp.p, d.nd FROM sp JOIN d USING (span_md5)
         ), g AS (
           SELECT doc_id, p, nd,
             CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 16
               THEN 1 ELSE 0 END AS brk
           FROM c
         ), i AS (
           SELECT doc_id, p, nd,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS island
           FROM g
         )
         SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
           CAST(max(p) + 16 AS BIGINT) AS span_end,
           CAST(max(p) + 16 - min(p) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(max(nd) AS BIGINT) AS max_docs_sharing
         FROM i GROUP BY doc_id, island
         ORDER BY doc_id, span_start""",

    // the q_dupspans_exact span chain applied: token positions inside
    // any covered range anti-join away, survivors re-join ordered by
    // position — string_agg(ORDER BY pos) IS the concat_ws replay
    "q_trim_spans" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), w AS (
           SELECT doc_id, tk, unnest(range(0, len(tk) - 15)) AS p
           FROM toks WHERE len(tk) >= 16
         ), sp AS (
           SELECT doc_id, CAST(p AS BIGINT) AS p,
             md5(array_to_string(tk[p + 1 : p + 16], ' ')) AS span_md5
           FROM w
         ), d AS (
           SELECT span_md5 FROM sp GROUP BY span_md5
           HAVING count(DISTINCT doc_id) > 1
         ), c AS (
           SELECT sp.doc_id, sp.p FROM sp JOIN d USING (span_md5)
         ), g AS (
           SELECT doc_id, p,
             CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 16
               THEN 1 ELSE 0 END AS brk
           FROM c
         ), i AS (
           SELECT doc_id, p,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS island
           FROM g
         ), spans AS (
           SELECT doc_id, min(p) AS s, max(p) + 16 AS e
           FROM i GROUP BY doc_id, island
         ), tp AS (
           SELECT doc_id, unnest(tk) AS tok, unnest(range(0, len(tk))) AS pos
           FROM toks
         ), kept AS (
           SELECT tp.doc_id, tp.tok, tp.pos FROM tp
           WHERE NOT EXISTS (SELECT 1 FROM spans v
             WHERE v.doc_id = tp.doc_id AND tp.pos >= v.s AND tp.pos < v.e)
         )
         SELECT t.doc_id,
           coalesce(k.m, md5('')) AS trimmed_md5,
           CAST(len(t.tk) AS BIGINT) AS n_tokens_before,
           CAST(coalesce(k.n, 0) AS BIGINT) AS n_tokens_kept
         FROM toks t LEFT JOIN (
           SELECT doc_id, md5(string_agg(tok, ' ' ORDER BY pos)) AS m,
             count(*) AS n
           FROM kept GROUP BY doc_id) k USING (doc_id)
         ORDER BY t.doc_id""",

    // store probe replay: fingerprints of the WHOLE corpus (seed ∪
    // appended batch) grouped to distinct-doc counts, probed by the
    // five docs' own prints — identical to the engine's store-served
    // answer iff append under frozen geometry equals the cold build
    "q_spanstore" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), w AS (
           SELECT doc_id, tk, unnest(range(0, len(tk) - 15)) AS p
           FROM toks WHERE len(tk) >= 16
         ), sp AS (
           SELECT doc_id, CAST(p AS BIGINT) AS p,
             md5(array_to_string(tk[p + 1 : p + 16], ' ')) AS span_md5
           FROM w
         ), store AS (
           SELECT span_md5, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_store_docs
           FROM sp GROUP BY span_md5
         )
         SELECT pr.doc_id, pr.p, pr.span_md5, store.n_store_docs
         FROM (SELECT * FROM sp WHERE doc_id < 5) pr
         JOIN store USING (span_md5)
         ORDER BY pr.doc_id, pr.p""",

    // takedown replay: the q_spanstore probe chain with the STORE side
    // restricted to surviving docs (doc_id % 7 <> 3) — the engine's
    // tombstone anti-join must make live serving equal this cold-build-
    // without answer; the probe side stays corpus-wide (doc 3 probes as
    // a new batch and its prints count only surviving store docs)
    "q_forget_span" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), w AS (
           SELECT doc_id, tk, unnest(range(0, len(tk) - 15)) AS p
           FROM toks WHERE len(tk) >= 16
         ), sp AS (
           SELECT doc_id, CAST(p AS BIGINT) AS p,
             md5(array_to_string(tk[p + 1 : p + 16], ' ')) AS span_md5
           FROM w
         ), store AS (
           SELECT span_md5, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_store_docs
           FROM sp WHERE doc_id % 7 <> 3 GROUP BY span_md5
         )
         SELECT pr.doc_id, pr.p, pr.span_md5, store.n_store_docs
         FROM (SELECT * FROM sp WHERE doc_id < 5) pr
         JOIN store USING (span_md5)
         ORDER BY pr.doc_id, pr.p""",

    // Bloom sidecar replayed bit-for-bit: m_bits from the seed third's
    // largest per-shard distinct-print count (bitsPerKey 12 × headroom
    // 4, word-rounded, clamped to [1024, 2^26]); per-shard position
    // sets from the md5-half Kirsch–Mitzenmacher family (k = 5) over
    // the seed ∪ appended store prints; maybe = every probe-print
    // position lands in its shard's set; n_dup = the exact print join
    "q_spanstore_bloom" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), w AS (
           SELECT doc_id, tk, unnest(range(0, len(tk) - 15)) AS p
           FROM toks WHERE len(tk) >= 16
         ), spd AS (
           SELECT DISTINCT doc_id,
             md5(array_to_string(tk[p + 1 : p + 16], ' ')) AS span_md5,
             substr(md5(array_to_string(tk[p + 1 : p + 16], ' ')), 1, 1) AS shard
           FROM w
         ), store_prints AS (
           SELECT DISTINCT span_md5, shard FROM spd WHERE doc_id % 3 IN (1, 2)
         ), seed_n AS (
           SELECT count(DISTINCT span_md5) AS n
           FROM spd WHERE doc_id % 3 = 1 GROUP BY shard
         ), mb AS (
           SELECT CAST(least(greatest((12 * 4 * max(n) + 63) // 64 * 64,
             1024), 67108864) AS BIGINT) AS m
           FROM seed_n
         ), ii AS (
           SELECT unnest(range(5)) AS i
         ), store_pos AS (
           SELECT DISTINCT shard,
             (CAST(concat('0x', substr(md5(span_md5), 1, 14)) AS BIGINT)
              + i * CAST(concat('0x', substr(md5(span_md5), 17, 14)) AS BIGINT))
             % (SELECT m FROM mb) AS pos
           FROM store_prints CROSS JOIN ii
         ), probe_prints AS (
           SELECT doc_id, span_md5, shard FROM spd WHERE doc_id % 15 = 0
         ), probe_pos AS (
           SELECT doc_id, span_md5, shard,
             (CAST(concat('0x', substr(md5(span_md5), 1, 14)) AS BIGINT)
              + i * CAST(concat('0x', substr(md5(span_md5), 17, 14)) AS BIGINT))
             % (SELECT m FROM mb) AS pos
           FROM probe_prints CROSS JOIN ii
         ), flg AS (
           SELECT doc_id, span_md5, bool_and(s.pos IS NOT NULL) AS maybe
           FROM probe_pos q LEFT JOIN store_pos s
             ON q.shard = s.shard AND q.pos = s.pos
           GROUP BY doc_id, span_md5
         )
         SELECT p.doc_id,
           CAST(count(DISTINCT p.span_md5) AS BIGINT) AS n_prints,
           CAST(count(DISTINCT CASE WHEN f.maybe THEN p.span_md5 END) AS BIGINT) AS n_maybe,
           CAST(count(DISTINCT CASE WHEN st.span_md5 IS NOT NULL THEN p.span_md5 END) AS BIGINT) AS n_dup
         FROM probe_prints p
         JOIN flg f ON p.doc_id = f.doc_id AND p.span_md5 = f.span_md5
         LEFT JOIN (SELECT DISTINCT span_md5 FROM store_prints) st
           ON p.span_md5 = st.span_md5
         GROUP BY p.doc_id
         ORDER BY p.doc_id""",

    // gauntlet replay: stage 1 is the q_ingest_dedup chain verbatim
    // (union pair set, store partners even, keep-first on odd ids);
    // stage 2 is the q_ingest_curate chain restricted to stage-1
    // survivors (seed prints stay the even docs — stage 2 probes the
    // span store BEFORE any survivor appends land). The whitespace
    // tokenization CTE is shared: the LSH shingles and the span windows
    // both derive from `toks`
    "q_ingest_gauntlet" ->
      s"""WITH ${lshCandidateCtes(16, 4)},
         pr AS (
           SELECT doc_id_a, doc_id_b FROM est WHERE est_jaccard >= 0.8
         ), sym AS (
           SELECT doc_id_b AS doc_id, doc_id_a AS partner FROM pr
           UNION ALL
           SELECT doc_id_a AS doc_id, doc_id_b AS partner FROM pr
         ), flags AS (
           SELECT doc_id,
             CAST(sum(CASE WHEN partner % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_store_dups,
             CAST(sum(CASE WHEN partner % 2 = 1 AND partner < doc_id
               THEN 1 ELSE 0 END) AS BIGINT) AS n_batch_dups
           FROM sym WHERE doc_id % 2 = 1 GROUP BY doc_id
         ), stage1 AS (
           SELECT d.doc_id,
             CAST(coalesce(f.n_store_dups, 0) AS BIGINT) AS n_store_dups,
             CAST(coalesce(f.n_batch_dups, 0) AS BIGINT) AS n_batch_dups,
             (coalesce(f.n_store_dups, 0) > 0 OR coalesce(f.n_batch_dups, 0) > 0)
               AS dedup_dropped
           FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
           LEFT JOIN flags f USING (doc_id)
         ), surv AS (
           SELECT doc_id FROM stage1 WHERE NOT dedup_dropped
         ), w AS (
           SELECT doc_id, tk, unnest(range(0, len(tk) - 15)) AS p
           FROM toks WHERE len(tk) >= 16
         ), sp AS (
           SELECT doc_id, CAST(p AS BIGINT) AS p,
             md5(array_to_string(tk[p + 1 : p + 16], ' ')) AS span_md5
           FROM w
         ), seedp AS (
           SELECT DISTINCT span_md5 FROM sp WHERE doc_id % 2 = 0
         ), hits AS (
           SELECT sp.doc_id, sp.p FROM sp
           JOIN seedp USING (span_md5)
           JOIN surv USING (doc_id)
         ), g AS (
           SELECT doc_id, p,
             CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 16
               THEN 1 ELSE 0 END AS brk
           FROM hits
         ), i AS (
           SELECT doc_id, p,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS island
           FROM g
         ), spans AS (
           SELECT doc_id, min(p) AS s, max(p) + 16 AS e
           FROM i GROUP BY doc_id, island
         ), batch2 AS (
           SELECT t.doc_id, t.tk FROM toks t JOIN surv USING (doc_id)
         ), tp AS (
           SELECT doc_id, unnest(tk) AS tok, unnest(range(0, len(tk))) AS pos
           FROM batch2
         ), kept AS (
           SELECT tp.doc_id, tp.tok, tp.pos FROM tp
           WHERE NOT EXISTS (SELECT 1 FROM spans v
             WHERE v.doc_id = tp.doc_id AND tp.pos >= v.s AND tp.pos < v.e)
         ), curated AS (
           SELECT b.doc_id,
             coalesce(k.txt, '') AS text,
             CAST(len(b.tk) AS BIGINT) AS n_tokens_before,
             CAST(coalesce(k.n, 0) AS BIGINT) AS n_tokens_kept,
             (len(b.tk) = 0 OR
              CAST(coalesce(k.n, 0) AS DOUBLE) / len(b.tk) < 0.3) AS curate_dropped
           FROM batch2 b LEFT JOIN (
             SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt,
               count(*) AS n
             FROM kept GROUP BY doc_id) k USING (doc_id)
         )
         SELECT s1.doc_id, s1.n_store_dups, s1.n_batch_dups, s1.dedup_dropped,
           coalesce(md5(c.text), '') AS curated_md5,
           CAST(coalesce(c.n_tokens_before, -1) AS BIGINT) AS n_tokens_before,
           CAST(coalesce(c.n_tokens_kept, -1) AS BIGINT) AS n_tokens_kept,
           coalesce(c.curate_dropped, false) AS curate_dropped
         FROM stage1 s1 LEFT JOIN curated c USING (doc_id)
         ORDER BY s1.doc_id""",

    // ingest-curate replay: seed prints = even docs' windows; odd-doc
    // windows found in the seed merge to maximal spans (gap > 16
    // breaks an island), covered tokens are cut, docs below the 0.3
    // kept fraction drop, and each survivor's post-append store-print
    // count is recomputed from its TRIMMED text (append guarantees all
    // of a survivor's prints are in the store, so the served count
    // equals the recomputation iff the append landed)
    "q_ingest_curate" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), w AS (
           SELECT doc_id, tk, unnest(range(0, len(tk) - 15)) AS p
           FROM toks WHERE len(tk) >= 16
         ), sp AS (
           SELECT doc_id, CAST(p AS BIGINT) AS p,
             md5(array_to_string(tk[p + 1 : p + 16], ' ')) AS span_md5
           FROM w
         ), seed AS (
           SELECT DISTINCT span_md5 FROM sp WHERE doc_id % 2 = 0
         ), hits AS (
           SELECT sp.doc_id, sp.p FROM sp JOIN seed USING (span_md5)
           WHERE sp.doc_id % 2 = 1
         ), g AS (
           SELECT doc_id, p,
             CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 16
               THEN 1 ELSE 0 END AS brk
           FROM hits
         ), i AS (
           SELECT doc_id, p,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS island
           FROM g
         ), spans AS (
           SELECT doc_id, min(p) AS s, max(p) + 16 AS e
           FROM i GROUP BY doc_id, island
         ), batch AS (
           SELECT doc_id, tk FROM toks WHERE doc_id % 2 = 1
         ), tp AS (
           SELECT doc_id, unnest(tk) AS tok, unnest(range(0, len(tk))) AS pos
           FROM batch
         ), kept AS (
           SELECT tp.doc_id, tp.tok, tp.pos FROM tp
           WHERE NOT EXISTS (SELECT 1 FROM spans v
             WHERE v.doc_id = tp.doc_id AND tp.pos >= v.s AND tp.pos < v.e)
         ), curated AS (
           SELECT b.doc_id,
             coalesce(k.txt, '') AS text,
             CAST(len(b.tk) AS BIGINT) AS n_tokens_before,
             CAST(coalesce(k.n, 0) AS BIGINT) AS n_tokens_kept,
             (len(b.tk) = 0 OR
              CAST(coalesce(k.n, 0) AS DOUBLE) / len(b.tk) < 0.3) AS dropped
           FROM batch b LEFT JOIN (
             SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt,
               count(*) AS n
             FROM kept GROUP BY doc_id) k USING (doc_id)
         ), surv AS (
           SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM curated WHERE NOT dropped
         ), sprints AS (
           SELECT doc_id,
             count(DISTINCT md5(array_to_string(tk[p + 1 : p + 16], ' '))) AS np
           FROM (SELECT doc_id, tk, unnest(range(0, len(tk) - 15)) AS p
                 FROM surv WHERE len(tk) >= 16)
           GROUP BY doc_id
         )
         SELECT c.doc_id, md5(c.text) AS curated_md5, c.n_tokens_before,
           c.n_tokens_kept, c.dropped,
           CAST(coalesce(sp2.np, 0) AS BIGINT) AS n_store_prints
         FROM curated c LEFT JOIN sprints sp2 USING (doc_id)
         ORDER BY c.doc_id""",

    // the planted-prefix derived corpus (tk || tk[1:20]) walked by the
    // same window/bucket/island chain, buckets keyed (doc_id, md5) with
    // HAVING count(*) > 1 — intra-doc occurrences, not cross-doc docs
    "q_selfrep_spans" ->
      """WITH toks AS (
           SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk0
           FROM documents
         ), planted AS (
           SELECT doc_id, tk0 || tk0[1:20] AS tk FROM toks
         ), w AS (
           SELECT doc_id, tk, unnest(range(0, len(tk) - 7)) AS p
           FROM planted WHERE len(tk) >= 8
         ), sp AS (
           SELECT doc_id, CAST(p AS BIGINT) AS p,
             md5(array_to_string(tk[p + 1 : p + 8], ' ')) AS span_md5
           FROM w
         ), d AS (
           SELECT doc_id, span_md5, CAST(count(*) AS BIGINT) AS reps
           FROM sp GROUP BY doc_id, span_md5 HAVING count(*) > 1
         ), c AS (
           SELECT sp.doc_id, sp.p, d.reps
           FROM sp JOIN d USING (doc_id, span_md5)
         ), g AS (
           SELECT doc_id, p, reps,
             CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 8
               THEN 1 ELSE 0 END AS brk
           FROM c
         ), i AS (
           SELECT doc_id, p, reps,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS island
           FROM g
         )
         SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
           CAST(max(p) + 8 AS BIGINT) AS span_end,
           CAST(max(p) + 8 - min(p) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(max(reps) AS BIGINT) AS max_repeats
         FROM i GROUP BY doc_id, island
         ORDER BY doc_id, span_start""",

    "q_span_dup_frac" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), c AS (
           SELECT doc_id, tk,
             unnest(range(0, CAST(ceil(greatest(len(tk) - 32, 0) / 16.0) AS INT) + 1)) AS cid
           FROM toks
         ), sp AS (
           SELECT doc_id, md5(array_to_string(tk[cid*16 + 1 : cid*16 + 32], ' ')) AS span_md5
           FROM c WHERE len(tk[cid*16 + 1 : cid*16 + 32]) = 32
         ), sh AS (
           SELECT span_md5, count(DISTINCT doc_id) AS nd FROM sp GROUP BY span_md5
         ), pd AS (
           SELECT doc_id, count(*) AS n_spans,
             CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
           FROM sp JOIN sh USING (span_md5) GROUP BY doc_id
         )
         SELECT d.doc_id AS doc_id,
           coalesce(pd.n_spans, 0) AS n_spans,
           coalesce(pd.n_dup_spans, 0) AS n_dup_spans,
           coalesce(round(CAST(pd.n_dup_spans AS DOUBLE) / pd.n_spans, 4), 0.0) AS dup_span_frac
         FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
         ORDER BY doc_id""",

    // same md5-bucket arithmetic as q_split with a per-row probability cut
    "q_weighted_sample" ->
      """SELECT doc_id, n_chars FROM documents
         WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000
               < floor(least(greatest(n_chars / 1000.0, 0.0), 1.0) * 10000)
         ORDER BY doc_id""",

    // the q_pagerank chain with shared-span edge weights: out-STRENGTH
    // replaces out-degree, contribution carries w — same fixed point
    "q_pagerank_w" -> {
      val iters = 3
      val Q = 1L << 40
      val iterCtes = (0 until iters).map { i =>
        s"""d$i AS (
           SELECT CAST(coalesce(sum(CAST(floor(rank * $Q + 0.5) AS BIGINT)), 0) AS BIGINT) AS dang
           FROM r$i WHERE node NOT IN (SELECT src FROM od)),
         c$i AS (
           SELECT e.dst, CAST(sum(CAST(floor(r.rank * e.w / od.deg * $Q + 0.5) AS BIGINT)) AS BIGINT) AS s
           FROM e JOIN r$i r ON e.src = r.node JOIN od ON e.src = od.src
           GROUP BY e.dst),
         r${i + 1} AS (
           SELECT n.node,
             (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
             + CAST(0.85 AS DOUBLE) * (CAST(coalesce(c.s, 0) AS DOUBLE) / $Q
               + CAST(d.dang AS DOUBLE) / nn.n / $Q) AS rank
           FROM nodes n LEFT JOIN c$i c ON n.node = c.dst, d$i d, nn)"""
      }.mkString(",\n         ")
      s"""WITH $spanPairWeightedCte, e AS (
           SELECT src, dst, w FROM p
           UNION ALL SELECT dst AS src, src AS dst, w FROM p
         ), nodes AS (
           SELECT DISTINCT node FROM (
             SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)
         ), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         od AS (SELECT src, CAST(sum(w) AS BIGINT) AS deg FROM e GROUP BY src),
         r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM nodes, nn),
         $iterCtes
         SELECT node, rank FROM r$iters ORDER BY node"""
    },

    // the q_sessionize window replay + one grouped aggregate
    "q_session_stats" ->
      """WITH sess AS (
           SELECT event_id, user_id, value, ms,
             CAST(sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ms, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM (SELECT event_id, user_id, value, epoch_ms(ts) AS ms,
                   lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_ms
                 FROM events) t)
         SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
           min(ms) AS start_ms, max(ms) - min(ms) AS duration_ms,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
         FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""",

    // md5-slice replay: first-seen slice per token, ≤slices running sum
    "q_vocab_growth" ->
      """WITH sl AS (
           SELECT doc_id,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 AS slice,
             text FROM documents),
         toks AS (
           SELECT slice, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM sl),
         dc AS (
           SELECT slice, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(tk)) AS BIGINT) AS n_tokens
           FROM toks GROUP BY 1),
         fs AS (
           SELECT tok, min(slice) AS first_slice
           FROM (SELECT slice, unnest(tk) AS tok FROM toks) GROUP BY 1),
         nt AS (
           SELECT first_slice AS slice, CAST(count(*) AS BIGINT) AS new_tokens
           FROM fs GROUP BY 1)
         SELECT dc.slice, dc.n_docs, dc.n_tokens,
           coalesce(nt.new_tokens, 0) AS new_tokens,
           CAST(sum(coalesce(nt.new_tokens, 0)) OVER (ORDER BY dc.slice
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
         FROM dc LEFT JOIN nt USING (slice) ORDER BY slice""",

    // lift replay on the q_lm_score bigram substrate: integer products
    // cast to double once, one global rank with the (w1, w2) tie-break
    "q_collocations" ->
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
           SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_count
           FROM bi GROUP BY 1, 2 HAVING count(*) >= 5
         ), tk2 AS (SELECT unnest(tk) AS tok FROM toks),
         uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tk2 GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tk2)
         SELECT rank, w1, w2, pair_count, c1, c2, lift FROM (
           SELECT bc.w1, bc.w2, bc.pair_count, u1.c AS c1, u2.c AS c2,
             round(CAST(tot.n * bc.pair_count AS DOUBLE)
               / CAST(u1.c * u2.c AS DOUBLE), 4) AS lift,
             row_number() OVER (ORDER BY
               round(CAST(tot.n * bc.pair_count AS DOUBLE)
                 / CAST(u1.c * u2.c AS DOUBLE), 4) DESC, bc.w1 ASC, bc.w2 ASC) AS rank
           FROM bc
           JOIN uc u1 ON bc.w1 = u1.tok
           JOIN uc u2 ON bc.w2 = u2.tok, tot) t
         WHERE rank <= 20 ORDER BY rank""",

    // gini replay: per-(doc, token) counts, windowed doc totals, 8dp
    // squared shares into DECIMAL, the same 1 − Σp² expression
    "q_gini" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), tc AS (
           SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT doc_id, unnest(tk) AS tok FROM toks) GROUP BY 1, 2
         ), tc2 AS (
           SELECT doc_id, c,
             CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
           FROM tc
         ), p AS (
           SELECT doc_id, n,
             CAST(round(CAST(c * c AS DOUBLE) / CAST(n * n AS DOUBLE), 8)
               AS DECIMAL(18,8)) AS p2
           FROM tc2
         ), g AS (
           SELECT doc_id, any_value(n) AS n_tokens,
             round(1.0 - CAST(sum(p2) AS DOUBLE), 6) AS gini_diversity
           FROM p GROUP BY 1)
         SELECT d.doc_id,
           coalesce(g.n_tokens, 0) AS n_tokens,
           coalesce(g.gini_diversity, 0.0) AS gini_diversity
         FROM documents d LEFT JOIN g ON d.doc_id = g.doc_id
         ORDER BY d.doc_id""",

    // transition replay: the q_sessionize lag ordering, counts +
    // windowed row totals, one rounded division
    "q_transitions" ->
      """WITH s AS (
           SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_ms(ts), event_id) AS from_type
           FROM events
         ), c AS (
           SELECT from_type, event_type AS to_type,
             CAST(count(*) AS BIGINT) AS n_transitions
           FROM s WHERE from_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n_transitions,
           round(CAST(n_transitions AS DOUBLE)
             / CAST(sum(n_transitions) OVER (PARTITION BY from_type) AS BIGINT), 4)
             AS p_transition
         FROM c ORDER BY from_type, to_type""",

    // the trigram windows replayed with two leads; the top-20 cut is
    // boundary-exact because ties break on the path itself
    "q_paths" ->
      """WITH t AS (
           SELECT event_type AS step1,
             lead(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY epoch_ms(ts), event_id) AS step2,
             lead(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY epoch_ms(ts), event_id) AS step3
           FROM events)
         SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n
         FROM t WHERE step2 IS NOT NULL AND step3 IS NOT NULL
         GROUP BY step1, step2, step3
         ORDER BY n DESC, step1, step2, step3 LIMIT 20""",

    "q_dwell" ->
      """WITH s AS (
           SELECT user_id, event_type, epoch_ms(ts) AS ts_ms,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_ms(ts), event_id) AS from_type,
             lag(epoch_ms(ts)) OVER (PARTITION BY user_id
               ORDER BY epoch_ms(ts), event_id) AS prev_ms
           FROM events)
         SELECT from_type, event_type AS to_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(ts_ms - prev_ms) AS BIGINT) AS min_gap_ms,
           CAST(max(ts_ms - prev_ms) AS BIGINT) AS max_gap_ms,
           round(CAST(sum(CAST(ts_ms - prev_ms AS DECIMAL(18,0))) AS DOUBLE)
             / count(*), 2) AS avg_gap_ms
         FROM s WHERE from_type IS NOT NULL
         GROUP BY from_type, to_type ORDER BY from_type, to_type""",

    // md5-60 arithmetic replay, mod k instead of the split's buckets
    "q_kfold" ->
      """SELECT doc_id,
           CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 5 AS INT) AS fold
         FROM documents ORDER BY doc_id""",

    // HRW replay: the same md5Token60 score per (key, shard), list argmax
    // with DuckDB's 1-based first-occurrence list_position == Spark's
    // array_position tie-break
    "q_rendezvous" ->
      """WITH sc AS (
           SELECT doc_id, list_transform(range(0, 16), s ->
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)), 1, 15)) AS BIGINT)) AS l
           FROM documents)
         SELECT doc_id, CAST(list_position(l, list_max(l)) - 1 AS INT) AS shard
         FROM sc ORDER BY doc_id""",

    // the full k-means chain + final assignment (the q_semantic_dedup af
    // pattern) + label majority with the same tie-break
    "q_cluster_purity" -> {
      val iters = 2
      s"""WITH ${kmeansCtes(8, iters)},
         af AS (
           SELECT vec_id, c FROM (
             SELECT e.vec_id, c.c,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(e.d, c.e), 6) DESC, c.c) AS rn
             FROM ev e CROSS JOIN cents$iters c) t WHERE rn = 1
         ), lc AS (
           SELECT af.c AS cluster_id, em.label, CAST(count(*) AS BIGINT) AS lcnt
           FROM af JOIN embeddings em ON af.vec_id = em.vec_id GROUP BY 1, 2
         ), tot AS (
           SELECT cluster_id, CAST(sum(lcnt) AS BIGINT) AS n FROM lc GROUP BY 1)
         SELECT cluster_id, n, top_label, n_top,
           round(CAST(n_top AS DOUBLE) / n, 4) AS purity FROM (
           SELECT lc.cluster_id, tot.n, lc.label AS top_label, lc.lcnt AS n_top,
             row_number() OVER (PARTITION BY lc.cluster_id
               ORDER BY lc.lcnt DESC, lc.label ASC) AS r
           FROM lc JOIN tot USING (cluster_id)) t WHERE r = 1
         ORDER BY cluster_id"""
    },

    // drift replay: identical shared-bin assignment and the same
    // rounded-share TVD expression, bit-for-bit IEEE order
    // exact KS: per-value counts, windowed cumulative sums, integer
    // cross-product distances (HUGEINT ≡ the Spark side's decimal(38,0)),
    // one double division at the end
    "q_ks_drift" ->
      """WITH h AS (
           SELECT l_extendedprice AS v,
             CAST(sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
           FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
         t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
             CAST(sum(cb) AS BIGINT) AS n_b FROM h),
         c AS (SELECT v,
             sum(ca) OVER (ORDER BY v) AS cca,
             sum(cb) OVER (ORDER BY v) AS ccb
           FROM h),
         d AS (SELECT c.v,
             abs(CAST(c.cca AS HUGEINT) * t.n_b
               - CAST(c.ccb AS HUGEINT) * t.n_a) AS dn
           FROM c CROSS JOIN t)
         SELECT t.n_a, t.n_b,
           CAST(max(d.dn) AS DOUBLE) AS d_num,
           min(d.v) FILTER (WHERE d.dn = (SELECT max(dn) FROM d)) AS at_value,
           CASE WHEN t.n_a = 0 OR t.n_b = 0 THEN NULL
             ELSE round(CAST(max(d.dn) AS DOUBLE)
               / (CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE)), 6) END AS d_stat
         FROM d CROSS JOIN t GROUP BY t.n_a, t.n_b""",

    "q_drift" ->
      """WITH av AS (
           SELECT l_extendedprice AS v FROM lineitem
           WHERE l_orderkey % 2 = 0 AND l_extendedprice IS NOT NULL),
         bv AS (
           SELECT l_extendedprice AS v FROM lineitem
           WHERE l_orderkey % 2 = 1 AND l_extendedprice IS NOT NULL),
         uni AS (
           SELECT v, CAST(1 AS BIGINT) AS isa FROM av
           UNION ALL SELECT v, CAST(0 AS BIGINT) AS isa FROM bv),
         st AS (
           SELECT min(v) AS mn, max(v) AS mx,
             CAST(sum(isa) AS BIGINT) AS na,
             CAST(sum(1 - isa) AS BIGINT) AS nb
           FROM uni),
         binned AS (
           SELECT CASE WHEN st.mx = st.mn THEN CAST(0 AS BIGINT)
             ELSE least(CAST(floor((v - st.mn) / (st.mx - st.mn) * 64) AS BIGINT),
               CAST(63 AS BIGINT)) END AS bin,
             isa, st.mn, st.mx, st.na, st.nb
           FROM uni, st),
         g AS (
           SELECT bin, CAST(sum(isa) AS BIGINT) AS n_a,
             CAST(sum(1 - isa) AS BIGINT) AS n_b,
             any_value(mn) AS mn, any_value(mx) AS mx,
             any_value(na) AS na, any_value(nb) AS nb
           FROM binned GROUP BY bin)
         SELECT bin,
           mn + bin * (mx - mn) / 64 AS lo,
           mn + (bin + 1) * (mx - mn) / 64 AS hi,
           n_a, n_b,
           round(CAST(n_a AS DOUBLE) / na, 6) AS share_a,
           round(CAST(n_b AS DOUBLE) / nb, 6) AS share_b,
           round(abs(round(CAST(n_a AS DOUBLE) / na, 6)
             - round(CAST(n_b AS DOUBLE) / nb, 6)) / 2, 6) AS tvd_term
         FROM g ORDER BY bin""",

    // exact-integer TVD per source vs corpus: per-term |c_s·N_g − c_g·N_s|
    // sums in HUGEINT (Spark: DECIMAL(38,0)), absent terms fold in closed
    // form (N_g − Σ_{t∈V_s} c_g), one double division rounded 6dp
    "q_vocab_drift" ->
      """WITH tok AS (
           SELECT source,
             unnest(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS t
           FROM documents
         ), bysrc AS (
           SELECT source, t, CAST(count(*) AS BIGINT) AS c_s
           FROM tok GROUP BY source, t
         ), tot AS (
           SELECT source, CAST(sum(c_s) AS BIGINT) AS n_s,
             CAST(count(*) AS BIGINT) AS v_s
           FROM bysrc GROUP BY source
         ), gl AS (
           SELECT t, CAST(sum(c_s) AS BIGINT) AS c_g FROM bysrc GROUP BY t
         ), ng AS (
           SELECT CAST(sum(c_g) AS BIGINT) AS n_g FROM gl
         ), terms AS (
           SELECT b.source,
             sum(abs(CAST(b.c_s AS HUGEINT) * ng.n_g
               - CAST(g.c_g AS HUGEINT) * tt.n_s)) AS a,
             CAST(sum(g.c_g) AS BIGINT) AS bsum
           FROM bysrc b JOIN gl g USING (t) JOIN tot tt USING (source)
           CROSS JOIN ng
           GROUP BY b.source
         )
         SELECT tt.source, tt.n_s AS n_tokens, tt.v_s AS vocab_size,
           round(CAST(te.a + CAST(ng.n_g - te.bsum AS HUGEINT) * tt.n_s AS DOUBLE)
             / (2.0 * CAST(tt.n_s AS DOUBLE) * CAST(ng.n_g AS DOUBLE)), 6) AS tvd
         FROM tot tt JOIN terms te USING (source) CROSS JOIN ng
         ORDER BY source""",

    // first-occurrence novelty per source: string shingles stand in for
    // the engine's 64-bit-hashed ones (set identity and min-doc_id are
    // preserved under the hash), min(doc_id) is the engine-free total
    // order, counts exact, one rounded division
    "q_novelty" ->
      """WITH toks AS (
           SELECT doc_id, source,
             list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), sh AS (
           SELECT doc_id, source, unnest(
             CASE WHEN len(tk) >= 3 THEN
               list_distinct(list_transform(range(1, len(tk) - 1),
                 i -> array_to_string(tk[i:i+2], ' ')))
             ELSE [array_to_string(tk, ' ')] END) AS s
           FROM toks
         ), fs AS (
           SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s
         ), perdoc AS (
           SELECT sh.doc_id, min(sh.source) AS source,
             CAST(count(*) AS BIGINT) AS n_sh,
             CAST(sum(CASE WHEN sh.doc_id = fs.first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
           FROM sh JOIN fs USING (s) GROUP BY sh.doc_id
         )
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_sh) AS BIGINT) AS n_shingles,
           CAST(sum(n_novel) AS BIGINT) AS n_novel,
           round(CAST(sum(n_novel) AS DOUBLE) / CAST(sum(n_sh) AS DOUBLE), 6) AS novelty_rate
         FROM perdoc GROUP BY source ORDER BY source""",

    // c-TF-IDF replay: (group, term) counts, group df, the same
    // rational-idf weight expression, rank window with term tie-break
    "q_cluster_terms" ->
      """WITH toks AS (
           SELECT lang, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), terms AS (
           SELECT lang, unnest(tk) AS term FROM toks
         ), tf AS (
           SELECT lang, term, CAST(count(*) AS BIGINT) AS tf
           FROM terms GROUP BY 1, 2
         ), gdf AS (
           SELECT term, CAST(count(*) AS BIGINT) AS gdf FROM tf GROUP BY 1
         ), ng AS (
           SELECT CAST(count(DISTINCT lang) AS BIGINT) AS n FROM documents
         ), wtd AS (
           SELECT tf.lang, tf.term, tf.tf, gdf.gdf,
             round(CAST(tf.tf AS DOUBLE) *
               (CAST(ng.n + 1 AS DOUBLE) / CAST(gdf.gdf + 1 AS DOUBLE)), 4) AS weight
           FROM tf JOIN gdf USING (term), ng)
         SELECT lang, term, tf, gdf, weight, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY lang
             ORDER BY weight DESC, term ASC) AS rank
           FROM wtd) WHERE rank <= 10
         ORDER BY lang, rank""",

    // containment replay: same string shingles, same df cap, exact
    // shared counts, both per-side ratios
    "q_containment" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), shs AS (
           SELECT doc_id, unnest(CASE WHEN len(tk) >= 3 THEN
               list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))
             ELSE [array_to_string(tk, ' ')] END) AS sh
           FROM toks
         ), sizes AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM shs GROUP BY 1
         ), linking AS (
           SELECT sh FROM (SELECT sh, count(*) AS df FROM shs GROUP BY 1)
           WHERE df > 1 AND df <= 64
         ), slim AS (
           SELECT s.doc_id, s.sh FROM shs s JOIN linking USING (sh)
         ), pairs AS (
           SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             CAST(count(*) AS BIGINT) AS n_shared
           FROM slim a JOIN slim b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT p.doc_id_a, p.doc_id_b, p.n_shared,
           round(CAST(p.n_shared AS DOUBLE) / sa.sz, 4) AS containment_a,
           round(CAST(p.n_shared AS DOUBLE) / sb.sz, 4) AS containment_b
         FROM pairs p
         JOIN sizes sa ON p.doc_id_a = sa.doc_id
         JOIN sizes sb ON p.doc_id_b = sb.doc_id
         WHERE greatest(round(CAST(p.n_shared AS DOUBLE) / sa.sz, 4),
                        round(CAST(p.n_shared AS DOUBLE) / sb.sz, 4)) >= 0.2
         ORDER BY doc_id_a, doc_id_b""",

    // shared-shingle counts recomputed from raw strings (the hashed join
    // side loses nothing — same argument as the jaccard oracle)
    "q_contamination" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), sh AS (
           SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))
             ELSE [array_to_string(tk, ' ')] END AS s
           FROM toks
         ), pe AS (
           SELECT doc_id AS probe_id, unnest(s) AS g FROM sh WHERE doc_id < 20
         ), ce AS (
           SELECT doc_id, unnest(s) AS g FROM sh
         )
         SELECT probe_id, doc_id, CAST(count(*) AS BIGINT) AS n_shared
         FROM pe JOIN ce USING (g) WHERE probe_id <> doc_id
         GROUP BY probe_id, doc_id HAVING count(*) >= 2
         ORDER BY probe_id, doc_id""",

    // the q_contamination chain folded per doc and left-joined back onto
    // the whole corpus: dropped = flagged at all, audit counts carried
    "q_decontaminate" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM documents
         ), sh AS (
           SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))
             ELSE [array_to_string(tk, ' ')] END AS s
           FROM toks
         ), pe AS (
           SELECT doc_id AS probe_id, unnest(s) AS g FROM sh WHERE doc_id < 20
         ), ce AS (
           SELECT doc_id, unnest(s) AS g FROM sh
         ), hits AS (
           SELECT probe_id, doc_id, count(*) AS n_shared
           FROM pe JOIN ce USING (g) WHERE probe_id <> doc_id
           GROUP BY probe_id, doc_id HAVING count(*) >= 2
         ), flagged AS (
           SELECT doc_id, CAST(count(DISTINCT probe_id) AS BIGINT) AS n_probes_hit,
             CAST(max(n_shared) AS BIGINT) AS max_shared
           FROM hits GROUP BY doc_id
         )
         SELECT d.doc_id, f.doc_id IS NOT NULL AS dropped,
           coalesce(f.n_probes_hit, 0) AS n_probes_hit,
           coalesce(f.max_shared, 0) AS max_shared
         FROM documents d LEFT JOIN flagged f USING (doc_id)
         ORDER BY d.doc_id""",

    // the composed pipeline replayed as one recursive CTE: quality gate
    // (same 4dp-rounded ratios as q_quality), exact-dedup keeper set,
    // jaccard pairs + min-label closure (as q_dedup_clusters), then split
    // arithmetic (as q_split) and chunk windows (as q_chunks) over the
    // survivors
    "q_pipeline" ->
      """WITH RECURSIVE q AS (
           SELECT doc_id, text FROM (
             SELECT doc_id, text,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE length(string_split_regex(trim(text), '\s+')) END AS n_tokens,
               CASE WHEN length(text) = 0 THEN 0.0 ELSE
                 round(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                   / length(text), 4) END AS alpha_ratio
             FROM documents) t
           WHERE n_tokens >= 5 AND alpha_ratio >= 0.5
         ), keep1 AS (
           SELECT min(doc_id) AS doc_id FROM q
           GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
         ), d2 AS (
           SELECT q.doc_id, q.text FROM q JOIN keep1 USING (doc_id)
         ), toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM d2
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
           SELECT doc_id, doc_id FROM d2
           UNION
           SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
         ), canon AS (
           SELECT id AS doc_id, min(lbl) AS canonical_id FROM reach GROUP BY id
         ), surv AS (
           SELECT d2.doc_id, d2.text FROM d2
           WHERE d2.doc_id IN (SELECT doc_id FROM canon WHERE doc_id = canonical_id)
         ), tk2 AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM surv
         ), c AS (
           SELECT doc_id, tk,
             unnest(range(0, CAST(ceil(greatest(len(tk) - 64, 0) / 48.0) AS INT) + 1)) AS cid
           FROM tk2
         )
         SELECT doc_id,
           CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val' ELSE 'test' END AS split,
           CAST(cid AS INT) AS chunk_id,
           CAST(len(tk[cid*48 + 1 : cid*48 + 64]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(tk[cid*48 + 1 : cid*48 + 64], ' ') AS chunk_text
         FROM (SELECT *,
                 CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS b
               FROM c) t
         ORDER BY doc_id, chunk_id""",

    // the composed replay: q_pipeline's curation CTE chain, train-split
    // filter on the same md5 bucket arithmetic, then q_pack's flat window
    // cumsum over the surviving chunk rows
    "q_pipeline_pack" ->
      """WITH RECURSIVE q AS (
           SELECT doc_id, text FROM (
             SELECT doc_id, text,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE length(string_split_regex(trim(text), '\s+')) END AS n_tokens,
               CASE WHEN length(text) = 0 THEN 0.0 ELSE
                 round(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                   / length(text), 4) END AS alpha_ratio
             FROM documents) t
           WHERE n_tokens >= 5 AND alpha_ratio >= 0.5
         ), keep1 AS (
           SELECT min(doc_id) AS doc_id FROM q
           GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
         ), d2 AS (
           SELECT q.doc_id, q.text FROM q JOIN keep1 USING (doc_id)
         ), toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM d2
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
           SELECT doc_id, doc_id FROM d2
           UNION
           SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
         ), canon AS (
           SELECT id AS doc_id, min(lbl) AS canonical_id FROM reach GROUP BY id
         ), surv AS (
           SELECT d2.doc_id, d2.text FROM d2
           WHERE d2.doc_id IN (SELECT doc_id FROM canon WHERE doc_id = canonical_id)
         ), tk2 AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM surv
         ), c AS (
           SELECT doc_id, tk,
             unnest(range(0, CAST(ceil(greatest(len(tk) - 64, 0) / 48.0) AS INT) + 1)) AS cid
           FROM tk2
         ), tr AS (
           SELECT doc_id, CAST(cid AS INT) AS chunk_id,
             CAST(len(tk[cid*48 + 1 : cid*48 + 64]) AS BIGINT) AS n_chunk_tokens
           FROM (SELECT *,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS b
                 FROM c) t
           WHERE b < 8000
         ), o AS (
           SELECT doc_id, chunk_id, n_chunk_tokens,
             coalesce(CAST(sum(n_chunk_tokens) OVER (ORDER BY doc_id, chunk_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS global_offset
           FROM tr
         )
         SELECT doc_id, chunk_id, n_chunk_tokens, global_offset,
           CAST(global_offset // 256 AS BIGINT) AS seq_id
         FROM o ORDER BY doc_id, chunk_id""",

    // BM25 replayed exactly: same posting/df/dl/avgdl statistics, the
    // rational idf odds, the exact-binary-fraction saturation constants
    // (2.25 / 0.3125 / 0.9375), 6dp fixed-point contributions summed
    // order-free, 4dp score, row_number tie on doc_id
    "q_bm25" ->
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
           SELECT DISTINCT doc_id AS query_id, term FROM tfc WHERE doc_id < 5
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
         ), scored AS (
           SELECT query_id, doc_id,
             round(CAST(sum(c) AS DOUBLE), 4) AS bm25
           FROM contrib GROUP BY 1, 2
         ), ranked AS (
           SELECT query_id, doc_id, bm25,
             row_number() OVER (PARTITION BY query_id
               ORDER BY bm25 DESC, doc_id) AS rk
           FROM scored
         )
         SELECT query_id, doc_id, bm25, CAST(rk AS INT) AS rank
         FROM ranked WHERE rk <= 10
         ORDER BY query_id, rank""",

    // RM3 feedback replayed: the q_bm25 chain as pass 1, top-5 docs per
    // query become the feedback set, expansion terms = top-10 NEW terms
    // by the uniform-prior relevance model (order-free DECIMAL sums of
    // round(tf/dl, 6), weight desc / term asc), pass 2 re-scores the
    // same pinned saturation with w = 1.0 originals + 0.5 expansions
    // multiplied INSIDE the 6dp round — the engine's exact chain
    "q_bm25_prf" ->
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
           SELECT DISTINCT doc_id AS query_id, term FROM tfc WHERE doc_id < 5
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
         ), ranked AS (
           SELECT query_id, doc_id, bm25,
             row_number() OVER (PARTITION BY query_id
               ORDER BY bm25 DESC, doc_id) AS rk
           FROM scored2
         )
         SELECT query_id, doc_id, bm25, CAST(rk AS INT) AS rank
         FROM ranked WHERE rk <= 10
         ORDER BY query_id, rank""",

    // the q_pipeline_pack curation chain at doc granularity, train
    // split kept, folded into the q_publish_shards manifest tail
    "q_pipeline_publish" ->
      """WITH RECURSIVE q AS (
           SELECT doc_id, text FROM (
             SELECT doc_id, text,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE length(string_split_regex(trim(text), '\s+')) END AS n_tokens,
               CASE WHEN length(text) = 0 THEN 0.0 ELSE
                 round(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                   / length(text), 4) END AS alpha_ratio
             FROM documents) t
           WHERE n_tokens >= 5 AND alpha_ratio >= 0.5
         ), keep1 AS (
           SELECT min(doc_id) AS doc_id FROM q
           GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
         ), d2 AS (
           SELECT q.doc_id, q.text FROM q JOIN keep1 USING (doc_id)
         ), toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
           FROM d2
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
           SELECT doc_id, doc_id FROM d2
           UNION
           SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
         ), canon AS (
           SELECT id AS doc_id, min(lbl) AS canonical_id FROM reach GROUP BY id
         ), surv AS (
           SELECT d2.doc_id, d2.text FROM d2
           WHERE d2.doc_id IN (SELECT doc_id FROM canon WHERE doc_id = canonical_id)
         ), tr AS (
           SELECT doc_id, text FROM (
             SELECT *, CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS b
             FROM surv) t
           WHERE b < 8000
         ), t2 AS (
           SELECT doc_id, text,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
           FROM tr
         ), tot AS (
           SELECT sum(n_tokens) AS total FROM t2
         ), c2 AS (
           SELECT doc_id, text, n_tokens,
             coalesce(CAST(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum
           FROM t2
         ), a AS (
           SELECT doc_id, text, n_tokens,
             CAST(least(cum // ((total + 7) // 8), 7) AS INT) AS shard_id
           FROM c2, tot
         )
         SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           bit_xor(CAST(concat('0x', substr(md5(text), 1, 14)) AS BIGINT)) AS digest
         FROM a GROUP BY shard_id ORDER BY shard_id""",

    // sign-LSH replayed via SERIALIZED hyperplanes: the ±1 plane matrix is
    // data-independent (SignLshBuckets.planeSigns — the exact XXH64 sign
    // chain the codegen'd expression uses), so each (table, bit) plane
    // ships as a 64-char '+'/'-' literal. Projections use a list_reduce
    // LEFT FOLD, matching the expression's sequential double accumulation
    // bit-for-bit; buckets join on (table, bucket) — Spark's
    // xxhash64(bucket, table) join key is a pure re-keying of the same
    // collision set. dim=64 is the embeddings-table vector width.
    "q_embed_lsh_neardup" -> {
      val vals = graft.functions.SignLshBuckets.planeSigns(8, 8, 64)
        .map { case (t, k, pl) => s"($t, $k, '$pl')" }
        .mkString(",\n           ")
      s"""WITH planes(t, k, pl) AS (
           VALUES $vals
         ), e AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
         ), proj AS (
           SELECT vec_id, t, k,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1, len(emb) + 1),
                 d -> CASE WHEN substr(pl, CAST(d AS INT), 1) = '+' THEN emb[d] ELSE -emb[d] END)),
               (acc, x) -> acc + x) AS p
           FROM e CROSS JOIN planes
         ), buckets AS (
           SELECT vec_id, t,
             CAST(sum(CASE WHEN p > 0 THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END) AS BIGINT) AS bucket
           FROM proj GROUP BY vec_id, t
         ), cand AS (
           SELECT DISTINCT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
           FROM buckets a JOIN buckets b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
         )
         SELECT vec_id_a, vec_id_b,
           round(list_cosine_similarity(x.emb, y.emb), 4) AS cos_sim
         FROM cand JOIN e x ON x.vec_id = vec_id_a JOIN e y ON y.vec_id = vec_id_b
         WHERE cos_sim >= 0.3
         ORDER BY vec_id_a, vec_id_b"""
    }
  )
}
