package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline over `documents`.
  *
  * Scale design notes (the point of each choice at 100 TB):
  *   - exact dedup is a single hash-shuffle on the dedup key; keys are
  *     64-bit hashes, never the full text, so shuffled bytes stay small;
  *   - MinHash+LSH bounds the candidate-pair space via band buckets — the
  *     classic shingle→minhash→band→bucket-join pipeline; only bucket
  *     collisions are compared, never all O(n²) pairs;
  *   - SimHash reduces each doc to one 64-bit signature map-side;
  *   - n-gram Jaccard joins docs only on shared shingles (exact for any
  *     pair with jaccard > 0; a frequency cap on stop-shingles is the
  *     standard skew guard, off by default for exactness).
  */
object Dedup {

  /** Why every operator explodes with `explode_outer` + an
    * `isNotNull` guard instead of plain `explode`:
    *
    * `InferFiltersFromGenerate` turns `explode(expr)` into
    * `Filter(size(expr) > 0 AND isnotnull(expr)) + Generate(expr)`, and
    * predicate pushdown sinks that filter below the projections that
    * alias `expr`'s subterms — inlining the ENTIRE array-building
    * expression (tokenize → hash → shingle transform) TWICE more per
    * input row. Measured on the shingle pipeline at sf0.1: 8.5s for the
    * exploded scan vs 0.6s from an attribute source. The rule skips
    * outer generators, and filtering the generator OUTPUT attribute for
    * null restores inner-explode semantics at attribute-comparison cost.
    */
  private[operators] val safeExplodeNote = ()

  /** Unordered id pairs (a < b) from a bucketed id-list table
    * (`ids`: array<long>, pre-sorted). Lists at or under `cutoff` expand
    * inline — one bounded array build per list, no join; longer lists (the
    * skew tail: a hot bucket shared by thousands of ids would materialize
    * n²/2 structs inside ONE row and OOM the executor before it ever
    * skewed) re-explode and pair up through a distributed self-join on
    * `keyCol`. Result is NOT deduplicated across buckets.
    */
  private[operators] def pairsFromIdLists(
      lists: DataFrame, keyCol: String, cutoff: Int): DataFrame = {
    // explode_outer + null guard, NOT explode: plain explode of a computed
    // array makes InferFiltersFromGenerate re-evaluate the whole pair
    // construction two more times per row in a pushed-down filter (see
    // [[safeExplodeNote]])
    val smallPairs = lists.filter(size(col("ids")) <= cutoff)
      .select(explode_outer(flatten(
        transform(sequence(lit(0), size(col("ids")) - 2), i =>
          transform(sequence(i + 1, size(col("ids")) - 1), j =>
            struct(element_at(col("ids"), i + 1).as("doc_id_a"),
              element_at(col("ids"), j + 1).as("doc_id_b")))))).as("p"))
      .filter(col("p").isNotNull)
      .select(col("p.doc_id_a"), col("p.doc_id_b"))
    val bigIds = lists.filter(size(col("ids")) > cutoff)
      .select(col(keyCol), explode(col("ids")).as("id"))
    val bigPairs = bigIds.as("x").join(bigIds.as("y"),
        col(s"x.$keyCol") === col(s"y.$keyCol") && col("x.id") < col("y.id"))
      .select(col("x.id").as("doc_id_a"), col("y.id").as("doc_id_b"))
    smallPairs.union(bigPairs)
  }

  /** Exact dedup on a normalized text key: keep the smallest doc_id per key.
    * groupBy on the key (one shuffle), map-side partial agg for free.
    */
  def exactDedup(docs: DataFrame): DataFrame = {
    val key = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    docs
      .groupBy(key.as("text_key"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dupes"))
      .select(col("doc_id"), col("n_dupes"))
  }

  /** Word k-shingles from a MATERIALIZED tokens column, distinct. Short
    * docs (< k tokens) contribute a single whole-doc shingle so they still
    * participate.
    *
    * `toks` must be a column attribute, not an inline expression: the
    * `slice` inside the transform lambda evaluates its array argument per
    * element, so an inline tokenize would re-run split+filter once per
    * shingle (measured ~3s of pure re-evaluation at sf0.1).
    */
  def shinglesFromTokens(toks: Column, k: Int): Column =
    array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
        .otherwise(array(concat_ws(" ", toks))))

  /** (doc_id, __shingles) with tokens materialized in their own projection
    * (multi-referenced non-cheap aliases block CollapseProject, so the
    * tokenize runs exactly once per row).
    */
  def withShingles(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), shinglesFromTokens(col("__toks"), k).as("__shingles"))

  /** Convenience single-expression form — only for ad-hoc use on small
    * data; operators use [[withShingles]].
    */
  def shingles(text: Column, k: Int): Column =
    shinglesFromTokens(TextAnalysis.tokens(text), k)

  /** (doc_id, sh_set: array<long>) — distinct 64-bit-hashed k-shingles per
    * doc, built WITHOUT materializing shingle strings: tokens are hashed
    * once, a shingle hash is xxhash64 over its k token hashes (~25-char
    * string build + string hash per shingle replaced by a 3-long hash —
    * measured ~40% faster at sf0.1). Tokens can't contain whitespace, so
    * hashed k-tuples are distinct exactly when the joined strings are
    * (modulo 64-bit collisions, ~n²/2⁶⁴ — immaterial near any threshold).
    * Both the token-hash array and the set are materialized attributes —
    * HOF lambdas re-evaluate captured non-attribute subtrees per element.
    */
  def withHashedShingleSets(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        transform(col("__toks"), t => xxhash64(t)).as("__th"))
      .select(col("doc_id"),
        array_distinct(
          when(size(col("__th")) >= k,
            transform(sequence(lit(0), size(col("__th")) - k), i =>
              xxhash64((0 until k).map(j => element_at(col("__th"), i + j + 1)): _*)))
            .otherwise(array(xxhash64(concat_ws(" ", col("__toks"))))))
          .as("sh_set"))

  /** MinHash signatures via explode → partial-aggregated min per
    * permutation. The explode+groupBy shape matters: computing the
    * signature as nested higher-order-function lambdas re-evaluates the
    * whole shingle pipeline once per permutation per element (measured
    * ~1000× slower); here every shingle is materialized once and each
    * permutation is one vectorized `min` with map-side combine, so the
    * shuffle carries numHashes longs per doc.
    */
  /** `fused = false` (default): one codegen'd `min` column per permutation
    * — HashAggregate with map-side combine, fastest for narrow signatures.
    * `fused = true`: the [[graft.functions.MinHashSketch]]
    * TypedImperativeAggregate — one mutable buffer for the whole
    * signature; wins when numHashes is wide (≥ ~64) where the per-column
    * layout and update dispatch of the declarative form dominate.
    * Both produce bit-identical signatures (pinned by OperatorsSpec).
    */
  def minHashSignatures(
      docs: DataFrame,
      numHashes: Int,
      shingleSize: Int,
      fused: Boolean = false): DataFrame = {
    // 64-bit shingle hash once ([[withHashedShingleSets]] — no shingle
    // strings); each permutation re-hashes the 8-byte value (hash
    // composition keeps the family uniform, ~2× cheaper than numHashes
    // string hashes)
    val exploded = withHashedShingleSets(docs, shingleSize)
      .select(col("doc_id"), explode_outer(col("sh_set")).as("h0"))
      .filter(col("h0").isNotNull) // see [[safeExplodeNote]]
    if (fused)
      exploded.groupBy("doc_id")
        .agg(graft.functions.GraftFunctions
          .min_hash_sketch(col("h0"), numHashes).as("sig"))
    else {
      val mins = (0 until numHashes).map(p => min(xxhash64(col("h0"), lit(p))).as(s"__h$p"))
      exploded.groupBy("doc_id")
        .agg(mins.head, mins.tail: _*)
        .select(col("doc_id"),
          array((0 until numHashes).map(p => col(s"__h$p")): _*).as("sig"))
    }
  }

  /** Engine-portable MinHash signatures via Kirsch–Mitzenmacher double
    * hashing ("Less Hashing, Same Performance", ESA'06): ONE md5 per
    * shingle yields two independent 56-bit halves a (hex 1-14) and
    * b (hex 17-30); permutation p hashes s as `a + p·b` — pure int64
    * arithmetic, no overflow for p < 128 (a,b < 2^56), and replayable
    * bit-for-bit by any engine with md5 (q_minhash_md5 oracle). The
    * xxhash64 family ([[minHashSignatures]]) stays the in-engine default;
    * this variant exists for cross-engine verification.
    */
  def minHashSignaturesPortable(
      docs: DataFrame, numHashes: Int, shingleSize: Int): DataFrame = {
    require(numHashes < 128, "a + p*b stays below 2^63 only for p < 128")
    val exploded = withShingles(docs, shingleSize)
      .select(col("doc_id"), explode_outer(col("__shingles")).as("sh"))
      .filter(col("sh").isNotNull) // see [[safeExplodeNote]]
      .withColumn("__m", md5(col("sh")))
      .select(col("doc_id"),
        conv(substring(col("__m"), 1, 14), 16, 10).cast("long").as("__a"),
        conv(substring(col("__m"), 17, 14), 16, 10).cast("long").as("__b"))
    val mins = (0 until numHashes).map(p =>
      min(col("__a") + lit(p.toLong) * col("__b")).as(s"s$p"))
    exploded.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** Portable band buckets (doc_id, bucket) from WIDE-form signatures
    * (columns s0..s{numHashes-1}, the [[minHashSignaturesPortable]]
    * shape): bucket = md5 of the band id and the band's `rows` signature
    * values as decimal strings — deterministic, engine-replayable, and
    * shared verbatim by the one-shot candidate path
    * ([[minHashNearDupPortable]]) and the persisted LSH store
    * ([[LshIndex]]), so seed-then-append ≡ cold-rebuild holds by
    * construction (same function, same inputs).
    */
  private[operators] def portableBandBuckets(
      sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    sigs.select(
      col("doc_id"),
      explode_outer(array((0 until bands).map { b =>
        md5(concat_ws("_",
          lit(b.toString) +:
            ((b * rows) until ((b + 1) * rows))
              .map(i => col(s"s$i").cast("string")): _*))
      }: _*)).as("bucket"))
      .filter(col("bucket").isNotNull) // see [[safeExplodeNote]]
  }

  /** Signature-estimated jaccard for a candidate pair table against
    * WIDE-form signatures: est = matching-permutation fraction, 4dp
    * (exact binary fractions of numHashes — engine-safe rounding).
    * Output: (doc_id_a, doc_id_b, est_jaccard). Shared by
    * [[minHashNearDupPortable]] and the [[LshIndex]] read paths.
    */
  private[operators] def portableEstJaccard(
      candidates: DataFrame, sigs: DataFrame, numHashes: Int): DataFrame = {
    val matches = (0 until numHashes)
      .map(i => when(col(s"__xs$i") === col(s"__ys$i"), 1).otherwise(0))
      .reduce(_ + _)
    val aSigs = sigs.select(col("doc_id").as("doc_id_a") +:
      (0 until numHashes).map(i => col(s"s$i").as(s"__xs$i")): _*)
    val bSigs = sigs.select(col("doc_id").as("doc_id_b") +:
      (0 until numHashes).map(i => col(s"s$i").as(s"__ys$i")): _*)
    candidates
      .join(aSigs, "doc_id_a")
      .join(bSigs, "doc_id_b")
      .select(col("doc_id_a"), col("doc_id_b"),
        round(matches.cast("double") / numHashes, 4).as("est_jaccard"))
  }

  /** MinHash+LSH near-duplicate candidate pairs with signature-estimated
    * jaccard. bands × rowsPerBand == numHashes; a pair lands in the
    * candidate set iff some band's rows all match.
    *
    * Returns (doc_id_a, doc_id_b, est_jaccard) with a < b,
    * est_jaccard >= threshold.
    */
  def minHashNearDup(
      docs: DataFrame,
      numHashes: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      pairListCutoff: Int = 128): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands

    // persisted: the signature pipeline (shingle scan + 16-way min agg)
    // otherwise re-runs for the banding pass and BOTH verification sides.
    // Tracked in CacheRegistry — callers release after consuming.
    val sigs = CacheRegistry.track(minHashSignatures(docs, numHashes, shingleSize)
      .persist(StorageLevel.MEMORY_AND_DISK))

    // band id folded into the bucket hash → one flat join key; the bucket
    // table carries (doc_id, bucket) only — signatures never ride through
    // the candidate join. Each band bucket is one flat xxhash64 over its
    // `rows` signature longs + the band id (bands/rows are compile-time
    // constants, so the hash arg list is static) — equal band slices hash
    // equal, and no per-band string materialization (the previous
    // concat_ws-of-casts built ~bands strings per doc; measured ~20% of the
    // operator at sf0.1).
    val banded = sigs.select(
      col("doc_id"),
      explode(array((0 until bands).map { b =>
        xxhash64(((b * rows) until ((b + 1) * rows))
          .map(i => element_at(col("sig"), i + 1)) :+ lit(b): _*)
      }: _*)).as("bucket"))

    // persisted: both pairsFromIdLists branches (inline expansion + heavy
    // tail self-join) scan the bucket lists — without this the banding
    // groupBy runs twice
    val lists = CacheRegistry.track(banded.groupBy("bucket")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .persist(StorageLevel.MEMORY_AND_DISK))
    val candidates = pairsFromIdLists(lists, "bucket", pairListCutoff).distinct()

    val est = size(filter(zip_with(col("__sig_a"), col("__sig_b"), (x, y) =>
      when(x === y, lit(1)).otherwise(lit(0))), v => v === 1))
      .cast("double") / numHashes
    candidates
      .join(sigs.select(col("doc_id").as("doc_id_a"), col("sig").as("__sig_a")), "doc_id_a")
      .join(sigs.select(col("doc_id").as("doc_id_b"), col("sig").as("__sig_b")), "doc_id_b")
      .select(col("doc_id_a"), col("doc_id_b"), round(est, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** [[minHashNearDup]] on the engine-portable md5 signature family
    * ([[minHashSignaturesPortable]]): band bucket = md5 of the band id and
    * its `rows` signature values rendered as decimal strings — every step
    * (signature, banding, candidate generation, estimate) is replayable
    * bit-for-bit by any engine with md5, so the WHOLE candidate path gets a
    * DuckDB oracle (q_minhash_neardup), not just the signature math.
    *
    * Same scale shape as the xxhash64 default: signatures are computed once
    * and persisted; the bucket table carries (doc_id, bucket) only;
    * candidate pairs are bounded by band-bucket occupancy via
    * [[pairsFromIdLists]]. The md5 family costs one md5 per shingle (vs one
    * xxhash64) and a 32-char bucket key (vs 8 bytes) — the in-engine
    * default remains [[minHashNearDup]]; this variant is the verified twin.
    */
  def minHashNearDupPortable(
      docs: DataFrame,
      numHashes: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      pairListCutoff: Int = 128): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    require(numHashes % bands == 0, "bands must divide numHashes")

    // wide-form signatures (s0..s{n-1}) — persisted: banding and BOTH
    // estimate sides re-read them
    val sigs = CacheRegistry.track(
      minHashSignaturesPortable(docs, numHashes, shingleSize)
        .persist(StorageLevel.MEMORY_AND_DISK))

    val banded = portableBandBuckets(sigs, numHashes, bands)

    val lists = CacheRegistry.track(banded.groupBy("bucket")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .persist(StorageLevel.MEMORY_AND_DISK))
    val candidates = pairsFromIdLists(lists, "bucket", pairListCutoff).distinct()

    portableEstJaccard(candidates, sigs, numHashes)
      .filter(col("est_jaccard") >= threshold)
  }

  /** SimHash over whitespace tokens (term-frequency weighted): hash each
    * token once, majority-vote each of the `bits` signature bits.
    *
    * Explode→aggregate shape for the same reason as
    * [[minHashSignatures]]: one hash per token, then `bits` vectorized
    * conditional sums with map-side combine — the shuffle carries `bits`
    * longs per doc. Docs with no tokens get simhash 0.
    */
  private def simHashOver(
      docs: DataFrame, hashOf: Column => Column, bits: Int): DataFrame = {
    val exploded = docs.select(col("doc_id"),
      explode_outer(TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(col("tok").isNotNull) // see [[safeExplodeNote]]
      .withColumn("__h", hashOf(col("tok")))
    val votes = (0 until bits).map(i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"__b$i"))
    val assembled = exploded.groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until bits).map(i =>
          when(col(s"__b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
    docs.select("doc_id").join(assembled, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("simhash"), lit(0L)).as("simhash"))
  }

  /** 64-bit SimHash on xxhash64 token hashes — the fast in-engine default. */
  def simHashTable(docs: DataFrame): DataFrame =
    simHashOver(docs, xxhash64(_), 64)

  /** Engine-portable 60-bit token hash: the first 15 hex chars of md5,
    * parsed base-16 (15 chars = 60 bits, always positive in a long).
    * md5 is bit-identical everywhere, unlike Spark's xxhash64 seeds.
    */
  def md5Token60(tok: Column): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long")

  /** [[simHashTable]] variant on [[md5Token60]] (60 signature bits) —
    * replayable bit-for-bit by any engine with md5 (DuckDB oracle in
    * SparkEntry), at ~md5 cost per token instead of xxhash64.
    */
  def simHashTablePortable(docs: DataFrame): DataFrame =
    simHashOver(docs, md5Token60, 60)

  /** Exact n-gram (word-shingle) Jaccard similarity pairs >= threshold,
    * via AllPairs/PPJoin-style prefix filtering (Bayardo et al., WWW'07;
    * Xiao et al., WWW'08):
    *
    *   1. shingle sets are hashed to 64-bit (shuffle bytes ~5× smaller; a
    *      cross-doc collision is ~n²/2⁶⁴ — immaterial near any threshold);
    *   2. every doc's shingles are ordered by a GLOBAL total order
    *      (frequency asc, hash asc — rarest first) and only the first
    *      `n - ceil(t·n) + 1` form its prefix. Prefix-filter lemma: if
    *      J(A,B) ≥ t then |A∩B| ≥ t·|A| (union ≥ |A|), and two sets with
    *      |A∩B| ≥ α must share an element within their first |·|-α+1
    *      elements under any common total order — so candidate generation
    *      over PREFIX shingles only is exact (no false negatives);
    *   3. candidates are verified with one `array_intersect` per pair on
    *      the full hashed sets.
    *
    * Stop-shingles sort LAST (frequency asc) and so almost never enter a
    * prefix — the hot-shingle n² blowup of naive shingle-joins disappears
    * for free. Per-shingle id-lists that do survive are expanded inline
    * only below `pairListCutoff` ids (bounding any single generated row to
    * ~cutoff²/2 structs); larger lists go through a distributed self-join
    * (advisor finding, round 1 — a one-row n²/2 array OOMs before it skews).
    *
    * maxShingleFreq (optional) additionally DROPS shingles above the given
    * doc-frequency from the sets themselves — the web-scale stop-shingle
    * guard; makes the measure approximate (None = exact).
    */
  /** Asymmetric containment pairs — |shingles(A) ∩ shingles(B)| over
    * EACH side's own shingle count, both directions per pair. Catches
    * what symmetric Jaccard structurally cannot: a short document quoted
    * whole inside a long one has near-1 containment but tiny Jaccard, so
    * the [[ngramJaccardPairs]] prefix filter correctly (for its
    * contract) prunes it. Quote/excerpt detection is its own operator.
    *
    * Candidates come from shared-shingle co-occurrence with a document-
    * frequency cap (`maxShingleDf`): a shingle in d docs contributes d²
    * pair rows, so boilerplate shingles are excluded from matching —
    * the [[graft.operators.Contamination]] stop-shingle contract; the
    * intersection counts are exact over the SURVIVING shingles (the
    * oracle applies the identical cap), while per-doc sizes count ALL
    * shingles — so the reported containment is a LOWER BOUND of the
    * true ratio, and `maxShingleDf` must scale with corpus duplication
    * (a 10×-replicated corpus inflates every df 10×; at the default cap
    * nothing would survive to match). Output: (doc_id_a, doc_id_b,
    * n_shared, containment_a, containment_b) where
    * max(containment) ≥ threshold.
    */
  /** Data-derived `maxShingleDf` for [[containmentPairs]]: the `quantile`
    * point of the shingle doc-frequency distribution (approx, 1% error —
    * the cap is a fan-out guard, not arithmetic). The containmentPairs
    * doc tells callers to scale the absolute cap with corpus duplication
    * by hand; this derives it instead — replicating a corpus 10× shifts
    * every df 10×, so the quantile (and the cap) shifts with it
    * (ScaleCheck proves the tracking), while boilerplate shingles above
    * the quantile stay excluded at any scale. Floor of 2: a cap below 2
    * can never link a pair.
    */
  def suggestedShingleDfCap(
      docs: DataFrame,
      k: Int = 3,
      quantile: Double = 0.99): Int = {
    require(quantile > 0.0 && quantile < 1.0)
    val df = withShingles(docs, k)
      .select(col("doc_id"), explode_outer(col("__shingles")).as("sh"))
      .filter(col("sh").isNotNull) // safeExplodeNote
      .groupBy("sh").agg(count(lit(1)).cast("double").as("df"))
    math.max(2,
      df.stat.approxQuantile("df", Array(quantile), 0.01).head.toInt)
  }

  def containmentPairs(
      docs: DataFrame,
      k: Int = 3,
      threshold: Double = 0.5,
      maxShingleDf: Int = 64): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    require(threshold > 0.0 && threshold <= 1.0)
    require(maxShingleDf >= 2)
    // (doc_id, sh) — per-doc distinct by construction (shinglesFromTokens
    // array_distincts); persisted: sizes, df, and both join sides read it
    val sh = CacheRegistry.track(withShingles(docs, k)
      .select(col("doc_id"), explode_outer(col("__shingles")).as("sh"))
      .filter(col("sh").isNotNull) // safeExplodeNote
      .persist(StorageLevel.MEMORY_AND_DISK))
    sh.count()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("__sz"))
    val linking = sh.groupBy("sh").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > 1 && col("__df") <= maxShingleDf)
      .select("sh")
    val slim = sh.join(linking, "sh")
    val shared = slim.select(col("sh"), col("doc_id").as("doc_id_a"))
      .join(slim.select(col("sh"), col("doc_id").as("doc_id_b")), "sh")
      .filter(col("doc_id_a") < col("doc_id_b"))
      .groupBy("doc_id_a", "doc_id_b")
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("doc_id").as("doc_id_a"), col("__sz").as("__sza")), "doc_id_a")
      .join(sizes.select(col("doc_id").as("doc_id_b"), col("__sz").as("__szb")), "doc_id_b")
      .select(col("doc_id_a"), col("doc_id_b"), col("n_shared"),
        round(col("n_shared").cast("double") / col("__sza"), 4).as("containment_a"),
        round(col("n_shared").cast("double") / col("__szb"), 4).as("containment_b"))
      .filter(greatest(col("containment_a"), col("containment_b")) >= threshold)
  }

  def ngramJaccardPairs(
      docs: DataFrame,
      shingleSize: Int = 3,
      threshold: Double = 0.8,
      maxShingleFreq: Option[Int] = None,
      pairListCutoff: Int = 128,
      hashOrderPrefix: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel

    // small-input parallelism guard ([[Parallelism.ensure]]): the
    // tokenize+shingle+hash build is the operator's heaviest map work
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val src = Parallelism.ensure(docs)

    // (doc_id, sh_set: array<long>) — distinct hashed shingles per doc.
    // PERSISTED: downstream branches (prefixes, both verification sides)
    // would otherwise re-run the tokenize+shingle+hash scan each —
    // measured 4× the operator's total cost at sf0.1. The set table is
    // tiny relative to the corpus (a few longs per doc-shingle);
    // unreferenced blocks are reclaimed by the ContextCleaner.
    val rawSets = CacheRegistry.track(withHashedShingleSets(src, shingleSize)
      .persist(StorageLevel.MEMORY_AND_DISK))

    // Prefix extraction. The AllPairs prefix filter is LOSSLESS under ANY
    // consistent global order of shingles (the theorem needs only a total
    // order shared by all docs), which gives two implementations:
    //   - rare-first (doc-frequency asc, the classic AllPairs order):
    //     minimizes candidate pairs, at the cost of a corpus frequency
    //     pass, a join back, and a per-doc sort window on the exploded
    //     shingle stream;
    //   - hash order (`hashOrderPrefix`): the prefix is just the first
    //     n - ceil(t·n) + 1 elements of sort_array(sh_set) — pure
    //     map-side array ops, three fewer shuffles of the exploded
    //     stream, but more candidates (no rare-first pruning).
    // Measured at sf0.1/t=0.8: hash order = 1.9× candidates (118k→222k,
    // identical final pairs), equal wall, higher cpu — rare-first is the
    // default; hash order is the lever when the exploded stream itself
    // (which scales with the CORPUS, while candidates scale with dup
    // density) dominates — e.g. a mostly-unique 100 TB crawl.
    val byDoc = Window.partitionBy("doc_id")
    val (sets, prefixes) = maxShingleFreq match {
      case Some(cap) =>
        // approximate mode (stop-shingle drop) needs doc-frequencies
        // anyway: always rare-first here. Docs losing every shingle drop
        // out entirely; __n is re-counted post-drop.
        val exploded = rawSets.select(col("doc_id"), explode(col("sh_set")).as("sh"))
        val freqs = exploded.groupBy("sh").agg(count(lit(1)).as("__df"))
        val kept = exploded
          .join(freqs.filter(col("__df") <= cap), Seq("sh"))
          .withColumn("__n", count(lit(1)).over(byDoc))
        val ordered = kept
          .withColumn("__rn", row_number().over(byDoc.orderBy(col("__df"), col("sh"))))
        (kept.groupBy("doc_id").agg(collect_list(col("sh")).as("sh_set")),
          ordered
            .filter(col("__rn") <= col("__n") - ceil(lit(threshold) * col("__n")) + 1)
            .select("doc_id", "sh"))
      case None if hashOrderPrefix =>
        (rawSets, rawSets.select(col("doc_id"),
            explode_outer(slice(sort_array(col("sh_set")), lit(1),
              (size(col("sh_set")) - ceil(lit(threshold) * size(col("sh_set"))) + 1)
                .cast("int"))).as("sh"))
          .filter(col("sh").isNotNull)) // Dedup.safeExplodeNote
      case None =>
        val exploded = rawSets.select(col("doc_id"),
          size(col("sh_set")).as("__n"), explode(col("sh_set")).as("sh"))
        val freqs = exploded.groupBy("sh").agg(count(lit(1)).as("__df"))
        val ordered = exploded.join(freqs, Seq("sh"))
          .withColumn("__rn", row_number().over(byDoc.orderBy(col("__df"), col("sh"))))
        (rawSets, ordered
          .filter(col("__rn") <= col("__n") - ceil(lit(threshold) * col("__n")) + 1)
          .select("doc_id", "sh"))
    }

    // candidate pairs: docs sharing a prefix shingle. Inline expansion for
    // short id-lists; distributed self-join for the heavy tail. Persisted:
    // both branches (and the union) would re-run the freq+window pipeline.
    val lists = CacheRegistry.track(prefixes.groupBy("sh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .persist(StorageLevel.MEMORY_AND_DISK))
    // explicit numPartitions repartition, NOT left to AQE: the candidate
    // pair stream is byte-tiny (two longs a row) so AQE coalesces the
    // post-distinct read to 1-2 partitions — and the expensive per-row
    // array_intersect verification downstream of the broadcast joins then
    // runs serialized (measured: 1.3 s on 2 of 32 cores at sf0.1).
    // Size-based coalescing can't see per-row compute; an explicit
    // repartition is exempt (the editDistanceNearDup lesson).
    val candidates = pairsFromIdLists(lists, "sh", pairListCutoff).distinct()
      .repartition(par)

    // exact verification on the full hashed sets
    val aSets = sets.select(col("doc_id").as("doc_id_a"), col("sh_set").as("__set_a"))
    val bSets = sets.select(col("doc_id").as("doc_id_b"), col("sh_set").as("__set_b"))
    candidates
      .join(aSets, "doc_id_a")
      .join(bSets, "doc_id_b")
      .withColumn("__inter", size(array_intersect(col("__set_a"), col("__set_b"))).cast("long"))
      .withColumn("jaccard",
        round(col("__inter").cast("double") /
          (size(col("__set_a")) + size(col("__set_b")) - col("__inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_id_a", "doc_id_b", "jaccard")
  }

  /** Cross-source duplication matrix: how many distinct SPAN fingerprints
    * ([[duplicateSpans]]' token windows) each PAIR of sources shares —
    * the corpus forensic that sizes dedup budgets before any pairwise
    * dedup runs: whole-document dups usually stay within a dump, but
    * shared boilerplate (headers, licenses, templates) crosses crawls at
    * the span level. One distinct (fingerprint, source) projection, one
    * self-equi-join on the fingerprint (fan-out per key bounded by the
    * SOURCE count, never the corpus), one sources²-bounded aggregate.
    */
  /** Robust winnowing fingerprints [Schleimer, Wilkerson, Aiken:
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD'03 — the MOSS selector]: hash every k-token shingle in
    * POSITION order (portable 40-bit md5-prefix — the
    * [[minHashSignaturesPortable]] hash family), slide a window of
    * `window` consecutive shingle hashes, select each window's minimum
    * with ties to the RIGHTMOST position, and emit the distinct
    * selections. The winnowing guarantee: any shared token run of
    * length ≥ window + k − 1 between two documents produces at least
    * one shared selected fingerprint (guaranteed recall), while
    * expected density stays 2/(window+1) — the bounded-size spot-check
    * for plagiarism/span-dedup that [[spanFingerprints]]' fixed-stride
    * sampling cannot promise (a shared span can straddle every stride
    * boundary).
    *
    * Determinism / oracle: the two selection keys fold into ONE
    * integer, key = h·2²⁰ + (2²⁰−1−pos) — the window minimum of the
    * folded key IS (min hash, rightmost tie), so selection is a plain
    * integer `min` over a per-doc window, bit-replayable in any
    * engine. Docs with fewer than `window` shingles select their
    * overall minimum (the full-sequence window). Positions must fit
    * 2²⁰ shingles/doc — enforced, not assumed.
    *
    * Scale shape: one map-side shingle projection, one per-doc window
    * min (partitioned by doc_id, bounded by shingle count), a distinct
    * — no joins, no pair generation. Output: (doc_id, fp_pos, fp_hash).
    */
  def winnowFingerprints(docs: DataFrame, k: Int = 3,
      window: Int = 4): DataFrame = {
    require(k >= 1 && window >= 1)
    import org.apache.spark.sql.expressions.Window
    val P = 1L << 20
    val seqd = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .select(col("doc_id"),
        when(size(col("__toks")) >= k,
          transform(sequence(lit(0), size(col("__toks")) - k),
            i => concat_ws(" ", slice(col("__toks"), i + 1, lit(k)))))
          .otherwise(array(concat_ws(" ", col("__toks")))).as("__shseq"))
      .select(col("doc_id"),
        posexplode_outer(col("__shseq")).as(Seq("pos", "sh")))
      .filter(col("pos").isNotNull) // safeExplodeNote
      .select(col("doc_id"), col("pos"),
        (conv(substring(md5(col("sh")), 1, 10), 16, 10).cast("long") * P
          + (lit(P - 1) - col("pos"))).as("__key"))
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(window - 1), 0)
    val all = Window.partitionBy("doc_id")
    seqd
      .withColumn("__mk", min(col("__key")).over(win))
      .withColumn("__mp", max(col("pos")).over(all))
      // loud failure, not a silent drop, if a doc exceeds the 2^20
      // positions the folded key reserves
      .withColumn("__ck", assert_true(col("__mp") < lit(P),
        lit("winnowFingerprints: a document has more than 2^20 shingles")))
      .filter(col("__ck").isNull)
      .filter(col("pos") >= least(lit(window - 1), col("__mp")))
      .select(col("doc_id"),
        (lit(P - 1) - pmod(col("__mk"), lit(P))).as("fp_pos"),
        expr(s"__mk DIV $P").as("fp_hash"))
      .distinct()
  }

  /** Near-duplicate pairs over shared [[winnowFingerprints]] selections:
    * docs sharing ≥ `minShared` distinct selected hashes, with the
    * [[Graph.coOccurrenceEdges]] hub guard — a fingerprint selected by
    * more than `maxDocsPerHash` docs is boilerplate (license headers,
    * templates) and is dropped BEFORE pair generation, bounding
    * per-hash fan-out at C(cap, 2) absolutely (documented lower-bound
    * semantics). Thanks to the winnowing guarantee the candidate set
    * covers every pair sharing a ≥ window+k−1 token run through an
    * un-capped hash. Output: (doc_id_a, doc_id_b, n_shared).
    */
  def winnowPairs(docs: DataFrame, k: Int = 3, window: Int = 4,
      minShared: Int = 2, maxDocsPerHash: Int = 64): DataFrame = {
    require(minShared >= 1 && maxDocsPerHash >= 2)
    val sel = CacheRegistry.track(
      winnowFingerprints(docs, k, window)
        .select(col("doc_id"), col("fp_hash")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    sel.count() // the linking agg and both join sides read it
    val linking = sel.groupBy("fp_hash").agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") > 1 && col("__nd") <= maxDocsPerHash)
      .select("fp_hash")
    val slim = sel.join(linking, "fp_hash")
    slim.select(col("fp_hash"), col("doc_id").as("doc_id_a"))
      .join(slim.select(col("fp_hash"), col("doc_id").as("doc_id_b")), "fp_hash")
      .filter(col("doc_id_a") < col("doc_id_b"))
      .groupBy("doc_id_a", "doc_id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  def crossSourceDuplication(
      docs: DataFrame, sourceCol: String = "source",
      spanTokens: Int = 32, stride: Int = 16): DataFrame = {
    val keyed = spanFingerprints(docs, spanTokens, stride)
      .join(docs.select(col("doc_id"), col(sourceCol).as("source")), "doc_id")
      .select(col("span_md5"), col("source")).distinct()
    keyed.select(col("span_md5"), col("source").as("source_a"))
      .join(keyed.select(col("span_md5"), col("source").as("source_b")), "span_md5")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared_spans"))
  }

  /** Per-source content novelty: the fraction of each source's shingle
    * OCCURRENCES whose first corpus appearance (min doc_id over the
    * shingle's distinct per-doc occurrences) is in that document — the
    * "how much genuinely new text does each source contribute" curve
    * curation teams read before spending a dedup budget (a crawl whose
    * novelty_rate collapses round-over-round is re-crawling the same
    * web). Complements [[crossSourceDuplication]]: that reports WHO
    * shares spans, this reports HOW MUCH of each source is first-seen.
    *
    * Determinism: "first" is by min doc_id — a total order that replays
    * in any engine — never by partition arrival. Counts are exact longs;
    * the single double division is rounded to 6dp for the oracle gate.
    *
    * Scale shape (the reason this survives 100 TB where a naive
    * self-join dies): shingles are 64-bit hashes ([[withHashedShingleSets]]
    * — set identity is preserved under the hash, so counts match the
    * string-shingle oracle), the first-seen table is ONE partial-combined
    * min per shingle key, and the join back is on the same shingle key —
    * two linear shuffles, no pair generation anywhere. Compare: novelty
    * via pairwise overlap would be O(n²) in documents.
    *
    * Output: (source, n_docs, n_shingles, n_novel, novelty_rate), one
    * row per source.
    */
  def noveltyBySource(
      docs: DataFrame, sourceCol: String = "source", k: Int = 3): DataFrame = {
    val sh = withHashedShingleSets(docs, k)
      .select(col("doc_id"), explode_outer(col("sh_set")).as("sh"))
      .filter(col("sh").isNotNull)
    // min doc_id per shingle: partial-combined map-side, shuffle carries
    // one (hash, long) pair per shingle key per map partition
    val first = sh.groupBy("sh").agg(min(col("doc_id")).as("__first_doc"))
    val perDoc = sh.join(first, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("__n_sh"),
        sum(when(col("doc_id") === col("__first_doc"), 1L).otherwise(0L))
          .as("__n_novel"))
    docs.select(col("doc_id"), col(sourceCol).as("source"))
      .join(perDoc, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n_sh")).as("n_shingles"),
        sum(col("__n_novel")).as("n_novel"))
      .select(col("source"), col("n_docs"), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_shingles"), 6)
          .as("novelty_rate"))
  }

  /** Quality-aware canonical selection over near-dup clusters: label the
    * pair graph ([[dedupClusters]]), then keep the CLEANEST member of
    * each cluster — argmax (alpha_ratio, n_chars, lowest doc_id) — rather
    * than the lowest id. The standard curation refinement: near-dup
    * copies differ by boilerplate, truncation, or OCR noise, and the kept
    * copy should be the best one, not the one that happened to sort
    * first. The ranking keys are the 4dp-rounded
    * [[TextAnalysis.qualityScore]] columns, so the whole selection
    * replays in the oracle. Output: (doc_id, canonical_id, rep_id, keep).
    *
    * Scale shape: the ranking window partitions by CLUSTER (bounded by
    * dup-family size, never corpus-sized); the representative join is a
    * cluster-count-sized equi-join.
    */
  def dedupRepresentatives(docs: DataFrame, pairs: DataFrame): DataFrame =
    dedupRepresentativesFromLabels(docs, dedupClusters(docs, pairs))

  /** [[dedupRepresentatives]] over a PRECOMPUTED (doc_id, canonical_id)
    * labeling — the shared-substrate entry point: the CC labeling is the
    * trio's (clusters / sizes / best-member) heaviest common stage, and a
    * suite that derives all three from one labels table pays it once.
    */
  def dedupRepresentativesFromLabels(docs: DataFrame, labels: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    val q = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("alpha_ratio"), col("n_chars_measured"))
    // persisted + eagerly filled: the rep filter and the member join are
    // two consumers of the ranked table (AQE cache-race note)
    val ranked = CacheRegistry.track(labels.join(q, "doc_id")
      .withColumn("__rn", row_number().over(
        Window.partitionBy("canonical_id")
          .orderBy(col("alpha_ratio").desc, col("n_chars_measured").desc,
            col("doc_id").asc)))
      .persist(StorageLevel.MEMORY_AND_DISK))
    ranked.count()
    val reps = ranked.filter(col("__rn") === 1)
      .select(col("canonical_id"), col("doc_id").as("rep_id"))
    ranked.select("doc_id", "canonical_id")
      .join(reps, "canonical_id")
      .select(col("doc_id"), col("canonical_id"), col("rep_id"),
        (col("doc_id") === col("rep_id")).as("keep"))
  }

  /** Banding-recall telemetry for MinHash-LSH — the dial a user turns
    * (bands × rows, hash count) the way [[Similarity.ivfRecall]] tunes
    * nprobe: one row reporting |LSH-flagged ∩ truly-duplicate| /
    * |truly-duplicate| (recall) and the flagged set's precision, with the
    * exact truth from [[ngramJaccardPairs]] (lossless prefix filter) and
    * the flagged set from the md5-portable LSH path so the WHOLE report
    * replays as one DuckDB oracle. Cost: the two pair pipelines share the
    * corpus scan pattern and both outputs are pair-bounded; the report
    * joins two persisted pair tables.
    */
  def lshRecall(
      docs: DataFrame,
      threshold: Double = 0.5,
      numHashes: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // persisted + eagerly filled: each side has two consumers (its count
    // and the hit join) — the AQE cache-race note
    val exact = CacheRegistry.track(
      ngramJaccardPairs(docs, shingleSize, threshold)
        .select(col("doc_id_a"), col("doc_id_b"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    exact.count()
    val found = CacheRegistry.track(
      minHashNearDupPortable(docs, numHashes, bands, shingleSize, threshold)
        .select(col("doc_id_a"), col("doc_id_b"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    found.count()
    val hits = found.join(exact, Seq("doc_id_a", "doc_id_b"))
      .agg(count(lit(1)).as("hit_pairs"))
    exact.agg(count(lit(1)).as("exact_pairs"))
      .crossJoin(found.agg(count(lit(1)).as("lsh_pairs")))
      .crossJoin(hits)
      // single BIGINT-ratio IEEE divisions; empty denominators report 1.0
      // (nothing to find / nothing flagged is a vacuous success, and NaN
      // would poison downstream comparisons)
      .select(col("exact_pairs"), col("lsh_pairs"), col("hit_pairs"),
        when(col("exact_pairs") > 0,
            col("hit_pairs").cast("double") / col("exact_pairs").cast("double"))
          .otherwise(lit(1.0)).as("recall"),
        when(col("lsh_pairs") > 0,
            col("hit_pairs").cast("double") / col("lsh_pairs").cast("double"))
          .otherwise(lit(1.0)).as("lsh_precision"))
  }

  /** Fuzzy (edit-distance) near-duplicate pairs: LSH-bounded candidates
    * verified with exact Levenshtein distance — the character-level dedup
    * measure for short documents where token Jaccard is too coarse
    * (small in-word edits barely move shingle sets but matter for exact
    * replay). Candidate generation is [[minHashNearDupPortable]] at a low
    * estimate cut (`candidateCut`) so the quadratic Levenshtein only ever
    * runs on bucket collisions, never all pairs; built on the md5 family
    * so the whole path (candidates AND distances) is oracle-replayable —
    * Levenshtein is the same classic DP in every engine, integer output,
    * no float drift.
    */
  def editDistanceNearDup(
      docs: DataFrame,
      maxDist: Int = 64,
      candidateCut: Double = 0.25): DataFrame = {
    val cand = minHashNearDupPortable(docs, threshold = candidateCut)
      .select("doc_id_a", "doc_id_b")
    val a = docs.select(col("doc_id").as("doc_id_a"), col("text").as("__ta"))
    val b = docs.select(col("doc_id").as("doc_id_b"), col("text").as("__tb"))
    // two traps at scale (both hit in the first cut of this operator —
    // 24 s single-threaded at sf0.1):
    //   1. AQE coalesces the byte-tiny candidate join output into ONE
    //      partition, serializing all the DP work — coalescing is
    //      size-based and can't see per-row compute. An explicit
    //      numPartitions repartition is exempt from coalescing.
    //   2. unbounded levenshtein is O(|a|·|b|) per pair; the 3-arg banded
    //      form early-exits at the threshold, O(maxDist·|a|) — it returns
    //      -1 above the bound, which the filter range re-excludes with
    //      identical results.
    cand.join(a, "doc_id_a").join(b, "doc_id_b")
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id_a"), col("doc_id_b"),
        levenshtein(col("__ta"), col("__tb"), maxDist).cast("long")
          .as("edit_dist"))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
  }

  /** Cross-document duplicate SPANS — the window-fingerprint approximation
    * of exact-substring dedup (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better", ACL'22): fingerprint every
    * `spanTokens`-token window at `stride`-token steps (md5 over the
    * window text — engine-portable, q_dupspans oracle), then report every
    * window whose fingerprint appears in MORE THAN ONE document. Catches
    * shared boilerplate/quotations inside otherwise-distinct documents,
    * which whole-doc and near-dup operators both miss.
    *
    * Scale shape: window generation is [[TextAnalysis.chunkDocuments]]
    * (map-side, one generator); the duplicate set is one hash-shuffled
    * aggregate on the 32-char fingerprint plus one join back. Ragged tail
    * windows (< spanTokens) are excluded — partial-window matches are
    * whole-doc-dedup's job, not span dedup's.
    */
  /** (doc_id, chunk_id, span_md5): md5 fingerprint of every FULL
    * `spanTokens` window at `stride` steps — the shared substrate of
    * [[duplicateSpans]] and [[spanDupFraction]], persisted because both
    * consumers read it twice (fingerprint aggregate + join-back).
    */
  private[operators] def spanFingerprints(
      docs: DataFrame, spanTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && stride <= spanTokens, "need 0 < stride <= spanTokens")
    import org.apache.spark.storage.StorageLevel
    CacheRegistry.track(
      TextAnalysis.chunkDocuments(docs, spanTokens, spanTokens - stride)
        .filter(col("n_chunk_tokens") === spanTokens)
        .select(col("doc_id"), col("chunk_id"), md5(col("chunk_text")).as("span_md5"))
        .persist(StorageLevel.MEMORY_AND_DISK))
  }

  def duplicateSpans(
      docs: DataFrame, spanTokens: Int = 32, stride: Int = 16): DataFrame = {
    val spans = spanFingerprints(docs, spanTokens, stride)
    val dups = spans.groupBy("span_md5")
      .agg(countDistinct(col("doc_id")).as("n_docs_sharing"))
      .filter(col("n_docs_sharing") > 1)
    spans.join(dups, "span_md5")
      .select("doc_id", "chunk_id", "span_md5", "n_docs_sharing")
  }

  /** Per-document duplicated-span fraction — [[duplicateSpans]] telemetry
    * folded into the drop/trim decision signal: of a document's full
    * windows, the share whose fingerprint appears in at least one OTHER
    * document. Documents with no full window (short docs) report 0.0 so
    * nothing silently drops out of a downstream quality gate.
    */
  def spanDupFraction(
      docs: DataFrame, spanTokens: Int = 32, stride: Int = 16): DataFrame = {
    val spans = spanFingerprints(docs, spanTokens, stride)
    val shared = spans.groupBy("span_md5")
      .agg(countDistinct(col("doc_id")).as("__nd"))
    val perDoc = spans.join(shared, "span_md5")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("n_dup_spans"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(round(col("n_dup_spans").cast("double") / col("n_spans"), 4),
          lit(0.0)).as("dup_span_frac"))
  }

  /** EXACT duplicated-substring extraction — the suffix-array-grade
    * upgrade of [[duplicateSpans]] (which strides by 16 and can miss or
    * truncate matches that don't align to the stride grid): the maximal
    * token ranges covered by verbatim cross-document matches of ≥
    * `minTokens` consecutive tokens, with exact boundaries (adjacent or
    * overlapping matches — possibly against different partner documents
    * — merge into one reported span, which is what a trim step wants).
    * The target semantics are Lee et al.'s ExactSubstr
    * ("Deduplicating Training Data Makes Language Models Better",
    * ACL'22), re-derived for Spark without their global suffix array:
    *
    *   1. ANCHOR: fingerprint EVERY `minTokens`-token window at stride
    *      1 (md5 over the window text — map-side generate + project;
    *      the token array never shuffles, only (doc_id, p, md5) rows).
    *      A substring of length L ≥ k is duplicated iff each of its
    *      k-windows is duplicated, and conversely a duplicated
    *      k-window IS a duplicated substring — so the union of
    *      duplicated windows covers exactly the tokens any ≥k-token
    *      verbatim match covers. No suffix sort needed.
    *   2. BUCKET + VERIFY: group by fingerprint, keep cross-document
    *      buckets (countDistinct(doc_id) > 1 — intra-doc repetition is
    *      [[TextAnalysis.repetitionStats]]' job), then re-extract the
    *      actual window text for CANDIDATE rows only (the join back to
    *      `docs` is duplication-proportional, never corpus-×-k) and
    *      require min(text) == max(text) per bucket: equal min and max
    *      proves every member identical, making the result EXACT — an
    *      md5 collision fails loudly (assert_true) instead of
    *      silently reporting a false span. No all-pairs comparison
    *      anywhere.
    *   3. EXTEND: per document, merge overlapping covered intervals
    *      [p, p+k) into maximal spans — a gaps-and-islands window
    *      PARTITIONED BY doc_id (per-doc sized, never global): a new
    *      island starts where p − lag(p) > k.
    *
    * Scale shape: stride-1 windowing costs k× the corpus in map-side
    * hashing CPU but shuffles only corpus-token-count fingerprint rows;
    * the candidate set, the verification join, and the island merge are
    * all bounded by the DUPLICATED text volume (ScaleCheck gates this
    * at 10× planted duplication). Output: (doc_id, span_start,
    * span_end, n_tokens, n_windows, max_docs_sharing) — token
    * positions 0-based, span_end exclusive; feed to a trim step that
    * cuts `[span_start, span_end)` or to a drop rule on covered
    * fraction.
    */
  /** Shared core of the EXACT span extractors: stride-1 `k`-token
    * window md5 anchors (map-side generate — only (doc_id, p, md5)
    * shuffles), text-equality verification of candidate buckets (min ==
    * max over ≥2 strings proves the whole bucket identical; an md5
    * collision fails loudly), and per-doc gaps-and-islands merge. The
    * two public faces differ only in the BUCKET predicate: cross-doc
    * ([[duplicateSpansExact]]: distinct docs > 1, bucket = md5) vs
    * intra-doc ([[selfRepetitionSpans]]: occurrences within ONE doc >
    * 1, bucket = (doc_id, md5)).
    */
  private def exactSpanCore(docs: DataFrame, k: Int, opName: String,
      bucketDocScoped: Boolean, statName: String): DataFrame = {
    require(k > 1, s"minTokens must be > 1, got $k")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    def windowText(toksCol: Column, p: Column): Column =
      concat_ws(" ", slice(toksCol, p + 1, lit(k)))
    val src = docs
    val spans = CacheRegistry.track(src
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(0), size(col("__toks")) - k)).as("__p"))
      .select(col("doc_id"), col("__p").cast("long").as("p"),
        md5(windowText(col("__toks"), col("__p"))).as("span_md5"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val bucketCols = if (bucketDocScoped) Seq("doc_id", "span_md5")
      else Seq("span_md5")
    val dups =
      if (bucketDocScoped)
        spans.groupBy(bucketCols.map(col): _*)
          .agg(count(lit(1)).as(statName))
          .filter(col(statName) > 1)
      else
        spans.groupBy(bucketCols.map(col): _*)
          .agg(countDistinct(col("doc_id")).as(statName))
          .filter(col(statName) > 1)
    val cand = spans.join(dups, bucketCols)
    // exactness gate: re-derive the candidate windows' text and prove
    // every bucket uniform — min == max over ≥2 strings is an equality
    // proof for the whole bucket, one aggregate, no pair join
    val verified = cand
      .join(src.select(col("doc_id"), col("text")), "doc_id")
      .select(col("span_md5"),
        windowText(TextAnalysis.tokens(col("text")), col("p")).as("__wt"))
      .groupBy("span_md5")
      .agg(min(col("__wt")).as("__lo"), max(col("__wt")).as("__hi"))
      .withColumn("__chk", assert_true(col("__lo") === col("__hi"),
        lit(s"$opName: one md5 bucket holds two DIFFERENT " +
          "window texts (hash collision) — the span report would not " +
          "be exact; rerun with a longer fingerprint")))
      .filter(col("__chk").isNull)
      .select("span_md5")
    val w = Window.partitionBy("doc_id").orderBy("p")
    val islands = cand.join(verified, "span_md5")
      .withColumn("__brk",
        when(col("p") - lag(col("p"), 1).over(w) > k, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    islands.groupBy("doc_id", "__island")
      .agg(min(col("p")).as("span_start"),
        (max(col("p")) + k).as("span_end"),
        count(lit(1)).as("n_windows"),
        max(col(statName)).as("max_" + statName))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("n_tokens"),
        col("n_windows"), col("max_" + statName))
  }

  def duplicateSpansExact(docs: DataFrame, minTokens: Int = 16): DataFrame =
    exactSpanCore(docs, minTokens, "duplicateSpansExact",
      bucketDocScoped = false, statName = "docs_sharing")

  /** The INTRA-document twin of [[duplicateSpansExact]]: maximal token
    * ranges covered by ≥ `minTokens`-token substrings that occur MORE
    * THAN ONCE within the same document — the Gopher-style repeated-
    * span signal ([[TextAnalysis.repetitionStats]] reports the ratios;
    * this reports the exact boundaries a trim step needs). A window
    * repeated across documents but unique within its own is NOT
    * reported — that is [[duplicateSpansExact]]'s contract. Same
    * anchor/verify/extend machinery, bucket keyed on (doc_id, md5).
    * Output: (doc_id, span_start, span_end, n_tokens, n_windows,
    * max_repeats) — every occurrence of a repeated substring is
    * covered, including the first.
    */
  def selfRepetitionSpans(docs: DataFrame, minTokens: Int = 8): DataFrame =
    exactSpanCore(docs, minTokens, "selfRepetitionSpans",
      bucketDocScoped = true, statName = "repeats")

  /** APPLY a span report to the corpus — the cut step the extractors
    * feed: every token whose position falls inside any of the doc's
    * [span_start, span_end) ranges is dropped, the survivors re-join
    * into the trimmed text. `spans` is any frame with (doc_id,
    * span_start, span_end) — [[duplicateSpansExact]] output for
    * cross-doc boilerplate cuts, [[selfRepetitionSpans]] for
    * repetition trims, or a hand-curated range table.
    *
    * Scale shape: the span table is answer-sized (bounded by duplicated
    * text / k, not the corpus), so the per-doc range list from the
    * groupBy is a few structs; the trim itself is one map-side
    * higher-order filter over each doc's token array (position ∈ no
    * range), no explode, no per-token shuffle. Docs without spans pass
    * through whole (left join). Output: (doc_id, text, n_tokens_before,
    * n_tokens_kept).
    */
  def trimSpans(docs: DataFrame, spans: DataFrame): DataFrame = {
    val sp = spans.groupBy("doc_id")
      .agg(collect_list(struct(col("span_start").cast("long").as("s"),
        col("span_end").cast("long").as("e"))).as("__spans"))
    val covered = (i: Column) =>
      exists(col("__spans"), s =>
        i >= s.getField("s") && i < s.getField("e"))
    val kept = filter(col("__toks"),
      (t: Column, i: Column) => !covered(i.cast("long")))
    docs.join(sp, Seq("doc_id"), "left")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"),
        coalesce(col("__spans"),
          array().cast("array<struct<s:bigint,e:bigint>>")).as("__spans"))
      .select(col("doc_id"), concat_ws(" ", kept).as("text"),
        size(col("__toks")).cast("long").as("n_tokens_before"),
        size(kept).cast("long").as("n_tokens_kept"))
  }

  /** Near-duplicate PAIRS → dedup DECISIONS: connected components over the
    * pair graph, labeling every doc with the smallest doc_id reachable
    * through near-duplicate edges (`canonical_id`). A doc is kept iff
    * `doc_id == canonical_id`; duplicate clusters of any shape (chains
    * a~b~c where a and c never directly matched) collapse to one keeper.
    *
    * Iterative min-label propagation: each round every doc takes the min
    * of its own label and its neighbors' labels; converges in
    * O(component diameter) rounds — near-dup clusters are shallow, so a
    * handful of rounds in practice, `maxIter` caps the worst case. Each
    * round is one shuffle join + aggregate on the EDGE table only (the
    * full corpus never re-shuffles); the driver-side loop with a
    * convergence count per round is the standard Spark iterative pattern
    * (at extreme scale swap in large-star/small-star [Kiveris et al.,
    * "Connected Components in MapReduce", SoCC'14] — same contract).
    */
  /** `starSwitchAfter`: once that many distributed min-label rounds have
    * run without converging, the component diameter has outgrown the
    * O(diameter) propagation and the loop DELEGATES to
    * [[dedupClustersStar]] (O(log² n) on any shape). The star call reuses
    * the cached edge table and keeps the progress made: the propagated
    * labels ride along as shortcut edges — a label only ever connects
    * nodes of one component, so the augmented graph has identical
    * components and a smaller effective diameter. Set >= maxIter to pin
    * pure min-label.
    */
  def dedupClusters(
      docs: DataFrame,
      pairs: DataFrame,
      maxIter: Int = 20,
      driverThreshold: Int = 1 << 20,
      checkpointEvery: Int = 5,
      starSwitchAfter: Int = 3): DataFrame = {
    import org.apache.spark.storage.StorageLevel

    // Adaptive small-graph path: the near-dup pair graph is orders of
    // magnitude smaller than the corpus (it IS the point of near-dup
    // filtering), so up to `driverThreshold` edges are solved with
    // driver-side union-find in one pass and broadcast back — 2 jobs
    // instead of ~4 per propagation round. The distributed loop below
    // remains the contract for graphs that don't fit the driver.
    //
    // persist + count + collect-from-cache: the size probe and the edge
    // fetch must cost ONE full pipeline execution. A limit(N+1).collect()
    // probe instead runs CollectLimit's incremental partition scans (1, 4,
    // 16, … result-stage re-executions when matches are sparse) — measured
    // ~2.5× the pipeline's one-pass cost when `pairs` is an expensive
    // near-dup join (driver bench, round 2).
    val p = pairs.select(col("doc_id_a"), col("doc_id_b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCount = p.count()
    if (edgeCount <= driverThreshold) {
      val sample = p.collect()
      p.unpersist(blocking = false)
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      sample.foreach { r =>
        val (a, b) = (find(r.getLong(0)), find(r.getLong(1)))
        if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
      }
      val mapping = parent.keys.map(k => (k, find(k))).filter(kv => kv._1 != kv._2).toSeq
      if (mapping.isEmpty)
        return docs.select(col("doc_id"), col("doc_id").as("canonical_id"))
      val mapDf = docs.sparkSession.createDataFrame(mapping)
        .toDF("doc_id", "__canon")
      return docs.select(col("doc_id"))
        .join(broadcast(mapDf), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("__canon"), col("doc_id")).as("canonical_id"))
    }

    // materialize edges from the cached pair table, then drop it BEFORE the
    // propagation loop — p is only read to build edges, and carrying both
    // caches through the loop is ~1.5x redundant footprint (round-2
    // advisor finding)
    val edges = p.select(col("doc_id_a").as("src"), col("doc_id_b").as("dst"))
      .union(p.select(col("doc_id_b").as("src"), col("doc_id_a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    p.unpersist(blocking = false)
    var labels = docs.select(col("doc_id"), col("doc_id").as("label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val prop = edges
        .join(labels.select(col("doc_id").as("src"), col("label")), "src")
        .groupBy(col("dst").as("doc_id")).agg(min(col("label")).as("__nl"))
      val nextPlan = labels.join(prop, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("__nl"), col("label"))).as("label"))
      // lineage cut every `checkpointEvery` rounds: persist caches DATA
      // but the plan still chains through every prior round, growing the
      // analysis/optimization cost per round without bound. With a
      // configured checkpoint dir (cluster deployments: HDFS/object
      // store), reliable checkpoint() both truncates the plan AND
      // survives executor loss — the fault-tolerance story for a long
      // propagation. Without one, fall back to localCheckpoint, which
      // truncates the plan but stores blocks ON the executors: an
      // executor death then FAILS the job (lineage is gone) rather than
      // recomputing — acceptable in local mode where executor==driver,
      // never on a cluster. Configure a checkpoint dir at 100 TB.
      val next =
        if ((i + 1) % checkpointEvery == 0) {
          if (docs.sparkSession.sparkContext.getCheckpointDir.isDefined) {
            // persist first: reliable checkpoint() runs a SECOND job to
            // write the checkpoint files, which would otherwise re-execute
            // the full lineage back to the previous cut (advisor r6)
            nextPlan.persist(StorageLevel.MEMORY_AND_DISK)
            val cp = nextPlan.checkpoint(true)
            nextPlan.unpersist()
            cp
          } else nextPlan.localCheckpoint(true)
        } else nextPlan.persist(StorageLevel.MEMORY_AND_DISK)
      changed = next
        .join(labels.select(col("doc_id"), col("label").as("__old")), "doc_id")
        .filter(col("label") =!= col("__old")).count()
      // Lineage.release, not unpersist: on cut rounds the dead `labels`
      // is a localCheckpoint result whose blocks a Dataset.unpersist
      // cannot evict (r10 verdict). NO deleteFiles here: successors
      // between cuts are merely persisted and fall back to the previous
      // reliable checkpoint's files on executor loss — cluster
      // deployments reclaim those via
      // spark.cleaner.referenceTracking.cleanCheckpoints=true.
      Lineage.release(labels)
      labels = next
      i += 1
      if (changed > 0 && i >= starSwitchAfter && i < maxIter) {
        // deep component: delegate to star contraction. Both inputs come
        // from THIS loop's caches (edges persisted above, labels just
        // persisted/checkpointed), so the expensive pair pipeline is not
        // re-executed; star materializes its own pair table eagerly
        // before we drop those caches below.
        val remaining = edges.filter(col("src") < col("dst"))
          .select(col("src").as("doc_id_a"), col("dst").as("doc_id_b"))
          .union(labels.filter(col("label") =!= col("doc_id"))
            .select(col("doc_id").as("doc_id_a"), col("label").as("doc_id_b")))
        val out = dedupClustersStar(docs, remaining)
        edges.unpersist()
        // labels may be a cut result on checkpointEvery rounds; star has
        // already materialized its own pair table, so its blocks are dead
        Lineage.release(labels)
        return out
      }
    }
    edges.unpersist()
    // the final labels cache backs the returned (lazy) frame — hand it to
    // the registry for caller-side release rather than dropping it here
    CacheRegistry.track(labels)
    labels.select(col("doc_id"), col("label").as("canonical_id"))
  }

  /** Connected components by alternating large-star/small-star contraction
    * [Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14] — the documented extreme-scale twin of [[dedupClusters]]'
    * min-label loop, with the identical contract: every doc labeled with
    * the smallest doc_id reachable through the pair graph.
    *
    * Why this wins when components are DEEP: min-label propagation needs
    * O(component diameter) rounds — a pathological 10⁶-node chain is 10⁶
    * shuffles. Star contraction halves component height per round pair
    * (large-star hooks every node above its neighborhood min, small-star
    * flattens the resulting trees), converging in O(log² n) rounds on ANY
    * graph shape. Near-dup clusters are usually shallow, so the default
    * path stays min-label; this is the escape hatch for adversarial
    * shapes (quote chains, boilerplate laddering) where diameter grows
    * with corpus size.
    *
    * Per-round cost: two self-aggregates on the EDGE table only (min per
    * node + join back), same as one min-label round; the corpus never
    * re-shuffles. Edges strictly SHRINK toward one star per component
    * (the edge table after round k is at most the node count), so later
    * rounds get cheaper — unlike min-label, whose edge table is constant.
    * The fixed point is detected by a (count, XOR-of-xxhash64) set
    * signature on the distinct oriented edge table — one cheap agg job
    * per round where a symmetric `except` costs an anti-join shuffle
    * each way; a signature collision between two DIFFERENT consecutive
    * edge sets (≈2⁻⁶⁴ per round) would end the loop one round early,
    * which the maxIter safety net below turns into a consistent partial
    * labeling rather than corrupt output.
    */
  def dedupClustersStar(
      docs: DataFrame,
      pairs: DataFrame,
      maxIter: Int = 25,
      checkpointEvery: Int = 4): DataFrame = {
    import org.apache.spark.storage.StorageLevel

    // EVERY round cuts lineage with an eager localCheckpoint, unlike the
    // min-label loop's every-5 persist cadence: one star round references
    // its input ~4× (both union branches of the small-star re-hang), so
    // an un-truncated logical plan grows ~4^k — exponentially, not
    // linearly. Measured: plan-string OOM by round 8 with cuts every 4.
    // RELIABLE checkpoints (executor-loss durability, when a dir is
    // configured) are layered on every `checkpointEvery` rounds only —
    // they cost a persist + a second write job, which at one per round
    // doubled the loop's job count for fault-tolerance no round needs
    // twice.
    def cutLineage(df: DataFrame, round: Int): DataFrame =
      if ((round + 1) % checkpointEvery == 0
          && docs.sparkSession.sparkContext.getCheckpointDir.isDefined) {
        df.persist(StorageLevel.MEMORY_AND_DISK)
        val cp = df.checkpoint(true)
        df.unpersist()
        cp
      } else df.localCheckpoint(true)

    // materialize the PAIR table alone first (same discipline as
    // [[dedupClusters]]): the pair source is typically an expensive
    // near-dup pipeline whose plan branches several ways; driving it
    // through one simple count() fills its caches serially, where a
    // first action with distinct+agg on top lets AQE launch the
    // branches as concurrent stages that RACE the lazy cache fill and
    // re-run the full scan each (measured: the tokenize/shingle scan
    // executed 4× without this, 35 cpu-s vs 16 for the min-label twin).
    val p = pairs.select(col("doc_id_a"), col("doc_id_b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    p.count()

    // oriented invariant: edges are kept as (u, v) with v < u. Self-loops
    // (u = v) carry no information and are dropped eagerly.
    // an eager CUT, not a lazy persist: when the loop converges in zero
    // rounds this initial table IS the returned frame's source, and a
    // persist would leave it lazily chained through the caller's pair
    // caches — which the min-label star-switch path releases right after
    // we return (advisor r11). The cut materializes it independently, so
    // the handoff never depends on upstream cache survival.
    var edges = Lineage.cut(p
      .select(greatest(col("doc_id_a"), col("doc_id_b")).as("u"),
        least(col("doc_id_a"), col("doc_id_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())

    // fixed-point detector: (count, XOR of xxhash64(u,v)) — commutative
    // and overflow-free (a hash SUM trips ANSI long-overflow), sound as a
    // set signature because the edge table is distinct; ONE agg job on
    // the cached table per round, where a symmetric `except` emptiness
    // test costs an extra anti-join shuffle each way (measured: the
    // except pair dominated round latency on small graphs)
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var edgeSig = sig(edges)
    p.unpersist(blocking = false)
    var converged = edgeSig._1 == 0L
    var i = 0
    while (!converged && i < maxIter) {
      // large-star: per node u over its FULL neighborhood (both
      // orientations), m = min(Γ(u) ∪ {u}); hook every strictly-larger
      // neighbor v > u directly to m. Keeps (v, m) oriented since v > u ≥ m.
      val nbrs = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      // NOT persisted, although the small-star stage reads these twice:
      // all consumers live inside the single eager lineage-cut job below,
      // where ReuseExchange deduplicates the identical sub-plans — a
      // persist here only added two extra materialization jobs per round
      // (measured: the job-count, not the data, dominates round latency;
      // dropping the intermediate persists cut the loop's wall time ~2×
      // on small graphs without touching the at-scale plan shape).
      // NO intermediate distinct: duplicate (v, m) hooks (one per edge
      // into v) are harmless to the min/agg and join semantics and the
      // single round-final distinct collapses them — each dropped
      // distinct is a full shuffle saved per round. Intermediate row
      // inflation is bounded by node degree, the same quantity the
      // large-star hook is already linear in.
      val afterLarge = nbrs.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))

      // small-star: per node u over its SMALLER neighbors only (the
      // oriented table is exactly that), m = min; re-hang every other
      // small neighbor AND u itself off m.
      val smins = afterLarge.groupBy("u").agg(min(col("v")).as("m"))
      val hung = afterLarge.join(smins, "u")
      val next = hung
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(hung.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()

      // two jobs per round: the eager lineage cut (which computes the
      // whole large+small star pipeline once) and the tiny signature agg
      // on its cached/checkpointed result
      val nextCached = cutLineage(next, i)
      val nextSig = sig(nextCached)
      converged = nextSig == edgeSig
      // Lineage.release, not unpersist: every round's dead `edges` is a
      // cut result (localCheckpoint blocks, or reliable-checkpoint files
      // on checkpointEvery rounds) that a Dataset.unpersist cannot free
      // (r10 verdict #1). deleteFiles is safe here because nextCached is
      // ALWAYS an eager cut — no successor recomputes through the dead
      // round. The star loop references its input ~4× per round, so
      // freed memory matters most exactly here.
      Lineage.release(edges, deleteFiles = true)
      edges = nextCached
      edgeSig = nextSig
      i += 1
    }

    // at the fixed point every edge is (member, root): label members by
    // their root, everything unpaired by itself. One broadcast-eligible
    // left join against the (small) star table finishes the labeling.
    //
    // maxIter safety net: a mid-contraction table can still hold several
    // out-edges per node; joining it raw would FAN OUT to duplicate
    // doc_id rows with conflicting labels. Collapsing to min per node
    // keeps the one-row-per-doc contract — a consistent partial labeling
    // (the min-label loop's own non-converged behavior), never corrupt
    // output shape.
    val starEdges =
      if (converged) edges
      else edges.groupBy("u").agg(min(col("v")).as("v"))
    val labels = docs.select(col("doc_id"))
      .join(starEdges.select(col("u").as("doc_id"), col("v").as("__root")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__root"), col("doc_id")).as("canonical_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize the labels OFF the final cut, then reclaim its BLOCKS
    // eagerly: `edges` is a cut result whose blocks a registry unpersist
    // cannot free (Lineage.release contract), so handing it to
    // CacheRegistry would leave the loop's last checkpoint resident until
    // the ContextCleaner got around to it. The persisted labels table is
    // the only live consumer and is doc-count-sized.
    //
    // deleteFiles stays FALSE here, unlike the loop-internal releases
    // (advisor r12): `labels` is merely persisted, not cut, and on the
    // reliable-checkpoint path a lost labels partition RECOMPUTES through
    // the final cut's files — deleting them would fail the job on exactly
    // the executor loss reliable checkpoints exist for. The files are
    // reclaimed by the ContextCleaner once labels is unreachable
    // (cleanCheckpoints=true, set by every engine-owned builder).
    labels.count()
    Lineage.release(edges)
    CacheRegistry.track(labels)
    labels
  }

  /** Embedding-cosine near-duplicate pairs within a blocking key (default:
    * the `label` column — at scale the blocking key is what bounds the
    * pair space; swap in an LSH bucket for unlabeled corpora).
    */
  def embeddingNearDup(
      embeddings: DataFrame,
      threshold: Double = 0.95,
      blockCol: String = "label"): DataFrame = {
    // norms once per row before the self-join: a candidate pair costs one
    // fused vec_dot loop, not three
    val withN = embeddings.select(col("vec_id"), col("embedding"), col(blockCol),
      Similarity.l2norm(col("embedding")).as("__norm"))
    val a = withN.as("a")
    val b = withN.as("b")
    val sim = Similarity.dot(col("a.embedding"), col("b.embedding")) /
      (col("a.__norm") * col("b.__norm"))
    a.join(b,
        col(s"a.$blockCol") === col(s"b.$blockCol") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id_a"), col("b.vec_id").as("vec_id_b"),
        round(sim, 4).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
