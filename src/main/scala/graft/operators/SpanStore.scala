package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted span-fingerprint store — the incremental-maintenance form
  * of [[Dedup.duplicateSpansExact]]: the corpus' stride-1 `minTokens`-
  * token window md5s live as a hive-partitioned bucket table, new
  * batches APPEND their fingerprints under the frozen geometry, and a
  * probe answers "which of this batch's token windows already appear
  * in the corpus" with work proportional to the batch and its
  * DUPLICATION, never the store — the production shape of exact-
  * substring dedup at ingest cadence (the [[LshIndex]] lifecycle
  * applied to the ExactSubstr family; LSH stores near-dup signatures,
  * this stores exact window prints).
  *
  * Layout: `dir/shard=<hh>/…` where shard = the FIRST `shard_chars`
  * HEX CHARS of the window md5 (2 by default → 256 fixed directories —
  * deterministic, engine-portable, and the DuckDB oracle replays it as
  * substr(md5, 1, n)); rows are (shard, span_md5, doc_id, p) with
  * doc_id normalized to BIGINT (fixed store schema — reads never
  * depend on schema/partition inference, so a store whose present
  * shards happen to be all digits still reads shard as STRING). Files
  * are sorted by span_md5 within each shard so row-group min/max
  * footer stats stay tight for print-keyed skipping and compaction.
  * `dir_meta/meta.json` freezes (min_tokens, shard_chars)
  * ([[StoreMeta]]); stores written before shard_chars existed read
  * back as 1-char/16-shard layouts.
  *
  * Probe scale shape (the 100 TB ingest story): the store scan
  * partition-prunes to the shards the batch hashes to, then SEMI-JOINS
  * against the batch's distinct prints BEFORE any aggregation — the
  * batch print set broadcasts (trickle default), so no store row ever
  * shuffles; only rows whose print the batch actually carries survive
  * into the distinct-doc count. Probe shuffle volume is therefore
  * bounded by batch windows + matching store rows (duplication), not
  * store size — ScaleCheck pins this at a 10× store / tiny batch
  * ratio.
  *
  * Append is a pure accumulate (duplicate rows across appends are
  * legal — probe counts DISTINCT store docs per print), so replayed
  * appends can only repeat rows, never change answers.
  */
object SpanStore {

  /** Fixed on-disk schema (shard is the hive partition column). Reads
    * supply it explicitly: partition-type inference would flip shard to
    * INT whenever the present shards are all digits, breaking the
    * isin() pruning filter and flip-flopping the column type across
    * store generations.
    */
  private val storeSchema = "doc_id BIGINT, p BIGINT, span_md5 STRING, shard STRING"

  private def readStore(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(storeSchema).parquet(dir)

  private def fingerprints(docs: DataFrame, k: Int, shardChars: Int): DataFrame =
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        TextAnalysis.tokens(col("text")).as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(0), size(col("__toks")) - k)).as("__p"))
      .select(col("doc_id"), col("__p").cast("long").as("p"),
        md5(concat_ws(" ",
          slice(col("__toks"), col("__p") + 1, lit(k)))).as("span_md5"))
      .withColumn("shard", substring(col("span_md5"), 1, shardChars))

  /** (minTokens, shardChars); pre-shard_chars stores are 1-char/16-dir. */
  private def readGeometry(dir: String): (Int, Int) = {
    val m = StoreMeta.read(dir)
    (m("min_tokens").toInt, m.getOrElse("shard_chars", "1").toInt)
  }

  /** Cold-build the store over `docs`. `shardChars` fixes the directory
    * fan-out (16^n dirs): 2 (256) prunes trickle probes to a few
    * directories; 3 (4096) suits corpus-scale stores where even 1/256
    * of the data is a big scan.
    */
  def write(docs: DataFrame, dir: String, minTokens: Int = 16,
      filesPerPartition: Int = 1, shardChars: Int = 2): Unit = {
    require(minTokens > 1, s"minTokens must be > 1, got $minTokens")
    require(shardChars >= 1 && shardChars <= 4,
      s"shardChars must be in [1,4], got $shardChars")
    graft.ParquetIO.writePartitioned(fingerprints(docs, minTokens, shardChars),
      dir, Seq("shard"), filesPerPartition, sortCols = Seq("span_md5"))
    StoreMeta.write(dir, "min_tokens" -> minTokens, "shard_chars" -> shardChars)
  }

  /** Append a batch's fingerprints under the frozen geometry. */
  def append(spark: SparkSession, batch: DataFrame, dir: String): Unit = {
    val (k, sc) = readGeometry(dir)
    graft.ParquetIO.writePartitioned(fingerprints(batch, k, sc), dir,
      Seq("shard"), filesPerPartition = 1, mode = "append",
      sortCols = Seq("span_md5"))
  }

  /** Which of `batch`'s windows already appear in the store, and in how
    * many distinct STORE documents: (doc_id, p, span_md5,
    * n_store_docs). Batch ids are assumed new to the store (ingest
    * order is probe-then-append, the [[LshIndex.probe]] convention); a
    * doc probed against a store that already contains it reports its
    * own prints back. Feed the hits to [[anchorsToSpans]] →
    * [[Dedup.trimSpans]] (or use [[ingestCurate]] which composes the
    * whole probe→trim→append lineage).
    *
    * `broadcastProbe` (trickle default) broadcasts the batch print set
    * into the store-side semi-join and the batch fingerprints into the
    * final hit join, so store rows never shuffle; a backfill-sized
    * batch sets it false and takes the shuffle joins.
    *
    * The batch fingerprint frame is persisted (three consumers: shard
    * collect, print key set, final join) and CacheRegistry-tracked —
    * ingest-cadence callers release it per batch via
    * [[CacheRegistry.release]] (the bench/verify harnesses and
    * [[ingestCurate]]'s streaming twin do), the same contract as
    * [[LshIndex.probe]]'s tracked intermediates.
    */
  def probe(spark: SparkSession, batch: DataFrame, dir: String,
      broadcastProbe: Boolean = true): DataFrame = {
    val (k, sc) = readGeometry(dir)
    val bf = CacheRegistry.track(fingerprints(batch, k, sc)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // partition-pruned store scan: only the shards this batch hashes to.
    // The shard universe is <= 16^shardChars values, so the collect is
    // bounded by construction and buys a STATIC PartitionFilters IN-list
    // (planning-time directory elimination, not a runtime join the
    // optimizer may or may not convert to dynamic pruning).
    val shards = bf.select("shard").distinct().collect().map(_.getString(0))
    val keys = {
      val d = bf.select("span_md5").distinct()
      if (broadcastProbe) broadcast(d) else d
    }
    // semi-join BEFORE the aggregate: only store rows whose print the
    // batch actually carries reach the distinct-doc count, so the
    // groupBy shuffles duplication-proportional rows — aggregating the
    // whole touched shard first would make every trickle probe pay a
    // store-sized shuffle (r16 verdict task 1).
    val store = readStore(spark, dir)
      .filter(col("shard").isin(shards.toIndexedSeq: _*))
      .join(keys, Seq("span_md5"), "left_semi")
      .groupBy("span_md5")
      .agg(countDistinct(col("doc_id")).as("n_store_docs"))
    val probeSide = if (broadcastProbe) broadcast(bf) else bf
    store.join(probeSide, "span_md5")
      .select(col("doc_id"), col("p"), col("span_md5"), col("n_store_docs"))
  }

  /** Merge a probe's window anchors into maximal duplicated spans —
    * the gaps-and-islands step of [[Dedup.duplicateSpansExact]] applied
    * to store hits: anchors within `minTokens` of each other belong to
    * one verbatim overlap region [min p, max p + minTokens). Input: any
    * frame with (doc_id, p, n_store_docs) — [[probe]]'s output; window
    * is PARTITIONED BY doc_id (per-doc sized, never global). Output:
    * (doc_id, span_start, span_end, n_tokens, n_windows,
    * max_store_docs).
    */
  def anchorsToSpans(hits: DataFrame, minTokens: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("p")
    hits
      .withColumn("__brk",
        when(col("p") - lag(col("p"), 1).over(w) > minTokens, 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "__island")
      .agg(min(col("p")).as("span_start"),
        (max(col("p")) + minTokens).as("span_end"),
        count(lit(1)).as("n_windows"),
        max(col("n_store_docs")).as("max_store_docs"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("n_tokens"),
        col("n_windows"), col("max_store_docs"))
  }

  /** Rewrite the store with duplicate (print, doc, p) rows folded — the
    * accumulate-only append grows the bucket table past the distinct
    * bound after replays; answers are unchanged (probe counts distinct
    * docs anyway). Same-shard partitioning and within-shard span_md5
    * sort, new directory (the [[LshIndex.compactLsh]] atomicity
    * convention).
    */
  def compactStore(spark: SparkSession, srcDir: String,
      dstDir: String, filesPerPartition: Int = 1): Unit = {
    require(dstDir != srcDir, "compactStore writes to a new directory")
    graft.ParquetIO.writePartitioned(
      readStore(spark, srcDir)
        .select("shard", "span_md5", "doc_id", "p").distinct(),
      dstDir, Seq("shard"), filesPerPartition, sortCols = Seq("span_md5"))
    StoreMeta.copy(srcDir, dstDir)
  }

  /** Decontaminate-at-ingest: the [[probe]] → [[anchorsToSpans]] →
    * [[Dedup.trimSpans]] → [[append]] lifecycle as ONE lineage — the
    * production shape where every incoming batch is checked against
    * the corpus the store summarizes, corpus-duplicated spans are CUT
    * from the batch text, docs that were mostly duplication are
    * DROPPED, and only the curated survivors' prints enter the store
    * (so the next batch is probed against corpus+survivors, never
    * against text a trim already removed).
    *
    * A doc is dropped when its kept-token fraction falls below
    * `minKeptFrac` (Lee-et-al style: a doc that is mostly verbatim
    * corpus text contributes nothing new). Dropped docs keep their
    * audit row (dropped=true) but append nothing.
    *
    * Returns the batch audit: (doc_id, text, n_tokens_before,
    * n_tokens_kept, dropped) with `text` already trimmed. The returned
    * frame re-reads the appended store only through [[probe]]-shaped
    * consumers; the append itself runs EAGERLY inside this call (it is
    * a store mutation, not a query), after which the batch-sized
    * intermediates this call persisted are released — streaming-ingest
    * safe.
    */
  def ingestCurate(spark: SparkSession, batch: DataFrame, dir: String,
      minKeptFrac: Double = 0.3,
      broadcastProbe: Boolean = true): DataFrame = {
    require(minKeptFrac >= 0.0 && minKeptFrac <= 1.0,
      s"minKeptFrac must be in [0,1], got $minKeptFrac")
    val __mk = CacheRegistry.mark(spark)
    val (k, _) = readGeometry(dir)
    val hits = probe(spark, batch, dir, broadcastProbe)
    val trimmed = Dedup.trimSpans(
      batch.select(col("doc_id").cast("long").as("doc_id"), col("text")),
      anchorsToSpans(hits, k))
    val audited = trimmed.withColumn("dropped",
      when(col("n_tokens_before") === 0L, lit(true))
        .otherwise(col("n_tokens_kept").cast("double")
          / col("n_tokens_before") < minKeptFrac))
    // one computation feeds both the store append and the returned
    // audit: localCheckpoint materializes the curated batch (answer-
    // sized: one row per batch doc) and cuts the probe lineage, so the
    // append below and the caller's reads never recompute the probe
    val out = audited.localCheckpoint(true)
    append(spark, out.filter(!col("dropped")).select("doc_id", "text"), dir)
    // the probe's tracked batch fingerprints served every consumer
    // (trim + append ran eagerly above) — release them now so ingest
    // cadence doesn't grow executor storage one cached frame per batch
    CacheRegistry.releaseSince(spark, __mk)
    out
  }
}
