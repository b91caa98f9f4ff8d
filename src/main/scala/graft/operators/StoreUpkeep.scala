package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Self-scheduling compaction policy for the persisted content stores
  * ([[SpanStore]], [[LshIndex]], IVFADC in [[Similarity]]) — the r17
  * verdict's missing piece: every append drops ≥1 file per touched
  * partition, a Bloom word generation, and (LSH) a sigs file, and
  * compaction folds all of it — but nothing SCHEDULED it, so batch
  * ingest loops needed external bookkeeping. This helper makes the
  * decision driver-side from directory listings alone (O(#partition
  * dirs) filesystem metadata calls — the fileSpans/footer cost class,
  * zero Spark jobs) and, when the documented threshold trips, runs the
  * store's compact-and-swap in place.
  *
  * Policy ([[needsCompaction]]): compact when the WIDEST hive
  * partition exceeds `maxPartitionFiles` files (probe open/footer cost
  * grows with that maximum, not the mean) OR the append-only sidecar
  * (Bloom generations / sigs files) exceeds `maxSidecarFiles` — the
  * sidecar otherwise grows one row-set per append forever even when
  * the data partitions stay narrow. Pending tombstones are REPORTED
  * ([[Health]]) but do not trigger by default: a takedown is applied
  * lazily by design, and `compactOnTombstones = true` opts a
  * governance-driven loop into eager physical removal.
  *
  * Two swap protocols:
  *
  *   - [[compactInPlace]] (the streaming in-place precedent, now owned
  *     here and tombstone-aware): compact into `<dir>_compacting*`,
  *     rename each live directory aside to `*_precompact`, rename the
  *     staged one in, drop the retired copy — atomic per rename on
  *     HDFS/POSIX; right for single-writer ingest loops that pause
  *     serving around maintenance. A crash mid-swap strands data
  *     recoverably under `_precompact`/`_compacting`, never silently.
  *     After the swap the tombstone sidecar is DELETED: the staged
  *     store already applied it physically, and a live leftover would
  *     keep every probe paying the anti-join and block re-ingest of
  *     the forgotten ids forever.
  *   - [[compactNewGeneration]] (the `_current` pointer): for stores
  *     PROBED while compacted, and for object stores with no atomic
  *     rename — no live directory is ever mutated; readers resolve the
  *     pointer once per read ([[StoreGen]]) and the previous generation
  *     stays as their grace window.
  */
object StoreUpkeep {

  /** What a store's kind means to the policy: hive partition prefix,
    * the directory suffixes its compaction stages (and that the swap
    * must move), the sidecar whose per-append growth is measured, and
    * the staging rewrite itself.
    */
  sealed trait Kind {
    def partitionPrefix: String
    /** Suffixes staged by `compact` and swapped live; "" = the data. */
    def swapSuffixes(fs: FileSystem, staging: String): Seq[String]
    /** Append-only sidecar file count (0 when the kind has none). */
    def sidecarFiles(fs: FileSystem, dir: String): Int
    def compact(spark: SparkSession, dir: String, staging: String): Unit
    /** Compact INCLUDING frozen sidecars — a complete standalone store
      * at `staging`, what a generation flip serves ([[compact]] skips
      * restaging sidecars the in-place swap leaves untouched).
      */
    def compactFull(spark: SparkSession, dir: String, staging: String): Unit =
      compact(spark, dir, staging)
  }

  case object SpanKind extends Kind {
    val partitionPrefix = "shard="
    def swapSuffixes(fs: FileSystem, staging: String): Seq[String] =
      Seq("", "_meta") ++ Seq("_bloom", "_bloom_meta")
        .filter(s => fs.exists(new Path(staging + s)))
    // Bloom generations: the widest bloom shard dir in files — one word
    // row-set lands per append, the growth compaction OR-folds
    def sidecarFiles(fs: FileSystem, dir: String): Int =
      maxPartitionFiles(fs, dir + "_bloom", "shard=")
    def compact(spark: SparkSession, dir: String, staging: String): Unit =
      SpanStore.compactStore(spark, dir, staging)
  }

  case object LshKind extends Kind {
    val partitionPrefix = "shard="
    def swapSuffixes(fs: FileSystem, staging: String): Seq[String] =
      Seq("", "_sigs", "_meta")
    // the signature sidecar takes one file per append
    def sidecarFiles(fs: FileSystem, dir: String): Int =
      flatFileCount(fs, dir + "_sigs")
    def compact(spark: SparkSession, dir: String, staging: String): Unit =
      LshIndex.compactLsh(spark, dir, staging)
  }

  case object IvfPqKind extends Kind {
    val partitionPrefix = "centroid_id="
    // codebook/pq sidecars are FROZEN (never grow, never restaged) —
    // only the code table swaps
    def swapSuffixes(fs: FileSystem, staging: String): Seq[String] = Seq("")
    def sidecarFiles(fs: FileSystem, dir: String): Int = 0
    def compact(spark: SparkSession, dir: String, staging: String): Unit =
      Similarity.compactIvfPqCodes(spark, dir, staging,
        filesPerPartition = 1)
    // a new generation must carry the frozen sidecars too — readers
    // resolve ALL their paths through the pointer
    override def compactFull(spark: SparkSession, dir: String,
        staging: String): Unit =
      Similarity.compactIvfPq(spark, dir, staging, filesPerPartition = 1)
  }

  /** Small-file health of a store, from directory listings only. */
  final case class Health(
    maxPartitionFiles: Int,
    sidecarFiles: Int,
    pendingTombstones: Boolean)

  private[graft] def maxPartitionFiles(
      fs: FileSystem, dir: String, prefix: String): Int = {
    val root = new Path(dir)
    if (!fs.exists(root)) 0
    else fs.listStatus(root).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(d => fs.listStatus(d.getPath)
        .count(_.getPath.getName.endsWith(".parquet")))
      .foldLeft(0)(math.max)
  }

  private def flatFileCount(fs: FileSystem, dir: String): Int = {
    val root = new Path(dir)
    if (!fs.exists(root)) 0
    else fs.listStatus(root).count(_.getPath.getName.endsWith(".parquet"))
  }

  def health(spark: SparkSession, dir0: String, kind: Kind): Health = {
    val dir = StoreGen.resolve(dir0, spark.sparkContext.hadoopConfiguration)
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Health(maxPartitionFiles(fs, dir, kind.partitionPrefix),
      kind.sidecarFiles(fs, dir), Tombstones.exists(dir))
  }

  /** The documented trigger. Thresholds default to the streaming
    * loops' warn watermark (64 files — where per-file open/footer cost
    * becomes measurable next to a pruned probe scan).
    */
  def needsCompaction(h: Health, maxPartitionFiles: Int = 64,
      maxSidecarFiles: Int = 64,
      compactOnTombstones: Boolean = false): Boolean =
    h.maxPartitionFiles > maxPartitionFiles ||
      h.sidecarFiles > maxSidecarFiles ||
      (compactOnTombstones && h.pendingTombstones)

  /** Measure, decide, and (when triggered) compact-and-swap. Returns
    * true iff a compaction ran. Serving is unchanged across the swap
    * (compaction preserves answers by each store's law) and the
    * tombstone sidecar is cleared with it. With `generational = true`
    * the triggered compaction is [[compactNewGeneration]] — the
    * always-on protocol (no live directory mutated, pointer flip last)
    * — instead of [[compactInPlace]]'s rename swap.
    */
  def maybeCompact(spark: SparkSession, dir: String, kind: Kind,
      maxPartitionFiles: Int = 64, maxSidecarFiles: Int = 64,
      compactOnTombstones: Boolean = false,
      generational: Boolean = false): Boolean = {
    val h = health(spark, dir, kind)
    val go = needsCompaction(h, maxPartitionFiles, maxSidecarFiles,
      compactOnTombstones)
    if (go) {
      if (generational) compactNewGeneration(spark, dir, kind)
      else compactInPlace(spark, dir, kind)
    }
    go
  }

  /** Measure codebook drift and (when the documented threshold trips)
    * retrain-and-swap — [[maybeCompact]]'s twin for CODEBOOK health
    * (r19 verdict task 6): [[Similarity.ivfDriftReport]] measures,
    * [[Similarity.retrainIvfPq]] acts, and this connects them so a
    * self-scheduling ingest loop covers codebook staleness like it
    * covers small-file growth. Returns true iff a retrain ran.
    *
    * The policy, over the drift report of `batch` (a recent sample of
    * what the store is being asked to absorb — the loop's latest
    * micro-batch is the natural choice) against the store's frozen
    * codebook:
    *
    *   - `minMeanCos`: fire when the batch's n_batch-weighted mean
    *     assignment cosine falls BELOW this — vectors land ever farther
    *     from their nearest centroid, codes quantize coarser, recall at
    *     fixed nprobe decays. 0.70 default: an in-distribution batch on
    *     a trained codebook sits well above it, a drifted draw (mass in
    *     directions the codebook never saw) well below.
    *   - `maxMassSkew`: fire when the most-loaded centroid's batch mass
    *     exceeds this multiple of the uniform share (n_batch_max ·
    *     num_centroids / n_batch_total) — assignment piling onto few
    *     centroids decays probe pruning toward a full scan even when
    *     cosines look healthy. 4.0 default: a balanced codebook keeps
    *     the max share within a small factor of uniform; a collapsed
    *     corpus concentrates an order of magnitude.
    *
    * Cost when the policy does NOT fire: exactly the drift report — one
    * broadcast-codebook assignment pass over the batch, a footer-only
    * store walk, an answer-sized (num_centroids rows) collect. The
    * retrain itself is the offline-job-shaped rebuild
    * ([[Similarity.retrainIvfPq]], k-means via `trainIters`), swapped
    * in place or — `generational = true` — staged as generation N+1
    * behind the atomic pointer flip.
    */
  def maybeRetrain(spark: SparkSession, corpus: org.apache.spark.sql.DataFrame,
      batch: org.apache.spark.sql.DataFrame, dir: String,
      minMeanCos: Double = 0.70, maxMassSkew: Double = 4.0,
      trainIters: Int = 2, generational: Boolean = false): Boolean = {
    val report = Similarity.ivfDriftReport(spark, dir, batch).collect()
    val hit = report.filter(_.getAs[Long]("n_batch") > 0L)
    if (hit.isEmpty) false
    else {
      val nBatch = hit.map(_.getAs[Long]("n_batch")).sum
      val meanCos = hit.map(r =>
        r.getAs[Long]("n_batch") * r.getAs[Double]("mean_cos_batch")).sum /
        nBatch
      val skew = hit.map(_.getAs[Long]("n_batch")).max.toDouble *
        report.length / nBatch
      val fire = meanCos < minMeanCos || skew > maxMassSkew
      if (fire)
        Similarity.retrainIvfPq(spark, corpus, dir, trainIters, generational)
      fire
    }
  }

  /** The unconditional in-place compact-and-swap (see the object doc
    * for the protocol). Public for governance loops that already know
    * they want the rewrite (e.g. eager takedown application).
    *
    * SINGLE-WRITER contract (advisor r18): the whole
    * read-compact-swap-clear sequence assumes no concurrent `forget` or
    * append on the same store. The tombstone clear is SNAPSHOTTED — only
    * the sidecar files that existed when compaction STARTED (and were
    * therefore applied physically) are deleted, so a forget racing the
    * tail of a compaction leaves its ids pending rather than silently
    * discarded — but a forget racing the RENAME window can still land in
    * a directory about to be swapped aside; serialize writers.
    */
  def compactInPlace(spark: SparkSession, dir0: String, kind: Kind): Unit = {
    val dir = StoreGen.resolve(dir0, spark.sparkContext.hadoopConfiguration)
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = dir + "_compacting"
    // a dead prior attempt's staging is garbage — clear every possible
    // suffix before rewriting (the streaming-precedent hygiene)
    for (sfx <- Seq("", "_sigs", "_meta", "_bloom", "_bloom_meta"))
      fs.delete(new Path(staging + sfx), true)
    // snapshot the tombstone files the compaction is ABOUT to apply:
    // these, and only these, are cleared after the swap
    val tombSnapshot = Tombstones.listFiles(fs, dir)
    kind.compact(spark, dir, staging)
    swapStaged(fs, dir, staging, kind.swapSuffixes(fs, staging))
    // compaction applied the snapshotted tombstones physically — a live
    // leftover would tax every probe and block forgotten-id re-ingest;
    // ids forgotten AFTER the snapshot stay pending (never lost)
    Tombstones.clear(fs, dir, tombSnapshot)
  }

  /** Compact into a NEW GENERATION and flip the `_current` pointer —
    * the ALWAYS-ON serving alternative to [[compactInPlace]] (r18
    * verdict task 4): no directory a reader could be inside is ever
    * mutated. The current generation compacts (tombstones applied,
    * sidecars included — [[Kind.compactFull]]) into `<dir>_g<N+1>`, the
    * pointer flips LAST (atomic single-file replace, [[StoreGen]]), and
    * generation N−1 — not N — is deleted: an in-flight read that
    * resolved the pointer before the flip finishes on generation N's
    * intact directories; only a read spanning TWO whole compactions
    * could lose its files. Works on object stores: the staged write is
    * all-new objects, the flip is one tiny object replace, no
    * multi-rename window exists. Single-WRITER like every compaction
    * here (concurrent appends/forgets must serialize with it — an
    * append landing in generation N after the flip is lost with N's
    * retirement). Returns the new generation number.
    */
  def compactNewGeneration(spark: SparkSession, dir: String,
      kind: Kind): Long = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(hconf)
    val n = StoreGen.generation(dir, hconf)
    val cur = StoreGen.path(dir, n)
    val next = n + 1
    val nextPath = StoreGen.path(dir, next)
    // every suffix any store kind can carry — including the tombstone
    // sidecar pair: compaction applies tombstones physically, so the
    // retired generation's `_tomb` must be reclaimed WITH it or it
    // leaks one orphan pair per post-forget compaction (advisor r19)
    val allSuffixes = Seq("", "_sigs", "_meta", "_bloom", "_bloom_meta",
      "_codebook", "_pq", "_tomb", "_tomb_meta")
    // a dead prior attempt's staging is garbage
    allSuffixes.foreach(sfx => fs.delete(new Path(nextPath + sfx), true))
    kind.compactFull(spark, cur, nextPath)
    StoreGen.setGeneration(dir, next, hconf)
    // grace retention: generation N stays for in-flight readers; N−1
    // (which no reader can have resolved since the PREVIOUS flip) goes
    if (n >= 1) allSuffixes.foreach(sfx =>
      fs.delete(new Path(StoreGen.path(dir, n - 1) + sfx), true))
    next
  }

  /** Swap a staged rewrite into place: for each suffix, rename the live
    * directory aside to `*_precompact`, rename the staged one in, drop
    * the retired copy — atomic per rename on HDFS/POSIX. A crash
    * mid-swap strands data recoverably under `_precompact`/the staging
    * name, never silently. Shared by [[compactInPlace]] and
    * [[Similarity.retrainIvfPq]] (which swaps the sidecars too, since a
    * retrain replaces the codebooks the compaction path keeps frozen).
    */
  private[graft] def swapStaged(fs: FileSystem, dir: String,
      staging: String, suffixes: Seq[String]): Unit =
    for (sfx <- suffixes) {
      val live = new Path(dir + sfx)
      val retired = new Path(dir + sfx + "_precompact")
      fs.delete(retired, true)
      require(fs.rename(live, retired),
        s"swapStaged: rename $live -> $retired failed")
      require(fs.rename(new Path(staging + sfx), live),
        s"swapStaged: rename ${staging + sfx} -> $live failed " +
          s"(recover the directory from $retired)")
      fs.delete(retired, true)
    }
}
