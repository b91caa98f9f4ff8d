package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.z_order_key

/** Multi-dimensional data layout for scan efficiency — the write-side
  * half of the 100 TB story.
  *
  * A table laid out in arrival order answers a predicate on ANY column by
  * reading every file. Sorting by one column fixes that column and
  * destroys the other. The Z-order key interleaves the bits of two
  * columns so that range-partitioning by the single key yields files
  * whose min/max footer statistics are tight in BOTH dimensions — row-
  * group and file skipping then prunes scans under predicates on either
  * column (Delta/Iceberg `OPTIMIZE ZORDER BY` is this exact trick).
  * The key is computed by a codegen'd Catalyst expression
  * ([[graft.functions.BitInterleave]]) — pure bit arithmetic, map-side,
  * no shuffle of its own; the only shuffle is the explicit range
  * repartition that IS the layout operation.
  */
object Layout {

  /** Append a deterministic Z-order key over two integral columns (low
    * 31 bits each — see [[graft.functions.BitInterleave]]).
    *
    * 31-BIT DOMAIN CONTRACT: values ≥ 2^31 are interleaved modulo 2^31,
    * which silently destroys the locality the key exists for (far-apart
    * ids collide, every file spans the whole domain). For wide-domain
    * keys (snowflake ids, epoch-millis), pre-map to a dense/bucketed
    * 31-bit space first — e.g. `dense_rank`, `value / bucketWidth`, or
    * epoch-days. `checkRange = true` adds one aggregate pass that FAILS
    * on out-of-range values instead of degrading silently.
    */
  def withZOrderKey(
      df: DataFrame, colA: String, colB: String,
      keyName: String = "z_key",
      checkRange: Boolean = false): DataFrame = {
    if (checkRange) {
      val lim = 1L << 31
      val r = df.agg(
        min(col(colA).cast("long")).as("na"), max(col(colA).cast("long")).as("xa"),
        min(col(colB).cast("long")).as("nb"), max(col(colB).cast("long")).as("xb")).head()
      def ok(lo: Long, hi: Long) = lo >= 0L && hi < lim
      require(r.anyNull || (ok(r.getLong(0), r.getLong(1)) && ok(r.getLong(2), r.getLong(3))),
        s"z-order columns must fit [0, 2^31): $colA in [${r.get(0)}, ${r.get(1)}], " +
          s"$colB in [${r.get(2)}, ${r.get(3)}] — pre-bucket wide domains first")
    }
    df.withColumn(keyName,
      z_order_key(col(colA).cast("long"), col(colB).cast("long")))
  }

  /** Rewrite `df` into `numFiles` parquet files range-partitioned and
    * sorted by the Z-order key of (colA, colB). Range partitioning keeps
    * the global key order across files (file k's keys all precede file
    * k+1's), so both per-file and per-row-group statistics stay tight.
    */
  def writeZOrdered(
      df: DataFrame, colA: String, colB: String, path: String,
      numFiles: Int = 32): Unit = {
    graft.ParquetIO.requireNotOverwritingInput(df, path)
    withZOrderKey(df, colA, colB)
      .repartitionByRange(numFiles, col("z_key"))
      .sortWithinPartitions("z_key")
      .write.mode("overwrite").option("compression", "zstd").parquet(path)
  }

  /** Per-file min/max spans of two columns — the clustering-quality
    * telemetry for a layout rewrite: span fractions near (file count)⁻¹ᐟ²
    * per dimension mean a predicate on either column prunes most files.
    * Groups by `input_file_name()`, so it reads the two columns IN FULL
    * (column-pruned, but data pages, not just footers — min/max/count per
    * file could in principle come from footer statistics alone; this
    * implementation trades that saving for a plain aggregate). Run it as
    * an occasional audit, not per query.
    */
  def fileSpans(spark: org.apache.spark.sql.SparkSession,
      path: String, colA: String, colB: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        min(col(colA)).as("min_a"), max(col(colA)).as("max_a"),
        min(col(colB)).as("min_b"), max(col(colB)).as("max_b"))

  // ---- publish-to-training shard export ----

  /** Deterministic TOKEN-balanced shard assignment — the "export the
    * curated corpus as training shards" boundary. Every doc gets
    * shard_id = its exclusive global token offset (under the doc_id
    * total order) div ceil(total_tokens / nShards): shards are
    * contiguous doc_id ranges whose token mass differs by at most one
    * document — the balance a training loader wants (row-count balance
    * skews step time when doc lengths skew), and a pure function of the
    * corpus, so any engine replays the exact assignment.
    *
    * The offset is [[Packing.packSequences]]'s two-level distributed
    * prefix scan (range buckets → parallel local windows → #buckets-row
    * offset join) — no global single-partition window at any size. One
    * extra corpus pass computes total_tokens (a scalar aggregate).
    *
    * Output: (doc_id, text, n_tokens, shard_id).
    */
  def publishShards(docs: DataFrame, nShards: Int,
      docBucket: Long = 1024L): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val withTok = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("text"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_chunk_tokens"))
    val total = withTok.agg(coalesce(sum("n_chunk_tokens"), lit(0L)))
      .head().getLong(0)
    require(total > 0, "publishShards needs a corpus with at least one token")
    val budget = (total + nShards - 1) / nShards
    Packing.packSequences(withTok.withColumn("chunk_id", lit(0L)),
        budget, docBucket)
      .select(col("doc_id"), col("text"),
        col("n_chunk_tokens").as("n_tokens"),
        // clamp (advisor r17): zero-token docs sorting after the last
        // token have exclusive offset == total, and total div
        // ceil(total/nShards) can reach nShards — least() keeps the
        // documented [0, nShards) range for consumers
        least(col("seq_id"), lit(nShards - 1L)).cast("int").as("shard_id"))
  }

  /** Integrity manifest over a [[publishShards]] assignment: one row per
    * shard with doc count, token mass, and an ORDER-INVARIANT content
    * digest — bit_xor of each doc's 56-bit md5 half (the portable hash
    * family every sketch here uses), so the digest is insensitive to
    * row order within a shard, re-computable from the published files
    * alone, and replayable in any engine with md5. A consumer verifies
    * a shard by recomputing (n_docs, n_tokens, digest) from what it
    * read; bounded output (nShards rows).
    */
  def shardManifest(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        expr("bit_xor(CAST(conv(substring(md5(text), 1, 14), 16, 10) AS BIGINT))")
          .as("digest"))

  /** Publish the assignment: one hive partition per shard (sorted by
    * doc_id within, `filesPerPartition` files each), then the manifest
    * recomputed FROM THE READ-BACK — returning it proves the published
    * bytes, not the plan that produced them. Schema-explicit read (the
    * all-digit-partition inference rule every store here follows).
    */
  def writeShards(spark: org.apache.spark.sql.SparkSession,
      assigned: DataFrame, dir: String,
      filesPerPartition: Int = 1): DataFrame = {
    graft.ParquetIO.writePartitioned(
      assigned.select("doc_id", "text", "n_tokens", "shard_id"),
      dir, Seq("shard_id"), filesPerPartition, sortCols = Seq("doc_id"))
    shardManifest(readShards(spark, dir))
  }

  private val shardSchema =
    "doc_id BIGINT, text STRING, n_tokens BIGINT, shard_id INT"

  private def readShards(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    spark.read.schema(shardSchema).parquet(dir)

  /** [[publishShards]] + [[writeShards]] + a frozen-geometry `_meta`
    * sidecar — the entry point of the INCREMENTAL publish lifecycle:
    * the sidecar freezes (budget, max published doc_id, next free
    * shard id) so [[appendShards]] can extend the export without
    * touching — or even reading — what training loaders already
    * consumed. Returns the read-back manifest ([[writeShards]]).
    */
  def publishInit(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, dir: String, nShards: Int,
      docBucket: Long = 1024L, filesPerPartition: Int = 1): DataFrame = {
    val manifest = writeShards(spark,
      publishShards(docs, nShards, docBucket), dir, filesPerPartition)
    // geometry from bounded frames: the manifest is ≤ nShards rows
    // (total tokens + the highest occupied shard), and max doc_id is one
    // column-pruned agg over the read-back
    val rows = manifest.collect()
    val total = rows.map(_.getLong(2)).sum
    val nextShard = rows.map(_.getInt(0)).max + 1
    val maxDocId = readShards(spark, dir)
      .agg(max(col("doc_id"))).head().getLong(0)
    StoreMeta.write(dir,
      "budget" -> ((total + nShards - 1) / nShards),
      "max_doc_id" -> maxDocId, "next_shard" -> nextShard)
    manifest
  }

  /** Incremental publish: export `newDocs` as NEW shards under the
    * frozen budget — published shards are IMMUTABLE (a training loader
    * may have consumed them; appending into a half-full tail shard
    * would change bytes it already checksummed), so the append starts
    * at the next free shard id and the tail shard of the previous
    * publish simply ships short. Assignment is the same two-level
    * prefix scan over the new docs' token offsets, shifted by
    * next_shard·budget — still a pure function of (published corpus,
    * new docs), so any engine replays the exact shard ids.
    *
    * Contiguity contract (the doc_id total order every publish layout
    * here rides): every new doc_id must exceed the published
    * max_doc_id — enforced with one bounded aggregate before anything
    * writes. Returns the FULL read-back manifest (old shards verify
    * unchanged, new shards verify fresh); the meta sidecar rolls
    * forward (max_doc_id, next_shard) so appends chain.
    */
  def appendShards(spark: org.apache.spark.sql.SparkSession,
      newDocs: DataFrame, dir: String,
      docBucket: Long = 1024L, filesPerPartition: Int = 1): DataFrame = {
    val meta = StoreMeta.read(dir)
    val budget = meta("budget").toLong
    val maxDocId = meta("max_doc_id").toLong
    val nextShard = meta("next_shard").toLong
    // crash fence (advisor r18, medium): shard data commits BEFORE the
    // meta sidecar rolls forward, so a crash between the two leaves the
    // store AHEAD of its meta — a blind retry would then re-append the
    // same docs into the same shard ids past the contiguity guard,
    // silently duplicating rows shards a tailing loader may have read.
    // Detect it from the directory listing alone (one driver metadata
    // call, the StoreUpkeep health idiom) and refuse loudly.
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val maxShardOnDisk = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard_id="))
      .flatMap(s => scala.util.Try(
        s.getPath.getName.stripPrefix("shard_id=").toLong).toOption)
      .foldLeft(-1L)(math.max)
    require(maxShardOnDisk < nextShard,
      s"appendShards: store at $dir holds shard $maxShardOnDisk but _meta " +
        s"says next_shard=$nextShard — a previous append crashed between " +
        "its data write and its meta roll. Recover by deleting the " +
        s"shard_id>=$nextShard directories (and re-appending), or by " +
        "rolling _meta forward if the orphaned shards are known complete")
    val withTok = newDocs.select(col("doc_id").cast("long").as("doc_id"),
      col("text"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_chunk_tokens"))
    val bounds = withTok.agg(min(col("doc_id")), max(col("doc_id")),
      coalesce(sum(col("n_chunk_tokens")), lit(0L))).head()
    require(!bounds.isNullAt(0), "appendShards needs at least one new doc")
    require(bounds.getLong(0) > maxDocId,
      s"appendShards contiguity: new doc_ids must exceed the published " +
        s"max ($maxDocId), got ${bounds.getLong(0)} — the shard layout is " +
        "a doc_id total order")
    val pad = nextShard * budget
    // tail clamp (advisor r18, the publishShards twin): a zero-token doc
    // sorting last with the batch total an exact budget multiple has
    // exclusive offset == total and would open an otherwise-empty extra
    // shard — clamp to the batch's last OCCUPIED shard
    val total = bounds.getLong(2)
    val lastShard = (pad + math.max(total - 1, 0L)) / budget
    val assigned = Packing.packSequences(
        withTok.withColumn("chunk_id", lit(0L)), budget, docBucket)
      .select(col("doc_id"), col("text"),
        col("n_chunk_tokens").as("n_tokens"),
        least(expr(s"(($pad + global_offset) div $budget)"), lit(lastShard))
          .cast("int").as("shard_id"))
    graft.ParquetIO.writePartitioned(
      assigned.select("doc_id", "text", "n_tokens", "shard_id"),
      dir, Seq("shard_id"), filesPerPartition, mode = "append",
      sortCols = Seq("doc_id"))
    val manifest = shardManifest(readShards(spark, dir))
    val rows = manifest.collect()
    StoreMeta.write(dir, "budget" -> budget,
      "max_doc_id" -> bounds.getLong(1),
      "next_shard" -> (rows.map(_.getInt(0)).max + 1))
    manifest
  }

  /** Takedown THROUGH the published export (r18 verdict task 3) — the
    * last step of the governance story: a document forgotten from the
    * content stores but already shipped by [[publishInit]]/
    * [[appendShards]] stays in the training export until this rewrites
    * it out. Rewrites ONLY the shards holding forgotten docs (the
    * manifest's doc_id-range layout identifies them with one
    * answer-sized semi-join); every other shard stays BYTE-equal — the
    * loader-checksum contract: consumers re-verify the touched shards'
    * new manifest rows and keep trusting the rest. The meta sidecar
    * keeps its frozen geometry (budget, max_doc_id, next_shard: a
    * forgotten id is NOT re-usable — the contiguity guard still spans
    * it) and bumps `forget_gen`, the marker loaders watch to know any
    * shard may have shrunk.
    *
    * The law (oracle-gated by q_publish_forget + a PropertySpec leg for
    * ANY forget set): post-forget export ≡ the original assignment
    * minus the forgotten docs. NOT re-flowed: surviving docs keep their
    * shard ids — a cold re-publish would shift every doc after a
    * removed one into different shards and invalidate every checksum
    * downstream.
    *
    * Scale shape: one broadcast semi-join to find affected shards
    * (bounded by nShards), one partition-pruned rewrite of those
    * shards' rows (scan reads only `shard_id IN affected` directories),
    * the swap is one rename per affected shard. O(affected shards), not
    * O(export).
    */
  def forgetPublished(spark: org.apache.spark.sql.SparkSession,
      ids: DataFrame, dir: String,
      filesPerPartition: Int = 1): DataFrame =
    forgetPublishedImpl(spark, ids, dir, filesPerPartition, Int.MaxValue)

  /** [[forgetPublished]] with the crash-injection hook (`crashAfterSwaps`
    * aborts after that many per-shard steps — spec-only). The swap loop
    * is CRASH-RESUMABLE (r19 verdict task 4): the export is the one
    * store a downstream loader consumes WHILE it mutates, so a forget
    * that dies between two shard swaps must not strand a half-forgotten
    * export recoverable only by hand. Protocol:
    *
    *   1. survivors staged under `<dir>_forgetting` (live untouched);
    *   2. an INTENT file (`_forget_intent.json`: affected shard ids
    *      split partial/fully-forgotten + the target forget_gen) lands
    *      in the staging dir — write-temp-then-rename, so it appears
    *      only complete, and only after the staged data is all there;
    *   3. the per-shard swap loop, every step idempotent;
    *   4. the meta sidecar bumps to the recorded forget_gen;
    *   5. staging (intent included) is deleted.
    *
    * A crash before 2 leaves the live export untouched (stale staging
    * is garbage, cleared at the next attempt). A crash after 2 is
    * detected by the NEXT forgetPublished call, which re-runs the
    * idempotent loop to completion — roll FORWARD, never back: some
    * shards already serve post-forget bytes a loader may have
    * checksummed — bumps the meta to the intent's recorded generation,
    * and only then touches the new call's own ids.
    */
  private[graft] def forgetPublishedImpl(
      spark: org.apache.spark.sql.SparkSession,
      ids: DataFrame, dir: String, filesPerPartition: Int,
      crashAfterSwaps: Int): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    resumePendingForget(spark, dir, fs)
    val meta = StoreMeta.read(dir)
    val forget = broadcast(
      ids.select(col(ids.columns.head).cast("long").as("doc_id")).distinct())
    val store = readShards(spark, dir)
    val affected = store.join(forget, Seq("doc_id"), "left_semi")
      .select("shard_id").distinct().collect().map(_.getInt(0)).sorted
    val targetGen = meta.get("forget_gen").map(_.toLong).getOrElse(0L) + 1L
    if (affected.nonEmpty) {
      val staging = dir + "_forgetting"
      fs.delete(new org.apache.hadoop.fs.Path(staging), true)
      // survivors of the AFFECTED shards only — the scan partition-
      // prunes to them; untouched shard directories are never read
      graft.ParquetIO.writePartitioned(
        store.filter(col("shard_id").isin(affected.map(Int.box): _*))
          .join(forget, Seq("doc_id"), "left_anti")
          .select("doc_id", "text", "n_tokens", "shard_id"),
        staging, Seq("shard_id"), filesPerPartition, sortCols = Seq("doc_id"))
      // a shard whose every doc was forgotten has no staged dir — it
      // simply disappears from the export (its manifest row with it);
      // the split is recorded in the intent because the distinction is
      // exactly what a resumer can no longer infer once staged dirs
      // start being consumed by renames
      val (partial, full) = affected.partition(sid => fs.exists(
        new org.apache.hadoop.fs.Path(s"$staging/shard_id=$sid")))
      writeIntent(fs, staging, partial, full, targetGen)
      applyForgetSwaps(fs, dir, staging, partial, full, crashAfterSwaps)
    }
    StoreMeta.write(dir,
      "budget" -> meta("budget"), "max_doc_id" -> meta("max_doc_id"),
      "next_shard" -> meta("next_shard"), "forget_gen" -> targetGen)
    if (affected.nonEmpty)
      fs.delete(new org.apache.hadoop.fs.Path(dir + "_forgetting"), true)
    shardManifest(readShards(spark, dir))
  }

  private def intentPath(staging: String) =
    new org.apache.hadoop.fs.Path(staging, "_forget_intent.json")

  private def writeIntent(fs: org.apache.hadoop.fs.FileSystem,
      staging: String, partial: Seq[Int], full: Seq[Int],
      targetGen: Long): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(staging, "_forget_intent.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      (s"""{"partial":[${partial.mkString(",")}],""" +
        s""""full":[${full.mkString(",")}],"forget_gen":$targetGen}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, intentPath(staging)),
      s"forgetPublished: intent write failed under $staging")
  }

  /** The per-shard swap loop, every step idempotent against re-runs
    * from ANY crash point: a partial shard is (rename live aside if
    * still present, staged in, retired dropped) — a consumed staged dir
    * means the swap already happened, only the retired copy can remain;
    * a fully-forgotten shard is a direct delete. Re-running the whole
    * loop after a crash lands on the law's post-state.
    */
  private def applyForgetSwaps(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, staging: String, partial: Seq[Int], full: Seq[Int],
      crashAfterSwaps: Int): Unit = {
    var steps = 0
    def step(): Unit = {
      steps += 1
      if (steps >= crashAfterSwaps)
        throw new IllegalStateException(
          s"forgetPublished: injected crash after $steps swaps (spec hook)")
    }
    for (sid <- partial) {
      val live = new org.apache.hadoop.fs.Path(s"$dir/shard_id=$sid")
      val staged = new org.apache.hadoop.fs.Path(s"$staging/shard_id=$sid")
      val retired = new org.apache.hadoop.fs.Path(
        s"$dir/shard_id=$sid" + "_preforget")
      if (fs.exists(staged)) {
        if (fs.exists(live)) {
          fs.delete(retired, true)
          require(fs.rename(live, retired),
            s"forgetPublished: rename $live -> $retired failed")
        }
        require(fs.rename(staged, live),
          s"forgetPublished: rename $staged -> $live failed " +
            s"(recover the shard from $retired)")
      }
      fs.delete(retired, true)
      step()
    }
    for (sid <- full) {
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/shard_id=$sid"), true)
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$dir/shard_id=$sid" + "_preforget"), true)
      step()
    }
  }

  /** Detect and finish an interrupted [[forgetPublished]] from its
    * intent file — re-run the idempotent loop, bump the meta to the
    * recorded generation, clear the staging. No intent = nothing
    * pending (a crash before the intent write never touched the live
    * export).
    */
  private def resumePendingForget(spark: org.apache.spark.sql.SparkSession,
      dir: String, fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val staging = dir + "_forgetting"
    val p = intentPath(staging)
    val bytes: Option[Array[Byte]] =
      try {
        val in = fs.open(p)
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](4096)
          var n = in.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          Some(buf.toByteArray)
        } finally in.close()
      } catch { case _: java.io.FileNotFoundException => None }
    bytes.foreach { b =>
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new String(b, java.nio.charset.StandardCharsets.UTF_8))
      def idsOf(field: String): Seq[Int] = {
        val node = root.get(field)
        (0 until node.size()).map(node.get(_).asInt())
      }
      applyForgetSwaps(fs, dir, staging, idsOf("partial"), idsOf("full"),
        Int.MaxValue)
      val meta = StoreMeta.read(dir)
      StoreMeta.write(dir,
        "budget" -> meta("budget"), "max_doc_id" -> meta("max_doc_id"),
        "next_shard" -> meta("next_shard"),
        "forget_gen" -> root.get("forget_gen").asLong())
      fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    }
  }
}
