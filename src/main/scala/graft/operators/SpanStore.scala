package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted span-fingerprint store — the incremental-maintenance form
  * of [[Dedup.duplicateSpansExact]]: the corpus' stride-1 `minTokens`-
  * token window md5s live as a hive-partitioned bucket table, new
  * batches APPEND their fingerprints under the frozen geometry, and a
  * probe answers "which of this batch's token windows already appear
  * in the corpus" WITHOUT recomputing anything corpus-sized — the
  * production shape of exact-substring dedup at ingest cadence (the
  * [[LshIndex]] lifecycle applied to the ExactSubstr family; LSH
  * stores near-dup signatures, this stores exact window prints).
  *
  * Layout: `dir/shard=<h>/…` where shard = the FIRST HEX CHAR of the
  * window md5 (16 fixed shards — deterministic, engine-portable, and
  * the DuckDB oracle replays it as substr(md5, 1, 1)); rows are
  * (shard, span_md5, doc_id, p). A probe's store scan partition-prunes
  * to the shards the batch's own fingerprints hash to — a trickle
  * batch touches few directories, a backfill touches all 16; either
  * way the join is md5-keyed and duplication-proportional, never
  * all-pairs. `dir_meta/meta.json` freezes minTokens ([[StoreMeta]]).
  *
  * Append is a pure accumulate (duplicate rows across appends are
  * legal — probe counts DISTINCT store docs per print), so replayed
  * appends can only repeat rows, never change answers.
  */
object SpanStore {

  private def fingerprints(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(0), size(col("__toks")) - k)).as("__p"))
      .select(col("doc_id"), col("__p").cast("long").as("p"),
        md5(concat_ws(" ",
          slice(col("__toks"), col("__p") + 1, lit(k)))).as("span_md5"))
      .withColumn("shard", substring(col("span_md5"), 1, 1))

  private def readMeta(dir: String): Int = StoreMeta.read(dir)("min_tokens").toInt

  /** Cold-build the store over `docs`. */
  def write(docs: DataFrame, dir: String, minTokens: Int = 16,
      filesPerPartition: Int = 1): Unit = {
    require(minTokens > 1, s"minTokens must be > 1, got $minTokens")
    graft.ParquetIO.writePartitioned(fingerprints(docs, minTokens), dir,
      Seq("shard"), filesPerPartition)
    StoreMeta.write(dir, "min_tokens" -> minTokens)
  }

  /** Append a batch's fingerprints under the frozen `min_tokens`. */
  def append(spark: SparkSession, batch: DataFrame, dir: String): Unit = {
    val k = readMeta(dir)
    graft.ParquetIO.writePartitioned(fingerprints(batch, k), dir,
      Seq("shard"), filesPerPartition = 1, mode = "append")
  }

  /** Which of `batch`'s windows already appear in the store, and in how
    * many distinct STORE documents: (doc_id, p, span_md5,
    * n_store_docs). Batch ids are assumed new to the store (ingest
    * order is probe-then-append, the [[LshIndex.probe]] convention); a
    * doc probed against a store that already contains it reports its
    * own prints back. Feed the hits to [[Dedup.trimSpans]] via the
    * usual gaps-and-islands merge, or drop batch docs whose hit
    * fraction crosses a cut.
    */
  def probe(spark: SparkSession, batch: DataFrame, dir: String): DataFrame = {
    val k = readMeta(dir)
    val bf = CacheRegistry.track(fingerprints(batch, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // partition-pruned store scan: only the shards this batch hashes to.
    // The shard universe is 16 hex values, so the collect is bounded by
    // construction and buys a STATIC PartitionFilters IN-list (planning-
    // time directory elimination, not a runtime join the optimizer may
    // or may not convert to dynamic pruning).
    val shards = bf.select("shard").distinct().collect().map(_.getString(0))
    val store = spark.read.parquet(dir)
      .filter(col("shard").isin(shards.toIndexedSeq: _*))
      .groupBy("span_md5")
      .agg(countDistinct(col("doc_id")).as("n_store_docs"))
    bf.join(store, "span_md5")
      .select(col("doc_id"), col("p"), col("span_md5"), col("n_store_docs"))
  }

  /** Rewrite the store with duplicate (print, doc, p) rows folded — the
    * accumulate-only append grows the bucket table past the distinct
    * bound after replays; answers are unchanged (probe counts distinct
    * docs anyway). Same-shard partitioning, new directory (the
    * [[LshIndex.compactLsh]] atomicity convention).
    */
  def compactStore(spark: SparkSession, srcDir: String,
      dstDir: String, filesPerPartition: Int = 1): Unit = {
    require(dstDir != srcDir, "compactStore writes to a new directory")
    graft.ParquetIO.writePartitioned(
      spark.read.parquet(srcDir)
        .select("shard", "span_md5", "doc_id", "p").distinct(),
      dstDir, Seq("shard"), filesPerPartition)
    StoreMeta.copy(srcDir, dstDir)
  }
}
