package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CacheRegistry, Dedup, LshIndex}

/** Laws for the persisted MinHash-LSH store (incremental near-dup
  * maintenance). The oracle (q_lsh_append) replays the cold chain in
  * DuckDB; these specs pin the pieces the oracle composes — the delta
  * (probe) semantics, the frozen-geometry sidecar, the duplicate guard,
  * and the partition-pruned probe scan shape.
  */
class LshIndexSpec extends AnyFunSuite {
  import TestSpark.spark

  private val docsPath = "/root/testdata/sf0.001/documents.parquet"
  private lazy val docs = spark.read.parquet(docsPath).cache()

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def freshStore(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  test("seed + append reads back the cold-rebuild pair set") {
    val idx = freshStore("lsh-append")
    LshIndex.write(docs.filter(col("doc_id") % 2 === 0), idx)
    LshIndex.append(spark, docs.filter(col("doc_id") % 2 === 1), idx)
    val got = pairSet(LshIndex.lshPairs(spark, idx, threshold = 0.5))
    val cold = pairSet(Dedup.minHashNearDupPortable(docs, threshold = 0.5))
    CacheRegistry.release(spark)
    assert(got == cold && cold.nonEmpty,
      s"store read-back must equal the cold candidate path " +
        s"(got ${got.size}, cold ${cold.size})")
  }

  test("probe is exactly the pair-set delta, disjoint from the seed pairs") {
    val idx = freshStore("lsh-probe")
    val seed = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    LshIndex.write(seed, idx)
    val old = pairSet(LshIndex.lshPairs(spark, idx, threshold = 0.5))
    val delta = pairSet(LshIndex.probe(spark, batch, idx, threshold = 0.5))
    val cold = pairSet(Dedup.minHashNearDupPortable(docs, threshold = 0.5))
    CacheRegistry.release(spark)
    assert((old & delta).isEmpty,
      "probe pairs all involve a batch doc; seed-only pairs are the store's")
    assert(old ++ delta == cold && delta.nonEmpty,
      s"seed pairs ∪ probe delta must equal the cold rebuild " +
        s"(old ${old.size}, delta ${delta.size}, cold ${cold.size})")
  }

  test("probe shuffle path (broadcastProbe=false) equals the broadcast path") {
    val idx = freshStore("lsh-probe-shuffle")
    val batch = docs.filter(col("doc_id") % 2 === 1)
    LshIndex.write(docs.filter(col("doc_id") % 2 === 0), idx)
    val bcast = pairSet(LshIndex.probe(spark, batch, idx))
    val shuffled = pairSet(
      LshIndex.probe(spark, batch, idx, broadcastProbe = false))
    CacheRegistry.release(spark)
    assert(bcast == shuffled && bcast.nonEmpty)
  }

  test("re-appending the same batch behind dedupeIds is a no-op") {
    val idx = freshStore("lsh-dup")
    val batch = docs.filter(col("doc_id") % 2 === 1)
    LshIndex.write(docs.filter(col("doc_id") % 2 === 0), idx)
    LshIndex.append(spark, batch, idx)
    val bucketRows = spark.read.parquet(idx).count()
    val sigRows = spark.read.parquet(idx + "_sigs").count()
    val before = pairSet(LshIndex.lshPairs(spark, idx, threshold = 0.5))
    LshIndex.append(spark, batch, idx, dedupeIds = true)
    val after = pairSet(LshIndex.lshPairs(spark, idx, threshold = 0.5))
    CacheRegistry.release(spark)
    assert(spark.read.parquet(idx).count() == bucketRows)
    assert(spark.read.parquet(idx + "_sigs").count() == sigRows)
    assert(after == before)
  }

  test("append and probe take their geometry from the frozen sidecar") {
    // non-default family: if append/probe used the write-time DEFAULTS
    // instead of the meta sidecar, the read-back would diverge from the
    // cold build at the same parameters
    val idx = freshStore("lsh-geom")
    LshIndex.write(docs.filter(col("doc_id") % 2 === 0), idx,
      numHashes = 8, bands = 2, shingleSize = 2, nShards = 4)
    LshIndex.append(spark, docs.filter(col("doc_id") % 2 === 1), idx)
    val got = pairSet(LshIndex.lshPairs(spark, idx, threshold = 0.5))
    val cold = pairSet(Dedup.minHashNearDupPortable(docs,
      numHashes = 8, bands = 2, shingleSize = 2, threshold = 0.5))
    CacheRegistry.release(spark)
    assert(got == cold && cold.nonEmpty)
  }

  test("compactLsh preserves the pair set and bounds files per shard") {
    val idx = freshStore("lsh-compact")
    val out = freshStore("lsh-compacted")
    // write + append accumulates ≥ 2 files in every touched shard
    LshIndex.write(docs.filter(col("doc_id") % 2 === 0), idx, nShards = 4)
    LshIndex.append(spark, docs.filter(col("doc_id") % 2 === 1), idx)
    val before = pairSet(LshIndex.lshPairs(spark, idx, threshold = 0.5))
    LshIndex.compactLsh(spark, idx, out)
    val after = pairSet(LshIndex.lshPairs(spark, out, threshold = 0.5))
    CacheRegistry.release(spark)
    assert(after == before && before.nonEmpty)
    // at most filesPerPartition=1 parquet file per shard directory
    val shardDirs = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .filter(p => p.getFileName.toString.startsWith("shard="))
      .iterator()
    var checked = 0
    while (shardDirs.hasNext) {
      val d = shardDirs.next()
      val n = java.nio.file.Files.list(d)
        .filter(_.toString.endsWith(".parquet")).count()
      assert(n <= 1, s"shard dir $d holds $n files after compaction")
      checked += 1
    }
    assert(checked > 0, "compaction produced no shard directories")
  }

  test("ingestDedup: drops store near-dups and keep-first intra-batch dups; appends only survivors") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val seed = Seq(0L -> base,
      2L -> "totally different text about something else entirely here")
      .toDF("doc_id", "text")
    val batch = Seq(
      1L -> base,                                    // near-dups the store -> dropped
      3L -> "novel one unique words nothing shared", // clean -> kept
      5L -> "fresh iota kappa lambda mu nu xi omicron pi", // clean, first of the intra pair -> kept
      7L -> "fresh iota kappa lambda mu nu xi omicron pi") // dups 5 -> dropped (keep-first)
      .toDF("doc_id", "text")
    val idx = freshStore("lsh-ingest-dedup")
    LshIndex.write(seed, idx)
    val audit = LshIndex.ingestDedup(spark, batch, idx)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_store_dups"), r.getAs[Long]("n_batch_dups"),
          r.getAs[Boolean]("dropped"))).toMap
    assert(audit(1L)._1 >= 1 && audit(1L)._3, s"doc 1 must drop on store dup: $audit")
    assert(audit(3L) == ((0L, 0L, false)), s"clean doc kept: $audit")
    assert(audit(5L)._2 == 0L && !audit(5L)._3, s"first of the pair kept: $audit")
    assert(audit(7L)._2 >= 1 && audit(7L)._3, s"second of the pair dropped: $audit")
    // only survivors' signatures entered the store
    val sigIds = spark.read.parquet(idx + "_sigs").select("doc_id")
      .distinct().collect().map(_.getLong(0)).toSet
    CacheRegistry.release(spark)
    assert(sigIds == Set(0L, 2L, 3L, 5L), sigIds)
  }

  test("probe's store scan partition-prunes to the batch's shards") {
    val idx = freshStore("lsh-prune")
    LshIndex.write(docs.filter(col("doc_id") % 2 === 0), idx)
    // a single tiny doc's bands touch at most `bands` of the 16 shards —
    // the scan must carry a shard IN filter, not list every directory
    val one = docs.filter(col("doc_id") % 2 === 1).limit(1)
    val probed = LshIndex.probe(spark, one, idx, threshold = 0.0)
    val plan = probed.queryExecution.executedPlan.toString
    CacheRegistry.release(spark)
    assert(plan.contains("PartitionFilters") && plan.contains("shard"),
      s"expected partition-pruned store scan:\n$plan")
  }
}
