package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement-only core-scaling probe (r21; r20 verdict item 4): at
  * sf0.1 the declared-query suite is fixed-overhead bound (most queries
  * 0.3–2 s of plan+codegen+two actions; r20 measured median c8/c32 wall
  * ratio 0.93), so core-count ratios over the suite say nothing about
  * the operators' parallel scaling. This tool times LINEAR-work heavy
  * operator passes over a 10× replicated sf0.1 corpus (the ScaleCheck
  * replication convention; texts get a per-copy suffix token so copies
  * are not byte-identical) — big enough that compute dominates, linear
  * so replication does not distort the work the way pair-generating
  * operators would (10× duplication inflates THEIR candidate sets
  * quadratically, which ScaleCheck covers separately as volumetrics).
  *
  * Run twice, then compare walls:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.ScalingProbe"
  *   SPARK_GRAFT_CPUS=8  sbt "runMain graft.ScalingProbe"
  *
  * Prints one JSON line per op: {"op", "cpus", "wall", "cpu"} (min-of-2
  * wall, its attempt's process CPU). Never invoked by Bench or Verify —
  * a diagnosis harness like [[Profile]].
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(CheckpointDirs.temp())

    // 10× corpora, MATERIALIZED to parquet and read back so every probe
    // scans files at full split parallelism instead of timing the
    // in-memory union's replication arithmetic
    val tmp = java.nio.file.Files.createTempDirectory("scaling-probe")
    val docs10Dir = tmp.resolve("docs10").toString
    val emb10Dir = tmp.resolve("emb10").toString
    val docs0 = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    (0 until 10).map(i => docs0
        .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        .withColumn("text", concat(col("text"), lit(s" zcopy$i"))))
      .reduce(_ unionAll _)
      .repartition(64)
      .write.mode("overwrite").option("compression", "zstd").parquet(docs10Dir)
    val emb0 = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    (0 until 10).map(i => emb0
        .withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
      .reduce(_ unionAll _)
      .repartition(64)
      .write.mode("overwrite").option("compression", "zstd").parquet(emb10Dir)
    val docs10 = spark.read.parquet(docs10Dir)
    val emb10 = spark.read.parquet(emb10Dir)

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def cpuNanos(): Long = osBean.getProcessCpuTime
    def measure(op: String)(mk: => DataFrame): Unit = {
      val attempts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val c0 = cpuNanos()
        mk.write.format("noop").mode("overwrite").save()
        val r = ((System.nanoTime() - t0) / 1e9, (cpuNanos() - c0) / 1e9)
        operators.CacheRegistry.release(spark)
        spark.catalog.clearCache()
        r
      }
      val (w, c) = attempts.minBy(_._1)
      println(s"""{"op":"$op","cpus":$cpus,"wall":$w,"cpu":$c}""")
    }

    // linear-work passes only (work ∝ rows, no pair generation):
    measure("quality_score")(operators.TextAnalysis.qualityScore(docs10))
    measure("tfidf_vectors")(operators.Tfidf.tfidfVectors(docs10))
    measure("bm25_topk")(operators.Retrieval.bm25TopK(docs10,
      queryMaxId = 5, k = 10, logIdf = false))
    measure("dense_topk")(operators.Similarity.bruteForceTopK(emb10,
      emb10.filter(col("vec_id") < 3), k = 20))
    measure("minhash_sigs")(operators.Dedup.minHashSignaturesPortable(docs10,
      numHashes = 16, shingleSize = 3))
    spark.stop()
  }
}
