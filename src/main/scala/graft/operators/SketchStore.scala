package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted pre-aggregated quantile layer — the metrics-store member of
  * the maintenance family (vector index: `Similarity.writeIvfPqIndex`,
  * near-dup store: [[LshIndex]], THIS: telemetry sketches).
  *
  * A 100 TB pipeline cannot rescan raw events to answer "p95 latency per
  * type for the week of Jan 8" — dashboards re-ask that shape constantly.
  * What CAN be persisted is the [[Quantiles.logHistBuckets]] partial per
  * (event-time window, group): it is answer-sized (windows × groups ×
  * sketch geometry), and because bucket identity is a pure function of
  * the value, partials MERGE BY COUNT ADDITION — across ingest batches,
  * across windows, across shards. Serving a range quantile is therefore
  * a partition-pruned read of the covered windows plus a bounded
  * cumulative walk; the raw events are never touched again.
  *
  * Layout: `dir/window_start_ms=<epoch ms>/…parquet` holding
  * (group, bucket_lo, c, mx), plus a one-row `dir_meta` freezing the
  * sketch geometry (mBits, quantScale, windowMs, value/group columns) —
  * appends must encode under the SEED's geometry or the merged counts
  * would mix incompatible bucket edges (the frozen-sidecar rule every
  * store in this family follows).
  *
  * Append is count-accumulating, NOT idempotent: re-appending the same
  * events doubles their weight (a count has no identity to dedupe on).
  * At-least-once producers must fence replays upstream — the streaming
  * ingest twin ([[graft.streaming.Streaming.streamingSketchIngest]])
  * does exactly that with its batch-id commit log.
  */
object SketchStore {

  private case class Meta(mBits: Int, quantScale: Double, windowMs: Long,
      valueCol: String, groupCol: String)

  private def readMeta(spark: SparkSession, dir: String): Meta = {
    val m = StoreMeta.read(dir)
    Meta(m("m_bits").toInt, m("quant_scale").toDouble, m("window_ms").toLong,
      m("value_col"), m("group_col"))
  }

  /** Window-keyed sketch partials for `events` under geometry `m`.
    * Expects the nanos-long `ts` convention (`Tables.loadEvents`).
    */
  private def encode(events: DataFrame, m: Meta): DataFrame =
    Quantiles.logHistBuckets(
      events.withColumn("window_start_ms",
        expr(s"((ts div 1000000) div ${m.windowMs}) * ${m.windowMs}")),
      m.valueCol, Seq("window_start_ms", m.groupCol),
      m.mBits, m.quantScale)

  /** Cold-build the store over `events`. */
  def write(events: DataFrame, dir: String,
      valueCol: String = "value", groupCol: String = "event_type",
      windowMs: Long = 3600000L, mBits: Int = 6,
      quantScale: Double = 100.0,
      filesPerPartition: Int = 1): Unit = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    val m = Meta(mBits, quantScale, windowMs, valueCol, groupCol)
    graft.ParquetIO.writePartitioned(encode(events, m), dir,
      Seq("window_start_ms"), filesPerPartition)
    // sidecar is driver-written JSON — zero extra Spark jobs (StoreMeta)
    StoreMeta.write(dir, "m_bits" -> mBits, "quant_scale" -> quantScale,
      "window_ms" -> windowMs, "value_col" -> valueCol,
      "group_col" -> groupCol)
  }

  /** Append a batch's partials under the FROZEN geometry. Pure
    * accumulate: nothing existing is rewritten, duplicate (window,
    * group, bucket_lo) rows are legal (the finisher's cumulative walk
    * sums them like any other partial — pinned in SketchStoreSpec).
    *
    * Returns the window keys this batch touched (answer-sized: the
    * batch's time span over windowMs). Unlike the fixed-shard stores,
    * window partitions grow with HISTORY, so a maintenance check that
    * lists every partition would cost O(store age) per batch; only the
    * returned windows can have grown — callers bound their file-count
    * checks to exactly those.
    */
  def append(spark: SparkSession, events: DataFrame, dir: String): Seq[Long] = {
    val m = readMeta(spark, dir)
    // touched windows ride the write as an Observation (windows-sized
    // collect_set inline with the write job) — the prior cut + separate
    // collect cost a full extra materialization per append (r15 task 7)
    val obs = org.apache.spark.sql.Observation()
    graft.ParquetIO.writePartitioned(
      encode(events, m)
        .observe(obs, collect_set(col("window_start_ms")).as("__ws")),
      dir, Seq("window_start_ms"), filesPerPartition = 1, mode = "append")
    obs.get("__ws").asInstanceOf[Seq[Any]].map {
      case l: Long => l
      case l: java.lang.Long => l.longValue()
    }
  }

  private def readBuckets(spark: SparkSession, dir: String,
      fromMs: Long, toMs: Long): DataFrame = {
    require(fromMs < toMs, s"empty window range [$fromMs, $toMs)")
    // the range filter hits the hive partition column — Spark prunes
    // the uncovered window directories at planning time, so serving
    // cost follows the RANGE, not the store's history
    spark.read.parquet(dir)
      .filter(col("window_start_ms") >= fromMs &&
        col("window_start_ms") < toMs)
  }

  /** Per-group quantile estimates over event-time range [fromMs, toMs):
    * window partials merge by addition into one per-group sketch (bucket
    * identity does not depend on the window), then the standard bounded
    * walk. No raw-event access.
    */
  def quantiles(spark: SparkSession, dir: String, fromMs: Long, toMs: Long,
      ps: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame = {
    val m = readMeta(spark, dir)
    Quantiles.logHistFinish(
      readBuckets(spark, dir, fromMs, toMs)
        .select(col(m.groupCol), col("bucket_lo"), col("c"), col("mx")),
      Seq(m.groupCol), ps, m.quantScale)
  }

  /** Per-(window, group) estimates over the range — the dashboard
    * time-series view.
    */
  def windowQuantiles(spark: SparkSession, dir: String, fromMs: Long,
      toMs: Long, ps: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame = {
    val m = readMeta(spark, dir)
    Quantiles.logHistFinish(readBuckets(spark, dir, fromMs, toMs),
      Seq("window_start_ms", m.groupCol), ps, m.quantScale)
  }

  /** CDF (rank) serve over event-time range [fromMs, toMs): for each
    * threshold x, the certified [lo, hi] bracket on the fraction of
    * values ≤ x — the SLO view ("what share of requests beat 200 ms
    * this week") from the same store the quantile serve reads, same
    * partition-pruned scan, no raw-event access
    * ([[Quantiles.logHistCdf]] for the bracket semantics).
    */
  def cdf(spark: SparkSession, dir: String, fromMs: Long, toMs: Long,
      xs: Seq[Double]): DataFrame = {
    val m = readMeta(spark, dir)
    // no pre-merge: the classification is per bucket row and counts
    // ADD, so append-duplicated partials fold inside the one aggregation
    Quantiles.logHistCdf(
      readBuckets(spark, dir, fromMs, toMs)
        .select(col(m.groupCol), col("bucket_lo"), col("c"), col("mx")),
      Seq(m.groupCol), xs, m.mBits, m.quantScale)
  }

  /** Rewrite `srcDir` with duplicate partials merged (one row per
    * (window, group, bucket_lo)) — estimates are unchanged (addition is
    * what the finisher would have done), only the row count drops back
    * to the geometry bound after many appends.
    */
  def compactStore(spark: SparkSession, srcDir: String,
      dstDir: String): Unit = {
    val m = readMeta(spark, srcDir)
    val merged = spark.read.parquet(srcDir)
      .groupBy(col("window_start_ms"), col(m.groupCol), col("bucket_lo"))
      .agg(sum(col("c")).as("c"), max(col("mx")).as("mx"))
    graft.ParquetIO.writePartitioned(merged, dstDir,
      Seq("window_start_ms"), filesPerPartition = 1)
    StoreMeta.copy(srcDir, dstDir)
  }
}
