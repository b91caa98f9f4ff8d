package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Histogram-binned quantile estimation — the fixed-memory scale path
  * next to the exact sort-based percentile (SparkEntry q_percentile).
  *
  * Exact per-group percentiles need a full sort (or a per-group
  * `row_number` window, which shuffles and ranks EVERY row); at 100 TB
  * that is the single most expensive thing you can ask of a column. The
  * binned estimate instead does:
  *
  *   1. one partial-aggregated pass for per-group (min, max, count) —
  *      map-side combined, shuffled bytes = one row per group;
  *   2. one partial-aggregated pass histogramming each value into one of
  *      `bins` equal-width buckets — shuffled bytes ≤ groups × bins rows
  *      regardless of input size;
  *   3. a per-group cumulative walk over ≤ `bins` rows (the window's
  *      partition is the GROUP, whose row count is capped by `bins` —
  *      never corpus-sized) picking the first bucket whose cumulative
  *      count crosses ceil(p·n); the estimate is that bucket's lower
  *      edge.
  *
  * Error is bounded by one bucket width, (max-min)/bins per group —
  * the classic fixed-budget tradeoff (t-digest/KLL refine the same idea
  * with adaptive buckets; equal-width keeps every arithmetic step
  * bit-replayable in any engine, which is what the DuckDB oracle
  * verifies end-to-end).
  *
  * All arithmetic is IEEE double with a pinned operation order, so the
  * estimates hash-match across engines bit-for-bit.
  */
object Quantiles {

  /** Per-group binned quantile estimates for each requested fraction.
    * Output: groupCol, n, p{p}_est columns (lower edge of the first
    * histogram bucket whose cumulative count reaches ceil(p·n)).
    */
  /** `broadcastGroupCap` bounds the stats broadcast: the per-group stats
    * table is one row per DISTINCT group, which is broadcast-small for
    * report-style group columns (flags, languages, sources) but would OOM
    * the driver for an id-like group column. The table is persisted and
    * counted; above the cap the histogram join degrades to a shuffle join
    * instead of failing on the broadcast limit.
    */
  def binnedQuantiles(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      bins: Int = 1024,
      ps: Seq[Double] = Seq(0.5, 0.95),
      broadcastGroupCap: Long = 1L * 1000 * 1000): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"quantile fractions must be in (0, 1], got $ps")
    val v = col(valueCol).cast("double")
    // quantiles are over NON-NULL values (quantile_cont semantics); also
    // keeps the cumulative walk engine-portable — Spark sorts nulls
    // first, DuckDB last, so a null bin row would split the replay
    val dfNN = df.filter(v.isNotNull)

    val stats = dfNN.groupBy(groupCol).agg(
      min(v).as("__mn"), max(v).as("__mx"), count(lit(1)).as("__n"))

    // degenerate single-value groups (max == min) collapse to bucket 0;
    // everything else maps by (v-mn)/(mx-mn)*bins with the top edge
    // clamped into the last bucket
    val binCol = when(col("__mx") === col("__mn"), lit(0L))
      .otherwise(least(
        floor((v - col("__mn")) / (col("__mx") - col("__mn")) * bins),
        lit((bins - 1).toLong)))

    // null-safe join key: an inner equi-join would silently DROP every
    // row whose group key is null (stats aggregates them, the join never
    // matches them) — null groups must report like any other group.
    // Persist + count the stats table to size-gate the broadcast (one
    // cheap pass over the tiny agg result; the cache keeps the join from
    // re-running the stats aggregation).
    val statsC = CacheRegistry.track(
      stats.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val statsR = statsC.withColumnRenamed(groupCol, "__g")
    val statsSide =
      if (statsC.count() <= broadcastGroupCap) broadcast(statsR) else statsR
    val hist = dfNN.join(statsSide, col(groupCol) <=> col("__g"))
      .drop("__g")
      .withColumn("__bin", binCol)
      .groupBy(col(groupCol), col("__bin"))
      .agg(count(lit(1)).as("__c"),
        max(col("__mn")).as("__mn"), max(col("__mx")).as("__mx"),
        max(col("__n")).as("__n"))

    // per-group cumulative histogram: the window partition holds at most
    // `bins` rows however large the input — this is NOT a corpus-sized
    // window
    val cum = hist.withColumn("__cum",
      sum(col("__c")).over(Window.partitionBy(groupCol).orderBy("__bin")))

    val edge = col("__mn") +
      col("__bin") * (col("__mx") - col("__mn")) / lit(bins.toDouble)
    val aggs = ps.map { p =>
      min(when(col("__cum") >= ceil(lit(p) * col("__n")), edge))
        .as(s"p${(p * 100).round}_est")
    }
    cum.groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"), aggs: _*)
  }
}
