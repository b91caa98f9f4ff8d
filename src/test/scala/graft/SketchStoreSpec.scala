package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Quantiles, SketchStore}

/** Laws for the persisted quantile-sketch store (pre-aggregated metrics
  * layer). The oracle (q_loghist_store) replays store-served range
  * quantiles against the raw-event walk in DuckDB; these specs pin the
  * pieces the oracle composes — store ≡ direct recompute, unmerged
  * duplicate partials, the partition-pruned serving scan, and
  * compaction's row-count/answer contract.
  */
class SketchStoreSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val ev =
    Tables.loadEvents(spark, "/root/testdata/sf0.001").cache()

  private def freshStore(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  // full January 2024 — covers every event window in the fixture
  private val jan1 = 1704067200000L
  private val feb1 = 1706745600000L

  test("seed + append serves the recompute-from-raw range quantiles") {
    val store = freshStore("sketch-store")
    SketchStore.write(ev.filter(col("event_id") % 2 === 0), store)
    SketchStore.append(spark, ev.filter(col("event_id") % 2 === 1), store)
    val served = SketchStore.quantiles(spark, store, jan1, feb1)
      .orderBy("event_type").collect().toSeq
    val direct = Quantiles.logHistQuantiles(ev, "value", "event_type")
      .orderBy("event_type").collect().toSeq
    assert(served == direct && served.nonEmpty)

    // a SUB-range differs from the full answer and equals the
    // ts-restricted recompute (the filter lands on the window key, so
    // restricting raw input by window is the same set of rows)
    val from = 1704672000000L // 2024-01-08
    val to = 1705276800000L   // 2024-01-15
    val sub = SketchStore.quantiles(spark, store, from, to)
      .orderBy("event_type").collect().toSeq
    val subDirect = Quantiles.logHistQuantiles(
      ev.filter(expr("((ts div 1000000) div 3600000) * 3600000")
        .between(from, to - 1)),
      "value", "event_type")
      .orderBy("event_type").collect().toSeq
    assert(sub == subDirect && sub != served)
  }

  test("retention: drops exactly the expired windows, retained-range serving unchanged, both stores") {
    import graft.operators.{HllStore, Retention}
    val cutoff = 1704672000000L // 2024-01-08 — daily windows here
    // quantile store
    val store = freshStore("sketch-retention")
    SketchStore.write(ev, store, windowMs = 86400000L)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def windows(dir: String): Set[Long] =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
        .map(_.getPath.getName).filter(_.startsWith("window_start_ms="))
        .map(_.stripPrefix("window_start_ms=").toLong).toSet
    val before = windows(store)
    val retainedBefore = SketchStore.quantiles(spark, store, cutoff, feb1)
      .orderBy("event_type").collect().toSeq
    val dropped = Retention.dropWindowsBefore(spark, store, cutoff)
    assert(dropped.nonEmpty, "fixture must have expired windows")
    assert(dropped.forall(_ + 86400000L <= cutoff),
      "a dropped window must END at or before the cutoff")
    assert(windows(store) == before -- dropped,
      "exactly the expired partitions must leave the directory")
    assert(before.filter(_ + 86400000L <= cutoff) == dropped.toSet,
      "no expired partition may survive the sweep")
    assert(SketchStore.quantiles(spark, store, cutoff, feb1)
      .orderBy("event_type").collect().toSeq == retainedBefore,
      "retained-range serving must not move")
    // an idempotent rerun drops nothing
    assert(Retention.dropWindowsBefore(spark, store, cutoff).isEmpty)
    // HLL register store: same layout, same meta key, same sweep
    val hstore = freshStore("hll-retention")
    HllStore.write(ev, hstore, windowMs = 86400000L)
    val hBefore = HllStore.distinct(spark, hstore, cutoff, feb1)
      .orderBy("event_type").collect().toSeq
    val hDropped = Retention.dropWindowsBefore(spark, hstore, cutoff)
    assert(hDropped == dropped,
      "both stores cover the same events — identical expiry sets")
    assert(HllStore.distinct(spark, hstore, cutoff, feb1)
      .orderBy("event_type").collect().toSeq == hBefore)
  }

  test("duplicate partials are legal: the finisher sums them like any merge") {
    val store = freshStore("sketch-dup")
    val half = ev.filter(col("event_id") % 2 === 0)
    SketchStore.write(half, store)
    // re-append the SAME events: counts double, which is the documented
    // at-least-once semantics — the answer must equal the sketch of the
    // physically doubled input, NOT corrupt the walk
    SketchStore.append(spark, half, store)
    val served = SketchStore.quantiles(spark, store, jan1, feb1)
      .orderBy("event_type").collect().toSeq
    val doubled = Quantiles.logHistQuantiles(half.unionAll(half),
        "value", "event_type")
      .orderBy("event_type").collect().toSeq
    assert(served == doubled && served.nonEmpty)
  }

  test("range serving prunes uncovered window partitions at plan time") {
    val store = freshStore("sketch-prune")
    SketchStore.write(ev, store)
    val jan8 = SketchStore.quantiles(spark, store,
      1704672000000L, 1705276800000L)
    val plan = jan8.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("window_start_ms"),
      s"range read must prune on the window partition key:\n$plan")
    // and the time-series view exposes the window key per row
    val win = SketchStore.windowQuantiles(spark, store,
        1704672000000L, 1705276800000L)
      .select("window_start_ms").distinct().collect()
      .map(_.getLong(0))
    assert(win.nonEmpty && win.forall(w =>
      w >= 1704672000000L && w < 1705276800000L))
  }

  test("compaction merges duplicates back to the geometry bound, answers unchanged") {
    val store = freshStore("sketch-compact")
    val half = ev.filter(col("event_id") % 2 === 0)
    SketchStore.write(half, store)
    SketchStore.append(spark, half, store)
    SketchStore.append(spark, half, store)
    val before = SketchStore.quantiles(spark, store, jan1, feb1)
      .orderBy("event_type").collect().toSeq
    val rowsBefore = spark.read.parquet(store).count()
    val compacted = freshStore("sketch-compacted")
    SketchStore.compactStore(spark, store, compacted)
    val rowsAfter = spark.read.parquet(compacted).count()
    assert(rowsAfter < rowsBefore, "three loads must leave mergeable rows")
    // one row per (window, group, bucket_lo) after the merge
    val dupes = spark.read.parquet(compacted)
      .groupBy("window_start_ms", "event_type", "bucket_lo").count()
      .filter(col("count") > 1).count()
    assert(dupes == 0)
    val after = SketchStore.quantiles(spark, compacted, jan1, feb1)
      .orderBy("event_type").collect().toSeq
    assert(after == before)
  }

  test("cdf serve: certified bracket contains the exact rank, straddler-tight") {
    val store = freshStore("sketch-cdf")
    SketchStore.write(ev, store)
    val xs = Seq(50.0, 200.0, 450.0)
    val got = SketchStore.cdf(spark, store, jan1, feb1, xs)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.nonEmpty)
    // exact quantized CDF from the raw events (the store's contract is
    // over floor(v·100), the sketch's own domain)
    val exact = ev.select(col("event_type"),
        floor(col("value") * 100).cast("long").as("nq"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        xs.map(x => (sum(when(col("nq") <= math.floor(x * 100), 1L)
          .otherwise(0L)).cast("double") / count(lit(1)))
          .as(s"f${x.toInt}")): _*)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((g, row) <- got; (x, i) <- xs.zipWithIndex) {
      val lo = row.getDouble(2 + 2 * i)
      val hi = row.getDouble(3 + 2 * i)
      val f = exact(g).getDouble(2 + i)
      assert(lo <= f && f <= hi,
        s"group $g x=$x: exact $f outside bracket [$lo, $hi]")
      assert(hi - lo <= 0.25, s"group $g x=$x: bracket too wide")
    }
    // duplicate partials (an un-compacted full replay) double every
    // bucket count: n doubles, every FRACTION is unchanged — the
    // classification sums counts, it never assumes one row per bucket
    SketchStore.append(spark, ev, store)
    val again = SketchStore.cdf(spark, store, jan1, feb1, xs)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((g, row) <- got) {
      assert(again(g).getLong(1) == 2 * row.getLong(1), s"group $g n")
      for (i <- 0 until 2 * xs.size)
        assert(again(g).getDouble(2 + i) == row.getDouble(2 + i),
          s"group $g frac col $i moved under uniform duplication")
    }
  }
}
