package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HllStore, Sketches}

/** Laws for the persisted HLL register store (distinct-count metrics
  * layer). The oracle (q_hll_store) replays store-served range
  * distincts against the raw-event register walk in DuckDB WITH a
  * deliberate replayed ingest; these specs pin the pieces — store ≡
  * direct recompute, replay-invisibility of answers (the MAX-merge
  * algebra the quantile store does NOT have), the partition-pruned
  * serving scan, and compaction's row-bound/answer contract.
  */
class HllStoreSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val ev =
    Tables.loadEvents(spark, "/root/testdata/sf0.001").cache()

  private def freshStore(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  // direct per-group register walk over a raw slice — what serving a
  // range from the store must reproduce exactly (max of per-window
  // maxes IS the max over the union)
  private def direct(slice: org.apache.spark.sql.DataFrame) =
    Sketches.hllFinalizeBy(
      Sketches.hllRegistersBy(
        slice.withColumn("__item", col("user_id").cast("string")),
        "__item", 12, Seq("event_type")),
      12, Seq("event_type"))
      .orderBy("event_type").collect().toSeq

  // full January 2024 — covers every event window in the fixture
  private val jan1 = 1704067200000L
  private val feb1 = 1706745600000L

  test("seed + append serves the recompute-from-raw range distincts") {
    val store = freshStore("hll-store")
    HllStore.write(ev.filter(col("event_id") % 2 === 0), store)
    HllStore.append(spark, ev.filter(col("event_id") % 2 === 1), store)
    val served = HllStore.distinct(spark, store, jan1, feb1)
      .orderBy("event_type").collect().toSeq
    assert(served == direct(ev) && served.nonEmpty)

    // a SUB-range equals the ts-restricted recompute (the range filter
    // lands on the window key, so restricting raw input by window is
    // the same event set) and differs from the full answer
    val from = 1704672000000L // 2024-01-08
    val to = 1705276800000L   // 2024-01-15
    val sub = HllStore.distinct(spark, store, from, to)
      .orderBy("event_type").collect().toSeq
    val subDirect = direct(
      ev.filter(expr("((ts div 1000000) div 3600000) * 3600000")
        .between(from, to - 1)))
    assert(sub == subDirect && sub != served)

    // the opt-in small-range correction: cells far below 2.5·2^p are
    // the COMMON serving case (the raw harmonic estimate here is ~200×
    // off); linear counting must land within 10% of the exact distinct
    val corr = HllStore.distinct(spark, store, jan1, feb1, corrected = true)
      .select("event_type", "est_corrected").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, d) =>
      assert(math.abs(corr(g) - d) <= 0.1 * d + 1,
        s"group $g: corrected ${corr(g)} vs exact $d")
    }
  }

  test("a replayed append is invisible to every answer (max-merge identity)") {
    val store = freshStore("hll-replay")
    val half = ev.filter(col("event_id") % 2 === 0)
    HllStore.write(half, store)
    val before = HllStore.distinct(spark, store, jan1, feb1)
      .orderBy("event_type").collect().toSeq
    val rowsBefore = spark.read.parquet(store).count()
    // re-append the SAME events: rows accumulate (hygiene cost) but the
    // serve-time per-index MAX folds them — answers must not move,
    // which is the algebraic opposite of SketchStore's doubled counts
    HllStore.append(spark, half, store)
    val after = HllStore.distinct(spark, store, jan1, feb1)
      .orderBy("event_type").collect().toSeq
    assert(after == before && after.nonEmpty)
    assert(spark.read.parquet(store).count() > rowsBefore,
      "the replay must be visible as duplicate rows (what compaction folds)")
    // the windowed time-series view folds them identically
    val winA = HllStore.windowDistinct(spark, store, jan1, feb1)
      .orderBy("window_start_ms", "event_type").collect().toSeq
    val winStore = freshStore("hll-replay-clean")
    HllStore.write(half, winStore)
    val winB = HllStore.windowDistinct(spark, winStore, jan1, feb1)
      .orderBy("window_start_ms", "event_type").collect().toSeq
    assert(winA == winB)
  }

  test("range serving prunes uncovered window partitions at plan time") {
    val store = freshStore("hll-prune")
    HllStore.write(ev, store)
    val jan8 = HllStore.distinct(spark, store,
      1704672000000L, 1705276800000L)
    val plan = jan8.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("window_start_ms"),
      s"range read must prune on the window partition key:\n$plan")
    val win = HllStore.windowDistinct(spark, store,
        1704672000000L, 1705276800000L)
      .select("window_start_ms").distinct().collect()
      .map(_.getLong(0))
    assert(win.nonEmpty && win.forall(w =>
      w >= 1704672000000L && w < 1705276800000L))
  }

  test("compaction folds duplicates to one row per (window, group, idx), answers unchanged") {
    val store = freshStore("hll-compact")
    val half = ev.filter(col("event_id") % 2 === 0)
    HllStore.write(half, store)
    HllStore.append(spark, half, store)
    HllStore.append(spark, half, store)
    val before = HllStore.distinct(spark, store, jan1, feb1)
      .orderBy("event_type").collect().toSeq
    val rowsBefore = spark.read.parquet(store).count()
    val compacted = freshStore("hll-compacted")
    HllStore.compactStore(spark, store, compacted)
    val rowsAfter = spark.read.parquet(compacted).count()
    assert(rowsAfter < rowsBefore, "three loads must leave foldable rows")
    val dupes = spark.read.parquet(compacted)
      .groupBy("window_start_ms", "event_type", "idx").count()
      .filter(col("count") > 1).count()
    assert(dupes == 0)
    val after = HllStore.distinct(spark, compacted, jan1, feb1)
      .orderBy("event_type").collect().toSeq
    assert(after == before)
  }

  test("overlap: est_union is the union corpus' own estimate (register exactness)") {
    val store = freshStore("hll-overlap")
    HllStore.write(ev, store)
    val got = HllStore.overlap(spark, store, jan1, feb1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val types = ev.select("event_type").distinct()
      .collect().map(_.getString(0)).sorted
    assert(got.size == types.length * (types.length - 1) / 2)
    for (((a, b), row) <- got) {
      // per-idx max over the two groups' registers IS the register
      // table of the union corpus — est_union must equal the direct
      // estimate of the concatenated slice, bit for bit
      val unionEst = Sketches.hllFinalize(
        Sketches.hllRegisters(
          ev.filter(col("event_type").isin(a, b))
            .withColumn("__item", col("user_id").cast("string")),
          "__item", 12), 12).head().getAs[Double]("est_distinct")
      assert(row.getAs[Double]("est_union") == unionEst, s"pair ($a,$b)")
      // inclusion–exclusion identity pins the output contract
      assert(row.getAs[Double]("est_overlap") ==
        row.getAs[Double]("est_a") + row.getAs[Double]("est_b") -
          row.getAs[Double]("est_union"), s"pair ($a,$b)")
    }
  }

  test("overlap tracks a planted intersection; the G-squared gate is loud") {
    import TestSpark.spark.implicits._
    // raw regime: sets past 2.5·2^12 where the harmonic estimate is
    // unbiased. A = 1..30000, B = 15001..45000 → |A∩B| = 15000; the
    // three ~1.6%σ terms compound to σ ≈ 1000, tolerate 3σ
    val items = ((1 to 30000).map(u => ("A", u.toString)) ++
      (15001 to 45000).map(u => ("B", u.toString))).toDF("g", "item")
    val reg = Sketches.hllRegistersBy(items, "item", 12, Seq("g"))
    val est = Sketches.hllOverlapBy(reg, 12, "g").head()
      .getAs[Double]("est_overlap")
    assert(math.abs(est - 15000.0) < 3000.0, s"overlap est $est vs 15000")
    // small regime: raw is biased past usefulness and the bias does NOT
    // cancel — the corrected (linear-counting) column is the readout
    val small = ((1 to 1200).map(u => ("A", u.toString)) ++
      (601 to 1800).map(u => ("B", u.toString))).toDF("g", "item")
    val sreg = Sketches.hllRegistersBy(small, "item", 12, Seq("g"))
    val sr = Sketches.hllOverlapBy(sreg, 12, "g", corrected = true).head()
    val corr = sr.getAs[Double]("est_overlap_corrected")
    assert(math.abs(corr - 600.0) < 120.0, s"corrected overlap $corr vs 600")
    assert(math.abs(sr.getAs[Double]("est_overlap") - 600.0) > 500.0,
      "raw small-regime overlap unexpectedly accurate — regime caveat stale?")
    val e = intercept[IllegalArgumentException] {
      Sketches.hllOverlapBy(sreg, 12, "g", maxGroups = 1)
    }
    assert(e.getMessage.contains("pair matrix"))
  }
}
