package graft
package queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, CacheRegistry, Cdc, Dedup, Eval, Events, Graph, HllStore, Index, Linkage, Multimodal, Pq, Quantiles, Sampling, Similarity, SketchStore, Sketches, TextAnalysis, Tfidf}
import QueryShared._

/** Query registry, part 1 of 4 (entries in the original
  * SparkEntry order — SparkEntry.queries concatenates the parts and
  * fails loudly on any duplicate key).
  */
private[graft] object QueriesPart1 {
  val m: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- reference-operator analogues over the shared tables ----

    // P2-P5/P7: filter + projection, pushed to the parquet scan
    "q_filter_project" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 30)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // A1/A2: TPC-H Q1-shaped aggregation (count/sum/avg + conditional)
    "q1_agg" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          round(dsum(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // A1: list-groups analogue over the events stream table
    "q_listgroups_events" -> ((s, dir) => {
      Tables.loadEvents(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("entry_count"),
          min(col("ts_ms")).as("first_seen"),
          max(col("ts_ms")).as("last_seen"),
          sum(when(col("value") > 100, 1L).otherwise(0L)).as("high_value_count"),
          dsum(col("value")).as("total_value"))
        .orderBy("first_seen", "event_type")
    }),

    // P6: by-group normalize-then-substring-match semantics
    "q_bygroup" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .filter(lower(when(col("source") === "", Queries.NoGroup)
          .otherwise(col("source"))).contains("rc1"))
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy("doc_id")
    }),

    // O1/O2: global top-k with deterministic tie-break
    "q_topk" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").as("total_price"))
        .orderBy(col("o_orderkey"))
    }),

    // O3: tail — last 20 events in stream order
    "q_tail" -> ((s, dir) => {
      Tables.loadEvents(s, dir)
        .orderBy(col("ts").desc, col("event_id").desc)
        .limit(20)
        .select(col("event_id"), col("ts_ms"), col("event_type"))
        .orderBy("event_id")
    }),

    // O4/S9: seek — offset into an ordered stream, with limit
    "q_seek" -> ((s, dir) => {
      Tables.loadEvents(s, dir)
        .orderBy(col("event_id"))
        .offset(100)
        .limit(50)
        .select(col("event_id"), col("ts_ms"), col("event_type"), col("value"))
    }),

    // W1: group carry-forward analogue — last signup event per user so far
    "q_carryforward" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.loadEvents(s, dir)
        .select(col("event_id"), col("user_id"),
          coalesce(
            last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w),
            lit(-1L)).as("last_signup_event"))
        .orderBy("event_id")
    }),

    // ordered product-analytics funnel: each stage strictly after the
    // user's earliest qualifying previous-stage event
    "q_funnel" -> ((s, dir) =>
      Events.funnel(Tables.loadEvents(s, dir), Seq("view", "click", "purchase"))
        .orderBy("stage_idx")),

    // semi-structured extraction from the JSON props column (codegen
    // get_json_object, no UDF), aggregated per event type
    "q_json_extract" -> ((s, dir) =>
      Events.jsonFieldStats(Tables.loadEvents(s, dir))
        .orderBy("event_type")),

    // daily cohort-retention triangle: distinct active users per
    // (first-activity day, day offset)
    "q_retention" -> ((s, dir) =>
      Events.retentionCohorts(Tables.loadEvents(s, dir))
        .orderBy("cohort", "period_offset")),

    // joins: star join with broadcast dims (TPC-H Q5 shape)
    "q_join_star" -> ((s, dir) => {
      val customer = Tables.load(s, dir, "customer")
      val orders = Tables.load(s, dir, "orders")
      val lineitem = Tables.load(s, dir, "lineitem")
      val nation = Tables.load(s, dir, "nation")
      val region = Tables.load(s, dir, "region")
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy("n_name")
    }),

    // the write-side-shuffle join: lineitem+orders registered as bucketed
    // tables on their order keys, joined with ZERO Exchange past the scans
    // (FixtureSpec asserts the plan); only the tiny post-join priority
    // aggregate shuffles. Result is semantically a plain join — the
    // oracle replays it directly over the raw parquet.
    "q_bucketed_join" -> ((s, dir) =>
      ParquetIO.bucketedOrderJoin(s, dir, numBuckets = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_price"))
        .orderBy("o_orderpriority")),

    "q_semi_join" -> ((s, dir) => {
      Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),

    "q_anti_join" -> ((s, dir) => {
      Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),

    // window rank: top-3 orders per customer
    "q_window_topn" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.load(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
        .orderBy("o_custkey", "rn")
    }),

    // gap-based sessionization (W1-adjacent stateful windowing)
    "q_sessionize" -> ((s, dir) =>
      operators.Events.sessionize(Tables.loadEvents(s, dir))
        .orderBy("event_id")),

    // per-user value anomalies: |z| > 3 vs the user's own DECIMAL-exact
    // moments; the cut compares the 4dp-rounded z (ulp-safe membership)
    "q_anomaly" -> ((s, dir) =>
      operators.Events.valueAnomalies(Tables.load(s, dir, "events"))
        .orderBy("event_id")),

    // online twin: each event scored against STRICTLY PRIOR history in
    // (ts, event_id) order — the alerting semantics, and the law the
    // streaming flatMapGroupsWithState twin is spec-pinned equal to
    "q_anomaly_online" -> ((s, dir) =>
      operators.Events.runningValueAnomalies(Tables.load(s, dir, "events"))
        .orderBy("event_id")),

    // running + bounded-frame window aggregates per user, DECIMAL-exact:
    // sequential in-frame accumulation is deterministic in both engines,
    // and DECIMAL(18,2) cents convert to double exactly at these scales
    "q_moving_agg" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val last3 = byUser.rowsBetween(-2, Window.currentRow)
      Tables.loadEvents(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").cast("decimal(18,2)").as("__v"))
        .select(col("event_id"), col("user_id"),
          sum(col("__v")).over(cum).cast("double").as("running_total"),
          sum(col("__v")).over(last3).cast("double").as("moving_sum_3"),
          count(lit(1)).over(last3).as("n_window"))
        .orderBy("event_id")
    }),

    // rollup: hierarchical totals in one pass
    "q_rollup" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty"))
        .orderBy("returnflag", "linestatus")
    }),

    // exact interpolated percentiles per group — rank-and-interpolate
    // (one window sort + tiny agg) instead of the built-in exact
    // percentile aggregate, whose per-group value buffers are ~10× slower
    // on high-cardinality doubles; identical quantile_cont semantics
    "q_percentile" -> ((s, dir) => {
      val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
      val ranked = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
        .withColumn("rn", row_number().over(w).cast("long") - 1)
        .withColumn("n", count(lit(1)).over(Window.partitionBy("l_returnflag")))
      def k(p: Double): Column = (col("n") - 1) * p
      def pick(p: Double, which: Column => Column, name: String): Column =
        max(when(col("rn") === which(k(p)), col("l_extendedprice"))).as(name)
      val aggd = ranked.groupBy(col("l_returnflag")).agg(
        max(col("n")).as("nn"),
        pick(0.5, floor, "lo50"), pick(0.5, ceil, "hi50"),
        pick(0.95, floor, "lo95"), pick(0.95, ceil, "hi95"))
      def interp(p: Double, lo: String, hi: String): Column = {
        val kk = (col("nn") - 1) * p
        round(col(lo) + (kk - floor(kk)) * (col(hi) - col(lo)), 4)
      }
      aggd.select(col("l_returnflag"),
          interp(0.5, "lo50", "hi50").as("p50"),
          interp(0.95, "lo95", "hi95").as("p95"))
        .orderBy("l_returnflag")
    }),

    // binned-histogram quantile estimates — the fixed-memory 100 TB path
    // next to q_percentile's exact rank (which must sort every row):
    // two partial-agg passes + a ≤1024-row-per-group cumulative walk
    "q_binned_quantile" -> ((s, dir) =>
      Quantiles.binnedQuantiles(Tables.load(s, dir, "lineitem"),
          "l_extendedprice", "l_returnflag")
        .orderBy("l_returnflag")),

    // EXACT order statistics with NO global sort: iterative histogram
    // refinement descends into the rank's bucket per round (sargable
    // range filters, ≤ bins-row shuffles). bins=256/cutoff=1024 are
    // deliberately small so sf0.01 exercises a real refinement round
    // before the sort-limit finisher; oracle = row_number at ceil(p·n)
    "q_exact_quantile" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      // one shared descent: pass 0 and the round-1 histogram run once
      // for all three ranks
      val Seq(p50, p95, p99) = Quantiles.exactQuantiles(li,
        "l_extendedprice", Seq(0.5, 0.95, 0.99), bins = 256, cutoff = 1 << 10)
      Seq((p50, p95, p99)).toDF("p50", "p95", "p99")
    }),

    // per-group EXACT order statistic with no sort and no driver loop
    // per group: the descent state is a groups-sized DataFrame and all
    // groups refine in parallel each round (one histogram join + one
    // ≤bins-row-per-group walk; the only driver action is the
    // active-group count). bins/cutoff sized so sf0.01's ~20k-row
    // groups run real refinement rounds before the finisher
    "q_exact_quantile_by" -> ((s, dir) =>
      Quantiles.exactQuantileBy(Tables.load(s, dir, "lineitem"),
          Seq("l_returnflag"), "l_extendedprice", 0.95,
          bins = 256, cutoff = 1 << 10)
        .orderBy("l_returnflag")),

    // ONE-PASS mergeable log-histogram quantile sketch (DDSketch-style
    // relative-error buckets on integer-exact edge arithmetic) — the
    // streaming-native member next to q_binned_quantile's two-pass
    // absolute-error histogram: no (min,max) pre-pass, partials merge
    // by count addition across partitions/micro-batches, error ≤
    // 2^(1-mBits) RELATIVE (outlier-proof where equal-width bins are
    // not)
    "q_loghist_quantile" -> ((s, dir) =>
      Quantiles.logHistQuantiles(Tables.load(s, dir, "lineitem"),
          "l_extendedprice", "l_returnflag")
        .orderBy("l_returnflag")),

    // event-time windowed percentile telemetry — p50/p95/p99 of value
    // per (1h tumbling window, event_type) through the one-pass sketch:
    // the latency-dashboard shape, and the reason the sketch needs no
    // pre-pass (a min/max pass per window would double-scan the stream).
    // Window start by integer epoch arithmetic (the q_event_windows
    // convention) so the walk replays engine-exactly
    "q_window_quantile" -> ((s, dir) =>
      Quantiles.logHistQuantiles(
        Tables.loadEvents(s, dir)
          .withColumn("window_start_ms",
            expr("(ts_ms div 3600000) * 3600000")),
        "value", Seq("window_start_ms", "event_type"))
      .orderBy("window_start_ms", "event_type")),

    // persisted pre-aggregated quantile layer, oracle-gated end-to-end:
    // cold-build the window-partitioned sketch store over the even
    // events, append the odd half under the frozen geometry (pure count
    // accumulation — partials from both loads coexist unmerged), then
    // serve the Jan-8..15 range per-type percentiles from the STORE
    // alone (partition-pruned read + bounded walk, no raw-event access).
    // Bucket identity is window-independent, so the oracle replays the
    // plain per-group walk over the raw events restricted to the range:
    // store-served ≡ recompute-from-raw is the layer's contract
    "q_loghist_store" -> ((s, dir) => withTempStore("lhstore") { tmp =>
      val ev = Tables.loadEvents(s, dir)
      val store = tmp + "/store"
      // daily windows: granularity follows the serving SLA; the bench
      // range is day-aligned, so answers are identical to hourly — and
      // the store writes 30 hive partitions instead of 720 small-file
      // dirs per ingest (the wall was filesystem churn, not compute)
      SketchStore.write(ev.filter(col("event_id") % 2 === 0), store,
        windowMs = 86400000L)
      SketchStore.append(s, ev.filter(col("event_id") % 2 === 1), store)
      SketchStore.quantiles(s, store, 1704672000000L, 1705276800000L)
        .orderBy("event_type")
    }),

    // retention sweep on the persisted quantile store: build over all
    // events, expire every window ending at or before the serving
    // range's start, then serve the retained range — answers must be
    // IDENTICAL to an unexpired store (windows are disjoint), and
    // n_dropped_windows gates that the sweep removed exactly the
    // expired partitions, no more, no fewer
    "q_store_retention" -> ((s, dir) => withTempStore("retention") { tmp =>
      val ev = Tables.loadEvents(s, dir)
      val store = tmp + "/store"
      SketchStore.write(ev, store, windowMs = 86400000L)
      val dropped = operators.Retention.dropWindowsBefore(s, store,
        1704672000000L)
      SketchStore.quantiles(s, store, 1704672000000L, 1705276800000L)
        .withColumn("n_dropped_windows", lit(dropped.size.toLong))
        .orderBy("event_type")
    }),

    // persisted HLL register layer (the distinct-count sibling of
    // q_loghist_store): seed with the even events, append the odd half,
    // then RE-APPEND the even half — a deliberate replay. Registers
    // merge by per-index MAX, so the replay is invisible to every
    // answer (the algebraic contrast with the count-accumulating
    // quantile store, which must fence replays). The oracle replays the
    // register walk over the raw range-restricted events with each
    // event seen ONCE — hash-match proves the store's serve-time merge
    // absorbed the duplicate ingest
    "q_hll_store" -> ((s, dir) => withTempStore("hllstore") { tmp =>
      val ev = Tables.loadEvents(s, dir)
      val store = tmp + "/store"
      HllStore.write(ev.filter(col("event_id") % 2 === 0), store,
        windowMs = 86400000L) // daily windows (q_loghist_store note)
      HllStore.append(s, ev.filter(col("event_id") % 2 === 1), store)
      HllStore.append(s, ev.filter(col("event_id") % 2 === 0), store)
      HllStore.distinct(s, store, 1704672000000L, 1705276800000L)
        .orderBy("event_type")
    }),

    // pairwise audience overlap from the SAME register store: per-idx
    // MAX of two groups' registers IS the union's register table
    // (exact, not approximated), so est(A∩B) = est(A)+est(B)−est(A∪B)
    // falls out of inclusion–exclusion over three harmonic finalizes.
    // The oracle replays the G²/2 pair matrix over the raw range — the
    // gate pins the union-register algebra and the pair fan-out
    "q_hll_overlap" -> ((s, dir) => withTempStore("hlloverlap") { tmp =>
      val ev = Tables.loadEvents(s, dir)
      val store = tmp + "/store"
      HllStore.write(ev, store, windowMs = 86400000L) // daily (see above)
      HllStore.overlap(s, store, 1704672000000L, 1705276800000L)
        .orderBy("group_a", "group_b")
    }),

    // CDF (rank) serve from the quantile-sketch store — the SLO dual of
    // q_loghist_store ("what share of values sit at or below x"), as a
    // CERTIFIED [lo, hi] bracket: buckets entirely below the threshold
    // vs those plus the straddler, widths recovered from the stored
    // edge alone (positive: bitlength(lo); negative: bitlength(|lo|−1)
    // — the 2^e corner fold). Values are CENTERED (value − 250) so the
    // negative-edge recovery runs on real store data, not just specs
    "q_loghist_cdf" -> ((s, dir) => withTempStore("lhcdf") { tmp =>
      val ev = Tables.loadEvents(s, dir)
        .withColumn("centered", col("value") - 250.0)
      val store = tmp + "/store"
      SketchStore.write(ev, store, valueCol = "centered",
        windowMs = 86400000L) // daily windows (q_loghist_store note)
      SketchStore.cdf(s, store, 1704672000000L, 1705276800000L,
          Seq(-100.0, 0.0, 150.0))
        .orderBy("event_type")
    }),

    // WEIGHTED log-histogram quantiles: the doc length below which p of
    // the corpus' CHARACTERS live, per language — the curation view
    // (one 1M-char doc = a million 1-char docs), same one-pass sketch
    // with weight-sum counts
    "q_loghist_weighted" -> ((s, dir) =>
      Quantiles.logHistQuantiles(Tables.load(s, dir, "documents"),
          "n_chars", Seq("lang"), quantScale = 1.0,
          weightCol = Some("n_chars"))
        .orderBy("lang")),

    // the full CUBE lattice — q_rollup's conventions over every
    // grouping-set combination
    "q_cube" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty"))
        .orderBy("returnflag", "linestatus")
    }),

    // pivot with explicitly enumerated values (the only engine-portable
    // form: implicit value discovery is a separate nondeterministic scan)
    "q_pivot" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity")))
        .withColumnRenamed("F", "qty_F")
        .withColumnRenamed("O", "qty_O")
        .orderBy("l_returnflag")
    }),

    // exact distinct cardinalities per group
    "q_distinct" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")
    }),

    // salted two-stage aggregation — identical result to a direct groupBy
    // (the oracle proves it), hot keys spread over 16 sub-reducers
    "q_salted_agg" -> ((s, dir) =>
      operators.Skew.saltedAgg(
          Tables.load(s, dir, "lineitem"),
          col("l_returnflag"), col("l_quantity"))
        .withColumnRenamed("key", "l_returnflag")
        .orderBy("l_returnflag")),

    // salted fact⋈dim join — result identical to the plain join (the
    // oracle computes the plain join); deterministic row-id salt spreads
    // a hot key over 8 reducers, dim replicates 8×
    "q_salted_join" -> ((s, dir) =>
      operators.Skew.saltedJoin(
          Tables.load(s, dir, "orders")
            .withColumnRenamed("o_custkey", "c_custkey"),
          Tables.load(s, dir, "customer")
            .select("c_custkey", "c_mktsegment"),
          "c_custkey", "o_orderkey", saltBuckets = 8)
        .select("o_orderkey", "c_custkey", "o_totalprice", "c_mktsegment")
        .orderBy("o_orderkey")),

    // as-of join: latest 'view' at or before each 'click' per user —
    // union + one running window per key, never an inequality pair join
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.loadEvents(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "ts_ms")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      operators.AsOf.asOfJoin(clicks, views, "user_id", "ts",
          Seq("event_id", "value"))
        .select(col("event_id"), col("user_id"), col("ts_ms"),
          col("matched_event_id"), col("matched_value"))
        .orderBy("event_id")
    }),

    // range join: clicks inside a 4-hour window after each error, per
    // user — bucketed equi-join + containment filter, never a per-key
    // nested loop
    "q_range_join" -> ((s, dir) => {
      val ev = Tables.loadEvents(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "ts_ms")
      val errWindows = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("err_event_id"),
          col("ts").as("win_start"),
          (col("ts") + lit(4L * 3600 * 1000 * 1000 * 1000)).as("win_end"))
      operators.RangeJoin.pointInInterval(clicks, errWindows,
          "user_id", "ts", "win_start", "win_end",
          bucketWidth = 4L * 3600 * 1000 * 1000 * 1000)
        .select(col("event_id"), col("user_id"), col("ts_ms"), col("err_event_id"))
        .orderBy("event_id", "err_event_id")
    }),

    // interval × interval overlap: each view opens a 1h attention window,
    // each error a ±30min incident window; per-user pairs whose windows
    // intersect, with the exact overlap duration — bucket-blocked
    // equi-join, each pair emitted once by the first-shared-bucket rule
    // (arithmetic, not a dedup shuffle), never a per-key nested loop
    "q_interval_join" -> ((s, dir) => {
      val ev = Tables.loadEvents(s, dir)
      val hourNs = 3600L * 1000 * 1000 * 1000
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("ts").as("v_start"), (col("ts") + lit(hourNs)).as("v_end"))
      val errs = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"),
          (col("ts") - lit(hourNs / 2)).as("e_start"),
          (col("ts") + lit(hourNs / 2)).as("e_end"))
      operators.RangeJoin.intervalOverlap(views, errs, "user_id",
          "v_start", "v_end", "e_start", "e_end", bucketWidth = hourNs)
        .select(col("view_id"), col("err_id"), col("user_id"),
          expr("(least(v_end, e_end) - greatest(v_start, e_start)) div 1000000")
            .as("overlap_ms"))
        .orderBy("view_id", "err_id")
    }),

    // tumbling event-time windows, batch twin of the streaming
    // eventWindowCounts (same window spec + decimal-exact sums)
    "q_event_windows" -> ((s, dir) => {
      Tables.loadEvents(s, dir)
        .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
        .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(unix_millis(col("window.start")).as("window_start_ms"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("window_start_ms", "event_type")
    }),

    // ---- LLM training-data pipeline operators ----

    "q_exact_dedup" -> ((s, dir) =>
      Dedup.exactDedup(Tables.load(s, dir, "documents")).orderBy("doc_id")),

    "q_token_stats" -> ((s, dir) =>
      TextAnalysis.tokenCount(Tables.load(s, dir, "documents")).orderBy("doc_id")),

    // tokenizer fertility per language: BPE-ish tokens per char / per
    // word — the multilingual tokenizer-efficiency dial a token-budgeted
    // mix is planned around
    "q_fertility" -> ((s, dir) =>
      TextAnalysis.tokenizerFertility(Tables.load(s, dir, "documents"), "lang")
        .orderBy("stratum")),

    // Pareto-frontier curation: docs no other doc beats on BOTH length
    // and lexical diversity — distinct-x reduction + descending
    // prefix-max cover, no O(n²) self join (the oracle replays the
    // NOT-EXISTS formulation at sf)
    "q_pareto" -> ((s, dir) => {
      val scored = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          size(array_distinct(TextAnalysis.tokens(col("text"))))
            .cast("long").as("n_distinct_tokens"))
      operators.Sampling
        .paretoFrontier(scored, "n_chars", "n_distinct_tokens")
        .select("doc_id", "n_chars", "n_distinct_tokens")
        .orderBy("doc_id")
    }),

    // the per-language frontier: one skyline per group, grouped
    // two-level prefix-max cover
    "q_pareto_by" -> ((s, dir) => {
      val scored = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          size(array_distinct(TextAnalysis.tokens(col("text"))))
            .cast("long").as("n_distinct_tokens"))
      operators.Sampling
        .paretoFrontierBy(scored, "n_chars", "n_distinct_tokens", Seq("lang"))
        .select("doc_id", "lang", "n_chars", "n_distinct_tokens")
        .orderBy("doc_id")
    }),

    "q_quality" -> ((s, dir) =>
      TextAnalysis.qualityScore(Tables.load(s, dir, "documents")).orderBy("doc_id")),

    // TRAINED quality classifier (the fastText/CCNet filter recipe):
    // linear probe on md5-hashed bag-of-words presence features + bias,
    // 3 full-batch gradient steps, corpus scored by the final weights.
    // The label is TEXT-derived (docs mentioning 'vector') — the
    // synthetic lang column is independent of the text, so a metadata
    // label would gate an unlearnable task (measured AUC 0.50); this one
    // trains to AUC ≈ 0.8 in 3 steps at 10×, so the scores the oracle
    // pins are a genuinely learned filter. All gradient algebra is
    // integer fixed-point (partition-order invariant), so the oracle
    // replays the ENTIRE training loop, not just the scoring — the
    // kmeans fixed-point-iteration precedent applied to model training
    "q_quality_clf" -> ((s, dir) =>
      graft.operators.Classifier.linearProbe(
          Tables.load(s, dir, "documents"),
          col("text").contains("vector"), dim = 64, iters = 3, lr2 = 1.0)
        .orderBy("doc_id")),

    // exact ROC-AUC (Mann–Whitney with mid-rank ties) — the evaluation
    // member of the classifier family. Score = n_chars (313 distinct
    // values over 500 docs at sf0.01 — the tie mass is the point: mid-
    // rank handling is where naive AUC implementations break), label =
    // lang='en'. The rank comes from the two-level prefix scan, never a
    // single-reducer window; the oracle replays the same histogram +
    // strictly-below cumulative + integer numerator
    "q_roc_auc" -> ((s, dir) =>
      operators.Eval.rocAuc(Tables.load(s, dir, "documents"),
        "n_chars", col("lang") === "en")),

    // grouped twin: one AUC per source — "which shard's metadata
    // predicts English" as a per-slice ranking diagnostic
    "q_roc_auc_by" -> ((s, dir) =>
      operators.Eval.rocAuc(Tables.load(s, dir, "documents"),
        "n_chars", col("lang") === "en", Seq("source"))
        .orderBy("source")),

    // binned estimate: rank floor(score·q) instead of the raw score —
    // the bounded-state path for continuous scores (histogram ≤ score
    // range × q). Binning merges near-ties; mid-rank handling makes the
    // result exactly the trapezoid rule on the binned ROC curve, which
    // the oracle replays with the same floor
    "q_roc_auc_binned" -> ((s, dir) =>
      operators.Eval.rocAuc(Tables.load(s, dir, "documents"),
        "n_chars", col("lang") === "en",
        quantScale = Some(0.01))),

    // Cohen's kappa between two raters: lang vs a deliberately corrupted
    // copy (every 7th doc relabeled 'zz') — multi-category, partial
    // agreement, chance-corrected. The label-QA gate a pipeline runs
    // BEFORE training a probe on a hand-labeled slice
    "q_kappa" -> ((s, dir) =>
      operators.Eval.cohenKappa(
        Tables.load(s, dir, "documents")
          .filter(col("lang").isNotNull)
          .withColumn("b", when(col("doc_id") % 7 === 0, lit("zz"))
            .otherwise(col("lang"))),
        "lang", "b")),

    // average precision (PR-AUC at the distinct-score operating points)
    // — the imbalanced-label companion to q_roc_auc: same histogram,
    // descending scan, precisions snapped to the 10⁻¹² grid BEFORE the
    // integer term sum so the accumulation is partition-order invariant
    "q_avg_prec" -> ((s, dir) =>
      operators.Eval.averagePrecision(Tables.load(s, dir, "documents"),
        "n_chars", col("lang") === "en")),

    // calibration (reliability) table over a [0,1] score: per decile
    // band, count / positive count / empirical rate / fixed-point mean
    // score. The score is a deterministic [0,1] projection of n_chars —
    // the gate pins the BIN AND MEAN ARITHMETIC (floor(s·10⁶+0.5) sums,
    // one division), which is what a probe-threshold sweep runs on
    "q_calibration" -> ((s, dir) =>
      operators.Eval.calibration(
        Tables.load(s, dir, "documents")
          .withColumn("score", (col("n_chars") % 997) / lit(996.0)),
        "score", col("lang") === "en", bins = 10)
        .orderBy("bin")),

    // Brier score per language — the strictly proper single-number
    // readout (punishes miscalibration AND misranking), integer sums on
    // the 3dp grid
    "q_brier" -> ((s, dir) =>
      operators.Eval.brierScore(
        Tables.load(s, dir, "documents")
          .withColumn("score", (col("n_chars") % 997) / lit(996.0)),
        "score", col("lang") === "en", Seq("lang"))
        .orderBy("lang")),

    // per-stratum winsorized quality report: exact nearest-rank
    // [5%, 95%] bounds on the 4dp alpha_ratio via the count-table
    // cumulative walk (no per-stratum sort), clip counts + robust mean
    "q_winsorize" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val q = TextAnalysis.qualityScore(docs)
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      operators.Stats.winsorize(q, "alpha_ratio", "lang")
        .orderBy("stratum")
    }),

    "q_langid" -> ((s, dir) =>
      TextAnalysis.langId(Tables.load(s, dir, "documents")).orderBy("doc_id")),

    "q_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(Tables.load(s, dir, "documents")).orderBy("doc_id")),

    // robust winnowing (MOSS): per-window min shingle hash, ties to the
    // rightmost position, via the folded integer key — guaranteed-recall
    // span spot-checks at 2/(w+1) density
    "q_winnow" -> ((s, dir) =>
      Dedup.winnowFingerprints(Tables.load(s, dir, "documents"),
          k = 3, window = 4)
        .orderBy("doc_id", "fp_pos")),

    // pairs sharing >=2 winnowed fingerprints (hash df-capped) — the
    // guaranteed-recall complement to stride-sampled span dedup
    "q_winnow_pairs" -> ((s, dir) =>
      Dedup.winnowPairs(Tables.load(s, dir, "documents"),
          k = 3, window = 4, minShared = 2, maxDocsPerHash = 64)
        .orderBy("doc_id_a", "doc_id_b"))
  )
}
