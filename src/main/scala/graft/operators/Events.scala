package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table (analytics beyond the
  * reference's surface, exercising the same window machinery as the W1
  * carry-forward).
  */
object Events {

  /** Gap-based sessionization: a new session starts when the gap to the
    * user's previous event exceeds `gapMs`. One shuffle on user_id; both
    * window functions share the same spec so Catalyst evaluates them in a
    * single Window operator.
    */
  def sessionize(events: DataFrame, gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val newSession =
      when(col("ts_ms") - lag(col("ts_ms"), 1).over(byUser) > gapMs, 1L)
        .otherwise(when(lag(col("ts_ms"), 1).over(byUser).isNull, 1L).otherwise(0L))
    events
      .withColumn("__new", newSession)
      .withColumn("session_id",
        sum(col("__new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_id"), col("user_id"), col("session_id"))
  }

  /** Per-session aggregates over [[sessionize]]'s output joined back to
    * the event stream: duration, event count, decimal-exact value sum —
    * the table session-length/engagement distributions read from. One
    * extra shuffle on (user, session) beyond sessionize's own.
    */
  def sessionStats(events: DataFrame, gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    val s = sessionize(events, gapMs).select("event_id", "session_id")
    events.join(s, "event_id")
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_ms")).as("start_ms"),
        (max(col("ts_ms")) - min(col("ts_ms"))).as("duration_ms"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
  }

  /** First-order event-type transition matrix: counts of (from_type →
    * to_type) over each user's time-ordered stream, plus the
    * row-normalized probability — the empirical Markov chain behind
    * path/next-action analysis. One lag window per user (ties on
    * event_id, the sessionize ordering), one vocabulary²-bounded count
    * aggregate; the probability divides by a per-from_type window over
    * ≤|types|² rows.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val steps = events
      .withColumn("from_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("from_type").isNotNull)
      .select(col("from_type"), col("event_type").as("to_type"))
    val counts = steps.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
    val wFrom = Window.partitionBy("from_type")
    counts
      .withColumn("__tot", sum(col("n_transitions")).over(wFrom))
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        round(col("n_transitions").cast("double") / col("__tot"), 4)
          .as("p_transition"))
  }

  /** Frequent 3-step journeys: every user's time-ordered event-type
    * trigram (the [[sessionize]] ordering — ts_ms, ties on event_id),
    * counted corpus-wide, top `topN` by (count desc, path lexicographic)
    * — the next-two-actions complement to [[transitionMatrix]]'s
    * single-step chain.
    *
    * Scale shape: two lead windows per USER partition (state bounded by
    * one user's stream, never corpus-wide), a vocabulary³-bounded count
    * aggregate with map-side combine, and an orderBy+limit top-N that
    * plans as TakeOrderedAndProject. The boundary tie-break on the path
    * itself makes the top-N cut engine-exact.
    */
  def pathTrigrams(events: DataFrame, topN: Int = 20): DataFrame = {
    require(topN >= 1)
    val byUser = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    events
      .withColumn("__e2", lead(col("event_type"), 1).over(byUser))
      .withColumn("__e3", lead(col("event_type"), 2).over(byUser))
      .filter(col("__e2").isNotNull && col("__e3").isNotNull)
      .select(col("event_type").as("step1"), col("__e2").as("step2"),
        col("__e3").as("step3"))
      .groupBy("step1", "step2", "step3").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(topN)
  }

  /** Transition dwell-time profile: how long users sit between each
    * consecutive (from → to) event-type pair — n, min/max gap, and the
    * decimal-exact mean gap (ms). The latency surface behind
    * [[transitionMatrix]]'s probabilities: a hot transition with a
    * collapsing dwell is a bot signature; one with a growing dwell is a
    * UX regression. Same per-user lag window + vocabulary²-bounded
    * aggregate shape as the matrix.
    */
  def dwellStats(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    events
      .withColumn("__from", lag(col("event_type"), 1).over(byUser))
      .withColumn("__prev", lag(col("ts_ms"), 1).over(byUser))
      .filter(col("__from").isNotNull)
      .select(col("__from").as("from_type"),
        col("event_type").as("to_type"),
        (col("ts_ms") - col("__prev")).as("__gap"))
      .groupBy("from_type", "to_type").agg(
        count(lit(1)).as("n"),
        min(col("__gap")).as("min_gap_ms"),
        max(col("__gap")).as("max_gap_ms"),
        round(sum(col("__gap").cast("decimal(18,0)")).cast("double")
          / count(lit(1)), 2).as("avg_gap_ms"))
  }

  /** Ordered-funnel analysis: for a stage sequence (s₁ … sₖ), a user
    * reaches stage i+1 only with an event of that type STRICTLY AFTER
    * their earliest qualifying stage-i event (the standard
    * product-analytics funnel, not mere per-type presence). Returns one
    * row per stage: (stage_idx, stage, n_users, conv_from_prev,
    * conv_from_first) — conversions are single BIGINT-ratio IEEE
    * divisions, 1.0 (vacuous) when the previous stage is empty.
    *
    * Scale shape: one filtered partial aggregate per stage over the
    * events table, each joined to the (user-count-bounded) previous-stage
    * table on user_id; the final window runs over ≤ k summary rows — the
    * bounded-second-level pattern, never a corpus-sized window.
    */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // earliest qualifying timestamp per user, stage by stage
    val reached = stages.tail.scanLeft(
      events.filter(col("event_type") === stages.head)
        .groupBy("user_id").agg(min(col("ts")).as("t"))) {
      case (prev, stage) =>
        events.filter(col("event_type") === stage)
          .join(prev.select(col("user_id"), col("t").as("__tp")), "user_id")
          .filter(col("ts") > col("__tp"))
          .groupBy("user_id").agg(min(col("ts")).as("t"))
    }
    val counts = reached.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("stage_idx"), lit(stages(i)).as("stage"), col("n_users"))
    }.reduce(_ unionByName _)
    funnelConv(counts)
  }

  /** Conversion rates over a (stage_idx, stage, n_users) table — ≤ k
    * rows, so the global-order window is bounded second-level only.
    */
  private def funnelConv(counts: DataFrame): DataFrame = {
    val w = Window.orderBy("stage_idx") // ≤ k rows — bounded second level
    counts
      .withColumn("__prev", lag(col("n_users"), 1).over(w))
      .withColumn("__first", first(col("n_users")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("stage_idx"), col("stage"), col("n_users"),
        when(col("__prev").isNull || col("__prev") === 0, lit(1.0))
          .otherwise(col("n_users").cast("double") / col("__prev").cast("double"))
          .as("conv_from_prev"),
        when(col("__first") === 0, lit(1.0))
          .otherwise(col("n_users").cast("double") / col("__first").cast("double"))
          .as("conv_from_first"))
  }

  /** The funnel table from per-(user, stage) REACH rows — the streaming
    * twin's exactly-once emissions
    * ([[graft.streaming.Streaming.streamingFunnelReaches]]). Unreached
    * stages zero-fill so the output shape (one row per stage, conv
    * rates included) is identical to [[funnel]]'s.
    */
  def funnelFromReaches(reaches: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = reaches.sparkSession
    import spark.implicits._
    val stageDf = stages.zipWithIndex
      .map { case (st, i) => (i, st) }.toDF("stage_idx", "stage")
    val counts = stageDf
      .join(reaches.groupBy("stage_idx").agg(count(lit(1)).as("__n")),
        Seq("stage_idx"), "left")
      .select(col("stage_idx"), col("stage"),
        coalesce(col("__n"), lit(0L)).as("n_users"))
    funnelConv(counts)
  }

  /** Cohort-retention matrix: bucket time into `bucketMs` periods, assign
    * each user to the cohort of their FIRST event, and count distinct
    * active users per (cohort, period offset) — the standard retention
    * triangle. Three bounded shuffles: first-event per user (map-side
    * combined), distinct (user, period), and the final (cohorts ×
    * offsets)-sized aggregate; nothing scales beyond users × periods.
    */
  def retentionCohorts(
      events: DataFrame, bucketMs: Long = 24L * 3600 * 1000): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    val firsts = events.groupBy("user_id").agg(min(col("ts_ms")).as("__t0"))
      .select(col("user_id"), floor(col("__t0") / bucketMs).cast("long").as("cohort"))
    events
      .select(col("user_id"), floor(col("ts_ms") / bucketMs).cast("long").as("__p"))
      .distinct()
      .join(firsts, "user_id")
      .groupBy(col("cohort"), (col("__p") - col("cohort")).as("period_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Semi-structured extraction: pull a numeric field out of the JSON
    * `props` column (codegen'd `get_json_object`, no UDF) and aggregate
    * per event type — the pattern for property-bag event schemas where
    * hot fields get promoted to columns lazily. Pure map-side extract +
    * one partial-agg shuffle of (types × 4) rows.
    */
  /** Per-user value anomalies: events whose `value` sits more than
    * `zCut` population standard deviations from the USER'S own mean —
    * the per-entity outlier scan (fraud/abuse/telemetry triage) as one
    * aggregate + one join, no per-user driver work.
    *
    * Determinism (the [[Stats.groupedCorrelation]] recipe): values are
    * quantized once to DECIMAL(18,4); n, Σx, Σx² accumulate exactly in
    * any partition order; mean/std/z are then ONE pinned IEEE expression
    * per row (correctly-rounded ÷, ×, √ on both engines), and the cut
    * compares the 4dp-ROUNDED |z| so an engine ulp at the boundary
    * cannot flip membership. Users with zero variance or fewer than
    * `minEvents` events emit nothing (z undefined).
    *
    * Scale shape: one partial-combined aggregate keyed by user (three
    * longs/decimals of state per user), stats broadcast-or-shuffle
    * joined back on the same key — linear, skew-safe (a hot user is one
    * aggregate row).
    *
    * Output: (event_id, user_id, value, z) for flagged events.
    */
  def valueAnomalies(
      events: DataFrame, zCut: Double = 3.0, minEvents: Int = 8): DataFrame = {
    require(zCut > 0.0)
    val x = col("value").cast("decimal(18,4)")
    val v = events.filter(col("value").isNotNull)
      .select(col("event_id"), col("user_id"), col("value"), x.as("__x"))
    val st = v.groupBy("user_id").agg(
      count(lit(1)).as("__n"),
      sum(col("__x")).as("__sx"),
      sum(col("__x") * col("__x")).as("__sxx"))
    val nD = col("__n").cast("double")
    val sx = col("__sx").cast("double")
    val varNum = nD * col("__sxx").cast("double") - sx * sx // n² · variance
    val z = (col("__x").cast("double") - sx / nD) / (sqrt(varNum) / nD)
    v.join(st, "user_id")
      .filter(col("__n") >= minEvents && varNum > 0.0)
      .select(col("event_id"), col("user_id"), col("value"),
        round(z, 4).as("z"))
      .filter(abs(col("z")) > zCut)
  }

  /** Online (prequential) twin of [[valueAnomalies]]: each event is
    * scored against the user's STRICTLY PRIOR history in (ts, event_id)
    * order — the semantics a live scorer has (it cannot see the future),
    * and the law the streaming twin
    * ([[graft.streaming.Streaming.streamingValueAnomalies]]) is pinned
    * equal to. The global variant answers "which events were odd in
    * hindsight"; this answers "which events LOOKED odd when they
    * arrived" — the alerting semantics.
    *
    * Determinism: prior n/Σx/Σx² are running DECIMAL window sums —
    * sequential in-frame accumulation is exact and engine-identical
    * (the q_moving_agg precedent); z is the same pinned closed form as
    * [[valueAnomalies]] with the cut on the 4dp-rounded value.
    *
    * Scale shape: ONE window partitioned by user (shuffle on user_id,
    * frames never cross users); no self-join, no driver state.
    */
  def runningValueAnomalies(
      events: DataFrame, zCut: Double = 3.0, minPrior: Int = 8): DataFrame = {
    require(zCut > 0.0)
    val x = col("value").cast("decimal(18,4)")
    val v = events.filter(col("value").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        x.as("__x"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val nD = col("__n").cast("double")
    val sx = col("__sx").cast("double")
    val varNum = nD * col("__sxx").cast("double") - sx * sx
    val z = (col("__x").cast("double") - sx / nD) / (sqrt(varNum) / nD)
    v.withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sx", sum(col("__x")).over(w))
      .withColumn("__sxx", sum(col("__x") * col("__x")).over(w))
      .filter(col("__n") >= minPrior && varNum > 0.0)
      .select(col("event_id"), col("user_id"), col("value"),
        round(z, 4).as("z"))
      .filter(abs(col("z")) > zCut)
  }

  def jsonFieldStats(events: DataFrame, path: String = "$.k"): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), path).cast("long").as("__k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("__k")).as("k_sum"),
        max(col("__k")).as("k_max"),
        count(when(col("__k") >= 50, 1)).as("n_high"))
}
