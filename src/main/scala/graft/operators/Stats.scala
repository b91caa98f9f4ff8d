package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass-per-stage table profiling — the distributed `ANALYZE TABLE`:
  * per-column row/null counts, min/max, and an HLL distinct estimate,
  * computed in two partial-aggregated passes however wide the table or
  * big the data.
  *
  *   - pass 1 is ONE global aggregate row (count/nulls/min/max for every
  *     requested column in the same scan), unpivoted with `stack` — no
  *     per-column jobs, no driver loops;
  *   - pass 2 explodes each row into (column, value-as-string) pairs and
  *     feeds the grouped HLL ([[Sketches.hllRegistersBy]]): register
  *     state is columns × 2^p rows, fixed, whatever the cardinality.
  *
  * min/max are computed on the NATIVE type (string min ≠ numeric min)
  * and cast to string only for the unified output row. The profile
  * replays bit-for-bit in the oracle for integer- and string-typed
  * columns (their string rendering is identical in any engine; float
  * rendering is not — profile floats with the numeric q_binned_quantile
  * family instead).
  */
object Stats {

  /** Exact grouped Pearson correlation via DECIMAL power sums: Σx, Σy,
    * Σx², Σy², Σxy accumulate as DECIMAL(18,4)-cast exact values —
    * order-free in any partitioning (the engine-determinism rule that
    * float sums are not even self-reproducible) — and the classic
    * closed form runs AFTER aggregation as a handful of pinned IEEE ops
    * (two multiplies/subtracts per moment, two correctly-rounded sqrts,
    * one division), rounded to 6 dp for the gate — DuckDB's
    * decimal-to-double conversion double-rounds (int128 then /10^scale),
    * so the unrounded last ulp can differ. Built-in `corr()` is a float-accumulating aggregate and
    * cannot do this. One partial-agg pass; output is one row per group.
    * Degenerate groups (zero variance in either column) report NULL.
    */
  def groupedCorrelation(
      df: DataFrame, xCol: String, yCol: String, groupCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(18,4)")
    val y = col(yCol).cast("decimal(18,4)")
    val aggd = df.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * x).as("__sxx"), sum(y * y).as("__syy"),
      sum(x * y).as("__sxy"))
    val nD = col("n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val num = nD * col("__sxy").cast("double") - sx * sy
    val denX = sqrt(nD * col("__sxx").cast("double") - sx * sx)
    val denY = sqrt(nD * col("__syy").cast("double") - sy * sy)
    aggd.select(col(groupCol), col("n"),
      sx.as("sum_x"), sy.as("sum_y"),
      when(denX > 0 && denY > 0, round(num / (denX * denY), 6)).as("corr"))
  }

  def columnProfile(df: DataFrame, cols: Seq[String], p: Int = 12): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    // names are spliced into a stack() SQL string as literals AND
    // backticked aliases — restrict to identifier-safe, distinct names
    // (the keywordScores rule) so malformed CLI input fails clearly here
    require(cols.forall(_.matches("[A-Za-z0-9_]+")),
      s"column names must be simple identifiers, got $cols")
    require(cols.distinct.size == cols.size,
      s"duplicate column names in $cols")
    val aggCols = cols.flatMap(c => Seq(
      count(lit(1)).as(s"__tot_$c"),
      count(col(c)).as(s"__cnt_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val oneRow = df.agg(aggCols.head, aggCols.tail: _*)
    val stacked = oneRow.select(expr(
      s"stack(${cols.size}, " +
        cols.map(c => s"'$c', `__tot_$c`, `__cnt_$c`, `__min_$c`, `__max_$c`")
          .mkString(", ") +
        ") AS (column, n_rows, n_non_null, min_value, max_value)"))

    // Parallelism.ensure: a compact table arrives as ONE scan partition
    // (anything under maxPartitionBytes), putting the explode+md5+group
    // chain on a single core — the classic small-file/expensive-map trap
    val pairs = Parallelism.ensure(df.select(cols.map(col): _*), cols.head)
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("__v"))): _*)).as("e"))
      .select(col("e.column").as("column"), col("e.__v").as("__v"))
    // n_registers_used is the engine-replayable integer the oracle gates
    // on; est_distinct applies the ln-based small-range correction and is
    // spec-validated (see Sketches.correctedEstimate's replay caveat)
    val est = Sketches.hllFinalizeBy(
        Sketches.hllRegistersBy(pairs, "__v", p, Seq("column")), p, Seq("column"))
      .select(col("column"), col("n_registers_used"),
        Sketches.correctedEstimate(p)(col("n_registers_used"), col("s_fixed"))
          .as("est_distinct"))

    // broadcast: both sides are a handful of rows; the join is on the
    // column NAME, never on data
    stacked.join(broadcast(est), Seq("column"), "left")
      .select(col("column"), col("n_rows"), col("n_non_null"),
        col("min_value"), col("max_value"),
        coalesce(col("n_registers_used"), lit(0L)).as("n_registers_used"),
        coalesce(col("est_distinct"), lit(0.0)).as("est_distinct"))
  }

  /** Per-stratum winsorization report: exact nearest-rank percentile
    * bounds [loNum/den, hiNum/den] on a score column, the clip counts,
    * and the winsorized mean — the robust-scoring step a curation
    * pipeline runs before thresholding on a quality metric (a handful
    * of OCR-garbage outliers otherwise drag a stratum's mean and any
    * z-scored cut).
    *
    * Exact WITHOUT a per-stratum sort — the 100-TB shape: the score
    * domain is assumed quantized (the 4dp [[TextAnalysis.qualityScore]]
    * ratios → ≤10⁴+1 distinct values), so per-(stratum, value) counts
    * are a partial-combined aggregate whose result is tiny, the
    * cumulative walk runs as a window over that ≤10⁴-row-per-stratum
    * count table (bounded — never corpus-sized), and the nearest-rank
    * value at rank r is the smallest value whose cumulative count
    * reaches r. A Window.partitionBy(stratum) sort over the RAW rows
    * would put a whole stratum in one task — the classic skew
    * scale-killer this formulation exists to avoid. For unquantized
    * domains use [[Quantiles.binnedQuantiles]] bounds instead.
    *
    * Determinism: rank indices are exact integer arithmetic
    * (floor((n−1)·p) + 1 with p = num/den computed as correctly-rounded
    * double division of small longs — exact for every reachable value);
    * bounds are data values; the winsorized mean accumulates
    * DECIMAL(18,4)-quantized clipped values (exact in any order) with
    * one rounded division.
    *
    * Output: (stratum, n, lo, hi, n_below, n_above, mean_winsorized).
    */
  def winsorize(
      df: DataFrame, valueCol: String, groupCol: String,
      loNum: Int = 5, hiNum: Int = 95, den: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(den > 0 && loNum >= 0 && hiNum <= den && loNum <= hiNum,
      s"need 0 <= $loNum <= $hiNum <= $den")
    val v = df.select(col(groupCol).as("stratum"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val counts = v.groupBy("stratum", "__v").agg(count(lit(1)).as("__c"))
    val wcum = Window.partitionBy("stratum").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = counts
      .withColumn("__cum", sum(col("__c")).over(wcum))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy("stratum")))
    def rankIdx(num: Int) =
      floor((col("__n") - 1) * num / den) + 1
    val bounds = withCum.groupBy("stratum").agg(
      min(when(col("__cum") >= rankIdx(loNum), col("__v"))).as("lo"),
      min(when(col("__cum") >= rankIdx(hiNum), col("__v"))).as("hi"))
    v.join(broadcast(bounds), "stratum")
      .select(col("stratum"), col("__v"), col("lo"), col("hi"),
        least(greatest(col("__v"), col("lo")), col("hi")).as("__w"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"),
        sum(when(col("__v") < col("lo"), 1L).otherwise(0L)).as("n_below"),
        sum(when(col("__v") > col("hi"), 1L).otherwise(0L)).as("n_above"),
        round(sum(col("__w").cast("decimal(18,4)")).cast("double")
          / count(lit(1)), 6).as("mean_winsorized"))
  }

  /** Distribution-drift monitor between two corpora: histogram both over
    * SHARED bins (global min/max of the union — comparing histograms on
    * different bin edges is the classic drift-report bug) and report
    * per-bin population shares plus the running total-variation distance
    * contribution |p_a − p_b| / 2. TVD instead of PSI/KL: those need a
    * logarithm (engine-varying last ulp, and undefined on empty bins);
    * TVD is rational, bounded [0,1], and 0 iff identical — the whole
    * report hash-replays. Σ tvd_term over the rows IS the distance.
    *
    * Scale shape: one stats aggregate over the union (two scans reduced
    * to single rows), one map-side bin assignment per side, two
    * ≤bins-row aggregates — the [[Quantiles.binnedQuantiles]] fixed-
    * memory contract. Rows with a null value are excluded (both sides).
    *
    * Output: (bin, lo, hi, n_a, n_b, share_a, share_b, tvd_term),
    * one row per OCCUPIED bin.
    */
  def histogramDrift(
      a: DataFrame, b: DataFrame, valueCol: String,
      bins: Int = 64): DataFrame = {
    require(bins >= 1)
    val v = col(valueCol).cast("double")
    val aNN = a.select(v.as("__v")).filter(col("__v").isNotNull)
    val bNN = b.select(v.as("__v")).filter(col("__v").isNotNull)
    val both = aNN.select(col("__v"), lit(1L).as("__isa"))
      .unionByName(bNN.select(col("__v"), lit(0L).as("__isa")))
    val stats = broadcast(both.agg(
      min(col("__v")).as("__mn"), max(col("__v")).as("__mx"),
      sum(col("__isa")).as("__na"),
      sum(lit(1L) - col("__isa")).as("__nb")))
    val binCol = when(col("__mx") === col("__mn"), lit(0L))
      .otherwise(least(
        floor((col("__v") - col("__mn")) / (col("__mx") - col("__mn")) * bins),
        lit((bins - 1).toLong)))
    both.crossJoin(stats)
      .withColumn("bin", binCol)
      .groupBy("bin")
      .agg(sum(col("__isa")).as("n_a"),
        sum(lit(1L) - col("__isa")).as("n_b"),
        first(col("__mn")).as("__mn"), first(col("__mx")).as("__mx"),
        first(col("__na")).as("__na"), first(col("__nb")).as("__nb"))
      .select(col("bin"),
        (col("__mn") + col("bin") * (col("__mx") - col("__mn")) / bins).as("lo"),
        (col("__mn") + (col("bin") + 1) * (col("__mx") - col("__mn")) / bins).as("hi"),
        col("n_a"), col("n_b"),
        round(col("n_a").cast("double") / col("__na"), 6).as("share_a"),
        round(col("n_b").cast("double") / col("__nb"), 6).as("share_b"),
        round(abs(round(col("n_a").cast("double") / col("__na"), 6)
          - round(col("n_b").cast("double") / col("__nb"), 6)) / 2, 6).as("tvd_term"))
  }

  /** Per-group DISCRETE median (the order statistic at 1-based index
    * floor((n−1)/2) + 1 — DuckDB's `quantile_disc(0.5)`, no
    * interpolation, so the result is always an actual data value and
    * replays engine-exactly). Computed without a per-group sort of the
    * raw rows: aggregate to (group, value, count), ONE ordered window
    * over the distinct values for the cumulative count, then the first
    * value whose cumulative count reaches the index — the
    * [[winsorize]] shape, O(distinct values) window width.
    */
  private def discMedian(v: DataFrame, out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = v.groupBy("stratum", "__v").agg(count(lit(1)).as("__c"))
    val wcum = Window.partitionBy("stratum").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("__cum", sum(col("__c")).over(wcum))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy("stratum")))
      .groupBy("stratum")
      .agg(min(when(col("__cum") >= floor((col("__n") - 1) / 2) + 1, col("__v")))
        .as(out))
  }

  /** Robust per-group outlier census: median / MAD (median absolute
    * deviation) instead of mean / stddev, so the fence itself cannot be
    * dragged by the outliers it is meant to catch — the estimator a
    * value-quality monitor actually wants (50% breakdown point vs 0%
    * for z-scores). A row is an outlier iff `mad > 0 AND
    * |v − med| > cutoff · mad`; when MAD is 0 (over half the group
    * identical) the fence is degenerate and nothing is flagged — the
    * conservative convention, reported via the `mad` column itself.
    *
    * Both medians are [[discMedian]] order statistics and the fence
    * comparison is one IEEE multiply — every engine computes the
    * identical booleans, so the whole census hash-replays (no
    * stddev-accumulation-order variance, the reason this is NOT
    * mean ± k·σ).
    *
    * Scale shape: two grouped-count + bounded-window passes (distinct
    * values per group, never raw rows in a window) and one broadcast
    * fence join — no per-group sort of the data, no driver collect.
    * Output: (stratum, n, med, mad, n_outliers, outlier_share).
    */
  def madOutliers(
      df: DataFrame, valueCol: String, groupCol: String,
      cutoff: Double = 3.0): DataFrame = {
    require(cutoff > 0, s"cutoff must be > 0, got $cutoff")
    val v = df.select(col(groupCol).as("stratum"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val med = discMedian(v, "med")
    val dev = v.join(broadcast(med), "stratum")
      .withColumn("__d", abs(col("__v") - col("med")))
    val mad = discMedian(dev.select(col("stratum"), col("__d").as("__v")), "mad")
    dev.join(broadcast(mad), "stratum")
      .groupBy("stratum")
      .agg(count(lit(1)).as("n"),
        first(col("med")).as("med"), first(col("mad")).as("mad"),
        sum(when(col("mad") > 0 && col("__d") > lit(cutoff) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_share",
        round(col("n_outliers").cast("double") / col("n"), 6))
  }

  /** Functional-dependency violation audit: for a declared FD
    * `lhs → rhs`, every lhs group where rhs is NOT constant, with its
    * row count and distinct-rhs count — the schema-contract check a
    * warehouse runs before trusting a "key". One hash aggregate
    * (count + count distinct per group, map-side partials); output is
    * violating groups only, so a HOLDING dependency costs one scan and
    * returns nothing.
    *
    * NULL counts as its own rhs state: `countDistinct` ignores NULLs,
    * so a group with rhs values {x, NULL} would read as constant and a
    * null-vs-value inconsistency would silently pass — n_distinct here
    * is distinct non-null values plus one if any NULL appears (an
    * all-NULL group is constant, n_distinct = 1, not a violation).
    */
  def fdViolations(df: DataFrame, lhs: Seq[String], rhs: String): DataFrame = {
    require(lhs.nonEmpty, "need at least one determinant column")
    df.groupBy(lhs.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        (countDistinct(col(rhs)) +
          max(when(col(rhs).isNull, 1L).otherwise(0L))).as("n_distinct"))
      .filter(col("n_distinct") > 1)
  }

  /** Benford first-significant-digit audit over a positive value column:
    * per digit 1..9 the observed count/share against Benford's
    * log10(1 + 1/d) expectation, plus the absolute deviation. The
    * classic fabricated-/truncated-data smell test for financial-shaped
    * columns.
    *
    * The digit is extracted numerically: d = floor(v / 10^floor(log10 v))
    * (clamped to [1, 9] against the one-ulp boundary case where the
    * division rounds to exactly 10). log10 appears ONLY inside a floor
    * to integer precision — safe cross-engine where a raw log in a
    * reported value would not be (Java special-cases exact powers of
    * ten; glibc agrees) — and the EXPECTED shares are 12dp literals, not
    * engine logs. One map-side digit projection + one 9-row aggregate.
    * Output: (digit, n, share, expected, deviation); rows with
    * value <= 0 or null are excluded.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    // log10(1 + 1/d), 12dp
    val expected = Seq(
      1 -> 0.301029995664, 2 -> 0.176091259056, 3 -> 0.124938736608,
      4 -> 0.096910013008, 5 -> 0.079181246048, 6 -> 0.066946789631,
      7 -> 0.057991946978, 8 -> 0.051152522447, 9 -> 0.045757490561)
    val v = df.select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull && col("__v") > 0)
    val digit = least(greatest(
      floor(col("__v") / pow(lit(10.0), floor(log10(col("__v"))))), lit(1.0)),
      lit(9.0)).cast("int")
    // chained whens with digit 9 as the ELSE arm (digit is 1..9 after
    // the clamp, so the fallthrough is never a silent null)
    val exp = expected.init
      .foldLeft(Option.empty[Column]) { case (acc, (d, e)) =>
        Some(acc.fold(when(col("digit") === d, lit(e)))(
          _.when(col("digit") === d, lit(e))))
      }.get.otherwise(lit(expected.last._2))
    v.select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(v.agg(count(lit(1)).as("__tot"))))
      .withColumn("share", round(col("n").cast("double") / col("__tot"), 6))
      .withColumn("expected", exp)
      .select(col("digit"), col("n"), col("share"), col("expected"),
        round(abs(col("share") - col("expected")), 6).as("deviation"))
  }

  /** Pearson chi-square independence audit between two categorical
    * columns: one row per occupied (a, b) cell with observed count,
    * expected count under independence (row_total x col_total / N,
    * 6dp), and the cell's chi-square contribution (observed-expected)²
    * / expected (6dp), plus the statistic (exact decimal sum of the
    * ROUNDED terms — order-independent) and degrees of freedom repeated
    * on every row so the frame is a self-contained report.
    *
    * No logarithms anywhere (the G-test would need them): every
    * reported number is counts, one pinned IEEE division chain, or a
    * decimal sum — the whole report hash-replays. Scale shape: one
    * cell-level hash aggregate (map-side combine to |cells|), two
    * marginal re-aggregations OF the cells, one broadcast join back.
    */
  def chiSquare(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.select(col(colA).as("a"), col(colB).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
    val rowTot = cells.groupBy("a").agg(sum(col("n")).as("__ra"))
    val colTot = cells.groupBy("b").agg(sum(col("n")).as("__rb"))
    val grand = broadcast(cells.agg(sum(col("n")).as("__nn")))
    val term = round(
      (col("n") - col("__e")) * (col("n") - col("__e")) / col("__e"), 6)
    val scored = cells
      .join(broadcast(rowTot), "a").join(broadcast(colTot), "b")
      .crossJoin(grand)
      .withColumn("__e",
        col("__ra").cast("double") * col("__rb") / col("__nn"))
      .withColumn("chi_term", term)
    val totals = broadcast(scored.agg(
      sum(col("chi_term").cast("decimal(18,6)")).cast("double")
        .as("chi2_total"),
      // dof from the distinct marginal counts: (|A|-1)(|B|-1)
      ((countDistinct(col("a")) - 1) * (countDistinct(col("b")) - 1))
        .as("dof")))
    scored.crossJoin(totals)
      .select(col("a"), col("b"), col("n"),
        round(col("__e"), 6).as("expected"), col("chi_term"),
        col("chi2_total"), col("dof"))
  }

  /** One-way ANOVA F — "does this numeric feature separate these
    * labels": F = (SSB/(k−1)) / (SSW/(n−k)) with SSB = Σ_g S_g²/n_g −
    * S²/n and SSW = Q − Σ_g S_g²/n_g over per-group decimal power sums
    * (S_g = Σx, Q = Σx², both exact DECIMAL — the [[groupedCorrelation]]
    * discipline). The quality-probe feature gate: a near-zero F on
    * (feature, label) means the feature carries nothing for that label
    * and a probe trained on it is noise.
    *
    * Determinism: per-group terms S_g²/n_g are ONE decimal→double cast
    * + one division each, 6dp-rounded BEFORE the cross-group sum
    * accumulates them as decimal(18,6) (the [[chiSquare]] chi_term
    * technique — plain double term-sums would be partition-order
    * dependent). Scale shape: one grouped power-sum pass (map-side
    * combined), one k-row aggregate. Output: one row (n, k,
    * ss_between, ss_within, eta_sq, f_stat), NULLs when degenerate
    * (k < 2, n ≤ k, or zero within-variance).
    */
  def anovaF(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    // loud value-domain contract: |x| ≥ 1e14 (or NaN) overflows the
    // exact decimal(18,4) accumulator to NULL — the row would then
    // count in __n but drop out of the sums, silently skewing F/eta_sq.
    // assert_true instead (the ksHistogram NaN convention): fail the
    // job with a message rather than return a wrong statistic.
    val xd = col(valueCol).cast("double")
    val guarded = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .withColumn("__rng", assert_true(abs(xd) < 1e14,
        lit("anovaF: |value| >= 1e14 (or NaN) overflows the exact " +
          "decimal(18,4) power-sum accumulator — rescale or filter " +
          "the feature upstream")))
      .filter(col("__rng").isNull)
      .drop("__rng")
    val x = col(valueCol).cast("decimal(18,4)")
    // sums cast to double BEFORE cross-multiplying (the q_corr oracle
    // convention — decimal×decimal of two 38-precision sums can't
    // replay; double multiply is one pinned IEEE op). Per-row squares
    // stay exact decimal (37,8).
    val g = guarded
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), sum(x).as("__s"),
        sum(x * x).as("__q"))
      .select(col("__n"), col("__q"),
        round(col("__s").cast("double") * col("__s").cast("double")
          / col("__n"), 6).cast("decimal(18,6)").as("__t"),
        col("__s"))
    g.agg(sum(col("__n")).as("n"), count(lit(1)).as("k"),
        sum(col("__q")).as("__qq"), sum(col("__t")).as("__tt"),
        sum(col("__s")).as("__ss"))
      .select(col("n"), col("k"),
        (col("__tt").cast("double")
          - round(col("__ss").cast("double") * col("__ss").cast("double")
              / col("n"), 6)).as("__ssb"),
        (col("__qq").cast("double") - col("__tt").cast("double")).as("__ssw"))
      .select(col("n"), col("k"),
        round(col("__ssb"), 6).as("ss_between"),
        round(col("__ssw"), 6).as("ss_within"),
        when(col("__ssb") + col("__ssw") <= 0, lit(null).cast("double"))
          .otherwise(round(col("__ssb") / (col("__ssb") + col("__ssw")), 6))
          .as("eta_sq"),
        when(col("k") < 2 || col("n") <= col("k") || col("__ssw") <= 0,
            lit(null).cast("double"))
          .otherwise(round((col("__ssb") / (col("k") - 1))
            / (col("__ssw") / (col("n") - col("k"))), 6)).as("f_stat"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic — the sup-norm twin
    * of [[histogramDrift]]'s total-variation readout: D = max over
    * distinct values v of |F_a(v) − F_b(v)|, the classic "did this
    * shard come from the same distribution" test for numeric columns
    * (the binned TVD answers "how much moved"; KS answers "how far
    * apart do the CDFs get, anywhere" and is what drift-alarm
    * thresholds like c(α)·√((n_a+n_b)/(n_a·n_b)) are quoted against).
    *
    * Exactness: both empirical CDFs are step functions that only change
    * at sample values, so the sup is attained at a distinct value; each
    * candidate is compared by the INTEGER cross-product
    * |cumA·n_b − cumB·n_a| (decimal(38,0) — exact to n ~ 10¹⁹ a side)
    * and only the one winning numerator meets a double division,
    * rounded to 6dp for the oracle gate. Ties across values broken to
    * the SMALLEST attaining value (at_value). At the result boundary
    * `d_num` is cast decimal→double (house rule — decimal internally,
    * long/double out): it is bounded by n_a·n_b, which exceeds 2⁶³
    * at ~10¹⁰ rows a side, so long would overflow at target scale
    * while the correctly-rounded double replays exactly against the
    * oracle's CAST(… AS DOUBLE).
    *
    * Scale shape: one corpus-sized value-histogram aggregate per side
    * (map-side combined), then the [[Eval.prefixExclusive]] two-level
    * scan over the distinct-value table — range-partitioned local
    * running sums plus contiguity-bounded broadcast offsets; no global
    * single-reducer sort anywhere (the collocations lesson). The final
    * max is one aggregate over the distinct-value table.
    *
    * Null values are excluded; NaN is rejected loudly (engines disagree
    * on NaN order — the [[Eval.scoreHistogram]] convention). Output:
    * one row (n_a, n_b, d_num, at_value, d_stat); zero rows when both
    * inputs are empty.
    */
  def ksDrift(a: DataFrame, b: DataFrame, valueCol: String): DataFrame =
    ksDriftFromHistogram(ksHistogram(a, b, valueCol))

  /** The (__s, __a, __b) per-value count histogram — the MERGEABLE
    * state of the KS family (counts add across shards and
    * micro-batches, the [[Eval.scoreHistogram]] convention), so a
    * Structured Streaming aggregate maintains it live
    * ([[graft.streaming.Streaming.streamingKsHistogram]]) and
    * [[ksDriftFromHistogram]] finishes the sink table.
    *
    * Value-grid contract: the histogram keys on `valueCol` CAST TO
    * DOUBLE. For bigint / wide-decimal columns, distinct integers
    * beyond 2⁵³ collide in double and their histogram cells silently
    * merge (and `at_value` is reported on the double grid). That is
    * the deliberate trade — one grid both engines agree on bit-for-bit
    * — and is harmless for measurement-valued drift columns; if you
    * need exact KS over >2⁵³-magnitude integer keys, pre-bucket or
    * rescale upstream (the [[paretoFrontierBy]] native-type discipline
    * does not transfer here because the prefix scan must ORDER BY one
    * engine-agreed numeric type).
    */
  def ksHistogram(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def side(df: DataFrame, ca: Long, cb: Long) = {
      val v = col(valueCol).cast("double")
      df.filter(v.isNotNull)
        .withColumn("__nan", assert_true(!isnan(v),
          lit("ksDrift: NaN value — engines disagree on NaN rank; " +
            "filter or impute upstream")))
        .filter(col("__nan").isNull)
        .select(v.as("__s"), lit(ca).as("__a"), lit(cb).as("__b"))
    }
    side(a, 1L, 0L).unionByName(side(b, 0L, 1L))
      .groupBy("__s")
      .agg(sum(col("__a")).as("__a"), sum(col("__b")).as("__b"))
  }

  /** [[ksDrift]] from an already-built [[ksHistogram]]. A one-sided
    * comparison (either sample empty after filtering) reports NULL
    * d_stat — there is no distribution to compare against, and the 0/0
    * would otherwise masquerade as NaN (the [[anovaF]] degenerate
    * convention).
    */
  def ksDriftFromHistogram(hist: DataFrame): DataFrame = {
    val cum = Eval.prefixExclusive(hist, Seq.empty, Seq("__a", "__b"),
      descending = false)
    // totals from the scanned cum table (its input is persisted inside
    // prefixExclusive): the max INCLUSIVE cumulative IS the total —
    // a separate hist.agg would re-run the corpus-sized histogram pass
    val tot = cum.agg(max(col("__cum__a") + col("__a")).as("n_a"),
      max(col("__cum__b") + col("__b")).as("n_b"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d = cum.crossJoin(broadcast(tot))
      .select(col("__s"), col("n_a"), col("n_b"),
        abs(dec(col("__cum__a") + col("__a")) * dec(col("n_b"))
          - dec(col("__cum__b") + col("__b")) * dec(col("n_a"))).as("__d"))
    // one struct-max picks (largest diff, then smallest value): max of
    // (__d, -__s) — fine for finite doubles (NaN excluded above, and
    // -0.0 == 0.0 under SQL comparison)
    d.groupBy("n_a", "n_b")
      .agg(max(struct(col("__d"), (-col("__s")).as("__ns"))).as("__m"))
      .select(col("n_a"), col("n_b"),
        // boundary cast (house rule — decimal internally, long/double
        // out): d_num ≤ n_a·n_b can exceed 2⁶³ at target corpus sizes
        // (~10¹¹ rows a side), so double, not long; the max selection
        // above already happened on the exact decimal, and
        // decimal→double is one correctly-rounded IEEE conversion that
        // the oracle replays with CAST(… AS DOUBLE)
        col("__m.__d").cast("double").as("d_num"),
        (-col("__m.__ns")).as("at_value"),
        when(col("n_a") === 0 || col("n_b") === 0,
            lit(null).cast("double"))
          .otherwise(round(col("__m.__d").cast("double")
            / (col("n_a").cast("double") * col("n_b").cast("double")), 6))
          .as("d_stat"))
  }
}
