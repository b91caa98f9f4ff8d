package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * At 100 TB a handful of hot keys (one giant build group, one viral
  * document template) can pin a single reducer. Salting splits each key
  * into `saltBuckets` sub-keys for a first partial aggregation, then
  * combines partials in a second (tiny) aggregation — the classic
  * two-stage rewrite. AQE's skew-join handling covers joins; this covers
  * aggregations whose partial-combine alone can't save a single hot
  * reducer.
  */
object Skew {

  /** Two-stage salted count+sum per key; result is exactly equal to the
    * direct groupBy (proved by the oracle gate), but no reducer ever sees
    * more than ~1/saltBuckets of a hot key's rows.
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      value: Column,
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.select(
      key.as("key"),
      value.as("v"),
      (rand(seed = 42) * saltBuckets).cast("int").as("__salt"))
    val partial = salted
      .groupBy(col("key"), col("__salt"))
      .agg(count(lit(1)).as("__cnt"),
        sum(col("v").cast("decimal(18,4)")).as("__sum"))
    partial
      .groupBy(col("key"))
      .agg(sum(col("__cnt")).as("n"),
        sum(col("__sum")).cast("double").as("total"))
  }

  /** Salted fact⋈dim equi-join for a skewed fact key: each fact row gets
    * a DETERMINISTIC salt (hash of its whole row id, not rand() — retry
    * of a lost task must re-salt identically or the join drops/dups
    * rows), the dim side replicates `saltBuckets`× via an explode, and
    * the join key becomes (key, salt) — a hot key's fact rows spread
    * over `saltBuckets` reducers instead of pinning one. Result is
    * row-identical to the plain join (the q_salted_join oracle computes
    * the plain join).
    *
    * This is the MANUAL fallback: AQE's skew-join split covers
    * shuffle-join skew automatically when statistics see it; the salted
    * rewrite is for engines/plans where it can't (e.g. a key so hot one
    * partition exceeds every split threshold, or bucketed tables whose
    * layout AQE won't re-split).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keyCol: String,
      factIdCol: String,
      saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets >= 1)
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(factIdCol)), lit(saltBuckets.toLong)))
    val saltedDim = dim
      .withColumn("__salt", explode_outer(
        sequence(lit(0L), lit(saltBuckets.toLong - 1))))
      .filter(col("__salt").isNotNull) // Dedup.safeExplodeNote
    saltedFact.join(saltedDim, Seq(keyCol, "__salt")).drop("__salt")
  }

  /** Join-key skew profiler: the diagnostic that says WHETHER
    * [[saltedAgg]]/[[saltedJoin]]/AQE-skew-split are needed before
    * anyone pays for them. Reports the top `topN` heaviest keys (ties
    * on the key value) with
    *
    *  - `share`: this key's fraction of all rows (6dp),
    *  - `skew_ratio`: its count over the MEAN per-key count (4dp) — the
    *    direct "how many reducers' worth of work is this one key"
    *    number; a ratio of 40 on 32 slots means the key alone outweighs
    *    the average reducer 40×,
    *
    * plus the global context on every row (n_rows, n_keys) so one
    * result frame is a self-contained report.
    *
    * One grouped count (map-side partials shrink each partition to its
    * distinct keys), a single-row global aggregate crossed in, and a
    * top-N window over the per-key counts — at 100 TB the window input
    * is |keys| rows, never |rows|, and the output is `topN` rows.
    */
  def keyProfile(df: DataFrame, key: Column, topN: Int = 20): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(key.as("key")).groupBy("key")
      .agg(count(lit(1)).as("cnt"))
    val globals = broadcast(counts.agg(
      sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys")))
    // orderBy+limit, NOT a global window: Catalyst plans this as
    // TakeOrderedAndProject (per-partition top-N then a topN-row merge);
    // an unpartitioned row_number window would drag ALL |keys| rows
    // through one task. The rank window below runs over <= topN rows.
    // asc_nulls_last on the key tie-break: Spark's plain asc sorts NULL
    // first while DuckDB's ORDER BY default is NULLS LAST — a null key
    // tying on cnt at the topN boundary would cut differently across
    // engines (the oracle pins NULLS LAST explicitly)
    counts.orderBy(col("cnt").desc, col("key").asc_nulls_last).limit(topN)
      .crossJoin(globals)
      .withColumn("__r", row_number().over(Window.partitionBy()
        .orderBy(col("cnt").desc, col("key").asc_nulls_last)))
      .select(col("__r").as("rank"), col("key"), col("cnt"),
        col("n_rows"), col("n_keys"),
        round(col("cnt").cast("double") / col("n_rows"), 6).as("share"),
        round(col("cnt").cast("double")
          / (col("n_rows").cast("double") / col("n_keys")), 4).as("skew_ratio"))
  }
}
