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
}
