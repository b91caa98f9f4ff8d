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
}
