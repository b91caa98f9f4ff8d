package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-series) join: attach to each left row the most recent right
  * row with `right.ts <= left.ts` in the same key group — the semantics of
  * pandas `merge_asof`, kdb `aj`, DuckDB `ASOF JOIN`. The reference engine
  * has no joins at all; this is part of the §2.6 beyond-reference surface.
  *
  * Spark-first shape: an inequality join (`l.key = r.key AND l.ts >= r.ts`
  * + keep-latest) would plan as a broadcast-nested-loop or explode the
  * range; instead both sides are UNIONED and ONE running window per key
  * carries the latest right payload forward (`last(..., ignoreNulls)` over
  * unbounded-preceding — an O(n) running frame after the partition sort).
  * One shuffle on the key, no pair materialization; at 100 TB a
  * key+time-bucketed table layout keeps each window partition bounded, and
  * the shape degrades gracefully under key skew (AQE re-splits the sort,
  * not an n² pair space).
  */
object AsOf {

  /** Left rows + `matched_<c>` columns for each carried right column
    * (null when no right row is at or before the left row's timestamp).
    *
    * Ties: a right row AT the left row's timestamp matches (inclusive, as
    * DuckDB ASOF `>=`); multiple right rows on the same (key, ts) resolve
    * to the largest carried payload struct (deterministic total order).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      carryCols: Seq[String]): DataFrame = {
    val payload = struct(carryCols.map(col): _*)
    val r = right.select(col(keyCol), col(tsCol),
      lit(0).as("__side"), payload.as("__r"))
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(r.schema("__r").dataType))
    // right rows sort BEFORE left rows at an equal timestamp (__side 0<1)
    // → inclusive match; __r last so same-ts right duplicates order
    // deterministically
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        carryCols.map(c => col("__m").getField(c).as(s"matched_$c")): _*)
  }
}
