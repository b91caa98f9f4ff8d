package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: left point-in-time rows against right
  * [start, end] intervals on a shared key. Part of the §2.6
  * beyond-reference join surface.
  *
  * Catalyst plans `l.ts BETWEEN r.start AND r.end` as a broadcast-nested
  * -loop (or a cartesian per key) — O(|L|·|R|) per key. The scalable shape
  * buckets time: each interval explodes into the buckets it covers, each
  * point carries its single bucket, and the join becomes an EQUI-join on
  * (key, bucket) + an exact containment filter. Work is
  * O(|L| + |R|·intervalSpan/bucketWidth + matches); bucketWidth trades
  * duplication of interval rows against candidate precision — pick it near
  * the typical interval length. A (left, right) match appears exactly once
  * (the point owns one bucket), so no dedup pass is needed.
  */
object RangeJoin {

  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("__bucket", floor(col(tsCol) / bucketWidth))
    val rb = right
      .withColumn("__bucket", explode_outer(sequence(
        floor(col(startCol) / bucketWidth), floor(col(endCol) / bucketWidth))))
      .filter(col("__bucket").isNotNull) // Dedup.safeExplodeNote
    lb.join(rb, Seq(keyCol, "__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval × interval overlap join on a shared key: pairs where
    * [lStart, lEnd] and [rStart, rEnd] intersect (inclusive ends). Same
    * bucket-blocking shape as [[pointInInterval]] — both sides explode
    * into the buckets they cover, the join is an equi-join on
    * (key, bucket) + the exact predicate — but a pair can now share MANY
    * buckets, so exactly-once comes from arithmetic, not a distinct
    * shuffle: an overlapping pair is emitted only in the FIRST bucket both
    * cover, floor(max(lStart, rStart)/width), which overlap guarantees
    * both sides exploded. Column names must not collide across sides
    * (select/alias before calling).
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftStartCol: String, leftEndCol: String,
      rightStartCol: String, rightEndCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def exploded(df: DataFrame, s: String, e: String) = df
      .withColumn("__bucket", explode_outer(sequence(
        floor(col(s) / bucketWidth), floor(col(e) / bucketWidth))))
      .filter(col("__bucket").isNotNull) // Dedup.safeExplodeNote
    exploded(left, leftStartCol, leftEndCol)
      .join(exploded(right, rightStartCol, rightEndCol), Seq(keyCol, "__bucket"))
      .filter(col(leftStartCol) <= col(rightEndCol) &&
        col(rightStartCol) <= col(leftEndCol))
      .filter(col("__bucket") ===
        floor(greatest(col(leftStartCol), col(rightStartCol)) / bucketWidth))
      .drop("__bucket")
  }
}
