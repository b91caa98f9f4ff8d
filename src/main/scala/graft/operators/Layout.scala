package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.z_order_key

/** Multi-dimensional data layout for scan efficiency — the write-side
  * half of the 100 TB story.
  *
  * A table laid out in arrival order answers a predicate on ANY column by
  * reading every file. Sorting by one column fixes that column and
  * destroys the other. The Z-order key interleaves the bits of two
  * columns so that range-partitioning by the single key yields files
  * whose min/max footer statistics are tight in BOTH dimensions — row-
  * group and file skipping then prunes scans under predicates on either
  * column (Delta/Iceberg `OPTIMIZE ZORDER BY` is this exact trick).
  * The key is computed by a codegen'd Catalyst expression
  * ([[graft.functions.BitInterleave]]) — pure bit arithmetic, map-side,
  * no shuffle of its own; the only shuffle is the explicit range
  * repartition that IS the layout operation.
  */
object Layout {

  /** Append a deterministic Z-order key over two integral columns (low
    * 31 bits each — see [[graft.functions.BitInterleave]]).
    */
  def withZOrderKey(
      df: DataFrame, colA: String, colB: String,
      keyName: String = "z_key"): DataFrame =
    df.withColumn(keyName,
      z_order_key(col(colA).cast("long"), col(colB).cast("long")))

  /** Rewrite `df` into `numFiles` parquet files range-partitioned and
    * sorted by the Z-order key of (colA, colB). Range partitioning keeps
    * the global key order across files (file k's keys all precede file
    * k+1's), so both per-file and per-row-group statistics stay tight.
    */
  def writeZOrdered(
      df: DataFrame, colA: String, colB: String, path: String,
      numFiles: Int = 32): Unit =
    withZOrderKey(df, colA, colB)
      .repartitionByRange(numFiles, col("z_key"))
      .sortWithinPartitions("z_key")
      .write.mode("overwrite").option("compression", "zstd").parquet(path)

  /** Per-file min/max spans of two columns — the clustering-quality
    * telemetry for a layout rewrite: span fractions near (file count)⁻¹ᐟ²
    * per dimension mean a predicate on either column prunes most files.
    * Groups by `input_file_name()`, so it reads only footers + the two
    * columns.
    */
  def fileSpans(spark: org.apache.spark.sql.SparkSession,
      path: String, colA: String, colB: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        min(col(colA)).as("min_a"), max(col(colA)).as("max_a"),
        min(col(colB)).as("min_b"), max(col(colB)).as("max_b"))
}
