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
    *
    * 31-BIT DOMAIN CONTRACT: values ≥ 2^31 are interleaved modulo 2^31,
    * which silently destroys the locality the key exists for (far-apart
    * ids collide, every file spans the whole domain). For wide-domain
    * keys (snowflake ids, epoch-millis), pre-map to a dense/bucketed
    * 31-bit space first — e.g. `dense_rank`, `value / bucketWidth`, or
    * epoch-days. `checkRange = true` adds one aggregate pass that FAILS
    * on out-of-range values instead of degrading silently.
    */
  def withZOrderKey(
      df: DataFrame, colA: String, colB: String,
      keyName: String = "z_key",
      checkRange: Boolean = false): DataFrame = {
    if (checkRange) {
      val lim = 1L << 31
      val r = df.agg(
        min(col(colA).cast("long")).as("na"), max(col(colA).cast("long")).as("xa"),
        min(col(colB).cast("long")).as("nb"), max(col(colB).cast("long")).as("xb")).head()
      def ok(lo: Long, hi: Long) = lo >= 0L && hi < lim
      require(r.anyNull || (ok(r.getLong(0), r.getLong(1)) && ok(r.getLong(2), r.getLong(3))),
        s"z-order columns must fit [0, 2^31): $colA in [${r.get(0)}, ${r.get(1)}], " +
          s"$colB in [${r.get(2)}, ${r.get(3)}] — pre-bucket wide domains first")
    }
    df.withColumn(keyName,
      z_order_key(col(colA).cast("long"), col(colB).cast("long")))
  }

  /** Rewrite `df` into `numFiles` parquet files range-partitioned and
    * sorted by the Z-order key of (colA, colB). Range partitioning keeps
    * the global key order across files (file k's keys all precede file
    * k+1's), so both per-file and per-row-group statistics stay tight.
    */
  def writeZOrdered(
      df: DataFrame, colA: String, colB: String, path: String,
      numFiles: Int = 32): Unit = {
    graft.ParquetIO.requireNotOverwritingInput(df, path)
    withZOrderKey(df, colA, colB)
      .repartitionByRange(numFiles, col("z_key"))
      .sortWithinPartitions("z_key")
      .write.mode("overwrite").option("compression", "zstd").parquet(path)
  }

  /** Per-file min/max spans of two columns — the clustering-quality
    * telemetry for a layout rewrite: span fractions near (file count)⁻¹ᐟ²
    * per dimension mean a predicate on either column prunes most files.
    * Groups by `input_file_name()`, so it reads the two columns IN FULL
    * (column-pruned, but data pages, not just footers — min/max/count per
    * file could in principle come from footer statistics alone; this
    * implementation trades that saving for a plain aggregate). Run it as
    * an occasional audit, not per query.
    */
  def fileSpans(spark: org.apache.spark.sql.SparkSession,
      path: String, colA: String, colB: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        min(col(colA)).as("min_a"), max(col(colA)).as("max_a"),
        min(col(colB)).as("min_b"), max(col(colB)).as("max_b"))
}
