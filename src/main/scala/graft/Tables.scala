package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic star-schema tables
  * (/root/testdata/sf*, see TESTDATA.md + FIXTURES.md §B).
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize an events frame's `ts` to int64 epoch NANOSECONDS
    * regardless of the fixture's physical type. The canonical internal
    * representation is nanos-as-long: every downstream operator does
    * plain long arithmetic on `ts` (as-of tolerances, interval bounds)
    * and the DuckDB oracles replay it with `epoch_ns(ts)`, both of
    * which are physical-type-independent. Fixture generations seen so
    * far: parquet TIMESTAMP(NANOS) (surfaced as long via the
    * nanosAsLong conf), and timestamp[us] (surfaced as TIMESTAMP_NTZ —
    * the round-11 regeneration). The NTZ branch uses wall-clock
    * `timestampdiff` against an NTZ epoch literal: pure naive-datetime
    * arithmetic, deliberately independent of the session time zone (a
    * cast through TimestampType would shift by the session offset).
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df // already nanos-as-long
      case TimestampNTZType => df.withColumn("ts",
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts) * 1000"))
      case TimestampType => df.withColumn("ts", expr("unix_micros(ts) * 1000"))
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other (expected long or timestamp)")
    }
  }

  /** `events.ts` arrives as TIMESTAMP(NANOS) or timestamp[us] depending
    * on the fixture generation; [[normalizeEventTs]] canonicalizes it to
    * epoch-nanos longs. nanosAsLong is a runtime SQL conf, so set it on
    * the live session — works whether or not the session builder set it.
    * Derived `ts_ms` (epoch millis) is the cross-engine-stable form
    * (DuckDB: `epoch_ms(ts)`).
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(spark, dir, "events"))
      .withColumn("ts_ms", expr("ts div 1000000"))
  }
}
