package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic star-schema tables
  * (/root/testdata/sf*, see TESTDATA.md + FIXTURES.md §B).
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS); Spark has no nanosecond
    * timestamp type and refuses the file unless nanos are surfaced as a
    * plain long. The conf is a runtime SQL conf, so set it on the live
    * session — works whether or not the session builder set it.
    * Derived `ts_ms` (epoch millis) is the cross-engine-stable form
    * (DuckDB: `epoch_ms(ts)`).
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts_ms", expr("ts div 1000000"))
  }
}
