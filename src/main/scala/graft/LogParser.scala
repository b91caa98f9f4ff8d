package graft

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.InputSplit
import org.apache.hadoop.mapreduce.lib.input.{FileSplit, TextInputFormat}
import org.apache.spark.rdd.NewHadoopRDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions.strip_ansi

/** Buildkite log → entries DataFrame.
  *
  * Declarative re-expression of the reference's scan pipeline
  * (reference parser.go:41-56, scanner.go:18-71): OSC timestamp split,
  * classification flags, and the order-sensitive group carry-forward — all as
  * Catalyst column expressions (codegen'd, no UDFs; the one non-built-in is
  * the [[graft.functions.StripAnsi]] native expression).
  *
  * Order is pinned by `(file, offset)` where `offset` is the byte position of
  * each line's start within its file (from Hadoop's TextInputFormat record
  * key) — deterministic across partitionings, unlike
  * `monotonically_increasing_id`. The group carry-forward and `line_no`
  * derivation window on `file`, so N log files parallelize N-ways with a
  * single shuffle; one Buildkite job log easily fits a partition
  * (SURVEY.md §7.4).
  */
object LogParser {

  /** `ESC _bk;t=` — 7 chars, all ASCII (reference scanner.go:74-81). */
  val OscPrefix = "\u001b_bk;t="
  private val Bel = "\u0007"

  private val linesSchema = StructType(Seq(
    StructField(Schema.File, StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType, nullable = false),
  ))

  /** Read text lines with their source file and byte offset.
    *
    * Splits strictly on `\n` (a lone `\r` is NOT a record delimiter, matching
    * Go's `bufio.ScanLines`; progress lines legitimately embed `\r`). The
    * single trailing `\r` of CRLF files is removed in [[parseLines]].
    */
  def readLines(spark: SparkSession, path: String): DataFrame = {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", "\n")
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path, classOf[TextInputFormat], classOf[LongWritable], classOf[Text], conf)
    val rows = rdd.asInstanceOf[NewHadoopRDD[LongWritable, Text]]
      .mapPartitionsWithInputSplit(
        (split: InputSplit, it: Iterator[(LongWritable, Text)]) => {
          val file = split.asInstanceOf[FileSplit].getPath.toString
          // Text/LongWritable objects are reused by the reader: copy now.
          it.map { case (off, text) => Row(file, off.get(), text.toString) }
        },
        preservesPartitioning = true)
    spark.createDataFrame(rows, linesSchema)
  }

  /** Lines DF `(file, offset, value)` → parsed entries DF ([[Schema.parsedSchema]]).
    *
    * Semantics (golden-tested against the reference test tables):
    *   - a line shorter than 10 bytes, without the OSC prefix, or without a
    *     BEL terminator passes through unchanged with a null timestamp
    *     (reference scanner.go:22-51);
    *   - a malformed timestamp (non-numeric / overflow) sets `parse_error`
    *     and passes the raw line through — the reference hard-errors instead
    *     (scanner.go:55-58); aborting a distributed scan mid-file is not
    *     idiomatic Spark, so we flag and count (SURVEY.md §7.4);
    *   - `group` is the carry-forward of the last group header's clean
    *     content; header lines belong to their own group; lines before any
    *     header get "" (reference parser.go:41-56).
    */
  def parseLines(lines: DataFrame): DataFrame = {
    val raw = when(col("value").endsWith("\r"),
      expr("substring(value, 1, length(value) - 1)")).otherwise(col("value"))

    val parsed = lines
      .withColumn("__raw", raw)
      // First BEL; OSC prefix is 7 ASCII chars so char position == byte position.
      .withColumn("__bel", locate(Bel, col("__raw")))
      .withColumn("__osc",
        col("__raw").startsWith(OscPrefix) && col("__bel") > 0 &&
          octet_length(col("__raw")) >= 10)
      .withColumn("__ts_str",
        when(col("__osc"), expr("substring(__raw, 8, __bel - 8)")))
      .withColumn(Schema.Timestamp, expr("try_cast(__ts_str as bigint)"))
      .withColumn(Schema.ParseError,
        col("__osc") && col(Schema.Timestamp).isNull)
      .withColumn(Schema.Content,
        when(col("__osc") && !col(Schema.ParseError),
          expr("substring(__raw, __bel + 1)")).otherwise(col("__raw")))
      .withColumn("__clean", strip_ansi(col(Schema.Content)))
      .withColumn(Schema.HasTimestamp, col(Schema.Timestamp).isNotNull)
      .withColumn(Schema.IsCommand, col("__clean").startsWith("$ "))
      .withColumn(Schema.IsGroup,
        col("__clean").startsWith("~~~") || col("__clean").startsWith("---") ||
          col("__clean").startsWith("+++"))
      // [K is checked on the RAW content, the keywords on the clean content
      // (reference parser.go:152-165).
      .withColumn(Schema.IsProgress,
        col(Schema.Content).contains("[K") &&
          (col("__clean").contains("objects") ||
            col("__clean").contains("deltas") ||
            col("__clean").contains("%")))

    val w = Window.partitionBy(Schema.File).orderBy("offset")
    val cumulative = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parsed
      .withColumn(Schema.LineNo, row_number().over(w).cast(LongType) - 1)
      .withColumn(Schema.Group,
        coalesce(
          last(when(col(Schema.IsGroup), col("__clean")), ignoreNulls = true)
            .over(cumulative),
          lit("")))
      .select(Schema.parsedSchema.fieldNames.map(col).toSeq: _*)
  }

  /** Full pipeline: log file(s) at `path` → entries DataFrame. */
  def parse(spark: SparkSession, path: String): DataFrame =
    parseLines(readLines(spark, path))
}
