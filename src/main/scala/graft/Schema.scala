package graft

import org.apache.spark.sql.types._

/** Canonical schema of a parsed Buildkite log entry.
  *
  * Mirrors the reference's Parquet schema (reference parquet.go:17-27) with two
  * deliberate divergences documented in SURVEY.md §1.4:
  *   - `timestamp` (epoch millis) is nullable; lines without an OSC header get
  *     null instead of the reference's epoch-of-zero-time sentinel.
  *   - extra engine columns `file` and `line_no` pin deterministic order so
  *     seek/tail/window ops are pushdown-able range filters instead of
  *     physical row offsets (SURVEY.md §7.4). Readers must tolerate extra
  *     columns (the reference's own fixtures carry a legacy `raw_line_size`).
  */
object Schema {
  val Timestamp = "timestamp"
  val Content = "content"
  val Group = "group"
  val HasTimestamp = "has_timestamp"
  val IsCommand = "is_command"
  val IsGroup = "is_group"
  val IsProgress = "is_progress"
  // engine extras
  val File = "file"
  val LineNo = "line_no"
  val ParseError = "parse_error"

  /** The 7 reference columns, in reference order. */
  val referenceColumns: Seq[String] =
    Seq(Timestamp, Content, Group, HasTimestamp, IsCommand, IsGroup, IsProgress)

  /** Schema used when reading entry parquet written by this engine or the
    * reference. Column mapping is by name; unknown columns in the file are
    * ignored (reference query.go:203-233 behaves the same).
    */
  val entrySchema: StructType = StructType(Seq(
    StructField(Timestamp, LongType, nullable = true),
    StructField(Content, StringType, nullable = true),
    StructField(Group, StringType, nullable = true),
    StructField(HasTimestamp, BooleanType, nullable = true),
    StructField(IsCommand, BooleanType, nullable = true),
    StructField(IsGroup, BooleanType, nullable = true),
    StructField(IsProgress, BooleanType, nullable = true),
  ))

  /** Full schema produced by [[LogParser.parse]] (entry columns + extras). */
  val parsedSchema: StructType = StructType(
    entrySchema.fields.toSeq ++ Seq(
      StructField(File, StringType, nullable = true),
      StructField(LineNo, LongType, nullable = false),
      StructField(ParseError, BooleanType, nullable = false),
    ))
}
