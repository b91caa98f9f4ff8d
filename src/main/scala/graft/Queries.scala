package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's five query operations (list-groups, by-group, tail, seek,
  * info — reference query_cli.go:35-51), re-expressed as lazy
  * DataFrame→DataFrame transforms. Early termination / constant memory fall
  * out of Catalyst limits and parquet pushdown instead of hand-rolled
  * iterators.
  */
object Queries {

  /** Empty group display name (reference query.go:343-346). */
  val NoGroup = "<no group>"

  def normalizedGroup(c: Column): Column =
    when(c.isNull || c === "", NoGroup).otherwise(c)

  /** A1: list-groups — per-group entry/command/progress counts and
    * first/last-seen timestamps, ordered by first seen
    * (reference query_cli.go:55-119).
    *
    * Divergence (SURVEY.md §2.4): the reference folds the epoch-zero
    * sentinel of timestamp-less lines into min(); our null timestamps are
    * naturally ignored by min/max.
    */
  def listGroups(entries: DataFrame): DataFrame =
    entries
      .groupBy(normalizedGroup(col(Schema.Group)).as("name"))
      .agg(
        count(lit(1)).as("entry_count"),
        min(timestamp_millis(col(Schema.Timestamp))).as("first_seen"),
        max(timestamp_millis(col(Schema.Timestamp))).as("last_seen"),
        sum(col(Schema.IsCommand).cast("long")).as("commands"),
        sum(col(Schema.IsProgress).cast("long")).as("progress"))
      .orderBy(col("first_seen").asc_nulls_last, col("name"))

  /** P6: by-group — case-insensitive substring match on the normalized group
    * name; the empty group normalizes to "<no group>" BEFORE matching, so a
    * pattern like "no group" selects ungrouped rows
    * (reference query.go:333-355).
    */
  def byGroup(entries: DataFrame, pattern: String): DataFrame =
    entries.filter(
      lower(normalizedGroup(col(Schema.Group))).contains(pattern.toLowerCase))

  /** P5: CLI `-filter` type filter (reference cmd/bklog/main.go:390-401). */
  def filterByType(entries: DataFrame, kind: String): DataFrame = kind match {
    case "command"             => entries.filter(col(Schema.IsCommand))
    case "group" | "section"   => entries.filter(col(Schema.IsGroup))
    case "progress"            => entries.filter(col(Schema.IsProgress))
    case _                     => entries
  }

  /** `line_no` restarts at 0 per source file, so a global row index needs
    * the per-file counts. One tiny aggregate (a row per file, line_no is
    * dense 0..c-1 by construction) collected to the driver, folded into a
    * per-file predicate on (file, line_no) — which still prunes parquet
    * row groups. Returns rows whose GLOBAL index (files in name order) is
    * >= `start`, or an empty frame.
    */
  private def fromGlobalRow(entries: DataFrame, start: Long): DataFrame = {
    val counts = entries.groupBy(col(Schema.File))
      .agg((max(col(Schema.LineNo)) + 1).as("__cnt"))
      .orderBy(Schema.File)
      .collect()
    if (counts.isEmpty) return entries.limit(0)
    var cum = 0L
    val preds = counts.toSeq.flatMap { r =>
      val f = r.getString(0)
      val c = r.getLong(1)
      val lo = start - cum // first wanted line_no within this file
      cum += c
      if (lo >= c) None
      else if (lo <= 0) Some(col(Schema.File) === f)
      else Some(col(Schema.File) === f && col(Schema.LineNo) >= lo)
    }
    if (preds.isEmpty) entries.limit(0)
    else entries.filter(preds.reduce(_ || _)).orderBy(Schema.File, Schema.LineNo)
  }

  /** O3: tail — last `n` rows in global (file, line_no) order
    * (reference query_cli.go:311-348). Multi-file aware: `line_no` restarts
    * per file (advisor finding, round 1), so the cutoff is translated into
    * per-file predicates instead of one global line_no threshold.
    */
  def tail(entries: DataFrame, n: Long): DataFrame = {
    val totalRow = entries.groupBy(col(Schema.File))
      .agg((max(col(Schema.LineNo)) + 1).as("__cnt"))
      .agg(sum(col("__cnt"))).head()
    if (totalRow.isNullAt(0)) return entries.limit(0) // empty input
    val total = totalRow.getLong(0)
    fromGlobalRow(entries, math.max(0, total - n))
  }

  /** O4/S9: seek — stream from global row `k`, optional limit
    * (reference query_cli.go:352-373). Out-of-range `k` yields an empty
    * frame (the reference errors, query.go:429-433; flagging over aborting
    * is the distributed-friendly choice, SURVEY.md §7.4).
    */
  def seek(entries: DataFrame, k: Long, limit: Option[Long] = None): DataFrame = {
    val df = fromGlobalRow(entries, k)
    limit.fold(df)(n => df.limit(n.toInt))
  }

  /** A2: whole-file processing summary (reference cmd/bklog/main.go:32-40). */
  def summary(entries: DataFrame): DataFrame =
    entries.agg(
      count(lit(1)).as("total_entries"),
      sum(col(Schema.HasTimestamp).cast("long")).as("entries_with_time"),
      sum(col(Schema.IsCommand).cast("long")).as("commands"),
      sum(col(Schema.IsGroup).cast("long")).as("sections"),
      sum(col(Schema.IsProgress).cast("long")).as("progress"),
      (count(lit(1))
        - sum(col(Schema.IsCommand).cast("long"))
        - sum(col(Schema.IsGroup).cast("long"))
        - sum(col(Schema.IsProgress).cast("long"))).as("regular_output"))
}
