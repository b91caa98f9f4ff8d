package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog application (CDC upsert/merge) — reconcile a base snapshot
  * with a stream of keyed insert/update/delete records, producing the
  * next snapshot. The warehouse "MERGE INTO" shape, expressed as a pure
  * batch plan:
  *
  *   1. collapse the changelog to its LATEST record per key — one
  *      window rank over (key ORDER BY seq DESC), the only place the
  *      changelog's history depth matters;
  *   2. survivors with op ≠ 'D' are the upserted rows;
  *   3. the base contributes exactly the keys the changelog never
  *      touched — one anti-join.
  *
  * Scale shape: both steps shuffle on the SAME key, so the window's
  * exchange is reused by the join (no second shuffle of the changelog),
  * and the base-side anti-join is the standard broadcast candidate when
  * a day's changed-key set is small relative to the snapshot — pass
  * `broadcastChangedKeys = true` for that hint. Never a driver loop,
  * never a collect; the changelog can be arbitrarily deep (only rank-1
  * rows survive the first stage's partial filter).
  *
  * Determinism: ties on `seqCol` break on `opCol` then the remaining
  * columns are NOT consulted — callers needing total determinism must
  * provide a unique sequence (the normal CDC contract: log offset /
  * LSN). The gated query uses a unique per-key sequence.
  */
object Cdc {

  /** Apply `changes` (op ∈ I/U/D in `opCol`, ordered by `seqCol`) to
    * `base`. Both frames must share the key column; `changes` must carry
    * every snapshot column (an I/U row IS the new row image — the
    * row-image convention of Debezium-style changelogs).
    */
  def applyChangelog(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      seqCol: String,
      opCol: String = "op",
      broadcastChangedKeys: Boolean = false): DataFrame = {
    val dataCols = base.columns.toSeq
    require(dataCols.contains(keyCol), s"base lacks key column $keyCol")
    require(changes.columns.contains(seqCol) && changes.columns.contains(opCol),
      s"changes must carry $seqCol and $opCol")
    dataCols.foreach(c => require(changes.columns.contains(c),
      s"changes lacks snapshot column $c (row-image changelog required)"))

    val w = Window.partitionBy(keyCol)
      .orderBy(col(seqCol).desc, col(opCol).asc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)

    val upserts = latest.filter(col(opCol) =!= "D")
      .select(dataCols.map(col): _*)

    val changedKeys = latest.select(col(keyCol)).distinct()
    val keysSide = if (broadcastChangedKeys) broadcast(changedKeys) else changedKeys
    val untouched = base.join(keysSide, Seq(keyCol), "left_anti")

    untouched.unionByName(upserts)
  }

  /** Changelog CAPTURE — the inverse of [[applyChangelog]]: diff two
    * snapshots into row-image change records. One full-outer join on
    * the key:
    *
    *   - key only in `newSnap`            → I (new row image)
    *   - key only in `oldSnap`            → D (old row image)
    *   - in both, any column differing    → U (new row image)
    *   - identical (null-safe, per column) → no record
    *
    * Column comparison is null-safe `<=>` per column, so a null→value
    * transition is a U, not a silent equality. Round-trip law (pinned by
    * spec): `applyChangelog(old, snapshotDiff(old, new) + any unique
    * seq) == new`.
    */
  def snapshotDiff(
      oldSnap: DataFrame, newSnap: DataFrame, keyCol: String): DataFrame = {
    val dataCols = oldSnap.columns.toSeq
    require(newSnap.columns.toSeq == dataCols,
      s"snapshots must share a schema: ${dataCols} vs ${newSnap.columns.toSeq}")
    val nonKey = dataCols.filterNot(_ == keyCol)
    val o = oldSnap.select(col(keyCol).as("__k") +:
      dataCols.map(c => col(c).as(s"o_$c")): _*)
    val n = newSnap.select(col(keyCol).as("__k") +:
      dataCols.map(c => col(c).as(s"n_$c")): _*)
    val same = nonKey.map(c => col(s"o_$c") <=> col(s"n_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, Seq("__k"), "full_outer")
      .withColumn("op",
        when(col(s"o_$keyCol").isNull, "I")
          .when(col(s"n_$keyCol").isNull, "D")
          .when(!same, "U"))
      .filter(col("op").isNotNull)
      .select(dataCols.map(c =>
        when(col("op") === "D", col(s"o_$c")).otherwise(col(s"n_$c")).as(c))
        :+ col("op"): _*)
  }

  /** SCD Type-2 history from a changelog: every I/U row becomes a
    * version valid over [its seq, the key's next change's seq); the
    * key's last event leaves valid_to null, and `is_current` marks open
    * NON-delete versions (a trailing D closes the key — its own row
    * carries no version). One window per key, ordered by seq — the
    * lead() runs over ALL ops (deletes bound their predecessor) before
    * the D rows drop out.
    *
    * Scale shape: one shuffle on the key; history depth per key is the
    * window's partition size, never driver state.
    */
  def scd2History(
      changes: DataFrame,
      keyCol: String,
      seqCol: String,
      opCol: String = "op"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(seqCol).asc, col(opCol).asc)
    changes
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull && col(opCol) =!= "D")
      .filter(col(opCol) =!= "D")
  }

  /** Incremental aggregate maintenance under a changelog: update a
    * per-group (row count, decimal-exact value sum) — the
    * materialized-view maintenance shape:
    *
    *   maintained(g) = baseAgg(g) + Σ upserted rows in g − Σ replaced or
    *   deleted base rows in g
    *
    * In production `baseAggOpt` IS the stored view (the previous call's
    * output — (groupCol, n_rows, value_sum)); then the base is touched
    * exactly once, KEY-PRUNED, for the replaced rows' old contributions
    * (broadcastable like [[applyChangelog]]'s anti-join side), and the
    * full-corpus aggregate never re-runs. Without `baseAggOpt` the base
    * aggregate is computed here (the bootstrap call).
    *
    * Precision contract for the fed-back view: the sum is exact
    * DECIMAL(28,4) internally, but the default double surface
    * round-trips it bit-exactly only while the double's ulp is below
    * 1e-4 — i.e. |sum| < 2^39 (~5.5·10^11 at 4 dp). For chained
    * maintenance on groups that can exceed that, pass `exactOut = true`
    * so the stored view keeps value_sum as DECIMAL(28,4) (what
    * [[graft.streaming.Streaming.streamingIncrementalAgg]]'s fed-back
    * loop does); the chained-maintenance spec pins the identity.
    *
    * Returns (groupCol, n_rows, value_sum) with empty groups dropped —
    * identical, row for row, to aggregating the merged snapshot from
    * scratch (the q_incr_agg oracle proves exactly that identity).
    */
  def incrementalAgg(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      seqCol: String,
      groupCol: String,
      valueCol: String,
      opCol: String = "op",
      broadcastChangedKeys: Boolean = false,
      baseAggOpt: Option[DataFrame] = None,
      exactOut: Boolean = false): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(col(seqCol).desc, col(opCol).asc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)

    def grouped(df: DataFrame, sign: Int) = df.groupBy(groupCol)
      .agg((count(lit(1)) * sign).as("__n"),
        (sum(col(valueCol).cast("decimal(28,4)")) * sign).as("__s"))

    val baseAgg = baseAggOpt
      .map(_.select(col(groupCol), col("n_rows").as("__n"),
        col("value_sum").cast("decimal(28,4)").as("__s")))
      .getOrElse(grouped(base, 1))
    val added = grouped(latest.filter(col(opCol) =!= "D"), 1)
    val changedKeys = latest.select(col(keyCol)).distinct()
    val keysSide = if (broadcastChangedKeys) broadcast(changedKeys) else changedKeys
    val removed = grouped(base.join(keysSide, Seq(keyCol), "left_semi"), -1)

    baseAgg.unionByName(added).unionByName(removed)
      .groupBy(groupCol)
      .agg(sum(col("__n")).as("n_rows"), sum(col("__s")).as("__sum"))
      .filter(col("n_rows") > 0)
      .select(col(groupCol), col("n_rows"),
        (if (exactOut) col("__sum") else col("__sum").cast("double"))
          .as("value_sum"))
  }
}
