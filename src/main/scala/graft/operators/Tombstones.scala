package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted-deletion sidecar shared by the persisted content stores
  * ([[SpanStore]], [[LshIndex]], [[Similarity]]'s IVFADC index) — the
  * data-governance takedown a corpus pipeline must serve: remove
  * specific documents from a store WITHOUT rewriting it.
  *
  * The stores are append-only bucket/code tables (that is what makes
  * ingest a pure per-row append), so deletion is necessarily two-phase,
  * the LSM/Iceberg delete-file pattern:
  *
  *   1. `forget(ids)` appends the ids to a tiny `dir_tomb` parquet
  *      sidecar — answer-sized (a takedown list, never corpus-shaped),
  *      one writer job, nothing in the store moves;
  *   2. every SERVING read anti-joins the store's id column against the
  *      broadcast tombstone set ([[filterServing]]) — a map-side hash
  *      probe on rows already pruned/semi-joined by the store's own
  *      scale machinery, so serving cost is unchanged at any store size;
  *   3. the store's COMPACTION applies tombstones physically (the
  *      filtered rows simply don't reach the new directory) and does
  *      not carry the sidecar forward — after the swap the store serves
  *      identically with zero per-read overhead.
  *
  * Contract: forget ∘ compact ≡ cold-rebuild-without-those-docs (the
  * PropertySpec law), and serving BETWEEN forget and compaction already
  * equals the rebuild (the q_forget_* oracle gates). A forgotten id
  * stays forgotten until compaction clears the sidecar; re-ingesting a
  * previously-forgotten document is legal only AFTER a compaction has
  * physically removed its old rows — an append before that would hide
  * the new rows behind the same tombstone (documented on each store's
  * `forget`).
  *
  * Scale shape: the sidecar is read whole and BROADCAST — takedown
  * lists are O(requests), not O(corpus); a pipeline whose deletion set
  * grew corpus-shaped should compact, not accumulate. The existence
  * probe is one driver-side filesystem metadata call per serving read,
  * the same cost class as the `_meta` sidecar read every store already
  * pays. Schema-explicit read (the all-digit partition-inference rule):
  * one BIGINT `id` column regardless of what the store calls it.
  */
private[graft] object Tombstones {

  private def tombDir(dir: String): String = dir + "_tomb"
  private val tombSchema = "id BIGINT"

  /** Does `dir` carry pending tombstones? */
  def exists(dir: String): Boolean = StoreMeta.exists(tombDir(dir))

  /** Append `ids` (first column, cast to long) to the sidecar. Repeat
    * ids across calls are legal — the anti-join is idempotent in the
    * tombstone set.
    */
  def add(ids: DataFrame, dir: String): Unit = {
    ids.select(col(ids.columns.head).cast("long").as("id"))
      .coalesce(1)
      .write.mode("append").option("compression", "zstd")
      .parquet(tombDir(dir))
    // marker sidecar: serving reads gate on StoreMeta.exists, the same
    // existence contract the Bloom companion uses
    StoreMeta.write(tombDir(dir), "id_col" -> "id")
  }

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(tombSchema).parquet(tombDir(dir))

  /** `df` minus rows whose `idCol` is tombstoned — a broadcast hash
    * anti-join (no shuffle of `df`); identity when no sidecar exists,
    * so stores that never forget pay only the existence probe.
    */
  def filterServing(spark: SparkSession, df: DataFrame, dir: String,
      idCol: String): DataFrame =
    if (!exists(dir)) df
    else df.join(
      broadcast(read(spark, dir).select(col("id").as(idCol)).distinct()),
      Seq(idCol), "left_anti")

  /** Snapshot the sidecar's data files — taken by a compaction BEFORE it
    * reads the tombstones it will apply, so [[clear]] can delete exactly
    * what was applied and leave any concurrently-appended file pending
    * (advisor r18: an unconditional directory delete silently discarded
    * a forget racing the compaction tail).
    */
  def listFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[org.apache.hadoop.fs.Path] = {
    val root = new org.apache.hadoop.fs.Path(tombDir(dir))
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
  }

  /** Delete the snapshotted sidecar files; drop the sidecar dir (and its
    * marker) only when nothing newer landed since the snapshot.
    */
  def clear(fs: org.apache.hadoop.fs.FileSystem, dir: String,
      snapshot: Seq[org.apache.hadoop.fs.Path]): Unit = {
    snapshot.foreach(fs.delete(_, false))
    val root = new org.apache.hadoop.fs.Path(tombDir(dir))
    val leftover = fs.exists(root) && fs.listStatus(root).exists(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (!leftover) {
      fs.delete(root, true)
      fs.delete(new org.apache.hadoop.fs.Path(tombDir(dir) + "_meta"), true)
    }
  }
}
