package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lineage truncation for bounded driver loops ([[Graph.pageRank]],
  * [[Bpe.trainMerges]], the [[Dedup.dedupClusters]] original): an
  * iterative plan that is merely persisted still GROWS one round's
  * operators per iteration, and Catalyst re-analyzes the whole tree on
  * every action — measured at 10 s of pure planning for 3 PageRank
  * rounds over a 372-edge graph.
  */
private[graft] object Lineage {

  /** Persist-then-reliable-checkpoint when a checkpoint dir is
    * configured (truncates the plan AND survives executor loss — the
    * cluster deployment path); localCheckpoint otherwise (local mode
    * only: blocks live on executors, executor death fails the job).
    * The persist-first step stops checkpoint()'s second job from
    * re-executing the full lineage (advisor r6).
    */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      val cp = df.checkpoint(true)
      df.unpersist(blocking = false)
      cp
    } else df.localCheckpoint(true)

  /** Release the storage behind a DEAD [[cut]] result. A plain
    * `Dataset.unpersist` only evicts cache-manager entries, so on the
    * localCheckpoint path it is a no-op — the checkpointed RDD's
    * storage blocks stay resident until the ContextCleaner notices
    * (advisor r9). A cut result's analyzed plan is exactly one
    * `LogicalRDD` leaf; unpersist that RDD directly. Only the
    * TOP-LEVEL node is matched, never deep leaves: a derived frame may
    * share a live cut result's RDD in its lineage, and a
    * locally-checkpointed RDD cannot be recomputed once its blocks are
    * dropped. Callers must not touch `df` again afterwards.
    *
    * On the RELIABLE path (checkpoint dir configured — the cluster
    * deployment), a cut's data is FILES, not storage blocks, and
    * `rdd.unpersist` frees nothing (advisor r10). Pass
    * `deleteFiles = true` to also delete the dead cut's checkpoint
    * directory — safe ONLY when every frame that could still recompute
    * through this cut is itself an eager cut (the Bpe/pageRank/
    * star-contraction loops, which cut every round before releasing the
    * predecessor). Loops whose successors are merely PERSISTED between
    * cuts (the min-label CC loop) must keep the default: a persisted
    * successor falls back to the predecessor's checkpoint files on
    * executor loss, so those deployments rely on
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` — set by
    * every engine-owned session builder (Cli, Bench, Verify,
    * ScaleCheck) — to let the ContextCleaner delete files once the RDD
    * is unreachable.
    */
  def release(df: DataFrame, deleteFiles: Boolean = false): Unit = {
    df.unpersist(blocking = false)
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
        if (deleteFiles) lr.rdd.getCheckpointFile.foreach { dir =>
          try {
            val p = new org.apache.hadoop.fs.Path(dir)
            p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
              .delete(p, true)
          } catch {
            // best-effort cleanup — but only for genuinely recoverable
            // failures: swallowing InterruptedException would clear the
            // interrupt flag and a VM error (OOM) must propagate
            case _: InterruptedException =>
              Thread.currentThread().interrupt()
            case e if scala.util.control.NonFatal(e) => ()
          }
        }
      case _ => ()
    }
  }
}
