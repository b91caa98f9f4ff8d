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
}
