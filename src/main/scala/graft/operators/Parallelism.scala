package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Small-input parallelism guard shared by the scan-heavy operators.
  *
  * A compact corpus file (anything under
  * `spark.sql.files.maxPartitionBytes`, 128 MB default) arrives as ONE
  * scan partition, so every per-row-expensive map stage chained on it —
  * tokenize/shingle/hash, normalize+md5, Levenshtein — runs on one core
  * of the whole cluster. Size-based split planning can't see per-row
  * compute. Repartitioning a small input is a trivially cheap shuffle; a
  * big input already has ≥ parallelism partitions and is left untouched,
  * so this never adds a shuffle at 100 TB.
  */
private[graft] object Parallelism {

  /** Hash-repartition on `keyCol` (an id column), NOT round-robin:
    * round-robin repartitioning sorts rows first for retry determinism
    * (`spark.sql.execution.sortBeforeRepartition`) — measured ~2× the cpu
    * of the hash shuffle on the documents table.
    */
  def ensure(df: DataFrame, keyCol: String = "doc_id"): DataFrame = {
    // a streaming plan can't be inspected via .rdd (and micro-batch sizing
    // is the stream's own concern) — pass it through untouched
    if (df.isStreaming) return df
    // under AQE, `.rdd` materializes every upstream shuffle stage to plan
    // the final RDD — and the real action then re-executes them in a
    // fresh QueryExecution. Only scan-shaped lineages (project / filter /
    // generate over a source) are safe to probe; anything that already
    // shuffled has ≥ shuffle.partitions partitions anyway and needs no
    // guard.
    val shuffled = df.queryExecution.logical.exists {
      case _: Join | _: Aggregate | _: Window | _: Sort | _: Distinct => true
      case _: RepartitionOperation => true
      case _ => false
    }
    if (shuffled) return df
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par)
      df.repartition(par, org.apache.spark.sql.functions.col(keyCol))
    else df
  }
}
