package graft.operators

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of intermediates that operators persist
  * (signature tables, bucket id-lists, shingle sets).
  *
  * The dedup/similarity operators return LAZY DataFrames, so they cannot
  * unpersist their own intermediates — the consumer hasn't run yet. Left
  * alone, those blocks are reclaimed only when the ContextCleaner notices
  * the DataFrame refs are garbage, which in a long-lived session lets
  * cached blocks pile up across operator invocations (round-2 advisor
  * finding). This registry gives callers an explicit, cheap release point:
  * call [[release]] after consuming an operator's output (the bench and
  * verify harnesses do, between queries).
  */
object CacheRegistry {

  private val reg =
    new ConcurrentHashMap[SparkSession, ConcurrentLinkedQueue[DataFrame]]()

  /** Record a just-persisted intermediate; returns it unchanged. */
  private[graft] def track(df: DataFrame): DataFrame = {
    reg.computeIfAbsent(df.sparkSession, _ => new ConcurrentLinkedQueue[DataFrame]())
      .add(df)
    df
  }

  /** Unpersist every intermediate operators persisted in this session.
    * Safe to call at any point — consumers that already ran keep their
    * results; re-running a returned DataFrame afterwards recomputes its
    * pipeline without the cache.
    */
  def release(spark: SparkSession): Unit = {
    val q = reg.remove(spark)
    if (q != null) q.forEach(_.unpersist(false))
  }

  /** Queue position marker for [[releaseSince]]. */
  private[graft] def mark(spark: SparkSession): Int = {
    val q = reg.get(spark)
    if (q == null) 0 else q.size()
  }

  /** Unpersist only intermediates tracked AFTER `mark` — the operator-
    * scoped release for eager compositions (SpanStore.ingestCurate,
    * LshIndex.ingestDedup) that clean up their own probe caches inside
    * the call WITHOUT dropping sibling operators' still-lazy
    * intermediates the way a session-wide [[release]] would.
    * Single-driver-thread discipline: a mark taken around concurrent
    * track() calls from parallel jobs may release a superset, which is
    * safe (release is always safe), just less precise.
    */
  private[graft] def releaseSince(spark: SparkSession, mark: Int): Unit = {
    val q = reg.get(spark)
    if (q != null) {
      val it = q.iterator()
      var i = 0
      while (it.hasNext) {
        val df = it.next()
        if (i >= mark) { df.unpersist(false); it.remove() }
        i += 1
      }
    }
  }
}
