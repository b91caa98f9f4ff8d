package graft.operators

/** Run independent Spark ACTIONS concurrently from the driver.
  *
  * A store lifecycle step often ends in two or three writes of
  * independent tables (LSH buckets + signature sidecar; IVFADC codes +
  * codebook + PQ sidecars). Serially each bills its own full
  * job-submission latency; a local[32] (or any real cluster) schedules
  * them side by side for close to the cost of the slowest one. Spark
  * actions are thread-safe per session, and concurrently computing a
  * shared cached dependency is handled by the block manager (one task
  * computes, the rest read). Failures propagate: the first thrown
  * exception re-throws after all jobs settle, so no write is silently
  * abandoned mid-flight.
  */
private[graft] object ParJobs {
  def run(thunks: (() => Unit)*): Unit = {
    if (thunks.size <= 1) { thunks.foreach(_()); return }
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fs = thunks.map(t => Future(t()))
    val errs = fs.flatMap { f =>
      try { Await.result(f, Duration.Inf); None }
      catch { case e: Throwable => Some(e) }
    }
    errs.headOption.foreach(throw _)
  }
}
