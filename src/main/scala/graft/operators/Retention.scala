package graft.operators

import org.apache.spark.sql.SparkSession

/** Window-retention maintenance for the time-partitioned sketch stores
  * ([[SketchStore]], [[HllStore]] — both hive-partition on
  * `window_start_ms` and freeze `window_ms` in their meta sidecar):
  * drop every partition whose window ENDS at or before the cutoff.
  *
  * This is the expiry policy a production metrics store runs on a
  * schedule — the stores grow one partition per window forever
  * otherwise. A pure driver-side directory operation on the store's
  * own filesystem (listStatus + delete, zero Spark jobs, O(#window
  * dirs)); windows are disjoint `[start, start + window_ms)` spans, so
  * a dropped partition can only hold rows strictly before the cutoff —
  * serving any range that starts at or after it is UNCHANGED, which is
  * exactly what the q_retention oracle proves by replaying a
  * retained-range answer against the raw events.
  *
  * Returns the dropped window_start_ms values (sorted) so callers can
  * log what left the store. Partitions are dropped one rename-free
  * delete at a time; a crash mid-sweep leaves a store that is still
  * correct for retained-range serving (just not fully expired — rerun).
  */
object Retention {

  def dropWindowsBefore(spark: SparkSession, dir: String,
      cutoffMs: Long): Seq[Long] = {
    val windowMs = StoreMeta.read(dir)("window_ms").toLong
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = "window_start_ms="
    val dropped = fs.listStatus(path).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .flatMap { p =>
        val name = p.getName
        if (!name.startsWith(prefix)) None
        else scala.util.Try(name.stripPrefix(prefix).toLong).toOption
          .map(start => (p, start))
      }
      .filter { case (_, start) => start + windowMs <= cutoffMs }
    dropped.foreach { case (p, _) => fs.delete(p, true) }
    dropped.map(_._2).sorted
  }
}
