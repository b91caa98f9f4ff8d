package graft

import java.nio.file.{Files, Path}

/** Temp checkpoint directories with guaranteed cleanup. Spark does not
  * delete reliable checkpoint data by default
  * (`spark.cleaner.referenceTracking.cleanCheckpoints` is false), so every
  * entrypoint that parks a checkpoint dir in /tmp would otherwise leak one
  * snapshot tree per run (advisor r6).
  *
  * The hook registers with Hadoop's ShutdownHookManager at a priority
  * BELOW SparkContext's stop hook (50), so deletion runs after the
  * context — and any in-flight checkpoint writer — has shut down; a plain
  * `Runtime.addShutdownHook` would race them.
  */
object CheckpointDirs {
  def temp(prefix: String = "graft-ckpt"): String = {
    val dir = Files.createTempDirectory(prefix)
    org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
      new Runnable { override def run(): Unit = deleteRecursively(dir) }, 10)
    dir.toString
  }

  private def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try {
        walk.iterator().asScala.toSeq.reverseIterator
          .foreach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
      } finally walk.close()
    }
  }
}
