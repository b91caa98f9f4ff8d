package graft

import java.nio.file.{Files, Path}

/** Temp checkpoint directories with guaranteed cleanup. Spark does not
  * delete reliable checkpoint data by default
  * (`spark.cleaner.referenceTracking.cleanCheckpoints` is false), so every
  * entrypoint that parks a checkpoint dir in /tmp would otherwise leak one
  * snapshot tree per run (advisor r6). A JVM shutdown hook deletes the
  * whole tree after the SparkContext stops.
  */
object CheckpointDirs {
  def temp(prefix: String = "graft-ckpt"): String = {
    val dir = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))
    dir.toString
  }

  private def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverseIterator
        .foreach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
    }
  }
}
