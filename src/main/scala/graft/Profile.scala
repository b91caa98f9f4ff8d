package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-stage attribution harness for the optimization rounds: runs the
  * named queries (args) against SPARK_GRAFT_SF_DIR with the bench's noop
  * sink and prints, per query, the top stages by executor CPU with task
  * counts and shuffle bytes — the local stand-in for the Spark UI's
  * stage table (guide §1.1/§7.1; the sandbox has no UI). Measurement
  * tool only: never invoked by the bench or the driver.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(CheckpointDirs.temp())

    case class St(name: String, tasks: Int, runMs: Long, cpuMs: Long,
      shReadMb: Double, shWriteMb: Double, inMb: Double, rows: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        // first graft-frame of the callsite: the operator the stage
        // belongs to (si.name is the anonymous submission frame)
        val where = si.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("Profile"))
          .getOrElse(si.name).trim
        stages.add(St(s"[${si.stageId}] $where", si.numTasks, m.executorRunTime,
          m.executorCpuTime / 1000000L,
          m.shuffleReadMetrics.totalBytesRead / 1048576.0,
          m.shuffleWriteMetrics.bytesWritten / 1048576.0,
          m.inputMetrics.bytesRead / 1048576.0,
          m.inputMetrics.recordsRead))
      }
    })

    for (q <- args) {
      val fn = SparkEntry.queries(q)
      // warm run (codegen/JIT), then the measured run — mirrors the
      // bench's min-of-2 so attribution reflects steady state
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      operators.CacheRegistry.release(spark); spark.catalog.clearCache()
      stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener bus drain
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toSeq
      println(f"%n########## $q%s wall=$wall%.2f s, ${ss.size}%d stages, " +
        f"sum stage cpu=${ss.map(_.cpuMs).sum / 1000.0}%.2f s, " +
        f"sum stage run=${ss.map(_.runMs).sum / 1000.0}%.2f s")
      ss.sortBy(-_.cpuMs).take(14).foreach { s =>
        println(f"  cpu=${s.cpuMs / 1000.0}%7.2fs run=${s.runMs / 1000.0}%7.2fs " +
          f"tasks=${s.tasks}%4d shR=${s.shReadMb}%8.2fMB shW=${s.shWriteMb}%8.2fMB " +
          f"in=${s.inMb}%8.2fMB rows=${s.rows}%10d  ${s.name.take(110)}%s")
      }
      operators.CacheRegistry.release(spark); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
